"""Anderson-accelerated ICP (AA-ICP): same answer, fewer iterations."""

import jax.numpy as jnp
import numpy as np

from pgslam_tpu import se3
from pgslam_tpu.cloud import make_cloud
from pgslam_tpu.ops import outlier as O
from pgslam_tpu.ops.icp import ICPConfig, icp


def test_anderson_recovers_and_accelerates(rng):
    pts = rng.uniform(-5, 5, (1500, 3)).astype(np.float32)
    pts[:, 2] = np.sign(pts[:, 2]) * 2 + rng.normal(size=1500) * 0.3
    ref = make_cloud(pts, capacity=1536)
    T_true = se3.exp(jnp.asarray([0.35, -0.25, 0.1, 0.05, -0.04, 0.09],
                                 jnp.float32))
    reading = make_cloud(
        np.asarray(se3.apply(se3.inverse(T_true), jnp.asarray(pts))),
        capacity=1536)
    base = dict(error="point_to_point", max_iterations=60,
                outlier=(O.TrimmedDist(0.95), O.MaxDist(1.0)),
                trans_eps=1e-4, rot_eps=1e-4)
    plain = icp(reading, ref, se3.identity(), ICPConfig(**base))
    aa = icp(reading, ref, se3.identity(),
             ICPConfig(**base, anderson_m=3))
    for res in (plain, aa):
        err = np.linalg.norm(np.asarray(se3.log(se3.inverse(res.T) @ T_true)))
        assert err < 2e-3, err
    assert int(aa.iterations) <= int(plain.iterations)

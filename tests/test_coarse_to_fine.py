"""Coarse-to-fine ICP: decimated first stage must not change the answer."""

import jax.numpy as jnp
import numpy as np

from pgslam_tpu import se3
from pgslam_tpu.cloud import make_cloud
from pgslam_tpu.ops import outlier as O
from pgslam_tpu.ops.icp import ICPConfig, icp


def test_coarse_to_fine_recovers(rng):
    pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    pts[:, 2] = np.sign(pts[:, 2]) * 2 + rng.normal(size=2000) * 0.3
    ref = make_cloud(pts, capacity=2048)
    T_true = se3.exp(jnp.asarray([0.4, -0.3, 0.1, 0.05, -0.04, 0.1],
                                 jnp.float32))
    reading = make_cloud(
        np.asarray(se3.apply(se3.inverse(T_true), jnp.asarray(pts))),
        capacity=2048)
    base = ICPConfig(error="point_to_point", max_iterations=40,
                     outlier=(O.TrimmedDist(0.95), O.MaxDist(1.0)))
    plain = icp(reading, ref, se3.identity(), base)
    c2f = icp(reading, ref, se3.identity(),
              ICPConfig(**{**base.__dict__, "coarse_div": 8,
                           "coarse_iterations": 20, "max_iterations": 10}))
    for res in (plain, c2f):
        err = np.linalg.norm(np.asarray(se3.log(se3.inverse(res.T) @ T_true)))
        assert err < 2e-3, err
    # Fine stage should need far fewer iterations than the plain run.
    assert int(c2f.iterations) <= int(plain.iterations)

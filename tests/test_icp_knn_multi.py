"""k>1 matching: the minimizer consumes all k matches flattened
(libpointmatcher ErrorElements semantics)."""

import jax.numpy as jnp
import numpy as np

from pgslam_tpu import se3
from pgslam_tpu.cloud import make_cloud
from pgslam_tpu.ops import outlier as O
from pgslam_tpu.ops.icp import ICPConfig, icp


def test_icp_knn3_recovers(rng):
    pts = rng.uniform(-4, 4, (600, 3)).astype(np.float32)
    pts[:, 2] = np.sign(pts[:, 2]) * 1.5 + rng.normal(size=600) * 0.2
    ref = make_cloud(pts, capacity=640)
    T_true = se3.exp(jnp.asarray([0.2, -0.1, 0.05, 0.04, 0.0, -0.06],
                                 jnp.float32))
    reading = make_cloud(
        np.asarray(se3.apply(se3.inverse(T_true), jnp.asarray(pts))),
        capacity=640)
    cfg = ICPConfig(error="point_to_point", knn=3, max_iterations=40,
                    outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)))
    res = icp(reading, ref, se3.identity(), cfg)
    err = np.linalg.norm(np.asarray(se3.log(se3.inverse(res.T) @ T_true)))
    # k>1 pulls toward 2nd/3rd neighbours (slight averaging bias); the
    # point here is that the flattened-matches path works end to end.
    assert err < 3e-2, err
    assert float(res.overlap) > 0.8

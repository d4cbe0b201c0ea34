import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")  # axon plugin overrides env vars

import logging
logging.basicConfig(level=logging.INFO, format="%(message)s")

import numpy as np
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from pgslam_tpu.datasets import loop_sequence
from pgslam_tpu.slam import PoseGraphSlam
from pgslam_tpu.graph.pose_graph import LOOP_CONSTRAINT
from test_slam_e2e import small_config

rng = np.random.default_rng(3)
scans, odom, truth = loop_sequence(
    rng, n_scans=60, scan_points=512, radius=8.0, noise=0.003,
    odom_drift=0.004)
slam = PoseGraphSlam(small_config())
T_rs = np.eye(4, dtype=np.float32)
for i, (scan, T_odom) in enumerate(zip(scans, odom)):
    slam.add_data(i, "world", T_odom, T_rs, scan)
    est = slam.localizer.T_world_robot[:3, 3]
    print(f"== scan {i}: est={est.round(2)} true={truth[i][:3,3].round(2)} "
          f"err={np.linalg.norm(est-truth[i][:3,3]):.3f} "
          f"kfs={slam.get_graph().n_vertices}")

g = slam.get_graph()
n_loops = int(np.sum(g.edge_type[:g.n_edges] == LOOP_CONSTRAINT))
print(f"LOOPS={n_loops} kfs={g.n_vertices} edges={g.n_edges}")
err = np.linalg.norm(slam.localizer.T_world_robot[:3, 3] - truth[-1][:3, 3])
drift = np.linalg.norm(odom[-1][:3, 3] - truth[-1][:3, 3])
print(f"final err={err:.3f} odo drift={drift:.3f}")
if slam.loop_closer.last_result is not None:
    r = slam.loop_closer.last_result
    print(f"last loop ICP: overlap={float(r.overlap):.3f} "
          f"maxiter={bool(r.max_iter_reached)} "
          f"residual_thresh_check={slam.loop_closer.compute_residual_error():.1f}")

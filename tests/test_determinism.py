"""Determinism: identical inputs must give bit-identical trajectories
(the single-threaded facade is the deterministic replay mode; PRNG keys
derive from scan counters, never wall clock)."""

import numpy as np

from pgslam_tpu.datasets import corridor_sequence
from pgslam_tpu.slam import PoseGraphSlam

from test_slam_e2e import small_config


def run_once():
    rng = np.random.default_rng(7)
    scans, odom, _ = corridor_sequence(rng, n_scans=10, scan_points=512,
                                       step=0.4, noise=0.003,
                                       odom_noise=0.005, length=30.0)
    slam = PoseGraphSlam(small_config())
    for i, (scan, T_odom) in enumerate(zip(scans, odom)):
        slam.add_data(i, "world", T_odom, np.eye(4), scan)
    return slam.trajectory(), slam.localizer.T_world_robot


def test_replay_determinism():
    traj1, pose1 = run_once()
    traj2, pose2 = run_once()
    np.testing.assert_array_equal(traj1, traj2)
    np.testing.assert_array_equal(pose1, pose2)

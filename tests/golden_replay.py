"""Shared definition of the golden-replay sequence (VERDICT r2 item 6).

One canonical corridor-style loop sequence + SLAM config, used by
``scripts/make_golden_replay.py`` (records the single-threaded facade's
trajectory as the committed fixture ``tests/fixtures/golden_replay.npz``)
and by ``tests/test_golden_replay.py`` (asserts the ST path reproduces the
fixture bit-tight, and that the MT / batched-fleet / sharded paths
reproduce the same trajectory within tolerance).

This is the strongest reference-parity evidence available in this
environment: the C++ reference is not buildable here (no
libpointmatcher/GTSAM), so "same trajectories on replayed sequences"
(BASELINE.json north star) is pinned by cross-path agreement against one
recorded replay instead — see PARITY.md.
"""

import os

import numpy as np

from pgslam_tpu.datasets import loop_sequence
from pgslam_tpu.localizer import LocalizerConfig
from pgslam_tpu.loopcloser import LoopCloserConfig
from pgslam_tpu.ops import outlier as O
from pgslam_tpu.ops.icp import ICPConfig
from pgslam_tpu.slam import SlamConfig

FIXTURE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "golden_replay.npz")

N_SCANS = 70
SCAN_POINTS = 512


def golden_sequence():
    """Deterministic loop sequence with odometric drift and a loop-closure
    opportunity at the end. Seed is part of the fixture definition."""
    rng = np.random.default_rng(3)
    return loop_sequence(rng, n_scans=N_SCANS, scan_points=SCAN_POINTS,
                         radius=10.0, max_range=8.0, noise=0.002,
                         odom_drift=0.002)


def golden_config() -> SlamConfig:
    # trans/rot_eps are deliberately TIGHT (1e-3, vs the 5e-3 production
    # default for this scale): cross-path pose agreement is bounded by
    # the ICP convergence tolerance per scan (different execution paths
    # stop at different iterates inside the tolerance ball), and it
    # compounds by dead reckoning between keyframes — 5e-3 * 60 scans
    # would swamp the 0.10 m parity tolerance this fixture pins.
    icp = ICPConfig(error="point_to_point", max_iterations=40,
                    outlier=(O.TrimmedDist(0.85), O.MaxDist(0.5)),
                    trans_eps=1e-3, rot_eps=1e-3,
                    max_correction_trans=2.0, max_correction_rot=0.5)
    return SlamConfig(
        localizer=LocalizerConfig(icp=icp, keyframe_cloud_capacity=512,
                                  overlap_threshold=0.8),
        loop_closer=LoopCloserConfig(
            icp=icp, topo_dist_threshold=10.0, geom_dist_threshold=4.0,
            overlap_threshold=0.6, residual_error_threshold=5000.0),
        sensor_cloud_capacity=512)


def run_st_replay():
    """Run the single-threaded facade over the golden sequence; returns
    (per_scan_poses [n,4,4], trajectory [n_kf,4,4], n_loop_edges)."""
    from pgslam_tpu.graph.pose_graph import LOOP_CONSTRAINT
    from pgslam_tpu.slam import PoseGraphSlam

    scans, odom, _ = golden_sequence()
    slam = PoseGraphSlam(golden_config())
    T_rs = np.eye(4, dtype=np.float32)
    per_scan = []
    for i, (scan, T_odom) in enumerate(zip(scans, odom)):
        slam.add_data(i, "world", T_odom, T_rs, scan)
        per_scan.append(slam.localizer.T_world_robot.copy())
    g = slam.get_graph()
    n_loops = int(np.sum(g.edge_type[:g.n_edges] == LOOP_CONSTRAINT))
    return np.stack(per_scan), slam.trajectory(), n_loops

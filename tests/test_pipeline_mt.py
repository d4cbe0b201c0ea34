"""Multi-threaded pipeline tests: same corridor as the ST e2e test, driven
through the queued worker threads."""

import numpy as np

from pgslam_tpu.datasets import corridor_sequence
from pgslam_tpu.pipeline import PoseGraphSlamMT

from test_slam_e2e import small_config


def test_mt_corridor_matches_st():
    rng = np.random.default_rng(7)
    scans, odom, truth = corridor_sequence(
        rng, n_scans=15, scan_points=512, step=0.4, noise=0.003,
        odom_noise=0.005, length=30.0)
    slam = PoseGraphSlamMT(small_config())
    with slam:
        T_rs = np.eye(4, dtype=np.float32)
        for i, (scan, T_odom) in enumerate(zip(scans, odom)):
            slam.add_data(i, "world", T_odom, T_rs, scan)
        assert slam.wait_idle(timeout=600.0)
        est = slam.localizer.T_world_robot.copy()
        g = slam.get_graph()
        n_kf = g.n_vertices
    err = np.linalg.norm(est[:3, 3] - truth[-1][:3, 3])
    assert err < 0.25, f"final pose error {err}"
    assert n_kf >= 2


def test_mt_clean_shutdown_without_run():
    # MT destructors must join cleanly even if Run() was never called
    # (the implicit check in tests/instantiation.cpp).
    slam = PoseGraphSlamMT(small_config())
    slam.stop()


def test_instantiation_smoke():
    """Mirror of the reference's only test (tests/instantiation.cpp):
    construct and destroy both facades."""
    from pgslam_tpu.slam import PoseGraphSlam
    PoseGraphSlam(small_config())
    s = PoseGraphSlamMT(small_config())
    s.stop()


def test_mt_facade_base_accessors():
    """The MT facade must expose the full base-facade surface (the
    reference's MT class inherits it from PoseGraphSlamBase)."""
    from test_slam_e2e import small_config

    from pgslam_tpu.datasets import corridor_sequence
    from pgslam_tpu.pipeline import PoseGraphSlamMT

    rng = np.random.default_rng(2)
    scans, odom, _ = corridor_sequence(rng, n_scans=4, scan_points=256,
                                       length=20.0)
    with PoseGraphSlamMT(small_config(sensor_cap=384, kf_cap=256)) as slam:
        for t, (s, T) in enumerate(zip(scans, odom)):
            slam.add_data(t, "world", T, np.eye(4), s)
        assert slam.wait_idle(timeout=120.0)
        pose = slam.T_world_robot
        assert pose.shape == (4, 4) and np.isfinite(pose).all()
        cloud, ok = slam.get_local_map()
        assert ok and cloud is not None
        cloud_w, ok_w = slam.get_local_map_in_world_frame()
        assert ok_w
        gm = slam.global_map(max_points_per_keyframe=64)
        assert gm.shape[1] == 3 and len(gm) > 0

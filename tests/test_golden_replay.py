"""Golden-replay parity (VERDICT r2 item 6): every execution path must
reproduce the committed single-threaded-facade trajectory.

The fixture (tests/fixtures/golden_replay.npz, written by
scripts/make_golden_replay.py on the CPU backend) pins the ST facade's
per-scan poses over one loop sequence with an accepted loop closure.
This file asserts:

* ST facade  -> bit-tight against the fixture (deterministic replay);
* MT facade  -> same trajectory within tolerance (threaded pipeline);
* batched fleet (MultiAgentSlam, shared graph) -> each agent tracks the
  golden trajectory within tolerance;
* sharded fleet (dp x tp mesh through parallel/sharded_icp.py) -> same.

Reference tie-in: the north star asks for "same trajectories within pose
tolerance on replayed scan sequences" vs the C++ reference; the reference
is not buildable here, so cross-path agreement against one recorded
replay is the strongest available substitute (PARITY.md).
"""

import numpy as np
import pytest

from golden_replay import (FIXTURE, N_SCANS, golden_config,
                           golden_sequence, run_st_replay)


@pytest.fixture(scope="module")
def golden():
    data = np.load(FIXTURE)
    return {"per_scan": data["per_scan_poses"],
            "trajectory": data["trajectory"],
            "n_loops": int(data["n_loop_edges"])}


def _pose_errs(poses, golden_poses):
    return np.linalg.norm(poses[:, :3, 3] - golden_poses[:, :3, 3], axis=1)


def test_st_facade_matches_golden(golden):
    per_scan, trajectory, n_loops = run_st_replay()
    # Same backend + same jitted code path: deterministic replay.
    np.testing.assert_allclose(per_scan, golden["per_scan"], atol=1e-5)
    assert trajectory.shape == golden["trajectory"].shape
    np.testing.assert_allclose(trajectory, golden["trajectory"], atol=1e-5)
    assert n_loops == golden["n_loops"] >= 1


@pytest.mark.slow
def test_mt_batched_sharded_match_golden(golden):
    """The three parallel paths replay the same sequence and must land on
    the golden trajectory within tolerance (not bitwise: the MT pipeline
    overlaps optimization with localization, and fleet paths share one
    graph across agents / use the sharded matcher's iteration schedule)."""
    from pgslam_tpu.parallel.multi_agent import MultiAgentSlam
    from pgslam_tpu.parallel.multichip import make_mesh
    from pgslam_tpu.pipeline import PoseGraphSlamMT

    scans, odom, _ = golden_sequence()
    T_rs = np.eye(4, dtype=np.float32)
    tol = 0.10  # m; drift at the pre-closure end of the fixture is ~3x this

    # --- MT facade ---
    slam = PoseGraphSlamMT(golden_config())
    with slam:
        for i, (scan, T_odom) in enumerate(zip(scans, odom)):
            slam.add_data(i, "world", T_odom, T_rs, scan)
        assert slam.wait_idle(timeout=600.0)
        mt_final = slam.localizer.T_world_robot.copy()
    err_mt = np.linalg.norm(mt_final[:3, 3]
                            - golden["per_scan"][-1][:3, 3])
    assert err_mt < tol, f"MT final-pose deviation {err_mt}"

    # --- batched fleet (2 agents, shared graph, same sequence) ---
    B = 2
    fleet = MultiAgentSlam(golden_config(), n_agents=B)
    fleet_per_scan = []
    for i in range(N_SCANS):
        Ts = np.stack([odom[i]] * B)
        fleet.add_data_batch(i, "world", Ts, T_rs, [scans[i]] * B)
        fleet_per_scan.append(fleet.poses().copy())
    fleet_per_scan = np.stack(fleet_per_scan)          # [n, B, 4, 4]
    for b in range(B):
        errs = _pose_errs(fleet_per_scan[:, b], golden["per_scan"])
        assert errs.max() < tol, f"fleet agent {b} max dev {errs.max()}"

    # --- sharded fleet (dp=2 x tp=4 mesh, full sharded registration) ---
    mesh = make_mesh(8, tp=4)
    sharded = MultiAgentSlam(golden_config(), n_agents=B, mesh=mesh)
    sh_per_scan = []
    for i in range(N_SCANS):
        Ts = np.stack([odom[i]] * B)
        sharded.add_data_batch(i, "world", Ts, T_rs, [scans[i]] * B)
        sh_per_scan.append(sharded.poses().copy())
    sh_per_scan = np.stack(sh_per_scan)
    for b in range(B):
        errs = _pose_errs(sh_per_scan[:, b], golden["per_scan"])
        assert errs.max() < tol, f"sharded agent {b} max dev {errs.max()}"

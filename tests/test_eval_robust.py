"""Trajectory metrics (ATE/RPE) + robust PGO kernel tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pgslam_tpu import se3
from pgslam_tpu.eval import ate_rmse, rpe, align_umeyama
from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph


def _ring(V, rng, noise=0.05):
    ang = 2 * np.pi * np.arange(V) / V
    R = np.asarray(se3.exp_so3(jnp.asarray(
        np.stack([np.zeros(V), np.zeros(V), ang], -1), jnp.float32)))
    t = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                  np.zeros(V)], -1).astype(np.float32)
    poses = np.asarray(se3.make(jnp.asarray(R), jnp.asarray(t)))
    init = poses.copy()
    init[1:] = init[1:] @ np.asarray(jax.vmap(se3.exp)(jnp.asarray(
        rng.normal(size=(V - 1, 6)) * noise, jnp.float32)))
    return poses, init


def test_ate_zero_on_identical():
    rng = np.random.default_rng(0)
    poses, _ = _ring(32, rng)
    assert ate_rmse(poses, poses) < 1e-9


def test_ate_invariant_to_rigid_offset():
    rng = np.random.default_rng(0)
    poses, _ = _ring(32, rng)
    off = np.asarray(se3.exp(jnp.asarray([5.0, -2.0, 1.0, 0.3, 0.2, -0.4],
                                         jnp.float32)), np.float64)
    moved = np.einsum("ij,vjk->vik", off, poses.astype(np.float64))
    assert ate_rmse(moved, poses, align=True) < 1e-5
    assert ate_rmse(moved, poses, align=False) > 1.0


def test_rpe_measures_drift():
    rng = np.random.default_rng(1)
    poses, init = _ring(64, rng, noise=0.02)
    t_err, r_err = rpe(init, poses, delta=1)
    assert 0.001 < t_err < 0.2
    t0, r0 = rpe(poses, poses, delta=4)
    assert t0 < 1e-9 and r0 < 1e-9


def test_umeyama_recovers_scale():
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(50, 3))
    Rg, _, _ = align_umeyama(pts, pts * 2.5, with_scale=False)
    _, _, s = align_umeyama(pts, pts * 2.5, with_scale=True)
    assert abs(s - 2.5) < 1e-6


def _ring_graph(V, rng, bad_loop=False):
    poses, init = _ring(V, rng, noise=0.03)
    ef = np.arange(V - 1, dtype=np.int32)
    et = np.arange(1, V, dtype=np.int32)
    Ts = np.einsum("eij,ejk->eik", np.linalg.inv(poses[ef]),
                   poses[et]).astype(np.float32)
    # closing edge
    ef = np.concatenate([ef, [V - 1]]).astype(np.int32)
    et = np.concatenate([et, [0]]).astype(np.int32)
    T_close = (np.linalg.inv(poses[V - 1]) @ poses[0]).astype(np.float32)
    if bad_loop:
        # a grossly wrong loop measurement (e.g. aliased corridor match)
        T_close = T_close.copy()
        T_close[:3, 3] += np.array([4.0, -3.0, 1.0], np.float32)
    Ts = np.concatenate([Ts, T_close[None]])
    E = len(ef)
    # Realistic ICP-odometry covariance: sigma_t = 0.1 m, sigma_r = 0.01
    # rad. Tight rotations matter: with sloppy rotation noise a chain
    # anchored at one end can cheaply "hinge" at a single edge and swing
    # toward any outlier target, robust kernel or not.
    cov6 = np.diag([0.01, 0.01, 0.01, 1e-4, 1e-4, 1e-4]).astype(np.float32)
    covs = np.tile(cov6, (E, 1, 1))
    args = (jnp.asarray(init), jnp.ones(V, bool), jnp.asarray(ef),
            jnp.asarray(et), jnp.asarray(Ts), jnp.asarray(covs),
            jnp.ones(E, bool), jnp.int32(0))
    rmask = np.zeros(E, bool)
    rmask[-1] = True   # robustify the loop-closure edge only
    return poses, args, jnp.asarray(rmask)


@pytest.mark.slow
def test_redescending_kernels_shrug_off_bad_loop_edge():
    # A gross outlier (aliased match, 5 m off) with tight covariance:
    # Huber's linear tail still pulls meters against the near-zero
    # quadratic odometry costs, but the redescending kernels drive its
    # influence toward zero.
    rng = np.random.default_rng(3)
    V = 64
    poses, args, rmask = _ring_graph(V, rng, bad_loop=True)
    plain, _ = optimize_pose_graph(
        *args, config=PGOConfig(max_iterations=15, cg_iterations=50))
    err_plain = ate_rmse(np.asarray(plain), poses, align=False)
    assert err_plain > 1.0  # the Gaussian solution is bent by the outlier
    for kernel in ("cauchy", "gm"):
        robust, _ = optimize_pose_graph(
            *args, robust_emask=rmask,
            config=PGOConfig(max_iterations=15, cg_iterations=50,
                             robust=kernel, robust_delta=1.0))
        err_robust = ate_rmse(np.asarray(robust), poses, align=False)
        assert err_robust < 0.15, (kernel, err_plain, err_robust)


@pytest.mark.slow
def test_huber_matches_plain_on_clean_graph():
    rng = np.random.default_rng(4)
    poses, args, rmask = _ring_graph(48, rng, bad_loop=False)
    plain, _ = optimize_pose_graph(
        *args, config=PGOConfig(max_iterations=15, cg_iterations=50))
    robust, _ = optimize_pose_graph(
        *args, robust_emask=rmask,
        config=PGOConfig(max_iterations=15, cg_iterations=50,
                         robust="huber", robust_delta=3.0))
    np.testing.assert_allclose(np.asarray(robust), np.asarray(plain),
                               atol=2e-3)


def test_facade_robust_plumbing():
    """The Optimizer component passes a loop-only robust mask through."""
    from pgslam_tpu.optimizer import Optimizer, OptimizerConfig
    from pgslam_tpu.graph.pose_graph import MapManager
    from pgslam_tpu.cloud import make_cloud
    rng = np.random.default_rng(5)
    mm = MapManager()
    opt = Optimizer(mm, OptimizerConfig(
        pgo=PGOConfig(max_iterations=5, robust="cauchy")))
    c = make_cloud(rng.uniform(-1, 1, (32, 3)).astype(np.float32),
                   capacity=32)
    v0 = mm.add_first_keyframe(c, np.eye(4, dtype=np.float32))
    T1 = np.eye(4, dtype=np.float32); T1[0, 3] = 1.0
    v1 = mm.add_new_keyframe(v0, T1, np.eye(4, dtype=np.float32),
                             np.eye(6, dtype=np.float32) * 0.01, c)
    T2 = np.eye(4, dtype=np.float32); T2[0, 3] = 2.0
    v2 = mm.add_new_keyframe(v1, T2, T1, np.eye(6, dtype=np.float32) * 0.01,
                             c)
    opt.add_new_data(v2, v0, np.linalg.inv(T2).astype(np.float32),
                     np.eye(6, dtype=np.float32) * 0.01)
    g = mm.get_graph()
    assert g.n_edges == 3
    assert np.isfinite(g.optimized_poses[:3]).all()

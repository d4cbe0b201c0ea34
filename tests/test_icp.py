import jax.numpy as jnp
import numpy as np
import pytest

from pgslam_tpu import se3
from pgslam_tpu.cloud import make_cloud, transform_cloud
from pgslam_tpu.ops import minimizer as M
from pgslam_tpu.ops import outlier as O
from pgslam_tpu.ops.icp import (ICPConfig, ICPEngine, compute_overlap,
                                compute_residual, icp)


def box_cloud(rng, n=1000, scale=5.0):
    """Random points on the surface of a box (gives ICP full 6-dof
    constraints and well-defined normals)."""
    face = rng.integers(0, 6, size=n)
    uv = rng.uniform(-1, 1, size=(n, 2)) * scale
    pts = np.zeros((n, 3), np.float32)
    axis = face % 3
    sign = np.where(face < 3, 1.0, -1.0) * scale
    for i in range(n):
        others = [a for a in range(3) if a != axis[i]]
        pts[i, axis[i]] = sign[i]
        pts[i, others[0]] = uv[i, 0]
        pts[i, others[1]] = uv[i, 1]
    return pts


TRUE_TWIST = np.array([0.3, -0.2, 0.1, 0.05, -0.04, 0.08], np.float32)


def _recover(cfg, rng, noise=0.0, n=800):
    pts = box_cloud(rng, n)
    ref = make_cloud(pts, capacity=1024)
    T_true = se3.exp(jnp.asarray(TRUE_TWIST))
    # reading = ref transformed into a "robot" frame: reading = T_true^-1 ref
    reading_pts = np.asarray(se3.apply(se3.inverse(T_true), jnp.asarray(pts)))
    if noise:
        reading_pts = reading_pts + rng.normal(size=reading_pts.shape) * noise
    reading = make_cloud(reading_pts.astype(np.float32), capacity=1024)
    result = icp(reading, ref, se3.identity(), cfg)
    return result, T_true


def test_point_to_point_recovers_transform(rng):
    cfg = ICPConfig(error="point_to_point", max_iterations=60,
                    outlier=(O.TrimmedDist(0.95),))
    result, T_true = _recover(cfg, rng)
    err = np.asarray(se3.log(se3.inverse(result.T) @ T_true))
    assert np.linalg.norm(err) < 1e-3
    assert bool(result.converged)
    assert not bool(result.max_iter_reached)
    assert float(result.overlap) > 0.9


def test_point_to_plane_recovers_transform(rng):
    cfg = ICPConfig(error="point_to_plane", max_iterations=40,
                    outlier=(O.TrimmedDist(0.95),))
    result, T_true = _recover(cfg, rng)
    err = np.asarray(se3.log(se3.inverse(result.T) @ T_true))
    assert np.linalg.norm(err) < 1e-3


def test_icp_with_noise_and_outliers(rng):
    cfg = ICPConfig(error="point_to_point", max_iterations=60,
                    outlier=(O.TrimmedDist(0.85),))
    result, T_true = _recover(cfg, rng, noise=0.01)
    err = np.asarray(se3.log(se3.inverse(result.T) @ T_true))
    assert np.linalg.norm(err) < 0.05


def test_icp_engine_persistent_map(rng):
    pts = box_cloud(rng, 500)
    ref = make_cloud(pts, capacity=512)
    engine = ICPEngine(ICPConfig(max_iterations=50,
                                 outlier=(O.TrimmedDist(0.95),)))
    engine.set_map(ref)
    assert engine.has_map
    T_true = se3.exp(jnp.asarray(TRUE_TWIST * 0.5))
    reading = make_cloud(
        np.asarray(se3.apply(se3.inverse(T_true), jnp.asarray(pts))),
        capacity=512)
    r1 = engine(reading, se3.identity())
    err = np.asarray(se3.log(se3.inverse(r1.T) @ T_true))
    assert np.linalg.norm(err) < 1e-3
    # Second call reuses the map and compiled function.
    r2 = engine(reading, r1.T)
    assert np.linalg.norm(np.asarray(se3.log(se3.inverse(r2.T) @ T_true))) < 1e-3


def test_engine_fused_prep_matches_split_path(rng):
    # ICPEngine.__call__ fuses the reading-filter chain + registration
    # into one dispatch when no host-side grid index exists
    # (_prep_and_register). It must be numerically identical to the
    # explicit prepare_reading -> icp_core split (same chain + core,
    # traced inline under one jit).
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops.icp import icp_core
    pts = box_cloud(rng, 800)
    ref = make_cloud(pts, capacity=1024)
    cfg = ICPConfig(max_iterations=20,
                    reading_filters=(F.VoxelGrid(0.15, 1 << 12),
                                     F.Compact(512)),
                    outlier=(O.TrimmedDist(0.95),))
    engine = ICPEngine(cfg)
    engine.set_map(ref)
    T_true = se3.exp(jnp.asarray(TRUE_TWIST * 0.5))
    reading = make_cloud(
        np.asarray(se3.apply(se3.inverse(T_true), jnp.asarray(pts))),
        capacity=1024)
    fused = engine(reading, se3.identity())
    split = icp_core(engine.prepare_reading(reading), engine._reference,
                     se3.identity(), cfg, None)
    np.testing.assert_allclose(np.asarray(fused.T), np.asarray(split.T),
                               atol=1e-6)
    assert int(fused.iterations) == int(split.iterations)
    err = np.asarray(se3.log(se3.inverse(fused.T) @ T_true))
    assert np.linalg.norm(err) < 5e-3


def test_max_iter_reached_flag(rng):
    cfg = ICPConfig(max_iterations=1, trans_eps=1e-12, rot_eps=1e-12)
    result, _ = _recover(cfg, rng)
    assert bool(result.max_iter_reached)
    assert not bool(result.converged)


def test_overlap_probe_and_residual(rng):
    pts = box_cloud(rng, 400)
    ref = make_cloud(pts, capacity=512)
    reading = make_cloud(pts, capacity=512)
    cfg = ICPConfig(outlier=(O.MaxDist(max_dist=0.5),))
    ov_good = float(compute_overlap(reading, ref, se3.identity(), cfg))
    assert ov_good > 0.99
    res_good = float(compute_residual(reading, ref, se3.identity(), cfg))
    assert res_good < 1e-4
    # Shifted far away: overlap collapses.
    T_far = se3.exp(jnp.asarray([50.0, 0, 0, 0, 0, 0], jnp.float32))
    ov_bad = float(compute_overlap(reading, ref, T_far, cfg))
    assert ov_bad < 0.05


def test_covariance_shape_and_spd(rng):
    cfg = ICPConfig(error="point_to_plane", max_iterations=30)
    result, _ = _recover(cfg, rng, noise=0.01)
    cov = np.asarray(result.cov)
    assert cov.shape == (6, 6)
    np.testing.assert_allclose(cov, cov.T, atol=1e-8)
    eigvals = np.linalg.eigvalsh(cov)
    assert np.all(eigvals > 0)


def test_umeyama_exact(rng):
    p = rng.normal(size=(100, 3)).astype(np.float32)
    T = se3.exp(jnp.asarray([1.0, -2.0, 0.5, 0.4, 0.3, -0.2], jnp.float32))
    q = np.asarray(se3.apply(T, jnp.asarray(p)))
    elems = M.ErrorElements(reading=jnp.asarray(p), reference=jnp.asarray(q),
                            weights=jnp.ones(100))
    delta = M.point_to_point(elems)
    np.testing.assert_allclose(np.asarray(delta), np.asarray(T), atol=1e-4)

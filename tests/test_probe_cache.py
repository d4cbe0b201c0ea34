"""Overlap-probe candidate-map caching (localizer._cached_probe_map).

The probe's candidate map depends only on the composition and its
members' graph poses, so it is cached across scans keyed on
(composition items, member update_times). These tests pin:
- cache hit: second probe call does NOT rebuild the map;
- invalidation: a graph pose writeback (update_times bump) rebuilds;
- equivalence: the split cached path returns the same overlap as the
  original single-dispatch probe body (_probe_overlap_impl).
"""

import numpy as np
import pytest

import pgslam_tpu.localizer as L
from pgslam_tpu.cloud import make_cloud
from pgslam_tpu.graph.pose_graph import ODOM_CONSTRAINT, MapManager
from pgslam_tpu.localizer import Localizer, LocalizerConfig
from pgslam_tpu.localmap import Composition, LocalMap, stack_composition
from pgslam_tpu.ops import filters as F
from pgslam_tpu.ops import outlier as O
from pgslam_tpu.ops.icp import ICPConfig


def T_at(x, y=0.0):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [x, y, 0.0]
    return T


CAP = 256


def _cloud(rng, x=0.0):
    pts = rng.normal(size=(CAP, 3)).astype(np.float32) * [3.0, 3.0, 0.5]
    pts[:, 0] += x
    return make_cloud(pts, capacity=CAP)


def _icp_cfg():
    return ICPConfig(
        error="point_to_point", matcher="brute",
        reference_filters=(F.Compact(CAP * 3),),
        outlier=(O.TrimmedDist(0.9), O.MaxDist(2.0)),
        max_iterations=3)


def build(rng):
    mm = MapManager()
    mm.add_first_keyframe(_cloud(rng, 0.0), T_at(0.0))
    for i, x in enumerate((1.0, 2.0), start=1):
        mm.graph.add_vertex(_cloud(rng, 0.0), T_at(x), mm.now())
        mm.graph.add_edge(i - 1, i, T_at(1.0),
                          np.eye(6, dtype=np.float32), ODOM_CONSTRAINT)
    loc = Localizer(mm, LocalizerConfig(icp=_icp_cfg(),
                                        keyframe_cloud_capacity=CAP))
    loc.local_map = LocalMap.from_graph(mm.get_graph(),
                                        Composition(3, [0, 1, 2]))
    loc.T_world_robot = T_at(1.0)
    loc.input_cloud = _cloud(rng, 1.0)
    return mm, loc


def test_probe_cache_hit_and_equivalence(rng, monkeypatch):
    mm, loc = build(rng)
    comp = Composition(3, [0, 1, 2])

    calls = {"n": 0}
    orig_build = L._probe_build

    def counting_build(*a, **kw):
        calls["n"] += 1
        return orig_build(*a, **kw)

    monkeypatch.setattr(L, "_probe_build", counting_build)
    ov1 = loc.compute_overlap_with(comp)
    ov2 = loc.compute_overlap_with(comp)
    assert calls["n"] == 1, "second probe must hit the cache"
    assert ov1 == pytest.approx(ov2, abs=0.0)
    assert 0.0 < ov1 <= 1.0

    # Equivalence with the original fused probe body.
    cfg = loc.config.icp
    stacked = stack_composition(mm.get_graph(), comp.as_list(),
                                comp.capacity)
    points, masks, descs, Ts, slot_valid, desc_keys, T_world_ref = stacked
    reading = loc.icp_engine.prepare_reading(loc.input_cloud)
    import jax.numpy as jnp
    ov_ref = float(L._probe_overlap_impl(
        points, masks, descs, Ts, slot_valid, T_world_ref, reading,
        jnp.asarray(loc.T_world_robot), desc_keys,
        cfg.reference_filters, cfg))
    assert ov1 == pytest.approx(ov_ref, abs=1e-5)


def test_probe_cache_invalidates_on_pose_writeback(rng, monkeypatch):
    mm, loc = build(rng)
    comp = Composition(3, [0, 1, 2])

    calls = {"n": 0}
    orig_build = L._probe_build

    def counting_build(*a, **kw):
        calls["n"] += 1
        return orig_build(*a, **kw)

    monkeypatch.setattr(L, "_probe_build", counting_build)
    ov1 = loc.compute_overlap_with(comp)
    assert calls["n"] == 1

    # Optimizer-style pose writeback bumps update_times -> rebuild.
    T_new = mm.get_graph().optimized_poses[1].copy()
    T_new[0, 3] += 0.5
    mm.update_keyframe_transform(1, T_new, mm.now())
    ov2 = loc.compute_overlap_with(comp)
    assert calls["n"] == 2, "pose writeback must invalidate the cache"
    assert ov2 != pytest.approx(ov1, abs=1e-6) or True  # value may differ

    # Different composition = its own entry.
    comp2 = Composition(3, [2, 1, 0])
    loc.compute_overlap_with(comp2)
    assert calls["n"] == 3
    assert len(loc._probe_cache) == 2


def test_probe_reading_reuse_matches_fresh_prep(rng):
    mm, loc = build(rng)
    comp = Composition(3, [0, 1, 2])
    reading = loc.icp_engine.prepare_reading(loc.input_cloud)
    ov_fresh = loc.compute_overlap_with(comp)
    ov_reuse = loc.compute_overlap_with(comp, reading=reading)
    assert ov_reuse == pytest.approx(ov_fresh, abs=1e-6)

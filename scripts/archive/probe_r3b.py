"""Headline-margin probes on the r3 HONEST protocol (run on the chip).

Replicates bench.py's batched pipeline exactly (corridor renders, int16
sensor stream, one fused dequant+prep+register dispatch) and A/Bs the
cheap margin levers:

  1. stage breakdown: host decimate copy / h2d / fused dispatch;
  2. max_iterations sweep {8,7,6,5} with the accuracy envelope each —
     iteration counts sit at the cap (trans_eps rarely fires on
     non-coincident matches) while mi20 A/B showed identical accuracy,
     so the cap itself may be paying dead iterations;
  3. convergence-eps sweep at mi=10: does a looser (but still sub-
     noise) eps let per-agent early exit fire where the cap doesn't?

Usage: python scripts/probe_r3b.py [B]   (default 128)
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


def main(B=128):
    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.cloud import Cloud, make_cloud, stack_clouds
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine
    from pgslam_tpu.parallel.batched import batched_register

    log(f"backend: {jax.devices()}")
    QSCALE = 1000.0
    rng = np.random.default_rng(0)
    world = corridor_world(rng, n_points=300000, length=120.0, width=8.0,
                           height=5.0)
    brng = np.random.default_rng(42)

    def agent_pose(b):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [5.0 + b * 0.85, 0.0, 1.8]
        return T

    t0 = time.perf_counter()
    map_raw = np.stack([
        render_scan(world, agent_pose(b), brng, 65536,
                    max_range=30.0, noise=0.01) for b in range(B)])
    read_raw = np.stack([
        render_scan(world, agent_pose(b), brng, 65536,
                    max_range=30.0, noise=0.01) for b in range(B)])
    log(f"rendered {2*B} scans: {time.perf_counter()-t0:.1f} s")
    twists = (brng.normal(size=(B, 6))
              * [0.15, 0.15, 0.03, 0.005, 0.005, 0.02]).astype(np.float32)
    offsets = np.asarray(jax.vmap(se3.exp)(jnp.asarray(twists)))
    inv = np.linalg.inv(offsets)
    readings_raw = (np.einsum("bij,bnj->bni", inv[:, :3, :3], read_raw)
                    + inv[:, None, :3, 3]).astype(np.float32)
    sensor_i16 = np.clip(np.round(readings_raw * QSCALE),
                         -32767, 32767).astype(np.int16)

    prep_chain = (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 15),
                  F.Compact(1024))
    pkey = jax.random.PRNGKey(0)

    def make_cfg(mi, teps=1e-4, reps=1e-4, ci=8):
        return ICPConfig(
            error="point_to_plane", matcher="pallas",
            pallas_precision="high",
            reference_filters=(F.VoxelGrid(voxel_size=0.2,
                                           hash_size=1 << 18),
                               F.Compact(8192),
                               F.SurfaceNormal(knn=8, tile_query=4096)),
            outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
            coarse_div=8, coarse_iterations=ci,
            max_iterations=mi, trans_eps=teps, rot_eps=reps)

    eng = ICPEngine(make_cfg(8))
    t0 = time.perf_counter()
    refs = stack_clouds([eng.prepare_reference(
        make_cloud(map_raw[b], capacity=65536)) for b in range(B)])
    refs = jax.block_until_ready(jax.device_put(refs))
    log(f"reference prep: {time.perf_counter()-t0:.1f} s")
    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))

    def fused_step_for(cfg):
        @jax.jit
        def fused_step(pts_i16, refs_, Ts_):
            pts_dev = pts_i16.astype(jnp.float32) * (1.0 / QSCALE)
            cloud = Cloud(points=pts_dev,
                          mask=jnp.ones(pts_dev.shape[:2], bool),
                          descriptors={})
            readings = jax.vmap(
                lambda c: F.apply_chain(prep_chain, c, pkey))(cloud)
            return batched_register(readings, refs_, Ts_, cfg)
        return fused_step

    def host_batch():
        return np.ascontiguousarray(sensor_i16[:, ::16])

    def run_case(tag, cfg, reps=6):
        step = fused_step_for(cfg)
        t0 = time.perf_counter()
        res = step(host_batch(), refs, T0)
        jax.block_until_ready(res.T)
        log(f"  [{tag}] compile+first: {time.perf_counter()-t0:.1f} s")
        t0 = time.perf_counter()
        for _ in range(reps):
            res = step(host_batch(), refs, T0)
        jax.block_until_ready(res.T)
        dt = (time.perf_counter() - t0) / reps
        en = np.linalg.norm(np.asarray(jax.vmap(
            lambda Tr, Tg: se3.log(se3.inverse(Tr) @ Tg))(
                res.T, jnp.asarray(offsets))), axis=1)
        its = np.asarray(res.iterations)
        log(f"  [{tag}] {dt*1e3:.1f} ms/batch = {B/dt:.0f} regs/s; "
            f"err q50/q90/max = {np.quantile(en, .5):.3f}/"
            f"{np.quantile(en, .9):.3f}/{en.max():.3f} m; "
            f"iters {its.min()}-{its.max()} mean {its.mean():.1f}")
        return dt

    log("== probe A: stage breakdown (mi=8 baseline) ==")
    t0 = time.perf_counter()
    for _ in range(10):
        hb = host_batch()
    log(f"  host decimate copy: {(time.perf_counter()-t0)/10*1e3:.1f} ms")
    hb = host_batch()
    for _ in range(2):
        dev = jax.block_until_ready(jax.device_put(hb))
    t0 = time.perf_counter()
    for _ in range(10):
        dev = jax.device_put(hb)
    jax.block_until_ready(dev)
    log(f"  h2d int16 [B,4096,3]: {(time.perf_counter()-t0)/10*1e3:.1f} ms")
    base = run_case("mi=8 baseline", make_cfg(8))

    log("== probe B: max_iterations sweep ==")
    for mi in (7, 6, 5):
        run_case(f"mi={mi}", make_cfg(mi))

    log("== probe C: eps sweep at mi=10 (early-exit headroom) ==")
    for teps, reps_ in ((3e-4, 3e-4), (1e-3, 1e-3)):
        run_case(f"mi=10 eps={teps:g}", make_cfg(10, teps, reps_))

    log(f"baseline {B/base:.0f} regs/s; done")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 128)

"""Chip A/B: Anderson-accelerated fused kernel vs the current bench cfg.

BENCH_NOTES "matcher-epilogue elimination" gates the cfg flip (bench
cfg_b -> anderson_m=3 / max_iterations=4) on a real-hardware A/B: the
CPU probe (scripts/probe_iters.py) shows the aa=3/mi=4 accuracy envelope
matches aa=0/mi=6, but AA adds per-iteration scalar row-math whose
Mosaic cost was unmeasured, and the AA kernel path had never executed on
the chip. This measures device-resident ms/batch and the accuracy
envelope for both configs on the bench's exact batched protocol
(B distinct corridor renders, stride-32 int16 packets, in-graph voxel
prep to the 1k working set, persistent prepped reference operands).

Usage: python scripts/probe_aa_chip.py [B] [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.cloud import Cloud, make_cloud, stack_clouds
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine
    from pgslam_tpu.ops.icp_pallas import prepare_fused_reference
    from pgslam_tpu.parallel.batched import batched_register

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    print(f"backend: {jax.devices()}  B={B}", flush=True)

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
    print(f"rendered {2*B} scans in {time.perf_counter()-t0:.1f} s",
          flush=True)
    twists = (brng.normal(size=(B, 6))
              * [0.15, 0.15, 0.03, 0.005, 0.005, 0.02]).astype(np.float32)
    offsets = np.asarray(jax.vmap(se3.exp)(jnp.asarray(twists)))
    inv = np.linalg.inv(offsets)
    readings_raw = (np.einsum("bij,bnj->bni", inv[:, :3, :3], read_raw)
                    + inv[:, None, :3, 3]).astype(np.float32)
    QSCALE = 1000.0
    sensor_i16 = np.clip(np.round(readings_raw[:, ::32] * QSCALE),
                         -32767, 32767).astype(np.int16)

    def cfg_of(mi, aa):
        return ICPConfig(
            error="point_to_plane", matcher="pallas",
            pallas_precision="high",
            reference_filters=(F.VoxelGrid(voxel_size=0.2,
                                           hash_size=1 << 18),
                               F.Compact(8192),
                               F.SurfaceNormal(knn=8, tile_query=4096)),
            outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
            coarse_div=8, coarse_iterations=8, anderson_m=aa,
            max_iterations=mi, trans_eps=1e-4, rot_eps=1e-4)

    prep_chain = (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 15),
                  F.Compact(1024))
    pkey = jax.random.PRNGKey(0)

    eng = ICPEngine(cfg_of(6, 0))
    t0 = time.perf_counter()
    refs = stack_clouds([eng.prepare_reference(
        make_cloud(map_raw[b], capacity=65536)) for b in range(B)])
    fref = prepare_fused_reference(refs)
    jax.block_until_ready(fref.refT)
    print(f"reference prep: {time.perf_counter()-t0:.1f} s", flush=True)

    Ts = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))
    pts_dev = jax.device_put(sensor_i16)

    @jax.jit
    def pose_errs(T_rec):
        d = jax.vmap(lambda Tr, Tg: se3.log(se3.inverse(Tr) @ Tg))(
            T_rec, jnp.asarray(offsets))
        return jnp.linalg.norm(d, axis=1)

    def make_step(cfg):
        @jax.jit
        def step_(pts_i16, refs_, fref_, Ts_):
            pts_f = pts_i16.astype(jnp.float32) * (1.0 / QSCALE)
            cloud = Cloud(points=pts_f,
                          mask=jnp.ones(pts_f.shape[:2], bool),
                          descriptors={})
            readings = jax.vmap(
                lambda c: F.apply_chain(prep_chain, c, pkey))(cloud)
            return batched_register(readings, refs_, Ts_, cfg,
                                    fused="auto", prepped_ref=fref_)
        return step_

    # Config list from argv[3:] as "mi,aa" pairs; default sweep below.
    pairs = ([tuple(int(x) for x in a.split(",")) for a in sys.argv[3:]]
             or [(6, 0), (4, 3), (3, 3), (4, 2)])
    for mi, aa in pairs:
        name = f"mi={mi:<2d} aa={aa}"
        step = make_step(cfg_of(mi, aa))
        t0 = time.perf_counter()
        res = step(pts_dev, refs, fref, Ts)
        jax.block_until_ready(res.T)
        compile_s = time.perf_counter() - t0
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(reps):
                res = step(pts_dev, refs, fref, Ts)
            jax.block_until_ready(res.T)
            dts.append((time.perf_counter() - t0) / reps * 1e3)
        en = np.asarray(pose_errs(res.T))
        its = np.asarray(res.iterations)
        print(f"{name}: {min(dts):.2f} ms/batch (loops "
              f"{dts[0]:.1f}/{dts[1]:.1f}; compile {compile_s:.1f} s) = "
              f"{B/min(dts)*1e3:.0f} regs/s  err q50/q90/max = "
              f"{np.quantile(en, 0.5):.4f}/{np.quantile(en, 0.9):.4f}/"
              f"{en.max():.4f} m  iters={its.min()}-{its.max()}",
              flush=True)


if __name__ == "__main__":
    main()

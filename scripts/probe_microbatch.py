"""Chip sweep for the micro-batched single-stream line (VERDICT r3
item 6, target >= 600 regs/s single-stream at 64k input).

The r4 lag-1 probe (probe_deferred_sync.py) showed the flagship
single-stream profile (2k reading / 8k reference) is COMPUTE-bound at
~1.9 ms/reg on the kernel, not dispatch-bound: micro-batching at that
working set tops out ~524 regs/s at B=8. This sweeps working set x
micro-batch to find the (accuracy-preserving) config that clears 600:
the batched headline already registers the same renders at a 1k reading
working set with the same few-cm accuracy (BENCH_NOTES r3 protocol).

Usage: python scripts/probe_microbatch.py
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

    print(f"backend: {jax.devices()}", flush=True)
    rng = np.random.default_rng(0)
    world = corridor_world(rng, n_points=300000, length=120.0, width=8.0,
                           height=5.0)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [20.0, 0.0, 1.8]
    pts = render_scan(world, pose, rng, 65536, max_range=30.0, noise=0.01)
    reading_pts = render_scan(world, pose, rng, 65536, max_range=30.0,
                              noise=0.01)
    offset = se3.exp(jnp.asarray([0.3, -0.2, 0.05, 0.01, -0.01, 0.02],
                                 jnp.float32))
    reading_np = np.asarray(
        se3.apply(se3.inverse(offset), jnp.asarray(reading_pts)))

    def cfg_for(read_n):
        return ICPConfig(
            error="point_to_plane", matcher="pallas",
            pallas_precision="high",
            reading_filters=(F.VoxelGrid(voxel_size=0.4,
                                         hash_size=1 << 17),
                             F.Compact(read_n)),
            reference_filters=(F.VoxelGrid(voxel_size=0.2,
                                           hash_size=1 << 18),
                               F.Compact(8192),
                               F.SurfaceNormal(knn=8, tile_query=4096)),
            outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
            coarse_div=8, coarse_iterations=8,
            max_iterations=5, trans_eps=1e-4, rot_eps=1e-4)

    read_ns = ([int(x) for x in sys.argv[1].split(",")]
               if len(sys.argv) > 1 else [1024, 2048])
    Bs = ([int(x) for x in sys.argv[2].split(",")]
          if len(sys.argv) > 2 else [4, 8, 16])
    for read_n in read_ns:
        bcfg = cfg_for(read_n)
        beng = ICPEngine(bcfg)
        base_ref = beng.prepare_reference(make_cloud(pts, capacity=65536))
        for B in Bs:
            refs = stack_clouds([base_ref] * B)
            fref = prepare_fused_reference(refs)
            jax.block_until_ready(fref.refT)
            raw_b = jnp.asarray(np.tile(reading_np[None], (B, 1, 1)))
            T0s = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))

            @jax.jit
            def stream_step(raw_, refs_, fref_, T0s_):
                cloud = Cloud(points=raw_,
                              mask=jnp.ones(raw_.shape[:2], bool),
                              descriptors={})
                readings = jax.vmap(lambda c: F.apply_chain(
                    bcfg.reading_filters, c, jax.random.PRNGKey(0)))(cloud)
                return batched_register(readings, refs_, T0s_, bcfg,
                                        prepped_ref=fref_)

            res = stream_step(raw_b, refs, fref, T0s)
            jax.block_until_ready(res.T)
            err = float(jnp.linalg.norm(
                se3.log(se3.inverse(res.T[0]) @ offset)))
            n_rep = max(64 // B, 8)
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(n_rep):
                    res = stream_step(raw_b, refs, fref, T0s)
                jax.block_until_ready(res.T)
                dt = (time.perf_counter() - t0) / (n_rep * B)
                best = dt if best is None else min(best, dt)
            print(f"read={read_n} B={B}: {best*1e3:.2f} ms/reg "
                  f"({1/best:.0f} regs/s), err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()

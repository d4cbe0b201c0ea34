"""Is the in-kernel trimmed-distance bisection (48 serial rounds of tiny
[1, NQ] ops per weights_of call, ~15 calls per agent) a dominant cost of
the fused ICP kernel? A/B the round count via PGSLAM_BISECT_ITERS.

Run per-variant in a fresh process (trace-time constant):
    for it in 48 24 12; do PGSLAM_BISECT_ITERS=$it python scripts/probe_bisect.py; done
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    iters = int(os.environ.get("PGSLAM_BISECT_ITERS", "0"))
    from pgslam_tpu.ops import icp_pallas
    if iters:  # override the multi-probe round count (probes stays 8)
        icp_pallas._bisect_kth.__defaults__ = (iters, 8)

    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.cloud import Cloud, make_cloud, stack_clouds
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine
    from pgslam_tpu.parallel.batched import batched_register

    B = 128
    cfg = ICPConfig(
        error="point_to_plane", matcher="pallas", pallas_precision="high",
        reading_filters=(F.VoxelGrid(voxel_size=0.4, hash_size=1 << 15),
                         F.Compact(1024)),
        reference_filters=(F.VoxelGrid(voxel_size=0.2, hash_size=1 << 18),
                           F.Compact(8192),
                           F.SurfaceNormal(knn=8, tile_query=4096)),
        outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
        coarse_div=8, coarse_iterations=8,
        max_iterations=6, trans_eps=1e-4, rot_eps=1e-4)
    rng = np.random.default_rng(0)
    world = corridor_world(rng, n_points=300000, length=120.0, width=8.0,
                           height=5.0)
    brng = np.random.default_rng(42)

    def agent_pose(b):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [5.0 + b * 0.85, 0.0, 1.8]
        return T

    # Small render set, tiled across agents (timing probe, not accuracy).
    NS = 16
    maps = [render_scan(world, agent_pose(b), brng, 65536, max_range=30.0,
                        noise=0.01) for b in range(NS)]
    reads = [render_scan(world, agent_pose(b), brng, 65536, max_range=30.0,
                         noise=0.01) for b in range(NS)]
    twists = (brng.normal(size=(B, 6)) * [0.15, 0.15, 0.03, 0.005, 0.005,
                                          0.02]).astype(np.float32)
    offsets = np.asarray(jax.vmap(se3.exp)(jnp.asarray(twists)))
    inv = np.linalg.inv(offsets)
    read_raw = np.stack([reads[b % NS] for b in range(B)])
    readings_raw = (np.einsum("bij,bnj->bni", inv[:, :3, :3], read_raw)
                    + inv[:, None, :3, 3]).astype(np.float32)

    eng = ICPEngine(cfg)
    refs = stack_clouds([eng.prepare_reference(
        make_cloud(maps[b % NS], capacity=65536)) for b in range(B)])
    refs = jax.block_until_ready(jax.device_put(refs))
    readings = jax.block_until_ready(jax.device_put(stack_clouds(
        [eng.prepare_reading(make_cloud(readings_raw[b], capacity=65536))
         for b in range(B)])))
    T0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))

    res = batched_register(readings, refs, T0, cfg)
    jax.block_until_ready(res.T)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        res = batched_register(readings, refs, T0, cfg)
    jax.block_until_ready(res.T)
    dt = (time.perf_counter() - t0) / reps
    en = np.linalg.norm(np.asarray(jax.vmap(
        lambda Tr, Tg: se3.log(se3.inverse(Tr) @ Tg))(
            res.T, jnp.asarray(offsets))), axis=1)
    print(f"bisect_iters={iters}: {dt*1e3:.2f} ms/batch "
          f"({B/dt:.0f} regs/s) err q50/max={np.quantile(en, .5):.3f}/"
          f"{en.max():.3f} m iters={np.asarray(res.iterations).min()}-"
          f"{np.asarray(res.iterations).max()}", flush=True)


if __name__ == "__main__":
    main()

"""Stage profile of the headline-bench fused step: where do the
~25 ms/batch between kernel-only (34.5 ms) and device-resident
(59.5 ms) go — dequant, VoxelGrid, Compact? And does prefetch depth=2
hide more of the h2d than depth=1?

Chip probe for the r3 pipeline work; stages timed as separate jits
(adds one dispatch floor each — compare ratios, not absolutes).
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
    from pgslam_tpu.cloud import Cloud, make_cloud, stack_clouds
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine
    from pgslam_tpu.parallel.batched import batched_register
    from pgslam_tpu.utils.prefetch import prefetch_batches

    B = 128
    QSCALE = 1000.0
    cfg_b = ICPConfig(
        error="point_to_plane", matcher="pallas", pallas_precision="high",
        reference_filters=(F.VoxelGrid(voxel_size=0.2, hash_size=1 << 18),
                           F.Compact(8192),
                           F.SurfaceNormal(knn=8, tile_query=4096)),
        outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
        coarse_div=8, coarse_iterations=8,
        max_iterations=6, trans_eps=1e-4, rot_eps=1e-4)
    prep_chain = (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 15),
                  F.Compact(1024))
    pkey = jax.random.PRNGKey(0)

    rng = np.random.default_rng(0)
    world = corridor_world(rng, n_points=300000, length=120.0, width=8.0,
                           height=5.0)
    brng = np.random.default_rng(42)

    def agent_pose(b):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [5.0 + b * 0.85, 0.0, 1.8]
        return T

    NS = 8
    maps = [render_scan(world, agent_pose(b), brng, 65536, max_range=30.0,
                        noise=0.01) for b in range(NS)]
    reads = [render_scan(world, agent_pose(b), brng, 65536, max_range=30.0,
                         noise=0.01) for b in range(NS)]
    read_raw = np.stack([reads[b % NS] for b in range(B)])
    sensor_i16 = np.clip(np.round(read_raw[:, ::16] * QSCALE),
                         -32767, 32767).astype(np.int16)

    eng = ICPEngine(cfg_b)
    refs = stack_clouds([eng.prepare_reference(
        make_cloud(maps[b % NS], capacity=65536)) for b in range(B)])
    refs = jax.block_until_ready(jax.device_put(refs))
    Ts = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))

    @jax.jit
    def dequant_only(pts_i16):
        return pts_i16.astype(jnp.float32) * (1.0 / QSCALE)

    @jax.jit
    def voxel_only(pts_dev):
        cloud = Cloud(points=pts_dev, mask=jnp.ones(pts_dev.shape[:2], bool),
                      descriptors={})
        return jax.vmap(lambda c: F.apply_chain(prep_chain[:1], c, pkey))(cloud)

    @jax.jit
    def prep_only(pts_dev):
        cloud = Cloud(points=pts_dev, mask=jnp.ones(pts_dev.shape[:2], bool),
                      descriptors={})
        return jax.vmap(lambda c: F.apply_chain(prep_chain, c, pkey))(cloud)

    @jax.jit
    def fused_step(pts_i16, refs_, Ts_):
        pts_dev = pts_i16.astype(jnp.float32) * (1.0 / QSCALE)
        cloud = Cloud(points=pts_dev, mask=jnp.ones(pts_dev.shape[:2], bool),
                      descriptors={})
        readings = jax.vmap(lambda c: F.apply_chain(prep_chain, c, pkey))(cloud)
        return batched_register(readings, refs_, Ts_, cfg_b)

    dev_i16 = jax.block_until_ready(jax.device_put(sensor_i16))

    def timeit(name, fn, *args, reps=10, sync=lambda r: r):
        r = fn(*args)
        jax.block_until_ready(sync(r))
        t0 = time.perf_counter()
        for _ in range(reps):
            r = fn(*args)
        jax.block_until_ready(sync(r))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name}: {dt:.2f} ms", flush=True)
        return dt

    timeit("dequant only", dequant_only, dev_i16)
    timeit("dequant+voxel", voxel_only, dequant_only(dev_i16),
           sync=lambda c: c.points)
    prepped = prep_only(dequant_only(dev_i16))
    timeit("dequant+voxel+compact", prep_only, dequant_only(dev_i16),
           sync=lambda c: c.points)
    timeit("register only (prepped)", batched_register, prepped, refs, Ts,
           cfg_b, sync=lambda r: r.T)
    timeit("fused step (device-resident)", fused_step, dev_i16, refs, Ts,
           sync=lambda r: r.T)

    # h2d-included loops at depth 1 and 2
    n_bat = 8
    packets = [np.ascontiguousarray(sensor_i16) for _ in range(n_bat)]
    for depth in (1, 2):
        res = None
        t0 = time.perf_counter()
        for dev in prefetch_batches(iter(packets), depth=depth):
            res = fused_step(dev, refs, Ts)
        jax.block_until_ready(res.T)
        dt = (time.perf_counter() - t0) / n_bat * 1e3
        print(f"pipeline loop depth={depth}: {dt:.2f} ms/batch "
              f"({B/dt*1e3:.0f} regs/s)", flush=True)


if __name__ == "__main__":
    main()

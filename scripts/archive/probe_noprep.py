"""A/B: is the in-graph VoxelGrid+Compact reading prep worth its
~25 ms/batch, or does direct stride decimation to the 1024-pt working
set match it on accuracy?

The rendered scans are rng.choice samples of the visible world — the
point ORDER is already random, so stride decimation is a uniform random
subsample. VoxelGrid additionally equalizes spatial density (near-field
returns dominate a raw LiDAR spin ~1/r^2). This probe measures whether
that equalization moves the headline protocol's accuracy at all, with
the bench's exact twist/offset recovery setup.

    PGSLAM_NOPREP=1 python scripts/probe_noprep.py   # stride variant
    PGSLAM_NOPREP=0 python scripts/probe_noprep.py   # voxel variant
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    noprep = os.environ.get("PGSLAM_NOPREP", "1") == "1"
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

    stride = 64 if noprep else 16   # straight to 1024 vs 4096-then-voxel
    sensor_i16 = np.clip(np.round(readings_raw[:, ::stride] * QSCALE),
                         -32767, 32767).astype(np.int16)

    eng = ICPEngine(cfg_b)
    refs = stack_clouds([eng.prepare_reference(
        make_cloud(maps[b % NS], capacity=65536)) for b in range(B)])
    refs = jax.block_until_ready(jax.device_put(refs))
    Ts = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))

    @jax.jit
    def fused_step(pts_i16, refs_, Ts_):
        pts_dev = pts_i16.astype(jnp.float32) * (1.0 / QSCALE)
        cloud = Cloud(points=pts_dev,
                      mask=jnp.ones(pts_dev.shape[:2], bool),
                      descriptors={})
        if not noprep:
            cloud = jax.vmap(
                lambda c: F.apply_chain(prep_chain, c, pkey))(cloud)
        return batched_register(cloud, refs_, Ts_, cfg_b)

    dev_i16 = jax.block_until_ready(jax.device_put(sensor_i16))
    res = fused_step(dev_i16, refs, Ts)
    jax.block_until_ready(res.T)
    t0 = time.perf_counter()
    reps = 10
    for _ in range(reps):
        res = fused_step(dev_i16, refs, Ts)
    jax.block_until_ready(res.T)
    dt = (time.perf_counter() - t0) / reps
    en = np.linalg.norm(np.asarray(jax.vmap(
        lambda Tr, Tg: se3.log(se3.inverse(Tr) @ Tg))(
            res.T, jnp.asarray(offsets))), axis=1)
    its = np.asarray(res.iterations)
    print(f"noprep={int(noprep)} (stride {stride}, h2d bytes "
          f"{sensor_i16.nbytes//1024} KiB): {dt*1e3:.2f} ms/batch "
          f"({B/dt:.0f} regs/s) err q50/q90/max="
          f"{np.quantile(en, .5):.3f}/{np.quantile(en, .9):.3f}/"
          f"{en.max():.3f} m iters={its.min()}-{its.max()}", flush=True)


if __name__ == "__main__":
    main()

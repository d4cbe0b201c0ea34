"""A/B: ICPEngine one-dispatch (fused prep+register) vs the old
two-dispatch path, on the bench's single-stream config. Chip probe."""

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
    from pgslam_tpu.cloud import make_cloud
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine, icp_core

    print(f"backend: {jax.devices()}", flush=True)
    cfg = ICPConfig(
        error="point_to_plane", matcher="pallas", pallas_precision="high",
        reading_filters=(F.VoxelGrid(voxel_size=0.4, hash_size=1 << 17),
                         F.Compact(2048)),
        reference_filters=(F.VoxelGrid(voxel_size=0.2, hash_size=1 << 18),
                           F.Compact(8192),
                           F.SurfaceNormal(knn=8, tile_query=4096)),
        outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
        coarse_div=8, coarse_iterations=8,
        max_iterations=10, trans_eps=1e-4, rot_eps=1e-4)
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
    reading = make_cloud(
        np.asarray(se3.apply(se3.inverse(offset), jnp.asarray(reading_pts))),
        capacity=65536)
    T0 = se3.identity()
    engine = ICPEngine(cfg)
    engine.set_map(make_cloud(pts, capacity=65536))
    jax.block_until_ready(engine.reference.points)

    def timeit(fn, reps=50):
        res = fn()
        jax.block_until_ready(res.T)
        t0 = time.perf_counter()
        for _ in range(reps):
            res = fn()
        jax.block_until_ready(res.T)
        return (time.perf_counter() - t0) / reps, res

    def two_dispatch():
        rd = engine.prepare_reading(reading)
        return icp_core(rd, engine.reference, T0, cfg, None)

    for tag, fn in (("fused 1-dispatch", lambda: engine(reading, T0)),
                    ("old 2-dispatch", two_dispatch),
                    ("fused 1-dispatch (again)",
                     lambda: engine(reading, T0))):
        dt, res = timeit(fn)
        err = np.linalg.norm(np.asarray(
            se3.log(se3.inverse(res.T) @ offset)))
        print(f"{tag}: {dt*1e3:.2f} ms ({1/dt:.0f} regs/s) "
              f"iters={int(res.iterations)} err={err:.2e}", flush=True)


if __name__ == "__main__":
    main()

"""Single-stream voxel-method A/B: does the sort-dedup VoxelGrid beat
the scatter-min race inside the one-dispatch 64k registration
(`ICPEngine.__call__` -> `_prep_and_register`)?

    PGSLAM_VOXEL_METHOD=scatter python scripts/probe_voxel_single.py
    PGSLAM_VOXEL_METHOD=sort    python scripts/probe_voxel_single.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    method = os.environ.get("PGSLAM_VOXEL_METHOD", "sort")
    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.cloud import make_cloud
    from pgslam_tpu.datasets import velodyne_like_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine

    cfg = ICPConfig(
        error="point_to_plane", matcher="pallas", pallas_precision="high",
        reading_filters=(F.VoxelGrid(0.4, 1 << 15, method=method),
                         F.Compact(2048)),
        reference_filters=(F.VoxelGrid(0.2, 1 << 18, method=method),
                           F.Compact(8192),
                           F.SurfaceNormal(knn=8, tile_query=4096)),
        outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
        coarse_div=8, coarse_iterations=8,
        max_iterations=8, trans_eps=1e-4, rot_eps=1e-4)
    rng = np.random.default_rng(0)
    pts = velodyne_like_scan(rng, n_points=65536)
    offset = se3.exp(jnp.asarray([0.1, 0.05, 0.02, 0.01, 0.005, 0.02]))
    moved = np.asarray(se3.apply(offset, jnp.asarray(pts)))

    eng = ICPEngine(cfg)
    eng.set_map(make_cloud(pts, capacity=65536))
    reading = make_cloud(moved, capacity=65536)
    T0 = jnp.eye(4)
    res = eng(reading, T0)
    jax.block_until_ready(res.T)
    t0 = time.perf_counter()
    n = 50
    for _ in range(n):
        res = eng(reading, T0)
    jax.block_until_ready(res.T)
    dt = (time.perf_counter() - t0) / n
    err = float(jnp.linalg.norm(se3.log(se3.inverse(res.T) @ offset)))
    print(f"voxel method={method}: {dt*1e3:.2f} ms/reg "
          f"({1/dt:.1f} regs/s) err={err:.2e} iters={int(res.iterations)}",
          flush=True)


if __name__ == "__main__":
    main()

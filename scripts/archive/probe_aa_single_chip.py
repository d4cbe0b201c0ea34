"""Chip A/B: Anderson acceleration on the single-stream bench profile.

The batched A/B (scripts/probe_aa_chip.py) showed the in-kernel AA
scalar cost nearly cancels the saved fine iterations at the 1k working
set; the single-stream profile runs 10 fine iterations on a 2k/8k set
through the XLA icp_core loop (ICPEngine one-dispatch), where each
saved iteration removes a matcher pass — a different trade. Measures
ms/registration and recovered-pose error per (max_iterations,
anderson_m) on the bench's exact single-stream setup.

Usage: python scripts/probe_aa_single_chip.py [reps]
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
    from pgslam_tpu.cloud import make_cloud
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 50
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
    reading = make_cloud(
        np.asarray(se3.apply(se3.inverse(offset), jnp.asarray(reading_pts))),
        capacity=65536)
    T0 = se3.identity()
    ref_cloud = make_cloud(pts, capacity=65536)

    def cfg_of(mi, aa):
        return ICPConfig(
            error="point_to_plane", matcher="pallas",
            pallas_precision="high",
            reading_filters=(F.VoxelGrid(voxel_size=0.4,
                                         hash_size=1 << 17),
                             F.Compact(2048)),
            reference_filters=(F.VoxelGrid(voxel_size=0.2,
                                           hash_size=1 << 18),
                               F.Compact(8192),
                               F.SurfaceNormal(knn=8, tile_query=4096)),
            outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
            coarse_div=8, coarse_iterations=8, anderson_m=aa,
            max_iterations=mi, trans_eps=1e-4, rot_eps=1e-4)

    # Config list from argv[2:] as "mi,aa" pairs; default sweep below.
    pairs = ([tuple(int(x) for x in a.split(",")) for a in sys.argv[2:]]
             or [(10, 0), (6, 3), (4, 3), (4, 2), (6, 0)])
    for mi, aa in pairs:
        name = f"mi={mi:<2d} aa={aa}"
        engine = ICPEngine(cfg_of(mi, aa))
        engine.set_map(ref_cloud)
        jax.block_until_ready(engine.reference.points)
        t0 = time.perf_counter()
        res = engine(reading, T0)
        jax.block_until_ready(res.T)
        compile_s = time.perf_counter() - t0
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(reps):
                res = engine(reading, T0)
            jax.block_until_ready(res.T)
            dts.append((time.perf_counter() - t0) / reps * 1e3)
        err = np.linalg.norm(np.asarray(
            se3.log(se3.inverse(res.T) @ offset)))
        print(f"{name}: {min(dts):.2f} ms/reg (loops {dts[0]:.2f}/"
              f"{dts[1]:.2f}; compile {compile_s:.1f} s) = "
              f"{1e3/min(dts):.0f} regs/s  err={err:.3e}  "
              f"iters={int(res.iterations)}", flush=True)


if __name__ == "__main__":
    main()

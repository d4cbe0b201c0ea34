"""Chip micro-probe: steady-state cost of one ops.icp.compute_overlap
dispatch at the config-4 probe shapes (2048-pt reading vs 8192-pt
filtered candidate map), pallas matcher. The stage profile shows ~50 ms
per cache-hit probe; this isolates whether that is the dispatch itself
or queue interference."""
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
    from pgslam_tpu.cloud import make_cloud
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine, compute_overlap

    print(f"backend: {jax.devices()}", flush=True)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from velodyne_slam import velodyne_config
    cfg = velodyne_config().localizer.icp

    rng = np.random.default_rng(0)
    world = corridor_world(rng, n_points=200000, length=60.0, width=8.0,
                           height=5.0)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [10.0, 0.0, 1.8]
    ref_pts = render_scan(world, T, rng, 65536, max_range=30.0, noise=0.01)
    read_pts = render_scan(world, T, rng, 65536, max_range=30.0, noise=0.01)

    eng = ICPEngine(cfg)
    ref = eng.prepare_reference(make_cloud(ref_pts, capacity=3 * 65536))
    reading = eng.prepare_reading(make_cloud(read_pts, capacity=65536))
    jax.block_until_ready(ref.points)
    jax.block_until_ready(reading.points)
    Tj = jnp.eye(4, dtype=jnp.float32)

    t0 = time.perf_counter()
    ov = compute_overlap(reading, ref, Tj, cfg)
    jax.block_until_ready(ov)
    print(f"compile+first: {time.perf_counter()-t0:.2f} s  ov={float(ov):.3f}",
          flush=True)

    for tag, sync_each in (("sync-every-call", True),
                           ("pipelined", False)):
        t0 = time.perf_counter()
        n = 30
        for _ in range(n):
            ov = compute_overlap(reading, ref, Tj, cfg)
            if sync_each:
                float(ov)
        jax.block_until_ready(ov)
        print(f"{tag}: {(time.perf_counter()-t0)/n*1e3:.2f} ms/call",
              flush=True)

    # With a fresh tiny h2d arg per call, like the probe's T_world_robot.
    t0 = time.perf_counter()
    n = 30
    for i in range(n):
        Th = np.eye(4, dtype=np.float32)
        Th[0, 3] = i * 1e-4
        ov = compute_overlap(reading, ref, jnp.asarray(Th), cfg)
        float(ov)
    print(f"sync + fresh-T h2d: {(time.perf_counter()-t0)/n*1e3:.2f} ms/call",
          flush=True)


if __name__ == "__main__":
    main()

"""Headline benchmark: ICP registrations/sec at 64k points/cloud.

Runs on whatever backend JAX resolves (the real TPU chip under the
driver). Prints exactly ONE JSON line on stdout:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
Auxiliary numbers (pose-graph optimize latency, per-stage timings) go to
stderr.

Baseline: the reference publishes no numbers; BASELINE.md records the
driver's estimate of single-digit scans/sec on CPU for the
libpointmatcher path — we use 5 regs/sec as the comparison point.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

BASELINE_REGS_PER_SEC = 5.0


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_icp_64k():
    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.cloud import make_cloud
    from pgslam_tpu.datasets import velodyne_like_scan
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.filters import compute_normals
    from pgslam_tpu.ops.gridknn import build_grid_index
    from pgslam_tpu.ops.icp import ICPConfig, icp_core

    log(f"backend: {jax.devices()}")
    cfg = ICPConfig(error="point_to_plane", matcher="grid",
                    grid_cell_size=1.0, grid_bucket_cap=8,
                    outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
                    max_iterations=12, trans_eps=1e-4, rot_eps=1e-4)
    rng = np.random.default_rng(0)
    pts = velodyne_like_scan(rng, n_points=65536)

    t0 = time.perf_counter()
    reference = make_cloud(pts, capacity=65536)
    reference = compute_normals(reference, knn=8, tile_query=8192)
    index = build_grid_index(reference.points, reference.mask,
                             cell_size=cfg.grid_cell_size,
                             bucket_cap=cfg.grid_bucket_cap)
    jax.block_until_ready(index.table)
    log(f"set_map (normals + grid build): {time.perf_counter()-t0:.2f}s "
        f"(includes compile)")

    offset = se3.exp(jnp.asarray([0.3, -0.2, 0.05, 0.01, -0.01, 0.02],
                                 jnp.float32))
    reading = make_cloud(
        np.asarray(se3.apply(se3.inverse(offset), jnp.asarray(pts))),
        capacity=65536)
    T0 = se3.identity()

    # Warmup / compile.
    t0 = time.perf_counter()
    res = icp_core(reading, reference, T0, cfg, index)
    jax.block_until_ready(res.T)
    log(f"first registration (compile+run): {time.perf_counter()-t0:.2f}s; "
        f"iters={int(res.iterations)} overlap={float(res.overlap):.3f} "
        f"converged={bool(res.converged)}")
    err = np.asarray(se3.log(se3.inverse(res.T) @ offset))
    log(f"recovered-transform error norm: {np.linalg.norm(err):.2e}")

    # Timed runs.
    n_reps = 20
    t0 = time.perf_counter()
    for _ in range(n_reps):
        res = icp_core(reading, reference, T0, cfg, index)
    jax.block_until_ready(res.T)
    dt = (time.perf_counter() - t0) / n_reps
    regs_per_sec = 1.0 / dt
    log(f"steady-state: {dt*1e3:.2f} ms/registration "
        f"({regs_per_sec:.1f} regs/sec) at 64k pts, "
        f"{int(res.iterations)} ICP iterations each")
    return regs_per_sec


def bench_pgo_1k():
    import jax
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph

    V, E = 1024, 2048
    rng = np.random.default_rng(1)
    # Ring of 1024 poses + random loop edges.
    angles = 2 * np.pi * np.arange(V) / V
    poses = np.asarray(jax.vmap(se3.exp)(jnp.asarray(
        np.stack([10 * np.cos(angles), 10 * np.sin(angles),
                  np.zeros(V), np.zeros(V), np.zeros(V), angles], -1),
        jnp.float32)))
    ef = np.concatenate([np.arange(V - 1), rng.integers(0, V, E - V + 1)])
    et = np.concatenate([np.arange(1, V), rng.integers(0, V, E - V + 1)])
    dup = ef == et
    et[dup] = (et[dup] + 1) % V
    Ts = np.einsum("eij,ejk->eik",
                   np.linalg.inv(poses[ef]), poses[et]).astype(np.float32)
    covs = np.tile((np.eye(6) * 0.01).astype(np.float32), (E, 1, 1))
    init = poses.copy()
    init[1:] = init[1:] @ np.asarray(
        jax.vmap(se3.exp)(jnp.asarray(
            rng.normal(size=(V - 1, 6)) * 0.05, jnp.float32)))
    args = (jnp.asarray(init), jnp.ones(V, bool), jnp.asarray(ef, jnp.int32),
            jnp.asarray(et, jnp.int32), jnp.asarray(Ts), jnp.asarray(covs),
            jnp.ones(E, bool), jnp.int32(0))
    cfg = PGOConfig(max_iterations=10, cg_iterations=50)
    out, stats = optimize_pose_graph(*args, config=cfg)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out, stats = optimize_pose_graph(*args, config=cfg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    log(f"pose-graph optimize 1k poses / 2k edges: {dt:.2f} ms "
        f"(cost {float(stats['initial_cost']):.2e} -> "
        f"{float(stats['final_cost']):.2e}, "
        f"{int(stats['iterations'])} LM iters)")
    return dt


def main():
    regs_per_sec = bench_icp_64k()
    try:
        bench_pgo_1k()
    except Exception as e:  # aux metric must never kill the headline
        log(f"pgo bench failed: {e}")
    print(json.dumps({
        "metric": "icp_registrations_per_sec_64k",
        "value": round(regs_per_sec, 2),
        "unit": "registrations/sec",
        "vs_baseline": round(regs_per_sec / BASELINE_REGS_PER_SEC, 2),
    }))


if __name__ == "__main__":
    main()

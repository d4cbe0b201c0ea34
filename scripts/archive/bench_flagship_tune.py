"""Flagship throughput tuning on the real chip: batched registration at
several (batch, working-set, precision) points + PGO assembly modes.

Run WITHOUT platform override. Prints one line per configuration.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
import sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from pgslam_tpu import se3
from pgslam_tpu.cloud import make_cloud, stack_clouds
from pgslam_tpu.datasets import velodyne_like_scan
from pgslam_tpu.ops import filters as F
from pgslam_tpu.ops import outlier as O
from pgslam_tpu.ops.icp import ICPConfig, ICPEngine
from pgslam_tpu.parallel.batched import batched_register

print("backend:", jax.devices(), flush=True)
rng = np.random.default_rng(0)
pts = velodyne_like_scan(rng, n_points=65536)
offset = se3.exp(jnp.asarray([0.3, -0.2, 0.05, 0.01, -0.01, 0.02],
                             jnp.float32))
reading_pts = np.asarray(se3.apply(se3.inverse(offset), jnp.asarray(pts)))


def make_cfg(n_read, n_ref, prec, aa=3, iters=10, c2f=True):
    extra = dict(coarse_div=8, coarse_iterations=8) if c2f else {}
    return ICPConfig(
        error="point_to_plane", matcher="pallas", pallas_precision=prec,
        reading_filters=(F.VoxelGrid(voxel_size=0.4, hash_size=1 << 17),
                         F.Compact(n_read)),
        reference_filters=(F.VoxelGrid(voxel_size=0.2, hash_size=1 << 18),
                           F.Compact(n_ref),
                           F.SurfaceNormal(knn=8, tile_query=4096)),
        outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
        anderson_m=aa,
        max_iterations=iters, trans_eps=1e-4, rot_eps=1e-4, **extra)


def run_point(B, n_read, n_ref, prec):
    cfg = make_cfg(n_read, n_ref, prec)
    engine = ICPEngine(cfg)
    engine.set_map(make_cloud(pts, capacity=65536))
    reading = engine.prepare_reading(make_cloud(reading_pts, capacity=65536))
    T0 = se3.identity()
    readings = stack_clouds([reading] * B)
    refs = stack_clouds([engine.reference] * B)
    T0s = jnp.tile(T0, (B, 1, 1))
    t0 = time.perf_counter()
    res = batched_register(readings, refs, T0s, cfg)
    jax.block_until_ready(res.T)
    compile_s = time.perf_counter() - t0
    reps = 8
    t0 = time.perf_counter()
    for _ in range(reps):
        res = batched_register(readings, refs, T0s, cfg)
    jax.block_until_ready(res.T)
    dt = (time.perf_counter() - t0) / reps
    err = np.asarray(se3.log(se3.inverse(res.T[0]) @ offset))
    print(f"B={B:3d} read={n_read:5d} ref={n_ref:5d} prec={prec:7s}: "
          f"{dt*1e3:8.2f} ms/batch = {B/dt:7.1f} regs/s  "
          f"iters={int(res.iterations[0]):2d} err={np.linalg.norm(err):.2e} "
          f"ov={float(res.overlap[0]):.3f} (compile {compile_s:.1f}s)",
          flush=True)
    return B / dt


points = [
    (64, 2048, 8192, "high"),
    (128, 2048, 8192, "high"),
    (128, 1024, 8192, "high"),
    (256, 2048, 8192, "high"),
    (128, 2048, 8192, "default"),
]
best = 0.0
for B, nr, nf, prec in points:
    try:
        best = max(best, run_point(B, nr, nf, prec))
    except Exception as e:
        print(f"B={B} read={nr} ref={nf} prec={prec}: FAILED {e}",
              flush=True)
print(f"best: {best:.1f} regs/s", flush=True)

# ---- PGO assembly comparison at V=1024 / E=2048 ----
from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph

V, E = 1024, 2048
angles = 2 * np.pi * np.arange(V) / V
R = np.asarray(se3.exp_so3(jnp.asarray(
    np.stack([np.zeros(V), np.zeros(V), angles], -1), jnp.float32)))
t = np.stack([10 * np.cos(angles), 10 * np.sin(angles),
              np.zeros(V)], -1).astype(np.float32)
poses = np.asarray(se3.make(jnp.asarray(R), jnp.asarray(t)))
ef = np.concatenate([np.arange(V - 1), rng.integers(0, V, E - V + 1)])
et = np.concatenate([np.arange(1, V), rng.integers(0, V, E - V + 1)])
dup = ef == et
et[dup] = (et[dup] + 1) % V
Ts = np.einsum("eij,ejk->eik",
               np.linalg.inv(poses[ef]), poses[et]).astype(np.float32)
covs = np.tile((np.eye(6) * 0.01).astype(np.float32), (E, 1, 1))
init = poses.copy()
init[1:] = init[1:] @ np.asarray(
    jax.vmap(se3.exp)(jnp.asarray(rng.normal(size=(V - 1, 6)) * 0.05,
                                  jnp.float32)))
args = (jnp.asarray(init), jnp.ones(V, bool), jnp.asarray(ef, jnp.int32),
        jnp.asarray(et, jnp.int32), jnp.asarray(Ts), jnp.asarray(covs),
        jnp.ones(E, bool), jnp.int32(0))
for assembly in ["incidence", "scatter"]:
    cfg = PGOConfig(max_iterations=4, cg_iterations=30, cg_tol=1e-3,
                    assembly=assembly)
    out, stats = optimize_pose_graph(*args, config=cfg)
    jax.block_until_ready(out)
    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        out, stats = optimize_pose_graph(*args, config=cfg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    errs = np.linalg.norm(np.asarray(out)[:, :3, 3] - poses[:, :3, 3],
                          axis=1)
    print(f"pgo {assembly:9s} V=1024 E=2048: {dt:7.2f} ms "
          f"(max pose err {errs.max()*100:.2f} cm, "
          f"{int(stats['iterations'])} LM iters)", flush=True)

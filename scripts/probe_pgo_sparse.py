"""Probe: fused-LM on a realistic SPARSE pose graph — odometry chain of
V poses + a small number of loop closures (the real-world regime the
chain-aware lane layout targets). Usage:

    python scripts/probe_pgo_sparse.py [V] [n_loops]

Prints one line per config with wall ms and max pose error."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax
import jax.numpy as jnp

from pgslam_tpu import se3
from pgslam_tpu.optim import lm_pallas
from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph


def sparse_graph(V, n_loops, seed=1):
    """Circular corridor: V-pose odometry chain + n_loops closures
    between revisited segments (|i-j| large, like real SLAM)."""
    rng = np.random.default_rng(seed)
    ang = 2 * np.pi * np.arange(V) / V
    R = np.asarray(se3.exp_so3(jnp.asarray(
        np.stack([np.zeros(V), np.zeros(V), ang], -1), jnp.float32)))
    t = np.stack([30 * np.cos(ang), 30 * np.sin(ang),
                  np.zeros(V)], -1).astype(np.float32)
    poses = np.asarray(se3.make(jnp.asarray(R), jnp.asarray(t)))
    # odometry chain
    ef = list(range(V - 1))
    et = list(range(1, V))
    # sparse closures: far-apart pairs
    for _ in range(n_loops):
        i = int(rng.integers(0, V))
        j = int((i + V // 2 + rng.integers(-V // 8, V // 8)) % V)
        if i == j:
            j = (j + 1) % V
        ef.append(i)
        et.append(j)
    ef = np.asarray(ef)
    et = np.asarray(et)
    E = len(ef)
    Ts = np.einsum("eij,ejk->eik", np.linalg.inv(poses[ef]),
                   poses[et]).astype(np.float32)
    covs = np.tile((np.eye(6) * 0.01).astype(np.float32), (E, 1, 1))
    init = poses.copy()
    noise = np.asarray(jax.vmap(se3.exp)(jnp.asarray(
        rng.normal(size=(V - 1, 6)) * 0.03, jnp.float32)))
    init[1:] = init[1:] @ noise
    return (jnp.asarray(init), jnp.ones(V, bool),
            jnp.asarray(ef, jnp.int32), jnp.asarray(et, jnp.int32),
            jnp.asarray(Ts), jnp.asarray(covs), jnp.ones(E, bool),
            jnp.int32(0)), poses, E


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    n_loops = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    E = V - 1 + n_loops
    fits = lm_pallas.fits_vmem(V, E, n_loops)
    print(f"devices={jax.devices()} V={V} E={E} loops={n_loops} "
          f"fits_vmem={fits}", flush=True)
    args, gt, E = sparse_graph(V, n_loops)
    # Production protocol: the caller holds host edge ids and passes the
    # static chain count (Optimizer.prepare_for_optimization does).
    nl = lm_pallas.host_loop_count(np.asarray(args[2]), np.asarray(args[3]),
                                   V)
    cfg = PGOConfig(max_iterations=4, cg_iterations=40, cg_tol=1e-3,
                    solver="lm_pallas")
    variants = [("chain", nl)]
    if lm_pallas.fits_vmem(V, E, None):
        variants.append(("legacy", None))
    for name, nlv in variants:
        # Layout A/B: the dispatcher prefers legacy whenever it fits, so
        # the chain variant must be forced.
        os.environ["PGSLAM_PGO_FORCE_CHAIN"] = "1" if name == "chain" else ""
        t0 = time.perf_counter()
        out, st = optimize_pose_graph(*args, config=cfg, n_loop=nlv)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        n = 5
        t0 = time.perf_counter()
        for _ in range(n):
            out, st = optimize_pose_graph(*args, config=cfg, n_loop=nlv)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / n * 1e3
        err = np.linalg.norm(np.asarray(out)[:, :3, 3]
                             - gt[:, :3, 3], axis=1).max()
        print(f"OK [{name}] V={V} E={E} loops={n_loops}: {dt:.2f} ms "
              f"(compile {compile_s:.0f}s), max pose err {err*100:.1f} cm",
              flush=True)


if __name__ == "__main__":
    main()

"""Single-case probe: fused-LM at V=2048/E=4096 under the current
PGSLAM_PGO_VMEM_LIMIT. Prints one line."""

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


def ring(V, E):
    rng = np.random.default_rng(1)
    ang = 2 * np.pi * np.arange(V) / V
    R = np.asarray(se3.exp_so3(jnp.asarray(
        np.stack([np.zeros(V), np.zeros(V), ang], -1), jnp.float32)))
    t = np.stack([10 * np.cos(ang), 10 * np.sin(ang),
                  np.zeros(V)], -1).astype(np.float32)
    poses = np.asarray(se3.make(jnp.asarray(R), jnp.asarray(t)))
    ef = np.concatenate([np.arange(V - 1), rng.integers(0, V, E - V + 1)])
    et = np.concatenate([np.arange(1, V), rng.integers(0, V, E - V + 1)])
    dup = ef == et
    et[dup] = (et[dup] + 1) % V
    Ts = np.einsum("eij,ejk->eik", np.linalg.inv(poses[ef]),
                   poses[et]).astype(np.float32)
    covs = np.tile((np.eye(6) * 0.01).astype(np.float32), (E, 1, 1))
    init = poses.copy()
    init[1:] = init[1:] @ np.asarray(jax.vmap(se3.exp)(jnp.asarray(
        rng.normal(size=(V - 1, 6)) * 0.05, jnp.float32)))
    return (jnp.asarray(init), jnp.ones(V, bool),
            jnp.asarray(ef, jnp.int32), jnp.asarray(et, jnp.int32),
            jnp.asarray(Ts), jnp.asarray(covs), jnp.ones(E, bool),
            jnp.int32(0)), poses


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    E = 2 * V
    print(f"devices={jax.devices()} limit="
          f"{lm_pallas.VMEM_LIMIT_BYTES >> 20} MiB V={V}", flush=True)
    args, gt = ring(V, E)
    cfg = PGOConfig(max_iterations=4, cg_iterations=30, cg_tol=1e-3,
                    solver="lm_pallas")
    t0 = time.perf_counter()
    out, st = optimize_pose_graph(*args, config=cfg)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    n = 5
    for _ in range(n):
        out, st = optimize_pose_graph(*args, config=cfg)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / n * 1e3
    err = np.linalg.norm(np.asarray(out)[:, :3, 3]
                         - gt[:, :3, 3], axis=1).max()
    print(f"OK V={V} E={E}: {dt:.2f} ms (compile {compile_s:.0f}s), "
          f"max pose err {err*100:.1f} cm", flush=True)


if __name__ == "__main__":
    main()

"""Chip probe: the 32k-bucket HBM-streamed ranges tier (VERDICT r4
item 3). r5 chip history: the default 94M scoped-VMEM request OOMed
(actual demand 106.57M — the estimate missed a full Pt panel copy); the
raised-request A/B measured 123.3 ms at the 32768 bucket. The library
now requests up to VMEM_LIMIT_HBM_BYTES (120M, chip-verified grant) for
the hbm tier and its estimate carries the Pt term — this probe runs the
clean production path.

Usage: python scripts/probe_hbm32k.py [limit_mb_override]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

if len(sys.argv) > 1:
    os.environ["PGSLAM_PGO_VMEM_LIMIT_HBM"] = str(
        int(sys.argv[1]) * 1024 * 1024)

import numpy as np
import jax

from pgslam_tpu.optim import lm_pallas
from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph


def main():
    print(f"devices={jax.devices()} "
          f"hbm_limit={lm_pallas.VMEM_LIMIT_HBM_BYTES >> 20}M", flush=True)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from probe_pgo_factored import sparse
    args, gt = sparse(16420, 1036)
    # pad to the production 32768 bucket exactly like
    # Optimizer.prepare_for_optimization does
    V, E = 32768, 32768
    nv = args[0].shape[0]
    ne = args[2].shape[0]
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    poses[:nv] = np.asarray(args[0])
    vmask = np.zeros(V, bool)
    vmask[:nv] = True
    ef = np.zeros(E, np.int32)
    et = np.zeros(E, np.int32)
    eT = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    ec = np.tile(np.eye(6, dtype=np.float32), (E, 1, 1))
    em = np.zeros(E, bool)
    ef[:ne] = np.asarray(args[2])
    et[:ne] = np.asarray(args[3])
    eT[:ne] = np.asarray(args[4])
    ec[:ne] = np.asarray(args[5])
    em[:ne] = True
    nl = lm_pallas.host_loop_count(ef, et, V)
    cfg = PGOConfig(max_iterations=4, cg_iterations=40, cg_tol=1e-3)
    os.environ["PGSLAM_PGO_DEBUG"] = "1"
    t0 = time.perf_counter()
    out, st = optimize_pose_graph(poses, vmask, ef, et, eT, ec, em,
                                  np.int32(0), config=cfg, n_loop=nl)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(3):
            out, st = optimize_pose_graph(poses, vmask, ef, et, eT, ec,
                                          em, np.int32(0), config=cfg,
                                          n_loop=nl)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / 3 * 1e3)
    err = np.linalg.norm(np.asarray(out)[:nv, :3, 3]
                         - gt[:, :3, 3], axis=1).max()
    print(f"OK [32k-bucket rescue] V={V} E={E} nl={nl}: {min(dts):.2f} ms "
          f"(loops {dts[0]:.2f}/{dts[1]:.2f}, compile {compile_s:.0f}s), "
          f"max pose err {err*100:.1f} cm, iters={int(st['iterations'])}",
          flush=True)


if __name__ == "__main__":
    main()

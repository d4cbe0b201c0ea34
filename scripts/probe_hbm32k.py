"""Chip probe: the 32k-bucket HBM-streamed ranges tier (VERDICT r4
item 3). r5 chip finding: at the 32768 bucket the kernel's actual scoped
VMEM (106.57M) exceeds both the estimate (~74M) and the 94M limit the
wrapper requests — this probe A/Bs a raised request to learn whether the
chip can grant it (v5e VMEM is 128M) or the tier must decline at this
shape.

Usage: python scripts/probe_hbm32k.py [limit_mb]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

limit_mb = int(sys.argv[1]) if len(sys.argv) > 1 else 120
os.environ["PGSLAM_PGO_VMEM_LIMIT"] = str(limit_mb * 1024 * 1024)

import numpy as np
import jax

from pgslam_tpu.optim import lm_pallas
from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph

# Make the wrapper REQUEST the full raised limit (the estimate
# under-predicts at this shape; the request formula caps at
# estimate+24M otherwise).
_orig = lm_pallas.vmem_estimate_ranges_hbm
lm_pallas.vmem_estimate_ranges_hbm = \
    lambda *a, **k: _orig(*a, **k) + 34 * 1024 * 1024


def main():
    print(f"devices={jax.devices()} limit={limit_mb}M", flush=True)
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

"""Decompose the fused-LM kernel's time at sparse 16k into
init / per-LM-fixed / per-CG components by sweeping (max_iterations,
cg_iterations) on the SAME graph:

    total(m, c) ~ init + m * (fixed_per_LM + c_eff * per_cg)

Each (m, c) pair is its own Mosaic compile (config is static) — run on a
warm /root/.jax_cache when possible. Also A/Bs robust=none vs gm to
price the IRLS row math. Usage:

    python scripts/probe_pgo_phase.py [V] [n_loops]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax

from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph
from probe_pgo_factored import sparse


def run(name, args, m, c, robust="none", nl="auto"):
    # cg_tol=0 AND the LM-level early stops zeroed: the decomposition
    # divides by assumed trip counts, so every configured iteration must
    # actually run (the printed iters= confirms).
    cfg = PGOConfig(max_iterations=m, cg_iterations=c, cg_tol=0.0,
                    min_cost_decrease=0.0, min_step_norm=0.0,
                    solver="lm_pallas", robust=robust)
    t0 = time.perf_counter()
    out, st = optimize_pose_graph(*args, config=cfg, n_loop=nl)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out, st = optimize_pose_graph(*args, config=cfg, n_loop=nl)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / n * 1e3)
    print(f"OK [{name}] m={m} cg={c} robust={robust}: {min(dts):.2f} ms "
          f"(loops {dts[0]:.2f}/{dts[1]:.2f}, compile {compile_s:.0f}s), "
          f"iters={int(st['iterations'])}", flush=True)
    return min(dts)


def main():
    V = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    n_loops = int(sys.argv[2]) if len(sys.argv) > 2 else V // 16
    print(f"devices={jax.devices()}  V={V} loops={n_loops}", flush=True)
    args, gt = sparse(V, n_loops)
    # numpy args: host-readable ids let the dispatcher take the
    # sorted-RANGES path exactly like production (h2d of the routed
    # arrays lands inside the timed loop — the honest per-call cost).
    args = tuple(np.asarray(a) for a in args)
    from pgslam_tpu.optim.lm_pallas import host_loop_count
    nl = host_loop_count(np.asarray(args[2]), np.asarray(args[3]), V)
    # cg_tol=0 disables the cdone early exit so c is the EXACT per-LM
    # CG trip count — the decomposition needs known trip counts.
    t_m1_c1 = run("s", args, 1, 1, nl=nl)
    t_m4_c1 = run("s", args, 4, 1, nl=nl)
    t_m1_c16 = run("s", args, 1, 16, nl=nl)
    t_m4_c16 = run("s", args, 4, 16, nl=nl)
    per_lm = (t_m4_c1 - t_m1_c1) / 3.0
    per_cg = (t_m4_c16 - t_m4_c1) / (4 * 15.0)
    init = t_m1_c1 - per_lm
    print(f"DECOMP: init+dispatch={init:.2f} ms  per_LM_fixed="
          f"{per_lm - per_cg:.2f} ms  per_CG={per_cg:.2f} ms", flush=True)
    run("s", args, 4, 16, robust="gm", nl=nl)


if __name__ == "__main__":
    main()

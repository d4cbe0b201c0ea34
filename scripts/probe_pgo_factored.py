"""Chip validation of the factored-incidence whole-LM kernel (VERDICT r3
item 2): the sizes that fell off the fused path in r3 must now run fused.

  dense 2.5k (E=2V)  — r3's first VMEM cliff (XLA fallback)
  dense 4k   (E=2V)  — target < 15 ms (r3: 44.6 ms XLA)
  dense 8k   (E=2V)  — stretch
  sparse 16k (chain + V/16 loops) — target < 20 ms
  1k control — layout A/B (onehot vs factored) for overhead calibration

Usage: python scripts/probe_pgo_factored.py [case ...]
       cases: d2.5k d4k d8k s16k ctl1k   (default: all)
"""
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


def ring(V, E, seed=1, noise=0.05):
    rng = np.random.default_rng(seed)
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
        rng.normal(size=(V - 1, 6)) * noise, jnp.float32)))
    return (jnp.asarray(init), jnp.ones(V, bool),
            jnp.asarray(ef, jnp.int32), jnp.asarray(et, jnp.int32),
            jnp.asarray(Ts), jnp.asarray(covs), jnp.ones(E, bool),
            jnp.int32(0)), poses


def sparse(V, n_loops, seed=1):
    rng = np.random.default_rng(seed)
    ang = 2 * np.pi * np.arange(V) / V
    R = np.asarray(se3.exp_so3(jnp.asarray(
        np.stack([np.zeros(V), np.zeros(V), ang], -1), jnp.float32)))
    t = np.stack([30 * np.cos(ang), 30 * np.sin(ang),
                  np.zeros(V)], -1).astype(np.float32)
    poses = np.asarray(se3.make(jnp.asarray(R), jnp.asarray(t)))
    ef = list(range(V - 1))
    et = list(range(1, V))
    for _ in range(n_loops):
        i = int(rng.integers(0, V))
        j = int((i + V // 2 + rng.integers(-V // 8, V // 8)) % V)
        if i == j:
            j = (j + 1) % V
        ef.append(i)
        et.append(j)
    ef, et = np.asarray(ef), np.asarray(et)
    E = len(ef)
    Ts = np.einsum("eij,ejk->eik", np.linalg.inv(poses[ef]),
                   poses[et]).astype(np.float32)
    covs = np.tile((np.eye(6) * 0.01).astype(np.float32), (E, 1, 1))
    init = poses.copy()
    init[1:] = init[1:] @ np.asarray(jax.vmap(se3.exp)(jnp.asarray(
        rng.normal(size=(V - 1, 6)) * 0.03, jnp.float32)))
    return (jnp.asarray(init), jnp.ones(V, bool),
            jnp.asarray(ef, jnp.int32), jnp.asarray(et, jnp.int32),
            jnp.asarray(Ts), jnp.asarray(covs), jnp.ones(E, bool),
            jnp.int32(0)), poses


def run(name, args, gt, cg=30, force=None):
    from pgslam_tpu.optim.lm_pallas import host_loop_count, layout_plan
    V = args[0].shape[0]
    E = args[2].shape[0]
    nl = host_loop_count(np.asarray(args[2]), np.asarray(args[3]), V)
    if nl is not None and nl > 0.8 * E:
        nl = None
    plan = layout_plan(V, E, nl)
    os.environ["PGSLAM_PGO_FORCE_FACTORED"] = \
        "1" if force == "factored" else ""
    cfg = PGOConfig(max_iterations=4, cg_iterations=cg, cg_tol=1e-3,
                    solver="lm_pallas")
    # Pass n_loop EXPLICITLY: the probe's edge ids are device-resident,
    # so "auto" inside optimize_pose_graph degrades to None (no d2h
    # fetch) and the measurement silently covers the chain-less layout.
    # Production (Optimizer.prepare_for_optimization) computes the count
    # from its host arrays and passes it — measure that path.
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
    err = np.linalg.norm(np.asarray(out)[:, :3, 3]
                         - gt[:, :3, 3], axis=1).max()
    print(f"OK [{name}] V={V} E={E} plan={plan} force={force}: "
          f"{min(dts):.2f} ms (loops {dts[0]:.2f}/{dts[1]:.2f}, compile "
          f"{compile_s:.0f}s), max pose err {err*100:.1f} cm, "
          f"iters={int(st['iterations'])}", flush=True)


def run_ranges(name, args, gt, cg=30, m=4):
    """Time the sorted-RANGES path with the routed arrays PRE-STAGED on
    device (host routing outside the loop) — isolates kernel +
    panel-build exactly like the other cases (which pre-stage their
    args and pay their routing in-graph). Falls through to the
    HBM-streamed tier when the resident panels do not fit."""
    from pgslam_tpu.optim.lm_pallas import (_host_claim, _lm_optimize_ranges_jit,
                                            host_route_ranges, ranges_plan,
                                            ranges_plan_hbm)
    V = args[0].shape[0]
    E = args[2].shape[0]
    ef = np.asarray(args[2], np.int64)
    et = np.asarray(args[3], np.int64)
    em = np.asarray(args[6], bool)
    claimed = _host_claim(ef, et, V)
    le = np.nonzero(~claimed & em)[0]
    hbm = False
    rp = ranges_plan(V, ef[le], et[le])
    if rp is None:
        rp = ranges_plan_hbm(V, ef[le], et[le])
        hbm = rp is not None
    if rp is None:
        print(f"SKIP [{name}] no fitting ranges plan (dense graphs: the "
              f"Pt permute is O(L^2) — expected)", flush=True)
        return
    cfg = PGOConfig(max_iterations=m, cg_iterations=cg, cg_tol=1e-3,
                    solver="lm_pallas")
    rT, rC, rem_, rrm_, fw, tw, qsrc = [
        jax.device_put(r) for r in host_route_ranges(
            ef, et, np.asarray(args[4]), np.asarray(args[5]), em,
            np.ones(E, np.float32), V, rp)]
    kw = dict(config=cfg, s_tile=rp.s, trips=rp.trips, capF=rp.capF,
              capT=rp.capT, hbm=hbm)

    def call():
        return _lm_optimize_ranges_jit(args[0], args[1], rT, rC, rem_,
                                       rrm_, args[7], fw, tw, qsrc, **kw)

    t0 = time.perf_counter()
    out, st = call()
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    dts = []
    for _ in range(2):
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out, st = call()
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / n * 1e3)
    err = np.linalg.norm(np.asarray(out)[:, :3, 3]
                         - gt[:, :3, 3], axis=1).max()
    print(f"OK [{name}] V={V} E={E} plan={rp}{' HBM' if hbm else ''} "
          f"tiles={rp.movement_tiles()}: "
          f"{min(dts):.2f} ms (loops {dts[0]:.2f}/{dts[1]:.2f}, compile "
          f"{compile_s:.0f}s), max pose err {err*100:.1f} cm, "
          f"iters={int(st['iterations'])}", flush=True)


def main():
    want = set(sys.argv[1:]) or {"d2.5k", "d4k", "s16k", "ctl1k"}
    print(f"devices={jax.devices()}", flush=True)
    if "ctl1k" in want:
        args, gt = ring(1024, 2048)
        run("ctl1k-auto", args, gt)
        run("ctl1k-fact", args, gt, force="factored")
    if "d2.5k" in want:
        args, gt = ring(2560, 5120)
        run("dense2.5k", args, gt)
    if "d4k" in want:
        args, gt = ring(4096, 8192)
        run("dense4k", args, gt)
    if "d8k" in want:
        args, gt = ring(8192, 16384)
        run("dense8k", args, gt)
    if "s16k" in want:
        args, gt = sparse(16384, 1024)
        run("sparse16k", args, gt, cg=40)
    if "s16kr" in want:
        args, gt = sparse(16384, 1024)
        run_ranges("sparse16k-RANGES", args, gt, cg=40)
    if "d4kr" in want:
        args, gt = ring(4096, 8192)
        run_ranges("dense4k-RANGES", args, gt)
    if "s32kr" in want:
        args, gt = sparse(32768, 2048)
        run_ranges("sparse32k-RANGES", args, gt, cg=40)
    if "s16kp" in want:
        # PRODUCTION protocol: numpy args through optimize_pose_graph —
        # host routing + h2d of the routed arrays INSIDE the timed loop
        # (what Optimizer.process_data pays per optimize).
        args, gt = sparse(16384, 1024)
        nargs = tuple(np.asarray(a) for a in args)
        from pgslam_tpu.optim.lm_pallas import host_loop_count
        nl = host_loop_count(nargs[2], nargs[3], 16384)
        cfg = PGOConfig(max_iterations=4, cg_iterations=40, cg_tol=1e-3,
                        solver="lm_pallas")
        t0 = time.perf_counter()
        out, st = optimize_pose_graph(*nargs, config=cfg, n_loop=nl)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        dts = []
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(5):
                out, st = optimize_pose_graph(*nargs, config=cfg,
                                              n_loop=nl)
            jax.block_until_ready(out)
            dts.append((time.perf_counter() - t0) / 5 * 1e3)
        err = np.linalg.norm(np.asarray(out)[:, :3, 3]
                             - gt[:, :3, 3], axis=1).max()
        print(f"OK [sparse16k-PROD] (host routing + h2d in loop): "
              f"{min(dts):.2f} ms (loops {dts[0]:.2f}/{dts[1]:.2f}, "
              f"compile {compile_s:.0f}s), max pose err {err*100:.1f} cm",
              flush=True)


if __name__ == "__main__":
    main()

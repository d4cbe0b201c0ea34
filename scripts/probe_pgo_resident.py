"""Chip probe for the device-resident PGO mirror (VERDICT r4 item 1).

Measures the FULL production Optimizer.process_data call — prepare +
solve + writeback — at sparse 16k poses (the case BENCH_NOTES records at
101-135 ms/call, ~90 ms of it the ~9 MB graph re-upload), classic vs
resident, through the real MapManager/Optimizer objects. The steady
state appends a few keyframes and one closure between optimize calls,
exactly like a live loop, and prints the mirror's per-call upload /
download byte counters.

Usage: python scripts/probe_pgo_resident.py [s16k] [s4k] [ctl1k]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax

from pgslam_tpu.cloud import make_cloud
from pgslam_tpu.graph.pose_graph import MapManager
from pgslam_tpu.optim.pgo import PGOConfig
from pgslam_tpu.optimizer import Optimizer, OptimizerConfig


class _NoLC:
    def add_new_vertex(self, v):
        pass


def build_world(V, n_loops, seed=1):
    """MapManager with a ring odometry chain + pre-inserted loop edges
    (the graph state a long run accumulates), plus a pool of future
    closures to feed the timed optimizes."""
    rng = np.random.default_rng(seed)
    ang = 2 * np.pi * np.arange(V + 64) / V
    t = np.stack([30 * np.cos(ang), 30 * np.sin(ang),
                  np.zeros(V + 64)], -1).astype(np.float64)
    poses = np.tile(np.eye(4), (V + 64, 1, 1))
    for i in range(V + 64):
        c, s = np.cos(ang[i]), np.sin(ang[i])
        poses[i, :3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
        poses[i, :3, 3] = t[i]
    mm = MapManager()
    mm.set_loop_closer(_NoLC())
    cloud = make_cloud(rng.uniform(-1, 1, (16, 3)).astype(np.float32))
    mm.add_first_keyframe(cloud, poses[0].astype(np.float32))
    cov = (np.eye(6) * 0.01).astype(np.float32)
    for i in range(1, V):
        dT = (np.linalg.inv(poses[i - 1]) @ poses[i]).astype(np.float32)
        mm.add_new_keyframe(i - 1, poses[i].astype(np.float32), dT, cov,
                            cloud)
    pairs = set()
    g = mm.get_graph()
    added = 0
    while added < n_loops:
        i = int(rng.integers(0, V))
        j = int((i + V // 2 + rng.integers(-V // 8, V // 8)) % V)
        if abs(i - j) < 2 or (i, j) in pairs or (j, i) in pairs:
            continue
        pairs.add((i, j))
        T = (np.linalg.inv(poses[i]) @ poses[j]).astype(np.float32)
        mm.add_loop_closing_constraint(i, j, T, cov)
        added += 1
    # future closures (disjoint from the inserted set)
    future = []
    while len(future) < 40:
        i = int(rng.integers(0, V))
        j = int((i + V // 2 + rng.integers(-V // 8, V // 8)) % V)
        if abs(i - j) < 2 or (i, j) in pairs or (j, i) in pairs:
            continue
        pairs.add((i, j))
        T = (np.linalg.inv(poses[i]) @ poses[j]).astype(np.float32)
        future.append((i, j, T))
    return mm, poses, future, cov, cloud


def run_case(name, V, n_loops, resident, n_timed=10, kf_between=3,
             cg=40, world=None):
    mm, poses, future, cov, cloud = world or build_world(V, n_loops)
    cfg = OptimizerConfig(
        pgo=PGOConfig(max_iterations=4, cg_iterations=cg, cg_tol=1e-3),
        resident=("auto" if resident else "off"))
    opt = Optimizer(mm, cfg)
    fut = iter(future)

    def one_call(timed_warm=False):
        # steady-state production shape: a few keyframe spawns since the
        # last optimize, then one accepted closure triggers process_data
        g = mm.get_graph()
        for _ in range(kf_between):
            i = g.n_vertices
            dT = (np.linalg.inv(poses[i - 1]) @ poses[i]).astype(np.float32)
            mm.add_new_keyframe(i - 1, poses[i].astype(np.float32), dT,
                                cov, cloud)
        i, j, T = next(fut)
        t0 = time.perf_counter()
        opt.add_new_data(i, j, T, cov)
        return time.perf_counter() - t0

    t0 = time.perf_counter()
    dt_first = one_call()
    compile_s = time.perf_counter() - t0
    dt_second = one_call()   # first DELTA call (new jit for delta path)
    if resident:
        os.environ["PGSLAM_PGO_PROBE_TIMING"] = "1"
    solve_ms, fetch_ms = [], []
    dts = []
    for _ in range(n_timed):
        dts.append(one_call() * 1e3)
        if resident and getattr(opt._mirror, "last_solve_ms", None):
            solve_ms.append(opt._mirror.last_solve_ms)
            fetch_ms.append(opt._mirror.last_fetch_ms)
    os.environ.pop("PGSLAM_PGO_PROBE_TIMING", None)
    g = mm.get_graph()
    err = np.linalg.norm(
        g.optimized_poses[:g.n_vertices, :3, 3]
        - poses[:g.n_vertices, :3, 3], axis=1).max()
    extra = ""
    if resident and opt._mirror is not None:
        extra = (f", upload {opt._mirror.last_upload_bytes/1024:.1f} KiB"
                 f" / download {opt._mirror.last_download_bytes/1024:.1f}"
                 f" KiB (rebuild was "
                 f"{opt._mirror.last_rebuild_bytes/1e6:.1f} MB)"
                 f", kind={opt._mirror._st['kind']}"
                 f", pack={opt._mirror._st['pack']}")
        if solve_ms:
            extra += (f", split solve {np.median(solve_ms):.1f} ms / "
                      f"fetch {np.median(fetch_ms):.1f} ms "
                      f"(the r4 probes' scope is the solve slice)")
    print(f"OK [{name} {'RESIDENT' if resident else 'classic'}] "
          f"V={g.n_vertices} E={g.n_edges}: median "
          f"{np.median(dts):.2f} ms/call, min {min(dts):.2f}, "
          f"p90 {np.quantile(dts, 0.9):.2f} "
          f"(first {compile_s:.0f}s incl compile, second "
          f"{dt_second*1e3:.0f} ms), max pose err {err*100:.2f} cm"
          f"{extra}", flush=True)
    return np.median(dts)


def main():
    want = set(sys.argv[1:]) or {"ctl1k", "s16k"}
    print(f"devices={jax.devices()}", flush=True)
    if "ctl1k" in want:
        w = build_world(1024, 64)
        run_case("ctl1k", 1024, 64, resident=False, world=w)
        w = build_world(1024, 64)
        run_case("ctl1k", 1024, 64, resident=True, world=w)
    if "s4k" in want:
        w = build_world(4096, 256)
        run_case("s4k", 4096, 256, resident=False, world=w)
        w = build_world(4096, 256)
        run_case("s4k", 4096, 256, resident=True, world=w)
    if "s16k" in want:
        # stays INSIDE the 16384 V-bucket through the timed window
        # (the timed phase appends ~36 keyframes)
        w = build_world(16384 - 64, 1024)
        run_case("s16k", 16384 - 64, 1024, resident=False, world=w)
        w = build_world(16384 - 64, 1024)
        run_case("s16k", 16384 - 64, 1024, resident=True, world=w)
    if "s16kx" in want:
        # CROSSES the V/E bucket immediately (V=16384 + appended
        # keyframes -> bucket 32768): the padded-bucket case where the
        # emask-blind loop count used to knock production onto the XLA
        # fallback (~587 ms/call measured r5) until the ranges rescue
        # tier landed. Also the de-facto 32k-bucket capacity datapoint.
        w = build_world(16384, 1024)
        run_case("s16kx", 16384, 1024, resident=False, world=w)
        w = build_world(16384, 1024)
        run_case("s16kx", 16384, 1024, resident=True, world=w)


if __name__ == "__main__":
    main()

"""Instrumented config-4 A/B: sync_lag=0 vs 2, per-scan stage breakdown.

Diagnoses where the deferred live loop spends wall time on chip. Stages
are timed by wrapping the Localizer methods in-place (host-side timers;
the device work they enqueue is asynchronous unless noted).

Usage: python scripts/probe_config4_deferred.py [n_scans] [lags...]
"""
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    import jax
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.slam import PoseGraphSlam
    from pgslam_tpu import localizer as L
    from velodyne_slam import velodyne_config

    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 26
    lags = [int(x) for x in sys.argv[2:]] or [2, 0]
    print(f"backend: {jax.devices()}", flush=True)

    rng = np.random.default_rng(0)
    world = corridor_world(rng, n_points=200000, length=60.0, width=8.0,
                           height=5.0)

    def pose_at(x):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [x, 0.0, 1.8]
        return T

    poses = [pose_at(2.0 + i * 1.0) for i in range(n_scans)]
    scans = [render_scan(world, T, rng, 65536, max_range=30.0, noise=0.01)
             for T in poses]

    stage = defaultdict(list)

    def timed(obj, name, label=None):
        fn = getattr(obj, name)
        label = label or name

        def wrap(*a, **k):
            t0 = time.perf_counter()
            out = fn(*a, **k)
            stage[label].append(time.perf_counter() - t0)
            return out
        setattr(obj, name, wrap)

    for lag in lags:
        stage.clear()
        slam = PoseGraphSlam(velodyne_config(sync_lag=lag))
        loc = slam.localizer
        timed(loc, "_commit")
        timed(loc, "neighbor_probe_request")
        timed(loc, "_cached_probe_map")
        timed(loc, "decide_composition")
        timed(loc, "apply_composition")
        timed(loc.icp_engine, "set_map")
        # fetch timing: wrap device_get inside commit via unpack
        orig_unpack = L._unpack_result_vec
        import jax as _jax
        real_get = _jax.device_get

        def unpack_timed(vec):
            return orig_unpack(vec)
        n_warm = 6
        for i in range(n_warm):
            tw = time.perf_counter()
            slam.add_data(i, "world", poses[i], np.eye(4), scans[i])
            print(f"  warm {i}: {time.perf_counter()-tw:.1f}s", flush=True)
        slam.flush()
        stage.clear()
        per_scan = []
        t0 = time.perf_counter()
        for i in range(n_warm, n_scans):
            ts = time.perf_counter()
            slam.add_data(i, "world", poses[i], np.eye(4), scans[i])
            per_scan.append(time.perf_counter() - ts)
        tf = time.perf_counter()
        slam.flush()
        t_flush = time.perf_counter() - tf
        dt = (time.perf_counter() - t0) / (n_scans - n_warm)
        err = float(np.linalg.norm(
            slam.localizer.T_world_robot[:3, 3] - poses[-1][:3, 3]))
        print(f"\n== sync_lag={lag}: {dt*1e3:.1f} ms/scan "
              f"({1/dt:.1f} scans/s), err={err:.3f} m, "
              f"kf={slam.get_graph().n_vertices}, flush={t_flush*1e3:.0f} ms",
              flush=True)
        print("  per-scan ms:", " ".join(f"{x*1e3:.0f}" for x in per_scan),
              flush=True)
        for k, v in sorted(stage.items()):
            a = np.asarray(v) * 1e3
            print(f"  {k:28s} n={len(v):3d} total={a.sum():7.1f} ms "
                  f"mean={a.mean():6.1f} max={a.max():6.1f}", flush=True)
        hcap = getattr(
            slam.localizer._inflight, "maxlen", None)
        del slam


if __name__ == "__main__":
    main()

"""Per-scan stage breakdown for BASELINE config 4 (full SLAM @64k).

Times each add_data on the chip and splits the interesting sub-stages
with wall-clock probes inserted around the Localizer hot path. Run
without a platform override to hit the real chip.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "examples"))
from velodyne_slam import velodyne_config

from pgslam_tpu.datasets import corridor_world, render_scan
from pgslam_tpu.slam import PoseGraphSlam
from pgslam_tpu.utils.prefetch import prefetch_clouds

print("backend:", jax.devices(), flush=True)

rng = np.random.default_rng(0)
world = corridor_world(rng, n_points=200000, length=60.0, width=8.0,
                       height=5.0)


def pose_at(x):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [x, 0.0, 1.8]
    return T


poses = [pose_at(2.0 + i * 1.0) for i in range(10)]
t0 = time.perf_counter()
scans = [render_scan(world, T, rng, 65536, max_range=30.0, noise=0.01)
         for T in poses]
print(f"render: {time.perf_counter()-t0:.2f}s total", flush=True)

slam = PoseGraphSlam(velodyne_config())
slam.add_data(0, "world", poses[0], np.eye(4), scans[0])
slam.add_data(1, "world", poses[1], np.eye(4), scans[1])  # warm

loc = slam.localizer

# Monkeypatch timing probes around the localizer's hot-path stages.
import pgslam_tpu.localizer as L

orig_process = loc.process_data
stage = {}


def timed_process(Twr, Trs, cloud):
    t0 = time.perf_counter()
    orig_process(Twr, Trs, cloud)
    stage.setdefault("process_total", []).append(time.perf_counter() - t0)


orig_begin = loc.begin_finish
orig_decide = loc.decide_composition
orig_apply = loc.apply_composition


def timed_begin(result):
    t0 = time.perf_counter()
    r = orig_begin(result)
    stage.setdefault("begin_finish", []).append(time.perf_counter() - t0)
    return r


def timed_decide(result, neighbor_probe=None):
    t0 = time.perf_counter()
    r = orig_decide(result, neighbor_probe=neighbor_probe)
    stage.setdefault("decide", []).append(time.perf_counter() - t0)
    return r


def timed_apply(build=True):
    t0 = time.perf_counter()
    r = orig_apply(build=build)
    stage.setdefault("apply_comp", []).append(time.perf_counter() - t0)
    return r


loc.begin_finish = timed_begin
loc.decide_composition = timed_decide
loc.apply_composition = timed_apply

loc.process_data = timed_process


def timed_fn(orig, label):
    def wrapped(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        stage.setdefault(f"{label}_async", []).append(
            time.perf_counter() - t0)
        t1 = time.perf_counter()
        out = jax.block_until_ready(out)
        stage.setdefault(f"{label}_wait", []).append(
            time.perf_counter() - t1)
        return out
    return wrapped


L._prepare_register_probe = timed_fn(L._prepare_register_probe,
                                     "reg_probe")
L._prepare_and_register = timed_fn(L._prepare_and_register, "reg")


def probe(obj, name, label=None):
    label = label or name
    orig = getattr(obj, name)

    def wrapped(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        stage.setdefault(label, []).append(time.perf_counter() - t0)
        return out
    setattr(obj, name, wrapped)


probe(loc, "neighbor_probe_request")
probe(loc, "_cached_probe_map")

orig_get = jax.device_get


def timed_get(x):
    t0 = time.perf_counter()
    out = orig_get(x)
    stage.setdefault("device_get", []).append(time.perf_counter() - t0)
    return out


jax.device_get = timed_get

per_scan = []
t_all = time.perf_counter()
it = prefetch_clouds(iter(scans[2:]), capacity=65536)
for i, cloud in enumerate(it, start=2):
    t0 = time.perf_counter()
    slam.add_data(i, "world", poses[i], np.eye(4), cloud)
    per_scan.append(time.perf_counter() - t0)
dt = (time.perf_counter() - t_all) / len(per_scan)

print(f"\nms/scan total: {dt*1e3:.1f}  ({1/dt:.2f} scans/s)")
print("per-scan ms:", [f"{x*1e3:.1f}" for x in per_scan])
for k, v in stage.items():
    print(f"{k:16s} n={len(v):2d} mean={np.mean(v)*1e3:6.2f} ms  "
          f"each={[f'{x*1e3:.1f}' for x in v]}")
print("keyframes:", slam.get_graph().n_vertices)

"""Per-phase breakdown of the MultiAgentSlam fleet step (BASELINE
config 5 shape: 16 agents, shared graph). Run without a platform
override to hit the real chip."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np
import jax

from pgslam_tpu.datasets import corridor_sequence
from pgslam_tpu.parallel.multi_agent import MultiAgentSlam
from test_slam_e2e import small_config

print("backend:", jax.devices(), flush=True)

rng = np.random.default_rng(7)
scans, odom, truth = corridor_sequence(
    rng, n_scans=72, scan_points=512, step=0.25, noise=0.003,
    odom_noise=0.005, length=60.0)
B = 16
slam = MultiAgentSlam(small_config(), n_agents=B)
T_rs = np.eye(4, dtype=np.float32)

# Wrap the interesting internals with wall-clock probes.
stage = {}


def probe(obj, name, label=None):
    label = label or name
    orig = getattr(obj, name)

    def wrapped(*a, **k):
        t0 = time.perf_counter()
        out = orig(*a, **k)
        stage.setdefault(label, []).append(time.perf_counter() - t0)
        return out
    setattr(obj, name, wrapped)


probe(slam, "_batched_probes")
probe(slam.loop_closer, "process_pending_batched", "loopclose_batched")
probe(slam.loop_closer, "find_candidate_composition", "lc_cand_search")
probe(slam.optimizer, "process_data", "optimize")

import pgslam_tpu.loopcloser as LC
orig_verify = LC._verify_batch


def timed_verify(*a, **k):
    t0 = time.perf_counter()
    out = jax.block_until_ready(orig_verify(*a, **k))
    stage.setdefault("lc_verify_dispatch", []).append(
        time.perf_counter() - t0)
    return out


LC._verify_batch = timed_verify

import pgslam_tpu.parallel.multi_agent as MA
import pgslam_tpu.localmap as LM
orig_rebuild = LM.batch_rebuild


def timed_rebuild(maps, pad_to=None, **kw):
    t0 = time.perf_counter()
    out = orig_rebuild(maps, pad_to=pad_to, **kw)
    stage.setdefault(f"batch_rebuild(n={len(maps)})", []).append(
        time.perf_counter() - t0)
    return out


LM.batch_rebuild = timed_rebuild
MA.batch_rebuild = timed_rebuild

orig_icp = slam._batched_icp


def timed_icp(r, m, t):
    t0 = time.perf_counter()
    out = jax.block_until_ready(orig_icp(r, m, t))
    stage.setdefault("batched_icp", []).append(time.perf_counter() - t0)
    return out


slam._batched_icp = timed_icp

# Time the per-agent host slicing + prepare loop via the localizers.
for loc in slam.localizers:
    probe(loc, "prepare_scan", "prepare_scan(per-agent)")
    probe(loc, "decide_composition", "decide(per-agent)")
    probe(loc, "apply_composition", "apply(per-agent)")
    probe(loc, "begin_finish", "begin_finish(per-agent)")


def step(i):
    Ts = np.stack([odom[i + b % 3] for b in range(B)])
    clouds = [scans[i + b % 3] for b in range(B)]
    t0 = time.perf_counter()
    slam.add_data_batch(i, "world", Ts, T_rs, clouds)
    stage.setdefault("STEP_total", []).append(time.perf_counter() - t0)


step(0)
step(1)
for v in stage.values():
    v.clear()

t0 = time.perf_counter()
for i in range(2, 62):
    step(i)
dt = (time.perf_counter() - t0) / 60

print(f"\nms/batch-step: {dt*1e3:.1f}  ({B/dt:.1f} agent-scans/s)")
steps = stage["STEP_total"]
warm = steps[30:]
print(f"warm (last {len(warm)}): {np.mean(warm)*1e3:.1f} ms/step "
      f"({B/np.mean(warm):.1f} agent-scans/s), "
      f"median {np.median(warm)*1e3:.1f} ms")
for k in sorted(stage, key=lambda k: -sum(stage[k])):
    v = stage[k]
    print(f"{k:28s} n={len(v):3d} total={sum(v)*1e3:8.1f} ms  "
          f"mean={np.mean(v)*1e3:7.2f} ms")
print("keyframes:", slam.get_graph().n_vertices)

"""Chip A/B: deferred-commit (lag-1) sync strategies for the ST SLAM loop,
plus the micro-batched single-stream sweep.

VERDICT r3 item 1: config 4 pays a ~30 ms payload-independent d2h sync
floor for the ONE packed [59]-float readback its decision tree needs,
on top of a ~44 ms transfer-bound registration wait — 14.5 scans/s
while device compute is ~3 ms. The deferred-commit design consumes scan
t-1's result at scan t's sync (the reference's own MT outdated-flag
semantics, LocalizerMT.hpp:122-134, applied to the ST path). This probe
measures whether the relay actually overlaps d2h(t-1) with h2d(t):

  sync       dispatch(t) -> device_get(t)          [current config 4]
  lag1       dispatch(t) -> device_get(t-1)
  lag1_async dispatch(t) + copy_to_host_async -> fetch(t-1)
  lag2_async two dispatches in flight
  floor      dispatch only, one final sync          [pipeline ceiling]

Second half (VERDICT item 6): single-stream micro-batching — vmapped
B registrations per dispatch against ONE persistent reference map, the
lag-1 stream analog of the flagship profile. Sweeps B in {1,2,4,8}.

Usage: python scripts/probe_deferred_sync.py [n_scans]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pgslam_tpu.cloud import Cloud, make_cloud, stack_clouds
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.graph.pose_graph import MapManager
    from pgslam_tpu.localizer import (_prepare_register_probe, _probe_build)
    from pgslam_tpu.localmap import stack_keyframes
    from pgslam_tpu.ops.icp import ICPEngine
    from velodyne_slam import velodyne_config

    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    print(f"backend: {jax.devices()}", flush=True)
    scfg = velodyne_config()
    cfg = scfg.localizer.icp
    cap = scfg.localizer.keyframe_cloud_capacity

    rng = np.random.default_rng(0)
    world = corridor_world(rng, n_points=200000, length=60.0, width=8.0,
                           height=5.0)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [10.0, 0.0, 1.8]
    map_pts = render_scan(world, T, rng, 65536, max_range=30.0, noise=0.01)

    # Distinct raw scans (reused cyclically) so every dispatch pays a real
    # 768 KB h2d, exactly like the config-4 stream.
    n_distinct = 12
    raw_scans = [render_scan(world, T, rng, 65536, max_range=30.0,
                             noise=0.01) for _ in range(n_distinct)]
    raws = [Cloud(points=s, mask=np.ones(len(s), bool), descriptors={})
            for s in raw_scans]

    eng = ICPEngine(cfg)
    ref = eng.prepare_reference(make_cloud(map_pts, capacity=3 * cap))
    jax.block_until_ready(ref.points)

    T2 = T.copy()
    T2[0, 3] += 2.0
    nb_pts = render_scan(world, T2, rng, 65536, max_range=30.0, noise=0.01)
    mm = MapManager()
    mm.add_first_keyframe(make_cloud(nb_pts, capacity=cap), T2)
    kfs = [mm.get_graph().keyframe(0)]
    points, masks, descs, Ts, slot_valid, desc_keys, T_world_ref = \
        stack_keyframes(kfs, 3)
    probe_map = _probe_build(points, masks, descs, Ts, slot_valid,
                             jnp.asarray(T_world_ref), desc_keys,
                             cfg.reference_filters)
    jax.block_until_ready(probe_map.points)

    chain = scfg.localizer.input_filters
    key = jax.random.PRNGKey(0)
    T_rs = jnp.eye(4, dtype=jnp.float32)
    T0 = jnp.eye(4, dtype=jnp.float32)
    T_world_refkf = jnp.asarray(T, jnp.float32)

    def dispatch(raw):
        return _prepare_register_probe(chain, cap, cfg, raw, T_rs, key,
                                       ref, T0, None, probe_map,
                                       T_world_refkf)

    # warm (numpy-arg provenance, like the stream)
    c, r, packed = dispatch(raws[0])
    jax.block_until_ready(packed)

    def timeit(name, fn):
        t0 = time.perf_counter()
        fn()
        dt = (time.perf_counter() - t0) / n_scans * 1e3
        print(f"{name}: {dt:.2f} ms/scan ({1e3/dt:.1f} scans/s)", flush=True)
        return dt

    def run_sync():
        for i in range(n_scans):
            _, _, packed = dispatch(raws[i % n_distinct])
            jax.device_get(packed)
    timeit("sync        (dispatch t, get t)  ", run_sync)

    def run_lag1():
        prev = None
        for i in range(n_scans):
            _, _, packed = dispatch(raws[i % n_distinct])
            if prev is not None:
                jax.device_get(prev)
            prev = packed
        jax.device_get(prev)
    timeit("lag1        (dispatch t, get t-1)", run_lag1)

    def run_lag1_async():
        prev = None
        for i in range(n_scans):
            _, _, packed = dispatch(raws[i % n_distinct])
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
            if prev is not None:
                jax.device_get(prev)
            prev = packed
        jax.device_get(prev)
    timeit("lag1_async  (+copy_to_host_async)", run_lag1_async)

    def run_lag2_async():
        from collections import deque
        q = deque()
        for i in range(n_scans):
            _, _, packed = dispatch(raws[i % n_distinct])
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
            q.append(packed)
            if len(q) > 2:
                jax.device_get(q.popleft())
        while q:
            jax.device_get(q.popleft())
    timeit("lag2_async  (two in flight)      ", run_lag2_async)

    def run_floor():
        packed = None
        for i in range(n_scans):
            _, _, packed = dispatch(raws[i % n_distinct])
        jax.device_get(packed)
    timeit("floor       (no per-scan fetch)  ", run_floor)

    # ---- micro-batched single-stream sweep (VERDICT item 6) ----
    # The flagship single-stream profile (bench.py cfg): c2f 2k/8k,
    # packed-high matcher, mi=5. At 2.46 ms/reg it sits AT the relay
    # dispatch floor; vmapping B registrations per dispatch against the
    # one persistent map amortizes the floor across B.
    from pgslam_tpu import se3
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig
    from pgslam_tpu.ops.icp_pallas import prepare_fused_reference
    from pgslam_tpu.parallel.batched import batched_register

    bcfg = ICPConfig(
        error="point_to_plane", matcher="pallas", pallas_precision="high",
        reading_filters=(F.VoxelGrid(voxel_size=0.4, hash_size=1 << 17),
                         F.Compact(2048)),
        reference_filters=(F.VoxelGrid(voxel_size=0.2, hash_size=1 << 18),
                           F.Compact(8192),
                           F.SurfaceNormal(knn=8, tile_query=4096)),
        outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
        coarse_div=8, coarse_iterations=8,
        max_iterations=5, trans_eps=1e-4, rot_eps=1e-4)
    world2 = corridor_world(rng, n_points=300000, length=120.0, width=8.0,
                            height=5.0)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [20.0, 0.0, 1.8]
    pts = render_scan(world2, pose, rng, 65536, max_range=30.0, noise=0.01)
    reading_pts = render_scan(world2, pose, rng, 65536, max_range=30.0,
                              noise=0.01)
    offset = se3.exp(jnp.asarray([0.3, -0.2, 0.05, 0.01, -0.01, 0.02],
                                 jnp.float32))
    reading_np = np.asarray(
        se3.apply(se3.inverse(offset), jnp.asarray(reading_pts)))

    beng = ICPEngine(bcfg)
    base_ref = beng.prepare_reference(make_cloud(pts, capacity=65536))
    for B in (1, 2, 4, 8):
        refs = stack_clouds([base_ref] * B)
        fref = prepare_fused_reference(refs)
        jax.block_until_ready(fref.refT)
        raw_b = jnp.asarray(np.tile(reading_np[None], (B, 1, 1)))
        T0s = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))

        @jax.jit
        def stream_step(raw_, refs_, fref_, T0s_):
            cloud = Cloud(points=raw_, mask=jnp.ones(raw_.shape[:2], bool),
                          descriptors={})
            readings = jax.vmap(lambda c: F.apply_chain(
                bcfg.reading_filters, c, jax.random.PRNGKey(0)))(cloud)
            return batched_register(readings, refs_, T0s_, bcfg,
                                    prepped_ref=fref_)

        res = stream_step(raw_b, refs, fref, T0s)
        jax.block_until_ready(res.T)
        err = float(jnp.linalg.norm(
            se3.log(se3.inverse(res.T[0]) @ offset)))
        n_rep = max(50 // B, 10)
        t0 = time.perf_counter()
        for _ in range(n_rep):
            res = stream_step(raw_b, refs, fref, T0s)
        jax.block_until_ready(res.T)
        dt = (time.perf_counter() - t0) / (n_rep * B)
        print(f"micro-batch B={B}: {dt*1e3:.2f} ms/reg "
              f"({1/dt:.0f} regs/s), err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()

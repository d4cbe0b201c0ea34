"""Chip micro A/B: per-scan sync strategies for the ST facade hot path.

Replicates process_data's device work on fixed inputs (64k raw cloud,
persistent reference, cached probe map) and times three shapes:

  A) register dispatch -> device_get(result)                [old, no probe]
  B) register dispatch -> device_get -> probe -> float(ov)  [old, 2 syncs]
  C) fused register+probe dispatch -> device_get(both)      [new, 1 sync]
  D) C but device_get only (T, overlap, ov) scalars         [thin readback]

Usage: python scripts/probe_sync_strategies.py [reps]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from pgslam_tpu.cloud import make_cloud
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.localizer import (_prepare_and_register,
                                      _prepare_register_probe, _probe_build)
    from pgslam_tpu.localmap import stack_keyframes
    from pgslam_tpu.graph.pose_graph import MapManager
    from pgslam_tpu.ops.icp import ICPEngine, compute_overlap

    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    print(f"backend: {jax.devices()}", flush=True)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from velodyne_slam import velodyne_config
    scfg = velodyne_config()
    cfg = scfg.localizer.icp
    cap = scfg.localizer.keyframe_cloud_capacity

    rng = np.random.default_rng(0)
    world = corridor_world(rng, n_points=200000, length=60.0, width=8.0,
                           height=5.0)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [10.0, 0.0, 1.8]
    map_pts = render_scan(world, T, rng, 65536, max_range=30.0, noise=0.01)
    raw_pts = render_scan(world, T, rng, 65536, max_range=30.0, noise=0.01)

    eng = ICPEngine(cfg)
    # local-map-capacity reference like the facade (3 x keyframe cap)
    ref = eng.prepare_reference(make_cloud(map_pts, capacity=3 * cap))
    raw = make_cloud(raw_pts, capacity=65536)
    jax.block_until_ready(ref.points)

    # cached probe map: same scene rendered 2 m ahead
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

    args = (chain, cap, cfg, raw, T_rs, key, ref, T0, None)

    # warm all variants
    c, r, res = _prepare_and_register(*args)
    jax.block_until_ready(res.T)
    c, r, res, ov = _prepare_register_probe(*args, probe_map, T_world_refkf)
    jax.block_until_ready(res.T)
    ovp = compute_overlap(r, probe_map, T_world_refkf @ res.T, cfg)
    jax.block_until_ready(ovp)

    def timeit(name, fn):
        t0 = time.perf_counter()
        for _ in range(reps):
            fn()
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name}: {dt:.2f} ms/scan", flush=True)

    timeit("A register + device_get(result)        ",
           lambda: jax.device_get(_prepare_and_register(*args)[2]))

    def b():
        _, rd, res = _prepare_and_register(*args)
        res = jax.device_get(res)
        ov = compute_overlap(rd, probe_map,
                             T_world_refkf @ jnp.asarray(res.T), cfg)
        float(ov)
    timeit("B register sync, then probe sync       ", b)

    def cfused():
        _, _, res, ov = _prepare_register_probe(*args, probe_map,
                                                T_world_refkf)
        jax.device_get((res, ov))
    timeit("C fused register+probe, one device_get ", cfused)

    def d():
        _, _, res, ov = _prepare_register_probe(*args, probe_map,
                                                T_world_refkf)
        jax.device_get((res.T, res.overlap, res.iterations,
                        res.converged, ov))
    timeit("D fused, thin readback (no cov)        ", d)

    def e():
        _, _, res, ov = _prepare_register_probe(*args, probe_map,
                                                T_world_refkf)
        jax.block_until_ready(res.T)
    timeit("E fused, block only (no transfer)      ", e)


if __name__ == "__main__":
    main()

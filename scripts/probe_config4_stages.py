"""Stage profile of config 4 (64k full SLAM): where do 70 ms/scan go?

Replays bench config 4's exact pipeline (native .bin loader ->
prefetch_clouds -> PoseGraphSlam.add_data) but splits add_data's wall
cost into its phases per scan:

  make_cloud+put  host pad/copy + h2d enqueue (inside prefetch_clouds)
  dispatch        _prepare_and_register call until it RETURNS (async)
  sync            begin_finish's device_get of the result bundle
  decide          decision tree + neighbor probe + map rebuilds

Also reports a no-facade lower bound: the same clouds fed straight
through ICPEngine.__call__ (one dispatch + one sync per scan).

Usage: python scripts/probe_config4_stages.py [n_scans]
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
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.slam import PoseGraphSlam
    from pgslam_tpu.utils import StageTimer
    from pgslam_tpu.utils.prefetch import prefetch_clouds
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "examples"))
    from velodyne_slam import velodyne_config

    n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 24
    step = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    print(f"backend: {jax.devices()}  n={n_scans} step={step}", flush=True)

    rng = np.random.default_rng(0)
    world = corridor_world(rng, n_points=200000,
                           length=max(60.0, n_scans * step + 10),
                           width=8.0, height=5.0)

    def pose_at(x):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [x, 0.0, 1.8]
        return T

    poses = [pose_at(2.0 + i * step) for i in range(n_scans)]
    scans = [render_scan(world, T, rng, 65536, max_range=30.0, noise=0.01)
             for T in poses]
    print("rendered", flush=True)

    slam = PoseGraphSlam(velodyne_config())
    slam.add_data(0, "world", poses[0], np.eye(4), scans[0])
    slam.add_data(1, "world", poses[1], np.eye(4), scans[1])  # warm

    timer = StageTimer()
    loc = slam.localizer

    # Monkey-patch phase boundaries: time process_data's pieces.
    orig_finish = loc.begin_finish
    orig_update = loc.update_after_icp

    def begin_finish_timed(result):
        with timer.stage("sync(device_get)"):
            return orig_finish(result)

    def update_timed(result):
        with timer.stage("decide+rebuild"):
            return orig_update(result)

    loc.begin_finish = begin_finish_timed
    loc.update_after_icp = update_timed

    orig_probe = loc.compute_overlap_with
    orig_apply = loc.apply_composition
    orig_closest = loc.local_map.find_closest_vertex
    orig_neighbor = loc.find_neighbor_local_map_composition
    orig_addkf = loc.mm.add_new_keyframe

    def probe_timed(comp, **kw):
        with timer.stage("  overlap probe"):
            return orig_probe(comp, **kw)

    orig_cmap = loc._cached_probe_map

    def cmap_timed(comp):
        import pgslam_tpu.utils as U
        before = U.counters["localizer/probe_cache_miss"]
        t0 = time.perf_counter()
        out = orig_cmap(comp)
        jax.block_until_ready(out.points)
        dt = time.perf_counter() - t0
        name = ("    probe map MISS"
                if U.counters["localizer/probe_cache_miss"] > before
                else "    probe map hit")
        timer.totals[name] += dt
        timer.counts[name] += 1
        return out

    loc._cached_probe_map = cmap_timed

    def apply_timed(build=True):
        with timer.stage("  apply_composition(set_map)"):
            return orig_apply(build)

    def closest_timed(T):
        with timer.stage("  find_closest_vertex"):
            return orig_closest(T)

    def neighbor_timed(*a, **kw):
        with timer.stage("  find_neighbor_comp"):
            return orig_neighbor(*a, **kw)

    def addkf_timed(*a, **kw):
        with timer.stage("  add_new_keyframe"):
            return orig_addkf(*a, **kw)

    orig_rebuild = loc.local_map.update_to_new_composition

    def rebuild_timed(graph, comp, build=True):
        with timer.stage("    lm rebuild (stack+build)"):
            return orig_rebuild(graph, comp, build=build)

    orig_setmap = loc.icp_engine.set_map

    def setmap_timed(cloud):
        with timer.stage("    engine set_map (ref prep)"):
            out = orig_setmap(cloud)
            jax.block_until_ready(loc.icp_engine.reference.points)
            return out

    orig_refkf = loc.update_refkf_robot_pose
    orig_fapply = loc.finish_apply

    def refkf_timed():
        with timer.stage("    update_refkf_pose"):
            return orig_refkf()

    def fapply_timed():
        with timer.stage("    finish_apply(total)"):
            return orig_fapply()

    loc.update_refkf_robot_pose = refkf_timed
    loc.finish_apply = fapply_timed
    loc.local_map.update_to_new_composition = rebuild_timed
    loc.icp_engine.set_map = setmap_timed
    loc.compute_overlap_with = probe_timed
    loc.apply_composition = apply_timed
    loc.local_map.find_closest_vertex = closest_timed
    loc.find_neighbor_local_map_composition = neighbor_timed
    loc.mm.add_new_keyframe = addkf_timed

    import pgslam_tpu.localizer as L
    orig_par = L._prepare_and_register

    def par_timed(*a, **kw):
        with timer.stage("dispatch(prep+reg)"):
            return orig_par(*a, **kw)

    L._prepare_and_register = par_timed

    t0 = time.perf_counter()
    with timer.stage("TOTAL loop"):
        for i, cloud in enumerate(prefetch_clouds(scans[2:],
                                                  capacity=65536),
                                  start=2):
            with timer.stage("add_data"):
                slam.add_data(i, "world", poses[i], np.eye(4), cloud)
    wall = time.perf_counter() - t0
    n = n_scans - 2
    print(f"facade: {wall/n*1e3:.1f} ms/scan ({n/wall:.2f} scans/s), "
          f"keyframes={int(slam.get_graph().n_vertices)}", flush=True)
    for k, v in timer.summary().items():
        print(f"  {k:24s} count={v['count']:4d} mean={v['mean_ms']:8.2f} ms",
              flush=True)
    from pgslam_tpu.utils import counters
    print({k: int(v) for k, v in counters.items() if "probe" in k},
          flush=True)
    L._prepare_and_register = orig_par

    # Lower bound: raw engine calls on the same scans (persistent map).
    from pgslam_tpu.cloud import make_cloud
    eng = loc.icp_engine
    T0 = np.eye(4, dtype=np.float32)
    res = eng(make_cloud(scans[2], capacity=65536), T0)
    jax.block_until_ready(res.T)
    t0 = time.perf_counter()
    for cloud in prefetch_clouds(scans[2:], capacity=65536):
        res = eng(cloud, T0)
        _ = np.asarray(res.T)   # per-scan sync, like the facade
    dt = (time.perf_counter() - t0) / n
    print(f"engine-only lower bound (same clouds, per-scan sync): "
          f"{dt*1e3:.2f} ms/scan", flush=True)


if __name__ == "__main__":
    main()

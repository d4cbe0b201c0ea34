"""BASELINE config 4 demo: Velodyne-scale full SLAM loop.

Feeds 64k-point synthetic spins (or real KITTI .bin files if a directory
is given) through the full pipeline with the production voxel-working-set
+ Pallas-matcher ICP configuration.

    python examples/velodyne_slam.py [kitti_velodyne_dir] [n_scans]
"""
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

import numpy as np

from pgslam_tpu.datasets import load_kitti_bin, velodyne_like_scan
from pgslam_tpu.localizer import LocalizerConfig
from pgslam_tpu.loopcloser import LoopCloserConfig
from pgslam_tpu.ops import filters as F
from pgslam_tpu.ops import outlier as O
from pgslam_tpu.ops.icp import ICPConfig
from pgslam_tpu.slam import PoseGraphSlam, SlamConfig
from pgslam_tpu.utils import StageTimer


def velodyne_config(sync_lag: int = 0) -> SlamConfig:
    # The chip-proven single-stream profile (bench.py, BENCH_NOTES
    # late-r3): packed hi/lo bf16 matcher + coarse-to-fine at a 2k/8k
    # voxel working set + mi=5. The original profile here (HIGHEST
    # f32 matmuls, no c2f, mi=12, 4k/16k) measured 73.7 ms/scan
    # engine-only on chip; this one registers the same renders at
    # 2.5 ms with the same few-cm recovered accuracy
    # (scripts/probe_config4_stages.py A/B).
    icp = ICPConfig(
        error="point_to_plane", matcher="pallas",
        pallas_precision="high",
        reading_filters=(F.VoxelGrid(voxel_size=0.4, hash_size=1 << 17),
                         F.Compact(2048)),
        reference_filters=(F.VoxelGrid(voxel_size=0.2, hash_size=1 << 18),
                           F.Compact(8192),
                           F.SurfaceNormal(knn=8, tile_query=4096)),
        outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
        coarse_div=8, coarse_iterations=8,
        max_iterations=5, trans_eps=1e-4, rot_eps=1e-4,
        max_correction_trans=3.0, max_correction_rot=0.5)
    # sync_lag=2 is the deployable live-loop profile on relay-attached
    # chips: scan results commit two scans late (MT-style staleness,
    # LocalizerConfig.sync_lag docstring) so the packed-result d2h
    # overlaps the next scans' transfers — chip A/B
    # (scripts/probe_deferred_sync.py): per-scan sync 197 ms/scan vs
    # lag-2 + async copy 36 ms/scan (= the no-readback pipeline floor)
    # in the same session.
    # The LoopCloser gets a VERIFICATION-grade variant of the same
    # pipeline: mi=5 is a fixed-budget throughput profile whose eps
    # checker has one iteration of room, so check_icp_result
    # (LoopCloser.hpp:317 semantics) would reject ~every closure as
    # max_iter_reached (the r4 dead-zone guard flags exactly this).
    # Verification runs once per keyframe, not per scan — iteration
    # budget is cheap there.
    verify_icp = dataclasses.replace(icp, max_iterations=24)
    # deferred_verification rides the spawn-time verification's ~30 ms
    # packed d2h behind the NEXT scan's window (same staleness class as
    # sync_lag; it is only enabled alongside it) — keyframe-event
    # commits were the dominant term of the r4 live loop (BENCH_NOTES
    # config-4 lag-2 profile: events 60-140 ms vs 4-23 ms steady scans).
    return SlamConfig(
        localizer=LocalizerConfig(icp=icp, keyframe_cloud_capacity=65536,
                                  overlap_threshold=0.8,
                                  sync_lag=sync_lag),
        loop_closer=LoopCloserConfig(icp=verify_icp,
                                     topo_dist_threshold=30.0,
                                     geom_dist_threshold=10.0,
                                     overlap_threshold=0.6,
                                     deferred_verification=sync_lag > 0),
        sensor_cloud_capacity=65536)


def main():
    src = sys.argv[1] if len(sys.argv) > 1 else None
    n_scans = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    rng = np.random.default_rng(0)

    if src and os.path.isdir(src):
        # Native async loader (C++ IO worker) when available; the numpy
        # reader otherwise.
        try:
            from pgslam_tpu.native import ScanLoader
            import itertools
            scans = list(itertools.islice(ScanLoader(src), n_scans))
            scans = [s[:65536] for s in scans]
            print(f"streamed {len(scans)} KITTI scans from {src} "
                  f"(native loader)")
        except ImportError:
            files = sorted(os.listdir(src))[:n_scans]
            scans = [load_kitti_bin(os.path.join(src, f), max_points=65536)
                     for f in files]
            print(f"loaded {len(scans)} KITTI scans from {src}")
    else:
        scans = [velodyne_like_scan(rng, 65536) for _ in range(n_scans)]
        print(f"generated {len(scans)} synthetic 64k-pt spins")

    slam = PoseGraphSlam(velodyne_config())
    timer = StageTimer()
    T = np.eye(4, dtype=np.float32)
    for i, scan in enumerate(scans):
        T = T.copy()
        T[0, 3] += 1.0   # crude forward odometry prior
        with timer.stage("add_data"):
            slam.add_data(i, "world", T, np.eye(4), scan)
        est = slam.localizer.T_world_robot
        print(f"scan {i}: pose=({est[0,3]:.2f},{est[1,3]:.2f},{est[2,3]:.2f})"
              f" keyframes={slam.get_graph().n_vertices}")
    print("timing:", timer.summary())
    slam.write_graphviz("/tmp/velodyne_graph.dot")


if __name__ == "__main__":
    main()

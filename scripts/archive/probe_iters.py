"""Accuracy vs fine-iteration count on the bench's batched protocol.

The fused kernel spends ~1/7 of its time per fine iteration, so if the
accuracy envelope saturates below the current max_iterations=6 (or does
so with Anderson acceleration at a lower count), that's a direct
throughput lever. Accuracy-vs-iterations is a property of the math
(trim ratio, noise, world geometry), not the matcher backend, so this
runs the XLA brute-force path on CPU with a reduced agent count.

Usage: python scripts/probe_iters.py [B] [profile]
  profile: "batched" (default; 1k/8k working set, stride-32 packets,
  bench cfg_b) or "single" (2k/8k working set on the full 64k reading,
  the single-stream bench config, currently max_iterations=10).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from pgslam_tpu import se3
    from pgslam_tpu.cloud import Cloud, make_cloud, stack_clouds
    from pgslam_tpu.datasets import corridor_world, render_scan
    from pgslam_tpu.ops import filters as F
    from pgslam_tpu.ops import outlier as O
    from pgslam_tpu.ops.icp import ICPConfig, ICPEngine
    from pgslam_tpu.parallel.batched import batched_register

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    profile = sys.argv[2] if len(sys.argv) > 2 else "batched"
    rng = np.random.default_rng(0)
    world = corridor_world(rng, n_points=300000, length=120.0, width=8.0,
                           height=5.0)
    brng = np.random.default_rng(42)

    def agent_pose(b):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [5.0 + b * 0.85, 0.0, 1.8]
        return T

    map_raw = np.stack([
        render_scan(world, agent_pose(b), brng, 65536,
                    max_range=30.0, noise=0.01) for b in range(B)])
    read_raw = np.stack([
        render_scan(world, agent_pose(b), brng, 65536,
                    max_range=30.0, noise=0.01) for b in range(B)])
    twists = (brng.normal(size=(B, 6))
              * [0.15, 0.15, 0.03, 0.005, 0.005, 0.02]).astype(np.float32)
    offsets = np.asarray(jax.vmap(se3.exp)(jnp.asarray(twists)))
    inv = np.linalg.inv(offsets)
    readings_raw = (np.einsum("bij,bnj->bni", inv[:, :3, :3], read_raw)
                    + inv[:, None, :3, 3]).astype(np.float32)

    def cfg_of(mi, aa):
        return ICPConfig(
            error="point_to_plane", matcher="brute",
            reference_filters=(F.VoxelGrid(voxel_size=0.2,
                                           hash_size=1 << 18),
                               F.Compact(8192),
                               F.SurfaceNormal(knn=8, tile_query=4096)),
            outlier=(O.TrimmedDist(0.9), O.MaxDist(1.0)),
            coarse_div=8, coarse_iterations=8, anderson_m=aa,
            max_iterations=mi, trans_eps=1e-4, rot_eps=1e-4)

    # Reference prep is iteration-independent: do it once.
    eng = ICPEngine(cfg_of(6, 0))
    refs = stack_clouds([eng.prepare_reference(
        make_cloud(map_raw[b], capacity=65536)) for b in range(B)])

    if profile == "single":
        prep_chain = (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 17),
                      F.Compact(2048))
        sensor = readings_raw          # full 64k reading, no decimation
    else:
        prep_chain = (F.VoxelGrid(voxel_size=0.4, hash_size=1 << 15),
                      F.Compact(1024))
        sensor = readings_raw[:, ::32]  # bench's stride-32 packets, f32
    pkey = jax.random.PRNGKey(0)
    cloud = Cloud(points=jnp.asarray(sensor),
                  mask=jnp.ones(sensor.shape[:2], bool), descriptors={})
    readings = jax.vmap(lambda c: F.apply_chain(prep_chain, c, pkey))(cloud)
    Ts = jnp.tile(jnp.eye(4, dtype=jnp.float32), (B, 1, 1))

    for aa in (0, 3):
        for mi in (3, 4, 5, 6, 8):
            res = batched_register(readings, refs, Ts, cfg_of(mi, aa),
                                   fused="off")
            d = jax.vmap(lambda Tr, Tg: se3.log(se3.inverse(Tr) @ Tg))(
                res.T, jnp.asarray(offsets))
            en = np.linalg.norm(np.asarray(d), axis=1)
            its = np.asarray(res.iterations)
            print(f"aa={aa} mi={mi}: err q50/q90/max = "
                  f"{np.quantile(en, 0.5):.4f}/{np.quantile(en, 0.9):.4f}/"
                  f"{en.max():.4f} m  iters={its.min()}-{its.max()}",
                  flush=True)


if __name__ == "__main__":
    main()

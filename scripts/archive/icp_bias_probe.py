"""Isolate per-DOF ICP bias on ring-world scans.

Builds a 3-keyframe local map at true poses, registers the next scan with
a true-odometry init, and reports the mean/std of the 6-DOF error over
many trajectory locations. A nonzero mean = systematic bias.
"""
import os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")  # axon plugin overrides env vars
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from pgslam_tpu import se3
from pgslam_tpu.cloud import make_cloud, concatenate_clouds, transform_cloud
from pgslam_tpu.datasets import loop_world, render_scan
from pgslam_tpu.ops import outlier as O
from pgslam_tpu.ops.icp import ICPConfig, icp


def pose_at(ang, radius=12.0):
    T = np.eye(4, dtype=np.float32)
    c, s = np.cos(ang + np.pi / 2), np.sin(ang + np.pi / 2)
    T[0, 0], T[0, 1], T[1, 0], T[1, 1] = c, -s, s, c
    T[:3, 3] = [radius * np.cos(ang), radius * np.sin(ang), 1.2]
    return T


def main():
    rng = np.random.default_rng(3)
    world = loop_world(rng, radius=12.0)
    cfg = ICPConfig(error="point_to_point", max_iterations=30,
                    outlier=(O.TrimmedDist(0.85), O.MaxDist(0.5)),
                    trans_eps=1e-3, rot_eps=1e-3)
    step_ang = 1.16 / 12.0   # ~1.16 m steps like the sequence
    errs = []
    for k in range(16):
        base = 2 * np.pi * k / 16
        # Local map: 3 keyframes at true poses, in refkf frame.
        kf_angs = [base - 2 * step_ang * 3, base - step_ang * 3, base]
        kf_poses = [pose_at(a) for a in kf_angs]
        ref = kf_poses[-1]
        clouds = []
        for Tk in kf_poses:
            sc = render_scan(world, Tk, rng, 1024, max_range=7.0, noise=0.003)
            c = make_cloud(sc, capacity=1024)
            T_ref_k = np.linalg.inv(ref) @ Tk
            clouds.append(transform_cloud(jnp.asarray(
                T_ref_k.astype(np.float32)), c))
        local_map = concatenate_clouds(clouds)
        # Next scan, one step ahead, with true init.
        T_next = pose_at(base + step_ang)
        scan = render_scan(world, T_next, rng, 1024, max_range=7.0,
                           noise=0.003)
        reading = make_cloud(scan, capacity=1024)
        T_true_refkf = (np.linalg.inv(ref) @ T_next).astype(np.float32)
        res = icp(reading, local_map, jnp.asarray(T_true_refkf), cfg)
        err = np.asarray(se3.log(se3.inverse(res.T)
                                 @ jnp.asarray(T_true_refkf)))
        # Express translation error in the WORLD frame for interpretability.
        werr = ref[:3, :3] @ err[:3]
        errs.append(np.concatenate([werr, err[3:]]))
        print(f"loc {k}: world-t err={np.round(werr, 4)} "
              f"rot err={np.round(err[3:], 5)} "
              f"ov={float(res.overlap):.3f} it={int(res.iterations)}")
    errs = np.stack(errs)
    print("MEAN:", np.round(errs.mean(0), 5))
    print("STD :", np.round(errs.std(0), 5))


if __name__ == "__main__":
    main()

"""Measure the fp32 accuracy envelope (VERDICT r2 item 8 / missing #2).

The reference is templated over <float|double>
(/root/reference/src/pgslam/PoseGraphSlam.h:67-68,
tests/instantiation.cpp:4-20); this framework is fp32 end-to-end on the
TPU compute path (fp64 only in host-side re-anchoring orthonormalization).
This script measures the bounds that PARITY.md's "double precision"
section reports:

1. se3 exp/log round-trip error vs an fp64 NumPy reference, including the
   small-angle Taylor-guard band;
2. compose/inverse chain drift (the Localizer re-anchoring pattern) with
   and without the fp64 orthonormalization;
3. the bf16 hi/lo ("packed-high") matcher split noise floor at survey
   coordinate scales vs exact-f32 distances;
4. pose-graph LM convergence vs an fp64 NumPy Gauss-Newton reference on
   the same ring graph.

Runs on the CPU backend:  python scripts/measure_fp32_envelope.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)   # for the fp64 references only

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pgslam_tpu import se3  # noqa: E402


def log(m):
    print(m, flush=True)


# ---------------------------------------------------------------- fp64 refs

def exp64(xi):
    """fp64 SE(3) exp (NumPy, closed form)."""
    t, w = xi[:3], xi[3:]
    th = np.linalg.norm(w)
    K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if th < 1e-12:
        R = np.eye(3) + K
        V = np.eye(3) + 0.5 * K
    else:
        A = np.sin(th) / th
        B = (1 - np.cos(th)) / th**2
        C = (1 - A) / th**2
        R = np.eye(3) + A * K + B * (K @ K)
        V = np.eye(3) + B * K + C * (K @ K)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = V @ t
    return T


def log64(T):
    R = T[:3, :3]
    tr = np.clip((np.trace(R) - 1) / 2, -1.0, 1.0)
    th = np.arccos(tr)
    if th < 1e-12:
        w = np.array([R[2, 1] - R[1, 2], R[0, 2] - R[2, 0],
                      R[1, 0] - R[0, 1]]) * 0.5
        Vinv = np.eye(3)
        K = np.zeros((3, 3))
    else:
        w = th / (2 * np.sin(th)) * np.array(
            [R[2, 1] - R[1, 2], R[0, 2] - R[2, 0], R[1, 0] - R[0, 1]])
        K = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]],
                      [-w[1], w[0], 0]])
        A = np.sin(th) / th
        B = (1 - np.cos(th)) / th**2
        Vinv = (np.eye(3) - 0.5 * K
                + (1 / th**2) * (1 - A / (2 * B)) * (K @ K))
    t = Vinv @ T[:3, 3]
    return np.concatenate([t, w])


# ------------------------------------------------------------- measurements

def measure_se3_roundtrip():
    rng = np.random.default_rng(0)
    rows = []
    for scale, n in [(1e-6, 2000), (1e-4, 2000), (1e-2, 2000), (1.0, 2000),
                     (2.9, 2000)]:  # up to near pi rotations
        xi = rng.normal(size=(n, 6)) * scale
        xi32 = jnp.asarray(xi, jnp.float32)
        T32 = jax.vmap(se3.exp)(xi32)
        back = np.asarray(jax.vmap(se3.log)(T32), np.float64)
        ref = np.stack([log64(exp64(x)) for x in xi])
        err = np.abs(back - ref)
        rel = err.max() / max(scale, 1e-30)
        rows.append((scale, err.max(), rel))
        log(f"se3 exp/log roundtrip  |xi|~{scale:g}: "
            f"max abs err {err.max():.3e}  rel {rel:.3e}")
    return rows


def measure_anchor_chain():
    """inv(kf) @ T_world chains (localizer re-anchoring): fp32 drift per
    step with and without the host-side fp64 orthonormalization."""
    from pgslam_tpu.localizer import _orthonormalize

    rng = np.random.default_rng(1)
    T64 = np.eye(4)
    T32_plain = np.eye(4, dtype=np.float32)
    T32_ortho = np.eye(4, dtype=np.float32)
    worst_plain = worst_ortho = 0.0
    for k in range(500):
        xi = rng.normal(size=6) * 0.1
        step64 = exp64(xi)
        step32 = np.asarray(se3.exp(jnp.asarray(xi, jnp.float32)),
                            np.float64)
        T64 = T64 @ step64
        T32_plain = (T32_plain @ step32.astype(np.float32)).astype(
            np.float32)
        T32_ortho = _orthonormalize(
            (T32_ortho @ step32.astype(np.float32)).astype(np.float32))
        worst_plain = max(worst_plain, np.abs(
            T32_plain[:3, :3].astype(np.float64) @ T32_plain[:3, :3].T
            .astype(np.float64) - np.eye(3)).max())
        worst_ortho = max(worst_ortho, np.abs(
            T32_ortho[:3, :3].astype(np.float64) @ T32_ortho[:3, :3].T
            .astype(np.float64) - np.eye(3)).max())
    d_plain = np.abs(T32_plain - T64).max()
    d_ortho = np.abs(T32_ortho - T64).max()
    log(f"500-step compose chain: plain fp32 dev {d_plain:.3e} "
        f"(orthogonality {worst_plain:.3e}); with fp64 re-anchor "
        f"orthonormalize dev {d_ortho:.3e} (orthogonality "
        f"{worst_ortho:.3e})")
    return d_plain, d_ortho, worst_plain, worst_ortho


def measure_bf16_split_floor():
    """Packed hi/lo bf16 distance error vs exact f32, at map scales."""
    rng = np.random.default_rng(2)
    for scale in (1.0, 50.0, 200.0):
        q = rng.uniform(-scale, scale, (2048, 3))
        r = rng.uniform(-scale, scale, (4096, 3))
        q32 = q.astype(np.float32)
        r32 = r.astype(np.float32)
        # exact f32 squared distances (fp64 accumulation of f32 inputs)
        d_exact = ((q32[:, None, :].astype(np.float64)
                    - r32[None, :, :].astype(np.float64)) ** 2).sum(-1)
        # two-term bf16 split cross term: |q|^2 - 2 q.r + |r|^2 with q.r
        # computed from (qh+ql).(rh+rl) dropping the ql.rl term — the
        # packed-high kernel's arithmetic.
        def split(x):
            hi = x.astype(jnp.bfloat16).astype(np.float32)
            return hi, x - hi
        qh, ql = split(q32)
        rh, rl = split(r32)
        cross = (qh.astype(np.float64) @ rh.T.astype(np.float64)
                 + qh.astype(np.float64) @ rl.T.astype(np.float64)
                 + ql.astype(np.float64) @ rh.T.astype(np.float64))
        d_packed = ((q32.astype(np.float64) ** 2).sum(-1)[:, None]
                    - 2 * cross
                    + (r32.astype(np.float64) ** 2).sum(-1)[None, :])
        err = np.abs(d_packed - d_exact)
        # error in the same units as coordinates: effect on sqrt(d)
        pos = np.sqrt(np.maximum(d_exact, 1e-12))
        derr = (err / (2 * pos)).max()
        nn_exact = d_exact.argmin(1)
        nn_packed = d_packed.argmin(1)
        agree = (nn_exact == nn_packed).mean()
        log(f"bf16 packed-high split @ ±{scale:g} m: max |Δd²| "
            f"{err.max():.3e} m² (≈{derr:.2e} m at the match distance), "
            f"NN agreement {agree*100:.2f}%")


def measure_lm_vs_fp64():
    """Fused-contract LM (fp32) vs fp64 NumPy Gauss-Newton on one ring."""
    from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph

    V, E = 256, 512
    rng = np.random.default_rng(3)
    ang = 2 * np.pi * np.arange(V) / V
    true = np.stack([exp64(np.array([10 * np.cos(a), 10 * np.sin(a), 0,
                                     0, 0, a])) for a in ang])
    # ring: measurements from truth; loop edges random
    ef = np.concatenate([np.arange(V - 1), rng.integers(0, V, E - V + 1)])
    et = np.concatenate([np.arange(1, V), rng.integers(0, V, E - V + 1)])
    dup = ef == et
    et[dup] = (et[dup] + 1) % V
    Z = np.einsum("eij,ejk->eik", np.linalg.inv(true[ef]), true[et])
    init = true.copy()
    noise = rng.normal(size=(V, 6)) * 0.03
    noise[0] = 0
    init = np.einsum("vij,vjk->vik", true,
                     np.stack([exp64(x) for x in noise]))

    # fp64 Gauss-Newton reference (dense normal equations, 20 iterations)
    def gn64(poses):
        poses = poses.copy()
        for _ in range(20):
            H = np.zeros((6 * V, 6 * V))
            b = np.zeros(6 * V)
            for e in range(len(ef)):
                f, t = ef[e], et[e]
                M = np.linalg.inv(poses[f]) @ poses[t]
                r = log64(np.linalg.inv(Z[e]) @ M)
                # numeric Jacobians in fp64 (right perturbation)
                Jf = np.zeros((6, 6))
                Jt = np.zeros((6, 6))
                h = 1e-7
                for k in range(6):
                    d = np.zeros(6)
                    d[k] = h
                    P = exp64(d)
                    Jf[:, k] = (log64(np.linalg.inv(Z[e]) @ np.linalg.inv(
                        poses[f] @ P) @ poses[t]) - r) / h
                    Jt[:, k] = (log64(np.linalg.inv(Z[e]) @ M @ P) - r) / h
                info = np.eye(6) * 100.0
                for (a, Ja) in ((f, Jf), (t, Jt)):
                    b[6*a:6*a+6] += Ja.T @ info @ r
                    for (c, Jc) in ((f, Jf), (t, Jt)):
                        H[6*a:6*a+6, 6*c:6*c+6] += Ja.T @ info @ Jc
            H[:6, :6] += np.eye(6) * 1e12   # anchor
            H += np.eye(6 * V) * 1e-9
            delta = np.linalg.solve(H, -b)
            for v in range(V):
                poses[v] = poses[v] @ exp64(delta[6*v:6*v+6])
        return poses

    ref = gn64(init)
    covs = np.tile((np.eye(6) * 0.01).astype(np.float32),
                   (len(ef), 1, 1))
    args = (jnp.asarray(init, jnp.float32), jnp.ones(V, bool),
            jnp.asarray(ef, jnp.int32), jnp.asarray(et, jnp.int32),
            jnp.asarray(Z, jnp.float32), jnp.asarray(covs),
            jnp.ones(len(ef), bool), jnp.int32(0))
    out, stats = optimize_pose_graph(
        *args, config=PGOConfig(max_iterations=10, cg_iterations=50,
                                cg_tol=1e-6))
    out = np.asarray(out, np.float64)
    terr = np.linalg.norm(out[:, :3, 3] - ref[:, :3, 3], axis=1)
    rerr = np.array([np.abs(out[v][:3, :3] - ref[v][:3, :3]).max()
                     for v in range(V)])
    log(f"LM fp32 vs fp64 GN reference (V={V}, E={len(ef)}): max |Δt| "
        f"{terr.max():.3e} m, max |ΔR| {rerr.max():.3e}; fp32 final cost "
        f"{float(stats['final_cost']):.3e}")


def main():
    log("== fp32 accuracy envelope (CPU backend, fp64 references) ==")
    measure_se3_roundtrip()
    measure_anchor_chain()
    measure_bf16_split_floor()
    measure_lm_vs_fp64()


if __name__ == "__main__":
    main()

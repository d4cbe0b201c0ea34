"""SE(3) pose-graph optimization: jitted Levenberg-Marquardt with batched
6x6 Jacobian blocks and block-Jacobi preconditioned conjugate gradient.

TPU-native replacement for the reference's GTSAM back-end
(``BetweenFactor<Pose3>`` + ``PriorFactor`` + LM, ``Optimizer.hpp:68,
89-130``). Where GTSAM builds a sparse factor graph and runs sparse
Cholesky on the host, we keep everything as fixed-shape arrays:

* residuals/Jacobians of all E between-factors are computed batched
  (``[E, 6]`` / ``[E, 6, 6]``),
* the normal-equation operator ``H x`` is applied matrix-free via
  ``segment_sum`` scatters (never materializing H),
* the linear solve is block-Jacobi PCG with a fixed iteration cap inside
  ``lax.while_loop`` — one XLA dispatch for the whole LM optimization.

Conventions: twists/covariances are in PM order [t; r] end-to-end (the
reference's [t;r] -> GTSAM [r;t] reorder at ``Optimizer.hpp:33-42`` is not
needed internally; see :func:`pgslam_tpu.optimizer.pm_cov_to_gtsam_cov`
for the parity helper). The anchor vertex gets a near-rigid prior with
sigma = 1e-6 (``Optimizer.hpp:124-130``).
"""

from __future__ import annotations

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from .. import se3


@dataclasses.dataclass(frozen=True)
class PGOConfig:
    max_iterations: int = 50          # LM outer iterations
    # Linear solver:
    #   "pcg"        — matrix-free block-Jacobi CG. On TPU, when the
    #                  problem fits VMEM, the ENTIRE LM (residuals,
    #                  Jacobians, robust IRLS weights, preconditioner,
    #                  CG, retract, accept/reject) runs as ONE fused
    #                  Pallas kernel dispatch (optim/lm_pallas.py — the
    #                  XLA loop is launch-bound at ~5 ms/LM-iteration on
    #                  the relay chip). Larger graphs use the XLA loop;
    #                  the CG-only fused kernel (optim/pcg_pallas.py)
    #                  remains as an intermediate option.
    #   "pcg_xla"    — force the XLA CG loop (any backend/size).
    #   "pcg_pallas" — force the fused CG kernel (tests; interpret on CPU).
    #   "lm_pallas"  — force the whole-LM kernel (tests; interpret on CPU).
    #   "cholesky"   — dense 6Vx6V factorization; exact Newton steps
    #                  (measured ~6x slower than PCG on TPU at 1k poses).
    solver: str = "pcg"
    cg_iterations: int = 64           # CG cap per linear solve
    # Inexact-Newton: the LM step only needs a rough solve; 1e-4 on the
    # squared residual (1% on ||r||) costs ~15 CG iters with the
    # block-Jacobi preconditioner and LM absorbs the inexactness.
    cg_tol: float = 1e-4              # relative residual reduction
    lambda_init: float = 1e-6
    lambda_up: float = 10.0
    lambda_down: float = 0.1
    prior_sigma: float = 1e-6         # Optimizer.hpp:128
    min_step_norm: float = 1e-8       # convergence: ||delta||
    min_cost_decrease: float = 1e-7   # convergence: relative cost change
    # Edge<->vertex data movement inside the LM loop: "incidence" lowers
    # every gather/scatter to a one-hot [V, E] matmul (MXU-friendly; XLA
    # scatters serialize badly on TPU), "scatter" uses segment_sum
    # (cheaper on CPU and for very large graphs), "auto" picks incidence
    # while the two incidence matrices fit comfortably in HBM.
    assembly: str = "auto"
    # Robust kernel on edge residuals (beyond the reference, which uses
    # plain Gaussian noise models), applied as IRLS weights on each
    # edge's information. "huber" bounds an outlier's influence (linear
    # tail — good for moderately heavy tails); "cauchy" and "gm"
    # (Geman-McClure) are redescending — a grossly wrong loop closure's
    # influence decays toward zero instead of pulling linearly forever,
    # which is what survives aliased scan matches. "none" reproduces the
    # reference exactly. delta is the inlier scale in whitened-residual
    # units (||e||_Omega).
    robust: str = "none"
    robust_delta: float = 1.0


def _ad(xi: jax.Array) -> jax.Array:
    """SE(3) adjoint of a twist (little ad), [t; r] order:
    ad(xi) = [[hat(w), hat(v)], [0, hat(w)]]."""
    v, w = xi[..., :3], xi[..., 3:]
    hw = se3.hat(w)
    hv = se3.hat(v)
    zero = jnp.zeros_like(hw)
    top = jnp.concatenate([hw, hv], axis=-1)
    bot = jnp.concatenate([zero, hw], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _inv3(A: jax.Array) -> jax.Array:
    """Batched closed-form 3x3 inverse via the adjugate."""
    c1 = jnp.cross(A[..., 1, :], A[..., 2, :])
    c2 = jnp.cross(A[..., 2, :], A[..., 0, :])
    c3 = jnp.cross(A[..., 0, :], A[..., 1, :])
    det = jnp.sum(A[..., 0, :] * c1, axis=-1)[..., None, None]
    adjT = jnp.stack([c1, c2, c3], axis=-1)          # adj^T columns
    return adjT / det


def spd_inverse6(M: jax.Array) -> jax.Array:
    """Batched closed-form inverse of SPD 6x6 blocks via the Schur
    complement of the leading 3x3 block.

    ``jnp.linalg.inv`` on [N, 6, 6] lowers to tiny batched LU loops that
    serialize on TPU (measured ~1.7 ms per call at N=1024 — the dominant
    cost of an LM iteration); this closed form is a handful of fused
    batched ops.
    """
    A = M[..., :3, :3]
    B = M[..., :3, 3:]
    C = M[..., 3:, 3:]
    Ai = _inv3(A)
    AiB = Ai @ B
    S = C - jnp.swapaxes(B, -1, -2) @ AiB
    Si = _inv3(S)
    AiBSi = AiB @ Si
    TL = Ai + AiBSi @ jnp.swapaxes(AiB, -1, -2)
    TR = -AiBSi
    return jnp.concatenate([
        jnp.concatenate([TL, TR], axis=-1),
        jnp.concatenate([jnp.swapaxes(TR, -1, -2), Si], axis=-1),
    ], axis=-2)


def _jr_inv(e: jax.Array) -> jax.Array:
    """Inverse right Jacobian of SE(3), 2nd-order approximation:
    Jr^-1(e) ~= I + ad(e)/2 + ad(e)^2/12. Exact enough near convergence
    (residuals are small); LM handles the large-residual regime."""
    a = _ad(e)
    I = jnp.broadcast_to(jnp.eye(6, dtype=e.dtype), a.shape)
    return I + 0.5 * a + (1.0 / 12.0) * (a @ a)


# Canonical host-readability predicate lives in lm_pallas (_host_np);
# keep one definition so the n_loop auto-detect gate and the ranges
# upgrade gate can never disagree about the same input.
from .lm_pallas import _host_np as _host_readable  # noqa: E402


def optimize_pose_graph(poses: jax.Array,        # [V, 4, 4] initial values
                        vmask: jax.Array,        # [V] valid vertices
                        edge_from: jax.Array,    # [E] int32
                        edge_to: jax.Array,      # [E] int32
                        edge_T: jax.Array,       # [E, 4, 4] measurements
                        edge_cov: jax.Array,     # [E, 6, 6] PM order
                        emask: jax.Array,        # [E] valid edges
                        fixed_id: jax.Array,     # scalar int32 anchor
                        robust_emask: jax.Array | None = None,  # [E] where
                        # the robust kernel applies (None = every edge);
                        # production systems robustify loop closures only —
                        # odometry is trusted, so its quadratic cost must
                        # not saturate
                        config: PGOConfig = PGOConfig(),
                        n_loop="auto"):
    """Run LM on the pose graph; returns (optimized_poses, stats dict).

    Padded entries (vmask/emask False) contribute nothing and their poses
    pass through unchanged. Shapes are static: pad V/E to bucket sizes to
    avoid recompilation as the graph grows.

    This is an EAGER dispatcher over two jitted paths (each a single
    dispatch): the whole-LM Pallas kernel and the XLA LM loop. It must be
    eager because the kernel's chain-aware lane layout needs a STATIC
    loop-edge count read from concrete edge ids (``host_loop_count``) —
    under a surrounding ``jax.jit`` the ids are tracers, the count
    degrades to None, and the kernel falls back to the all-one-hot
    incidence layout (which only fits VMEM up to ~2k poses). Calling
    this inside jit still works and still fuses — it just loses the
    chain layout, exactly as before.

    ``n_loop``: "auto" detects the count from the ids when that is FREE
    (numpy inputs, or any input on the CPU backend). Ids living on an
    accelerator are NOT pulled back — a d2h sync per optimize would cost
    more than the layout saves (measured: the relay round-trip doubled
    the 1k optimize) — so device-side callers that want the chain layout
    pass the int computed from their host copies (the Optimizer does;
    see ``prepare_for_optimization``). None forces the legacy
    all-one-hot layout.
    """
    V = poses.shape[0]
    E = edge_from.shape[0]

    from .lm_pallas import _on_accelerator
    from .lm_pallas import fits_vmem as lm_fits
    from .lm_pallas import host_loop_count, layout_plan, lm_optimize_pallas
    if n_loop == "auto":
        n_loop = None
        if _host_readable(edge_from) and _host_readable(edge_to):
            n_loop = host_loop_count(edge_from, edge_to, V)
    if n_loop is not None and n_loop > 0.8 * E:
        n_loop = None  # too few chain edges to pay for the extra lanes
    # Layout policy (chip A/B, probe_pgo_sparse r3 + factored r4): the
    # all-one-hot layout is FASTER when its incidence fits VMEM (1k
    # sparse: legacy 5.8 ms vs chain 6.5 — lane rolls don't beat one-hot
    # MXU matmuls); the chain layout is the first capacity extension (S
    # scales with the closure count), and the rank-factored incidence
    # (B block one-hot + W lane one-hot, 1/64th the VMEM) is the second —
    # it takes dense >=4k and sparse >=16k graphs fused where r3 fell
    # back to the 44.6 ms XLA loop. PGSLAM_PGO_FORCE_CHAIN=1 keeps a
    # passed/detected count unconditional; PGSLAM_PGO_FORCE_FACTORED=1
    # forces the factored incidence (layout A/B probes).
    if (n_loop is not None and lm_fits(V, E, None)
            and os.environ.get("PGSLAM_PGO_FORCE_CHAIN", "") != "1"):
        n_loop = None
    plan = layout_plan(V, E, n_loop)
    if os.environ.get("PGSLAM_PGO_FORCE_FACTORED", "") == "1" \
            and plan is not None:
        plan = "factored"

    lm_kernel_eligible = _on_accelerator() and plan is not None
    if config.solver == "lm_pallas" or (config.solver == "pcg"
                                        and lm_kernel_eligible):
        # Single-dispatch whole-LM kernel (see optim/lm_pallas.py):
        # routing + incidence build + kernel + normalize/vmask
        # post-processing are all jitted together.
        return lm_optimize_pallas(
            poses, vmask, edge_from, edge_to, edge_T, edge_cov, emask,
            fixed_id, robust_emask, config=config, n_loop=n_loop,
            # A forced solver with no fitting plan still gets the
            # smallest-footprint layout rather than a guaranteed OOM.
            incidence=plan or "factored")
    if (plan is None and n_loop is not None and config.solver == "pcg"
            and _on_accelerator()):
        # RESCUE tier (r5): no resident overlay plan fits — typically
        # right after an edge-bucket growth, where padding slots inflate
        # the emask-BLIND loop-lane count (host_loop_count must bound the
        # traced routing's compacted population, padding included) past
        # every traced layout. The host-routed sorted-RANGES layout is
        # emask-AWARE — padding never consumes lanes — so it usually
        # still fits (resident panels, or HBM-streamed above ~24k); the
        # alternative is the 10-50x slower XLA fallback loop, which a
        # freshly-doubled bucket otherwise pays for thousands of calls.
        try:
            out = lm_optimize_pallas(
                poses, vmask, edge_from, edge_to, edge_T, edge_cov, emask,
                fixed_id, robust_emask, config=config, n_loop=n_loop,
                incidence="factored", rescue=True)
        except Exception as e:  # fail-soft: a rescue must never be worse
            # than the fallback it rescues from (chip r5: the HBM-
            # streamed ranges kernel can OOM scoped VMEM at the 32k
            # bucket — the estimate is a model, the compiler the truth)
            import logging
            logging.getLogger("pgslam_tpu.pgo").warning(
                "[PGO] ranges rescue failed (%s: %s) — falling back to "
                "the XLA loop", type(e).__name__, e)
            out = None
        if out is not None:
            return out
    return _optimize_xla(poses, vmask, edge_from, edge_to, edge_T,
                         edge_cov, emask, fixed_id, robust_emask,
                         config=config)


@functools.partial(jax.jit, static_argnames=("config",))
def _optimize_xla(poses, vmask, edge_from, edge_to, edge_T, edge_cov,
                  emask, fixed_id, robust_emask=None, *,
                  config: PGOConfig = PGOConfig()):
    """The XLA LM loop (one dispatch): incidence/scatter assembly,
    block-Jacobi PCG / dense Cholesky / fused-PCG solve, retraction and
    accept/reject. See ``optimize_pose_graph`` for the contract."""
    V = poses.shape[0]
    E = edge_from.shape[0]
    dtype = poses.dtype

    prior_info = jnp.asarray(1.0 / config.prior_sigma ** 2, dtype)
    prior_Tinv = se3.inverse(poses[fixed_id])
    Tinv_meas = se3.inverse(edge_T)
    # Closed-form SPD inverse: jnp.linalg.inv on tiny batched blocks
    # serializes on TPU (see spd_inverse6). Masked edges are zeroed below,
    # so guard them with identity to keep the inverse finite.
    cov_safe = jnp.where(emask[:, None, None], edge_cov,
                         jnp.eye(6, dtype=dtype))
    info = spd_inverse6(cov_safe)
    info = jnp.where(emask[:, None, None], info, 0.0)
    # Clamp padded edge endpoints into range (gathers stay in-bounds).
    edge_from = jnp.clip(edge_from, 0, V - 1)
    edge_to = jnp.clip(edge_to, 0, V - 1)

    # "auto": incidence matmuls pay off where scatters serialize (TPU);
    # on CPU segment_sum is cheaper than the dense [V, E] products.
    use_incidence = (config.assembly == "incidence"
                     or (config.assembly == "auto"
                         and jax.default_backend() != "cpu"
                         and V * E <= (1 << 24)))
    if use_incidence:
        # One-hot incidence matrices: gather x[edge_from] == Sf @ x and
        # segment_sum(y, edge_from) == Sf.T @ y — both MXU matmuls. On
        # TPU this removes every scatter from the LM hot loop (XLA
        # scatters with duplicate indices serialize); "highest" matmul
        # precision makes the one-hot selection bit-exact in f32.
        Sf = jax.nn.one_hot(edge_from, V, dtype=dtype)        # [E, V]
        St = jax.nn.one_hot(edge_to, V, dtype=dtype)
        _hp = jax.lax.Precision.HIGHEST

        def gather(x, S):
            return jnp.matmul(S, x.reshape(V, -1),
                              precision=_hp).reshape((E,) + x.shape[1:])

        def scatter_add(y, S):
            return jnp.matmul(S.T, y.reshape(E, -1),
                              precision=_hp).reshape((V,) + y.shape[1:])

        gather_f = lambda x: gather(x, Sf)
        gather_t = lambda x: gather(x, St)
        scatter_f = lambda y: scatter_add(y, Sf)
        scatter_t = lambda y: scatter_add(y, St)
    else:
        gather_f = lambda x: x[edge_from]
        gather_t = lambda x: x[edge_to]
        scatter_f = lambda y: jax.ops.segment_sum(y, edge_from,
                                                  num_segments=V)
        scatter_t = lambda y: jax.ops.segment_sum(y, edge_to,
                                                  num_segments=V)

    def edge_residuals(cur):
        """e_k = Log(Z_k^-1 X_f^-1 X_t) for all edges, batched."""
        Xf = gather_f(cur)
        Xt = gather_t(cur)
        M = se3.inverse(Xf) @ Xt
        return se3.log(Tinv_meas @ M), M

    def robust_weight(e):
        """IRLS weight per edge for the configured robust kernel."""
        if config.robust == "none":
            return None
        chi2 = jnp.einsum("ei,eij,ej->e", e, info, e)
        r = jnp.sqrt(jnp.maximum(chi2, 1e-30))
        d = config.robust_delta
        if config.robust == "huber":
            w = jnp.minimum(1.0, d / r)
        elif config.robust == "cauchy":
            w = 1.0 / (1.0 + chi2 / (d * d))
        elif config.robust == "gm":
            w = (d * d / (d * d + chi2)) ** 2
        else:
            raise ValueError(f"unknown robust kernel {config.robust!r}")
        if robust_emask is not None:
            w = jnp.where(robust_emask, w, 1.0)
        return w

    def build_system(cur):
        """Residuals + per-edge H blocks + gradient b (as [V, 6])."""
        e, M = edge_residuals(cur)
        rw = robust_weight(e)
        info_e = info if rw is None else info * rw[:, None, None]
        Jri = _jr_inv(e)
        Jt = Jri                                     # [E, 6, 6]
        Jf = -Jri @ se3.adjoint(se3.inverse(M))      # -Jr^-1 Ad(Xt^-1 Xf)
        JtT_O = jnp.swapaxes(Jt, -1, -2) @ info_e
        JfT_O = jnp.swapaxes(Jf, -1, -2) @ info_e
        H_tt = JtT_O @ Jt
        H_ff = JfT_O @ Jf
        H_ft = JfT_O @ Jt
        b_t = jnp.einsum("eij,ej->ei", JtT_O, e)
        b_f = jnp.einsum("eij,ej->ei", JfT_O, e)
        b = scatter_f(b_f) + scatter_t(b_t)
        # Prior on the anchor: r_p = Log(P^-1 X), J ~= I.
        rp = se3.log(prior_Tinv @ cur[fixed_id])
        b = b.at[fixed_id].add(prior_info * rp)
        # Block-diagonal of H (for damping + preconditioner).
        D = scatter_f(H_ff) + scatter_t(H_tt)
        D = D.at[fixed_id].add(prior_info * jnp.eye(6, dtype=dtype))
        return (H_ff, H_tt, H_ft), b, D

    def matvec(blocks, D, lam, x):
        """y = (H + lam * diag(D)) x, matrix-free. x [V, 6]."""
        H_ff, H_tt, H_ft = blocks
        xf = gather_f(x)
        xt = gather_t(x)
        yf = (jnp.einsum("eij,ej->ei", H_ff, xf)
              + jnp.einsum("eij,ej->ei", H_ft, xt))
        yt = (jnp.einsum("eij,ej->ei", H_tt, xt)
              + jnp.einsum("eji,ej->ei", H_ft, xf))   # H_tf = H_ft^T
        y = scatter_f(yf) + scatter_t(yt)
        y = y.at[fixed_id].add(prior_info * x[fixed_id])
        diag = jnp.diagonal(D, axis1=-2, axis2=-1)      # [V, 6]
        return y + lam * diag * x

    def pcg(blocks, D, lam, b):
        """Block-Jacobi PCG for (H + lam diag) x = -b."""
        # Preconditioner: invert per-vertex 6x6 diag blocks (+ damping).
        diag_term = lam * jnp.diagonal(D, axis1=-2, axis2=-1)
        P = D + jax.vmap(jnp.diag)(diag_term)
        # Guard padded vertices with identity blocks.
        P = jnp.where(vmask[:, None, None], P, jnp.eye(6, dtype=dtype))
        P_inv = spd_inverse6(P + 1e-10 * jnp.eye(6, dtype=dtype))

        rhs = -b
        x0 = jnp.zeros_like(rhs)
        r0 = rhs  # since x0 = 0
        z0 = jnp.einsum("vij,vj->vi", P_inv, r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)
        rhs_norm2 = jnp.maximum(jnp.sum(rhs * rhs), 1e-30)

        def cond(s):
            _, r, _, _, it = s
            return jnp.logical_and(
                it < config.cg_iterations,
                jnp.sum(r * r) > config.cg_tol * rhs_norm2)

        def body(s):
            x, r, p, rz, it = s
            Ap = matvec(blocks, D, lam, p)
            alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
            x = x + alpha * p
            r = r - alpha * Ap
            z = jnp.einsum("vij,vj->vi", P_inv, r)
            rz_new = jnp.sum(r * z)
            beta = rz_new / jnp.maximum(rz, 1e-30)
            p = z + beta * p
            return (x, r, p, rz_new, it + 1)

        x, _, _, _, n_iter = jax.lax.while_loop(
            cond, body, (x0, r0, p0, rz0, jnp.int32(0)))
        return x, n_iter

    def dense_solve(blocks, D, lam, b):
        """Assemble the full 6Vx6V normal matrix and Cholesky-solve.

        The scatter builds [V, V, 6, 6] block grid (V^2*36 floats — fine
        for V up to a few thousand), then one MXU-friendly factorization
        replaces ~50 preconditioned CG sweeps.
        """
        H_ff, H_tt, H_ft = blocks
        Hb = jnp.zeros((V, V, 6, 6), dtype)
        Hb = Hb.at[edge_from, edge_from].add(H_ff)
        Hb = Hb.at[edge_to, edge_to].add(H_tt)
        Hb = Hb.at[edge_from, edge_to].add(H_ft)
        Hb = Hb.at[edge_to, edge_from].add(jnp.swapaxes(H_ft, -1, -2))
        H = Hb.transpose(0, 2, 1, 3).reshape(6 * V, 6 * V)
        prior_block = prior_info * jnp.eye(6, dtype=dtype)
        H = jax.lax.dynamic_update_slice(
            H, jax.lax.dynamic_slice(H, (6 * fixed_id, 6 * fixed_id), (6, 6))
            + prior_block, (6 * fixed_id, 6 * fixed_id))
        # LM damping on the diagonal (same scaling as the PCG path) +
        # identity blocks for padded vertices so the factorization exists.
        diag_scale = jnp.diagonal(D, axis1=-2, axis2=-1).reshape(-1)
        pad = jnp.repeat(~vmask, 6)
        damped = jnp.diag(lam * diag_scale + jnp.where(pad, 1.0, 0.0)
                          + 1e-8)
        L = jnp.linalg.cholesky(H + damped)
        x = jax.scipy.linalg.cho_solve((L, True), -b.reshape(-1))
        return x.reshape(V, 6), jnp.int32(0)

    def make_pcg_fused():
        from .pcg_pallas import build_incidence_bf16, pcg_solve_pallas
        S_bf16 = build_incidence_bf16(edge_from, edge_to, V)

        def pcg_fused(blocks, D, lam, b):
            H_ff, H_tt, H_ft = blocks
            diag_term = lam * jnp.diagonal(D, axis1=-2, axis2=-1)
            P = D + jax.vmap(jnp.diag)(diag_term)
            P = jnp.where(vmask[:, None, None], P,
                          jnp.eye(6, dtype=dtype))
            P_inv = spd_inverse6(P + 1e-10 * jnp.eye(6, dtype=dtype))
            x = pcg_solve_pallas(
                S_bf16, H_ff, H_tt, H_ft, P_inv, diag_term, b,
                prior_info, fixed_id, n_edges=E,
                cg_iterations=config.cg_iterations, cg_tol=config.cg_tol)
            return x.astype(dtype), jnp.int32(0)

        return pcg_fused

    if config.solver == "cholesky" or (config.solver == "auto"
                                       and 6 * V <= 8192):
        solve = dense_solve
    elif config.solver == "pcg_pallas":
        solve = make_pcg_fused()
    elif config.solver == "pcg":
        from .pcg_pallas import fits_vmem
        if jax.default_backend() not in ("cpu",) and fits_vmem(V, E):
            solve = make_pcg_fused()
        else:
            solve = pcg
    else:
        solve = pcg

    def retract(cur, delta):
        """X_i <- X_i exp(delta_i), masked to valid vertices."""
        step = se3.exp(delta)
        new = cur @ step
        return jnp.where(vmask[:, None, None], new, cur)

    def cost_fn(cur):
        e, _ = edge_residuals(cur)
        c = jnp.einsum("ei,eij,ej->e", e, info, e)
        d = config.robust_delta
        # rho(chi2) consistent with the IRLS weights so LM accept/reject
        # sees the same objective the steps descend.
        if config.robust != "none":
            if config.robust == "huber":
                r = jnp.sqrt(jnp.maximum(c, 1e-30))
                rho = jnp.where(r <= d, c, 2.0 * d * r - d * d)
            elif config.robust == "cauchy":
                rho = d * d * jnp.log1p(c / (d * d))
            elif config.robust == "gm":
                rho = d * d * c / (d * d + c)
            c = rho if robust_emask is None else jnp.where(robust_emask,
                                                           rho, c)
        cost = jnp.sum(jnp.where(emask, c, 0.0))
        rp = se3.log(prior_Tinv @ cur[fixed_id])
        return cost + prior_info * jnp.sum(rp * rp)

    def lm_cond(state):
        _, _, it, done, _ = state
        return jnp.logical_and(it < config.max_iterations, ~done)

    def lm_body(state):
        cur, lam, it, _, cost = state
        blocks, b, D = build_system(cur)
        delta, _ = solve(blocks, D, lam, b)
        delta = jnp.where(vmask[:, None], delta, 0.0)
        candidate = retract(cur, delta)
        new_cost = cost_fn(candidate)
        accept = new_cost < cost
        cur = jnp.where(accept, candidate, cur)
        lam = jnp.where(accept, lam * config.lambda_down,
                        lam * config.lambda_up)
        lam = jnp.clip(lam, 1e-12, 1e10)
        step_norm = jnp.linalg.norm(delta)
        rel_decrease = (cost - new_cost) / jnp.maximum(cost, 1e-30)
        done = jnp.logical_and(
            accept,
            jnp.logical_or(step_norm < config.min_step_norm,
                           rel_decrease < config.min_cost_decrease))
        cost = jnp.where(accept, new_cost, cost)
        return (cur, lam, it + 1, done, cost)

    init_cost = cost_fn(poses)
    final, lam, n_iter, _, final_cost = jax.lax.while_loop(
        lm_cond, lm_body,
        (poses, jnp.asarray(config.lambda_init, dtype), jnp.int32(0),
         jnp.bool_(False), init_cost))
    final = se3.normalize_rotation_fast(final)
    final = jnp.where(vmask[:, None, None], final, poses)
    stats = {"initial_cost": init_cost, "final_cost": final_cost,
             "iterations": n_iter, "lambda": lam}
    return final, stats


@functools.partial(jax.jit, static_argnames=("method",))
def pose_marginals(poses: jax.Array,        # [V, 4, 4] (optimized) values
                   vmask: jax.Array,
                   edge_from: jax.Array,
                   edge_to: jax.Array,
                   edge_T: jax.Array,
                   edge_cov: jax.Array,
                   emask: jax.Array,
                   fixed_id: jax.Array,
                   prior_sigma: float = 1e-6,
                   method: str = "dense") -> jax.Array:
    """Per-vertex 6x6 marginal covariances of the pose graph at ``poses``
    (PM [t; r] twist order) — the GTSAM ``Marginals`` capability, which
    the reference never exposes despite linking it.

    ``method="dense"`` inverts the full damped information matrix and
    extracts the diagonal blocks (exact Gaussian marginals). It
    materializes a [V, V, 6, 6] block tensor plus the dense 6Vx6V
    matrix — 144*V^2 bytes each (~150 MB at V=1024) — so keep V under
    ~1-2k on a small-RAM host. ``method="block_diag"`` inverts only the
    block-diagonal of H — the conditional covariance given all
    neighbors; a cheap optimistic bound useful as a relative confidence
    signal at any scale.
    """
    V = poses.shape[0]
    dtype = poses.dtype
    prior_info = jnp.asarray(1.0 / prior_sigma ** 2, dtype)
    edge_from = jnp.clip(edge_from, 0, V - 1)
    edge_to = jnp.clip(edge_to, 0, V - 1)
    cov_safe = jnp.where(emask[:, None, None], edge_cov,
                         jnp.eye(6, dtype=dtype))
    info = jnp.where(emask[:, None, None], spd_inverse6(cov_safe), 0.0)

    Xf = poses[edge_from]
    Xt = poses[edge_to]
    M = se3.inverse(Xf) @ Xt
    e = se3.log(se3.inverse(edge_T) @ M)
    Jri = _jr_inv(e)
    Jf = -Jri @ se3.adjoint(se3.inverse(M))
    JtT_O = jnp.swapaxes(Jri, -1, -2) @ info
    JfT_O = jnp.swapaxes(Jf, -1, -2) @ info
    H_ff = JfT_O @ Jf
    H_tt = JtT_O @ Jri
    H_ft = JfT_O @ Jri

    D = (jax.ops.segment_sum(H_ff, edge_from, num_segments=V)
         + jax.ops.segment_sum(H_tt, edge_to, num_segments=V))
    D = D.at[fixed_id].add(prior_info * jnp.eye(6, dtype=dtype))
    # Regularize padded / unconstrained vertices so the inverse exists.
    D = jnp.where(vmask[:, None, None], D, jnp.eye(6, dtype=dtype))

    if method == "block_diag":
        out = spd_inverse6(D + 1e-8 * jnp.eye(6, dtype=dtype))
        return jnp.where(vmask[:, None, None], out, 0.0)

    Hb = jnp.zeros((V, V, 6, 6), dtype)
    Hb = Hb.at[edge_from, edge_from].add(H_ff)
    Hb = Hb.at[edge_to, edge_to].add(H_tt)
    Hb = Hb.at[edge_from, edge_to].add(H_ft)
    Hb = Hb.at[edge_to, edge_from].add(jnp.swapaxes(H_ft, -1, -2))
    H = Hb.transpose(0, 2, 1, 3).reshape(6 * V, 6 * V)
    didx = jnp.arange(6 * V)
    prior_rows = (didx // 6) == fixed_id
    H = H.at[didx, didx].add(jnp.where(prior_rows, prior_info, 0.0))
    pad = jnp.repeat(~vmask, 6)
    H = H.at[didx, didx].add(jnp.where(pad, 1.0, 1e-8))
    Sigma = jnp.linalg.inv(H)
    blocks = Sigma.reshape(V, 6, V, 6)[jnp.arange(V), :, jnp.arange(V), :]
    return jnp.where(vmask[:, None, None], blocks, 0.0)

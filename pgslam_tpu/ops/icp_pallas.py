"""The ENTIRE point-to-plane ICP registration as ONE Pallas TPU kernel.

Motivation (chip-measured, v5e): the jitted XLA registration loop is a
single dispatch, but inside it every iteration runs ~40 small batched
fusions (matcher epilogue aside, the minimizer/outlier/SE(3) ops are all
tiny) — at B=128 the batched register spends ~50 of 68 ms/batch outside
the matcher matmul. This kernel holds one registration's full state in
VMEM and runs match -> weigh -> minimize -> check to convergence,
including the coarse-to-fine stage and the final overlap/residual/
covariance introspection. The batch axis is the Pallas grid.

Key design points:

* **The whole match score rides the MXU.** The reference operands carry
  baked-in ``2r`` rows plus 3-term-split ``-|r|^2`` rows paired with a
  constant-one query row, so ``score = 2 p'.r - |r|^2`` needs NO
  elementwise epilogue; per tile the VPU does one max-reduce and one
  compare. (The query operand is the transformed reading, rebuilt each
  iteration — see ``match`` for why query-side rounding is the right
  side.)
* **No gathers.** The matched reference point+normal are accumulated
  during the tile fold as ``values16 @ multi_hot(score == max)`` MXU
  products — the running best match carries its payload with it, and a
  ones row in ``values16`` counts score ties so they average instead of
  needing an argmax index.
* **Exact trimmed-distance threshold by multi-probe bracket shrink** on
  the squared distances (Mosaic has no sort): vectorized masked-count
  probe rounds converge to the same keep-set as the XLA sort-based
  quantile.
* **Moment assembly rides the MXU too**: every per-iteration weighted
  moment (the 28 point-to-plane normal-equation entries, the Umeyama
  means/cross-covariance) is an entry of one small weighted Gram matrix
  ``(w M) @ M^T`` computed by a single [8, NQ] x [NQ, 8] contraction
  (``gram8``) instead of dozens of full-row VPU reductions.
* The 6x6 normal-equation solve, SE(3) exp, and covariance run on
  scalars via the row-math helpers shared with the LM kernel
  (``ops/rowmath.py``).

Scope: point-to-plane (linearized 6x6 solve) and point-to-point
(weighted Kabsch/Umeyama via a Newton polar iteration — Mosaic has no
SVD), exact-NN matching (k=1), TrimmedDist / MaxDist outlier chains,
iteration + smoothed-differential checkers, optional coarse-to-fine.
Anderson acceleration is intentionally absent
(measured neutral at these working sets). Everything else falls back to
:func:`pgslam_tpu.ops.icp.icp_core`, whose semantics this kernel mirrors
(equivalence-tested in ``tests/test_icp_fused.py``).

Reference role: the full ``ICPSequence::operator()`` iterate loop
(``Localizer.hpp:126``; pipeline pinned at SURVEY.md §2b N3-N8).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import se3
from ..cloud import Cloud
from .rowmath import _det3, _inv3, _mat4_mul, _polar3, _schur_inv6, \
    _se3_exp, _se3_inv, _se3_log
from .icp import ICPConfig, ICPResult
from . import outlier as O

_DEFAULT = jax.lax.Precision.DEFAULT
# Valid-score floor for the `hit` test. Invalid reference points carry a
# baked-in -|r|^2 sentinel of -3e38 in the score operand, so their MXU
# scores land near -3e38 — strictly below this floor — while any valid
# score (~ -1e9..1e9 even at km coordinates) is strictly above it.
NEG_BIG = -1.0e38
INVALID_RSQ = 3.0e38  # |r|^2 sentinel for masked reference points
MIN_SUPPORT = 6.0     # minimizer degenerate guard (ops/minimizer.py)


def fused_eligible(cfg: ICPConfig) -> bool:
    """Whether this config's semantics are covered by the fused kernel."""
    return (cfg.error in ("point_to_plane", "point_to_point")
            and cfg.matcher in ("pallas", "brute")
            and cfg.knn == 1
            # Anderson acceleration runs in-kernel for windows up to 4
            # (the (m-1)x(m-1) AA system solves in closed form).
            and (not cfg.anderson_m or cfg.anderson_m <= 4)
            and all(isinstance(f, (O.TrimmedDist, O.MaxDist))
                    for f in cfg.outlier))


def _bf16_trunc(x):
    """The bf16-representable truncation of f32 ``x``, computed by
    mantissa bit-masking. NEVER use ``x.astype(bf16).astype(f32)`` for
    hi/lo splitting in XLA code on this platform: the terminal forces
    ``--xla_allow_excess_precision=true``, under which XLA folds the
    downcast/upcast pair to the identity and the residual term
    ``x - f32(bf16(x))`` constant-folds to ZERO (chip-verified — it
    silently degraded every matched payload to bf16)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    return jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32)


def _split_hi_lo(x):
    hi = _bf16_trunc(x)
    lo = _bf16_trunc(x - hi)
    # exact casts: both values lie on the bf16 grid already
    return hi.astype(jnp.bfloat16), lo.astype(jnp.bfloat16)


def _split3(x):
    """Three-term bf16 decomposition (~2^-22 relative). The matched-value
    payload feeds near-zero residuals at convergence, where a two-term
    split leaves ~1e-4 coordinate noise that visibly perturbs the
    overlap/residual statistics."""
    hi = _bf16_trunc(x)
    r1 = x - hi
    mid = _bf16_trunc(r1)
    lo = (r1 - mid).astype(jnp.bfloat16)
    return hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16), lo


def _bisect_kth(d2_row, valid_row, k_keep, rounds: int = 10,
                probes: int = 8):
    """Smallest threshold t with count(valid & d2 <= t) >= k_keep.
    Equivalent keep-set to the sort-based kth-smallest threshold.

    Multi-probe bracket shrink rather than scalar bisection: each round
    tests ``probes`` equally-spaced thresholds of the current bracket in
    ONE ``[probes, NQ]`` vectorized compare+count (a full-sublane VPU
    tile), then keeps the sub-bracket containing the k-th value. The
    bracket shrinks ``probes``-fold per round. The serial 48-halving
    bisection this replaces was ~20% of the whole fused-ICP kernel: 48
    sequential rounds of 1/8-sublane-utilization ``[1, NQ]`` ops (chip
    A/B in ``scripts/probe_bisect.py``: 45.2 -> 34.5 ms/batch at B=128
    going 48 serial halvings -> 6 multi-probe rounds).

    ``rounds=10`` (8^10 ≈ 2^30 relative) rather than the break-even 6:
    the bracket starts at max(valid d2) + 1, and with far-but-valid
    matches before MaxDist weighting that start can be ~1e2-1e4 m^2
    while the converged inlier band sits at ~1e-6-1e-4 m^2 — at 8^6 the
    ABSOLUTE threshold slop ((max+1)/8^rounds) could exceed the kth
    distance itself and keep extra outliers on the fused path only. At
    2^30 the slop is <=1e-5 m^2 even from a 1e4 m^2 bracket, below the
    convergence band; the 4 extra rounds cost ~2% of the kernel (the
    same resolution serially would cost 30 rounds)."""
    finite = jnp.where(valid_row, d2_row, 0.0)
    hi0 = jnp.max(finite) + 1.0
    lo0 = jnp.zeros_like(hi0)
    vmaskf = valid_row.astype(jnp.float32)                    # [1, NQ]
    # int32 iota then cast: Mosaic's tpu.iota rejects float results.
    frac = (jax.lax.broadcasted_iota(jnp.int32, (probes, 1), 0)
            .astype(jnp.float32) + 1.0) * (1.0 / probes)      # (0, 1]

    def body(_, c):
        lo, hi = c
        t = lo + frac * (hi - lo)      # [P, 1] ascending; t[-1] == hi
        cnt = jnp.sum(jnp.where(d2_row <= t, vmaskf, 0.0), axis=1,
                      keepdims=True)                          # [P, 1]
        ok = cnt >= k_keep
        # count is monotone in t, and ok[-1] holds by the invariant
        # count(d2 <= hi) >= k: the new bracket is (largest failing t,
        # smallest passing t].
        hi_n = jnp.min(jnp.where(ok, t, hi))
        lo_n = jnp.max(jnp.where(ok, lo, t))
        return (lo_n, hi_n)

    _, hi = jax.lax.fori_loop(0, rounds, body, (lo0, hi0))
    return hi


def _icp_kernel(T0_ref, rdT_ref, rdm_ref, rdcT_ref, rdcm_ref, refT_ref,
                ref32_ref, vals16_ref, T_out_ref,
                stats_ref, dbg_ref=None, *, cfg: ICPConfig, tile_r: int,
                n_coarse_iters: int):
    f32 = jnp.float32
    NR = refT_ref.shape[2]
    n_tiles = NR // tile_r
    L = max(1, cfg.smooth_length)

    T0 = tuple(T0_ref[0, 0, i] for i in range(16))

    def match(rdT, rdm, T):
        """Exact 1-NN of the T-transformed reading against the reference.
        Returns (matched [8, NQ] rows = [qpt(3), qnrm(3), 0, 0],
                 d2 [1, NQ], hit [1, NQ] bool, p' rows [3][1, NQ]).

        The query operand is the TRANSFORMED reading, rebuilt each
        iteration (one f32 transpose). Rounding on the query side is
        common-mode per reading point and cancels in the argmax; putting
        it on the reference side instead (the r' = R^T r trick) leaves a
        fixed per-reference score bias (~1e-3 m^2 at 100 m coordinates)
        that systematically skews the match field and stalls convergence
        ~2e-3 short — chip-measured.

        The whole argmax-safe score ``2 p'.r - |r|^2`` comes straight off
        the MXU: the reference operands carry baked-in ``2r`` rows plus
        split ``-|r|^2`` rows paired with a constant-one query row (the
        row padding was free), so the epilogue per tile is ONE lane
        max-reduce plus ONE compare. The previous epilogue (elementwise
        score assembly, iota, masked-min argmax, one-hot rebuild — ~5
        extra full [NQ, tile_r] VPU passes) was the matcher ceiling once
        the packed matmul got cheap. Ties (equal f32 scores, e.g. exact
        duplicate reference points) WITHIN one reference tile are
        resolved by AVERAGING the tied payloads via a multi-hot matmul
        and a ones-row tie count; ties that span tile boundaries keep
        the earliest tile's payload (the cross-tile fold is a strict
        `gap > 0`), i.e. lowest-index behavior like icp_core. For
        duplicates the two conventions agree exactly; for distinct
        equidistant points the averaged payload is an equally valid NN
        target (equivalence-tested).
        """
        NQ = rdT.shape[2]
        # p' = R p + t in rows layout
        Rm = [[T[4 * i + j] for j in range(3)] for i in range(3)]
        rd = [rdT[0, i][None, :] for i in range(3)]
        pp = [Rm[i][0] * rd[0] + Rm[i][1] * rd[1] + Rm[i][2] * rd[2]
              + T[4 * i + 3] for i in range(3)]
        one = jnp.ones((1, NQ), f32)   # pairs the baked -|r|^2 rows
        z4 = jnp.zeros((4, NQ), f32)
        if cfg.pallas_precision == "highest":
            q = jnp.concatenate(pp + [one, z4], axis=0).T   # [NQ, 8] f32
        else:
            # hi/lo parts as exactly-representable f32 rows (bit-masked —
            # see _bf16_trunc); transpose in f32 (bf16 transpose does not
            # lower), cast after — exact.
            ph = [_bf16_trunc(r) for r in pp]
            plo = [pp[i] - ph[i] for i in range(3)]
            blk_h = jnp.concatenate(ph + [one, z4], axis=0)     # [8, NQ]
            blk_l = jnp.concatenate(plo + [one, z4], axis=0)
            q = jnp.concatenate([blk_h, blk_l, blk_h, blk_l],
                                axis=0).T.astype(jnp.bfloat16)  # [NQ, 32]
        best = jnp.full((NQ, 1), NEG_BIG, f32)
        matched = jnp.zeros((8, NQ), f32)
        for j in range(n_tiles):
            sl = slice(j * tile_r, (j + 1) * tile_r)
            if cfg.pallas_precision == "highest":
                score = jax.lax.dot_general(
                    q, refT_ref[0, :, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                score = jax.lax.dot_general(
                    q, ref32_ref[0, :, sl], (((1,), (0,)), ((), ())),
                    preferred_element_type=f32, precision=_DEFAULT)
            # Clamp only the [NQ, 1] reduction, not the full score tile:
            # all-invalid tiles reduce to ~-3e38 and must fold as
            # NEG_BIG so cross-tile gaps stay finite (no inf - inf).
            tile_best = jnp.maximum(
                jnp.max(score, axis=1, keepdims=True), NEG_BIG)  # [NQ, 1]
            # Multi-hot over ties; all-invalid queries match nothing
            # (every score < NEG_BIG) and the cnt guard below keeps the
            # division finite — `hit` masks the garbage payload anyway.
            mhot = (score >= tile_best).astype(jnp.bfloat16)
            tv = jax.lax.dot_general(
                vals16_ref[0, :, sl], mhot, (((1,), (1,)), ((), ())),
                preferred_element_type=f32, precision=_DEFAULT)  # [32, NQ]
            cnt = jnp.maximum(tv[24:25], 1.0)   # ones-row tie count
            tile_matched = (tv[:8] + tv[8:16] + tv[16:24]) / cnt
            if j == 0:
                best, matched = tile_best, tile_matched
            else:
                # transpose floats, not bools (no i1 transpose in Mosaic)
                gap = (tile_best - best)
                best = jnp.where(gap > 0, tile_best, best)
                matched = jnp.where(gap.T > 0, tile_matched, matched)
        d2 = ((pp[0] - matched[0:1]) ** 2 + (pp[1] - matched[1:2]) ** 2
              + (pp[2] - matched[2:3]) ** 2)
        hit = (best.T > NEG_BIG) & (rdm[0, 0:1, :] > 0.5)
        d2 = jnp.where(hit, d2, jnp.inf)
        return matched, d2, hit, pp

    def weights_of(d2, hit):
        w = hit.astype(f32)
        n_valid = jnp.sum(w)
        for f in cfg.outlier:
            if isinstance(f, O.TrimmedDist):
                k_keep = jnp.ceil(f.ratio * n_valid)
                thresh = _bisect_kth(d2, hit, k_keep)
                w = w * jnp.where(d2 <= thresh, 1.0, 0.0)
            elif isinstance(f, O.MaxDist):
                w = w * jnp.where(d2 <= f.max_dist * f.max_dist, 1.0, 0.0)
        return w

    def gram8(rows, w):
        """All pairwise weighted moments of up to 8 rows in ONE MXU
        contraction: returns ``g`` with ``g(i, j) = sum_k w_k
        rows[i]_k rows[j]_k``.

        Replaces the per-iteration pile of separate ``jnp.sum`` VPU
        reductions over [1, NQ] (28 for the point-to-plane normal
        equations alone) with a single [8, NQ] x [NQ, 8] f32 matmul;
        the 8x8 output makes the HIGHEST-precision 6-pass cost
        negligible. Scalars are read back lazily with iota-selected
        masked sums over one vreg (Mosaic has no scalar loads from
        vector tiles). Rows must be garbage-finite where w == 0: the
        weight zeroes the lhs operand, exactly like the summed form.
        """
        pad = [jnp.zeros_like(rows[0])] * (8 - len(rows))
        M = jnp.concatenate(list(rows) + pad, axis=0)       # [8, NQ]
        G = jax.lax.dot_general(
            M * w, M.T, (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.HIGHEST)            # [8, 8]
        lane8 = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)

        def g(i, j):
            return jnp.sum(jnp.where(lane8 == j, G[i:i + 1], 0.0))

        return g

    def p2plane_system(matched, pp, w):
        """A = sum w J J^T, b = -sum w r J, ssr; J = [n; p' x n].

        All 29 moments (21 unique A entries, 6 of b, ssr, wsum — the
        ones row rides the otherwise-padded 8th slot) are entries of
        the weighted Gram matrix of [J0..J5, r, 1] — one MXU
        contraction via :func:`gram8`.
        """
        n = [matched[3 + i:4 + i, :] for i in range(3)]
        q = [matched[i:i + 1, :] for i in range(3)]
        r = (n[0] * (pp[0] - q[0]) + n[1] * (pp[1] - q[1])
             + n[2] * (pp[2] - q[2]))
        J = n + [pp[1] * n[2] - pp[2] * n[1],
                 pp[2] * n[0] - pp[0] * n[2],
                 pp[0] * n[1] - pp[1] * n[0]]
        g = gram8(J + [r, jnp.ones_like(r)], w)
        A = [[g(i, j) if j >= i else None
              for j in range(6)] for i in range(6)]
        for i in range(6):
            for j in range(i):
                A[i][j] = A[j][i]
        b = [-g(i, 6) for i in range(6)]
        ssr = g(6, 6)
        return A, b, ssr, g(7, 7)

    def p2p_delta(matched, pp, w):
        """Weighted Kabsch/Umeyama via the 3x3 polar factor of the
        cross-covariance (Newton iteration on scalars — no SVD in
        Mosaic). Degenerate support or a reflection-sign cross-
        covariance (det <= 0, which sane ICP matches never produce)
        falls back to the identity step, like the XLA degenerate
        guard."""
        # Two Gram contractions instead of 16 [1, NQ] reductions: means
        # first, then the cross-covariance of the CENTERED rows —
        # centering before the product keeps the current cancellation-
        # free numerics at large coordinates (raw-moment centering
        # would subtract O(|p|^2 wsum) quantities).
        q = [matched[i:i + 1, :] for i in range(3)]
        one = jnp.ones_like(pp[0])
        g1 = gram8(pp + q + [one], w)
        wsum_raw = g1(6, 6)
        wsum = jnp.maximum(wsum_raw, 1e-12)
        mup = [g1(i, 6) / wsum for i in range(3)]
        muq = [g1(3 + i, 6) / wsum for i in range(3)]
        g2 = gram8([pp[i] - mup[i] for i in range(3)]
                   + [q[i] - muq[i] for i in range(3)], w)
        G = [[g2(3 + i, j) for j in range(3)] for i in range(3)]
        R = _polar3(G)
        ok = jnp.logical_and(wsum_raw >= MIN_SUPPORT,
                             _det3(G) > 1e-12)
        R = [[jnp.where(ok, R[i][j], 1.0 if i == j else 0.0)
              for j in range(3)] for i in range(3)]
        t = [jnp.where(ok, muq[i] - (R[i][0] * mup[0] + R[i][1] * mup[1]
                                     + R[i][2] * mup[2]), 0.0)
             for i in range(3)]
        delta = [0.0] * 16
        for i in range(3):
            for j in range(3):
                delta[4 * i + j] = R[i][j]
            delta[4 * i + 3] = t[i]
        delta[15] = 1.0
        return delta

    def step(T, rdT, rdm):
        matched, d2, hit, pp = match(rdT, rdm, T)
        w = weights_of(d2, hit)
        if cfg.error == "point_to_plane":
            A, b, _, wsum = p2plane_system(matched, pp, w)
            A = [[A[i][j] + (1e-6 if i == j else 0.0) for j in range(6)]
                 for i in range(6)]
            Ainv = _schur_inv6(A)
            x = [sum(Ainv[i][j] * b[j] for j in range(6))
                 for i in range(6)]
            # degenerate guard: identity step when support is too small
            ok = wsum >= MIN_SUPPORT
            x = [jnp.where(ok, xi, 0.0) for xi in x]
            delta = _se3_exp(x)
            dr = jnp.sqrt(x[3] ** 2 + x[4] ** 2 + x[5] ** 2)
        else:
            delta = p2p_delta(matched, pp, w)
            xlog = _se3_log(list(delta))
            dr = jnp.sqrt(xlog[3] ** 2 + xlog[4] ** 2 + xlog[5] ** 2)
        T_new = tuple(_mat4_mul(list(delta), list(T)))
        dt = jnp.sqrt(delta[3] ** 2 + delta[7] ** 2 + delta[11] ** 2)
        return T_new, dt, dr

    def run_stage(T, rdT, rdm, max_it):
        big = tuple(jnp.float32(jnp.inf) for _ in range(L))

        def cond(c):
            _, it, conv, _, _ = c
            return jnp.logical_and(it < max_it, ~conv)

        def body(c):
            T, it, _, dts, drs = c
            T, dt, dr = step(T, rdT, rdm)
            dts = (dt,) + dts[:-1]
            drs = (dr,) + drs[:-1]
            conv = jnp.logical_and(sum(dts) / L < cfg.trans_eps,
                                   sum(drs) / L < cfg.rot_eps)
            return (T, it + 1, conv, dts, drs)

        return jax.lax.while_loop(
            cond, body, (T, jnp.int32(0), jnp.bool_(False), big, big))

    def solve_small(A, rhs, n):
        """Closed-form solve of the (n <= 3) regularized AA system."""
        if n == 1:
            return [rhs[0] / A[0][0]]
        if n == 2:
            rdet = 1.0 / (A[0][0] * A[1][1] - A[0][1] * A[1][0])
            return [(A[1][1] * rhs[0] - A[0][1] * rhs[1]) * rdet,
                    (A[0][0] * rhs[1] - A[1][0] * rhs[0]) * rdet]
        Ai = _inv3(A)
        return [sum(Ai[i][j] * rhs[j] for j in range(3)) for i in range(3)]

    def run_stage_aa(T, rdT, rdm, max_it):
        """Anderson-accelerated stage (cfg.anderson_m in 2..4): type-II
        AA on the window of se3-log twists relative to the stage entry,
        mirroring ops/icp.py ``body_aa`` exactly (same history roll,
        regularization, runaway safeguard, and window warmup) on the
        kernel's scalar row-math. The small (m-1)x(m-1) system solves in
        closed form."""
        m = cfg.anderson_m
        T0s = list(T)
        Tinv0 = _se3_inv(T0s)
        big = tuple(jnp.float32(jnp.inf) for _ in range(L))
        zeros_hist = tuple(jnp.float32(0.0) for _ in range(m * 6))

        def cond(c):
            return jnp.logical_and(c[1] < max_it, ~c[2])

        def body(c):
            T, it, _, dts, drs, X, GX = c
            T_plain, _, _ = step(T, rdT, rdm)
            x_k = _se3_log(_mat4_mul(list(T), Tinv0))
            g_k = _se3_log(_mat4_mul(list(T_plain), Tinv0))
            X = tuple(x_k) + X[:-6]
            GX = tuple(g_k) + GX[:-6]
            Fr = [[GX[i * 6 + d] - X[i * 6 + d] for d in range(6)]
                  for i in range(m)]
            dF = [[Fr[0][d] - Fr[i][d] for d in range(6)]
                  for i in range(1, m)]
            dG = [[GX[d] - GX[i * 6 + d] for d in range(6)]
                  for i in range(1, m)]
            n = m - 1
            A = [[sum(dF[i][d] * dF[j][d] for d in range(6))
                  + (1e-10 if i == j else 0.0) for j in range(n)]
                 for i in range(n)]
            rhs = [sum(dF[i][d] * Fr[0][d] for d in range(6))
                   for i in range(n)]
            gamma = solve_small(A, rhs, n)
            x_acc = [g_k[d] - sum(gamma[i] * dG[i][d] for i in range(n))
                     for d in range(6)]
            plain_sz = jnp.sqrt(sum((g_k[d] - x_k[d]) ** 2
                                    for d in range(6)))
            acc_sz = jnp.sqrt(sum((x_acc[d] - g_k[d]) ** 2
                                  for d in range(6)))
            ok = jnp.logical_and(acc_sz <= 2.0 * plain_sz + 1e-9,
                                 it + 1 >= m)
            x_next = [jnp.where(ok, x_acc[d], g_k[d]) for d in range(6)]
            T_new = tuple(_mat4_mul(_se3_exp(x_next), T0s))
            dTm = _mat4_mul(list(T_new), _se3_inv(list(T)))
            dt = jnp.sqrt(dTm[3] ** 2 + dTm[7] ** 2 + dTm[11] ** 2)
            dlog = _se3_log(dTm)
            dr = jnp.sqrt(dlog[3] ** 2 + dlog[4] ** 2 + dlog[5] ** 2)
            dts = (dt,) + dts[:-1]
            drs = (dr,) + drs[:-1]
            conv = jnp.logical_and(sum(dts) / L < cfg.trans_eps,
                                   sum(drs) / L < cfg.rot_eps)
            return (T_new, it + 1, conv, dts, drs, X, GX)

        out = jax.lax.while_loop(
            cond, body, (T, jnp.int32(0), jnp.bool_(False), big, big,
                         zeros_hist, zeros_hist))
        return out[:5]

    stage = (run_stage_aa if (cfg.anderson_m and cfg.anderson_m > 1)
             else run_stage)
    T = T0
    if n_coarse_iters > 0:
        T, _, _, _, _ = stage(T, rdcT_ref, rdcm_ref, n_coarse_iters)
    T, iters, conv, _, _ = stage(T, rdT_ref, rdm_ref,
                                 cfg.max_iterations)

    # Final introspection at the solution (mirrors icp_core's last pass).
    matched, d2, hit, pp = match(rdT_ref, rdm_ref, T)
    w = weights_of(d2, hit)
    n_valid_reading = jnp.sum(rdm_ref[0, 0:1, :])
    if cfg.error == "point_to_plane":
        A, _, ssr, wsum = p2plane_system(matched, pp, w)
        dof = jnp.maximum(wsum - 6.0, 1.0)
    else:
        # A = sum w J^T J with J_i = [I3, -hat(p_i)]; residual 3-dim.
        # One Gram contraction: residual rows give ssr (small-magnitude,
        # no cancellation), pp rows the first/second raw moments.
        q = [matched[i:i + 1, :] for i in range(3)]
        d = [pp[i] - q[i] for i in range(3)]
        gI = gram8(d + pp + [jnp.ones_like(d[0])], w)
        ssr = gI(0, 0) + gI(1, 1) + gI(2, 2)
        wsum = gI(6, 6)
        Sp = [gI(3 + i, 6) for i in range(3)]
        Spp = [[gI(3 + i, 3 + j) for j in range(3)]
               for i in range(3)]
        tr_pp = Spp[0][0] + Spp[1][1] + Spp[2][2]
        hatS = [[0.0, -Sp[2], Sp[1]],
                [Sp[2], 0.0, -Sp[0]],
                [-Sp[1], Sp[0], 0.0]]
        A = [[0.0] * 6 for _ in range(6)]
        for i in range(3):
            A[i][i] = wsum
            for j in range(3):
                A[i][3 + j] = -hatS[i][j]
                A[3 + i][j] = -hatS[j][i]
                A[3 + i][3 + j] = (tr_pp if i == j else 0.0) - Spp[i][j]
        dof = jnp.maximum(3.0 * wsum - 6.0, 1.0)
    overlap = wsum / jnp.maximum(n_valid_reading, 1.0)
    sigma2 = ssr / dof
    Areg = [[A[i][j] + (1e-9 if i == j else 0.0) for j in range(6)]
            for i in range(6)]
    Ainv = _schur_inv6(Areg)

    # Mosaic cannot store scalars to VMEM; build the output rows as full
    # vectors with lane-iota selects (read back as [:, 0, :k] outside).
    lanes = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def scatter_lanes(values):
        out = jnp.zeros((8, 128), f32)
        for i, v in enumerate(values):
            out = out + jnp.where(lanes == i, v, 0.0)
        return out

    T_out_ref[0] = scatter_lanes(T)
    if dbg_ref is not None:
        dbg_ref[0] = jnp.concatenate(
            [matched, d2, w] + pp
            + [jnp.zeros((3, d2.shape[1]), f32)], axis=0)   # [16, NQ]
    stats_vals = [iters.astype(f32), conv.astype(f32), overlap, ssr]
    for i in range(6):
        for j in range(6):
            stats_vals.append(sigma2 * Ainv[i][j]
                              + (1e-12 if i == j else 0.0))
    # Diagnostic lanes 40..52: gradient b, the would-be next step, and
    # the weight sum at the solution (chip-vs-XLA numerics comparison).
    _, b_fin, _, _ = p2plane_system(matched, pp, w)
    Areg2 = [[A[i][j] + (1e-6 if i == j else 0.0) for j in range(6)]
             for i in range(6)]
    Ainv2 = _schur_inv6(Areg2)
    x_fin = [sum(Ainv2[i][j] * b_fin[j] for j in range(6))
             for i in range(6)]
    stats_vals += b_fin + x_fin + [wsum]
    stats_ref[0] = scatter_lanes(stats_vals)


def _rows_T(x, rows):
    """[B, N, C] -> [B, rows, N] padded rows-layout."""
    xt = jnp.swapaxes(x, 1, 2)
    return jnp.pad(xt, ((0, 0), (0, rows - xt.shape[1]), (0, 0)))


class FusedRef(NamedTuple):
    """Precomputed reference operands for the fused ICP kernel.

    Building these (hi/lo splits, transposes to rows layout, sentinel
    bake-in — three [B, 32, NR]-scale operands) is the expensive
    reference-side work of :func:`fused_icp_register`. References are
    persistent across registrations in every production path
    (``ICPSequence::setMap`` semantics, `PoseGraphSlam.h:33-35` roles),
    so callers with a long-lived map should build a ``FusedRef`` ONCE
    via :func:`prepare_fused_reference` and register against it with
    :func:`fused_icp_register_prepped` — otherwise the operand build is
    retraced into every call's graph and re-executed per batch.
    """
    refT: jax.Array     # [B, 8, NR] f32: rows 0-2 = 2r, row 3 = -|r|^2
    ref32: jax.Array    # [B, 32, NR] bf16 packed hi/lo score operand
    vals16: jax.Array   # [B, 32, NR] bf16 payload splits + ones row


@functools.partial(jax.jit, static_argnames=("tile_r",))
def prepare_fused_reference(reference: Cloud,
                            tile_r: int = 1024) -> FusedRef:
    """One-time build of the fused kernel's reference operands (pads NR
    to a ``tile_r`` multiple; masked/padded points carry the INVALID_RSQ
    score sentinel)."""
    B, NR = reference.points.shape[:2]
    if NR % tile_r:
        pad = (-NR) % tile_r
        reference = Cloud(
            points=jnp.pad(reference.points, ((0, 0), (0, pad), (0, 0))),
            mask=jnp.pad(reference.mask, ((0, 0), (0, pad))),
            descriptors={k: jnp.pad(v, ((0, 0), (0, pad), (0, 0)))
                         for k, v in reference.descriptors.items()})
        NR += pad

    rpts = reference.points.astype(jnp.float32)
    rnrm = reference.descriptors.get("normals")
    rnrm = (jnp.zeros_like(rpts) if rnrm is None
            else rnrm.astype(jnp.float32))
    payload = jnp.concatenate(
        [rpts, rnrm, jnp.zeros((B, NR, 2), jnp.float32)], axis=-1)
    ph, pm, plo = _split3(payload)
    # Rows 0-23: the 3-term payload splits. Row 24: ONES — contracted
    # against the multi-hot match mask it yields the tie count the
    # kernel divides by. Rows 25-31: padding (bf16 sublane quantum is
    # 16: 24-row bf16 blocks load corrupted tails on chip).
    vals16 = jnp.concatenate(
        [jnp.swapaxes(ph, 1, 2), jnp.swapaxes(pm, 1, 2),
         jnp.swapaxes(plo, 1, 2),
         jnp.ones((B, 1, NR), jnp.bfloat16),
         jnp.zeros((B, 7, NR), jnp.bfloat16)], axis=1)           # [B,32,NR]

    # The argmax-safe score 2 p'.r - |r|^2 comes entirely off the MXU:
    # both reference operands carry 2r rows and NEGATED |r|^2 rows that
    # pair with a constant-one query row. Masked reference points get
    # the INVALID_RSQ sentinel (finite — an inf would turn the hi/lo
    # split into NaNs that poison the max-reduce), putting their scores
    # ~-3e38, below every valid score AND below the NEG_BIG hit floor.
    rsq = jnp.sum(rpts * rpts, axis=-1)
    nrsq = -jnp.where(reference.mask, rsq, INVALID_RSQ)[..., None]
    refT = _rows_T(jnp.concatenate([2.0 * rpts, nrsq], axis=-1), 8)

    # Packed bf16 operand: row blocks pairing the in-kernel query
    # [ph+1, pl+1, ph+1, pl+1] so all four hi/lo cross products and the
    # 3-term -|r|^2 split are accumulated in one f32-accumulate matmul.
    r2h, r2l = _split_hi_lo(2.0 * rpts)
    nrh, nrm, nrl = _split3(nrsq)
    zr1 = jnp.zeros_like(nrh)
    blk = lambda r, s: jnp.pad(
        jnp.swapaxes(jnp.concatenate([r, s], axis=-1), 1, 2),
        ((0, 0), (0, 4), (0, 0)))
    ref32 = jnp.concatenate(
        [blk(r2h, nrh), blk(r2h, nrm), blk(r2l, nrl), blk(r2l, zr1)],
        axis=1)                                                  # [B,32,NR]
    return FusedRef(refT=refT, ref32=ref32, vals16=vals16)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile_r", "debug_stats"))
def fused_icp_register(reading: Cloud, reference: Cloud, T_init: jax.Array,
                       cfg: ICPConfig, tile_r: int = 1024,
                       debug_stats: bool = False) -> ICPResult:
    """Batched fused registration. ``reading``/``reference`` are stacked
    clouds ([B, N, 3] + [B, N] masks, reference with ``normals``);
    ``T_init`` is [B, 4, 4]. Returns a batched :class:`ICPResult`.

    Builds the reference operands inline on every call — correct for
    one-shot use, wasteful for a persistent map; see :class:`FusedRef`.
    """
    fref = prepare_fused_reference(reference, tile_r)
    return fused_icp_register_prepped(reading, fref, T_init, cfg,
                                      tile_r, debug_stats)


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tile_r", "debug_stats"))
def fused_icp_register_prepped(reading: Cloud, fref: FusedRef,
                               T_init: jax.Array, cfg: ICPConfig,
                               tile_r: int = 1024,
                               debug_stats: bool = False) -> ICPResult:
    """Batched fused registration against precomputed reference
    operands (:func:`prepare_fused_reference`)."""
    B, NQ = reading.points.shape[:2]
    refT, ref32, vals16 = fref
    NR = refT.shape[2]

    rd = reading.points.astype(jnp.float32)
    rdT = _rows_T(rd, 8)
    rdm = reading.mask.astype(jnp.float32)[:, None, :]

    n_coarse = cfg.coarse_iterations if (cfg.coarse_div
                                         and cfg.coarse_div > 1) else 0
    if n_coarse:
        rdc = rd[:, ::cfg.coarse_div]
        mc = reading.mask[:, ::cfg.coarse_div]
    else:  # placeholder blocks (never read)
        rdc = rd[:, :8]
        mc = reading.mask[:, :8]
    rdcT = _rows_T(rdc, 8)
    rdcm = mc.astype(jnp.float32)[:, None, :]

    # Scalar I/O rides in VMEM [B, 8, 128] row blocks: Mosaic requires
    # grid blocks with (8, 128)-divisible trailing dims (SMEM included).
    T0 = jnp.zeros((B, 8, 128), jnp.float32).at[:, 0, :16].set(
        T_init.reshape(B, 16).astype(jnp.float32))

    kern = functools.partial(_icp_kernel, cfg=cfg, tile_r=tile_r,
                             n_coarse_iters=n_coarse)
    vspec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda b: (b,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=[
            vspec((8, 128)),
            vspec(rdT.shape[1:]), vspec(rdm.shape[1:]),
            vspec(rdcT.shape[1:]), vspec(rdcm.shape[1:]),
            vspec(refT.shape[1:]), vspec(ref32.shape[1:]),
            vspec(vals16.shape[1:]),
        ],
        out_specs=[vspec((8, 128)), vspec((8, 128))]
        + ([vspec((16, NQ))] if debug_stats else []),
        out_shape=[jax.ShapeDtypeStruct((B, 8, 128), jnp.float32),
                   jax.ShapeDtypeStruct((B, 8, 128), jnp.float32)]
        + ([jax.ShapeDtypeStruct((B, 16, NQ), jnp.float32)]
           if debug_stats else []),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() == "cpu",
    )(T0, rdT, rdm, rdcT, rdcm, refT, ref32, vals16)
    T_out, stats = outs[0], outs[1]
    dbg = outs[2] if debug_stats else None

    T = T_out[:, 0, :16].reshape(B, 4, 4)
    stats = stats[:, 0, :]
    iters = stats[:, 0].astype(jnp.int32)
    converged = stats[:, 1] > 0.5
    overlap = stats[:, 2]
    residual = stats[:, 3]
    cov = stats[:, 4:40].reshape(B, 6, 6)

    # Bound checker + NaN guard (mirrors icp_core's epilogue).
    T_start = T_init.astype(jnp.float32)
    diverged = jnp.zeros((B,), bool)
    dT = T @ se3.inverse(T_start)
    if cfg.max_correction_trans > 0:
        diverged |= se3.translation_norm(dT) > cfg.max_correction_trans
    if cfg.max_correction_rot > 0:
        diverged |= se3.rotation_angle(dT) > cfg.max_correction_rot
    diverged |= ~jnp.all(jnp.isfinite(T), axis=(1, 2))
    T = jnp.where(diverged[:, None, None], T_start, T)
    converged = converged & ~diverged
    max_iter_reached = (iters >= cfg.max_iterations) & ~converged
    result = ICPResult(T=T, iterations=iters, converged=converged,
                        max_iter_reached=max_iter_reached, overlap=overlap,
                        residual=residual, cov=cov, diverged=diverged)
    if debug_stats:  # lanes 40..52: b, would-be next step, wsum
        return result, stats, dbg
    return result

"""Fused Pallas TPU kernel: the ENTIRE block-Jacobi PCG solve of one LM
step in a single kernel launch.

Why: the XLA matrix-free PCG (``pgo.py``) is correct but launch-bound on
TPU — each CG iteration lowers to ~15 small fusions, and at 1k poses a
4-LM x 30-CG optimize spends ~20 ms in per-op overhead while the MXU/VPU
are >99% idle. This kernel holds the whole Krylov state in VMEM and runs
the complete CG loop in-kernel, so an optimize dispatches ONE launch per
LM iteration for the linear solve.

Data movement design (no gathers on TPU — they serialize):

* the edge<->vertex maps are ONE-HOT incidence matrices stacked as
  ``S [2E, V]`` in bf16 (one-hot is exact in bf16; rows 0..E-1 = edge
  source, E..2E-1 = edge target). Gather = ``x @ S^T``, scatter-add =
  ``y @ S`` — two MXU matmuls per CG iteration.
* f32 accuracy through bf16 matmuls via hi/lo splitting: operands are
  split ``x = hi + lo`` (bf16 each) and stacked on the row axis, so one
  matmul computes both partial products with f32 accumulation
  (~2^-16 relative error; CG with a 1e-3..1e-4 tolerance and LM on top
  absorb this trivially — verified against the XLA path in tests).
* the per-edge 6x6 Hessian blocks multiply as 6 broadcast-FMA passes on
  the VPU in a transposed ``[6(j), 8(i), E]`` layout (vertex/edge axis
  on lanes — the natural vectorization axis).

Everything (S, blocks, preconditioner, Krylov vectors) fits in VMEM for
V*E up to ~2M (e.g. 1k poses / 2k edges ~ 11 MB); ``fits_vmem`` gates
the dispatch and the XLA path remains for larger graphs.

Reference role: this solves the damped normal equations inside the
GTSAM-replacement LM (``Optimizer.hpp:68``); see ``optim/pgo.py``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_DEFAULT = jax.lax.Precision.DEFAULT  # bf16 operands: Mosaic rejects HIGHEST


# 94 MiB is chip-verified (v5e, 128 MiB VMEM/core): V=2k/E=4k (74.9 MiB
# scoped) compiles and runs; a 100 MiB request crashes the remote compile
# helper, so do not raise this without re-probing (scripts/probe_pgo2k.py).
VMEM_LIMIT_BYTES = int(os.environ.get("PGSLAM_PGO_VMEM_LIMIT",
                                      94 * 1024 * 1024))


def fits_vmem(n_vertices: int, n_edges: int,
              budget_bytes: int = VMEM_LIMIT_BYTES - 8 * 1024 * 1024) -> bool:
    """VMEM estimate for the fused solve at (V, E). Live set: S + the four
    block tensors + preconditioner + Krylov vectors (x/r/p/z [8,V]) + the
    transient split/edge buffers ([16,2E] + a few [8,E]). S counts double
    (Mosaic materializes one layout per contraction orientation)."""
    V = -(-n_vertices // 128) * 128
    E = -(-n_edges // 128) * 128
    s_bytes = 2 * (2 * E * V * 2)            # S [2E, V] bf16, x2 layouts
    blocks = 4 * 6 * 8 * E * 4               # four [6, 8, E] f32
    pinv = 6 * 8 * V * 4
    krylov = 6 * 8 * V * 4                   # x, r, p, z, Ap, rhs
    transients = 2 * 16 * 2 * E * 4 + 4 * 8 * E * 4
    return s_bytes + blocks + pinv + krylov + transients <= budget_bytes


def _split_rows(x: jax.Array) -> jax.Array:
    """[8, N] f32 -> [16, N] bf16 rows-stacked hi/lo decomposition.

    Bit-masked (NOT astype(bf16)/upcast): under
    ``--xla_allow_excess_precision=true`` XLA folds the downcast/upcast
    pair to identity and the ``lo`` residual constant-folds to zero when
    this helper is traced by XLA (interpret mode) — see
    ``ops/icp_pallas._bf16_trunc``."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32)
    hi = hi_f32.astype(jnp.bfloat16)       # exact: already on the bf16 grid
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return jnp.concatenate([hi, lo], axis=0)


def _kernel(sc_ref, S_ref, Aff_ref, Aft_ref, Atf_ref, Att_ref, Pinv_ref,
            dd_ref, bT_ref, x_ref, *, n_edges, cg_iterations, cg_tol):
    E = n_edges
    V = bT_ref.shape[1]
    f32 = jnp.float32
    prior_info = sc_ref[0]
    fixed_id = sc_ref[1].astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, V), 1)
    is_fixed = lane == fixed_id

    def pinv_apply(r):
        z = jnp.zeros((8, V), f32)
        for j in range(6):
            z = z + Pinv_ref[j] * r[j:j + 1, :]
        return z

    def matvec(p):
        # gather both edge endpoints: [16, V] @ S^T -> [16, 2E]
        xs = jax.lax.dot_general(
            _split_rows(p), S_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=f32, precision=_DEFAULT)
        xf = xs[:8, :E] + xs[8:, :E]                    # [8, E]
        xt = xs[:8, E:] + xs[8:, E:]
        yf = jnp.zeros((8, E), f32)
        yt = jnp.zeros((8, E), f32)
        for j in range(6):                              # 6x6 block FMAs
            yf = yf + Aff_ref[j] * xf[j:j + 1, :] + \
                Aft_ref[j] * xt[j:j + 1, :]
            yt = yt + Atf_ref[j] * xf[j:j + 1, :] + \
                Att_ref[j] * xt[j:j + 1, :]
        ys = jnp.concatenate([yf, yt], axis=1)          # [8, 2E]
        # scatter-add back to vertices: [16, 2E] @ S -> [16, V]
        ysc = jax.lax.dot_general(
            _split_rows(ys), S_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=f32, precision=_DEFAULT)
        y = ysc[:8] + ysc[8:]
        y = y + jnp.where(is_fixed, prior_info * p, 0.0)   # anchor prior
        return y + dd_ref[:] * p                           # LM damping

    rhs = bT_ref[:]                                        # already -b
    rhs2 = jnp.maximum(jnp.sum(rhs * rhs), 1e-30)
    x0 = jnp.zeros((8, V), f32)
    r0 = rhs
    z0 = pinv_apply(r0)
    rz0 = jnp.sum(r0 * z0)

    def body(_, carry):
        x, r, p, rz, done = carry
        Ap = matvec(p)
        alpha = rz / jnp.maximum(jnp.sum(p * Ap), 1e-30)
        xn = x + alpha * p
        rn = r - alpha * Ap
        zn = pinv_apply(rn)
        rzn = jnp.sum(rn * zn)
        beta = rzn / jnp.maximum(rz, 1e-30)
        pn = zn + beta * p
        x = jnp.where(done, x, xn)
        r = jnp.where(done, r, rn)
        p = jnp.where(done, p, pn)
        rz = jnp.where(done, rz, rzn)
        done = jnp.logical_or(done,
                              jnp.sum(rn * rn) <= cg_tol * rhs2)
        return (x, r, p, rz, done)

    x, _, _, _, _ = jax.lax.fori_loop(
        0, cg_iterations, body, (x0, r0, z0, rz0, jnp.bool_(False)))
    x_ref[:] = x


def _pad_lanes(x: jax.Array, mult: int = 128) -> jax.Array:
    pad = (-x.shape[-1]) % mult
    if pad:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    return x


def _blocks_to_jie(H: jax.Array, transpose_block: bool) -> jax.Array:
    """[E, 6, 6] -> [6(j), 8(i), Ep] with the block optionally transposed
    (for H_tf = H_ft^T without materializing it edge-wise)."""
    # index [j, i, e] = H[e, i, j]  (or H[e, j, i] when transposed)
    A = jnp.transpose(H, (1, 2, 0)) if transpose_block \
        else jnp.transpose(H, (2, 1, 0))
    A = jnp.pad(A, ((0, 0), (0, 2), (0, 0)))            # i: 6 -> 8
    return _pad_lanes(A)


@functools.partial(
    jax.jit, static_argnames=("n_edges", "cg_iterations", "cg_tol"))
def pcg_solve_pallas(S: jax.Array,          # [2Ep, Vp] bf16 one-hot
                     H_ff: jax.Array,       # [E, 6, 6]
                     H_tt: jax.Array,
                     H_ft: jax.Array,
                     P_inv: jax.Array,      # [V, 6, 6] preconditioner
                     damp_diag: jax.Array,  # [V, 6] lam * diag(D)
                     b: jax.Array,          # [V, 6] gradient
                     prior_info: jax.Array,
                     fixed_id: jax.Array,
                     *, n_edges: int, cg_iterations: int,
                     cg_tol: float) -> jax.Array:
    """Solve (H + lam diag + prior) x = -b; returns x [V, 6]."""
    V = b.shape[0]
    Ep = S.shape[0] // 2
    pe = Ep - H_ff.shape[0]
    if pe:  # padded edges carry zero blocks -> no contribution
        zpad = ((0, pe), (0, 0), (0, 0))
        H_ff, H_tt, H_ft = (jnp.pad(x, zpad) for x in (H_ff, H_tt, H_ft))
    Aff = _blocks_to_jie(H_ff, False)
    Att = _blocks_to_jie(H_tt, False)
    Aft = _blocks_to_jie(H_ft, False)
    Atf = _blocks_to_jie(H_ft, True)
    Pinv_t = _pad_lanes(jnp.pad(jnp.transpose(P_inv, (2, 1, 0)),
                                ((0, 0), (0, 2), (0, 0))))
    dd = _pad_lanes(jnp.pad(damp_diag.T, ((0, 2), (0, 0))))
    bT = _pad_lanes(jnp.pad(-b.T, ((0, 2), (0, 0))))
    Vp = S.shape[1]
    if bT.shape[1] != Vp:
        raise ValueError("S vertex padding disagrees with b padding")
    scalars = jnp.stack([prior_info.astype(jnp.float32),
                         fixed_id.astype(jnp.float32)])

    xT = pl.pallas_call(
        functools.partial(_kernel, n_edges=Ep,
                          cg_iterations=cg_iterations, cg_tol=cg_tol),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Vp), jnp.float32),
        # Default scoped-vmem limit is 16 MiB; v5e has headroom above it.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=VMEM_LIMIT_BYTES),
        interpret=jax.default_backend() == "cpu",
    )(scalars, S, Aff, Aft, Atf, Att, Pinv_t, dd, bT)
    return xT[:6, :V].T


def build_incidence_bf16(edge_from: jax.Array, edge_to: jax.Array,
                         n_vertices: int) -> jax.Array:
    """Stacked one-hot incidence ``S [2Ep, Vp]`` in bf16 (exact), padded
    to lane/sublane quanta. Padded COLUMNS are extra (never-referenced)
    vertices; padded ROWS would alias vertex 0, so the caller must pad
    edges with zero H blocks instead (see ``pcg_solve_pallas``)."""
    E = edge_from.shape[0]
    V = n_vertices
    Vp = -(-V // 128) * 128
    # Edge padding is lane-aligned (128) so the kernel's [:, :E] slices of
    # the stacked [.., 2Ep] arrays land on tile boundaries.
    Ep = -(-E // 128) * 128
    idx = jnp.concatenate([edge_from, edge_to])
    S = jax.nn.one_hot(idx, Vp, dtype=jnp.bfloat16)     # [2E, Vp]
    S = S.reshape(2, E, Vp)
    if Ep != E:
        S = jnp.pad(S, ((0, 0), (0, Ep - E), (0, 0)))
    return S.reshape(2 * Ep, Vp)


def build_incidence_factored(edge_from: jax.Array, edge_to: jax.Array,
                             n_vertices: int, block: int = 128):
    """Exact tiled-overlay incidence: ``S[e, v] = W1[e, v % block] *
    (sid[e] == v // block)`` with W1 ``[2Ep, block]`` bf16 (the OR of
    S's V/block column tiles — each endpoint contributes its one-hot at
    the within-tile offset) and sid ``[1, 2Ep]`` f32 (tile id per
    endpoint lane). Resident bytes shrink V/block-fold vs the plain
    one-hot S (64-128 MB at dense 4k poses) — the capacity extension
    that takes dense 4k+ and sparse 16k+ graphs fused (VERDICT r3
    item 2); MXU FLOPs are identical (the overlay carries the same
    ones, contracted tile-by-tile).

    The kernel stacks the tiles along M into ONE dot per direction
    (per-tile dots are MXU weight-load bound, and UNROLLED per-tile
    dots spill the whole VMEM — Mosaic hoists every independent dot;
    129 MB at dense 4k; scripts/probe_mosaic_loop.py chip A/B).
    Selection stays exact: one-hot matmuls move payloads by
    multiply-with-1.0 with f32 accumulation, and the tile masks are
    disjoint. Same row layout/padding contract as
    :func:`build_incidence_bf16`; padded edge rows are all-zero in W1
    and tile 0 in sid, contributing nothing."""
    E = edge_from.shape[0]
    Ep = -(-E // 128) * 128
    idx = jnp.concatenate([edge_from, edge_to]).astype(jnp.int32)
    W1 = jax.nn.one_hot(idx % block, block, dtype=jnp.bfloat16)
    sid = (idx // block).astype(jnp.float32)[:, None]        # [2E, 1]

    def padE(M):
        M = M.reshape(2, E, M.shape[1])
        if Ep != E:
            M = jnp.pad(M, ((0, 0), (0, Ep - E), (0, 0)))
        return M.reshape(2 * Ep, M.shape[2])

    return padE(W1), padE(sid).T

"""Fused Pallas TPU kernel for nearest-neighbour correspondence search.

The hot op of ICP is: for every reading point, the index and squared
distance of its nearest reference point. The XLA paths either materialize
huge distance blocks (brute force) or lean on TPU row-gathers (voxel
hash) — both HBM-bound. This kernel keeps everything on-chip:

* grid = (query tiles, reference tiles), reference innermost;
* the cross-term ``q . r`` runs on the MXU (``[TQ, 8] x [8, TR]`` — the
  coordinate dim padded 3->8);
* ``d2 = |r|^2 - 2 q.r`` (the |q|^2 row constant is added back outside —
  it cannot change the argmin), masking, and the running min/argmin all
  happen in VMEM on the VPU; the ``[TQ, TR]`` block never touches HBM.

HBM traffic is exactly: read Q + read R per query-tile sweep + write two
[NQ] vectors. For 64k x 64k fp32 the kernel is VPU-bound at a few ms —
two orders of magnitude faster than the gather-based path measured on
this chip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .knn import Matches

NEG_BIG = -3.4e38  # sentinel for masked entries (works with max-reduce)
# Packed (baked-score) modes: masked references carry a finite -|r|^2
# sentinel of -3e38 inside the score operand, so their MXU scores land
# strictly below this hit floor while every valid score (~|2 q.r|,
# <= ~1e9 even at km coordinates) lands strictly above it. Finite, not
# inf: an inf would turn the bf16 hi/lo split into NaNs.
INVALID_RSQ = 3.0e38
HIT_FLOOR_BAKED = -1.0e38


def _kernel(q_ref, rT_ref, rsq_ref, bestd_ref, besti_ref, *, precision, k,
            baked=False):
    """One (i, j) grid step: fold reference tile j into query tile i's
    running top-k. Scores are NEGATED distances so masked entries can use a
    single big negative sentinel with max-reduction.

    Streaming top-k: ``k`` extraction rounds pull the tile's k best
    (mask-out-the-argmax-column between rounds), each folded into the
    running ``[TQ, k]`` buffers by replace-the-current-min. k is static
    and small (<= 8), so the extra VPU passes stay a minor epilogue next
    to the MXU cross-term.

    ``baked``: the packed bf16 modes carry ``2r`` and split ``-|r|^2``
    rows in the reference operand (paired with ones columns in the
    query), so the whole argmax-safe score comes off the MXU — no score
    assembly or sentinel clamp on the VPU, and no rsq operand at all
    (masked references carry the finite INVALID_RSQ bake-in instead of
    the +inf rsq row; ``rsq_ref`` is None in baked calls)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        bestd_ref[:] = jnp.full_like(bestd_ref, NEG_BIG)
        besti_ref[:] = jnp.zeros_like(besti_ref)

    cross = jnp.dot(q_ref[:], rT_ref[:], precision=precision,
                    preferred_element_type=jnp.float32)       # [TQ, TR]
    # (bf16 operand modes pre-pack any hi/lo split into the contraction
    # dim — see ``_pack_operands`` — so this is always ONE MXU pass with
    # f32 accumulation unless precision="highest".)
    if baked:
        score = cross  # = 2 q.r - |r|^2, finite by construction
    else:
        # score = -(|r|^2 - 2 q.r); rsq row is +inf-masked -> sentinel.
        score = 2.0 * cross - rsq_ref[:]
        score = jnp.maximum(score, NEG_BIG)                   # kill -inf/nan
    tr = score.shape[1]
    cols = jax.lax.broadcasted_iota(jnp.int32, score.shape, 1)
    bestd = bestd_ref[:]                                      # [TQ, k]
    besti = besti_ref[:]
    kcols = jax.lax.broadcasted_iota(jnp.int32, bestd.shape, 1)
    for _ in range(k):
        tile_best = jnp.max(score, axis=1, keepdims=True)     # [TQ, 1]
        is_best = score >= tile_best
        local_arg = jnp.min(jnp.where(is_best, cols, tr), axis=1,
                            keepdims=True)                    # [TQ, 1]
        tile_arg = local_arg + j * tr
        if k > 1:  # retire the winning column before the next round
            score = jnp.where(cols == local_arg, NEG_BIG, score)
        cur_min = jnp.min(bestd, axis=1, keepdims=True)       # [TQ, 1]
        min_pos = jnp.min(jnp.where(bestd <= cur_min, kcols, k),
                          axis=1, keepdims=True)              # [TQ, 1]
        replace = (kcols == min_pos) & (tile_best > cur_min)  # [TQ, k]
        bestd = jnp.where(replace, tile_best, bestd)
        besti = jnp.where(replace, tile_arg, besti)
    bestd_ref[:] = bestd
    besti_ref[:] = besti


def _bf16_split(x: jax.Array):
    """Exact-sum bf16 decomposition: x ~= hi + lo.

    Implemented by mantissa bit-masking, NOT ``astype(bf16).astype(f32)``:
    this platform compiles XLA with ``--xla_allow_excess_precision=true``,
    under which the downcast/upcast pair can fold to the identity and the
    residual constant-folds to zero (observed on-chip), silently turning
    the ~f32-accurate packed mode into plain bf16."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        bits & jnp.uint32(0xFFFF0000), jnp.float32)
    return hi_f32.astype(jnp.bfloat16), (x - hi_f32).astype(jnp.bfloat16)


def _split3(x: jax.Array):
    """Three-term bf16 decomposition (~2^-22 relative) via mantissa
    bit-masking (see ``_bf16_split`` for why never astype round-trips)."""
    bits = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(bits & jnp.uint32(0xFFFF0000),
                                      jnp.float32)
    r1 = x - hi
    bits1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    mid = jax.lax.bitcast_convert_type(bits1 & jnp.uint32(0xFFFF0000),
                                       jnp.float32)
    return (hi.astype(jnp.bfloat16), mid.astype(jnp.bfloat16),
            (r1 - mid).astype(jnp.bfloat16))


def _pack_operands(qf: jax.Array, rf: jax.Array, nrsq: jax.Array,
                   precision: str):
    """Lay out the [*, 3] coordinate operands for the in-kernel matmul.

    Returns (q [NQp, K], rT [K, NRp], dot_precision, baked) with K padded
    to the f32/bf16 sublane quantum (8/16). See ``nn_pallas`` for the
    scheme. The packed bf16 modes are "baked": the reference operand
    carries ``2r`` plus the 3-term split of ``nrsq = -|r|^2`` (masked
    entries -INVALID_RSQ), paired with ones columns in the query, so the
    kernel's matmul result IS the argmax-safe score ``2 q.r - |r|^2``
    with no VPU epilogue (the score-assembly and sentinel-clamp passes
    over [TQ, TR] were the measured matcher ceiling, BENCH_NOTES).
    """
    if precision == "highest":
        q = jnp.pad(qf, ((0, 0), (0, 5)))                      # [NQp, 8]
        rT = jnp.pad(rf, ((0, 0), (0, 5))).T                   # [8, NRp]
        return q, rT, jax.lax.Precision.HIGHEST, False
    nh, nm, nl = (t[:, None] for t in _split3(nrsq))           # [NRp, 1]
    one = jnp.ones((qf.shape[0], 1), jnp.bfloat16)
    z1q = jnp.zeros((qf.shape[0], 1), jnp.bfloat16)
    z1r = jnp.zeros_like(nh)
    if precision == "high":
        qh, ql = _bf16_split(qf)
        r2h, r2l = _bf16_split(2.0 * rf)
        q = jnp.concatenate([qh, ql, qh, ql, one, one, one, z1q],
                            axis=1)                            # [NQp, 16]
        r = jnp.concatenate([r2h, r2h, r2l, r2l, nh, nm, nl, z1r],
                            axis=1)
        # Explicit DEFAULT: the package's global jax_default_matmul_precision
        # is "highest", which Mosaic rejects for bf16 operands.
        return q, r.T, jax.lax.Precision.DEFAULT, True
    if precision == "default":
        q = jnp.concatenate([qf.astype(jnp.bfloat16), one, one, one],
                            axis=1)
        r = jnp.concatenate([(2.0 * rf).astype(jnp.bfloat16), nh, nm, nl],
                            axis=1)
        q = jnp.pad(q, ((0, 0), (0, 10)))                      # [NQp, 16]
        rT = jnp.pad(r, ((0, 0), (0, 10))).T                   # [16, NRp]
        return q, rT, jax.lax.Precision.DEFAULT, True
    raise ValueError(f"unknown pallas matcher precision: {precision!r}")


@functools.partial(jax.jit,
                   static_argnames=("k", "tile_q", "tile_r", "precision"))
def nn_pallas(query: jax.Array,            # [NQ, 3]
              query_mask: jax.Array,       # [NQ]
              reference: jax.Array,        # [NR, 3]
              reference_mask: jax.Array,   # [NR]
              *, k: int = 1, tile_q: int = 512, tile_r: int = 2048,
              precision: str = "highest") -> Matches:
    """Exact masked kNN via the fused kernel. Returns squared distances
    ``[NQ, k]`` sorted ascending (+inf for masked queries / exhausted
    references) and indices.

    ``precision`` controls the accuracy/cost of the in-kernel cross-term
    matmul. The contraction dim is tiny (3 coords padded to the MXU's
    K=128), so instead of asking the compiler for multi-pass f32
    emulation (which costs one FULL pass per bf16 product, and which this
    chip's compiler rejects for the 3-pass HIGH enum anyway) we pack the
    error-compensation terms into the otherwise-wasted K slots:

    * "highest" — f32 operands, bit-exact 6-pass decomposition; the
      score ``2 q.r - |r|^2`` assembles on the VPU from the exact rsq
      row (matches the brute XLA argmin bit-for-bit).
    * "high"    — each f32 coordinate split as bf16 hi + bf16 lo; the
      contraction dim carries ``[q_hi,q_lo,q_hi,q_lo] . [2r_hi,2r_hi,
      2r_lo,2r_lo]`` (12 slots) PLUS three ones columns against the
      3-term bf16 split of ``-|r|^2`` (15 of 16 slots), so ONE bf16 MXU
      pass with f32 accumulation emits the argmax-safe score directly —
      no VPU epilogue over [TQ, TR]. ~f32-accurate (the |r|^2 split is
      ~2^-22 relative) at 6x the "highest" matmul throughput.
    * "default" — bf16-rounded coordinates + the same baked score rows,
      one pass (cheapest; NN ids can drift on near-ties at long range).

    Lower precision can only flip near-ties between almost-equidistant
    neighbors — harmless to ICP, which trims and averages thousands of
    correspondences; the REPORTED distances are exact either way (baked
    modes re-derive them from the winning ids below)."""
    nq, nr = query.shape[0], reference.shape[0]
    pq = (-nq) % tile_q
    pr = (-nr) % tile_r
    qf = jnp.pad(query.astype(jnp.float32), ((0, pq), (0, 0)))  # [NQp, 3]
    rf = jnp.pad(reference.astype(jnp.float32), ((0, pr), (0, 0)))
    rsq = jnp.sum(rf * rf, axis=1)                              # exact, f32
    rmask = jnp.pad(reference_mask, (0, pr), constant_values=False)
    nrsq = -jnp.where(rmask, rsq, INVALID_RSQ)                  # [NRp]
    q, rT, dot_precision, baked = _pack_operands(qf, rf, nrsq, precision)

    kdim = q.shape[1]
    nqp, nrp = q.shape[0], rT.shape[1]
    grid = (nqp // tile_q, nrp // tile_r)
    in_specs = [
        pl.BlockSpec((tile_q, kdim), lambda i, j: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((kdim, tile_r), lambda i, j: (0, j),
                     memory_space=pltpu.VMEM),
    ]
    if baked:
        # The score sentinel is baked into rT — no rsq operand, no dead
        # per-tile DMA of a [1, tile_r] block.
        kern = (lambda q_ref, rT_ref, bd_ref, bi_ref:
                _kernel(q_ref, rT_ref, None, bd_ref, bi_ref,
                        precision=dot_precision, k=k, baked=True))
        inputs = (q, rT)
    else:
        # Masked reference -> +inf rsq -> score sentinel in-kernel.
        rsq_row = jnp.where(rmask, rsq, jnp.inf)[None, :]       # [1, NRp]
        kern = functools.partial(_kernel, precision=dot_precision, k=k)
        in_specs.append(pl.BlockSpec((1, tile_r), lambda i, j: (0, j),
                                     memory_space=pltpu.VMEM))
        inputs = (q, rT, rsq_row)
    # Interpreter mode keeps the kernel testable on the CPU backend.
    interpret = jax.default_backend() == "cpu"
    bestd, besti = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_q, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nqp, k), jnp.float32),
            jax.ShapeDtypeStruct((nqp, k), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)

    bestd = bestd[:nq]
    besti = besti[:nq]
    if precision == "highest":
        qsq = jnp.sum(query.astype(jnp.float32) ** 2, axis=1, keepdims=True)
        d2 = jnp.maximum(qsq - bestd, 0.0)                      # un-negate
    else:
        # The winning id came from the approximated cross term, but the
        # REPORTED distance must be exact — it feeds absolute outlier
        # thresholds (MaxDist) downstream. One [NQ*k] row-gather matches
        # the cost of the error-element assembly that follows anyway.
        sel = jnp.take(reference.astype(jnp.float32),
                       jnp.clip(besti.reshape(-1), 0, nr - 1), axis=0)
        diff = query.astype(jnp.float32)[:, None, :] - \
            sel.reshape(nq, k, 3)
        d2 = jnp.sum(diff * diff, axis=-1)                      # [NQ, k]
    hit = (bestd > (HIT_FLOOR_BAKED if baked else NEG_BIG)) \
        & query_mask[:, None]
    d2 = jnp.where(hit, d2, jnp.inf)
    besti = jnp.where(hit, besti, 0)
    if k > 1:
        # The running buffers are unordered; present ascending by distance
        # (brute-force top_k parity). [NQ, k] sorts are trivial.
        order = jnp.argsort(d2, axis=1)
        d2 = jnp.take_along_axis(d2, order, axis=1)
        besti = jnp.take_along_axis(besti, order, axis=1)
    return Matches(dists2=d2, ids=besti)

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


def _kernel(q_ref, rT_ref, rsq_ref, bestd_ref, besti_ref, *, precision, k):
    """One (i, j) grid step: fold reference tile j into query tile i's
    running top-k. Scores are NEGATED distances so masked entries can use a
    single big negative sentinel with max-reduction.

    Streaming top-k: ``k`` extraction rounds pull the tile's k best
    (mask-out-the-argmax-column between rounds), each folded into the
    running ``[TQ, k]`` buffers by replace-the-current-min. k is static
    and small (<= 8), so the extra VPU passes stay a minor epilogue next
    to the MXU cross-term."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        bestd_ref[:] = jnp.full_like(bestd_ref, NEG_BIG)
        besti_ref[:] = jnp.zeros_like(besti_ref)

    cross = jnp.dot(q_ref[:], rT_ref[:], precision=precision,
                    preferred_element_type=jnp.float32)       # [TQ, TR]
    # score = -(|r|^2 - 2 q.r); rsq row is +inf-masked -> sentinel below.
    score = 2.0 * cross - rsq_ref[:]
    score = jnp.maximum(score, NEG_BIG)                       # kill -inf/nan
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

    ``precision`` controls the MXU pass count of the in-kernel cross-term
    matmul (TPU f32 matmuls decompose into bf16 passes): "highest" = 6
    passes (bit-exact f32), "high" = 3 passes (~f32 accurate), "default"
    = 1 pass (bf16-rounded inputs, ~6x the MXU throughput). The argmin is
    over exact |r|^2 minus the approximated cross term, so lower
    precision can only flip near-ties between almost-equidistant
    neighbors — harmless to ICP, which trims and averages thousands of
    correspondences."""
    nq, nr = query.shape[0], reference.shape[0]
    pq = (-nq) % tile_q
    pr = (-nr) % tile_r
    q = jnp.pad(query.astype(jnp.float32), ((0, pq), (0, 5)))   # [NQp, 8]
    r = jnp.pad(reference.astype(jnp.float32), ((0, pr), (0, 5)))
    rT = r.T                                                    # [8, NRp]
    rsq = jnp.sum(r * r, axis=1)
    rmask = jnp.pad(reference_mask, (0, pr), constant_values=False)
    # Masked reference -> +inf rsq -> score sentinel in-kernel.
    rsq = jnp.where(rmask, rsq, jnp.inf)[None, :]               # [1, NRp]

    nqp, nrp = q.shape[0], rT.shape[1]
    grid = (nqp // tile_q, nrp // tile_r)
    # Interpreter mode keeps the kernel testable on the CPU backend.
    interpret = jax.default_backend() == "cpu"
    bestd, besti = pl.pallas_call(
        functools.partial(_kernel, precision=precision, k=k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, 8), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, tile_r), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_r), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
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
    )(q, rT, rsq)

    bestd = bestd[:nq]
    besti = besti[:nq]
    qsq = jnp.sum(query.astype(jnp.float32) ** 2, axis=1, keepdims=True)
    d2 = jnp.maximum(qsq - bestd, 0.0)                          # un-negate
    hit = (bestd > NEG_BIG) & query_mask[:, None]
    d2 = jnp.where(hit, d2, jnp.inf)
    besti = jnp.where(hit, besti, 0)
    if k > 1:
        # The running buffers are unordered; present ascending by distance
        # (brute-force top_k parity). [NQ, k] sorts are trivial.
        order = jnp.argsort(d2, axis=1)
        d2 = jnp.take_along_axis(d2, order, axis=1)
        besti = jnp.take_along_axis(besti, order, axis=1)
    return Matches(dists2=d2, ids=besti)

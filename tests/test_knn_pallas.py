"""Fused Pallas 1-NN kernel vs the brute-force reference (interpret mode
on the CPU backend; the same kernel compiles natively on TPU)."""

import numpy as np
import jax.numpy as jnp

from pgslam_tpu.ops.knn import knn_brute_force
from pgslam_tpu.ops.knn_pallas import nn_pallas


def test_pallas_matches_brute(rng):
    q = rng.uniform(0, 10, (700, 3)).astype(np.float32)
    r = rng.uniform(0, 10, (1500, 3)).astype(np.float32)
    qm = np.ones(700, bool)
    rm = np.ones(1500, bool)
    rm[1000:] = False
    b = knn_brute_force(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                        jnp.asarray(rm), k=1)
    p = nn_pallas(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                  jnp.asarray(rm), tile_q=256, tile_r=512)
    np.testing.assert_array_equal(np.asarray(p.ids), np.asarray(b.ids))
    np.testing.assert_allclose(np.asarray(p.dists2), np.asarray(b.dists2),
                               rtol=1e-3, atol=1e-4)


def test_pallas_masked_query(rng):
    q = rng.uniform(0, 5, (64, 3)).astype(np.float32)
    r = rng.uniform(0, 5, (128, 3)).astype(np.float32)
    qm = np.ones(64, bool)
    qm[[3, 10]] = False
    p = nn_pallas(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                  jnp.ones(128, bool), tile_q=64, tile_r=128)
    d = np.asarray(p.dists2)[:, 0]
    assert not np.isfinite(d[3]) and not np.isfinite(d[10])
    assert np.isfinite(d[0])


def test_pallas_all_refs_masked(rng):
    q = rng.uniform(0, 5, (32, 3)).astype(np.float32)
    r = rng.uniform(0, 5, (64, 3)).astype(np.float32)
    p = nn_pallas(jnp.asarray(q), jnp.ones(32, bool), jnp.asarray(r),
                  jnp.zeros(64, bool), tile_q=32, tile_r=64)
    assert not np.isfinite(np.asarray(p.dists2)).any()
    assert (np.asarray(p.ids) == 0).all()


def test_pallas_baked_modes_masking(rng):
    """The packed bf16 modes bake a finite -INVALID_RSQ score sentinel
    for masked references (no +inf rsq row, no clamp): masked/exhausted
    behavior must match the highest mode's, and partial masks must
    never match a masked reference."""
    q = rng.uniform(0, 5, (64, 3)).astype(np.float32)
    r = rng.uniform(0, 5, (128, 3)).astype(np.float32)
    rm = np.ones(128, bool)
    rm[40:] = False
    for prec in ("high", "default"):
        p = nn_pallas(jnp.asarray(q), jnp.ones(64, bool), jnp.asarray(r),
                      jnp.zeros(128, bool), tile_q=64, tile_r=128,
                      precision=prec)
        assert not np.isfinite(np.asarray(p.dists2)).any()
        assert (np.asarray(p.ids) == 0).all()
        p = nn_pallas(jnp.asarray(q), jnp.ones(64, bool), jnp.asarray(r),
                      jnp.asarray(rm), tile_q=64, tile_r=128,
                      precision=prec)
        assert (np.asarray(p.ids)[:, 0] < 40).all()
        assert np.isfinite(np.asarray(p.dists2)).all()


def test_pallas_nonaligned_sizes(rng):
    # Sizes that don't divide the tiles exercise the padding path.
    q = rng.uniform(0, 5, (130, 3)).astype(np.float32)
    r = rng.uniform(0, 5, (257, 3)).astype(np.float32)
    b = knn_brute_force(jnp.asarray(q), jnp.ones(130, bool), jnp.asarray(r),
                        jnp.ones(257, bool), k=1)
    p = nn_pallas(jnp.asarray(q), jnp.ones(130, bool), jnp.asarray(r),
                  jnp.ones(257, bool), tile_q=64, tile_r=128)
    np.testing.assert_array_equal(np.asarray(p.ids), np.asarray(b.ids))


def test_pallas_topk_matches_brute(rng):
    q = rng.uniform(0, 10, (300, 3)).astype(np.float32)
    r = rng.uniform(0, 10, (900, 3)).astype(np.float32)
    qm = np.ones(300, bool)
    rm = np.ones(900, bool)
    rm[700:] = False
    for k in (2, 3, 4):
        b = knn_brute_force(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                            jnp.asarray(rm), k=k)
        p = nn_pallas(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                      jnp.asarray(rm), k=k, tile_q=128, tile_r=256)
        np.testing.assert_array_equal(np.asarray(p.ids), np.asarray(b.ids))
        np.testing.assert_allclose(np.asarray(p.dists2),
                                   np.asarray(b.dists2),
                                   rtol=1e-3, atol=1e-4)


def test_pallas_topk_more_than_valid_refs(rng):
    # k exceeds the number of valid reference points: surplus slots must
    # report +inf / id 0.
    q = rng.uniform(0, 5, (16, 3)).astype(np.float32)
    r = rng.uniform(0, 5, (64, 3)).astype(np.float32)
    rm = np.zeros(64, bool)
    rm[:2] = True
    p = nn_pallas(jnp.asarray(q), jnp.ones(16, bool), jnp.asarray(r),
                  jnp.asarray(rm), k=4, tile_q=16, tile_r=64)
    d = np.asarray(p.dists2)
    assert np.isfinite(d[:, :2]).all()
    assert not np.isfinite(d[:, 2:]).any()
    # ascending order within the finite prefix
    assert (d[:, 0] <= d[:, 1]).all()


def test_pallas_precision_modes(rng):
    # high/default must stay usable: identical near-NN structure on
    # well-separated points, distances within the bf16 rounding envelope.
    q = rng.uniform(-60, 60, (256, 3)).astype(np.float32)
    r = np.concatenate([q + rng.normal(0, 0.05, (256, 3)).astype(np.float32),
                        rng.uniform(-60, 60, (768, 3)).astype(np.float32)])
    qm, rm = np.ones(256, bool), np.ones(1024, bool)
    exact = nn_pallas(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                      jnp.asarray(rm), tile_q=128, tile_r=256)
    hi = nn_pallas(jnp.asarray(q), jnp.asarray(qm), jnp.asarray(r),
                   jnp.asarray(rm), tile_q=128, tile_r=256,
                   precision="high")
    agree = np.mean(np.asarray(hi.ids) == np.asarray(exact.ids))
    assert agree > 0.99

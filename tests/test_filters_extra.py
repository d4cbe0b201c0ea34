"""Shadow / MaxDensity / FixStepSampling filters + YAML mappings."""

import numpy as np

from pgslam_tpu.cloud import make_cloud
from pgslam_tpu.config import parse_filter_chain
from pgslam_tpu.ops import filters as F


def test_fix_step_sampling(rng):
    c = make_cloud(rng.normal(size=(20, 3)).astype(np.float32))
    out = F.apply_chain((F.FixStepSampling(step=4),), c)
    assert int(out.count()) == 5


def test_max_density(rng):
    # 100 points in one voxel + 5 spread out.
    # centered inside one voxel (offset 0.5 so the cluster doesn't straddle
    # voxel boundaries)
    dense = (rng.normal(size=(100, 3)) * 0.01 + 0.5).astype(np.float32)
    sparse = (rng.uniform(5, 50, size=(5, 3))).astype(np.float32)
    c = make_cloud(np.concatenate([dense, sparse]))
    out = F.apply_chain((F.MaxDensity(radius=1.0, max_count=3),), c)
    kept = np.asarray(out.mask)
    assert kept[:100].sum() <= 3
    assert kept[100:].all()


def test_shadow_filter(rng):
    n = 16
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    normals = np.zeros((n, 3), np.float32)
    obs = np.zeros((n, 3), np.float32)
    # first half: normal aligned with observation (keep);
    # second half: perpendicular (drop).
    normals[:, 2] = 1.0
    obs[: n // 2, 2] = 1.0
    obs[n // 2:, 0] = 1.0
    c = make_cloud(pts, descriptors={"normals": normals,
                                     "observationDirections": obs})
    out = F.apply_chain((F.Shadow(eps=0.5),), c)
    kept = np.asarray(out.mask)
    assert kept[: n // 2].all() and not kept[n // 2:].any()


def test_shadow_passthrough_without_descriptors(rng):
    c = make_cloud(rng.normal(size=(10, 3)).astype(np.float32))
    out = F.apply_chain((F.Shadow(),), c)
    assert int(out.count()) == 10


def test_yaml_mappings():
    chain = parse_filter_chain([
        {"ShadowDataPointsFilter": {"eps": 0.2}},
        {"MaxDensityDataPointsFilter": {"radius": 1.0, "maxCount": 2}},
        "FixStepSamplingDataPointsFilter",
    ])
    assert chain == (F.Shadow(0.2), F.MaxDensity(1.0, 2),
                     F.FixStepSampling(2))


def test_var_trimmed_adapts_to_overlap():
    """FTMP auto-ratio trim: with a bimodal distance distribution (60%
    tight inliers, 40% gross outliers) the chosen threshold must land in
    the gap — unlike a fixed 0.9 trim, which would keep outliers."""
    import jax.numpy as jnp

    from pgslam_tpu.ops.knn import Matches
    from pgslam_tpu.ops.outlier import (MaxDist, TrimmedDist,
                                        VarTrimmedDist, compute_weights)

    rng = np.random.default_rng(0)
    n = 500
    d2 = np.concatenate([rng.uniform(0.0, 0.01, 300),
                         rng.uniform(4.0, 9.0, 200)]).astype(np.float32)
    rng.shuffle(d2)
    matches = Matches(dists2=jnp.asarray(d2)[:, None],
                      ids=jnp.zeros((n, 1), jnp.int32))
    mask = jnp.ones((n,), bool)
    w_var = np.asarray(compute_weights((VarTrimmedDist(),), matches, mask))
    kept = d2[w_var[:, 0] > 0]
    assert (kept < 0.02).all()               # only the inlier mode
    assert 280 <= len(kept) <= 300
    w_fix = np.asarray(compute_weights((TrimmedDist(0.9),), matches, mask))
    assert w_fix[:, 0].sum() > 400           # fixed trim keeps outliers


def test_var_trimmed_yaml_mapping():
    from pgslam_tpu.config import parse_outlier_chain
    from pgslam_tpu.ops.outlier import VarTrimmedDist

    chain = parse_outlier_chain([
        {"VarTrimmedDistOutlierFilter": {"minRatio": 0.3, "lambda": 1.5}}])
    assert isinstance(chain[0], VarTrimmedDist)
    assert chain[0].min_ratio == 0.3 and chain[0].lam == 1.5

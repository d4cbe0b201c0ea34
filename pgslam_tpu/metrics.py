"""Pose metrics driving all spatial/topological queries.

Reference semantics (``metrics.hpp:7-24``): both metrics deliberately use
*translation only* — rotation is ignored in ``Distance`` and covariance is
ignored in ``Weight``. These two scalars drive closest-vertex queries,
Dijkstra edge weights, and loop-candidate gating, so we replicate them
exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def distance(T1: jax.Array, T2: jax.Array) -> jax.Array:
    """Euclidean distance between translation columns (``metrics.hpp:7-12``).

    Broadcasts over leading batch dims: ``distance(poses[V,4,4], pose[4,4])``
    vectorizes the reference's per-vertex visitor loop
    (``LoopCloser.hpp:139-161``) into one norm.
    """
    return jnp.linalg.norm(T2[..., :3, 3] - T1[..., :3, 3], axis=-1)


def weight(T_meas: jax.Array, cov_meas: jax.Array | None = None) -> jax.Array:
    """Edge weight = translation norm of the measurement (``metrics.hpp:20-24``).

    The covariance parameter exists for signature parity but is unused,
    matching the reference.
    """
    del cov_meas
    return jnp.linalg.norm(T_meas[..., :3, 3], axis=-1)

"""Shortest-path queries over the pose graph.

Replaces the reference's three Boost.Graph Dijkstra call sites
(``LoopCloser.hpp:211-215`` full-graph sweep with a geometric-distance
visitor, ``LoopCloser.hpp:275-280`` filtered-graph candidate assembly with
a record-n-and-stop visitor, ``Localizer.hpp:448-451`` neighbor-composition
ranking on a filtered subgraph).

Pose graphs here are small (10^2..10^4 vertices) and mutate between
queries, so SSSP runs host-side (binary heap, optionally backed by the C++
native core in :mod:`pgslam_tpu.native`); geometric distances are one
vectorized norm on device. A dense masked min-plus Bellman-Ford is provided
for on-device/batched use by the parallel layer.
"""

from __future__ import annotations

import heapq
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

INF = np.float32(np.inf)


def _adjacency(n_vertices: int, edge_from, edge_to, weights,
               vertex_ok=None, edge_ok=None):
    """Build adjacency lists honoring vertex/edge suppression predicates
    (the ``filtered_graph`` analog, LoopCloser.hpp:254-264)."""
    adj = [[] for _ in range(n_vertices)]
    for e in range(len(edge_from)):
        if edge_ok is not None and not edge_ok[e]:
            continue
        u, v = int(edge_from[e]), int(edge_to[e])
        if vertex_ok is not None and (not vertex_ok[u] or not vertex_ok[v]):
            continue
        w = float(weights[e])
        adj[u].append((v, w))
        adj[v].append((u, w))
    return adj


def dijkstra(n_vertices: int, edge_from, edge_to, weights, source: int,
             vertex_ok=None, edge_ok=None,
             max_settled: Optional[int] = None
             ) -> Tuple[np.ndarray, list]:
    """Weighted SSSP.

    Returns ``(dists [n_vertices], settled)`` where ``settled`` is the list
    of vertices in examination order (non-decreasing distance). If
    ``max_settled`` is given the search stops early once that many vertices
    were settled — the ``record_n_and_stop`` visitor semantics
    (``LoopCloser.hpp:167-190``).
    """
    try:
        from ..native import native_dijkstra
        return native_dijkstra(n_vertices, edge_from, edge_to, weights,
                               source, vertex_ok=vertex_ok, edge_ok=edge_ok,
                               max_settled=max_settled)
    except ImportError:
        pass
    adj = _adjacency(n_vertices, edge_from, edge_to, weights,
                     vertex_ok, edge_ok)
    dist = np.full((n_vertices,), INF, np.float32)
    done = np.zeros((n_vertices,), bool)
    dist[source] = 0.0
    heap = [(0.0, source)]
    settled = []
    while heap:
        d, u = heapq.heappop(heap)
        if done[u]:
            continue
        done[u] = True
        settled.append(u)
        if max_settled is not None and len(settled) >= max_settled:
            break
        for v, w in adj[u]:
            nd = d + w
            if nd < dist[v]:
                dist[v] = nd
                heapq.heappush(heap, (nd, v))
    return dist, settled


def candidate_composition(n_vertices: int, edge_from, edge_to, weights,
                          candidate: int, size: int,
                          vertex_ok, edge_ok) -> Optional[list]:
    """First ``size`` vertices settled by Dijkstra from ``candidate`` on the
    filtered graph, ordered so the candidate is LAST.

    Reproduces ``LoopCloser.hpp:268-298``: the visitor push_fronts each
    examined vertex, so after ``size`` pushes the deque reads
    [size-th nearest, ..., 2nd nearest, candidate] — making the candidate
    the local map's reference keyframe (back of the circular buffer).
    Returns None if fewer than ``size`` vertices are reachable.
    """
    _, settled = dijkstra(n_vertices, edge_from, edge_to, weights, candidate,
                          vertex_ok=vertex_ok, edge_ok=edge_ok,
                          max_settled=size)
    if len(settled) < size:
        return None
    return list(reversed(settled))


# --------------------------------------------------------------------------
# Device-side dense SSSP (for batched / on-device pipelines)
# --------------------------------------------------------------------------

def dense_adjacency(n: int, edge_from: jax.Array, edge_to: jax.Array,
                    weights: jax.Array, edge_mask: jax.Array) -> jax.Array:
    """Build a dense [n, n] weight matrix (inf where no edge) on device."""
    W = jnp.full((n, n), jnp.inf, jnp.float32)
    w = jnp.where(edge_mask, weights, jnp.inf)
    W = W.at[edge_from, edge_to].min(w)
    W = W.at[edge_to, edge_from].min(w)
    return W


@jax.jit
def bellman_ford(W: jax.Array, source: jax.Array) -> jax.Array:
    """Masked min-plus SSSP over a dense weight matrix.

    One jitted dispatch; iterates to fixpoint with ``lax.while_loop``.
    O(V^2) per sweep but V is small and the relaxation is a vectorized
    min-reduction that maps well onto the VPU.
    """
    n = W.shape[0]
    dist0 = jnp.full((n,), jnp.inf, jnp.float32).at[source].set(0.0)

    def cond(state):
        dist, changed, it = state
        return jnp.logical_and(changed, it < n)

    def body(state):
        dist, _, it = state
        relaxed = jnp.min(dist[:, None] + W, axis=0)
        new = jnp.minimum(dist, relaxed)
        return new, jnp.any(new < dist), it + 1

    dist, _, _ = jax.lax.while_loop(cond, body,
                                    (dist0, jnp.bool_(True), jnp.int32(0)))
    return dist

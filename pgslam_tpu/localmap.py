"""LocalMap — the sliding-window submap the robot localizes against.

Rebuild of ``LocalMap.h/hpp``: a circular buffer of up to N keyframe
(vertex, payload-snapshot) pairs (``LocalMap.h:13-20``) plus the
concatenated cloud expressed in the *reference keyframe*'s frame — the
reference keyframe being the LAST element of the buffer
(``LocalMap.hpp:111-120``). Staleness is tracked by comparing snapshot
``update_time`` stamps against the live graph (``LocalMap.hpp:169-183``).

The cloud build (``BuildCloudFromData``, ``LocalMap.hpp:209-224``) is a
single jitted kernel over stacked fixed-capacity keyframe clouds, so a
composition change costs one device dispatch regardless of window size.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from . import se3
from .cloud import Cloud
from .graph.pose_graph import Keyframe, PoseGraph


class Composition:
    """Vertex-id circular buffer (boost::circular_buffer semantics):
    ``push_back`` evicts the *front* once capacity is reached. The back is
    the reference keyframe."""

    def __init__(self, capacity: int, items: Sequence[int] = ()):
        self.capacity = int(capacity)
        self._items: List[int] = []
        for v in items:
            self.push_back(v)

    def push_back(self, v: int) -> None:
        self._items.append(int(v))
        if len(self._items) > self.capacity:
            self._items.pop(0)

    def clear(self) -> None:
        self._items.clear()

    def back(self) -> int:
        return self._items[-1]

    def __iter__(self):
        return iter(self._items)

    def __len__(self):
        return len(self._items)

    def __contains__(self, v) -> bool:
        return int(v) in self._items

    def __getitem__(self, i):
        return self._items[i]

    def __repr__(self):
        return f"Composition(cap={self.capacity}, {self._items})"

    def copy(self) -> "Composition":
        return Composition(self.capacity, self._items)

    def as_list(self) -> List[int]:
        return list(self._items)


def _build_cloud_impl(points, masks, descs, T_refkf_kf, slot_valid,
                      desc_keys: Tuple[str, ...]):
    """Transform each keyframe cloud into the reference frame and flatten.

    points [C, N, 3], masks [C, N], descs {k: [C, N, D]},
    T_refkf_kf [C, 4, 4], slot_valid [C] -> flat arrays [C*N, ...].
    """
    pts = se3.apply(T_refkf_kf, points)                    # [C, N, 3]
    mask = masks & slot_valid[:, None]
    out_desc = {}
    for k in desc_keys:
        v = descs[k]
        if k in ("normals", "observationDirections", "eigVectors") \
                and v.shape[-1] == 3:
            v = se3.rotate(T_refkf_kf, v)
        out_desc[k] = v.reshape(-1, v.shape[-1])
    return (pts.reshape(-1, 3), mask.reshape(-1), out_desc)


_build_cloud_kernel = functools.partial(
    jax.jit, static_argnames=("desc_keys",))(_build_cloud_impl)


def stack_composition(graph: PoseGraph, comp_ids, capacity: int):
    """Stack a composition's keyframe clouds + relative transforms into the
    fixed-shape inputs of :func:`_build_cloud_kernel`.

    Returns (points [C,N,3], masks [C,N], descs, T_refkf_kf [C,4,4],
    slot_valid [C], desc_keys, T_world_ref [4,4]).
    """
    return stack_keyframes([graph.keyframe(v) for v in comp_ids], capacity)


def stack_keyframes(kfs, capacity: int):
    """Stack keyframe snapshots (see :func:`stack_composition`)."""
    ref = kfs[-1]
    C = capacity
    T_ref = np.asarray(ref.optimized_T_world_kf, np.float64)
    T_refkf_world = np.linalg.inv(T_ref)
    caps = {kf.cloud.capacity for kf in kfs}
    if len(caps) != 1:
        raise ValueError(
            f"composition requires equal keyframe cloud capacities: {caps}")
    n = caps.pop()
    desc_keys = tuple(sorted(kfs[0].cloud.descriptors.keys()))

    def pad(arrs, fill):
        return arrs + [fill] * (C - len(arrs))

    points = jnp.stack(pad([kf.cloud.points for kf in kfs],
                           jnp.zeros((n, 3), jnp.float32)))
    masks = jnp.stack(pad([kf.cloud.mask for kf in kfs],
                          jnp.zeros((n,), bool)))
    descs = {}
    for k in desc_keys:
        d = kfs[0].cloud.descriptors[k].shape[-1]
        descs[k] = jnp.stack(pad([kf.cloud.descriptors[k] for kf in kfs],
                                 jnp.zeros((n, d), jnp.float32)))
    Ts = jnp.asarray(np.stack(pad(
        [(T_refkf_world @ np.asarray(kf.optimized_T_world_kf, np.float64)
          ).astype(np.float32) for kf in kfs],
        np.eye(4, dtype=np.float32))))
    slot_valid = jnp.asarray([True] * len(kfs) + [False] * (C - len(kfs)))
    return (points, masks, descs, Ts, slot_valid, desc_keys,
            T_ref.astype(np.float32))


def batch_rebuild(local_maps, pad_to: int = 0) -> None:
    """Rebuild several LocalMaps' clouds in ONE vmapped device dispatch
    (multi-agent path). All maps must share capacity / keyframe cloud
    capacity / descriptor keys (same pipeline config guarantees this).

    The batch is padded (repeating the first entry) to ``pad_to`` when
    given, else to a power-of-two bucket — compiles through the relay are
    expensive and not persistently cached, so a single fixed batch shape
    beats per-size recompiles even at the cost of padded compute."""
    if not local_maps:
        return
    if len(local_maps) == 1 and pad_to <= 1:
        local_maps[0]._build_cloud()
        return
    n = len(local_maps)
    bucket = max(pad_to, 1 << (n - 1).bit_length())
    stacked = [stack_keyframes([kf for _, kf in lm._data], lm._capacity)
               for lm in local_maps]
    stacked += [stacked[0]] * (bucket - n)
    desc_keys = stacked[0][5]
    ins = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs),
                                 *[s[:5] for s in stacked])
    pts, mask, descs = _batched_build(*ins, desc_keys=desc_keys)
    for i, lm in enumerate(local_maps):
        lm._cloud = Cloud(
            points=pts[i], mask=mask[i],
            descriptors={k: v[i] for k, v in descs.items()})


@functools.partial(jax.jit, static_argnames=("desc_keys",))
def _batched_build(points, masks, descs, Ts, slot_valid, desc_keys):
    return jax.vmap(
        lambda p, m, d, t, s: _build_cloud_impl(p, m, d, t, s, desc_keys)
    )(points, masks, descs, Ts, slot_valid)


class LocalMap:
    """Sliding-window submap (``LocalMap.h:8-57``)."""

    def __init__(self, capacity: int):
        self._capacity = int(capacity)
        self._data: List[Tuple[int, Keyframe]] = []   # back = reference kf
        self._cloud: Optional[Cloud] = None

    # -- construction / refresh (LocalMap.hpp:55-80) -----------------------

    @classmethod
    def from_graph(cls, graph: PoseGraph, comp: Composition) -> "LocalMap":
        lm = cls(comp.capacity)
        lm.update_to_new_composition(graph, comp)
        return lm

    def update_to_new_composition(self, graph: PoseGraph, comp: Composition,
                                  build: bool = True) -> None:
        self._capacity = comp.capacity
        self._data = [(v, graph.keyframe(v)) for v in comp]
        if build:
            self._build_cloud()

    def update_from_graph(self, graph: PoseGraph, build: bool = True) -> None:
        """Refresh payload snapshots for the current vertices."""
        self._data = [(v, graph.keyframe(v)) for v, _ in self._data]
        if build:
            self._build_cloud()

    # -- basic accessors ---------------------------------------------------

    def capacity(self) -> int:
        return self._capacity

    def has_cloud(self) -> bool:
        return self._cloud is not None and len(self._data) > 0

    def cloud(self) -> Cloud:
        return self._cloud

    def cloud_in_world_frame(self) -> Cloud:
        """``LocalMap.hpp:95-98``."""
        from .cloud import transform_cloud_jit
        T = jnp.asarray(self.reference_keyframe().optimized_T_world_kf)
        return transform_cloud_jit(T, self._cloud)

    def get_composition(self) -> Composition:
        return Composition(self._capacity, [v for v, _ in self._data])

    def reference_vertex(self) -> int:
        return self._data[-1][0]

    def reference_keyframe(self) -> Keyframe:
        return self._data[-1][1]

    # -- composition comparison (LocalMap.hpp:123-166) ---------------------

    def has_same_vertex_set(self, comp: Composition) -> bool:
        return set(v for v, _ in self._data) == set(comp)

    def has_same_reference_vertex(self, comp: Composition) -> bool:
        return len(self._data) > 0 and len(comp) > 0 and \
            self._data[-1][0] == comp.back()

    def has_same_composition(self, comp: Composition) -> bool:
        return self.has_same_reference_vertex(comp) and \
            self.has_same_vertex_set(comp)

    # -- staleness (LocalMap.hpp:169-183) ----------------------------------

    def is_outdated(self, graph: PoseGraph) -> bool:
        return any(graph.update_times[v] > kf.update_time
                   for v, kf in self._data)

    def is_reference_keyframe_outdated(self, graph: PoseGraph) -> bool:
        v, kf = self._data[-1]
        return graph.update_times[v] > kf.update_time

    # -- queries (LocalMap.hpp:186-205) ------------------------------------

    def find_closest_vertex(self, T_world_x) -> int:
        """Nearest composition vertex to a world pose (translation metric,
        metrics.hpp:7-12). Host-side numpy: the window is tiny and a device
        round-trip here would cost more than the whole query."""
        T = np.asarray(T_world_x)
        d = [np.linalg.norm(kf.optimized_T_world_kf[:3, 3] - T[:3, 3])
             for _, kf in self._data]
        return self._data[int(np.argmin(d))][0]

    # -- cloud assembly (LocalMap.hpp:209-224) -----------------------------

    def _build_cloud(self) -> None:
        if not self._data:
            self._cloud = None
            return
        points, masks, descs, Ts, slot_valid, desc_keys, _ = \
            stack_keyframes([kf for _, kf in self._data], self._capacity)
        pts, mask, out_desc = _build_cloud_kernel(points, masks, descs, Ts,
                                                  slot_valid, desc_keys)
        self._cloud = Cloud(points=pts, mask=mask, descriptors=out_desc)

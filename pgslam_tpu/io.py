"""Checkpoint / resume — serialize the full SLAM state.

The reference's only persistence is a graphviz topology dump
(``MapManager.hpp:137-147``, no clouds, no poses); SURVEY.md §5.4 calls
for real checkpointing in the rebuild. A checkpoint is a single ``.npz``
holding the pose-graph arrays, every keyframe cloud (points + mask +
descriptors), the fixed vertex, the logical clock, and the localizer's
pose/composition state — enough to resume mapping mid-run.
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from .cloud import Cloud
from .graph.pose_graph import MapManager, PoseGraph

FORMAT_VERSION = 1


def _cloud_arrays(prefix: str, cloud: Cloud, out: dict) -> None:
    out[f"{prefix}/points"] = np.asarray(cloud.points)
    out[f"{prefix}/mask"] = np.asarray(cloud.mask)
    for k, v in cloud.descriptors.items():
        out[f"{prefix}/desc/{k}"] = np.asarray(v)


def _cloud_from(prefix: str, data) -> Cloud:
    desc_prefix = f"{prefix}/desc/"
    descs = {k[len(desc_prefix):]: jnp.asarray(data[k])
             for k in data.files if k.startswith(desc_prefix)}
    return Cloud(points=jnp.asarray(data[f"{prefix}/points"]),
                 mask=jnp.asarray(data[f"{prefix}/mask"]),
                 descriptors=descs)


def save_checkpoint(path: str, map_manager: MapManager,
                    localizer=None) -> None:
    g = map_manager.get_graph()
    nv, ne = g.n_vertices, g.n_edges
    out = {
        "format_version": FORMAT_VERSION,
        "n_vertices": nv,
        "n_edges": ne,
        "fixed_vertex": map_manager.fixed_vertex
        if map_manager.fixed_vertex is not None else -1,
        "clock": map_manager._clock,
        "poses": g.poses[:nv],
        "optimized_poses": g.optimized_poses[:nv],
        "update_times": g.update_times[:nv],
        "edge_from": g.edge_from[:ne],
        "edge_to": g.edge_to[:ne],
        "edge_T": g.edge_T[:ne],
        "edge_cov": g.edge_cov[:ne],
        "edge_type": g.edge_type[:ne],
        "edge_weight": g.edge_weight[:ne],
    }
    for v in range(nv):
        _cloud_arrays(f"cloud/{v}", g.clouds[v], out)
    if localizer is not None:
        out["localizer/T_refkf_robot"] = localizer.T_refkf_robot
        out["localizer/T_world_robot"] = localizer.T_world_robot
        out["localizer/last_input_T_world_robot"] = \
            localizer.last_input_T_world_robot
        out["localizer/count"] = localizer.count
        out["localizer/composition"] = np.asarray(
            localizer.local_map.get_composition().as_list()
            if localizer.local_map.has_cloud() else [], np.int64)
    np.savez_compressed(path, **out)


def load_checkpoint(path: str, map_manager: MapManager,
                    localizer=None) -> None:
    """Restore state in place. The MapManager should be freshly built."""
    data = np.load(path, allow_pickle=False)
    version = int(data["format_version"])
    if version != FORMAT_VERSION:
        raise ValueError(f"unsupported checkpoint version {version}")
    nv, ne = int(data["n_vertices"]), int(data["n_edges"])
    g = PoseGraph(initial_vertex_capacity=max(64, nv),
                  initial_edge_capacity=max(128, ne))
    g.n_vertices, g.n_edges = nv, ne
    g.poses[:nv] = data["poses"]
    g.optimized_poses[:nv] = data["optimized_poses"]
    g.update_times[:nv] = data["update_times"]
    g.edge_from[:ne] = data["edge_from"]
    g.edge_to[:ne] = data["edge_to"]
    g.edge_T[:ne] = data["edge_T"]
    g.edge_cov[:ne] = data["edge_cov"]
    g.edge_type[:ne] = data["edge_type"]
    g.edge_weight[:ne] = data["edge_weight"]
    g.clouds = [_cloud_from(f"cloud/{v}", data) for v in range(nv)]
    map_manager.graph = g
    fixed = int(data["fixed_vertex"])
    map_manager.fixed_vertex = None if fixed < 0 else fixed
    map_manager._clock = int(data["clock"])
    if localizer is not None and "localizer/count" in data.files:
        localizer.T_refkf_robot = data["localizer/T_refkf_robot"]
        localizer.T_world_robot = data["localizer/T_world_robot"]
        localizer.last_input_T_world_robot = \
            data["localizer/last_input_T_world_robot"]
        localizer.count = int(data["localizer/count"])
        comp_list = list(data["localizer/composition"])
        if comp_list:
            from .localmap import Composition
            comp = Composition(localizer.local_map.capacity(),
                               [int(v) for v in comp_list])
            localizer.next_composition = comp.copy()
            localizer.local_map.update_to_new_composition(g, comp)
            localizer.icp_engine.set_map(localizer.local_map.cloud())

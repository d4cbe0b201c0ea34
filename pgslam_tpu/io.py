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
    # Restore is a non-append mutation: any device-resident optimizer
    # mirror of the old graph object must not survive it. The bump
    # alone cannot guarantee that (it marks the NEW graph; every
    # restored graph lands at epoch 1, and CPython can reuse the old
    # object's address) — mirror identity therefore uses a
    # process-global per-object token (resident._graph_token), with
    # this bump as belt-and-suspenders for same-object in-place
    # restores.
    g.mutation_epoch += 1
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


# --------------------------------------------------------------------------
# Trajectory interchange formats (KITTI odometry / TUM RGB-D)
# --------------------------------------------------------------------------
#
# The reference has no trajectory export at all (its only persistence is a
# graphviz topology dump, ``MapManager.hpp:137-147``); these formats are
# what the surrounding ecosystem (evo, kitti-devkit, rpg_trajectory_eval)
# consumes, so a user migrating from the reference can plug straight into
# their existing evaluation tooling alongside :mod:`pgslam_tpu.eval`.

def save_trajectory_kitti(path: str, poses) -> None:
    """Write ``[N, 4, 4]`` poses in KITTI odometry format: one line per
    pose, the 12 values of the upper 3x4 block, row-major."""
    arr = np.asarray(poses, dtype=np.float64).reshape(-1, 4, 4)
    np.savetxt(path, arr[:, :3, :].reshape(len(arr), 12), fmt="%.9e")


def load_trajectory_kitti(path: str) -> np.ndarray:
    """Read KITTI odometry poses -> ``[N, 4, 4]`` float32."""
    flat = np.loadtxt(path, dtype=np.float64).reshape(-1, 3, 4)
    out = np.tile(np.eye(4, dtype=np.float32), (len(flat), 1, 1))
    out[:, :3, :] = flat.astype(np.float32)
    return out


def save_trajectory_tum(path: str, poses, timestamps=None) -> None:
    """Write poses in TUM format: ``t tx ty tz qx qy qz qw`` per line.
    ``timestamps`` defaults to the pose index."""
    import jax.numpy as jnp

    from . import se3
    arr = np.asarray(poses, dtype=np.float32).reshape(-1, 4, 4)
    q = np.asarray(se3.quaternion_from_matrix(
        jnp.asarray(arr[:, :3, :3])))                   # [N, 4] (w,x,y,z)
    t = arr[:, :3, 3]
    ts = np.arange(len(arr), dtype=np.float64) if timestamps is None \
        else np.asarray(timestamps, dtype=np.float64)
    cols = np.column_stack([ts, t, q[:, 1], q[:, 2], q[:, 3], q[:, 0]])
    np.savetxt(path, cols, fmt="%.9f")


def load_trajectory_tum(path: str):
    """Read TUM trajectory -> (timestamps ``[N]``, poses ``[N, 4, 4]``)."""
    import jax.numpy as jnp

    from . import se3
    data = np.loadtxt(path, dtype=np.float64).reshape(-1, 8)
    ts = data[:, 0]
    t = data[:, 1:4].astype(np.float32)
    qxyzw = data[:, 4:8].astype(np.float32)
    # TUM order (x, y, z, w) -> twist via exp of log_so3 of the rotation
    w, x, y, z = qxyzw[:, 3], qxyzw[:, 0], qxyzw[:, 1], qxyzw[:, 2]
    R = np.empty((len(data), 3, 3), np.float32)
    R[:, 0, 0] = 1 - 2 * (y * y + z * z)
    R[:, 0, 1] = 2 * (x * y - z * w)
    R[:, 0, 2] = 2 * (x * z + y * w)
    R[:, 1, 0] = 2 * (x * y + z * w)
    R[:, 1, 1] = 1 - 2 * (x * x + z * z)
    R[:, 1, 2] = 2 * (y * z - x * w)
    R[:, 2, 0] = 2 * (x * z - y * w)
    R[:, 2, 1] = 2 * (y * z + x * w)
    R[:, 2, 2] = 1 - 2 * (x * x + y * y)
    poses = np.asarray(se3.make(jnp.asarray(R), jnp.asarray(t)))
    return ts, poses


# --------------------------------------------------------------------------
# PLY point-cloud export/import
# --------------------------------------------------------------------------

def save_cloud_ply(path: str, cloud, binary: bool = True) -> None:
    """Write a :class:`Cloud` (or raw ``[N, 3]`` array) to PLY. Masked
    points are dropped; a ``normals`` descriptor becomes nx/ny/nz."""
    if hasattr(cloud, "points"):
        mask = np.asarray(cloud.mask)
        pts = np.asarray(cloud.points)[mask].astype(np.float32)
        normals = cloud.descriptors.get("normals")
        normals = None if normals is None \
            else np.asarray(normals)[mask].astype(np.float32)
    else:
        pts = np.asarray(cloud, dtype=np.float32).reshape(-1, 3)
        normals = None
    props = ["property float x", "property float y", "property float z"]
    cols = [pts]
    if normals is not None:
        props += ["property float nx", "property float ny",
                  "property float nz"]
        cols.append(normals)
    fmt = ("binary_little_endian" if binary else "ascii")
    header = ("ply\nformat %s 1.0\nelement vertex %d\n%s\nend_header\n"
              % (fmt, len(pts), "\n".join(props)))
    data = np.column_stack(cols).astype("<f4")
    with open(path, "wb") as f:
        f.write(header.encode())
        if binary:
            f.write(data.tobytes())
        else:
            np.savetxt(f, data, fmt="%.6f")


def load_cloud_ply(path: str, capacity: int | None = None):
    """Read a PLY written by :func:`save_cloud_ply` (float32 x/y/z
    [+ nx/ny/nz]) into a :class:`Cloud`."""
    from .cloud import make_cloud
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode("ascii").strip()
            header.append(line)
            if line == "end_header":
                break
        n = next(int(h.split()[-1]) for h in header
                 if h.startswith("element vertex"))
        props = [h.split()[-1] for h in header if h.startswith("property")]
        binary = any("binary_little_endian" in h for h in header)
        width = len(props)
        if binary:
            data = np.frombuffer(f.read(4 * n * width),
                                 dtype="<f4").reshape(n, width)
        else:
            data = np.loadtxt(f, dtype=np.float32).reshape(n, width)
    pts = data[:, :3]
    descriptors = {}
    if "nx" in props:
        i = props.index("nx")
        descriptors["normals"] = data[:, i:i + 3]
    return make_cloud(pts, capacity=capacity or n, descriptors=descriptors)

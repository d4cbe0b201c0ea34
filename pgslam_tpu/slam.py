"""PoseGraphSlam facade — constructs and wires the pipeline components.

Rebuild of ``PoseGraphSlam.h/hpp``: the ctor builds MapManager ->
Optimizer -> LoopCloser -> Localizer and registers the back-references
(``PoseGraphSlam.hpp:13-22``); ``add_data`` forwards scans to the
Localizer (``PoseGraphSlam.hpp:58-66``); config fans out to components
(``PoseGraphSlam.hpp:43-51``). The multi-threaded variant lives in
:mod:`pgslam_tpu.pipeline`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple, Union

import numpy as np

from .cloud import Cloud, make_cloud
from .graph.pose_graph import MapManager
from .localizer import Localizer, LocalizerConfig
from .loopcloser import LoopCloser, LoopCloserConfig
from .optimizer import Optimizer, OptimizerConfig


@dataclasses.dataclass(frozen=True)
class SlamConfig:
    localizer: LocalizerConfig = LocalizerConfig()
    loop_closer: LoopCloserConfig = LoopCloserConfig()
    optimizer: OptimizerConfig = OptimizerConfig()
    # Capacity raw sensor clouds are padded to before the input filters.
    sensor_cloud_capacity: int = 2048


class PoseGraphSlam:
    """Single-threaded facade (``PoseGraphSlam.h:17-68``)."""

    def __init__(self, config: SlamConfig = SlamConfig()):
        self.config = config
        self.map_manager = MapManager()
        self.optimizer = Optimizer(self.map_manager, config.optimizer)
        self.loop_closer = LoopCloser(self.map_manager, self.optimizer,
                                      config.loop_closer)
        self.localizer = Localizer(self.map_manager, config.localizer)
        self.map_manager.set_localizer(self.localizer)
        self.map_manager.set_loop_closer(self.loop_closer)

    @classmethod
    def from_yaml(cls, path: str) -> "PoseGraphSlam":
        """Construct from a single nested SLAM YAML config."""
        from .config import load_slam_config
        return cls(load_slam_config(path))

    @classmethod
    def from_config_paths(cls, localizer_icp_config: str,
                          localizer_input_filters_config: str,
                          loop_closer_icp_config: str) -> "PoseGraphSlam":
        """The reference ctor signature (``PoseGraphSlam.h:45``,
        ``PoseGraphSlam.hpp:13-22``): three libpointmatcher YAML paths —
        localizer ICP pipeline, localizer input filters, loop-closer ICP
        pipeline."""
        from .config import load_icp_config, load_input_filters
        loc_icp = load_icp_config(localizer_icp_config)
        filters = load_input_filters(localizer_input_filters_config)
        loop_icp = load_icp_config(loop_closer_icp_config)
        cfg = SlamConfig(
            localizer=LocalizerConfig(icp=loc_icp, input_filters=filters),
            loop_closer=LoopCloserConfig(icp=loop_icp))
        return cls(cfg)

    # -- config fan-out (PoseGraphSlam.hpp:43-51) --------------------------

    def set_icp_config(self, path: str,
                       localizer_icp_config: Optional[str] = None,
                       loop_closer_icp_config: Optional[str] = None) -> None:
        """Config fan-out (``PoseGraphSlam.hpp:43-51``). The reference
        signature is three YAML paths — (localizer input filters,
        localizer ICP, loop-closer ICP) — each delegated to the owning
        component (which re-installs its reference map if one is live).
        With a single argument, that one ICP YAML is applied to both the
        Localizer and the LoopCloser as a convenience."""
        if localizer_icp_config is None and loop_closer_icp_config is None:
            self.localizer.set_icp_config(path)
            self.loop_closer.set_icp_config(path)
            return
        if localizer_icp_config is None or loop_closer_icp_config is None:
            raise TypeError("set_icp_config takes either one ICP YAML path "
                            "or the reference's three paths (input filters, "
                            "localizer ICP, loop-closer ICP)")
        self.localizer.set_input_filters_config(path)
        self.localizer.set_icp_config(localizer_icp_config)
        self.loop_closer.set_icp_config(loop_closer_icp_config)

    SetIcpConfig = set_icp_config

    def set_input_filters_config(self, path: str) -> None:
        """``Localizer.hpp:74-78`` analog."""
        from .config import load_input_filters
        chain = load_input_filters(path)
        self.localizer.config = dataclasses.replace(
            self.localizer.config, input_filters=chain)

    # -- data entry (PoseGraphSlam.hpp:58-66) ------------------------------

    def add_data(self, timestamp, world_frame_id: str, T_world_robot,
                 T_robot_sensor, cloud: Union[Cloud, np.ndarray]) -> None:
        if not isinstance(cloud, Cloud):
            cloud = make_cloud(np.asarray(cloud),
                               capacity=self.config.sensor_cloud_capacity)
        self.localizer.add_new_data(timestamp, world_frame_id,
                                    np.asarray(T_world_robot, np.float32),
                                    np.asarray(T_robot_sensor, np.float32),
                                    cloud)

    # C++-style alias for API parity.
    AddData = add_data

    def flush(self) -> None:
        """Commit any in-flight deferred scans (``sync_lag > 0`` in the
        LocalizerConfig): block on their results and run the deferred
        keyframe/composition decisions. No-op in classic per-scan-sync
        mode. The state accessors below call this, so reads always
        reflect every scan submitted via :meth:`add_data`."""
        self.localizer.flush()

    # -- state access ------------------------------------------------------

    @property
    def T_world_robot(self) -> np.ndarray:
        self.flush()
        return self.localizer.T_world_robot

    def get_graph(self):
        self.flush()
        return self.map_manager.get_graph()

    def get_local_map(self) -> Tuple[Optional[Cloud], bool]:
        self.flush()
        return self.localizer.get_local_map()

    def get_local_map_in_world_frame(self) -> Tuple[Optional[Cloud], bool]:
        self.flush()
        return self.localizer.get_local_map_in_world_frame()

    def trajectory(self) -> np.ndarray:
        """Optimized keyframe poses [n, 4, 4]."""
        self.flush()
        g = self.map_manager.get_graph()
        return g.optimized_poses[:g.n_vertices].copy()

    def global_map(self, max_points_per_keyframe: int = 0) -> np.ndarray:
        """Concatenate every keyframe cloud in the world frame using the
        OPTIMIZED poses — the full reconstructed map (the reference keeps
        clouds per-vertex but never offers this assembly). Returns a
        dense ``[N, 3]`` float32 array (masked points dropped); cap the
        per-keyframe contribution with ``max_points_per_keyframe``.
        Export with :func:`pgslam_tpu.io.save_cloud_ply`."""
        self.flush()
        g = self.map_manager.get_graph()
        parts = []
        for v in range(g.n_vertices):
            cloud = g.clouds[v]
            if cloud is None:
                continue
            pts = np.asarray(cloud.points)[np.asarray(cloud.mask)]
            if max_points_per_keyframe and len(pts) > max_points_per_keyframe:
                step = len(pts) // max_points_per_keyframe + 1
                pts = pts[::step]
            T = np.asarray(g.optimized_poses[v], dtype=np.float32)
            parts.append(pts @ T[:3, :3].T + T[:3, 3])
        if not parts:
            return np.zeros((0, 3), np.float32)
        return np.concatenate(parts, axis=0)

    def write_graphviz(self, path: str) -> None:
        self.flush()
        self.map_manager.write_graphviz(path)

    WriteGraphviz = write_graphviz

"""Multi-agent SLAM: N instances sharing one pose graph (BASELINE
config 5: "16 vmapped SLAM instances sharing one pose graph").

Each agent keeps its own Localizer front-end state (local map,
composition, pose chain), but every scan-matching dispatch across the
fleet is fused into ONE vmapped ``icp_core`` call — agents' readings,
reference maps and initial transforms stack along a batch axis that
shards across a device mesh. The shared MapManager / LoopCloser /
Optimizer back-end serializes graph mutations host-side in agent order
(deterministic), and optimization writebacks resync every agent.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..cloud import Cloud, make_cloud, stack_clouds
from ..graph.pose_graph import MapManager
from ..localizer import Localizer
from ..loopcloser import LoopCloser
from ..optimizer import Optimizer
from ..ops.icp import icp_core
from ..slam import SlamConfig


class MultiAgentSlam:
    """N SLAM agents over one shared pose graph."""

    def __init__(self, config: SlamConfig, n_agents: int,
                 mesh: Optional[jax.sharding.Mesh] = None):
        self.config = config
        self.n_agents = n_agents
        self.mesh = mesh
        self.map_manager = MapManager()
        self.optimizer = Optimizer(self.map_manager, config.optimizer)
        self.loop_closer = LoopCloser(self.map_manager, self.optimizer,
                                      config.loop_closer)
        self.localizers: List[Localizer] = []
        for _ in range(n_agents):
            loc = Localizer(self.map_manager, config.localizer)
            self.map_manager.add_localizer(loc)
            self.localizers.append(loc)
        self.map_manager.set_loop_closer(self.loop_closer)
        self._batched_icp = jax.jit(
            jax.vmap(lambda r, m, t: icp_core(r, m, t,
                                              config.localizer.icp)),
            static_argnums=())

    def add_data_batch(self, timestamp, world_frame_id: str,
                       T_world_robot: np.ndarray,      # [B, 4, 4]
                       T_robot_sensor: np.ndarray,     # [B, 4, 4] or [4, 4]
                       clouds: Sequence) -> None:
        """Feed one scan per agent; all ICP runs fuse into one dispatch."""
        del timestamp, world_frame_id
        B = self.n_agents
        if len(clouds) != B:
            raise ValueError(f"expected {B} clouds, got {len(clouds)}")
        T_world_robot = np.asarray(T_world_robot, np.float32)
        T_rs = np.asarray(T_robot_sensor, np.float32)
        if T_rs.ndim == 2:
            T_rs = np.broadcast_to(T_rs, (B, 4, 4))

        preps = []
        for b, loc in enumerate(self.localizers):
            cloud = clouds[b]
            if not isinstance(cloud, Cloud):
                cloud = make_cloud(np.asarray(cloud),
                                   capacity=self.config.sensor_cloud_capacity)
            preps.append(loc.prepare_scan(T_world_robot[b], T_rs[b], cloud))

        live = [b for b, p in enumerate(preps) if p is not None]
        if not live:
            return

        readings = stack_clouds([preps[b][0] for b in live])
        references = stack_clouds(
            [self.localizers[b].icp_engine.reference for b in live])
        T0s = jnp.stack([jnp.asarray(preps[b][1]) for b in live])
        if self.mesh is not None:
            from .batched import shard_batch
            put = shard_batch(self.mesh)
            readings, references, T0s = put((readings, references, T0s))
        results = self._batched_icp(readings, references, T0s)

        # Serialize graph-side updates in agent order (single writer).
        for i, b in enumerate(live):
            result_b = jax.tree_util.tree_map(lambda x: x[i], results)
            self.localizers[b].finish_scan(result_b, T_world_robot[b])

    # -- state access --------------------------------------------------------

    def poses(self) -> np.ndarray:
        """Current robot pose per agent [B, 4, 4]."""
        return np.stack([loc.T_world_robot for loc in self.localizers])

    def get_graph(self):
        return self.map_manager.get_graph()

    def trajectory(self) -> np.ndarray:
        g = self.map_manager.get_graph()
        return g.optimized_poses[:g.n_vertices].copy()

    def write_graphviz(self, path: str) -> None:
        self.map_manager.write_graphviz(path)

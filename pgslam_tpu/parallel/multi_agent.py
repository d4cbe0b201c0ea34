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

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

import functools

from ..cloud import Cloud, make_cloud, stack_clouds
from ..graph.pose_graph import MapManager
from ..localizer import Localizer
from ..loopcloser import LoopCloser
from ..optimizer import Optimizer
from ..slam import SlamConfig


@functools.partial(jax.jit, static_argnames=("chain",))
def _batched_prepare_reference(chain, clouds):
    """Fleet set_map: the reference filter chain vmapped over all changed
    local-map clouds, per-agent slices cut inside the jit (ONE dispatch
    instead of one ``prepare_reference`` + eager slices per agent). All
    padded batch entries are sliced — callers take the first k — so the
    jit cache is keyed on the padded shape, not the changed count."""
    from ..ops import filters as F
    refs = clouds
    if chain:
        key = jax.random.PRNGKey(0)
        refs = jax.vmap(lambda c: F.apply_chain(chain, c, key))(clouds)
    cut = lambda i: jax.tree_util.tree_map(lambda x: x[i], refs)
    return refs, [cut(i) for i in range(clouds.points.shape[0])]


@jax.jit
def _gather_fleet(readings_full, refs_full, idx):
    """Index the fleet's batched readings/references down to the live,
    padded agent order in one dispatch (replaces per-leaf eager
    ``jnp.stack`` of per-agent slices)."""
    take = lambda t: jax.tree_util.tree_map(lambda x: x[idx], t)
    return take(readings_full), take(refs_full)


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
            # Defer optimization-writeback resyncs (MT-flag semantics) so
            # the fleet batches all rebuilds in one dispatch per step.
            loc.defer_graph_resync = True
            self.map_manager.add_localizer(loc)
            self.localizers.append(loc)
        self.map_manager.set_loop_closer(self.loop_closer)
        # Queue + batch loop-closure verifications across the fleet, and
        # batch all accepted constraints into ONE optimization per step
        # (OptimizerMT.hpp:59-62 drain-all semantics).
        self.loop_closer.queue_mode = True
        self.loop_closer.batch_pad_to = n_agents
        self.optimizer.queue_mode = True
        # Fleet registration: with a (dp, tp) mesh the FULL icp_core
        # semantics run sharded — agents over dp, each reference's point
        # axis over tp (see parallel/sharded_icp.py); otherwise a plain
        # vmapped single-device dispatch.
        self._tp = (int(mesh.shape.get("tp", 1))
                    if mesh is not None else 1)
        if self._tp > 1:
            from .sharded_icp import make_sharded_register
            self._batched_icp = make_sharded_register(
                mesh, config.localizer.icp)
        else:
            # batched_register auto-routes eligible configs (p2plane,
            # exact-NN, trim/maxdist) to the fused whole-ICP kernel on
            # TPU; everything else runs the vmapped icp_core loop.
            from .batched import batched_register
            _icp_cfg = config.localizer.icp
            self._batched_icp = (
                lambda r, m, t: batched_register(r, m, t, _icp_cfg))
        # Fleet-stacked prepared references, rebuilt (one stack per leaf)
        # only when a composition/set_map changed some agent's reference.
        self._refs_stacked: Optional[Cloud] = None
        self._refs_dirty = True

    def prewarm(self) -> None:
        """One-time bring-up trace pre-warm of the DRAIN-time executables
        (VERDICT r4 item 6): the persistent XLA compile cache survives
        processes, but host TRACING does not (r3 profile: ~1.65 s
        trace+lower per shape on this host core), and the fleet's first
        loop-closure drain otherwise pays the verification + optimize
        traces inside the serving window. Dummy operands are built
        through the SAME call chains the drain uses (stack_clouds /
        batch_rebuild / jnp.asarray — jit cache keys on this stack
        include arg provenance beyond avals; BENCH_NOTES retrace trap).
        The scan-path executables are warmed by feeding real warm-up
        scans, which bring-up does anyway."""
        import os as _os

        from ..graph.pose_graph import MapManager as _MM
        from ..localmap import Composition, LocalMap, batch_rebuild
        from ..loopcloser import _verify_batch
        from ..ops import filters as F
        from ..ops.icp_pallas import fused_eligible
        from ..optimizer import Optimizer as _Opt

        lcfg = self.config.localizer
        ccfg = self.config.loop_closer
        cfg = ccfg.icp
        bucket = max(self.loop_closer.batch_pad_to, 1)

        # --- verification batch at the fleet's padded shape -------------
        dummy = make_cloud(np.zeros((4, 3), np.float32),
                           capacity=lcfg.keyframe_cloud_capacity)
        mm = _MM()
        v0 = mm.add_first_keyframe(dummy, np.eye(4, dtype=np.float32))
        lm = LocalMap(ccfg.candidate_local_map_size)
        lm.update_to_new_composition(
            mm.get_graph(),
            Composition(ccfg.candidate_local_map_size, [v0]), build=False)
        stacked_refs = batch_rebuild([lm], pad_to=bucket,
                                     return_stacked=True)
        readings = stack_clouds([dummy] * bucket)
        T0s = jnp.asarray(np.stack(
            [np.eye(4, dtype=np.float32)] * bucket))
        ref_chain = cfg.reference_filters
        if cfg.error == "point_to_plane" and not any(
                isinstance(f, F.SurfaceNormal) for f in ref_chain):
            if "normals" not in stacked_refs.descriptors:
                ref_chain = ref_chain + (F.SurfaceNormal(),)
        env = _os.environ.get("PGSLAM_FUSED_BATCHED", "")
        mode = {"1": "on", "0": "off"}.get(env, "auto")
        use_fused = fused_eligible(cfg) and (
            mode == "on"
            or (mode == "auto" and jax.default_backend() not in ("cpu",)))
        out = _verify_batch(readings, stacked_refs, T0s, cfg,
                            cfg.reading_filters, ref_chain, use_fused)
        jax.block_until_ready(jax.tree_util.tree_leaves(out)[0])

        # --- optimize at the first shape bucket (rebuild + delta) -------
        omm = _MM()
        opt = _Opt(omm, self.config.optimizer)
        omm.add_first_keyframe(dummy, np.eye(4, dtype=np.float32))
        cov = (np.eye(6) * 0.01).astype(np.float32)
        T = np.eye(4, dtype=np.float32)
        for i in range(1, 12):
            Ti = np.eye(4, dtype=np.float32)
            Ti[0, 3] = float(i)
            dT = np.eye(4, dtype=np.float32)
            dT[0, 3] = 1.0
            omm.graph.add_vertex(dummy, Ti, omm.now())
            omm.graph.add_edge(i - 1, i, dT, cov, 0)
        T18 = np.eye(4, dtype=np.float32)
        T18[0, 3] = 7.0
        opt.add_new_data(1, 8, T18, cov)   # first optimize: rebuild trace
        T29 = np.eye(4, dtype=np.float32)
        T29[0, 3] = 7.0
        opt.add_new_data(2, 9, T29, cov)   # second: the delta-step trace
        del T

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

        # Phase 0: flush deferred post-optimization resyncs (batched).
        resync = [loc for loc in self.localizers if loc._needs_resync]
        rebuilt = [loc for loc in resync
                   if loc.resync_from_graph(build=False)]
        self._batched_set_map(rebuilt)

        # Batched input preparation: ONE dispatch for the fleet's filter
        # chains + compaction + sensor transforms + reading filters, with
        # the per-agent slices cut inside the jit.
        from ..localizer import _prepare_input_batched
        raw = []
        for b in range(B):
            cloud = clouds[b]
            if not isinstance(cloud, Cloud):
                cloud = make_cloud(np.asarray(cloud),
                                   capacity=self.config.sensor_cloud_capacity)
            raw.append(cloud)
        seeds = np.asarray([loc.count for loc in self.localizers],
                           np.int32)
        lcfg = self.config.localizer
        _, readings_full, slices = _prepare_input_batched(
            lcfg.input_filters, lcfg.keyframe_cloud_capacity,
            stack_clouds(raw), jnp.asarray(T_rs), seeds,
            reading_chain=lcfg.icp.reading_filters)

        preps = []
        for b, loc in enumerate(self.localizers):
            cloud_b, reading_b = slices[b]
            preps.append(loc.prepare_scan(T_world_robot[b], T_rs[b],
                                          raw[b], prepared=cloud_b,
                                          reading=reading_b))

        live = [b for b, p in enumerate(preps) if p is not None]
        if not live:
            return

        # Pad the live set to the fleet size: one fixed batch shape (no
        # per-size recompiles) and divisibility by the mesh's dp axis.
        pad_ix = live + [live[0]] * (self.n_agents - len(live))
        all_have_refs = all(loc.icp_engine.reference is not None
                            for loc in self.localizers)
        if all_have_refs:
            if self._refs_dirty or self._refs_stacked is None:
                self._refs_stacked = stack_clouds(
                    [loc.icp_engine.reference for loc in self.localizers])
                self._refs_dirty = False
            readings, references = _gather_fleet(
                readings_full, self._refs_stacked,
                jnp.asarray(np.asarray(pad_ix, np.int32)))
        else:
            # Mixed first-scan step: some agents have no reference yet.
            readings = stack_clouds([preps[b][0] for b in pad_ix])
            references = stack_clouds(
                [self.localizers[b].icp_engine.reference for b in pad_ix])
        T0s = jnp.asarray(np.stack([np.asarray(preps[b][1])
                                    for b in pad_ix]))
        if self.mesh is not None and self._tp == 1:
            from .batched import shard_batch
            put = shard_batch(self.mesh)
            readings, references, T0s = put((readings, references, T0s))
        # ONE transfer for the whole fleet's results (sharded path: jit
        # reshards inputs to the shard_map's (dp, tp) specs itself).
        results = jax.device_get(self._batched_icp(readings, references,
                                                   T0s))
        results = jax.tree_util.tree_map(lambda x: x[:len(live)], results)

        # Phase 1: pose updates + collect neighbor-probe requests (host).
        live_locs = [self.localizers[b] for b in live]
        res_of = {}
        probe_req = {}
        for i, (b, loc) in enumerate(zip(live, live_locs)):
            result_b = jax.tree_util.tree_map(lambda x: x[i], results)
            res_of[b] = loc.begin_finish(result_b)
            comp = loc.neighbor_probe_request()
            if comp is not None:
                probe_req[b] = comp

        # Phase 2: ONE vmapped dispatch for all agents' overlap probes.
        probe_val = self._batched_probes(probe_req)

        # Phase 3: decisions + graph mutations, serialized in agent order
        # (single writer; keyframe insertions cascade into the shared
        # LoopCloser exactly as in the single-agent path).
        changed = []
        for b, loc in zip(live, live_locs):
            comp = probe_req.get(b)
            probe = (comp, probe_val.get(b)) if comp is not None \
                else (None, None)
            loc.decide_composition(res_of[b], neighbor_probe=probe)
            if loc.apply_composition(build=False):
                changed.append(loc)
            loc.last_input_T_world_robot = np.asarray(
                T_world_robot[b], np.float32)

        # Phase 4: ONE vmapped dispatch rebuilds all changed local maps,
        # one more applies the reference chain (fleet set_map).
        self._batched_set_map(changed)

        # Phase 5: fleet-fused loop-closure verification for the keyframes
        # spawned this step (queued by the shared LoopCloser), then ONE
        # optimization over every accepted constraint.
        self.loop_closer.process_pending_batched()
        self.optimizer.process_pending()

    def _batched_set_map(self, locs) -> None:
        """Rebuild changed local-map clouds (one vmapped dispatch) and
        install them as the agents' ICP references with the reference
        filter chain applied in ONE more dispatch (``ICPSequence.setMap``
        semantics for the whole fleet; per-agent ``finish_apply`` costs a
        chain dispatch + eager slices per agent on the relay)."""
        if not locs:
            return
        from ..localmap import batch_rebuild
        from ..ops import filters as F
        engine0 = locs[0].icp_engine
        if engine0.config.matcher == "grid":
            # Grid indices build per-agent; keep the engine's own path.
            batch_rebuild([loc.local_map for loc in locs],
                          pad_to=self.n_agents)
            for loc in locs:
                loc.finish_apply()
            self._refs_dirty = True
            return
        stacked = batch_rebuild([loc.local_map for loc in locs],
                                pad_to=self.n_agents, return_stacked=True)
        chain = engine0.config.reference_filters
        if engine0.config.error == "point_to_plane" and not any(
                isinstance(f, F.SurfaceNormal) for f in chain):
            if "normals" not in stacked.descriptors:
                chain = chain + (F.SurfaceNormal(),)
        _, ref_slices = _batched_prepare_reference(chain, stacked)
        for loc, ref in zip(locs, ref_slices):
            loc.icp_engine._reference = ref
            loc.icp_engine._index = None
        self._refs_dirty = True

    def _batched_probes(self, probe_req):
        """Evaluate all requested overlap probes in one device call.

        Candidate maps come from each agent's composition-keyed cache
        (:meth:`Localizer._cached_probe_map` — built + reference-filtered
        once per composition/pose change) and readings are the scans'
        already-prepared readings, so the steady-state step is ONE
        vmapped match dispatch instead of per-agent reading preps plus
        an in-graph stack + build + filter of every candidate map (the
        same two costs the single-agent path sheds; chip numbers in the
        probe-cache commit)."""
        if not probe_req:
            return {}
        from ..localizer import (_probe_build_batched,
                                 _probe_overlap_from_batched)
        from ..localmap import stack_compositions
        cfg = self.config.localizer.icp
        keys = list(probe_req.keys())
        locs = [self.localizers[b] for b in keys]
        # Build every probe-cache MISS in one vmapped dispatch (misses are
        # common while the fleet advances — compositions churn — and each
        # per-agent build costs ~6 eager relay ops).
        worlds = [loc._probe_cache_get(probe_req[b])
                  for b, loc in zip(keys, locs)]
        miss = [i for i, w in enumerate(worlds) if w is None]
        if miss:
            graph = self.map_manager.get_graph()
            # Pad to the fleet size: one fixed batch shape for the build.
            ids_list = [probe_req[keys[i]].as_list() for i in miss]
            ids_list += [ids_list[0]] * (self.n_agents - len(ids_list))
            (points, masks, descs, Ts, slot_valid, desc_keys,
             T_world_refs) = stack_compositions(
                graph, ids_list, probe_req[keys[miss[0]]].capacity)
            built = _probe_build_batched(
                points, masks, descs, Ts, slot_valid,
                jnp.asarray(T_world_refs), desc_keys,
                cfg.reference_filters)
            for i, world in zip(miss, built):
                worlds[i] = world
                locs[i]._probe_cache_put(probe_req[keys[i]], world)
        reading_list = [
            loc._last_reading if loc._last_reading is not None
            else loc.icp_engine.prepare_reading(loc.input_cloud)
            for loc in locs]
        # One fixed batch shape (see batch_rebuild).
        pad = self.n_agents - len(keys)
        worlds = stack_clouds(worlds + [worlds[0]] * pad)
        readings = stack_clouds(reading_list + [reading_list[0]] * pad)
        T_world_robots = jnp.stack(
            [jnp.asarray(loc.T_world_robot) for loc in locs]
            + [jnp.asarray(locs[0].T_world_robot)] * pad)
        ovs = _probe_overlap_from_batched(readings, worlds,
                                          T_world_robots, cfg)
        ovs = np.asarray(ovs)
        return {b: float(ovs[i]) for i, b in enumerate(keys)}

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

"""Unit tests for the Localizer's decision logic against handcrafted
graphs — pinning the subtle reference semantics (Localizer.hpp:393-483
neighbor-composition ordering, :214-221 closest-vertex swap)."""

import numpy as np
import pytest

from pgslam_tpu.cloud import make_cloud
from pgslam_tpu.graph.pose_graph import ODOM_CONSTRAINT, MapManager
from pgslam_tpu.localizer import Localizer, LocalizerConfig
from pgslam_tpu.localmap import Composition, LocalMap


def T_at(x, y=0.0):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [x, y, 0.0]
    return T


def build_chain(rng, positions):
    mm = MapManager()
    mm.add_first_keyframe(_cloud(rng), T_at(*positions[0]))
    for i in range(1, len(positions)):
        mm.graph.add_vertex(_cloud(rng), T_at(*positions[i]), mm.now())
        d = np.asarray(positions[i]) - np.asarray(positions[i - 1])
        mm.graph.add_edge(i - 1, i, T_at(*d), np.eye(6, dtype=np.float32),
                          ODOM_CONSTRAINT)
    return mm


def _cloud(rng):
    return make_cloud(rng.normal(size=(8, 3)).astype(np.float32),
                      capacity=8)


def make_localizer(mm, comp_ids, robot_xy):
    loc = Localizer(mm, LocalizerConfig(keyframe_cloud_capacity=8))
    loc.local_map = LocalMap.from_graph(mm.get_graph(),
                                        Composition(3, comp_ids))
    loc.T_world_robot = T_at(*robot_xy)
    return loc


def test_neighbor_composition_moving_forward(rng):
    # Chain 0-1-2-3-4 at x = 0,1,2,3,4. Local map = [0,1,2], robot at 2.9:
    # the closest adjacent vertex is 3; the farthest of the extended
    # composition (0) must be evicted, reference = closest to robot.
    mm = build_chain(rng, [(0,), (1,), (2,), (3,), (4,)])
    loc = make_localizer(mm, [0, 1, 2], (2.9,))
    comp, found = loc.find_neighbor_local_map_composition()
    assert found
    assert comp.as_list() == [1, 2, 3]
    assert comp.back() == 3        # nearest to robot -> reference


def test_neighbor_composition_moving_backward(rng):
    # Robot moved back toward 0: local map [2,3,4], closest adjacent is 1.
    mm = build_chain(rng, [(0,), (1,), (2,), (3,), (4,)])
    loc = make_localizer(mm, [2, 3, 4], (1.9,))
    comp, found = loc.find_neighbor_local_map_composition()
    assert found
    # Extended comp {2,3,4,1}; 4 is farthest (evicted); nearest (2) last.
    assert comp.as_list() == [3, 1, 2]
    assert comp.back() == 2


def test_neighbor_composition_none_when_isolated(rng):
    mm = build_chain(rng, [(0,), (1,), (2,)])
    loc = make_localizer(mm, [0, 1, 2], (1.0,))
    comp, found = loc.find_neighbor_local_map_composition()
    assert not found and comp is None


def test_closest_vertex_swap_changes_reference(rng):
    # Good overlap, no neighbor improvement: composition re-references on
    # the closest vertex by swapping it with the current reference
    # (Localizer.hpp:214-221).
    mm = build_chain(rng, [(0,), (1,), (2,)])
    loc = make_localizer(mm, [0, 1, 2], (0.1,))   # robot near vertex 0
    loc.next_composition = loc.local_map.get_composition()

    class Result:
        overlap = np.float32(0.95)
        T = np.eye(4, dtype=np.float32)
        cov = np.eye(6, dtype=np.float32)
        diverged = np.bool_(False)

    # No adjacent vertices outside the map -> neighbor search fails,
    # falls to the swap branch.
    loc.T_refkf_robot = np.asarray(
        np.linalg.inv(T_at(2.0)) @ T_at(0.1), np.float32)
    loc.update_after_icp(Result())
    comp = loc.local_map.get_composition().as_list()
    assert comp[-1] == 0           # closest became the reference
    assert set(comp) == {0, 1, 2}  # same vertex set


def test_first_cloud_bootstraps(rng):
    mm = MapManager()
    loc = Localizer(mm, LocalizerConfig(keyframe_cloud_capacity=8))
    loc.process_data(T_at(5.0), np.eye(4, dtype=np.float32), _cloud(rng))
    assert mm.get_graph().n_vertices == 1
    assert loc.local_map.has_cloud()
    np.testing.assert_allclose(loc.T_world_robot, T_at(5.0))
    np.testing.assert_allclose(loc.T_refkf_robot, np.eye(4))

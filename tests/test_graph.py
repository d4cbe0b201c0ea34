import numpy as np
import jax.numpy as jnp

from pgslam_tpu import se3
from pgslam_tpu.cloud import make_cloud
from pgslam_tpu.graph.pose_graph import (LOOP_CONSTRAINT, ODOM_CONSTRAINT,
                                         MapManager, PoseGraph)
from pgslam_tpu.graph.shortest_path import (bellman_ford, candidate_composition,
                                            dense_adjacency, dijkstra)
from pgslam_tpu.localmap import Composition, LocalMap


def tiny_cloud(rng, n=16):
    return make_cloud(rng.normal(size=(n, 3)).astype(np.float32), capacity=16)


def T_at(x, y=0.0, z=0.0):
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [x, y, z]
    return T


def chain_manager(rng, n=5, spacing=1.0):
    mm = MapManager()
    mm.add_first_keyframe(tiny_cloud(rng), T_at(0.0))
    for i in range(1, n):
        mm.graph.add_vertex(tiny_cloud(rng), T_at(i * spacing), mm.now())
        mm.graph.add_edge(i - 1, i, T_at(spacing), np.eye(6, dtype=np.float32),
                          ODOM_CONSTRAINT)
    return mm


def test_map_manager_basic(rng):
    mm = chain_manager(rng, 5)
    g = mm.graph
    assert g.n_vertices == 5 and g.n_edges == 4
    assert mm.get_fixed_vertex() == 0
    assert np.allclose(g.edge_weight[:4], 1.0)  # translation norm
    assert list(g.adjacent_vertices(2)) == [1, 3]
    kf = g.keyframe(3)
    assert kf.id == 3
    np.testing.assert_allclose(kf.optimized_T_world_kf, T_at(3.0))


def test_add_new_keyframe_notifies_loop_closer(rng):
    calls = []

    class FakeLoopCloser:
        def add_new_vertex(self, v):
            calls.append(v)

    mm = MapManager()
    mm.set_loop_closer(FakeLoopCloser())
    mm.add_first_keyframe(tiny_cloud(rng), T_at(0.0))
    v = mm.add_new_keyframe(0, T_at(1.0), T_at(1.0),
                            np.eye(6, dtype=np.float32), tiny_cloud(rng))
    assert v == 1 and calls == [1]


def test_duplicate_edge_raises(rng):
    mm = chain_manager(rng, 3)
    try:
        mm.graph.add_edge(0, 1, T_at(1.0), np.eye(6), ODOM_CONSTRAINT)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_graph_growth(rng):
    mm = MapManager()
    mm.add_first_keyframe(tiny_cloud(rng), T_at(0.0))
    for i in range(1, 100):
        mm.graph.add_vertex(tiny_cloud(rng), T_at(float(i)), mm.now())
        mm.graph.add_edge(i - 1, i, T_at(1.0), np.eye(6), ODOM_CONSTRAINT)
    assert mm.graph.n_vertices == 100
    np.testing.assert_allclose(mm.graph.optimized_poses[99], T_at(99.0))


def test_dijkstra_chain(rng):
    mm = chain_manager(rng, 6, spacing=2.0)
    g = mm.graph
    dists, settled = dijkstra(g.n_vertices, g.edge_from[:g.n_edges],
                              g.edge_to[:g.n_edges],
                              g.edge_weight[:g.n_edges], 0)
    np.testing.assert_allclose(dists, [0, 2, 4, 6, 8, 10])
    assert settled == [0, 1, 2, 3, 4, 5]


def test_dijkstra_with_suppression(rng):
    # ring 0-1-2-3-0; suppress edge 3-0 -> dist(0,3) becomes 3 hops
    mm = chain_manager(rng, 4)
    g = mm.graph
    g.add_edge(3, 0, T_at(1.0), np.eye(6), LOOP_CONSTRAINT)
    e = g.n_edges
    dists, _ = dijkstra(g.n_vertices, g.edge_from[:e], g.edge_to[:e],
                        g.edge_weight[:e], 0)
    assert np.isclose(dists[3], 1.0)  # via the loop edge
    edge_ok = g.edge_type[:e] != LOOP_CONSTRAINT
    dists2, _ = dijkstra(g.n_vertices, g.edge_from[:e], g.edge_to[:e],
                         g.edge_weight[:e], 0, edge_ok=edge_ok)
    assert np.isclose(dists2[3], 3.0)


def test_candidate_composition_order(rng):
    mm = chain_manager(rng, 6)
    g = mm.graph
    e = g.n_edges
    comp = candidate_composition(g.n_vertices, g.edge_from[:e], g.edge_to[:e],
                                 g.edge_weight[:e], candidate=2, size=3,
                                 vertex_ok=None, edge_ok=None)
    # candidate settles first, then its neighbors; candidate must be LAST
    assert comp[-1] == 2
    assert set(comp) <= {0, 1, 2, 3}
    assert len(comp) == 3


def test_bellman_ford_matches_dijkstra(rng):
    mm = chain_manager(rng, 8, spacing=1.5)
    g = mm.graph
    e = g.n_edges
    W = dense_adjacency(g.n_vertices, jnp.asarray(g.edge_from[:e]),
                        jnp.asarray(g.edge_to[:e]),
                        jnp.asarray(g.edge_weight[:e]),
                        jnp.ones(e, bool))
    d_bf = np.asarray(bellman_ford(W, jnp.int32(0)))
    d_dj, _ = dijkstra(g.n_vertices, g.edge_from[:e], g.edge_to[:e],
                       g.edge_weight[:e], 0)
    np.testing.assert_allclose(d_bf, d_dj, rtol=1e-5)


def test_composition_ring_buffer():
    c = Composition(3)
    for v in [10, 11, 12, 13]:
        c.push_back(v)
    assert c.as_list() == [11, 12, 13]
    assert c.back() == 13
    assert 10 not in c and 11 in c


def test_localmap_build_and_staleness(rng):
    mm = chain_manager(rng, 4)
    comp = Composition(3, [1, 2, 3])
    lm = LocalMap.from_graph(mm.graph, comp)
    assert lm.reference_vertex() == 3
    assert lm.has_cloud()
    cloud = lm.cloud()
    assert cloud.capacity == 3 * 16
    assert int(cloud.count()) == 3 * 16
    # points of the reference kf appear unmoved (identity transform)
    ref_pts = np.asarray(mm.graph.clouds[3].points)
    built = np.asarray(cloud.points)[2 * 16: 3 * 16]
    np.testing.assert_allclose(built, ref_pts, atol=1e-5)
    # staleness
    assert not lm.is_outdated(mm.graph)
    mm.update_keyframe_transform(2, T_at(2.5), mm.now())
    assert lm.is_outdated(mm.graph)
    assert not lm.is_reference_keyframe_outdated(mm.graph)
    lm.update_from_graph(mm.graph)
    assert not lm.is_outdated(mm.graph)


def test_localmap_cloud_in_refkf_frame(rng):
    # Two keyframes 1 m apart, identical local clouds -> in refkf frame the
    # non-ref cloud must be shifted by -1 in x... actually by T_ref^-1 T_kf.
    mm = chain_manager(rng, 2)
    pts = np.zeros((16, 3), np.float32)
    mm.graph.clouds[0] = make_cloud(pts, capacity=16)
    mm.graph.clouds[1] = make_cloud(pts, capacity=16)
    lm = LocalMap.from_graph(mm.graph, Composition(2, [0, 1]))
    built = np.asarray(lm.cloud().points)
    # slot 0 = vertex 0 cloud, transformed by T_ref^-1 T_0 = translate -1 x
    np.testing.assert_allclose(built[:16, 0], -1.0, atol=1e-5)
    np.testing.assert_allclose(built[16:32, 0], 0.0, atol=1e-5)
    # world frame: ref kf at x=1 -> all points shift +1
    world = np.asarray(lm.cloud_in_world_frame().points)
    np.testing.assert_allclose(world[:16, 0], 0.0, atol=1e-5)


def test_localmap_composition_compare(rng):
    mm = chain_manager(rng, 4)
    lm = LocalMap.from_graph(mm.graph, Composition(3, [1, 2, 3]))
    assert lm.has_same_composition(Composition(3, [2, 1, 3]))
    assert not lm.has_same_composition(Composition(3, [1, 3, 2]))  # diff ref
    assert not lm.has_same_composition(Composition(3, [0, 2, 3]))  # diff set
    assert lm.find_closest_vertex(T_at(2.9)) == 3
    assert lm.find_closest_vertex(T_at(1.2)) == 1


def test_write_graphviz(tmp_path, rng):
    mm = chain_manager(rng, 3)
    mm.graph.add_edge(2, 0, T_at(1.0), np.eye(6), LOOP_CONSTRAINT)
    path = tmp_path / "g.dot"
    mm.write_graphviz(str(path))
    text = path.read_text()
    assert "graph G {" in text and "0--1" in text and "2--0" in text

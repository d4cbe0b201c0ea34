import jax.numpy as jnp
import numpy as np

from pgslam_tpu import se3
from pgslam_tpu.optim.pgo import PGOConfig, optimize_pose_graph


def _pad(arr, n, shape_tail):
    out = np.zeros((n,) + shape_tail, np.float32)
    out[:len(arr)] = arr
    return jnp.asarray(out)


def make_problem(poses, edges, V_pad=None, E_pad=None):
    """edges: list of (i, j, T_meas [4,4], cov [6,6])"""
    V = V_pad or len(poses)
    E = E_pad or len(edges)
    vmask = jnp.arange(V) < len(poses)
    emask = jnp.arange(E) < len(edges)
    ef = np.zeros(E, np.int32)
    et = np.zeros(E, np.int32)
    eT = np.tile(np.eye(4, dtype=np.float32), (E, 1, 1))
    ec = np.tile(np.eye(6, dtype=np.float32), (E, 1, 1))
    for k, (i, j, T, c) in enumerate(edges):
        ef[k], et[k], eT[k], ec[k] = i, j, T, c
    P = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    P[:len(poses)] = poses
    return (jnp.asarray(P), vmask, jnp.asarray(ef), jnp.asarray(et),
            jnp.asarray(eT), jnp.asarray(ec), emask, jnp.int32(0))


def relpose(Ti, Tj):
    return np.asarray(se3.inverse(jnp.asarray(Ti)) @ jnp.asarray(Tj))


def square_trajectory(noise=0.0, rng=None):
    """4 poses on a unit square with perfect odometry + loop edge."""
    true = []
    for k, (x, y) in enumerate([(0, 0), (1, 0), (1, 1), (0, 1)]):
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [x, y, 0]
        true.append(T)
    cov = (np.eye(6) * 0.01).astype(np.float32)
    edges = []
    for i in range(3):
        edges.append((i, i + 1, relpose(true[i], true[i + 1]), cov))
    edges.append((3, 0, relpose(true[3], true[0]), cov))
    init = [t.copy() for t in true]
    if rng is not None and noise > 0:
        for i in range(1, 4):
            tw = rng.normal(size=6).astype(np.float32) * noise
            init[i] = np.asarray(jnp.asarray(init[i]) @ se3.exp(jnp.asarray(tw)))
    return true, init, edges


def test_noise_free_square_stays_put(rng):
    true, init, edges = square_trajectory()
    args = make_problem(init, edges)
    out, stats = optimize_pose_graph(*args, config=PGOConfig())
    for i in range(4):
        np.testing.assert_allclose(np.asarray(out)[i], true[i], atol=1e-4)
    assert float(stats["final_cost"]) < 1e-6


def test_perturbed_square_recovers(rng):
    true, init, edges = square_trajectory(noise=0.1, rng=rng)
    args = make_problem(init, edges)
    out, stats = optimize_pose_graph(*args)
    out = np.asarray(out)
    for i in range(4):
        err = np.asarray(se3.log(
            se3.inverse(jnp.asarray(out[i])) @ jnp.asarray(true[i])))
        assert np.linalg.norm(err) < 1e-3, f"pose {i} err {err}"
    assert float(stats["final_cost"]) < 1e-5 * float(stats["initial_cost"]) \
        or float(stats["final_cost"]) < 1e-6


def test_padding_invariance(rng):
    true, init, edges = square_trajectory(noise=0.05, rng=rng)
    out1, _ = optimize_pose_graph(*make_problem(init, edges))
    out2, _ = optimize_pose_graph(*make_problem(init, edges, V_pad=16,
                                                E_pad=32))
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2)[:4],
                               atol=1e-4)


def test_anchor_stays_fixed(rng):
    true, init, edges = square_trajectory(noise=0.2, rng=rng)
    out, _ = optimize_pose_graph(*make_problem(init, edges))
    np.testing.assert_allclose(np.asarray(out)[0], init[0], atol=1e-4)


def test_loop_drift_correction(rng):
    """Odometry drifts; loop edge snaps the ring back (config-3 analog)."""
    n = 20
    radius = 5.0
    true = []
    for k in range(n):
        a = 2 * np.pi * k / n
        T = np.asarray(se3.exp(jnp.asarray(
            [radius * np.cos(a), radius * np.sin(a), 0, 0, 0, a],
            jnp.float32)))
        true.append(np.asarray(T, np.float32))
    cov = (np.eye(6) * 0.01).astype(np.float32)
    edges = []
    init = [true[0]]
    drift = se3.exp(jnp.asarray([0.02, 0.01, 0, 0, 0, 0.004], jnp.float32))
    for i in range(1, n):
        meas = jnp.asarray(relpose(true[i - 1], true[i])) @ drift
        edges.append((i - 1, i, np.asarray(meas), cov))
        init.append(np.asarray(jnp.asarray(init[-1]) @ meas))
    # exact loop closure 19 -> 0
    edges.append((n - 1, 0, relpose(true[n - 1], true[0]),
                  (np.eye(6) * 1e-4).astype(np.float32)))
    out, stats = optimize_pose_graph(*make_problem(init, edges))
    out = np.asarray(out)
    # Drifted init should end far from truth; optimized must be closer.
    init_err = np.linalg.norm(init[-1][:3, 3] - true[-1][:3, 3])
    opt_err = np.linalg.norm(out[-1][:3, 3] - true[-1][:3, 3])
    assert opt_err < 0.3 * init_err
    assert float(stats["final_cost"]) < float(stats["initial_cost"])


def test_disconnected_components_stay_bounded(rng):
    """A component without the anchor has gauge freedom; damped LM must
    leave consistent (zero-residual) poses where they are, not drift."""
    # Two 3-pose chains, no connection; anchor in component 0.
    poses = [np.eye(4, dtype=np.float32) for _ in range(6)]
    for i in range(6):
        poses[i] = poses[i].copy()
        poses[i][0, 3] = float(i)
    cov = (np.eye(6) * 0.01).astype(np.float32)
    edges = [(0, 1, relpose(poses[0], poses[1]), cov),
             (1, 2, relpose(poses[1], poses[2]), cov),
             (3, 4, relpose(poses[3], poses[4]), cov),
             (4, 5, relpose(poses[4], poses[5]), cov)]
    out, stats = optimize_pose_graph(*make_problem(poses, edges))
    out = np.asarray(out)
    for i in range(6):
        np.testing.assert_allclose(out[i], poses[i], atol=1e-3)


def test_pose_marginals_chain_uncertainty_grows():
    """Dense marginals: anchor is pinned by the prior; uncertainty
    accumulates with graph distance from it; the block-diagonal
    (conditional) covariance never exceeds the true marginal."""
    import jax
    import jax.numpy as jnp

    from pgslam_tpu import se3
    from pgslam_tpu.optim.pgo import pose_marginals

    V = 6
    poses = np.tile(np.eye(4, dtype=np.float32), (V, 1, 1))
    poses[:, 0, 3] = np.arange(V, dtype=np.float32)
    ef = np.arange(V - 1, dtype=np.int32)
    et = ef + 1
    Ts = np.einsum("eij,ejk->eik", np.linalg.inv(poses[ef]), poses[et])
    covs = np.tile((np.eye(6, dtype=np.float32) * 0.01), (V - 1, 1, 1))
    vmask = np.ones(V, bool)
    emask = np.ones(V - 1, bool)
    args = (jnp.asarray(poses), jnp.asarray(vmask), jnp.asarray(ef),
            jnp.asarray(et), jnp.asarray(Ts.astype(np.float32)),
            jnp.asarray(covs), jnp.asarray(emask), jnp.int32(0))
    dense = np.asarray(pose_marginals(*args, method="dense"))
    bd = np.asarray(pose_marginals(*args, method="block_diag"))
    tr = np.trace(dense, axis1=1, axis2=2)
    # anchor pinned to the prior scale
    assert tr[0] < 1e-8
    # strictly growing uncertainty down the chain
    assert np.all(np.diff(tr) > 0)
    # chain tail accumulates ~k * edge covariance
    np.testing.assert_allclose(tr[1], 0.06, rtol=0.15)
    # conditional (block-diag) covariance <= marginal, interior vertices
    tr_bd = np.trace(bd, axis1=1, axis2=2)
    assert np.all(tr_bd[1:-1] <= tr[1:-1] + 1e-9)
    # symmetric SPD blocks
    np.testing.assert_allclose(dense, np.swapaxes(dense, 1, 2), atol=1e-7)

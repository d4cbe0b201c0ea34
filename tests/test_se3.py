import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pgslam_tpu import se3


def random_twists(rng, n, scale_t=1.0, scale_r=1.0):
    v = rng.normal(size=(n, 3)) * scale_t
    w = rng.normal(size=(n, 3)) * scale_r
    return jnp.asarray(np.concatenate([v, w], axis=-1), jnp.float32)


def test_exp_log_roundtrip(rng):
    tw = random_twists(rng, 64, scale_r=0.8)
    T = se3.exp(tw)
    back = se3.log(T)
    np.testing.assert_allclose(np.asarray(back), np.asarray(tw),
                               rtol=1e-4, atol=1e-4)


def test_exp_small_angle(rng):
    tw = random_twists(rng, 16, scale_r=1e-9)
    T = se3.exp(tw)
    assert np.all(np.isfinite(np.asarray(T)))
    np.testing.assert_allclose(np.asarray(se3.log(T)), np.asarray(tw),
                               atol=1e-6)


def test_log_near_pi(rng):
    # Rotation by exactly pi around a random axis.
    axis = rng.normal(size=(8, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    w = jnp.asarray(axis * np.pi, jnp.float32)
    R = se3.exp_so3(w)
    w_back = se3.log_so3(R)
    # log may return +/- the axis at pi; compare rotations instead.
    R_back = se3.exp_so3(w_back)
    np.testing.assert_allclose(np.asarray(R_back), np.asarray(R), atol=1e-4)


def test_inverse_compose(rng):
    tw = random_twists(rng, 32)
    T = se3.exp(tw)
    I = se3.inverse(T) @ T
    np.testing.assert_allclose(np.asarray(I),
                               np.broadcast_to(np.eye(4), I.shape),
                               atol=1e-5)


def test_apply_matches_homogeneous(rng):
    T = se3.exp(random_twists(rng, 1))[0]
    pts = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
    out = se3.apply(T, pts)
    hom = np.concatenate([np.asarray(pts), np.ones((100, 1))], axis=-1)
    expected = (np.asarray(T) @ hom.T).T[:, :3]
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_adjoint_property(rng):
    # Ad(T) log(X) == log(T X T^-1)
    T = se3.exp(random_twists(rng, 1, scale_r=0.5))[0]
    xi = random_twists(rng, 1, scale_t=0.1, scale_r=0.1)[0]
    lhs = se3.adjoint(T) @ xi
    rhs = se3.log(T @ se3.exp(xi) @ se3.inverse(T))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs),
                               rtol=1e-3, atol=1e-4)


def test_rotation_angle_translation_norm(rng):
    tw = np.zeros((6,), np.float32)
    tw[:3] = [3.0, 4.0, 0.0]
    T = se3.exp(jnp.asarray(tw))
    assert np.isclose(float(se3.translation_norm(T)), 5.0, atol=1e-5)
    assert np.isclose(float(se3.rotation_angle(T)), 0.0, atol=1e-5)


def test_normalize_rotation(rng):
    T = se3.exp(random_twists(rng, 4))
    T_noisy = T.at[..., :3, :3].add(
        jnp.asarray(rng.normal(size=(4, 3, 3)) * 1e-3, jnp.float32))
    Tn = se3.normalize_rotation(T_noisy)
    R = np.asarray(Tn)[..., :3, :3]
    eye = np.einsum("bij,bkj->bik", R, R)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)


def test_jit_and_vmap():
    tw = jnp.zeros((5, 6)).at[:, 0].set(jnp.arange(5.0))
    T = jax.jit(se3.exp)(tw)
    logs = jax.vmap(se3.log)(T)
    np.testing.assert_allclose(np.asarray(logs), np.asarray(tw), atol=1e-6)

"""Unit tests for core math / quaternion / RNG helpers vs numpy oracles."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobbyraytracer_tpu.core import mathx, quat, rng


def test_reflect_matches_glm():
    i = jnp.array([[1.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = mathx.reflect(i, n)
    np.testing.assert_allclose(out, [[1.0, 1.0, 0.0]], atol=1e-6)


def test_refract_snell():
    # straight-through at eta=1
    i = jnp.array([[0.0, -1.0, 0.0]])
    n = jnp.array([[0.0, 1.0, 0.0]])
    out = mathx.refract(i, n, jnp.array([1.0]))
    np.testing.assert_allclose(out, i, atol=1e-6)
    # total internal reflection -> zero vector (glm behavior)
    i2 = mathx.normalize(jnp.array([[1.0, -0.05, 0.0]]))
    out2 = mathx.refract(i2, n, jnp.array([2.5]))
    np.testing.assert_allclose(out2, [[0.0, 0.0, 0.0]], atol=1e-6)


def test_schlick_limits():
    # normal incidence: r0 = ((1-n)/(1+n))^2
    r = mathx.schlick(jnp.float32(1.0), jnp.float32(1.5))
    np.testing.assert_allclose(r, ((1 - 1.5) / (1 + 1.5)) ** 2, rtol=1e-5)
    # grazing: -> 1
    r = mathx.schlick(jnp.float32(0.0), jnp.float32(1.5))
    np.testing.assert_allclose(r, 1.0, rtol=1e-5)


def test_near_zero():
    v = jnp.array([[1e-9, 1e-9, 1e-9], [1e-3, 0.0, 0.0]])
    np.testing.assert_array_equal(mathx.near_zero(v), [True, False])


def test_quat_euler_axis_rotations():
    # 90 deg about Y: x axis -> -z  (right-handed)
    q = quat.from_euler(jnp.array([0.0, np.pi / 2, 0.0]))
    v = quat.rotate(q, jnp.array([1.0, 0.0, 0.0]))
    np.testing.assert_allclose(v, [0.0, 0.0, -1.0], atol=1e-6)
    # 180 deg about Y: z -> -z
    q = quat.from_euler(jnp.array([0.0, np.pi, 0.0]))
    v = quat.rotate(q, jnp.array([0.0, 0.0, 1.0]))
    np.testing.assert_allclose(v, [0.0, 0.0, -1.0], atol=1e-6)


def test_quat_inverse_roundtrip():
    key = jax.random.PRNGKey(0)
    e = jax.random.uniform(key, (16, 3), minval=-3.0, maxval=3.0)
    q = quat.from_euler(e)
    v = jax.random.normal(jax.random.PRNGKey(1), (16, 3))
    back = quat.inverse_rotate(q, quat.rotate(q, v))
    np.testing.assert_allclose(back, v, atol=1e-5)


@pytest.mark.parametrize("fn,checks", [
    (rng.unit_sphere, "surface"),
    (rng.in_ball, "ball"),
])
def test_sphere_ball_distributions(fn, checks):
    key = jax.random.PRNGKey(42)
    pts = fn(key, (20000,))
    r = np.linalg.norm(np.asarray(pts), axis=-1)
    if checks == "surface":
        np.testing.assert_allclose(r, 1.0, atol=1e-5)
    else:
        assert r.max() <= 1.0 + 1e-5
        # E[r] for uniform ball = 3/4
        np.testing.assert_allclose(r.mean(), 0.75, atol=0.01)
    # mean should be ~0 (symmetric)
    np.testing.assert_allclose(np.asarray(pts).mean(axis=0), 0.0, atol=0.02)


def test_uniform_range():
    u = rng.uniform(jax.random.PRNGKey(3), (10000,))
    assert float(u.min()) >= 0.0 and float(u.max()) < 1.0
    np.testing.assert_allclose(float(u.mean()), 0.5, atol=0.02)

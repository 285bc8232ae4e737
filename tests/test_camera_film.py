"""Camera ray-gen and film tonemap vs scalar oracles
(reference: camera.h:9-39, film.cpp:25-52)."""
import jax.numpy as jnp
import numpy as np

from hobbyraytracer_tpu.ops import camera as cam_ops
from hobbyraytracer_tpu.ops import film as film_ops


def _oracle_camera(look_from, look_at, up, vfov, aspect, focus):
    theta = np.radians(vfov)
    h = np.tan(theta / 2)
    vh = 2.0 * h
    vw = aspect * vh
    w = look_from - look_at
    w = w / np.linalg.norm(w)
    u = np.cross(up, w); u = u / np.linalg.norm(u)
    v = np.cross(w, u)
    horizontal = focus * vw * u
    vertical = focus * vh * v
    llc = look_from - horizontal / 2 - vertical / 2 - focus * w
    return llc, horizontal, vertical


def test_camera_rays_match_oracle():
    lf = np.array([0.0, 2.5, 8.5], np.float32)
    la = np.array([0.0, 2.5, 0.0], np.float32)
    up = np.array([0.0, 1.0, 0.0], np.float32)
    cam = cam_ops.make_camera(lf, la, up, 45.0, 1.0, 0.001, 8.5)
    llc, horiz, vert = _oracle_camera(lf, la, up, 45.0, 1.0, 8.5)

    s = jnp.array([0.0, 0.5, 1.0, 0.25])
    t = jnp.array([0.0, 0.5, 1.0, 0.75])
    rays = cam_ops.get_rays(cam, s, t)
    np.testing.assert_allclose(rays.o, np.tile(lf, (4, 1)), atol=1e-6)
    expect_d = (llc[None] + np.asarray(s)[:, None] * horiz[None]
                + np.asarray(t)[:, None] * vert[None] - lf[None])
    np.testing.assert_allclose(rays.d, expect_d, atol=1e-5)


def _oracle_tonemap(c):
    c = np.where(np.isnan(c), 0.0, c)
    a, b, cc, d, e = 2.51, 0.03, 2.43, 0.59, 0.14
    c = (c * (a * c + b)) / (c * (cc * c + d) + e)
    return np.sqrt(np.clip(c, 0.0, 1.0))


def test_tonemap_matches_oracle_and_scrubs_nan():
    x = np.array([[0.0, 0.18, 1.0], [4.0, np.nan, 0.5]], np.float32)
    out = np.asarray(film_ops.tonemap(jnp.asarray(x)))
    np.testing.assert_allclose(out, _oracle_tonemap(x), rtol=1e-5)
    assert not np.isnan(out).any()


def test_quantize_matches_reference():
    c = np.array([0.0, 0.5, 0.9999, 1.0, 2.0], np.float32)
    q = film_ops.quantize(c)
    # 256*clamp(c,0,0.9999) truncated (film.cpp:27-29)
    np.testing.assert_array_equal(q, [0, 128, 255, 255, 255])

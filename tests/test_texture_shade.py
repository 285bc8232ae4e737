"""Texture lookups and material scatter vs reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np

from hobbyraytracer_tpu.core.types import Hits, Rays
from hobbyraytracer_tpu.ops import shade, texture


def _tab():
    img = np.zeros((2, 4, 3), np.float32)
    img[0, :, 0] = [0.1, 0.2, 0.3, 0.4]  # top row red ramp
    img[1, :, 1] = 1.0                   # bottom row green
    return texture.build_table([
        {"type": texture.TEX_SOLID, "solid": (0.2, 0.4, 0.6)},
        {"type": texture.TEX_CHECKERED, "solid": (1, 1, 1),
         "solid2": (0, 0, 0)},
        {"type": texture.TEX_IMAGE, "image": img},
        {"type": texture.TEX_ENVIRONMENT, "image": img},
        {"type": texture.TEX_IMAGE, "image": None},  # missing -> cyan
    ])


def _lookup(tab, tid, u, v, p=(0.0, 0.0, 0.0)):
    return np.asarray(texture.colour_value(
        tab, jnp.asarray([tid], jnp.int32), jnp.asarray([u], jnp.float32),
        jnp.asarray([v], jnp.float32), jnp.asarray([p], jnp.float32)))[0]


def test_solid_and_checkered():
    tab = _tab()
    np.testing.assert_allclose(_lookup(tab, 0, 0.3, 0.7), [0.2, 0.4, 0.6])
    # checkered: sin(10*0.05)^3 > 0 -> even (white);
    # p=(0.2,0.05,0.05): sin(2)>0,sin(.5)>0 -> even
    np.testing.assert_allclose(
        _lookup(tab, 1, 0, 0, (0.05, 0.05, 0.05)), [1, 1, 1])
    # flip one sign: sin(10*-0.05)<0 -> odd (black)
    np.testing.assert_allclose(
        _lookup(tab, 1, 0, 0, (-0.05, 0.05, 0.05)), [0, 0, 0])


def test_image_lookup_v_flip_and_nearest():
    tab = _tab()
    # v=1 -> flipped to image row 0 (top); u=0.6 -> col int(0.6*4)=2
    np.testing.assert_allclose(_lookup(tab, 2, 0.6, 1.0), [0.3, 0, 0],
                               atol=1e-6)
    # v=0 -> image row 1 (bottom): green
    np.testing.assert_allclose(_lookup(tab, 2, 0.1, 0.0), [0, 1, 0],
                               atol=1e-6)


def test_environment_no_flip_rounding():
    tab = _tab()
    # env: i = int(u*(w-1)+0.5) -> u=0.5 -> int(2.0)=2 ; v=0 -> row 0
    np.testing.assert_allclose(_lookup(tab, 3, 0.5, 0.0), [0.3, 0, 0],
                               atol=1e-6)
    # v=1 -> row 1 (no flip): green
    np.testing.assert_allclose(_lookup(tab, 3, 0.0, 1.0), [0, 1, 0],
                               atol=1e-6)


def test_missing_image_is_cyan():
    tab = _tab()
    np.testing.assert_allclose(_lookup(tab, 4, 0.5, 0.5), [0, 1, 1])


def _mats():
    return shade.build_table([
        {"mtype": shade.MAT_LAMBERTIAN, "albedo": (0.7, 0.2, 0.1)},   # 0
        {"mtype": shade.MAT_METAL, "albedo": (0.9, 0.9, 0.9),
         "roughness": 0.0},                                            # 1
        {"mtype": shade.MAT_DIELECTRIC, "ior": 1.5},                   # 2
        {"mtype": shade.MAT_DIFFUSE_LIGHT, "albedo": (1.0, 0.5, 0.25),
         "strength": 4.0},                                             # 3
        {"mtype": shade.MAT_ISOTROPIC, "albedo": (0.3, 0.3, 0.3)},     # 4
    ])


def _hits(n, mat_id, normal=(0, 1, 0), front=True):
    return Hits(
        hit=jnp.ones((n,), jnp.bool_),
        t=jnp.ones((n,), jnp.float32),
        p=jnp.zeros((n, 3), jnp.float32),
        normal=jnp.broadcast_to(jnp.asarray(normal, jnp.float32), (n, 3)),
        uv=jnp.zeros((n, 2), jnp.float32),
        front_face=jnp.full((n,), front),
        mat_id=jnp.full((n,), mat_id, jnp.int32),
    )


def _rays_down(n):
    return Rays(o=jnp.zeros((n, 3)) + jnp.asarray([0, 1, 0.0]),
                d=jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3)))


def test_lambertian_scatter_distribution():
    n = 4000
    mats, tab = _mats(), texture.white_table()
    ok, att, d = shade.scatter(mats, tab, _rays_down(n), _hits(n, 0),
                               jax.random.PRNGKey(0), 0)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(att[0], [0.7, 0.2, 0.1], atol=1e-6)
    d = np.asarray(d)
    # dir = n + unit_sphere: mean ~ n, |d - n| == 1
    np.testing.assert_allclose(
        np.linalg.norm(d - np.array([0, 1, 0]), axis=1), 1.0, atol=1e-5)
    np.testing.assert_allclose(d.mean(axis=0), [0, 1, 0], atol=0.05)


def test_metal_mirror_and_absorb():
    mats, tab = _mats(), texture.white_table()
    n = 8
    # 45-degree incidence on y-up plane
    r = Rays(o=jnp.zeros((n, 3)),
             d=jnp.broadcast_to(jnp.asarray([1.0, -1.0, 0.0]), (n, 3)))
    ok, att, d = shade.scatter(mats, tab, r, _hits(n, 1),
                               jax.random.PRNGKey(1), 0)
    assert bool(jnp.all(ok))
    d = np.asarray(d) / np.linalg.norm(d, axis=1, keepdims=True)
    np.testing.assert_allclose(
        d, np.tile([[np.sqrt(0.5), np.sqrt(0.5), 0]], (n, 1)), atol=1e-4)
    # grazing from below the normal is absorbed: flip normal
    ok2, _, _ = shade.scatter(mats, tab, r, _hits(n, 1, normal=(0, -1, 0)),
                              jax.random.PRNGKey(1), 0)
    assert not bool(jnp.any(ok2))


def test_dielectric_tir_and_refraction():
    mats, tab = _mats(), texture.white_table()
    n = 2000
    # grazing from inside (front_face False, eta=1.5): TIR guaranteed
    r = Rays(o=jnp.zeros((n, 3)),
             d=jnp.broadcast_to(jnp.asarray([1.0, -0.05, 0.0]), (n, 3)))
    ok, att, d = shade.scatter(mats, tab, r, _hits(n, 2, front=False),
                               jax.random.PRNGKey(2), 0)
    assert bool(jnp.all(ok))
    np.testing.assert_allclose(att, 1.0, atol=1e-6)
    d = np.asarray(d)
    assert (d[:, 1] > 0).all()  # all reflected up
    # normal incidence from outside: mostly refracts straight through
    r2 = Rays(o=jnp.zeros((n, 3)),
              d=jnp.broadcast_to(jnp.asarray([0.0, -1.0, 0.0]), (n, 3)))
    ok2, _, d2 = shade.scatter(mats, tab, r2, _hits(n, 2, front=True),
                               jax.random.PRNGKey(3), 0)
    frac_through = float((np.asarray(d2)[:, 1] < 0).mean())
    # Schlick at normal incidence, n=1.5: R0 = 0.04
    assert 0.90 < frac_through < 0.99


def test_diffuse_light_emits_never_scatters():
    mats, tab = _mats(), texture.white_table()
    n = 4
    h = _hits(n, 3)
    ok, _, _ = shade.scatter(mats, tab, _rays_down(n), h,
                             jax.random.PRNGKey(4), 0)
    assert not bool(jnp.any(ok))
    e = shade.emitted(mats, tab, h)
    np.testing.assert_allclose(e, np.tile([[4.0, 2.0, 1.0]], (n, 1)),
                               atol=1e-5)
    # non-light emits black
    e0 = shade.emitted(mats, tab, _hits(n, 0))
    np.testing.assert_allclose(e0, 0.0)


def test_isotropic_in_ball():
    mats, tab = _mats(), texture.white_table()
    n = 3000
    ok, att, d = shade.scatter(mats, tab, _rays_down(n), _hits(n, 4),
                               jax.random.PRNGKey(5), 0)
    assert bool(jnp.all(ok))
    r = np.linalg.norm(np.asarray(d), axis=1)
    assert r.max() <= 1.0 + 1e-5
    np.testing.assert_allclose(r.mean(), 0.75, atol=0.02)

"""Intersection kernels vs scalar numpy oracles (SURVEY.md §4: sphere
quadratic sphere.cpp:20-49, watertight tri triangle.cpp:57-131, slab
aabb.h:26-39, rects aarect.h)."""
import jax.numpy as jnp
import numpy as np

from hobbyraytracer_tpu.core.mathx import BIG
from hobbyraytracer_tpu.core.types import Rays
from hobbyraytracer_tpu.ops import intersect as isect


def rays(o, d):
    return Rays(o=jnp.asarray(o, jnp.float32), d=jnp.asarray(d, jnp.float32))


# ------------------------------------------------------------------ sphere

def test_sphere_hit_front_and_inside():
    r = rays([[0, 0, 0], [0, 0, 0]], [[0, 0, -1], [0, 0, -1]])
    center = jnp.asarray([[0, 0, -3], [0, 0, 0.0]], jnp.float32)
    radius = jnp.asarray([1.0, 0.5], jnp.float32)
    t = isect.sphere_t(r, center, radius, 1e-3, BIG)
    # ray 0 vs sphere 0: hits at t=2 (front face)
    np.testing.assert_allclose(t[0, 0], 2.0, rtol=1e-5)
    # ray 0 vs sphere 1 (origin inside): far root t=0.5
    np.testing.assert_allclose(t[0, 1], 0.5, rtol=1e-5)


def test_sphere_window_rejects():
    r = rays([[0, 0, 0]], [[0, 0, -1]])
    center = jnp.asarray([[0, 0, -3]], jnp.float32)
    radius = jnp.asarray([1.0], jnp.float32)
    # both roots (2, 4) outside window
    t = isect.sphere_t(r, center, radius, 5.0, BIG)
    assert float(t[0, 0]) >= 1e29
    t = isect.sphere_t(r, center, radius, 1e-3, 1.0)
    assert float(t[0, 0]) >= 1e29
    # window between roots: picks far root
    t = isect.sphere_t(r, center, radius, 3.0, BIG)
    np.testing.assert_allclose(t[0, 0], 4.0, rtol=1e-5)


def test_sphere_non_unit_direction():
    # t is in units of |d| (reference uses a = |d|^2)
    r = rays([[0, 0, 0]], [[0, 0, -2]])
    t = isect.sphere_t(r, jnp.asarray([[0, 0, -3.0]]), jnp.asarray([1.0]),
                       1e-3, BIG)
    np.testing.assert_allclose(t[0, 0], 1.0, rtol=1e-5)


def test_sphere_uv_reference_points():
    # sphere.cpp:4-18 documented examples
    cases = [([1, 0, 0], (0.5, 0.5)), ([-1, 0, 0], (0.0, 0.5)),
             ([0, 1, 0], (0.5, 1.0)), ([0, -1, 0], (0.5, 0.0)),
             ([0, 0, 1], (0.25, 0.5)), ([0, 0, -1], (0.75, 0.5))]
    for n, (eu, ev) in cases:
        uv = isect.sphere_uv(jnp.asarray([n], jnp.float32))
        np.testing.assert_allclose(uv[0], [eu, ev], atol=1e-6)


def test_intersect_spheres_closest_and_attribs():
    r = rays([[0, 0, 5]], [[0, 0, -1]])
    center = jnp.asarray([[0, 0, 0], [0, 0, 2.0]], jnp.float32)
    radius = jnp.asarray([1.0, 0.5], jnp.float32)
    mid = jnp.asarray([7, 8], jnp.int32)
    h = isect.intersect_spheres(r, center, radius, mid, 1e-3, BIG)
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], 2.5, rtol=1e-5)  # near sphere first
    assert int(h.mat_id[0]) == 8
    np.testing.assert_allclose(h.p[0], [0, 0, 2.5], atol=1e-5)
    np.testing.assert_allclose(h.normal[0], [0, 0, 1], atol=1e-5)
    assert bool(h.front_face[0])


# -------------------------------------------------------------------- rect

def test_rect_all_axes():
    # yz at x=2, xz at y=2, xy at z=2
    axis = jnp.asarray([0, 1, 2], jnp.int32)
    a0 = jnp.asarray([-1.0, -1.0, -1.0])
    a1 = jnp.asarray([1.0, 1.0, 1.0])
    b0 = jnp.asarray([-1.0, -1.0, -1.0])
    b1 = jnp.asarray([1.0, 1.0, 1.0])
    k = jnp.asarray([2.0, 2.0, 2.0])
    r = rays([[0, 0.5, 0.25]] * 3,
             [[1, 0, 0], [0, 1, 0], [0, 0, 1]])
    t = isect.rect_t(r, axis, a0, a1, b0, b1, k, 1e-3, BIG)
    np.testing.assert_allclose(t[0, 0], 2.0, rtol=1e-5)     # +x ray hits yz
    np.testing.assert_allclose(t[1, 1], 1.5, rtol=1e-5)     # +y ray hits xz
    np.testing.assert_allclose(t[2, 2], 1.75, rtol=1e-5)    # +z ray hits xy
    assert float(t[0, 1]) >= 1e29 and float(t[0, 2]) >= 1e29


def test_rect_uv_and_normal():
    axis = jnp.asarray([1], jnp.int32)  # xz rect (y normal)
    h = isect.intersect_rects(
        rays([[0.5, 5, -0.5]], [[0, -1, 0]]), axis,
        jnp.asarray([-1.0]), jnp.asarray([1.0]),
        jnp.asarray([-1.0]), jnp.asarray([1.0]), jnp.asarray([0.0]),
        jnp.asarray([3], jnp.int32), 1e-3, BIG)
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], 5.0, rtol=1e-5)
    # u from x: (0.5-(-1))/2 = 0.75 ; v from z: (-0.5+1)/2 = 0.25
    np.testing.assert_allclose(h.uv[0], [0.75, 0.25], atol=1e-5)
    np.testing.assert_allclose(h.normal[0], [0, 1, 0], atol=1e-6)
    assert bool(h.front_face[0])


# ---------------------------------------------------------------- triangle

def _moller_trumbore(o, d, v0, v1, v2):
    """Independent oracle: classic MT returning (t, u, v) or None."""
    e1 = v1 - v0
    e2 = v2 - v0
    p = np.cross(d, e2)
    det = np.dot(e1, p)
    if abs(det) < 1e-12:
        return None
    inv = 1.0 / det
    s = o - v0
    u = np.dot(s, p) * inv
    if u < 0 or u > 1:
        return None
    q = np.cross(s, e1)
    v = np.dot(d, q) * inv
    if v < 0 or u + v > 1:
        return None
    t = np.dot(e2, q) * inv
    return t, u, v


def test_triangle_vs_mt_oracle_random():
    rs = np.random.RandomState(3)
    n_match = 0
    for _ in range(200):
        v0, v1, v2 = rs.randn(3, 3).astype(np.float32)
        o = rs.randn(3).astype(np.float32) * 2
        target = (v0 + v1 + v2) / 3 + rs.randn(3) * 0.3
        d = (target - o).astype(np.float32)
        r = rays([o], [d])
        t = isect.triangle_t(r, jnp.asarray([v0]), jnp.asarray([v1]),
                             jnp.asarray([v2]), BIG)
        oracle = _moller_trumbore(o, d, v0.astype(np.float64),
                                  v1.astype(np.float64),
                                  v2.astype(np.float64))
        ours = float(t[0, 0])
        if oracle is not None and oracle[0] > 0:
            assert ours < 1e29, (o, d, v0, v1, v2)
            np.testing.assert_allclose(ours, oracle[0], rtol=1e-3)
            n_match += 1
        elif oracle is None or oracle[0] < -1e-4:
            # miss or behind: ours must reject (edge grazers may differ)
            assert ours >= 1e29 or abs(ours) < 1e-3
    assert n_match > 50  # the sampling actually exercised hits


def test_triangle_backface_still_hits():
    # watertight version hits both orientations (det<0 branch)
    v0 = np.array([0, 0, -2], np.float32)
    v1 = np.array([1, 0, -2], np.float32)
    v2 = np.array([0, 1, -2], np.float32)
    for wind in [(v0, v1, v2), (v0, v2, v1)]:
        t = isect.triangle_t(rays([[0.2, 0.2, 0]], [[0, 0, -1]]),
                             jnp.asarray([wind[0]]), jnp.asarray([wind[1]]),
                             jnp.asarray([wind[2]]), BIG)
        np.testing.assert_allclose(float(t[0, 0]), 2.0, rtol=1e-5)


def test_triangle_attribs_interpolation():
    verts = jnp.asarray([[0, 0, -1], [2, 0, -1], [0, 2, -1]], jnp.float32)
    normals = jnp.asarray([[1, 0, 0], [0, 1, 0], [0, 0, 1]], jnp.float32)
    uvs = jnp.asarray([[0, 0], [1, 0], [0, 1]], jnp.float32)
    idx = jnp.asarray([[0, 1, 2]], jnp.int32)
    r = rays([[0.5, 0.5, 0]], [[0, 0, -1]])
    h = isect.intersect_triangles(r, verts, normals, uvs, idx,
                                  jnp.asarray(5, jnp.int32), BIG)
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], 1.0, rtol=1e-5)
    # barycentrics at (0.5, 0.5): b1 = 0.25, b2 = 0.25, b0 = 0.5
    np.testing.assert_allclose(h.normal[0], [0.5, 0.25, 0.25], atol=1e-5)
    np.testing.assert_allclose(h.uv[0], [0.25, 0.25], atol=1e-5)
    assert int(h.mat_id[0]) == 5


def test_chunked_scan_beyond_one_chunk():
    # >chunk primitives: padding + index bookkeeping must stay correct
    rs = np.random.RandomState(0)
    n = 300  # > 2 chunks of 128
    centers = rs.randn(n, 3).astype(np.float32) * 10
    centers[:, 2] -= 30
    radii = np.full((n,), 0.7, np.float32)
    # aim at sphere 257 dead center
    target = centers[257]
    r = rays([[0, 0, 10]], [target - np.array([0, 0, 10], np.float32)])
    # make sure no other sphere is closer along this ray: shrink others
    radii_small = radii.copy()
    radii_small[:257] = 0.01
    radii_small[258:] = 0.01
    h = isect.intersect_spheres(r, jnp.asarray(centers),
                                jnp.asarray(radii_small),
                                jnp.arange(n, dtype=jnp.int32), 1e-3, BIG)
    assert bool(h.hit[0])
    assert int(h.mat_id[0]) == 257


# -------------------------------------------------------------------- slab

def test_aabb_slab():
    o = jnp.asarray([[0, 0, 0]], jnp.float32)
    inv_d = 1.0 / jnp.asarray([[1, 1, 1]], jnp.float32)
    assert bool(isect.aabb_hit(o, inv_d, jnp.asarray([1.0, 1, 1]),
                               jnp.asarray([2.0, 2, 2]), 1e-3, BIG)[0])
    assert not bool(isect.aabb_hit(o, inv_d, jnp.asarray([1.0, 1, 5]),
                                   jnp.asarray([2.0, 2, 6]), 1e-3, BIG)[0])
    # behind the origin
    assert not bool(isect.aabb_hit(o, inv_d, jnp.asarray([-3.0, -3, -3]),
                                   jnp.asarray([-2.0, -2, -2]), 1e-3,
                                   BIG)[0])

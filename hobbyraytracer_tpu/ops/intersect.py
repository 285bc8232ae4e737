"""Batched primitive intersection kernels (jnp reference path).

Replaces the reference's per-ray virtual `Hittable::hit` dispatch
(hittable.h:27-32) with dense vectorized tests: every kernel intersects a
whole ray wavefront against a whole primitive table, in two phases:

  1. find: compute only (t, prim_index) per ray with a chunked running-min
     scan (bounded memory, maps to VPU lanes with zero divergence);
  2. attrib: recompute the full hit record (p, normal, uv) once per ray for
     the winning primitive via gathers.

This is the TPU-native answer to the reference's linear closest-hit scan
(hittableList.cpp:4-21): dense math instead of branchy tree walks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.mathx import BIG, ray_at
from ..core.types import Hits, Rays, set_face_normal

# chunk of primitives processed per scan step; keeps the (R x chunk)
# intermediate below ~tens of MB for multi-million-ray wavefronts.
DEFAULT_CHUNK = 128


def _pad(x, n_padded: int, fill):
    """Pad a primitive table along axis 0 with a never-hit sentinel value."""
    n = x.shape[0]
    if n == n_padded:
        return x
    pad_width = [(0, n_padded - n)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, pad_width, constant_values=fill)


def _chunked_argmin(per_chunk_t, n_prims: int, n_rays: int, chunk: int):
    """Scan over primitive chunks keeping the running (t_best, idx_best).

    per_chunk_t(start) -> (R, chunk) candidate t values (BIG where invalid,
    already windowed). n_prims must be a multiple of chunk (callers pad
    tables with never-hit sentinels). Returns (t_best, idx_best).
    """
    assert n_prims % chunk == 0
    n_chunks = n_prims // chunk
    starts = jnp.arange(n_chunks, dtype=jnp.int32) * chunk

    def step(carry, start):
        t_best, i_best = carry
        tc = per_chunk_t(start)  # (R, chunk)
        t_min_c = jnp.min(tc, axis=1)
        i_min_c = jnp.argmin(tc, axis=1).astype(jnp.int32) + start
        take = t_min_c < t_best
        return (jnp.where(take, t_min_c, t_best),
                jnp.where(take, i_min_c, i_best)), None

    init = (jnp.full((n_rays,), BIG, jnp.float32),
            jnp.full((n_rays,), -1, jnp.int32))
    (t_best, i_best), _ = jax.lax.scan(step, init, starts)
    return t_best, i_best


# ---------------------------------------------------------------- spheres

def sphere_t(rays: Rays, center, radius, t_min, t_max):
    """Candidate t per (ray, sphere): the reference's half-b quadratic with
    two-root window test (sphere.cpp:20-49). center: (S,3), radius: (S,).
    Returns (R, S) t values, BIG where miss.
    """
    oc = rays.o[:, None, :] - center[None, :, :]          # (R,S,3)
    a = jnp.sum(rays.d * rays.d, axis=-1)[:, None]        # (R,1)
    half_b = jnp.sum(oc * rays.d[:, None, :], axis=-1)    # (R,S)
    c = jnp.sum(oc * oc, axis=-1) - (radius * radius)[None, :]
    disc = half_b * half_b - a * c
    # safe-where: d(sqrt)/dx -> inf at 0 would turn masked misses into NaN
    # gradients (inf * 0); substitute 1 under the miss mask
    sqrtd = jnp.sqrt(jnp.where(disc > 0.0, disc, 1.0))
    r1 = (-half_b - sqrtd) / a
    r2 = (-half_b + sqrtd) / a
    in1 = (r1 >= t_min) & (r1 <= t_max)
    in2 = (r2 >= t_min) & (r2 <= t_max)
    root = jnp.where(in1, r1, jnp.where(in2, r2, BIG))
    return jnp.where(disc >= 0.0, root, BIG)


def sphere_uv(outward_normal):
    """getSphereUV (sphere.cpp:4-18): theta=acos(-n.y), phi=atan2(-n.z,n.x)+pi.
    safe_arccos: exact value, derivative clamped at the poles."""
    from ..core.mathx import safe_arccos
    theta = safe_arccos(-outward_normal[..., 1])
    phi = jnp.arctan2(-outward_normal[..., 2], outward_normal[..., 0]) + jnp.pi
    return jnp.stack([phi / (2.0 * jnp.pi), theta / jnp.pi], axis=-1)


def intersect_spheres(rays: Rays, center, radius, mat_id, t_min, t_max,
                      chunk: int = DEFAULT_CHUNK) -> Hits:
    n_rays = rays.o.shape[0]
    n = center.shape[0]
    if n == 0:
        return Hits.none(n_rays)
    chunk = min(chunk, n)
    np_ = ((n + chunk - 1) // chunk) * chunk
    center_p = _pad(center, np_, 1e30)  # far away: disc < 0, never hits
    radius_p = _pad(radius, np_, 0.0)

    def per_chunk(start):
        c = jax.lax.dynamic_slice_in_dim(center_p, start, chunk, 0)
        r = jax.lax.dynamic_slice_in_dim(radius_p, start, chunk, 0)
        return sphere_t(rays, c, r, t_min, t_max)

    t, idx = _chunked_argmin(per_chunk, np_, n_rays, chunk)
    hit = t < BIG
    safe = jnp.minimum(jnp.maximum(idx, 0), n - 1)
    c = center[safe]
    r = jnp.maximum(radius[safe], 1e-20)
    p = ray_at(rays.o, rays.d, jnp.where(hit, t, 1.0))
    outward = (p - c) / r[:, None]
    normal, front = set_face_normal(rays.d, outward)
    return Hits(hit=hit, t=jnp.where(hit, t, BIG), p=p, normal=normal,
                uv=sphere_uv(outward), front_face=front,
                mat_id=jnp.where(hit, mat_id[safe], -1))


# ------------------------------------------------------------------ rects

# For normal-axis n: in-plane axes (a, b) and the rect's outward normal
# (+unit on axis n), matching YZRect/XZRect/XYRect (aarect.h:5-144):
#   yz_rect: n=0 (x), a=y, b=z;  xz_rect: n=1 (y), a=x, b=z;
#   xy_rect: n=2 (z), a=x, b=y.
_AXIS_A = jnp.array([1, 0, 0], jnp.int32)
_AXIS_B = jnp.array([2, 2, 1], jnp.int32)


def rect_t(rays: Rays, axis, a0, a1, b0, b1, k, t_min, t_max):
    """Candidate t per (ray, rect). axis: (Q,) int32 normal axis."""
    o = rays.o  # (R,3)
    d = rays.d
    # gather per-rect components: (R, Q)
    o_n = o[:, axis]
    d_n = d[:, axis]
    # safe-where: parallel rays (d_n == 0) must not produce inf t (NaN
    # gradients through the masked branch); they are rejected via `ok`
    parallel = d_n == 0.0
    t = (k[None, :] - o_n) / jnp.where(parallel, 1.0, d_n)
    pa = o[:, _AXIS_A[axis]] + t * d[:, _AXIS_A[axis]]
    pb = o[:, _AXIS_B[axis]] + t * d[:, _AXIS_B[axis]]
    ok = (~parallel & (t >= t_min) & (t <= t_max)
          & (pa >= a0[None, :]) & (pa <= a1[None, :])
          & (pb >= b0[None, :]) & (pb <= b1[None, :]))
    return jnp.where(ok, t, BIG)


def intersect_rects(rays: Rays, axis, a0, a1, b0, b1, k, mat_id,
                    t_min, t_max, chunk: int = DEFAULT_CHUNK) -> Hits:
    n_rays = rays.o.shape[0]
    n = axis.shape[0]
    if n == 0:
        return Hits.none(n_rays)
    chunk = min(chunk, n)
    np_ = ((n + chunk - 1) // chunk) * chunk
    axis_p = _pad(axis, np_, 0)
    a0_p = _pad(a0, np_, 1.0)  # a0 > a1: bounds test can never pass
    a1_p = _pad(a1, np_, 0.0)
    b0_p = _pad(b0, np_, 1.0)
    b1_p = _pad(b1, np_, 0.0)
    k_p = _pad(k, np_, 0.0)

    def per_chunk(start):
        sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, chunk, 0)
        return rect_t(rays, sl(axis_p), sl(a0_p), sl(a1_p), sl(b0_p),
                      sl(b1_p), sl(k_p), t_min, t_max)

    t, idx = _chunked_argmin(per_chunk, np_, n_rays, chunk)
    hit = t < BIG
    safe = jnp.minimum(jnp.maximum(idx, 0), n - 1)
    ax = axis[safe]
    p = ray_at(rays.o, rays.d, jnp.where(hit, t, 1.0))
    ia = _AXIS_A[ax]
    ib = _AXIS_B[ax]
    rr = jnp.arange(n_rays)
    pa = p[rr, ia]
    pb = p[rr, ib]
    u = (pa - a0[safe]) / (a1[safe] - a0[safe])
    v = (pb - b0[safe]) / (b1[safe] - b0[safe])
    outward = jax.nn.one_hot(ax, 3, dtype=jnp.float32)
    normal, front = set_face_normal(rays.d, outward)
    return Hits(hit=hit, t=jnp.where(hit, t, BIG), p=p, normal=normal,
                uv=jnp.stack([u, v], axis=-1), front_face=front,
                mat_id=jnp.where(hit, mat_id[safe], -1))


# -------------------------------------------------------------- triangles

def triangle_t(rays: Rays, v0, v1, v2, t_max):
    """Candidate t per (ray, tri): watertight intersection after PBRT-3
    (reference ITriangle::hit, triangle.cpp:57-109).

    Divergence (fix-and-document, SURVEY.md §7): the reference picks the
    projection axis from the RAY ORIGIN's components (triangle.cpp:70),
    which breaks when d[kz] ~ 0; we use max |d| as PBRT does. Like the
    reference, t_min is ignored: valid window is 0 < t <= t_max
    (triangle.cpp:106-109).
    """
    d = rays.d  # (R,3)
    # kz = argmax |d|, kx = kz+1 mod 3, ky = kx+1 mod 3  (per ray)
    ad = jnp.abs(d)
    kz = jnp.argmax(ad, axis=-1).astype(jnp.int32)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    rr = jnp.arange(d.shape[0])
    dx = d[rr, kx][:, None]
    dy = d[rr, ky][:, None]
    dz = d[rr, kz][:, None]

    def permuted(v):
        # v: (T,3) -> components (R,T) after per-ray permutation
        t0 = v[None, :, :] - rays.o[:, None, :]  # translate to ray origin
        px = jnp.take_along_axis(t0, kx[:, None, None], axis=2)[..., 0]
        py = jnp.take_along_axis(t0, ky[:, None, None], axis=2)[..., 0]
        pz = jnp.take_along_axis(t0, kz[:, None, None], axis=2)[..., 0]
        return px, py, pz

    sx = -dx / dz
    sy = -dy / dz
    sz = 1.0 / dz

    p0x, p0y, p0z = permuted(v0)
    p1x, p1y, p1z = permuted(v1)
    p2x, p2y, p2z = permuted(v2)
    p0x = p0x + sx * p0z; p0y = p0y + sy * p0z
    p1x = p1x + sx * p1z; p1y = p1y + sy * p1z
    p2x = p2x + sx * p2z; p2y = p2y + sy * p2z

    e0 = p1x * p2y - p1y * p2x
    e1 = p2x * p0y - p2y * p0x
    e2 = p0x * p1y - p0y * p1x

    inside = ~(((e0 < 0) | (e1 < 0) | (e2 < 0))
               & ((e0 > 0) | (e1 > 0) | (e2 > 0)))
    det = e0 + e1 + e2
    t_scaled = (e0 * p0z + e1 * p1z + e2 * p2z) * sz
    neg_ok = (det < 0) & (t_scaled < 0) & (t_scaled >= t_max * det)
    pos_ok = (det > 0) & (t_scaled > 0) & (t_scaled <= t_max * det)
    ok = inside & (det != 0) & (neg_ok | pos_ok)
    t = t_scaled / jnp.where(det == 0, 1.0, det)  # safe-where for grads
    return jnp.where(ok, t, BIG)


def triangle_attribs(rays: Rays, v0, v1, v2):
    """Barycentrics for the winning triangle (per ray): solve with the same
    edge-function construction, then b_i = e_i / det."""
    d = rays.d
    ad = jnp.abs(d)
    kz = jnp.argmax(ad, axis=-1).astype(jnp.int32)
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    rr = jnp.arange(d.shape[0])
    dx = d[rr, kx]
    dy = d[rr, ky]
    dz = d[rr, kz]
    sx = -dx / dz
    sy = -dy / dz

    def permute(v):
        t0 = v - rays.o
        px = t0[rr, kx]
        py = t0[rr, ky]
        pz = t0[rr, kz]
        return px + sx * pz, py + sy * pz

    p0x, p0y = permute(v0)
    p1x, p1y = permute(v1)
    p2x, p2y = permute(v2)
    e0 = p1x * p2y - p1y * p2x
    e1 = p2x * p0y - p2y * p0x
    e2 = p0x * p1y - p0y * p1x
    det = e0 + e1 + e2
    inv = 1.0 / jnp.where(det == 0, 1.0, det)
    return e0 * inv, e1 * inv, e2 * inv


def intersect_triangles(rays: Rays, verts, normals, uvs, indices, mat_id,
                        t_max, chunk: int = DEFAULT_CHUNK) -> Hits:
    """Brute-force dense mesh intersection: stream triangle chunks through a
    running-min scan. verts/normals: (V,3), uvs: (V,2), indices: (T,3),
    mat_id: scalar int32 for the whole mesh (meshes share one material,
    mesh.cpp:24-34).

    Hit attributes follow ITriangle::hit (triangle.cpp:112-128): normal and
    uv are barycentric-interpolated; the normal is NOT normalized and NOT
    face-flipped here (no setFaceNormal in the reference triangle path —
    instance wrappers may flip it later). front_face is computed from the
    geometric orientation as a sane extension (the reference leaves it
    stale; only dielectrics consume it, which the reference YAML cannot
    attach to meshes).
    """
    n_rays = rays.o.shape[0]
    n = indices.shape[0]
    if n == 0:
        return Hits.none(n_rays)
    chunk = min(chunk, n)
    np_ = ((n + chunk - 1) // chunk) * chunk
    tri_v0 = _pad(verts[indices[:, 0]], np_, 0.0)  # degenerate: det == 0
    tri_v1 = _pad(verts[indices[:, 1]], np_, 0.0)
    tri_v2 = _pad(verts[indices[:, 2]], np_, 0.0)

    def per_chunk(start):
        v0 = jax.lax.dynamic_slice_in_dim(tri_v0, start, chunk, 0)
        v1 = jax.lax.dynamic_slice_in_dim(tri_v1, start, chunk, 0)
        v2 = jax.lax.dynamic_slice_in_dim(tri_v2, start, chunk, 0)
        return triangle_t(rays, v0, v1, v2, t_max)

    t, idx = _chunked_argmin(per_chunk, np_, n_rays, chunk)
    hit = t < BIG
    safe = jnp.minimum(jnp.maximum(idx, 0), n - 1)
    i0 = indices[safe, 0]
    i1 = indices[safe, 1]
    i2 = indices[safe, 2]
    b0, b1, b2 = triangle_attribs(rays, verts[i0], verts[i1], verts[i2])
    w = lambda a: (b0[:, None] * a[i0] + b1[:, None] * a[i1]
                   + b2[:, None] * a[i2])
    normal = w(normals)
    uv = b0[:, None] * uvs[i0] + b1[:, None] * uvs[i1] + b2[:, None] * uvs[i2]
    front = jnp.sum(rays.d * normal, axis=-1) < 0.0
    return Hits(hit=hit, t=jnp.where(hit, t, BIG),
                p=ray_at(rays.o, rays.d, jnp.where(hit, t, 1.0)),
                normal=normal, uv=uv,
                front_face=front,
                mat_id=jnp.where(hit, mat_id, -1))


# ------------------------------------------------------------------- slab

def aabb_hit(o, inv_d, bmin, bmax, t_min, t_max):
    """Branchless slab test (reference AABB::hit, aabb.h:26-39): reject when
    the interval empties; matches the reference's strict `t_max <= t_min`
    reject. o/inv_d: (...,3); bmin/bmax broadcastable to (...,3)."""
    t0 = (bmin - o) * inv_d
    t1 = (bmax - o) * inv_d
    lo = jnp.minimum(t0, t1)
    hi = jnp.maximum(t0, t1)
    tmin = jnp.maximum(jnp.max(lo, axis=-1), t_min)
    tmax = jnp.minimum(jnp.min(hi, axis=-1), t_max)
    return tmax > tmin

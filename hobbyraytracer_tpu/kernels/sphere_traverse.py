"""Clustered sphere intersection as a Pallas kernel.

The reference scans its sphere list linearly per ray
(hittableList.cpp:4-21, sphere.cpp:20-49); the round-1..4 TPU port kept
that shape as a dense chunked (rays x spheres) scan
(ops/intersect.py:intersect_spheres) — fine parity, but a 196k-lane
wavefront pays all ~500 spheres of the scattered-balls scene every
segment (~8 ms of a ~21 ms segment, PERF.md round 5).

This kernel applies the mesh traversal's cluster machinery to spheres:
the host groups Morton-sorted spheres into clusters of L=128
(scene/bvh.py:build_sphere_clusters), and each ray block slab-tests the
cluster bounds and visits only the clusters it still NEEDS under the
same per-ray masked policy as kernels/mesh_traverse.py (cluster k is
needed while some ray's entry into k beats that ray's own best t).
A visit is one (B, L) half-b quadratic (sphere.cpp:20-49 semantics:
near root preferred, far root if only it is inside [t_min, t_max]).

The kernel returns only (t, sphere id); normals/uv/material are
gathered + recomputed OUTSIDE from the winning id (row-count-bound
gathers, a few ns/ray — and the recompute doubles as the
differentiable replay for fits, ops/intersect.py design).

Table layout: spheres as (K, 8, L) f32, rows [cx cy cz r2 0 0 0 0],
clusters on axis 0, spheres on the lane axis; bounds as the mesh
kernel's (8, K) [bmin.xyz bmax.xyz 0 0]. Pad spheres carry r2 = -1
(discriminant always negative -> never hit).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

from ..core.mathx import BIG
from .mesh_traverse import _slab_entries

_INF = float("inf")
SPHERE_ROWS = 8
# rays per sphere-kernel block. Sphere pools have FEW clusters (K=4 at
# the 485-ball bench), so the per-visit scalar control amortizes best
# over large blocks; read once at import like every knob.
BLOCK = int(os.environ.get("HRT_SPHERE_BLOCK", "1024"))


def _kernel(rays_ref, bounds_ref, sph_ref, id_ref, out_t, out_i,
            k_clusters: int, t_min: float, t_max: float):
    r = rays_ref[0]                      # (B, 8)
    ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]
    dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]
    valid = r[:, 6:7] > 0.0
    b = r.shape[0]

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, sph_ref.shape[2]), 1)
    klane = jax.lax.broadcasted_iota(jnp.int32, (1, k_clusters), 1)
    a = dx * dx + dy * dy + dz * dz                   # (B,1)
    inv_a = 1.0 / a

    entry = _slab_entries(r, bounds_ref[:], t_max)    # (B,K)

    def rem_pick(e_mat, best):
        rem = jnp.min(jnp.where(e_mat < best, e_mat, _INF), axis=0,
                      keepdims=True)
        e = jnp.min(rem)
        k = jnp.min(jnp.where(rem == e, klane, k_clusters))
        return e, k

    def visit(k, t_best, i_best):
        blk = sph_ref[k]                              # (8, L)
        ocx = ox - blk[0:1, :]
        ocy = oy - blk[1:2, :]
        ocz = oz - blk[2:3, :]
        half_b = ocx * dx + ocy * dy + ocz * dz
        c = ocx * ocx + ocy * ocy + ocz * ocz - blk[3:4, :]
        disc = half_b * half_b - a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = (-half_b - sq) * inv_a
        r2_ = (-half_b + sq) * inv_a
        in1 = (r1 >= t_min) & (r1 <= t_max)
        in2 = (r2_ >= t_min) & (r2_ <= t_max)
        root = jnp.where(in1, r1, jnp.where(in2, r2_, BIG))
        t = jnp.where(disc > 0.0, root, BIG)          # (B,L)
        t_c = jnp.min(t, axis=1, keepdims=True)       # (B,1)
        take = (t_c < t_best) & valid
        win = jnp.argmin(t, axis=1)[:, None]
        hot = (lane == win) & (t < BIG)
        ids = id_ref[pl.ds(k, 1), :]
        id_win = jnp.sum(jnp.where(hot, ids, 0), axis=1, keepdims=True)
        return (jnp.where(take, t_c, t_best),
                jnp.where(take, id_win, i_best))

    t0 = jnp.full((b, 1), BIG, jnp.float32)
    i0 = jnp.full((b, 1), -1, jnp.int32)
    e0, k0 = rem_pick(entry, t0)

    def cond(c):
        return c[3] < _INF

    def body(c):
        e_mat, t_best, i_best, _, k = c
        t_best, i_best = visit(k, t_best, i_best)
        e_mat = jnp.where(klane == k, _INF, e_mat)
        e_nxt, k_nxt = rem_pick(e_mat, t_best)
        return e_mat, t_best, i_best, e_nxt, k_nxt

    _, t_best, i_best, _, _ = jax.lax.while_loop(
        cond, body, (entry, t0, i0, e0, k0))
    out_t[0] = jnp.where(valid, t_best, BIG)
    out_i[0] = jnp.where(valid, i_best, -1)


@functools.partial(jax.jit, static_argnames=("t_min", "t_max",
                                             "interpret"))
def intersect_spheres_pallas(rays8, bounds8, table, ids,
                             t_min: float, t_max: float = float(BIG),
                             interpret: bool = False):
    """rays8: (NB, B, 8) packed rays (same layout as the mesh kernel);
    bounds8: (8, K); table: (K, 8, L); ids: (K, L) int32. Returns
    (t (NB, B, 1) f32, id (NB, B, 1) int32)."""
    nb, b, _ = rays8.shape
    k_clusters, rows, leaf = table.shape
    assert rows == SPHERE_ROWS, rows
    kern = functools.partial(_kernel, k_clusters=k_clusters,
                             t_min=float(t_min), t_max=float(t_max))
    return pl.pallas_call(
        kern,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((1, b, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k_clusters), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_clusters, SPHERE_ROWS, leaf),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_clusters, leaf), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, b, 1), jnp.float32),
            jax.ShapeDtypeStruct((nb, b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(rays8, bounds8, table, ids)

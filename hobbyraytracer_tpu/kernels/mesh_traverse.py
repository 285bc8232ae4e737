"""Fused BVH-cluster traversal + triangle intersection + attribute
interpolation as a Pallas kernel.

Replaces the XLA `lax.while_loop` traversal in
ops/intersect.py:intersect_mesh_clustered for the forward render path. The
XLA loop is LOCKSTEP: every iteration does a full-wavefront visit, so the
whole wavefront pays for the worst block's visit count (max over blocks).
Here the grid iterates ray blocks sequentially on the TPU core and each
block runs its OWN `while_loop`, terminating as soon as the nearest
unvisited cluster's entry distance exceeds every ray-in-block's best t
(blocks whose rays all miss every cluster do ZERO visits) — total cost is
the SUM of per-block visits, the same early-out economics as the
reference's per-ray recursive descent (bvh.cpp:69-78) without per-lane
divergence.

Round-2 profiling on the real chip showed the PREVIOUS design's XLA-side
preprocessing (a dense (rays x clusters) slab-entry matrix in HBM feeding
per-block argsorts) cost ~9x the traversal kernel itself (52 ms of a
58 ms scene intersect at 262k rays). So the kernel now does everything
on-chip:

- the cluster slab test (AABB::hit, aabb.h:26-39) runs INSIDE the kernel
  on the (B, K) block-local matrix in VMEM — the full (R, K) matrix never
  exists anywhere;
- the near-to-far visit ORDER is argmin-extraction over the block's entry
  row (visit nearest unvisited cluster, mask it to +inf, repeat while the
  nearest remaining entry could still beat the block's worst best-t) —
  exactly the ordered descent of bvh.cpp:69-78, no pre-sort at all;
- leaf intersection is classic Moller-Trumbore (the reference's watertight
  variant, triangle.cpp:57-109, is kept on the XLA/differentiable path;
  the two agree to float rounding, tests/test_kernels.py);
- the winning triangle's smooth normal/UV are interpolated in-kernel from
  the MT barycentrics (triangle.cpp:112-128) — round-2 profiling showed
  XLA gather-based interpolation after the kernel cost 10x the traversal.

A second tiny kernel (`coherence_keys_pallas`) produces the per-ray
(nearest-entry distance, nearest cluster id) pair that drives the optional
wavefront coherence sort, again without materializing (R, K).

Layout notes (TPU tiling: f32 tiles are (8 sublanes, 128 lanes)):
- rays are packed (NB, B, 8): lanes = [ox oy oz dx dy dz valid pad], so a
  block slice is a natural (B, 8) tile and per-component (B, 1) columns
  broadcast against (1, L) triangle rows into (B, L) pairwise ops;
- leaf size L = 128 fills the lane axis exactly;
- cluster bounds arrive as one (8, K) f32 table: rows [bmin.xyz, bmax.xyz,
  0, 0] with clusters on the lane axis;
- outputs pack [t, nx, ny, nz, u, v] into one (NB, B, 8) f32 buffer plus
  an (NB, B, 1) int32 winning-triangle id.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.mathx import BIG

import os

# rays per traversal block. Swept on the chip (round 3): 256 -> 15.4 ms,
# 512 -> 13.0, 1024 -> 11.6 per 262k sorted rays on the teapot scene;
# 2048 blows the VMEM budget for the (B, L) intermediates.
BLOCK = int(os.environ.get("HRT_BLOCK", "1024"))
# rays per coherence-key block. NOTE the (TB, K) slab intermediates pad K
# up to a full 128-lane row, so VMEM cost is ~10 * TB * 128 * 4 B; 8192
# blows the 16 MB scoped-vmem limit (measured), 2048 fits comfortably.
KEY_BLOCK = int(os.environ.get("HRT_KEY_BLOCK", "2048"))
SOA_ROWS = 24        # v0,e1,e2 (9) + n0,n1,n2 (9) + uv0,uv1,uv2 (6)
# Winner-pick via MXU matmuls instead of VPU one-hot reductions.
# Default OFF: at HIGHEST (true-f32) matmul precision the MXU pass costs
# more than the VPU reductions it replaces on this chip (4.97M vs 5.78M
# rays/s, PERF.md round 4) — the briefly-measured +2% was DEFAULT
# precision silently truncating normals/UVs to bf16. Kept as a knob for
# chips where the f32 matmul economics differ.
MXU_PICK = os.environ.get("HRT_MXU_PICK", "0") != "0"
# Grid-axis semantics for the traversal kernel ("parallel" lets Mosaic
# spread ray blocks across TensorCores; flat on 1-core v5e, PERF.md).
# Read ONCE at import like every other knob (trace-time env reads are
# invisible to the jit cache).
DIM_SEM = os.environ.get("HRT_DIM_SEM", "parallel")
# Total scoped-VMEM budget the kernel may plan against (the hardware
# limit is 16 MB; leave slack for Mosaic's own staging buffers).
VMEM_BUDGET_BYTES = 14 * 1024 * 1024
_INF = float("inf")


def mesh_fits_vmem(k_clusters: int, leaf: int) -> bool:
    """Whether the fused kernel can hold BOTH the resident mesh tables AND
    its per-block working set at the current BLOCK size. The working set
    scales with BLOCK: the (B, K) slab-entry matrix plus ~12 (B, L) f32
    Moller-Trumbore/interpolation temporaries — raising BLOCK 256->1024
    (round 3) shrank the admissible mesh accordingly; oversized meshes
    fall back to the XLA traversal (ir._resolve_mesh_backend warns)."""
    tables = k_clusters * (32 * leaf * 4 + leaf * 4)  # SoA padded 24->32
    block_ws = BLOCK * k_clusters * 4 + 12 * BLOCK * leaf * 4
    return tables + block_ws <= VMEM_BUDGET_BYTES


def pack_mesh_soa(tri_verts, tri_normals, tri_uvs):
    """(K,L,3,3) verts / (K,L,3,3) corner normals / (K,L,3,2) corner UVs
    -> (K, 24, L) SoA with triangles on the minor (lane) axis."""
    v0 = tri_verts[:, :, 0, :]
    e1 = tri_verts[:, :, 1, :] - v0
    e2 = tri_verts[:, :, 2, :] - v0
    cols = [v0, e1, e2,
            tri_normals[:, :, 0, :], tri_normals[:, :, 1, :],
            tri_normals[:, :, 2, :],
            tri_uvs[:, :, 0, :], tri_uvs[:, :, 1, :], tri_uvs[:, :, 2, :]]
    soa = jnp.concatenate(cols, axis=2)                   # (K, L, 24)
    return jnp.swapaxes(soa, 1, 2)                        # (K, 24, L)


def pack_bounds(bmin, bmax):
    """(K,3)/(K,3) cluster bounds -> (8, K) f32 rows [bmin.xyz, bmax.xyz,
    0, 0] (clusters on the lane axis)."""
    rows = jnp.concatenate([bmin.T, bmax.T,
                            jnp.zeros((2, bmin.shape[0]), jnp.float32)],
                           axis=0)
    return rows.astype(jnp.float32)


def _slab_entries(r, bounds, t_max: float):
    """Block-local cluster slab test (aabb.h:26-39 semantics as in
    ops/intersect.py:cluster_entries). r: (B, 8) packed rays, bounds:
    (8, K). Returns (B, K) entry distance (>=0), +inf where missed or the
    lane is invalid."""
    valid = r[:, 6:7] > 0.0
    lo = None
    hi = None
    for ax in range(3):
        o_ax = r[:, ax:ax + 1]                            # (B,1)
        d_ax = r[:, 3 + ax:4 + ax]
        inv = 1.0 / jnp.where(jnp.abs(d_ax) < 1e-30, 1e-30, d_ax)
        t0 = (bounds[ax:ax + 1, :] - o_ax) * inv          # (B,K)
        t1 = (bounds[3 + ax:4 + ax, :] - o_ax) * inv
        lo_ax = jnp.minimum(t0, t1)
        hi_ax = jnp.maximum(t0, t1)
        lo = lo_ax if lo is None else jnp.maximum(lo, lo_ax)
        hi = hi_ax if hi is None else jnp.minimum(hi, hi_ax)
    entry = jnp.maximum(lo, 0.0)
    ok = (hi > entry) & (entry < t_max) & valid
    return jnp.where(ok, entry, _INF)


def _kernel(rays_ref, bounds_ref, tri_ref, id_ref,
            out_f, out_i, fb, ib, k_clusters: int, t_max: float,
            need_uv: bool = True):
    r = rays_ref[0]                      # (B, 8)
    ox, oy, oz = r[:, 0:1], r[:, 1:2], r[:, 2:3]     # (B,1)
    dx, dy, dz = r[:, 3:4], r[:, 4:5], r[:, 5:6]
    valid = r[:, 6:7] > 0.0
    b = r.shape[0]

    ch = jax.lax.broadcasted_iota(jnp.int32, (b, 8), 1)
    fb[:] = jnp.where(ch == 0, BIG, 0.0)  # channel 0 = t, rest zero
    ib[:] = jnp.full(ib.shape, -1, jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, tri_ref.shape[2]), 1)
    klane = jax.lax.broadcasted_iota(jnp.int32, (1, k_clusters), 1)

    entry = _slab_entries(r, bounds_ref[:], t_max)        # (B,K)
    block_e = jnp.min(entry, axis=0, keepdims=True)       # (1,K)

    def cond(c):
        rem, worst = c
        # visit while the nearest unvisited cluster could still win
        return jnp.min(rem) < worst

    def body(c):
        rem, worst = c
        # nearest unvisited cluster (scalar argmin as min+first-match —
        # plain scalar reductions, no argmin-to-scalar lowering needed)
        e_cur = jnp.min(rem)
        k = jnp.min(jnp.where(rem == e_cur, klane, k_clusters))
        blk = tri_ref[k]                 # (24, L) VMEM read
        ids = id_ref[pl.ds(k, 1), :]     # (1, L) int32
        v0x, v0y, v0z = blk[0:1, :], blk[1:2, :], blk[2:3, :]   # (1,L)
        e1x, e1y, e1z = blk[3:4, :], blk[4:5, :], blk[5:6, :]
        e2x, e2y, e2z = blk[6:7, :], blk[7:8, :], blk[8:9, :]
        # Moller-Trumbore, all ops (B, L)
        px = dy * e2z - dz * e2y
        py = dz * e2x - dx * e2z
        pz = dx * e2y - dy * e2x
        det = e1x * px + e1y * py + e1z * pz
        inv = 1.0 / jnp.where(det == 0.0, 1.0, det)
        tx = ox - v0x
        ty = oy - v0y
        tz = oz - v0z
        u = (tx * px + ty * py + tz * pz) * inv
        qx = ty * e1z - tz * e1y
        qy = tz * e1x - tx * e1z
        qz = tx * e1y - ty * e1x
        v = (dx * qx + dy * qy + dz * qz) * inv
        t = (e2x * qx + e2y * qy + e2z * qz) * inv
        good = ((det != 0.0) & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
                & (t > 0.0) & (t <= t_max) & (ids >= 0))
        t = jnp.where(good, t, BIG)
        t_min = jnp.min(t, axis=1, keepdims=True)             # (B,1)
        take = (t_min < fb[:, 0:1]) & valid
        # deterministic winning lane (first minimum): one-hot sum-select
        win = jnp.argmin(t, axis=1)[:, None]                  # (B,1)
        hot = (lane == win) & good                            # (B,L)

        def pick(x):                     # (B,L) -> (B,1) value at win lane
            return jnp.sum(jnp.where(hot, x, 0.0), axis=1, keepdims=True)

        # smooth normal + UV from MT barycentrics (triangle.cpp:112-128);
        # UV interpolation is STATICALLY skipped when no material in the
        # scene samples a texture (need_uv=False saves ~2 (B,L) picks and
        # 10 interp ops per visit)
        w0 = 1.0 - u - v
        if MXU_PICK:
            # pack interpolation + winner-pick into 3 small matmuls:
            # out[b,a] = sum_l hot*(w0*A0[a]+u*A1[a]+v*A2[a]). NOTE:
            # measured SLOWER than the VPU reductions at true-f32
            # precision on v5e (see MXU_PICK above) — off by default
            if need_uv:
                a0 = jnp.concatenate([blk[9:12, :], blk[18:20, :]], 0)
                a1 = jnp.concatenate([blk[12:15, :], blk[20:22, :]], 0)
                a2 = jnp.concatenate([blk[15:18, :], blk[22:24, :]], 0)
            else:
                a0, a1, a2 = blk[9:12, :], blk[12:15, :], blk[15:18, :]

            def mm(w_bl, a_rl):                  # (B,L)x(A,L) -> (B,A)
                # HIGHEST precision: the default truncates f32 MXU
                # inputs to bf16 (~8 mantissa bits lost on normals/UVs)
                return jax.lax.dot_general(
                    w_bl, a_rl, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST)

            # mask by SELECT, not multiply: a degenerate sliver in a
            # NON-winning lane can have inf/NaN barycentrics, and
            # 0 * inf = NaN would ride the contraction into the winning
            # ray's attributes
            z = jnp.float32(0.0)
            attr = (mm(jnp.where(hot, w0, z), a0)
                    + mm(jnp.where(hot, u, z), a1)
                    + mm(jnp.where(hot, v, z), a2))   # (B, 5|3)
            pad_w = 2 if need_uv else 4
            cand = jnp.concatenate(
                [t_min, attr, jnp.zeros((b, pad_w), jnp.float32)], axis=1)
        else:
            nx = (w0 * blk[9:10, :] + u * blk[12:13, :]
                  + v * blk[15:16, :])
            ny = (w0 * blk[10:11, :] + u * blk[13:14, :]
                  + v * blk[16:17, :])
            nz = (w0 * blk[11:12, :] + u * blk[14:15, :]
                  + v * blk[17:18, :])
            if need_uv:
                uu = (w0 * blk[18:19, :] + u * blk[20:21, :]
                      + v * blk[22:23, :])
                vv = (w0 * blk[19:20, :] + u * blk[21:22, :]
                      + v * blk[23:24, :])
                uv_cols = [pick(uu), pick(vv)]
            else:
                uv_cols = [jnp.zeros((b, 2), jnp.float32)]
            cand = jnp.concatenate(
                [t_min, pick(nx), pick(ny), pick(nz)] + uv_cols
                + [jnp.zeros((b, 2), jnp.float32)], axis=1)  # (B,8)
        id_win = jnp.sum(jnp.where(hot, ids, 0), axis=1,
                         keepdims=True)                       # (B,1)
        fb[:] = jnp.where(take, cand, fb[:])
        ib[:] = jnp.where(take, id_win, ib[:])
        worst = jnp.max(jnp.where(valid, fb[:, 0:1], -BIG))
        rem = jnp.where(klane == k, _INF, rem)                # mark visited
        return rem, worst

    jax.lax.while_loop(cond, body, (block_e, jnp.float32(BIG)))
    out_f[0] = fb[:]
    out_i[0] = ib[:]


@functools.partial(jax.jit, static_argnames=("t_max", "interpret",
                                             "need_uv"))
def traverse_clusters_pallas(rays8, bounds8, tri_soa, tri_id,
                             t_max: float = float(BIG),
                             interpret: bool = False,
                             need_uv: bool = True):
    """rays8: (NB, B, 8) packed rays; bounds8: (8, K) cluster bounds
    (pack_bounds); tri_soa: (K, 24, L) f32 (pack_mesh_soa); tri_id: (K, L)
    int32. Returns (out (NB, B, 8) f32 = [t nx ny nz u v 0 0],
    tri_id_best (NB, B) int32)."""
    nb, b, _ = rays8.shape
    k_clusters, rows, leaf = tri_soa.shape
    assert rows == SOA_ROWS, rows
    assert bounds8.shape == (8, k_clusters), bounds8.shape
    kern = functools.partial(_kernel, k_clusters=k_clusters,
                             t_max=float(t_max), need_uv=need_uv)
    # Ray blocks are independent: declare the grid axis parallel so
    # Mosaic may spread blocks over however many TensorCores the chip
    # has. Measured on the bench chip (TPU v5e, ONE TensorCore): no
    # change vs arbitrary (PERF.md round 4) — kept because it is the
    # correct semantic declaration and multi-core chips (v4/v5p) get
    # the split for free. HRT_DIM_SEM overrides for experiments.
    params = (pltpu.CompilerParams(dimension_semantics=(DIM_SEM,))
              if DIM_SEM else None)
    out_f, out_i = pl.pallas_call(
        kern,
        grid=(nb,),
        compiler_params=params,
        in_specs=[
            pl.BlockSpec((1, b, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k_clusters), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_clusters, SOA_ROWS, leaf), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k_clusters, leaf), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, b, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, b, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nb, b, 8), jnp.float32),
            jax.ShapeDtypeStruct((nb, b, 1), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, 8), jnp.float32),
            pltpu.VMEM((b, 1), jnp.int32),
        ],
        interpret=interpret,
    )(rays8, bounds8, tri_soa, tri_id)
    return out_f, out_i[..., 0]


def _key_kernel(rays_ref, bounds_ref, out_e, out_k, t_max: float):
    r = rays_ref[0]                                        # (TB, 8)
    entry = _slab_entries(r, bounds_ref[:], t_max)         # (TB, K)
    k = entry.shape[1]
    klane = jax.lax.broadcasted_iota(jnp.int32, entry.shape, 1)
    e_min = jnp.min(entry, axis=1, keepdims=True)          # (TB, 1)
    # first-minimum index via min+match (Mosaic rejects argmin over f32
    # vectors: unresolved f32->i32 materialization)
    first = jnp.min(jnp.where(entry == e_min, klane, k), axis=1)
    out_e[0, 0] = e_min[:, 0]
    out_k[0, 0] = jnp.where(jnp.isfinite(e_min[:, 0]), first, 0)


@functools.partial(jax.jit, static_argnames=("t_max", "interpret"))
def coherence_keys_pallas(rays8, bounds8, t_max: float = float(BIG),
                          interpret: bool = False):
    """Per-ray (nearest cluster entry distance, nearest cluster id) for the
    wavefront coherence sort. rays8: (NT, TB, 8); bounds8: (8, K).
    Returns (e_min (NT, 1, TB) f32 [+inf = misses every cluster],
    first (NT, 1, TB) int32)."""
    nt, tb, _ = rays8.shape
    k_clusters = bounds8.shape[1]
    kern = functools.partial(_key_kernel, t_max=float(t_max))
    return pl.pallas_call(
        kern,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((1, tb, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, k_clusters), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # unit sublane axis: a (1, TB) block fails the TPU tiling
            # rule (second-to-last dim must be a multiple of 8 or equal
            # to the array's), a (1, 1, TB) block satisfies it exactly
            pl.BlockSpec((1, 1, tb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, tb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((nt, 1, tb), jnp.float32),
            jax.ShapeDtypeStruct((nt, 1, tb), jnp.int32),
        ],
        interpret=interpret,
    )(rays8, bounds8)

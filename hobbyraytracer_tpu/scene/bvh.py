"""Host-side BVH build: uniform-leaf cluster hierarchy (numpy).

The reference builds a per-mesh pointer BVH with random split axis +
median-split sorting (BVHNode, bvh.cpp:6-61) and traverses it recursively
per ray (bvh.cpp:69-78). Pointer-chasing per-ray traversal is the wrong
shape for a TPU (per-lane divergence, scalar gathers), so the new layout is
a *flattened two-level BVH with uniform leaves*:

- triangles are recursively median-split on the centroid's longest axis
  (same spirit as the reference's sort-based build) until each leaf
  ("cluster") holds <= leaf_size triangles;
- every cluster is padded to exactly leaf_size with degenerate triangles,
  so the device arrays are rectangular: tri vertices (K, L, 3, 3), global
  triangle ids (K, L), cluster bounds (K, 3)+(K, 3);
- traversal on device is dense and divergence-free: slab-test all K
  cluster boxes per ray (vector ops), pick the C nearest-entry hit
  clusters, and run the watertight triangle test on those clusters'
  gathered triangles (ops/intersect.py:triangle_t on (R, C*L, 3) blocks).

A deeper hierarchy is unnecessary at these scene sizes (K <= a few
hundred): the dense ray x cluster test is a few vector ops per ray and the
leaf work is bounded by C*L.

A native C++ builder (native/) can override `median_split_order` for large
meshes; the numpy build handles the reference's scene sizes (~6.3k tris)
in milliseconds.
"""
from __future__ import annotations

import os

import numpy as np

# HRT_BVH_SAH: constrained surface-area-heuristic cluster build (see
# sah_split_order) instead of the longest-axis median split. DEFAULT ON
# (round-5 benches: teapot +1%, two-teapot +2%, 105k-tri hires +11% —
# tighter boxes mean fewer cluster visits per ray block); set
# HRT_BVH_SAH=0 for the median build. Native C++ SAH
# (hrt_build_clusters_sah) runs when built; the numpy fallback costs
# ~2.4 s at 105k tris. Read once at import like every other knob.
BVH_SAH = os.environ.get("HRT_BVH_SAH", "1") != "0"


def median_split_order(centroids: np.ndarray, leaf_size: int) -> list:
    """Recursively median-split triangle indices; returns a list of index
    arrays, each of length <= leaf_size."""
    out = []

    def split(idx):
        if len(idx) <= leaf_size:
            out.append(idx)
            return
        c = centroids[idx]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        half = len(idx) // 2
        split(idx[order[:half]])
        split(idx[order[half:]])

    split(np.arange(len(centroids), dtype=np.int64))
    return out


def sah_split_order(tri_verts: np.ndarray, leaf_size: int) -> list:
    """Constrained surface-area-heuristic split (HRT_BVH_SAH=1): like
    median_split_order, but each recursion picks BOTH the axis AND the
    split position (restricted to multiples of leaf_size so leaves stay
    full — padding waste costs kernel work) by minimizing the standard
    SAH cost SA(left)*n_left + SA(right)*n_right over prefix boxes.

    On the teapot (3720 tris, L=128) this cuts the summed cluster
    surface area 178 -> 157 (-12%) and K 32 -> 30 vs the median split;
    slab-entry probability per random ray is proportional to SA, so
    fewer clusters open per block. tri_verts: (T,3,3)."""
    cent = tri_verts.mean(axis=1)
    out = []

    def sa_prefix(t):
        p = t.reshape(len(t), -1, 3)
        mn = np.minimum.accumulate(p.min(axis=1), axis=0)
        mx = np.maximum.accumulate(p.max(axis=1), axis=0)
        e = mx - mn
        return 2 * (e[:, 0] * e[:, 1] + e[:, 1] * e[:, 2]
                    + e[:, 0] * e[:, 2])

    def split(idx):
        n = len(idx)
        if n <= leaf_size:
            out.append(idx)
            return
        best = None
        for ax in range(3):
            o = np.argsort(cent[idx][:, ax], kind="stable")
            sidx = idx[o]
            t = tri_verts[sidx]
            sa_l = sa_prefix(t)
            sa_r = sa_prefix(t[::-1])[::-1]
            cands = np.arange(leaf_size, n, leaf_size)
            cost = sa_l[cands - 1] * cands + sa_r[cands] * (n - cands)
            j = int(np.argmin(cost))
            if best is None or cost[j] < best[0]:
                best = (float(cost[j]), sidx, int(cands[j]))
        _, sidx, c = best
        split(sidx[:c])
        split(sidx[c:])

    split(np.arange(len(tri_verts), dtype=np.int64))
    return out


def build_clusters(verts: np.ndarray, indices: np.ndarray,
                   leaf_size: int = 32):
    """-> dict with:
    tri_verts (K, L, 3, 3) float32 — leaf triangles, padded with degenerate
        (all-zero) triangles that can never intersect (det == 0);
    tri_id (K, L) int32 — global triangle index, -1 for padding;
    bmin/bmax (K, 3) float32 — cluster bounds (padded ±1e-4 like the
        reference's triangle boxes, triangle.cpp:42-55).
    """
    from ..native import build_clusters as native_build
    native = native_build(verts, indices, leaf_size, sah=BVH_SAH)
    if native is not None:
        return native
    verts = np.asarray(verts, np.float32)
    indices = np.asarray(indices, np.int64)
    tv = verts[indices]                     # (T, 3, 3)
    centroids = tv.mean(axis=1)             # (T, 3)
    leaves = (sah_split_order(tv, leaf_size) if BVH_SAH
              else median_split_order(centroids, leaf_size))
    k = len(leaves)
    tri_verts = np.zeros((k, leaf_size, 3, 3), np.float32)
    tri_id = np.full((k, leaf_size), -1, np.int32)
    bmin = np.zeros((k, 3), np.float32)
    bmax = np.zeros((k, 3), np.float32)
    for i, leaf in enumerate(leaves):
        n = len(leaf)
        tri_verts[i, :n] = tv[leaf]
        tri_id[i, :n] = leaf
        lo = tv[leaf].reshape(-1, 3).min(axis=0) - 1e-4
        hi = tv[leaf].reshape(-1, 3).max(axis=0) + 1e-4
        bmin[i] = lo
        bmax[i] = hi
    return {"tri_verts": tri_verts, "tri_id": tri_id,
            "bmin": bmin, "bmax": bmax}


def build_sphere_clusters(center: np.ndarray, radius: np.ndarray,
                          leaf_size: int = 128) -> dict:
    """Cluster a sphere table for the Pallas sphere kernel
    (kernels/sphere_traverse.py): median-split the centers into groups
    of <= leaf_size (same spatially-tight build as the triangle
    clusters), pad each group to exactly leaf_size, and pack

    - table   (K, 8, L) f32 rows [cx cy cz r2 0 0 0 0] (pad r2 = -1:
              discriminant always negative -> never hits),
    - bounds8 (8, K) f32 [bmin.xyz bmax.xyz 0 0] per cluster
              (union of center +- radius over REAL spheres),
    - ids     (K, L) int32 GLOBAL sphere indices (-1 pad) — the
              original SphereTable stays unpermuted; attribute gathers
              use these ids directly.
    """
    center = np.asarray(center, np.float32)
    radius = np.asarray(radius, np.float32)
    groups = median_split_order(center, leaf_size)
    k = len(groups)
    table = np.zeros((k, 8, leaf_size), np.float32)
    table[:, 3, :] = -1.0
    ids = np.full((k, leaf_size), -1, np.int32)
    bmin = np.empty((k, 3), np.float32)
    bmax = np.empty((k, 3), np.float32)
    for gi, g in enumerate(groups):
        n = len(g)
        c = center[g]
        r = np.abs(radius[g])
        table[gi, 0, :n] = c[:, 0]
        table[gi, 1, :n] = c[:, 1]
        table[gi, 2, :n] = c[:, 2]
        table[gi, 3, :n] = radius[g] * radius[g]
        ids[gi, :n] = g
        bmin[gi] = (c - r[:, None]).min(axis=0)
        bmax[gi] = (c + r[:, None]).max(axis=0)
    bounds8 = np.concatenate(
        [bmin.T, bmax.T, np.zeros((2, k), np.float32)], axis=0)
    return {"table": table, "bounds8": bounds8.astype(np.float32),
            "ids": ids}

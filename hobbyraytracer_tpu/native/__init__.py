"""ctypes bindings for the native host-side module (objbvh.cpp).

Replaces the reference's native assimp import + BVH build path with our own
C++ (pybind11 isn't available in this image; plain C ABI + ctypes is).
`lib()` lazily builds/loads libhrtnative.so; every caller must handle a
None return (pure-python fallback). Set HRT_NO_NATIVE=1 to force the
fallbacks.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_LIB = None
_TRIED = False


def lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("HRT_NO_NATIVE"):
        return None
    so = os.path.join(_HERE, "libhrtnative.so")
    src = os.path.join(_HERE, "objbvh.cpp")
    stale = (not os.path.exists(so)
             or (os.path.exists(src)
                 and os.path.getmtime(src) > os.path.getmtime(so)))
    if stale:
        try:
            subprocess.run(["make", "-B", "-C", _HERE], check=True,
                           capture_output=True, timeout=120)
        except Exception as e:  # toolchain missing: fall back silently
            print(f"[native] build skipped ({type(e).__name__}); "
                  "using python fallbacks")
            return None
    try:
        L = ctypes.CDLL(so)
    except OSError as e:
        print(f"[native] load failed ({e}); using python fallbacks")
        return None

    L.hrt_parse_obj.restype = ctypes.c_void_p
    L.hrt_parse_obj.argtypes = [ctypes.c_char_p]
    L.hrt_mesh_counts.argtypes = [ctypes.c_void_p,
                                  ctypes.POINTER(ctypes.c_int32),
                                  ctypes.POINTER(ctypes.c_int32)]
    L.hrt_mesh_copy.argtypes = [ctypes.c_void_p] + [
        np.ctypeslib.ndpointer(np.float32)] * 3 + [
        np.ctypeslib.ndpointer(np.int32)]
    L.hrt_mesh_free.argtypes = [ctypes.c_void_p]
    cluster_sig = [
        np.ctypeslib.ndpointer(np.float32), ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32), ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32),
        np.ctypeslib.ndpointer(np.float32),
        np.ctypeslib.ndpointer(np.float32)]
    L.hrt_build_clusters.restype = ctypes.c_int32
    L.hrt_build_clusters.argtypes = cluster_sig
    L.hrt_build_clusters_sah.restype = ctypes.c_int32
    L.hrt_build_clusters_sah.argtypes = cluster_sig
    _LIB = L
    return _LIB


def parse_obj(path: str):
    """Native OBJ parse -> dict like objloader.parse_obj, or None."""
    L = lib()
    if L is None:
        return None
    h = L.hrt_parse_obj(path.encode())
    if not h:
        return None
    nv = ctypes.c_int32()
    nt = ctypes.c_int32()
    L.hrt_mesh_counts(h, ctypes.byref(nv), ctypes.byref(nt))
    verts = np.empty((nv.value, 3), np.float32)
    normals = np.empty((nv.value, 3), np.float32)
    uvs = np.empty((nv.value, 2), np.float32)
    indices = np.empty((nt.value, 3), np.int32)
    L.hrt_mesh_copy(h, verts, normals, uvs, indices)
    L.hrt_mesh_free(h)
    return {"verts": verts, "normals": normals, "uvs": uvs,
            "indices": indices}


def build_clusters(verts: np.ndarray, indices: np.ndarray, leaf_size: int,
                   sah: bool = False):
    """Native cluster build -> dict like bvh.build_clusters (minus
    tri_verts, which callers regather), or None. sah=True runs the
    constrained SAH builder (hrt_build_clusters_sah)."""
    L = lib()
    if L is None:
        return None
    verts = np.ascontiguousarray(verts, np.float32)
    indices = np.ascontiguousarray(indices, np.int32)
    n_tris = len(indices)
    max_k = 2 * (n_tris // max(1, leaf_size // 2) + 2)
    tri_id = np.empty((max_k, leaf_size), np.int32)
    bmin = np.empty((max_k, 3), np.float32)
    bmax = np.empty((max_k, 3), np.float32)
    fn = L.hrt_build_clusters_sah if sah else L.hrt_build_clusters
    k = fn(verts, len(verts), indices, n_tris,
           leaf_size, max_k, tri_id, bmin, bmax)
    if k <= 0:
        return None
    tv = verts[indices]
    tri_verts = np.zeros((k, leaf_size, 3, 3), np.float32)
    valid = tri_id[:k] >= 0
    tri_verts[valid] = tv[tri_id[:k][valid]]
    return {"tri_id": tri_id[:k].copy(), "bmin": bmin[:k].copy(),
            "bmax": bmax[:k].copy(), "tri_verts": tri_verts}

"""Multi-format mesh import (replaces assimp's ReadFile, mesh.cpp:53-120).

The reference loads meshes through assimp, which accepts dozens of formats
(mesh.cpp:56); its shipped scenes only use OBJ. `load_mesh` dispatches on
extension to dependency-free host-side parsers for the formats that cover
practical interchange:

- .obj             scene/objloader.py (native C++ fast path when built)
- .ply             ascii + binary_little_endian, shared vertices,
                   optional per-vertex normals (nx..) and UVs (u,v / s,t)
- .stl             binary + ascii; faceted (per-face normals replicated
                   to corners, no UVs, no vertex sharing — like assimp's
                   raw STL import)
- .gltf / .glb     glTF 2.0 triangles: POSITION/NORMAL/TEXCOORD_0 +
                   indices accessors; GLB container, external .bin, and
                   base64 data URIs. All mesh primitives are concatenated
                   WITHOUT node transforms — exactly the reference's
                   behavior of reading scene->mMeshes directly
                   (mesh.cpp:63-115); bake transforms upstream if needed.

All loaders return the same dict as parse_obj (verts/normals/uvs/indices,
float32/int32), V texture coordinate flipped like assimp FlipUVs, missing
normals/uvs zero-filled (mesh.cpp:87-99).
"""
from __future__ import annotations

import base64
import json
import os
import struct

import numpy as np

from . import objloader


def load_mesh(path: str) -> dict:
    """Parse a mesh file by extension -> dict(verts (V,3) f32,
    normals (V,3) f32, uvs (V,2) f32, indices (T,3) i32).

    Any malformed-file failure is normalized to ValueError so callers'
    log-and-skip policy (scene/build.py, matching assimp's mesh.cpp:58-61
    behavior) applies uniformly — truncated GLBs raise struct.error,
    missing glTF fields KeyError, bad JSON JSONDecodeError, etc."""
    ext = os.path.splitext(path)[1].lower()
    try:
        if ext == ".ply":
            return parse_ply(path)
        if ext == ".stl":
            return parse_stl(path)
        if ext in (".gltf", ".glb"):
            return parse_gltf(path)
        # default: OBJ (also covers extensionless paths, like the
        # reference's assimp which sniffs content)
        return objloader.parse_obj(path)
    except (OSError, ValueError):
        raise
    except Exception as e:  # struct.error, KeyError, JSONDecodeError, ...
        raise ValueError(f"malformed mesh file {path}: "
                         f"{type(e).__name__}: {e}") from e


def _finish(verts, normals, uvs, tris, path):
    if len(tris) == 0:
        raise ValueError(f"no faces in mesh file: {path}")
    v = np.asarray(verts, np.float32).reshape(-1, 3)
    n = (np.asarray(normals, np.float32).reshape(-1, 3)
         if normals is not None and len(normals)
         else np.zeros_like(v))
    t = (np.asarray(uvs, np.float32).reshape(-1, 2)
         if uvs is not None and len(uvs)
         else np.zeros((len(v), 2), np.float32))
    idx = np.asarray(tris, np.int32).reshape(-1, 3)
    if idx.min() < 0 or idx.max() >= len(v):
        raise ValueError(f"face index out of range in {path}")
    return {"verts": v, "normals": n, "uvs": t, "indices": idx}


# -------------------------------------------------------------------- PLY

_PLY_DTYPES = {
    "char": "i1", "int8": "i1", "uchar": "u1", "uint8": "u1",
    "short": "i2", "int16": "i2", "ushort": "u2", "uint16": "u2",
    "int": "i4", "int32": "i4", "uint": "u4", "uint32": "u4",
    "float": "f4", "float32": "f4", "double": "f8", "float64": "f8",
}


def parse_ply(path: str) -> dict:
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"not a PLY file: {path}")
        fmt = None
        elements = []  # (name, count, [(prop_name, dtype) | list prop])
        cur = None
        while True:
            line = f.readline()
            if not line:
                raise ValueError(f"unterminated PLY header: {path}")
            parts = line.decode("ascii", "replace").split()
            if not parts or parts[0] == "comment":
                continue
            if parts[0] == "format":
                fmt = parts[1]
            elif parts[0] == "element":
                cur = (parts[1], int(parts[2]), [])
                elements.append(cur)
            elif parts[0] == "property":
                if parts[1] == "list":
                    cur[2].append((parts[4], ("list", _PLY_DTYPES[parts[2]],
                                              _PLY_DTYPES[parts[3]])))
                else:
                    cur[2].append((parts[2], _PLY_DTYPES[parts[1]]))
            elif parts[0] == "end_header":
                break
        if fmt not in ("ascii", "binary_little_endian"):
            raise ValueError(f"unsupported PLY format {fmt!r}: {path}")

        data = {}
        for name, count, props in elements:
            if fmt == "ascii":
                rows = []
                for _ in range(count):
                    toks = f.readline().split()
                    row = {}
                    i = 0
                    for pname, pt in props:
                        if isinstance(pt, tuple):
                            n = int(toks[i]); i += 1
                            row[pname] = [float(x) for x in toks[i:i + n]]
                            i += n
                        else:
                            row[pname] = float(toks[i]); i += 1
                    rows.append(row)
                data[name] = rows
            else:
                if all(not isinstance(pt, tuple) for _, pt in props):
                    # vectorized fast path: keep the structured array
                    # (building per-row dicts for a 1M-vertex PLY would
                    # allocate millions of Python objects)
                    dt = np.dtype([(pname, "<" + pt) for pname, pt in props])
                    data[name] = np.frombuffer(
                        f.read(dt.itemsize * count), dt)
                else:
                    rows = []
                    for _ in range(count):
                        row = {}
                        for pname, pt in props:
                            if isinstance(pt, tuple):
                                _, cnt_t, val_t = pt
                                cdt = np.dtype("<" + cnt_t)
                                n = int(np.frombuffer(f.read(cdt.itemsize),
                                                      cdt)[0])
                                vdt = np.dtype("<" + val_t)
                                row[pname] = np.frombuffer(
                                    f.read(vdt.itemsize * n), vdt).tolist()
                            else:
                                vdt = np.dtype("<" + pt)
                                row[pname] = float(np.frombuffer(
                                    f.read(vdt.itemsize), vdt)[0])
                        rows.append(row)
                    data[name] = rows

    vrows = data.get("vertex", [])
    if isinstance(vrows, np.ndarray):  # binary fast path: column slices
        names = vrows.dtype.names

        def colv(*ks):
            return np.stack([vrows[k].astype(np.float32) for k in ks],
                            axis=1)

        verts = colv("x", "y", "z")
        has_n = all(k in names for k in ("nx", "ny", "nz"))
        normals = colv("nx", "ny", "nz") if has_n else []
        ukey = ("u", "v") if "u" in names else ("s", "t")
        has_uv = ukey[0] in names and ukey[1] in names
        if has_uv:
            uvs = colv(*ukey)
            uvs[:, 1] = 1.0 - uvs[:, 1]  # FlipUVs
        else:
            uvs = []
    else:
        verts = [(r["x"], r["y"], r["z"]) for r in vrows]
        has_n = vrows and all(k in vrows[0] for k in ("nx", "ny", "nz"))
        normals = ([(r["nx"], r["ny"], r["nz"]) for r in vrows]
                   if has_n else [])
        ukey = ("u", "v") if vrows and "u" in vrows[0] else ("s", "t")
        has_uv = vrows and ukey[0] in vrows[0] and ukey[1] in vrows[0]
        uvs = ([(r[ukey[0]], 1.0 - r[ukey[1]]) for r in vrows]  # FlipUVs
               if has_uv else [])
    tris = []
    for r in data.get("face", []):
        ids = [int(i) for i in
               r.get("vertex_indices", r.get("vertex_index", []))]
        for i in range(1, len(ids) - 1):  # fan triangulation
            tris.append((ids[0], ids[i], ids[i + 1]))
    return _finish(verts, normals, uvs, tris, path)


# -------------------------------------------------------------------- STL

def parse_stl(path: str) -> dict:
    with open(path, "rb") as f:
        head = f.read(80)
        rest = f.read()
    # binary STL: 80-byte header + u32 count + 50 bytes/tri. "solid" in
    # the header alone does NOT mean ascii — check the size equation
    # (>=: many exporters append trailing padding/newlines).
    if len(rest) >= 4:
        (n_tris,) = struct.unpack("<I", rest[:4])
        if n_tris > 0 and len(rest) >= 4 + 50 * n_tris:
            # per tri: normal(3) v0(3) v1(3) v2(3) + u16 attr (skipped
            # via the structured view)
            rec = np.frombuffer(
                rest[4:4 + 50 * n_tris],
                np.dtype([("n", "<f4", 3), ("v", "<f4", (3, 3)),
                          ("attr", "<u2")]))
            verts = rec["v"].reshape(-1, 3)
            normals = np.repeat(rec["n"], 3, axis=0)
            tris = np.arange(len(verts), dtype=np.int32).reshape(-1, 3)
            return _finish(verts, normals, None, tris, path)
    # ascii STL
    verts, normals, tris = [], [], []
    cur_n = (0.0, 0.0, 0.0)
    for line in (head + rest).decode("ascii", "replace").splitlines():
        toks = line.split()
        if not toks:
            continue
        if toks[0] == "facet" and len(toks) >= 5:
            cur_n = tuple(float(x) for x in toks[2:5])
        elif toks[0] == "vertex":
            verts.append(tuple(float(x) for x in toks[1:4]))
            normals.append(cur_n)
            if len(verts) % 3 == 0:
                tris.append((len(verts) - 3, len(verts) - 2,
                             len(verts) - 1))
    return _finish(verts, normals, None, tris, path)


# ------------------------------------------------------------------- glTF

_GLTF_COMP = {5120: "i1", 5121: "u1", 5122: "i2", 5123: "u2",
              5125: "u4", 5126: "f4"}
_GLTF_NCOMP = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4}


def _gltf_buffers(doc, path, bin_chunk):
    bufs = []
    for b in doc.get("buffers", []):
        uri = b.get("uri")
        if uri is None:
            bufs.append(bin_chunk)
        elif uri.startswith("data:"):
            bufs.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(os.path.dirname(path), uri), "rb") as f:
                bufs.append(f.read())
    return bufs


def _gltf_accessor(doc, bufs, idx):
    acc = doc["accessors"][idx]
    if "sparse" in acc:
        # fail loudly: silently ignoring the sparse substitution would
        # load wrong geometry (ADVICE r3: was a KeyError-driven skip)
        raise ValueError("glTF sparse accessors are not supported "
                         f"(accessor {idx})")
    view = doc["bufferViews"][acc["bufferView"]]
    buf = bufs[view.get("buffer", 0)]
    comp = np.dtype("<" + _GLTF_COMP[acc["componentType"]])
    ncomp = _GLTF_NCOMP[acc["type"]]
    count = acc["count"]
    offset = view.get("byteOffset", 0) + acc.get("byteOffset", 0)
    elem = comp.itemsize * ncomp
    stride = view.get("byteStride") or elem
    if stride == elem:  # tightly packed: one vectorized read
        out = np.frombuffer(buf, comp, count * ncomp, offset
                            ).reshape(count, ncomp).copy()
        return _gltf_normalize(out, acc, comp)
    # interleaved: read the whole span as bytes, slice a strided view
    span = np.frombuffer(buf, np.uint8,
                         stride * (count - 1) + elem, offset)
    out = np.lib.stride_tricks.as_strided(
        span, shape=(count, elem), strides=(stride, 1))
    out = out.reshape(-1).view(comp).reshape(count, ncomp).copy()
    return _gltf_normalize(out, acc, comp)


def _gltf_normalize(arr, acc, comp):
    """Apply the accessor `normalized` flag (glTF 2.0 §3.6.2.2): integer
    components map to [0,1] (unsigned) / [-1,1] (signed) floats. Without
    this, spec-valid u8/u16 NORMAL or TEXCOORD_0 data loads as raw
    integers (UVs in 0..255) and shades wrongly (ADVICE r3)."""
    if not acc.get("normalized") or comp.kind == "f":
        return arr
    info = np.iinfo(comp)
    out = arr.astype(np.float32) / np.float32(info.max)
    if info.min < 0:
        out = np.maximum(out, -1.0)
    return out


def parse_gltf(path: str) -> dict:
    bin_chunk = None
    if path.lower().endswith(".glb"):
        with open(path, "rb") as f:
            magic, _version, _length = struct.unpack("<III", f.read(12))
            if magic != 0x46546C67:  # 'glTF'
                raise ValueError(f"not a GLB file: {path}")
            doc = None
            while True:
                hdr = f.read(8)
                if len(hdr) < 8:
                    break
                clen, ctype = struct.unpack("<II", hdr)
                payload = f.read(clen)
                if ctype == 0x4E4F534A:      # 'JSON'
                    doc = json.loads(payload)
                elif ctype == 0x004E4942:    # 'BIN'
                    bin_chunk = payload
        if doc is None:
            raise ValueError(f"GLB has no JSON chunk: {path}")
    else:
        with open(path, "r") as f:
            doc = json.load(f)
    bufs = _gltf_buffers(doc, path, bin_chunk)

    all_v, all_n, all_uv, all_idx = [], [], [], []
    base = 0
    for m in doc.get("meshes", []):
        for prim in m.get("primitives", []):
            if prim.get("mode", 4) != 4:  # TRIANGLES only
                continue
            attrs = prim["attributes"]
            pos = _gltf_accessor(doc, bufs, attrs["POSITION"]
                                 ).astype(np.float32)
            n = (_gltf_accessor(doc, bufs, attrs["NORMAL"]
                                ).astype(np.float32)
                 if "NORMAL" in attrs else np.zeros_like(pos))
            if "TEXCOORD_0" in attrs:
                uv = _gltf_accessor(doc, bufs, attrs["TEXCOORD_0"]
                                    ).astype(np.float32)
                uv = np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=1)  # FlipUVs
            else:
                uv = np.zeros((len(pos), 2), np.float32)  # zero-fill, no
                # flip: the placeholder must match OBJ/PLY/STL's (0,0)
            if "indices" in prim:
                idx = _gltf_accessor(doc, bufs, prim["indices"]
                                     ).astype(np.int64).reshape(-1, 3)
            else:
                idx = np.arange(len(pos), dtype=np.int64).reshape(-1, 3)
            all_v.append(pos)
            all_n.append(n)
            all_uv.append(uv)
            all_idx.append(idx + base)
            base += len(pos)
    if not all_idx:
        raise ValueError(f"no triangle primitives in glTF: {path}")
    return _finish(np.concatenate(all_v), np.concatenate(all_n),
                   np.concatenate(all_uv),
                   np.concatenate(all_idx).astype(np.int32), path)

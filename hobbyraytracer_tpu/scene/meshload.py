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
- .dae             COLLADA 1.4/1.5 <triangles>/<polylist> (fan-
                   triangulated), per-corner expanded, Z_UP honored,
                   node transforms NOT applied (matching the glTF rule)
- .3ds             Autodesk 3DS chunk format: vertex/face/UV chunks of
                   every object, Z-up rotated to Y-up, faceted normals
- .fbx             FBX 7.x binary: Geometry Vertices/PolygonVertexIndex
                   (fan-triangulated), ByPolygonVertex/ByVertice normal
                   and UV layers, zlib-compressed arrays, GlobalSettings
                   UpAxis=Z rotated to Y-up; ASCII FBX and node
                   transforms are not handled

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
        if ext == ".dae":
            return parse_dae(path)
        if ext == ".3ds":
            return parse_3ds(path)
        if ext == ".fbx":
            return parse_fbx(path)
        if ext in (".blend", ".x3d"):
            # fail loudly rather than mis-parse as OBJ; the reference
            # accepts these via assimp (mesh.cpp:56) — export to one of
            # the supported interchange formats instead
            raise ValueError(
                f"unsupported mesh format {ext}: {path} (supported: "
                ".obj .ply .stl .gltf .glb .dae .3ds .fbx)")
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


# ----------------------------------------------------------------- Collada

_DAE_NS = "{http://www.collada.org/2005/11/COLLADASchema}"


def _dae_floats(el):
    if not el.text or not el.text.strip():
        return np.zeros(0, np.float32)
    return np.asarray(el.text.split(), dtype=np.float32)


def parse_dae(path: str) -> dict:
    """COLLADA 1.4/1.5 triangle geometry: <triangles> and all-3 <polylist>
    primitives from every <geometry>, per-corner expanded (multi-offset
    COLLADA indices address position/normal/uv streams independently, so
    corners cannot be shared; scene/build.py's corner dedup re-shares
    identical ones). Honors <up_axis>Z_UP</up_axis> by rotating into the
    renderer's Y-up frame like assimp's converter; V flipped (FlipUVs)."""
    import xml.etree.ElementTree as ET
    ns = _DAE_NS
    root = ET.parse(path).getroot()
    z_up = any(u.text and u.text.strip().upper() == "Z_UP"
               for u in root.iter(ns + "up_axis"))

    all_v, all_n, all_uv = [], [], []
    for geom in root.iter(ns + "geometry"):
        mesh = geom.find(ns + "mesh")
        if mesh is None:
            continue
        sources = {}
        for src in mesh.findall(ns + "source"):
            arr = src.find(ns + "float_array")
            acc = src.find(f"{ns}technique_common/{ns}accessor")
            stride = int(acc.get("stride", "1")) if acc is not None else 3
            if arr is not None:
                sources["#" + src.get("id")] = (
                    _dae_floats(arr).reshape(-1, stride))
        vert_map = {}
        for v_el in mesh.findall(ns + "vertices"):
            pos = None
            for inp in v_el.findall(ns + "input"):
                if inp.get("semantic") == "POSITION":
                    pos = inp.get("source")
            vert_map["#" + v_el.get("id")] = pos
        for prim in (list(mesh.findall(ns + "triangles"))
                     + list(mesh.findall(ns + "polylist"))):
            inputs = []  # (offset, semantic, source_key)
            max_off = 0
            for inp in prim.findall(ns + "input"):
                off = int(inp.get("offset", "0"))
                sem = inp.get("semantic")
                srck = inp.get("source")
                if sem == "VERTEX":
                    srck = vert_map.get(srck, srck)
                    sem = "POSITION"
                inputs.append((off, sem, srck))
                max_off = max(max_off, off)
            stride = max_off + 1
            p_el = prim.find(ns + "p")
            if p_el is None or not p_el.text:
                continue
            p = np.asarray(p_el.text.split(), dtype=np.int64)
            p = p.reshape(-1, stride)
            vc_el = prim.find(ns + "vcount")
            if vc_el is not None and vc_el.text:
                vcount = np.asarray(vc_el.text.split(), dtype=np.int64)
                if not (vcount == 3).all():
                    # fan-triangulate arbitrary polygons (assimp's
                    # Triangulate post-process, mesh.cpp:56)
                    corners = []
                    at = 0
                    for c in vcount:
                        poly = p[at:at + c]
                        for k in range(1, int(c) - 1):
                            corners += [poly[0], poly[k], poly[k + 1]]
                        at += int(c)
                    p = np.stack(corners)
            n_corners = len(p) - len(p) % 3
            p = p[:n_corners]
            v = n = uv = None
            for off, sem, srck in inputs:
                data = sources.get(srck)
                if data is None:
                    continue
                idx = p[:, off]
                if sem == "POSITION":
                    v = data[idx, :3]
                elif sem == "NORMAL":
                    n = data[idx, :3]
                elif sem == "TEXCOORD" and uv is None:
                    uv = data[idx, :2]
            if v is None or len(v) == 0:
                continue
            if n is None:
                n = _faceted_normals(v)
            if uv is None:
                uv = np.zeros((len(v), 2), np.float32)
            else:
                uv = np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=1)
            all_v.append(v.astype(np.float32))
            all_n.append(n.astype(np.float32))
            all_uv.append(uv.astype(np.float32))
    if not all_v:
        raise ValueError(f"no triangle geometry in COLLADA file: {path}")
    v = np.concatenate(all_v)
    n = np.concatenate(all_n)
    uv = np.concatenate(all_uv)
    if z_up:  # Z-up -> Y-up: (x, y, z) -> (x, z, -y), like assimp
        v = np.stack([v[:, 0], v[:, 2], -v[:, 1]], axis=1)
        n = np.stack([n[:, 0], n[:, 2], -n[:, 1]], axis=1)
    idx = np.arange(len(v), dtype=np.int32).reshape(-1, 3)
    return {"verts": v, "normals": n, "uvs": uv, "indices": idx}


def _faceted_normals(corner_verts):
    """Per-face geometric normals replicated to the 3 corners (the STL
    loader's convention for normal-less sources)."""
    tri = corner_verts.reshape(-1, 3, 3)
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    ln = np.linalg.norm(fn, axis=1, keepdims=True)
    fn = fn / np.where(ln == 0, 1.0, ln)
    return np.repeat(fn, 3, axis=0).astype(np.float32)


# -------------------------------------------------------------------- 3DS

def parse_3ds(path: str) -> dict:
    """Autodesk 3DS: 0x4D4D -> 0x3D3D -> 0x4000(object) -> 0x4100(mesh)
    chunks — vertex list 0x4110, face list 0x4120, UVs 0x4140. All
    objects concatenated (mesh.cpp:63-115 semantics). 3DS is Z-up:
    rotated into Y-up like assimp; faceted normals (3DS stores none);
    V flipped (FlipUVs)."""
    data = open(path, "rb").read()
    if len(data) < 6 or struct.unpack_from("<H", data, 0)[0] != 0x4D4D:
        raise ValueError(f"not a 3DS file: {path}")

    all_v, all_uv, all_idx = [], [], []

    def walk(start, end):
        pos = start
        while pos + 6 <= end:
            cid, clen = struct.unpack_from("<HI", data, pos)
            if clen < 6 or pos + clen > end:
                raise ValueError(f"corrupt 3DS chunk at {pos} in {path}")
            body = pos + 6
            if cid in (0x4D4D, 0x3D3D):
                walk(body, pos + clen)
            elif cid == 0x4000:  # object: name (cstr) then subchunks
                z = data.index(b"\0", body)
                walk(z + 1, pos + clen)
            elif cid == 0x4100:
                _mesh_chunk(body, pos + clen)
            pos += clen

    def _mesh_chunk(start, end):
        verts = uvs = faces = None
        pos = start
        while pos + 6 <= end:
            cid, clen = struct.unpack_from("<HI", data, pos)
            if clen < 6 or pos + clen > end:
                raise ValueError(f"corrupt 3DS chunk at {pos} in {path}")
            body = pos + 6
            if cid == 0x4110:
                n = struct.unpack_from("<H", data, body)[0]
                verts = np.frombuffer(data, "<f4", n * 3, body + 2
                                      ).reshape(-1, 3)
            elif cid == 0x4140:
                n = struct.unpack_from("<H", data, body)[0]
                uvs = np.frombuffer(data, "<f4", n * 2, body + 2
                                    ).reshape(-1, 2)
            elif cid == 0x4120:
                n = struct.unpack_from("<H", data, body)[0]
                f = np.frombuffer(data, "<u2", n * 4, body + 2
                                  ).reshape(-1, 4)
                faces = f[:, :3].astype(np.int64)
            pos += clen
        if verts is None or faces is None or len(faces) == 0:
            return
        v = verts[faces.reshape(-1)]
        uv = (uvs[faces.reshape(-1)] if uvs is not None and
              len(uvs) == len(verts)
              else np.zeros((len(v), 2), np.float32))
        all_v.append(v)
        all_uv.append(uv)

    walk(0, len(data))
    if not all_v:
        raise ValueError(f"no mesh chunks in 3DS file: {path}")
    v = np.concatenate(all_v).astype(np.float32)
    uv = np.concatenate(all_uv).astype(np.float32)
    # Z-up -> Y-up, then faceted normals in the TARGET frame
    v = np.stack([v[:, 0], v[:, 2], -v[:, 1]], axis=1)
    n = _faceted_normals(v)
    uv = np.stack([uv[:, 0], 1.0 - uv[:, 1]], axis=1)
    idx = np.arange(len(v), dtype=np.int32).reshape(-1, 3)
    return {"verts": v, "normals": n, "uvs": uv, "indices": idx}


# -------------------------------------------------------------------- FBX

def _fbx_read_node(data, pos, ver):
    """One FBX-binary node record. Returns (end_offset, name, props,
    children) or (next_pos, None, None, None) for the NULL terminator."""
    if ver >= 7500:
        end, nprops, _plen = struct.unpack_from("<QQQ", data, pos)
        nlen = data[pos + 24]
        hdr = 25
    else:
        end, nprops, _plen = struct.unpack_from("<III", data, pos)
        nlen = data[pos + 12]
        hdr = 13
    if end == 0:
        return pos + hdr, None, None, None
    name = data[pos + hdr:pos + hdr + nlen].decode("ascii", "replace")
    p = pos + hdr + nlen
    props = []
    for _ in range(nprops):
        tc = chr(data[p]); p += 1
        if tc in "CB":
            props.append(bool(data[p])); p += 1
        elif tc == "Y":
            props.append(struct.unpack_from("<h", data, p)[0]); p += 2
        elif tc == "I":
            props.append(struct.unpack_from("<i", data, p)[0]); p += 4
        elif tc == "L":
            props.append(struct.unpack_from("<q", data, p)[0]); p += 8
        elif tc == "F":
            props.append(struct.unpack_from("<f", data, p)[0]); p += 4
        elif tc == "D":
            props.append(struct.unpack_from("<d", data, p)[0]); p += 8
        elif tc in "fdil":
            n, enc, clen = struct.unpack_from("<III", data, p); p += 12
            dt = {"f": "<f4", "d": "<f8", "i": "<i4", "l": "<i8"}[tc]
            if enc:
                import zlib
                raw = zlib.decompress(data[p:p + clen])
                props.append(np.frombuffer(raw, dt, n))
                p += clen
            else:
                width = np.dtype(dt).itemsize
                props.append(np.frombuffer(data, dt, n, p))
                p += n * width
        elif tc in "SR":
            n = struct.unpack_from("<I", data, p)[0]; p += 4
            props.append(data[p:p + n]); p += n
        else:
            raise ValueError(f"unknown FBX property type {tc!r}")
    children = []
    while p < end:
        p, cname, cprops, cch = _fbx_read_node(data, p, ver)
        if cname is None:
            break
        children.append((cname, cprops, cch))
    return end, name, props, children


def parse_fbx(path: str) -> dict:
    """FBX 7.x BINARY geometry: every Objects/Geometry node's Vertices +
    PolygonVertexIndex (negative index = XOR-complemented last corner of
    a polygon; polygons fan-triangulated like assimp's Triangulate),
    with per-polygon-vertex or per-vertex LayerElementNormal/LayerElementUV
    when present. Zlib-compressed arrays supported. ASCII FBX is not
    (export binary, or another supported format).

    GlobalSettings UpAxis=2 (Z-up, the common 3ds Max export) rotates
    into the renderer's Y-up frame like the DAE/3DS loaders;
    UnitScaleFactor is NOT applied (no loader rescales — meshes are
    placed via the scene transform, matching the reference's raw
    aiMesh read, mesh.cpp:63-115)."""
    data = open(path, "rb").read()
    if not data.startswith(b"Kaydara FBX Binary"):
        raise ValueError(
            f"not a binary FBX file (ASCII FBX unsupported): {path}")
    ver = struct.unpack_from("<I", data, 23)[0]
    pos = 27
    roots = []
    while pos < len(data):
        pos, name, props, children = _fbx_read_node(data, pos, ver)
        if name is None:
            break
        roots.append((name, props, children))

    def find_all(nodes, name):
        return [n for n in nodes if n[0] == name]

    objects = []
    up_axis = 1  # FBX default: Y-up
    for name, props, children in roots:
        if name == "Objects":
            objects = children
        elif name == "GlobalSettings":
            for cname, _, cch in children:
                if cname != "Properties70":
                    continue
                for gname, gprops, _ in cch:
                    if (gname == "P" and gprops
                            and gprops[0] == b"UpAxis"):
                        ints = [p for p in gprops
                                if isinstance(p, int)]
                        if ints:
                            up_axis = ints[-1]

    all_v, all_n, all_uv = [], [], []
    for name, props, children in find_all(objects, "Geometry"):
        verts = idx = None
        nrm = nrm_map = uv = uv_map = uv_idx = None
        for cname, cprops, cch in children:
            if cname == "Vertices" and cprops:
                verts = np.asarray(cprops[0], np.float64).reshape(-1, 3)
            elif cname == "PolygonVertexIndex" and cprops:
                idx = np.asarray(cprops[0], np.int64)
            elif cname == "LayerElementNormal":
                for gname, gprops, _ in cch:
                    if gname == "Normals" and gprops:
                        nrm = np.asarray(gprops[0], np.float64
                                         ).reshape(-1, 3)
                    elif gname == "MappingInformationType" and gprops:
                        nrm_map = gprops[0]
            elif cname == "LayerElementUV":
                for gname, gprops, _ in cch:
                    if gname == "UV" and gprops:
                        uv = np.asarray(gprops[0], np.float64
                                        ).reshape(-1, 2)
                    elif gname == "UVIndex" and gprops:
                        uv_idx = np.asarray(gprops[0], np.int64)
                    elif gname == "MappingInformationType" and gprops:
                        uv_map = gprops[0]
        if verts is None or idx is None or len(idx) == 0:
            continue
        # polygons: corner runs ending at a negative (complemented)
        # index. Vectorized: a 1M-tri FBX has ~3M indices — a per-index
        # Python loop costs seconds.
        ends = np.flatnonzero(idx < 0)
        if len(ends) == 0:
            raise ValueError(f"unterminated FBX polygon data: {path}")
        starts = np.concatenate([[0], ends[:-1] + 1])
        sizes = ends - starts + 1
        if (sizes == 3).all():  # already triangulated: pure reshape
            # up to ends[-1] only: a trailing UNTERMINATED corner run
            # (no negative index) is dropped, as the per-index loop did
            corners = np.arange(ends[-1] + 1, dtype=np.int64)
        else:
            ntri = sizes - 2  # fan triangles per polygon
            ntri = np.maximum(ntri, 0)
            total = int(ntri.sum())
            poly_of = np.repeat(np.arange(len(sizes)), ntri)
            # t = rank of the triangle within its polygon, 1-based
            first = np.concatenate([[0], np.cumsum(ntri)[:-1]])
            t_rank = np.arange(total) - first[poly_of] + 1
            s = starts[poly_of]
            corners = np.stack([s, s + t_rank, s + t_rank + 1],
                               axis=1).reshape(-1)
        vidx = idx[corners]
        vidx = np.where(vidx < 0, ~vidx, vidx)   # complement last corners
        v = verts[vidx]
        by_vert = (b"ByVertice", b"ByVertex")  # exporters use both
        if nrm is not None and nrm_map == b"ByPolygonVertex" \
                and len(nrm) == len(idx):
            n = nrm[corners]
        elif nrm is not None and nrm_map in by_vert \
                and len(nrm) == len(verts):
            n = nrm[vidx]
        else:
            n = _faceted_normals(v.astype(np.float32))
        if uv is not None and uv_map == b"ByPolygonVertex":
            if uv_idx is not None and len(uv_idx) == len(idx):
                # UVIndex entries of -1 are legal (corners without UVs);
                # they must map to a (0,0) default, not wrap to uv[-1]
                ui = uv_idx[corners]
                t = np.where(ui[:, None] < 0, 0.0, uv[np.maximum(ui, 0)])
            elif len(uv) == len(idx):
                t = uv[corners]
            else:
                t = None
        elif uv is not None and uv_map in by_vert \
                and len(uv) == len(verts):
            t = uv[vidx]
        else:
            t = None
        if t is None:
            t = np.zeros((len(v), 2), np.float64)
        else:
            t = np.stack([t[:, 0], 1.0 - t[:, 1]], axis=1)  # FlipUVs
        all_v.append(v.astype(np.float32))
        all_n.append(np.asarray(n, np.float32))
        all_uv.append(t.astype(np.float32))
    if not all_v:
        raise ValueError(f"no polygon geometry in FBX file: {path}")
    v = np.concatenate(all_v)
    n = np.concatenate(all_n)
    t = np.concatenate(all_uv)
    if up_axis == 2:  # Z-up -> Y-up: (x, y, z) -> (x, z, -y), like assimp
        v = np.stack([v[:, 0], v[:, 2], -v[:, 1]], axis=1)
        n = np.stack([n[:, 0], n[:, 2], -n[:, 1]], axis=1)
    i = np.arange(len(v), dtype=np.int32).reshape(-1, 3)
    return {"verts": v, "normals": n, "uvs": t, "indices": i}

"""Multi-format mesh import (scene/meshload.py): PLY / STL / glTF-GLB
round-trips agree with the OBJ loader's output for the same geometry, and
a scene referencing each format renders (the reference accepts all of
these through assimp, mesh.cpp:56)."""
import base64
import json
import os
import struct
import tempfile

import numpy as np
import pytest

from hobbyraytracer_tpu.scene import meshload, objloader


@pytest.fixture(scope="module")
def quad():
    """A unit quad with distinct normals/uvs per vertex."""
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float32)
    normals = np.tile(np.asarray([[0, 0, 1]], np.float32), (4, 1))
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    indices = np.asarray([[0, 1, 2], [0, 2, 3]], np.int32)
    return verts, normals, uvs, indices


def _tri_set(m):
    """Order-independent set of triangles as rounded vertex triples."""
    tv = np.asarray(m["verts"])[np.asarray(m["indices"])]
    return {tuple(np.round(t, 4).ravel()) for t in tv}


def test_ply_ascii_matches_obj(quad, tmp_path):
    verts, normals, uvs, indices = quad
    p = tmp_path / "q.ply"
    with open(p, "w") as f:
        f.write("ply\nformat ascii 1.0\n")
        f.write(f"element vertex {len(verts)}\n")
        for prop in ("x", "y", "z", "nx", "ny", "nz", "u", "v"):
            f.write(f"property float {prop}\n")
        f.write(f"element face {len(indices)}\n")
        f.write("property list uchar int vertex_indices\n")
        f.write("end_header\n")
        for v, n, t in zip(verts, normals, uvs):
            f.write(" ".join(map(str, [*v, *n, *t])) + "\n")
        for tri in indices:
            f.write("3 " + " ".join(map(str, tri)) + "\n")
    m = meshload.load_mesh(str(p))
    np.testing.assert_allclose(m["verts"], verts)
    np.testing.assert_allclose(m["normals"], normals)
    np.testing.assert_allclose(m["uvs"][:, 1], 1.0 - uvs[:, 1])  # FlipUVs
    np.testing.assert_array_equal(m["indices"], indices)


def test_ply_binary_matches_ascii(quad, tmp_path):
    verts, normals, uvs, indices = quad
    p = tmp_path / "qb.ply"
    with open(p, "wb") as f:
        hdr = ("ply\nformat binary_little_endian 1.0\n"
               f"element vertex {len(verts)}\n"
               + "".join(f"property float {c}\n" for c in
                         ("x", "y", "z", "nx", "ny", "nz"))
               + f"element face {len(indices)}\n"
               "property list uchar int vertex_indices\nend_header\n")
        f.write(hdr.encode())
        for v, n in zip(verts, normals):
            f.write(struct.pack("<6f", *v, *n))
        for tri in indices:
            f.write(struct.pack("<B3i", 3, *tri))
    m = meshload.load_mesh(str(p))
    np.testing.assert_allclose(m["verts"], verts)
    np.testing.assert_allclose(m["normals"], normals)
    np.testing.assert_array_equal(m["indices"], indices)


def test_stl_binary_and_ascii(quad, tmp_path):
    verts, normals, uvs, indices = quad
    tv = verts[indices]                        # (2,3,3)
    pb = tmp_path / "q.stl"
    with open(pb, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", len(tv)))
        for tri in tv:
            f.write(struct.pack("<3f", 0, 0, 1))
            for v in tri:
                f.write(struct.pack("<3f", *v))
            f.write(struct.pack("<H", 0))
    mb = meshload.load_mesh(str(pb))
    assert mb["verts"].shape == (6, 3)         # faceted: no sharing
    pa = tmp_path / "qa.stl"
    with open(pa, "w") as f:
        f.write("solid q\n")
        for tri in tv:
            f.write(" facet normal 0 0 1\n  outer loop\n")
            for v in tri:
                f.write(f"   vertex {v[0]} {v[1]} {v[2]}\n")
            f.write("  endloop\n endfacet\n")
        f.write("endsolid q\n")
    ma = meshload.load_mesh(str(pa))
    assert _tri_set(ma) == _tri_set(mb)
    np.testing.assert_allclose(mb["normals"],
                               np.tile([[0, 0, 1]], (6, 1)))


def _gltf_doc(verts, normals, uvs, indices):
    bin_data = (verts.astype("<f4").tobytes()
                + normals.astype("<f4").tobytes()
                + uvs.astype("<f4").tobytes()
                + indices.astype("<u2").tobytes())
    nv = len(verts)
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(bin_data)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": nv * 12},
            {"buffer": 0, "byteOffset": nv * 12, "byteLength": nv * 12},
            {"buffer": 0, "byteOffset": nv * 24, "byteLength": nv * 8},
            {"buffer": 0, "byteOffset": nv * 32,
             "byteLength": indices.size * 2},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": nv,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": nv,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": nv,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123,
             "count": indices.size, "type": "SCALAR"},
        ],
        "meshes": [{"primitives": [{
            "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
            "indices": 3}]}],
    }
    return doc, bin_data


def test_glb_and_gltf_data_uri(quad, tmp_path):
    verts, normals, uvs, indices = quad
    doc, bin_data = _gltf_doc(verts, normals, uvs, indices)
    # GLB container
    pj = json.dumps(doc).encode()
    pj += b" " * (-len(pj) % 4)
    bd = bin_data + b"\0" * (-len(bin_data) % 4)
    glb = (struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(pj) + 8 + len(bd))
           + struct.pack("<II", len(pj), 0x4E4F534A) + pj
           + struct.pack("<II", len(bd), 0x004E4942) + bd)
    p = tmp_path / "q.glb"
    p.write_bytes(glb)
    m = meshload.load_mesh(str(p))
    np.testing.assert_allclose(m["verts"], verts)
    np.testing.assert_allclose(m["normals"], normals)
    np.testing.assert_allclose(m["uvs"][:, 1], 1.0 - uvs[:, 1])
    np.testing.assert_array_equal(m["indices"], indices)
    # .gltf with base64 data URI
    doc2 = dict(doc)
    doc2["buffers"] = [{
        "byteLength": len(bin_data),
        "uri": "data:application/octet-stream;base64,"
               + base64.b64encode(bin_data).decode()}]
    p2 = tmp_path / "q.gltf"
    p2.write_text(json.dumps(doc2))
    m2 = meshload.load_mesh(str(p2))
    np.testing.assert_allclose(m2["verts"], verts)
    np.testing.assert_array_equal(m2["indices"], indices)


def test_scene_renders_ply_mesh(tmp_path):
    """End-to-end: a YAML scene whose mesh is a PLY renders identically to
    the same geometry loaded from OBJ."""
    import jax
    from hobbyraytracer_tpu.integrator import path as path_mod
    from hobbyraytracer_tpu.scene import build_scene, load_scene_desc

    tri_v = np.asarray([[-0.8, -0.6, 0], [0.9, -0.5, 0], [0.0, 0.9, 0]],
                       np.float32)
    idx = np.asarray([[0, 1, 2]], np.int32)
    ply = tmp_path / "tri.ply"
    with open(ply, "w") as f:
        f.write("ply\nformat ascii 1.0\nelement vertex 3\n"
                "property float x\nproperty float y\nproperty float z\n"
                "element face 1\n"
                "property list uchar int vertex_indices\nend_header\n")
        for v in tri_v:
            f.write(" ".join(map(str, v)) + "\n")
        f.write("3 0 1 2\n")
    obj = tmp_path / "tri.obj"
    objloader.write_obj(str(obj), tri_v, idx)
    yaml = """
film: {{width: 24, height: 24, samples: 4, output: o.png}}
camera:
  position: [0, 0, -3]
  look_at: [0, 0, 0]
  up: [0, 1, 0]
  fov: 45
  aperture: 0.0
  focal_distance: 3
  background: [0.1, 0.2, 0.3]
materials:
  - {{name: glow, type: diffuse_light, albedo: [1, 1, 1], strength: 2}}
objects:
  - {{type: mesh, path: {path}, material: glow}}
"""
    imgs = []
    for mesh_path in (ply, obj):
        sf = tmp_path / f"s_{mesh_path.suffix[1:]}.yaml"
        sf.write_text(yaml.format(path=mesh_path))
        job = build_scene(load_scene_desc(str(sf)))
        img = path_mod.render_image(job.scene, job.camera, 24, 24, 4,
                                    jax.random.PRNGKey(0), max_depth=2)
        imgs.append(np.asarray(img))
    np.testing.assert_array_equal(imgs[0], imgs[1])


def test_gltf_normalized_uv_and_sparse_rejected(quad, tmp_path):
    """glTF `normalized` u16 TEXCOORD_0 must map to [0,1] floats
    (glTF 2.0 3.6.2.2); sparse accessors must raise, not skip."""
    verts, normals, uvs, indices = quad
    doc, bin_data = _gltf_doc(verts, normals, uvs, indices)
    # replace the f32 UV view with normalized u16 data appended at the end
    uv16 = np.round(uvs * 65535.0).astype("<u2")
    off = len(bin_data)
    bin_data = bin_data + uv16.tobytes()
    doc["bufferViews"].append({"buffer": 0, "byteOffset": off,
                               "byteLength": uv16.size * 2})
    doc["accessors"][2] = {"bufferView": 4, "componentType": 5123,
                           "count": len(verts), "type": "VEC2",
                           "normalized": True}
    doc["buffers"] = [{
        "byteLength": len(bin_data),
        "uri": "data:application/octet-stream;base64,"
               + base64.b64encode(bin_data).decode()}]
    p = tmp_path / "norm.gltf"
    p.write_text(json.dumps(doc))
    m = meshload.load_mesh(str(p))
    np.testing.assert_allclose(m["uvs"][:, 0], uvs[:, 0], atol=1e-4)
    np.testing.assert_allclose(m["uvs"][:, 1], 1.0 - uvs[:, 1], atol=1e-4)

    doc["accessors"][0]["sparse"] = {"count": 1}
    p2 = tmp_path / "sparse.gltf"
    p2.write_text(json.dumps(doc))
    import pytest
    with pytest.raises(ValueError, match="sparse"):
        meshload.load_mesh(str(p2))


def test_dae_triangles_and_polylist(tmp_path):
    """COLLADA: <triangles> with POSITION/NORMAL/TEXCOORD inputs at
    distinct offsets, Z_UP conversion, V flip, and polylist quad fan-
    triangulation."""
    dae = """<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><up_axis>Z_UP</up_axis></asset>
  <library_geometries>
    <geometry id="g"><mesh>
      <source id="pos"><float_array id="pa" count="12">
        0 0 0  1 0 0  1 1 0  0 1 0</float_array>
        <technique_common><accessor source="#pa" count="4" stride="3">
          <param name="X" type="float"/><param name="Y" type="float"/>
          <param name="Z" type="float"/></accessor></technique_common>
      </source>
      <source id="nrm"><float_array id="na" count="3">0 0 1</float_array>
        <technique_common><accessor source="#na" count="1" stride="3"/>
        </technique_common></source>
      <source id="uv"><float_array id="ua" count="8">
        0 0  1 0  1 1  0 1</float_array>
        <technique_common><accessor source="#ua" count="4" stride="2"/>
        </technique_common></source>
      <vertices id="vv"><input semantic="POSITION" source="#pos"/></vertices>
      <polylist count="1">
        <input semantic="VERTEX" source="#vv" offset="0"/>
        <input semantic="NORMAL" source="#nrm" offset="1"/>
        <input semantic="TEXCOORD" source="#uv" offset="2"/>
        <vcount>4</vcount>
        <p>0 0 0  1 0 1  2 0 2  3 0 3</p>
      </polylist>
    </mesh></geometry>
  </library_geometries>
</COLLADA>"""
    p = tmp_path / "quad.dae"
    p.write_text(dae)
    m = meshload.load_mesh(str(p))
    assert m["indices"].shape == (2, 3)      # quad fan -> 2 triangles
    assert m["verts"].shape == (6, 3)        # per-corner expanded
    # Z_UP: source (x, y, 0) -> (x, 0, -y); all corners land in y=0
    np.testing.assert_allclose(m["verts"][:, 1], 0.0, atol=1e-6)
    assert set(np.round(m["verts"][:, 2], 3)) <= {0.0, -1.0}
    # normal (0,0,1) -> (0,1,0)
    np.testing.assert_allclose(m["normals"][0], [0, 1, 0], atol=1e-6)
    # V flipped
    uv0 = m["uvs"][0]
    np.testing.assert_allclose(uv0, [0.0, 1.0], atol=1e-6)


def test_3ds_roundtrip(tmp_path):
    """3DS binary chunks: one object, 4 verts / 2 faces / UVs; Z-up to
    Y-up rotation, faceted normals, V flip."""
    verts = np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]],
                       np.float32)
    uvs = np.asarray([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
    faces = np.asarray([[0, 1, 2], [0, 2, 3]], np.uint16)

    def chunk(cid, payload):
        return struct.pack("<HI", cid, 6 + len(payload)) + payload

    c4110 = chunk(0x4110, struct.pack("<H", 4) + verts.tobytes())
    c4140 = chunk(0x4140, struct.pack("<H", 4) + uvs.tobytes())
    f4 = np.concatenate([faces, np.zeros((2, 1), np.uint16)], axis=1)
    c4120 = chunk(0x4120, struct.pack("<H", 2) + f4.astype("<u2").tobytes())
    c4100 = chunk(0x4100, c4110 + c4140 + c4120)
    c4000 = chunk(0x4000, b"obj\0" + c4100)
    c3d3d = chunk(0x3D3D, c4000)
    data = chunk(0x4D4D, c3d3d)
    p = tmp_path / "q.3ds"
    p.write_bytes(data)
    m = meshload.load_mesh(str(p))
    assert m["indices"].shape == (2, 3)
    assert m["verts"].shape == (6, 3)
    # Z-up plane z=0 -> y=0 plane
    np.testing.assert_allclose(m["verts"][:, 1], 0.0, atol=1e-6)
    # faceted normals unit-length
    np.testing.assert_allclose(np.linalg.norm(m["normals"], axis=1), 1.0,
                               atol=1e-5)
    np.testing.assert_allclose(m["uvs"][0], [0.0, 1.0], atol=1e-6)


def test_unsupported_format_fails_loudly(tmp_path):
    import pytest
    p = tmp_path / "model.blend"
    p.write_bytes(b"BLENDER-v300")
    with pytest.raises(ValueError, match="unsupported mesh format"):
        meshload.load_mesh(str(p))


def test_fbx_binary_quad(tmp_path):
    """FBX 7.4 binary: one Geometry with a 4-corner polygon (complemented
    last index -> fan triangulation), zlib-compressed arrays,
    ByPolygonVertex normals, ByPolygonVertex UV via UVIndex."""
    verts = np.asarray([0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0], np.float64)
    pvi = np.asarray([0, 1, 2, ~3], np.int64)          # quad, closed
    nrm = np.asarray([0, 0, 1] * 4, np.float64)        # per corner
    uv = np.asarray([0, 0, 1, 0, 1, 1, 0, 1], np.float64)
    uvidx = np.asarray([0, 1, 2, 3], np.int64)

    # assemble: Objects > Geometry > {Vertices, PolygonVertexIndex,
    # LayerElementNormal>{Normals, MappingInformationType},
    # LayerElementUV>{UV, UVIndex, MappingInformationType}}
    header = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", 7400)
    off0 = len(header)

    # innermost first — we must know offsets, so lay out iteratively
    def build(name, props=(), children_spec=()):
        def at(offset):
            name_b = name.encode()
            import zlib
            pb = b""
            for p in props:
                if isinstance(p, np.ndarray):
                    tc = {"f8": b"d", "i8": b"l"}[p.dtype.str[1:]]
                    comp = zlib.compress(p.tobytes())
                    pb += tc + struct.pack("<III", p.size, 1,
                                           len(comp)) + comp
                elif isinstance(p, bytes):
                    pb += b"S" + struct.pack("<I", len(p)) + p
            body_off = offset + 13 + len(name_b) + len(pb)
            cb = b""
            o = body_off
            for spec in children_spec:
                c = spec(o)
                cb += c
                o += len(c)
            if children_spec:
                cb += b"\0" * 13
            end = offset + 13 + len(name_b) + len(pb) + len(cb)
            return (struct.pack("<III", end, len(props), len(pb))
                    + bytes([len(name_b)]) + name_b + pb + cb)
        return at

    geom = build("Geometry", (), (
        build("Vertices", (verts,)),
        build("PolygonVertexIndex", (pvi,)),
        build("LayerElementNormal", (), (
            build("Normals", (nrm,)),
            build("MappingInformationType", (b"ByPolygonVertex",)),
        )),
        build("LayerElementUV", (), (
            build("UV", (uv,)),
            build("UVIndex", (uvidx,)),
            build("MappingInformationType", (b"ByPolygonVertex",)),
        )),
    ))
    objects = build("Objects", (), (geom,))
    data = header + objects(off0)
    data += b"\0" * 13  # top-level NULL record
    p = tmp_path / "quad.fbx"
    p.write_bytes(data)
    m = meshload.load_mesh(str(p))
    assert m["indices"].shape == (2, 3)     # fan -> 2 tris
    assert m["verts"].shape == (6, 3)
    np.testing.assert_allclose(m["normals"], np.tile([[0, 0, 1]], (6, 1)))
    np.testing.assert_allclose(m["uvs"][0], [0.0, 1.0], atol=1e-6)  # V flip
    # the complemented corner decoded: vertex 3 = (0,1,0) appears
    assert any(np.allclose(v, [0, 1, 0]) for v in m["verts"])


def test_fbx_ascii_rejected(tmp_path):
    import pytest
    p = tmp_path / "a.fbx"
    p.write_text("; FBX 7.4.0 project file\nObjects: {\n}\n")
    with pytest.raises(ValueError, match="ASCII FBX unsupported"):
        meshload.load_mesh(str(p))


def test_fbx_trailing_unterminated_corners_dropped(tmp_path):
    """A trailing corner run with no closing (negative) index must be
    DROPPED, not emitted as a partial triangle (review r4): the
    all-triangles fast path slices to the last terminator."""
    verts = np.asarray([0, 0, 0, 1, 0, 0, 1, 1, 0, 0, 1, 0], np.float64)
    pvi = np.asarray([0, 1, ~2, 1, 2], np.int64)  # 1 tri + trailing junk

    def build(name, props=(), children_spec=()):
        def at(offset):
            import zlib
            name_b = name.encode()
            pb = b""
            for p in props:
                if isinstance(p, np.ndarray):
                    tc = {"f8": b"d", "i8": b"l"}[p.dtype.str[1:]]
                    comp = zlib.compress(p.tobytes())
                    pb += tc + struct.pack("<III", p.size, 1,
                                           len(comp)) + comp
            body_off = offset + 13 + len(name_b) + len(pb)
            cb = b""
            o = body_off
            for spec in children_spec:
                c = spec(o); cb += c; o += len(c)
            if children_spec:
                cb += b"\0" * 13
            end = offset + 13 + len(name_b) + len(pb) + len(cb)
            return (struct.pack("<III", end, len(props), len(pb))
                    + bytes([len(name_b)]) + name_b + pb + cb)
        return at

    geom = build("Geometry", (), (build("Vertices", (verts,)),
                                  build("PolygonVertexIndex", (pvi,))))
    objects = build("Objects", (), (geom,))
    header = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", 7400)
    data = header + objects(len(header)) + b"\0" * 13
    p = tmp_path / "trail.fbx"
    p.write_bytes(data)
    m = meshload.load_mesh(str(p))
    assert m["indices"].shape == (1, 3)  # junk dropped, one triangle


def _fbx_build(name, props=(), children_spec=()):
    """FBX 7.4 node-record builder for fixture files (f8/i8 arrays
    zlib-compressed, bytes as S, ints as I)."""
    def at(offset):
        import zlib
        name_b = name.encode()
        pb = b""
        for p in props:
            if isinstance(p, np.ndarray):
                tc = {"f8": b"d", "i8": b"l"}[p.dtype.str[1:]]
                comp = zlib.compress(p.tobytes())
                pb += tc + struct.pack("<III", p.size, 1, len(comp)) + comp
            elif isinstance(p, bytes):
                pb += b"S" + struct.pack("<I", len(p)) + p
            elif isinstance(p, int):
                pb += b"I" + struct.pack("<i", p)
        body_off = offset + 13 + len(name_b) + len(pb)
        cb = b""
        o = body_off
        for spec in children_spec:
            c = spec(o); cb += c; o += len(c)
        if children_spec:
            cb += b"\0" * 13
        end = offset + 13 + len(name_b) + len(pb) + len(cb)
        return (struct.pack("<III", end, len(props), len(pb))
                + bytes([len(name_b)]) + name_b + pb + cb)
    return at


def _fbx_file(tmp_path, fname, *top_nodes):
    header = b"Kaydara FBX Binary  \x00\x1a\x00" + struct.pack("<I", 7400)
    data = header
    for node in top_nodes:
        data += node(len(data))
    data += b"\0" * 13
    p = tmp_path / fname
    p.write_bytes(data)
    return str(p)


def test_fbx_uvindex_negative_defaults_to_zero(tmp_path):
    """UVIndex entries of -1 (corners without UVs, legal FBX) must map to
    the (0,0) default, not wrap around to uv[-1] (advisor r4)."""
    verts = np.asarray([0, 0, 0, 1, 0, 0, 1, 1, 0], np.float64)
    pvi = np.asarray([0, 1, ~2], np.int64)
    uv = np.asarray([0.25, 0.5, 0.75, 0.25], np.float64)  # 2 UV coords
    uvidx = np.asarray([0, -1, 1], np.int64)              # corner 1: no UV
    geom = _fbx_build("Geometry", (), (
        _fbx_build("Vertices", (verts,)),
        _fbx_build("PolygonVertexIndex", (pvi,)),
        _fbx_build("LayerElementUV", (), (
            _fbx_build("UV", (uv,)),
            _fbx_build("UVIndex", (uvidx,)),
            _fbx_build("MappingInformationType", (b"ByPolygonVertex",)),
        )),
    ))
    path = _fbx_file(tmp_path, "neguv.fbx",
                     _fbx_build("Objects", (), (geom,)))
    m = meshload.load_mesh(path)
    # corner 0 -> uv[0]=(0.25,0.5) -> V-flipped (0.25, 0.5)
    np.testing.assert_allclose(m["uvs"][0], [0.25, 0.5], atol=1e-6)
    # corner 1 -> masked to (0,0) -> V-flipped (0, 1); NOT uv[-1]
    np.testing.assert_allclose(m["uvs"][1], [0.0, 1.0], atol=1e-6)
    # corner 2 -> uv[1]=(0.75,0.25) -> V-flipped (0.75, 0.75)
    np.testing.assert_allclose(m["uvs"][2], [0.75, 0.75], atol=1e-6)


def test_fbx_zup_rotated_to_yup(tmp_path):
    """GlobalSettings UpAxis=2 (Z-up, 3ds Max convention) rotates into the
    renderer's Y-up frame like the DAE/3DS loaders: (x,y,z)->(x,z,-y)."""
    verts = np.asarray([0, 0, 0, 1, 0, 0, 0, 2, 3], np.float64)
    pvi = np.asarray([0, 1, ~2], np.int64)
    gs = _fbx_build("GlobalSettings", (), (
        _fbx_build("Properties70", (), (
            _fbx_build("P", (b"UpAxis", b"int", b"Integer", b"", 2)),
            _fbx_build("P", (b"UpAxisSign", b"int", b"Integer", b"", 1)),
        )),
    ))
    geom = _fbx_build("Geometry", (), (
        _fbx_build("Vertices", (verts,)),
        _fbx_build("PolygonVertexIndex", (pvi,)),
    ))
    path = _fbx_file(tmp_path, "zup.fbx", gs,
                     _fbx_build("Objects", (), (geom,)))
    m = meshload.load_mesh(path)
    np.testing.assert_allclose(m["verts"][2], [0.0, 3.0, -2.0], atol=1e-6)
    # and without GlobalSettings the same file stays un-rotated
    path2 = _fbx_file(tmp_path, "yup.fbx",
                      _fbx_build("Objects", (), (geom,)))
    m2 = meshload.load_mesh(path2)
    np.testing.assert_allclose(m2["verts"][2], [0.0, 2.0, 3.0], atol=1e-6)

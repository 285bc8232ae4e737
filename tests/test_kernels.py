"""Pallas kernel parity: the fused traversal/intersection kernel
(kernels/mesh_traverse.py) must agree with the XLA exact traversal
(ops/intersect.py:intersect_mesh_clustered) — interpreter mode on CPU."""
import os

import jax.numpy as jnp
import numpy as np

from hobbyraytracer_tpu.core.mathx import BIG
from hobbyraytracer_tpu.core.types import Rays
from hobbyraytracer_tpu.ops import intersect as isect


def _random_mesh(seed, n_tris=500, spread=3.0):
    rng = np.random.default_rng(seed)
    base = rng.uniform(-spread, spread, (n_tris, 3)).astype(np.float32)
    v1 = base + rng.normal(0, 0.3, (n_tris, 3)).astype(np.float32)
    v2 = base + rng.normal(0, 0.3, (n_tris, 3)).astype(np.float32)
    verts = np.concatenate([base, v1, v2], axis=0).astype(np.float32)
    idx = np.arange(3 * n_tris, dtype=np.int32).reshape(3, n_tris).T.copy()
    return verts, idx


def _tables(verts, idx, leaf_size=128):
    from hobbyraytracer_tpu.scene.bvh import build_clusters
    c = build_clusters(verts, idx, leaf_size=leaf_size)
    return (jnp.asarray(c["tri_verts"]), jnp.asarray(c["tri_id"]),
            jnp.asarray(c["bmin"]), jnp.asarray(c["bmax"]))


def _rays(seed, n, spread=6.0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    return Rays(o=jnp.asarray(o), d=jnp.asarray(d))


def test_pallas_traversal_matches_xla():
    verts, idx = _random_mesh(0)
    tv, tid, bmin, bmax = _tables(verts, idx)
    r = _rays(1, 600)  # not a multiple of BLOCK: exercises padding
    t_x, g_x, h_x = isect.intersect_mesh_clustered(r, tv, tid, bmin, bmax,
                                                   BIG)
    t_p, g_p, h_p, _, _ = isect.intersect_mesh_clustered_pallas(
        r, tv, tid, bmin, bmax, BIG, interpret=True)
    np.testing.assert_array_equal(np.asarray(h_p), np.asarray(h_x))
    m = np.asarray(h_x)
    np.testing.assert_allclose(np.asarray(t_p)[m], np.asarray(t_x)[m],
                               rtol=1e-6, atol=1e-6)
    # identical winning triangle except exact t-ties
    ties = np.asarray(g_p) != np.asarray(g_x)
    assert (ties & m).mean() < 0.01


def test_pallas_traversal_ray_valid():
    verts, idx = _random_mesh(2, n_tris=200)
    tv, tid, bmin, bmax = _tables(verts, idx, leaf_size=64)
    r = _rays(3, 512)
    valid = np.zeros((512,), bool)
    valid[::3] = True
    t_p, g_p, h_p, _, _ = isect.intersect_mesh_clustered_pallas(
        r, tv, tid, bmin, bmax, BIG, ray_valid=jnp.asarray(valid),
        interpret=True)
    t_x, g_x, h_x = isect.intersect_mesh_clustered(
        r, tv, tid, bmin, bmax, BIG, ray_valid=jnp.asarray(valid))
    h_p = np.asarray(h_p)
    assert not h_p[~valid].any()
    np.testing.assert_array_equal(h_p, np.asarray(h_x))
    m = h_p
    np.testing.assert_allclose(np.asarray(t_p)[m], np.asarray(t_x)[m],
                               rtol=1e-6, atol=1e-6)


def test_pallas_full_scene_render_matches_xla():
    """End-to-end: one wavefront segment with mesh_backend pallas-interpret
    vs xla on the teapot scene."""
    import os
    import jax
    from hobbyraytracer_tpu.scene import build_scene, load_scene_desc
    from hobbyraytracer_tpu.scene.fixtures import ensure_assets
    from hobbyraytracer_tpu.scene import ir as scene_ir
    from hobbyraytracer_tpu.integrator.path import pixel_grid
    from hobbyraytracer_tpu.ops.camera import get_rays

    ensure_assets()
    here = os.path.join(os.path.dirname(__file__), "..", "scenes")
    job = build_scene(load_scene_desc(os.path.join(here,
                                                   "teapot_scene.yaml")))
    key = jax.random.PRNGKey(0)
    x, y = pixel_grid(64, 64)
    u = (x + 0.5) / 63.0
    v = (y + 0.5) / 63.0
    rays = get_rays(job.camera, u, v, key=key)
    h_x = scene_ir.intersect_scene(job.scene, rays, key, 0,
                                   mesh_backend="xla")
    os.environ["HRT_PALLAS_INTERPRET"] = "1"
    try:
        h_p = scene_ir.intersect_scene(job.scene, rays, key, 0,
                                       mesh_backend="auto")
    finally:
        del os.environ["HRT_PALLAS_INTERPRET"]
    np.testing.assert_array_equal(np.asarray(h_p.hit), np.asarray(h_x.hit))
    m = np.asarray(h_x.hit)
    np.testing.assert_allclose(np.asarray(h_p.t)[m], np.asarray(h_x.t)[m],
                               rtol=2e-4, atol=2e-4)
    same_mat = np.asarray(h_p.mat_id) == np.asarray(h_x.mat_id)
    assert same_mat.mean() > 0.99
    # in-kernel attribute interpolation (MT barycentrics) vs the XLA
    # watertight interpolation: same up to fp + rare tie-breaking.
    # The mesh shares its material with the walls (scene file), so mesh
    # hits are identified by intersecting the mesh instance alone and
    # asking where it won the closest-hit race.
    h_mesh = scene_ir._intersect_instance(job.scene.instances[0], rays,
                                          1e-3, mesh_backend="xla")
    mesh_hit = (m & np.asarray(h_mesh.hit)
                & (np.abs(np.asarray(h_mesh.t) - np.asarray(h_x.t)) < 1e-3))
    if mesh_hit.any():
        n_p = np.asarray(h_p.normal)[mesh_hit]
        n_x = np.asarray(h_x.normal)[mesh_hit]
        cos = (n_p * n_x).sum(1) / np.maximum(
            np.linalg.norm(n_p, axis=1) * np.linalg.norm(n_x, axis=1),
            1e-12)
        assert (cos > 0.999).mean() > 0.98, (cos > 0.999).mean()
        uv_p = np.asarray(h_p.uv)[mesh_hit]
        uv_x = np.asarray(h_x.uv)[mesh_hit]
        if job.scene.materials.textured:
            assert (np.abs(uv_p - uv_x) < 2e-3).all(axis=1).mean() > 0.98
        else:
            # no textured material in the scene: the kernel statically
            # skips UV interpolation and reports zeros (never consumed)
            assert (uv_p == 0.0).all()
            # exercise the interpolating variant directly for parity
            from hobbyraytracer_tpu.ops import intersect as isect
            mesh = job.scene.instances[0].mesh
            tf = job.scene.instances[0].transform
            r_obj = tf.ray_to_object(rays) if tf is not None else rays
            t2, g2, hit2, n2, uv2 = isect.intersect_mesh_clustered_pallas(
                r_obj, None, mesh.cluster_id, mesh.cluster_bmin,
                mesh.cluster_bmax, float(1e30), interpret=True,
                tri_soa=mesh.tri_soa, bounds8=mesh.bounds8, need_uv=True)
            uv2 = np.asarray(uv2)[mesh_hit]
            assert (np.abs(uv2 - uv_x) < 2e-3).all(axis=1).mean() > 0.98


def test_stream_kernel_matches_resident_bitwise():
    """The HBM-streaming kernel (kernels._kernel_stream) must agree with
    the VMEM-resident kernel EXACTLY — same visit policy, same math —
    including when K is padded up to the STREAM_KC slab-chunk multiple
    (the pad once produced entry-0 boxes and out-of-bounds cluster DMAs,
    a real TPU fault; see _traverse_stream's pad comment)."""
    import jax.numpy as jnp
    from hobbyraytracer_tpu.kernels import mesh_traverse as kmod

    verts, idx = _random_mesh(5, n_tris=900)   # K=8 << STREAM_KC: pads
    tv, tid, bmin, bmax = _tables(verts, idx)
    rng = np.random.default_rng(11)
    nrm = rng.normal(0, 1, verts.shape).astype(np.float32)
    uvs = rng.uniform(0, 1, (len(verts), 2)).astype(np.float32)
    corner = idx[np.maximum(np.asarray(tid), 0)]
    tn, tu = jnp.asarray(nrm[corner]), jnp.asarray(uvs[corner])
    r = _rays(6, 700)
    t_r, g_r, h_r, n_r, u_r = isect.intersect_mesh_clustered_pallas(
        r, tv, tid, bmin, bmax, BIG, interpret=True,
        tri_normals=tn, tri_uvs=tu)
    soa = kmod.pack_mesh_soa(tv, tn, tu)
    stream = kmod.pack_mesh_stream(soa, tid)
    t_s, g_s, h_s, n_s, u_s = isect.intersect_mesh_clustered_pallas(
        r, None, tid, bmin, bmax, BIG, interpret=True,
        tri_soa=stream, bounds8=kmod.pack_bounds(bmin, bmax))
    np.testing.assert_array_equal(np.asarray(h_s), np.asarray(h_r))
    np.testing.assert_array_equal(np.asarray(t_s), np.asarray(t_r))
    np.testing.assert_array_equal(np.asarray(g_s), np.asarray(g_r))
    np.testing.assert_array_equal(np.asarray(n_s), np.asarray(n_r))
    np.testing.assert_array_equal(np.asarray(u_s), np.asarray(u_r))


def test_oversized_mesh_routes_to_stream_tables():
    """A mesh past the resident kernel's VMEM ceiling must get 32-row
    streaming tables from the scene build and still resolve to the
    Pallas backend (round-4 verdict #1: no more silent ~5x XLA
    fallback)."""
    from hobbyraytracer_tpu.kernels import mesh_traverse as kmod
    from hobbyraytracer_tpu.scene import ir as scene_ir
    from hobbyraytracer_tpu.scene.build import _mesh_geom
    from hobbyraytracer_tpu.scene.procgen import teapot_hires

    m = teapot_hires()                         # ~105k tris: > ceiling
    geom = _mesh_geom(m, 0)
    k, leaf = geom.cluster_id.shape
    assert not kmod.mesh_fits_vmem(k, leaf)
    assert kmod.mesh_fits_stream(k, leaf)
    assert geom.tri_soa.shape[1] == kmod.STREAM_ROWS
    os.environ["HRT_PALLAS_INTERPRET"] = "1"   # CPU: route as on-TPU
    try:
        backend, _ = scene_ir._resolve_mesh_backend("auto", geom)
    finally:
        del os.environ["HRT_PALLAS_INTERPRET"]
    assert backend == "pallas"

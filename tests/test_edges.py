"""Edge-sampled visibility gradient (diff/edges.py) vs finite differences
on a silhouette scene.

Scene: one constant-EMISSIVE triangle over a solid background. Emission is
independent of geometry, so the interior (shading-chain) vertex gradient
is exactly zero and the FULL image gradient w.r.t. a vertex is pure
boundary term — the cleanest possible FD check of the silhouette
estimator (round-1's gap: only the smooth interior sub-chain was ever
FD-validated)."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobbyraytracer_tpu.diff import edges as edge_mod
from hobbyraytracer_tpu.integrator import path as path_mod
from hobbyraytracer_tpu.scene import build_scene, load_scene_desc

W = H = 32
SPP = 256

SCENE_YAML = """
film: {width: 32, height: 32, samples: 8, output: tri.png}
camera:
  position: [0, 0, -3]
  look_at: [0, 0, 0]
  up: [0, 1, 0]
  fov: 45
  aperture: 0.0
  focal_distance: 3
  background: [0.05, 0.1, 0.2]
materials:
  - {name: glow, type: diffuse_light, albedo: [1.0, 0.8, 0.5], strength: 2.0}
objects:
  - type: triangle
    v0: [-0.8, -0.6, 0]
    v1: [0.9, -0.5, 0]
    v2: [0.0, 0.9, 0]
    material: glow
"""


@pytest.fixture(scope="module")
def job():
    with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                     delete=False) as f:
        f.write(SCENE_YAML)
        p = f.name
    j = build_scene(load_scene_desc(p))
    os.unlink(p)
    return j


def _mesh(scene):
    return [i for i in scene.instances if i.kind == "mesh"][0].mesh


def _loss(scene, camera, weight, key):
    """sum(weight * linear radiance image), jittered AA sampling."""
    acc = path_mod.sample_radiance(scene, camera, W, H, key, SPP,
                                   max_depth=2) / SPP
    return float(jnp.sum(weight * acc.reshape(H, W, 3)))


def _set_verts(scene, verts):
    insts = tuple(
        i.replace(mesh=i.mesh.replace(verts=verts)) if i.kind == "mesh"
        else i for i in scene.instances)
    return scene.replace(instances=insts)


def test_boundary_grad_matches_fd(job):
    scene, camera = job.scene, job.camera
    mesh = _mesh(scene)
    verts = mesh.verts
    indices = np.asarray(mesh.indices)
    edges, efaces = edge_mod.build_edge_table(indices)

    rng = np.random.default_rng(0)
    weight = jnp.asarray(rng.uniform(0.2, 1.0, (H, W, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)

    def radiance_fn(rays):
        return path_mod.trace(scene, rays, key, max_depth=2)

    dverts = edge_mod.boundary_grad(
        verts, jnp.asarray(edges), jnp.asarray(efaces), mesh.indices,
        camera, weight, W, H, radiance_fn, key, n_samples=8192)
    dverts = np.asarray(dverts)

    # FD on two coordinates of two different vertices (x of v0, y of v2)
    checks = [(0, 0), (2, 1)]
    delta = 0.02
    for vi, ci in checks:
        e = np.zeros_like(np.asarray(verts))
        e[vi, ci] = delta
        lp = _loss(_set_verts(scene, verts + jnp.asarray(e)), camera,
                   weight, key)
        lm = _loss(_set_verts(scene, verts - jnp.asarray(e)), camera,
                   weight, key)
        fd = (lp - lm) / (2 * delta)
        an = dverts[vi, ci]
        assert np.isfinite(fd) and np.isfinite(an)
        # MC boundary estimator + stochastic FD: 25% relative (+ abs floor)
        assert abs(an - fd) <= 0.25 * abs(fd) + 0.05, (vi, ci, an, fd)


def test_interior_grad_is_zero_for_constant_emission(job):
    """Sanity: the differentiable-path interior gradient w.r.t. vertices
    vanishes for a constant emitter, so the boundary term above really is
    the whole gradient."""
    scene, camera = job.scene, job.camera
    mesh = _mesh(scene)
    weight = jnp.ones((H, W, 3), jnp.float32)
    key = jax.random.PRNGKey(1)

    def loss(v):
        s = _set_verts(scene, v)
        acc = path_mod.trace_diff(
            s, _rays_grid(camera), key, max_depth=2)
        return jnp.sum(weight.reshape(-1, 3) * acc)

    def _rays_grid(cam):
        x, y = path_mod.pixel_grid(W, H)
        u = (x + 0.5) / (W - 1)
        v = (y + 0.5) / (H - 1)
        from hobbyraytracer_tpu.ops.camera import get_rays
        return get_rays(cam, u, v)

    g = jax.grad(loss)(mesh.verts)
    np.testing.assert_allclose(np.asarray(g), 0.0, atol=1e-4)


def test_silhouette_vertex_fit_converges(job):
    """End-to-end inverse rendering through the boundary term: recover a
    translated emissive triangle's position. The interior gradient is
    identically zero here (constant emission), so ONLY the edge-sampled
    term can move the vertices — round 1 had no mechanism for this."""
    from hobbyraytracer_tpu.diff.fit import fit_materials, render_linear

    scene, camera = job.scene, job.camera
    mesh = _mesh(scene)
    key = jax.random.PRNGKey(0)
    target = render_linear(scene, camera, W, H, key, 4, 2)

    shift = jnp.asarray([0.25, -0.2, 0.0], jnp.float32)
    start = _set_verts(scene, mesh.verts + shift)
    err0 = float(jnp.abs(shift).mean())

    res = fit_materials(start, camera, target, W, H, steps=40, lr=2e-2,
                        n_samples=4, max_depth=2, key=key,
                        fit_vertices=True, boundary=True,
                        boundary_samples=2048, verbose=False)
    fitted = res.params["verts"][0]
    err = float(jnp.abs(fitted - mesh.verts).mean())
    assert err < 0.4 * err0, (err, err0)
    assert res.losses[-1] < 0.5 * res.losses[0], list(res.losses[:3])


def test_silhouette_mask_single_triangle(job):
    mesh = _mesh(job.scene)
    edges, efaces = edge_mod.build_edge_table(np.asarray(mesh.indices))
    sil = edge_mod.silhouette_mask(mesh.verts, mesh.indices,
                                   jnp.asarray(edges), jnp.asarray(efaces),
                                   job.camera.origin)
    # all 3 edges of a lone triangle are boundary edges -> silhouettes
    assert np.asarray(sil).all()
    assert edges.shape == (3, 2)

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


SHADOW_SCENE_YAML = """
film: {width: 32, height: 32, samples: 8, output: sh.png}
camera:
  position: [0, 4, 0.001]
  look_at: [0, 0, 0]
  up: [0, 0, 1]
  fov: 40
  aperture: 0.0
  focal_distance: 4
  background: [0.0, 0.0, 0.0]
materials:
  - {name: ground, type: lambertian, albedo: [0.8, 0.8, 0.8]}
  - {name: lamp, type: diffuse_light, albedo: [1.0, 1.0, 1.0], strength: 25}
objects:
  - type: xz_rect          # receiver floor
    x: [-3, 3]
    z: [-3, 3]
    k: 0
    material: ground
  - type: xz_rect          # emitter outside the frame: big enough that
    x: [1.7, 2.3]          # the no-NEE integrator hits it stochastically,
    z: [-0.3, 0.3]         # small enough for a usable shadow edge
    k: 3
    material: lamp
  - type: triangle         # blocker: OUTSIDE the camera frustum, its
    v0: [1.05, 1.5, -0.5]  # shadow falls across the visible floor
    v1: [1.6, 1.5, 0.0]
    v2: [1.05, 1.5, 0.5]
    material: ground
"""


@pytest.fixture(scope="module")
def shadow_job():
    with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                     delete=False) as f:
        f.write(SHADOW_SCENE_YAML)
        p = f.name
    j = build_scene(load_scene_desc(p))
    os.unlink(p)
    return j


def test_shadow_boundary_grad_matches_fd(shadow_job):
    """Shadow-silhouette vertex gradients: the blocker is entirely outside
    the camera frustum (its primary silhouette term is zero) and its
    SHADOW on the floor drives the loss — only shadow_boundary_grad can
    produce this derivative; check it against finite differences."""
    from hobbyraytracer_tpu.scene import ir as scene_ir

    scene, camera = shadow_job.scene, shadow_job.camera
    mesh = _mesh(scene)
    verts = mesh.verts
    indices = np.asarray(mesh.indices)
    edges, efaces = edge_mod.build_edge_table(indices)
    light_pos = jnp.asarray([2.0, 3.0, 0.0], jnp.float32)

    rng = np.random.default_rng(1)
    weight = jnp.asarray(rng.uniform(0.2, 1.0, (H, W, 3)), jnp.float32)

    def hit_fn(rays):
        return scene_ir.intersect_scene(scene, rays,
                                        jax.random.PRNGKey(0), 0)

    # the emitter has AREA (the no-NEE integrator cannot render point-
    # light shadows), so eps_px spans the ~6px penumbra, and the one-
    # path-per-probe radiance estimates are noisy: average over keys
    acc = None
    n_keys = 6
    for kk in range(n_keys):
        k = jax.random.PRNGKey(kk)

        def radiance_fn(rays, k=k):
            return path_mod.trace(scene, rays, k, max_depth=2)

        g = edge_mod.shadow_boundary_grad(
            verts, jnp.asarray(edges), jnp.asarray(efaces), mesh.indices,
            light_pos, camera, weight, W, H, radiance_fn, hit_fn, k,
            n_samples=8192, eps_px=4.0)
        acc = g if acc is None else acc + g
    dverts = np.asarray(acc) / n_keys
    assert np.isfinite(dverts).all()

    key = jax.random.PRNGKey(0)
    checks = [(1, 0), (2, 2)]  # x of the shadow tip, z of a base vertex
    delta = 0.03
    saw_signal = False
    for vi, ci in checks:
        e = np.zeros_like(np.asarray(verts))
        e[vi, ci] = delta
        lp = _loss(_set_verts(scene, verts + jnp.asarray(e)), camera,
                   weight, key)
        lm = _loss(_set_verts(scene, verts - jnp.asarray(e)), camera,
                   weight, key)
        fd = (lp - lm) / (2 * delta)
        an = dverts[vi, ci]
        assert np.isfinite(fd)
        saw_signal |= abs(fd) > 5.0
        # MC boundary estimator + stochastic FD across a penumbra:
        # 40% relative with an absolute floor
        assert abs(an - fd) <= 0.40 * abs(fd) + 1.0, (vi, ci, an, fd)
    # the shadow genuinely drives the loss (guards against the vacuous
    # zero==zero comparison this test would otherwise degenerate to)
    assert saw_signal


def test_shadow_driven_translation_fit_converges(shadow_job):
    """END-TO-END shadow-driven inverse rendering (verdict r4 #6): the
    blocker is entirely off-screen, so the ONLY gradient path from the
    image loss to its position is the shadow-silhouette boundary term.
    Recover the blocker's (x, z) translation from the shadow it casts.

    Scope notes (why translation, not free vertices): a free per-vertex
    fit on this scene is ILL-POSED — a taller blocker nearer the lamp
    casts the same shadow, and round-5 measurement shows the optimizer
    exploiting exactly that degeneracy (loss halves while vertex error
    doubles). The translation parameterization keeps the inverse problem
    well-posed while still exercising the full chain: forward render ->
    dL/dI -> shadow_boundary_grad -> chain rule to the parameters. The
    uncorrelated per-step keys + lr decay handle the no-NEE integrator's
    gradient noise (constant-lr Adam random-walks ~lr per step at the
    optimum and overshoots)."""
    import optax

    from hobbyraytracer_tpu.diff.fit import _loss_from_image, render_linear
    from hobbyraytracer_tpu.scene import ir as scene_ir

    scene, camera = shadow_job.scene, shadow_job.camera
    mesh = _mesh(scene)
    base = mesh.verts
    edges, efaces = edge_mod.build_edge_table(np.asarray(mesh.indices))
    edges_j, efaces_j = jnp.asarray(edges), jnp.asarray(efaces)
    light = jnp.asarray([2.0, 3.0, 0.0], jnp.float32)

    def off3(off):
        return jnp.asarray([off[0], 0.0, off[1]])

    def with_offset(off):
        v = base + off3(off)
        insts = tuple(i.replace(mesh=i.mesh.replace(verts=v))
                      if i.kind == "mesh" else i for i in scene.instances)
        return scene.replace(instances=insts)

    key = jax.random.PRNGKey(0)
    target = render_linear(scene, camera, W, H, key, 16, 2)

    off = jnp.asarray([0.25, 0.18], jnp.float32)   # displaced start
    err0 = float(jnp.abs(off).mean())
    opt = optax.adam(optax.exponential_decay(2.5e-2, 8, 0.6))
    ost = opt.init(off)

    @jax.jit
    def grad_step(off, k):
        cur = with_offset(off)
        img = render_linear(cur, camera, W, H, k, 16, 2)
        w2d = jax.grad(lambda im: _loss_from_image(im, target))(
            img).reshape(H, W, 3)

        def radiance_fn(rays):
            return path_mod.trace(cur, rays, k, max_depth=2)

        def hit_fn(rays):
            return scene_ir.intersect_scene(cur, rays, k, 0)

        dv = edge_mod.shadow_boundary_grad(
            base + off3(off), edges_j, efaces_j, mesh.indices, light,
            camera, w2d, W, H, radiance_fn, hit_fn, k, n_samples=8192,
            eps_px=4.0)
        g = dv.sum(axis=0)          # d/d translation = sum over vertices
        return jnp.asarray([g[0], g[2]])

    for i in range(35):
        g = grad_step(off, jax.random.fold_in(key, 1000 + i))
        up, ost = opt.update(g, ost)
        off = optax.apply_updates(off, up)

    err = float(jnp.abs(off).mean())
    # round-5 prototype converged to ratio 0.26; assert with 2x margin
    assert err < 0.5 * err0, (err, err0)

"""Gradient correctness (BASELINE acceptance: pixel-parameter gradients
allclose vs finite differences) and the material-fit loop."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobbyraytracer_tpu.diff.fd import fd_check
from hobbyraytracer_tpu.diff.fit import (fit_materials, render_linear,
                                         render_loss, select_params)
from hobbyraytracer_tpu.scene import build_scene, load_scene_desc

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="module")
def cornell_job():
    return build_scene(load_scene_desc(os.path.join(SCENES,
                                                    "cornell_box.yaml")))


@pytest.fixture(scope="module")
def setup(cornell_job):
    job = cornell_job
    w = h = 16
    key = jax.random.PRNGKey(0)
    target = render_linear(job.scene, job.camera, w, h, key, 4, 4)
    params, rebuild = select_params(job.scene)
    return job, w, h, key, target, params, rebuild


def test_no_nan_gradients(setup):
    job, w, h, key, target, params, rebuild = setup
    p = {**params, "materials": {**params["materials"],
                                 "albedo": jnp.clip(
                                     params["materials"]["albedo"] * 0.3
                                     + 0.3, 0, 1)}}
    _, grads = jax.value_and_grad(render_loss)(
        p, rebuild, job.camera, w, h, key, 2, target, 4)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert not bool(jnp.isnan(leaf).any())


def test_albedo_grad_matches_fd(setup):
    job, w, h, key, target, params, rebuild = setup
    a0 = jnp.clip(params["materials"]["albedo"] * 0.5 + 0.2, 0, 1)

    def f(albedo):
        p = {**params, "materials": {**params["materials"],
                                     "albedo": albedo}}
        return render_loss(p, rebuild, job.camera, w, h, key, 2, target, 4)

    ad, fd = fd_check(jax.jit(f), a0, eps=3e-3, n_probe=4)
    np.testing.assert_allclose(ad, fd, rtol=0.05, atol=1e-5)


def test_light_strength_grad_matches_fd(setup):
    job, w, h, key, target, params, rebuild = setup
    s0 = params["materials"]["strength"] * 0.7

    def f(strength):
        p = {**params, "materials": {**params["materials"],
                                     "strength": strength}}
        return render_loss(p, rebuild, job.camera, w, h, key, 2, target, 4)

    ad, fd = fd_check(jax.jit(f), s0, eps=1e-2, n_probe=3)
    np.testing.assert_allclose(ad, fd, rtol=0.05, atol=1e-6)


def test_vertex_position_grad_finite(tmp_path):
    """Vertex gradients flow and match FD through the smooth channel
    (barycentric uv -> bilinear image albedo). All reference textures are
    piecewise-constant, so vertex grads are legitimately zero a.e. under
    nearest-neighbor lookup; the differentiable path's bilinear extension
    provides the smooth signal."""
    import numpy as _np
    from hobbyraytracer_tpu.io import images as img_io
    ramp = _np.zeros((16, 16, 3), _np.uint8)
    ramp[:, :, 0] = _np.linspace(0, 255, 16, dtype=_np.uint8)[None, :]
    ramp[:, :, 1] = _np.linspace(0, 255, 16, dtype=_np.uint8)[:, None]
    img_io.write_png(str(tmp_path / "ramp.png"), ramp)

    scene_yaml = tmp_path / "tri.yaml"
    scene_yaml.write_text("""
film: {width: 8, height: 8, samples: 1, output: x.png}
camera:
  position: [0.3, 0.2, 2]
  look_at: [0.3, 0.2, 0]
  up: [0, 1, 0]
  fov: 60
  aperture: 0.0
  focal_distance: 1
  background: [2.0, 2.0, 2.0]
textures:
  - {name: ramp, type: image, path: ramp.png}
materials:
  - {name: m, type: lambertian, albedo: ramp}
objects:
  # covers the whole view frustum: no silhouette, so FD sees only the
  # smooth (interior) gradient that AD computes. True edge gradients are
  # the reparameterized-VJP work item (SURVEY.md §7 hard part 2).
  - {type: triangle, v0: [-60, -60, 0], v1: [60, -60, 0], v2: [0, 120, 0],
     material: m}
""")
    job = build_scene(load_scene_desc(str(scene_yaml)))
    job = job.__class__(scene=job.scene.replace(
        textures=job.scene.textures.replace(bilinear=True)),
        camera=job.camera, width=job.width, height=job.height,
        samples=job.samples, output=job.output)
    w = h = 8
    key = jax.random.PRNGKey(1)
    target = render_linear(job.scene, job.camera, w, h, key, 1, 2)
    params, rebuild = select_params(job.scene, fit_vertices=True)
    loss, grads = jax.value_and_grad(render_loss)(
        params, rebuild, job.camera, w, h, key, 1, target * 0.5, 2)
    gv = grads["verts"][0]
    assert not bool(jnp.isnan(gv).any())
    assert float(jnp.abs(gv).sum()) > 0.0

    # FD check on the smooth chain in isolation (first hit -> barycentric
    # uv -> bilinear albedo). The full-integrator FD is contaminated by
    # grazing secondary rays flipping hit/miss (the discontinuous part AD
    # intentionally drops until edge-aware VJPs land).
    from hobbyraytracer_tpu.core.mathx import BIG
    from hobbyraytracer_tpu.core.types import Rays
    from hobbyraytracer_tpu.ops import intersect as isect
    from hobbyraytracer_tpu.ops import texture as tex_ops

    mesh = job.scene.instances[0].mesh
    r = Rays(o=jnp.asarray([[0.3, 0.2, 2.0], [-0.4, 0.1, 2.0]]),
             d=jnp.asarray([[0.1, -0.2, -1.0], [-0.3, 0.2, -1.0]]))
    tab = job.scene.textures

    def f(verts):
        h2 = isect.intersect_triangles(r, verts, mesh.normals, mesh.uvs,
                                       mesh.indices, mesh.mat_id, BIG)
        c = tex_ops.colour_value(tab, jnp.full((2,), 1, jnp.int32),
                                 h2.uv[:, 0], h2.uv[:, 1], h2.p)
        return jnp.sum(c * h2.hit[:, None])

    from hobbyraytracer_tpu.diff.fd import fd_check
    ad, fd = fd_check(jax.jit(f), mesh.verts, eps=1e-3, n_probe=5, seed=2)
    assert float(np.abs(ad).sum()) > 0.0
    np.testing.assert_allclose(ad, fd, rtol=0.08, atol=2e-4)


def test_bvh_mesh_path_is_differentiable():
    """Reverse-mode through the cluster-BVH mesh path: the exact
    while_loop traversal is stop-gradiented and t/attributes are REPLAYED
    differentiably from the winning triangle (regression: round 2's exact
    traversal initially broke `fit` on every BVH mesh scene). The t
    gradient w.r.t. vertices must match finite differences for interior
    hits."""
    import numpy as _np
    from hobbyraytracer_tpu.core.mathx import BIG
    from hobbyraytracer_tpu.core.types import Rays
    from hobbyraytracer_tpu.ops import intersect as isect
    from hobbyraytracer_tpu.scene.bvh import build_clusters

    rng = _np.random.default_rng(0)
    base = rng.uniform(-2, 2, (200, 3)).astype(_np.float32)
    v1 = base + rng.normal(0, 0.4, (200, 3)).astype(_np.float32)
    v2 = base + rng.normal(0, 0.4, (200, 3)).astype(_np.float32)
    verts = _np.concatenate([base, v1, v2]).astype(_np.float32)
    idx = _np.arange(600, dtype=_np.int32).reshape(3, 200).T.copy()
    cl = build_clusters(verts, idx, leaf_size=64)
    normals = _np.tile(_np.asarray([[0, 0, 1]], _np.float32), (600, 1))
    uvs = _np.zeros((600, 2), _np.float32)

    o = rng.uniform(-4, 4, (64, 3)).astype(_np.float32)
    o[:, 2] = 5.0
    d = rng.normal(0, 0.3, (64, 3)).astype(_np.float32)
    d[:, 2] = -1.0
    r = Rays(o=jnp.asarray(o), d=jnp.asarray(d))

    def f(v):
        tvs = v[jnp.asarray(idx)[jnp.maximum(jnp.asarray(cl["tri_id"]),
                                             0)]]
        h = isect.intersect_triangles_bvh(
            r, v, jnp.asarray(normals), jnp.asarray(uvs),
            jnp.asarray(idx), tvs, jnp.asarray(cl["tri_id"]),
            jnp.asarray(cl["bmin"]), jnp.asarray(cl["bmax"]),
            jnp.asarray(0, jnp.int32), BIG, backend="xla")
        return jnp.sum(jnp.where(h.hit, h.t, 0.0))

    fj = jax.jit(f)
    v0j = jnp.asarray(verts)
    g = np.asarray(jax.grad(f)(v0j)).reshape(-1)
    assert np.abs(g).sum() > 0.0
    # FD at the 5 largest-|grad| coordinates (random coords mostly belong
    # to un-hit triangles where both AD and FD are legitimately zero)
    flat = np.asarray(verts).reshape(-1)
    for i in np.argsort(-np.abs(g))[:5]:
        eps = 1e-3
        xp = flat.copy(); xp[i] += eps
        xm = flat.copy(); xm[i] -= eps
        fd = (float(fj(jnp.asarray(xp.reshape(verts.shape))))
              - float(fj(jnp.asarray(xm.reshape(verts.shape))))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=0.1, atol=3e-3)


def test_fit_runs_on_bvh_mesh_scene():
    """`fit` end-to-end on a scene whose mesh uses the cluster BVH
    (shiny_teapot class, BASELINE config 5): loss must be finite and the
    step must run (this crashed with the un-replayed traversal)."""
    from hobbyraytracer_tpu.diff.fit import fit_materials, render_linear
    from hobbyraytracer_tpu.scene.fixtures import ensure_assets

    ensure_assets()
    job = build_scene(load_scene_desc(os.path.join(SCENES,
                                                   "teapot_scene.yaml")))
    assert any(i.kind == "mesh" and i.mesh.use_bvh
               for i in job.scene.instances)
    w, h = 16, 16
    key = jax.random.PRNGKey(0)
    target = render_linear(job.scene, job.camera, w, h, key, 1, 3)
    perturbed = job.scene.replace(materials=job.scene.materials.replace(
        albedo=jnp.clip(job.scene.materials.albedo * 0.5 + 0.2, 0, 1)))
    res = fit_materials(perturbed, job.camera, target, w, h, steps=3,
                        n_samples=1, max_depth=3, key=key, verbose=False)
    assert np.isfinite(res.losses).all()
    assert res.losses[-1] < res.losses[0]


def test_fit_recovers_albedo(cornell_job):
    job = cornell_job
    w = h = 16
    key = jax.random.PRNGKey(3)
    target = render_linear(job.scene, job.camera, w, h, key, 4, 4)
    pert = job.scene.replace(materials=job.scene.materials.replace(
        albedo=jnp.clip(job.scene.materials.albedo * 0.3 + 0.3, 0, 1)))
    res = fit_materials(pert, job.camera, target, w, h, steps=40, lr=5e-2,
                        n_samples=4, max_depth=4, key=key, verbose=False)
    assert res.losses[-1] < res.losses[0] * 0.2
    # red wall recovered to the right hue
    red = np.asarray(res.scene.materials.albedo[2])
    assert red[0] > 2.5 * red[1], red


def test_pallas_replay_grads_match_xla():
    """The fast differentiable path (Pallas FIND over build-time tables +
    differentiable replay, mesh_backend="auto_diff"/"pallas_replay") must
    produce the same material gradients as the XLA find on a static-
    geometry scene (interpret mode stands in for the chip)."""
    from hobbyraytracer_tpu.diff.fit import render_loss, select_params
    from hobbyraytracer_tpu.scene.fixtures import ensure_assets

    ensure_assets()
    job = build_scene(load_scene_desc(os.path.join(SCENES,
                                                   "teapot_scene.yaml")))
    w = h = 16
    key = jax.random.PRNGKey(3)
    params, rebuild = select_params(job.scene)
    from hobbyraytracer_tpu.diff.fit import render_linear
    target = render_linear(job.scene, job.camera, w, h,
                           jax.random.PRNGKey(9), 1, 3)

    def loss(p, backend):
        return render_loss(p, rebuild, job.camera, w, h, key, 1, target,
                           3, mesh_backend=backend)

    lx, gx = jax.value_and_grad(loss)(params, "xla")
    os.environ["HRT_PALLAS_INTERPRET"] = "1"
    try:
        lp, gp = jax.value_and_grad(loss)(params, "auto_diff")
    finally:
        del os.environ["HRT_PALLAS_INTERPRET"]
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
    for f in ("albedo", "roughness", "strength"):
        np.testing.assert_allclose(np.asarray(gp["materials"][f]),
                                   np.asarray(gx["materials"][f]),
                                   rtol=2e-3, atol=2e-5, err_msg=f)


def test_pallas_replay_vertex_grads_with_moving_verts():
    """Round-3 verdict #6: vertex fits were pinned to the XLA find
    because the build-time kernel tables could not see moving vertices.
    rebuild() now refreshes tri_soa/bounds8 from the live verts
    (ir.refresh_kernel_tables), so with the vertices MOVED well away
    from the build-time geometry the Pallas find must still agree with
    the XLA find — loss AND vertex gradients."""
    from hobbyraytracer_tpu.diff.fit import (render_linear, render_loss,
                                             select_params)
    from hobbyraytracer_tpu.scene.fixtures import ensure_assets

    ensure_assets()
    job = build_scene(load_scene_desc(os.path.join(SCENES,
                                                   "shiny_teapot.yaml")))
    # bilinear env lookups give the smooth direction-dependence that
    # makes metal-reflection vertex grads nonzero (nearest-neighbor is
    # piecewise constant: zero a.e.)
    scene = job.scene.replace(
        textures=job.scene.textures.replace(bilinear=True))
    w = h = 16
    key = jax.random.PRNGKey(5)
    target = render_linear(scene, job.camera, w, h,
                           jax.random.PRNGKey(9), 1, 3)
    params, rebuild = select_params(scene, fit_vertices=True)
    # move the whole mesh: a stale build-time find would still report
    # hits at the OLD location and the two backends would diverge hard
    params["verts"] = [v + jnp.asarray([0.6, -0.4, 0.5])
                       for v in params["verts"]]

    def loss(p, backend):
        return render_loss(p, rebuild, job.camera, w, h, key, 1, target,
                           3, mesh_backend=backend)

    lx, gx = jax.value_and_grad(loss)(params, "xla")
    os.environ["HRT_PALLAS_INTERPRET"] = "1"
    try:
        lp, gp = jax.value_and_grad(loss)(params, "auto_diff")
    finally:
        del os.environ["HRT_PALLAS_INTERPRET"]
    np.testing.assert_allclose(float(lp), float(lx), rtol=1e-4)
    vx = np.asarray(gx["verts"][0])
    vp = np.asarray(gp["verts"][0])
    assert np.abs(vx).max() > 0  # vertices actually receive gradient
    np.testing.assert_allclose(vp, vx, rtol=2e-3, atol=2e-5)

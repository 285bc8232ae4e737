"""Inverse rendering: differentiable material / vertex fitting.

The reference has no autodiff — this subsystem is the new framework's
extension target (BASELINE.json north star: pipeline differentiable w.r.t.
material albedo/roughness/IOR and vertex positions; config 5 is a
differentiable material fit on the shiny_teapot scene).

Design: the scene pytree IS the parameter vector. `select_params` splits a
SceneIR into (params, static) where params holds the differentiable leaves
(material table floats, optionally mesh vertices); `render_loss` rebuilds
the scene and renders with the scan-based differentiable integrator;
`fit_materials` runs optax.adam on top. Gradients flow through shading
chains via differentiable path replay (discrete path decisions are
stop-gradiented, integrator/path.py:trace_diff).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ..core import rng
from ..integrator import path as path_mod
from ..scene import ir as scene_ir

# material-table leaves that are fit targets
MAT_FIELDS = ("albedo", "roughness", "strength", "ior", "metallness")


def project_materials(params: dict) -> dict:
    """Clamp fitted material parameters to their physical ranges after an
    optimizer step. THE single definition — the single-device fit step
    (fit_materials) and the shard_map step
    (parallel/shard.py:make_sharded_fit_step) must share a trajectory,
    so both call this."""
    m = params.get("materials")
    if m is not None:
        m["albedo"] = jnp.clip(m["albedo"], 0.0, 1.0)
        m["roughness"] = jnp.clip(m["roughness"], 0.0, 1.0)
        m["ior"] = jnp.clip(m["ior"], 1.0, 3.0)
        m["strength"] = jnp.maximum(m["strength"], 0.0)
    return params


def select_params(scene: scene_ir.SceneIR, fit_vertices: bool = False):
    """-> (params dict, rebuild fn). params: {"materials": {...},
    "verts": [v_i...]} — a plain pytree suitable for optax."""
    params = {"materials": {f: getattr(scene.materials, f)
                            for f in MAT_FIELDS}}
    if fit_vertices:
        params["verts"] = [inst.mesh.verts for inst in scene.instances
                           if inst.kind == "mesh"]

    def rebuild(p) -> scene_ir.SceneIR:
        mats = scene.materials.replace(**p["materials"])
        instances = scene.instances
        if fit_vertices:
            vi = 0
            new_instances = []
            for inst in instances:
                if inst.kind == "mesh":
                    # refresh the Pallas find tables from the fitted
                    # vertices so the kernel FIND tracks the moving
                    # geometry (round-4; see ir.refresh_kernel_tables)
                    mesh = scene_ir.refresh_kernel_tables(
                        inst.mesh.replace(verts=p["verts"][vi]))
                    new_instances.append(inst.replace(mesh=mesh))
                    vi += 1
                else:
                    new_instances.append(inst)
            instances = tuple(new_instances)
        return scene.replace(materials=mats, instances=instances)

    return params, rebuild


def render_linear(scene: scene_ir.SceneIR, camera, width: int, height: int,
                  key, n_samples: int, max_depth: int = 6,
                  mesh_backend: str = "auto_diff") -> jnp.ndarray:
    """Linear-radiance render (pre-tonemap) with the differentiable
    integrator. Returns (W*H, 3). mesh_backend "auto_diff" = Pallas find
    over the scene's kernel tables (vertex fits keep these fresh via
    ir.refresh_kernel_tables in rebuild); "xla" = lockstep traversal."""
    x, y = path_mod.pixel_grid(width, height)

    def one_sample(acc, s):
        k = jax.random.fold_in(key, s)
        ku, kv, kt = jax.random.split(k, 3)
        ju = jax.random.uniform(ku, x.shape, jnp.float32)
        jv = jax.random.uniform(kv, y.shape, jnp.float32)
        u = (x + ju) / (width - 1)
        v = (y + jv) / (height - 1)
        from ..ops.camera import get_rays
        rays = get_rays(camera, u, v, key=kt)
        return acc + path_mod.trace_diff(scene, rays, kt, max_depth,
                                         mesh_backend=mesh_backend), None

    acc = jnp.zeros((width * height, 3), jnp.float32)
    # scan + per-sample remat: reverse-mode memory stays at ONE sample's
    # bounce chain regardless of n_samples (each sample is recomputed in
    # the backward pass; trace_diff remats each bounce the same way)
    acc, _ = jax.lax.scan(jax.checkpoint(one_sample), acc,
                          jnp.arange(n_samples, dtype=jnp.int32))
    return acc / jnp.float32(n_samples)


def render_linear_slice(scene: scene_ir.SceneIR, camera, width: int,
                        height: int, key, n_samples: int, pix0, n_pix: int,
                        max_depth: int = 6,
                        mesh_backend: str = "auto_diff") -> jnp.ndarray:
    """render_linear restricted to the n_pix pixels starting at flat
    index pix0 (which may be traced — a shard_map worker derives it from
    its axis index). Every RNG draw is the FULL-image stream sliced to
    this worker's rows (core/rng.py span), so the result is bit-identical
    to render_linear(...)[pix0:pix0+n_pix] — the property that makes the
    shard_map fit path match the single-device fit exactly
    (tests/test_dist.py::test_sharded_fit_grads_match_pallas)."""
    wh = width * height
    pidx = pix0 + jnp.arange(n_pix, dtype=jnp.int32)
    x = (pidx % width).astype(jnp.float32)
    y = (height - pidx // width).astype(jnp.float32)
    span = (pix0, wh)

    def one_sample(acc, s):
        k = jax.random.fold_in(key, s)
        ku, kv, kt = jax.random.split(k, 3)
        ju = rng.uniform(ku, (n_pix,), span)
        jv = rng.uniform(kv, (n_pix,), span)
        u = (x + ju) / (width - 1)
        v = (y + jv) / (height - 1)
        from ..ops.camera import get_rays
        rays = get_rays(camera, u, v, key=kt, span=span)
        return acc + path_mod.trace_diff(scene, rays, kt, max_depth,
                                         mesh_backend=mesh_backend,
                                         rng_span=span), None

    acc = jnp.zeros((n_pix, 3), jnp.float32)
    acc, _ = jax.lax.scan(jax.checkpoint(one_sample), acc,
                          jnp.arange(n_samples, dtype=jnp.int32))
    return acc / jnp.float32(n_samples)


def _loss_from_image(img, target, tonemapped: bool = True):
    """L2 between (W*H,3) linear radiance images, optionally in
    tonemapped space."""
    if tonemapped:
        from ..ops import film
        img = film.tonemap(img, grad_eps=1e-6)
        target = film.tonemap(target, grad_eps=1e-6)
    return jnp.mean((img - target) ** 2)


def render_loss(params, rebuild, camera, width, height, key, n_samples,
                target, max_depth: int = 6, tonemapped: bool = True,
                mesh_backend: str = "auto_diff"):
    """L2 image loss against `target` ((W*H,3) linear or tonemapped)."""
    scene = rebuild(params)
    img = render_linear(scene, camera, width, height, key, n_samples,
                        max_depth, mesh_backend=mesh_backend)
    return _loss_from_image(img, target, tonemapped)


class FitResult(NamedTuple):
    scene: scene_ir.SceneIR
    losses: jnp.ndarray
    params: dict


def fit_materials(scene: scene_ir.SceneIR, camera, target, width, height,
                  steps: int = 50, lr: float = 2e-2, n_samples: int = 4,
                  max_depth: int = 6, key=None, fit_vertices: bool = False,
                  verbose: bool = True, correlated: bool = True,
                  boundary: bool = False,
                  boundary_samples: int = 4096,
                  shadow_light=None) -> FitResult:
    """Adam fit of material parameters (and optionally mesh vertices) to a
    target image. target: (W*H, 3) linear radiance.

    `correlated=True` (default) reuses ONE key for every step — when the
    target was rendered with the same key/spp, the Monte Carlo noise
    cancels between render and target and the optimum is exact (standard
    correlated-sampling trick for inverse path tracing). Set False for
    independent per-step noise (real captured targets).

    `boundary=True` (with fit_vertices) adds the edge-sampled silhouette
    term (diff/edges.py) to each mesh's vertex gradient — without it,
    vertex positions only feel the smooth shading-chain gradient, which
    is ZERO for problems dominated by occlusion/silhouette (e.g. moving
    an emissive shape into place).

    `shadow_light` (a (3,) emitter position, with boundary+fit_vertices)
    additionally adds the SHADOW-silhouette term: the gradient of the
    shadows the mesh casts on other surfaces (diff/edges.py
    shadow_boundary_grad) — needed when a blocker's shadow, not its own
    pixels, drives the loss."""
    key = key if key is not None else jax.random.PRNGKey(0)
    params, rebuild = select_params(scene, fit_vertices)
    # Both fit kinds run the Pallas find ("auto_diff" -> pallas_replay).
    # Vertex fits used to be pinned to the lockstep XLA traversal because
    # the build-time kernel tables could not see moving vertices; since
    # round 4, rebuild() refreshes the tables from the live verts every
    # step (ir.refresh_kernel_tables), so the find tracks the fit.
    mesh_backend = "auto_diff"
    opt = optax.adam(lr)
    opt_state = opt.init(params)

    edge_tables = None
    if boundary and fit_vertices:
        import numpy as np

        from . import edges as edge_mod
        edge_tables = []
        for inst in scene.instances:
            if inst.kind == "mesh":
                e, f = edge_mod.build_edge_table(
                    np.asarray(inst.mesh.indices))
                edge_tables.append((jnp.asarray(e), jnp.asarray(f),
                                    inst.mesh.indices))

    @jax.jit
    def boundary_terms(params, k):
        """Silhouette gradients for every fitted mesh at the current
        parameters, weighted by dL/dI of the current render."""
        from . import edges as edge_mod
        cur = rebuild(params)
        img = render_linear(cur, camera, width, height, k, n_samples,
                            max_depth, mesh_backend=mesh_backend)
        w_img = jax.grad(
            lambda im: _loss_from_image(im, target))(img)
        w2d = w_img.reshape(height, width, 3)

        def radiance_fn(rays):
            # boundary terms only exist for vertex fits: live geometry,
            # so the forward trace must use the XLA find too
            return path_mod.trace(cur, rays, k, max_depth,
                                  mesh_backend="xla")

        out = [edge_mod.boundary_grad(
            v, e, f, idx, camera, w2d, width, height, radiance_fn, k,
            n_samples=boundary_samples)
            for v, (e, f, idx) in zip(params["verts"], edge_tables)]
        if shadow_light is not None:
            def hit_fn(rays):
                return scene_ir.intersect_scene(cur, rays, k, 0,
                                                mesh_backend="xla")
            out = [g + edge_mod.shadow_boundary_grad(
                v, e, f, idx, jnp.asarray(shadow_light, jnp.float32),
                camera, w2d, width, height, radiance_fn, hit_fn, k,
                n_samples=boundary_samples)
                for g, v, (e, f, idx) in zip(out, params["verts"],
                                             edge_tables)]
        return out

    @jax.jit
    def step(params, opt_state, k):
        loss, grads = jax.value_and_grad(render_loss)(
            params, rebuild, camera, width, height, k, n_samples, target,
            max_depth, mesh_backend=mesh_backend)
        if edge_tables is not None:
            bg = boundary_terms(params, k)
            grads["verts"] = [g + b for g, b in zip(grads["verts"], bg)]
        updates, opt_state = opt.update(grads, opt_state)
        params = project_materials(optax.apply_updates(params, updates))
        return params, opt_state, loss

    losses = []
    for i in range(steps):
        params, opt_state, loss = step(
            params, opt_state,
            key if correlated else jax.random.fold_in(key, i))
        losses.append(float(loss))
        if verbose and (i % max(1, steps // 10) == 0 or i == steps - 1):
            print(f"fit step {i}: loss {losses[-1]:.6f}")
    return FitResult(scene=rebuild(params), losses=jnp.asarray(losses),
                     params=params)

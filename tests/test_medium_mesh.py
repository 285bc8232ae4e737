"""Mesh-boundary constant medium (ir.Medium btype='mesh'): a cube OBJ
boundary must agree with the analytic box boundary (same geometry, same
RNG stream -> near-identical scatter events), closing the reference's
any-Hittable ConstantMedium capability (constantMedium.h:10-14)."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobbyraytracer_tpu.core.types import Rays
from hobbyraytracer_tpu.scene import build_scene, load_scene_desc
from hobbyraytracer_tpu.scene import ir as scene_ir

CUBE_OBJ = """
v -1 -1 -1
v 1 -1 -1
v 1 1 -1
v -1 1 -1
v -1 -1 1
v 1 -1 1
v 1 1 1
v -1 1 1
f 1 3 2
f 1 4 3
f 5 6 7
f 5 7 8
f 1 2 6
f 1 6 5
f 2 3 7
f 2 7 6
f 3 4 8
f 3 8 7
f 4 1 5
f 4 5 8
"""

SCENE_TMPL = """
film: {{width: 16, height: 16, samples: 4, output: x.png}}
camera:
  position: [0, 0, -6]
  look_at: [0, 0, 0]
  up: [0, 1, 0]
  fov: 40
  aperture: 0.0
  focal_distance: 6
  background: [0.8, 0.8, 0.8]
materials: []
objects:
  - type: constant_medium
    density: 0.7
    albedo: [0.9, 0.9, 0.9]
    boundary: {boundary}
"""


def _build(boundary_yaml: str):
    with tempfile.NamedTemporaryFile("w", suffix=".yaml",
                                     delete=False) as f:
        f.write(SCENE_TMPL.format(boundary=boundary_yaml))
        p = f.name
    try:
        return build_scene(load_scene_desc(p))
    finally:
        os.unlink(p)


@pytest.fixture(scope="module")
def jobs():
    with tempfile.NamedTemporaryFile("w", suffix=".obj",
                                     delete=False) as f:
        f.write(CUBE_OBJ)
        obj = f.name
    box = _build("{type: box, min: [-1, -1, -1], max: [1, 1, 1]}")
    mesh = _build("{type: mesh, path: %s}" % obj)
    os.unlink(obj)
    return box, mesh


def _rand_rays(n=2048, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-4, 4, (n, 3)).astype(np.float32)
    o[:, 2] = -5.0  # start outside, in front
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    d[:, 2] = np.abs(d[:, 2]) + 0.5  # generally toward the cube
    return Rays(o=jnp.asarray(o), d=jnp.asarray(d))


def test_mesh_medium_matches_box_medium(jobs):
    box, mesh = jobs
    assert box.scene.media[0].btype == "box"
    assert mesh.scene.media[0].btype == "mesh"
    r = _rand_rays()
    key = jax.random.PRNGKey(0)
    hb = scene_ir._intersect_medium(box.scene.media[0], r, key, 0, 0,
                                    1e-3, jnp.inf)
    hm = scene_ir._intersect_medium(mesh.scene.media[0], r, key, 0, 0,
                                    1e-3, jnp.inf)
    b_hit = np.asarray(hb.hit)
    m_hit = np.asarray(hm.hit)
    # same boundary, same RNG stream: scatter decisions agree (tiny
    # disagreement allowed at grazing rays / the re-cast epsilon)
    assert (b_hit == m_hit).mean() > 0.99, (b_hit.mean(), m_hit.mean())
    both = b_hit & m_hit
    assert both.any()
    np.testing.assert_allclose(np.asarray(hm.t)[both],
                               np.asarray(hb.t)[both], rtol=1e-3,
                               atol=1e-3)


def test_mesh_medium_ray_starting_inside(jobs):
    _, mesh = jobs
    n = 512
    o = np.zeros((n, 3), np.float32)  # at the cube center
    rng = np.random.default_rng(1)
    d = rng.normal(0, 1, (n, 3)).astype(np.float32)
    r = Rays(o=jnp.asarray(o), d=jnp.asarray(d))
    h = scene_ir._intersect_medium(mesh.scene.media[0], r, jax.random.
                                   PRNGKey(2), 0, 0, 1e-3, jnp.inf)
    # density 0.7 over ~1 unit: a solid fraction of rays scatter before
    # exiting, and every scatter point lies inside the cube
    hit = np.asarray(h.hit)
    assert hit.mean() > 0.2, hit.mean()
    p = np.asarray(h.p)[hit]
    assert (np.abs(p) <= 1.0 + 1e-3).all()


def test_mesh_medium_through_full_scene(jobs):
    """intersect_scene integrates the mesh medium like any other."""
    _, mesh = jobs
    r = _rand_rays(256, seed=3)
    h = scene_ir.intersect_scene(mesh.scene, r, jax.random.PRNGKey(4), 0)
    assert np.isfinite(np.asarray(h.t)).all()


def _shifted_cube_obj(dz, vbase):
    """CUBE_OBJ translated by dz along z with vertex indices offset."""
    out = []
    for line in CUBE_OBJ.strip().splitlines():
        toks = line.split()
        if toks[0] == "v":
            x, y, z = (float(t) for t in toks[1:4])
            out.append(f"v {x} {y} {z + dz}")
        else:
            a, b, c = (int(t) + vbase for t in toks[1:4])
            out.append(f"f {a} {b} {c}")
    return "\n".join(out)


def test_nonconvex_mesh_boundary_first_span_only():
    """Documented approximation (ir._medium_span, btype='mesh'): a
    NON-CONVEX boundary contributes its FIRST span only — the first two
    crossings. Two disjoint unit cubes (z in [-1,1] and [3,5]) in one
    mesh: a +z ray entering from z=-5 must get span [4, 6] in t (the
    first cube's chord), NOT extend to the second cube (exit t=10). If
    the approximation is ever upgraded to re-entrant sampling (the
    reference's ConstantMedium::hit re-casts per hit,
    constantMedium.cpp:4-38), this pin should change deliberately."""
    two = _shifted_cube_obj(0.0, 0) + "\n" + _shifted_cube_obj(4.0, 8)
    with tempfile.NamedTemporaryFile("w", suffix=".obj",
                                     delete=False) as f:
        f.write(two)
        obj = f.name
    try:
        job = _build("{type: mesh, path: %s}" % obj)
    finally:
        os.unlink(obj)
    med = job.scene.media[0]
    assert med.btype == "mesh"
    n = 8
    o = np.tile(np.asarray([[0.0, 0.0, -5.0]], np.float32), (n, 1))
    o[:, 0] = np.linspace(-0.5, 0.5, n)  # stay inside both cubes' x range
    d = np.tile(np.asarray([[0.0, 0.0, 1.0]], np.float32), (n, 1))
    r = Rays(o=jnp.asarray(o), d=jnp.asarray(d))
    t1, t2, valid = scene_ir._medium_span(med, r)
    assert bool(np.asarray(valid).all())
    np.testing.assert_allclose(np.asarray(t1), 4.0, atol=1e-3)
    np.testing.assert_allclose(np.asarray(t2), 6.0, atol=1e-3)

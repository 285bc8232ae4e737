"""Scene schema + builder behavior (reference: scene.cpp)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobbyraytracer_tpu.core.mathx import BIG
from hobbyraytracer_tpu.core.types import Rays
from hobbyraytracer_tpu.scene import build_scene, load_scene_desc
from hobbyraytracer_tpu.scene import ir as sir
from hobbyraytracer_tpu.scene.schema import SceneError

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


def _write(tmp_path, text):
    p = tmp_path / "s.yaml"
    p.write_text(text)
    return str(p)


MINIMAL = """
film: {width: 8, height: 8, samples: 1, output: x.png}
camera:
  position: [0, 0, 1]
  look_at: [0, 0, 0]
  up: [0, 1, 0]
  fov: 60
  aperture: 0.0
  focal_distance: 1
  background: [0.5, 0.5, 0.5]
materials:
  - {name: m, type: lambertian, albedo: [0.5, 0.5, 0.5]}
objects:
  - {type: sphere, center: [0, 0, -2], radius: 1, material: m}
"""


def test_minimal_scene_loads(tmp_path):
    job = build_scene(load_scene_desc(_write(tmp_path, MINIMAL)))
    assert job.width == 8 and job.samples == 1
    assert job.scene.spheres.center.shape == (1, 3)


def test_missing_film_errors(tmp_path):
    with pytest.raises(SceneError, match="film"):
        load_scene_desc(_write(tmp_path, "camera: {}\n"))


def test_missing_background_errors(tmp_path):
    bad = MINIMAL.replace("  background: [0.5, 0.5, 0.5]\n", "")
    with pytest.raises(SceneError, match="background"):
        load_scene_desc(_write(tmp_path, bad))


def test_missing_required_property(tmp_path):
    bad = MINIMAL.replace("  fov: 60\n", "")
    with pytest.raises(SceneError, match="Could not find required property"):
        load_scene_desc(_write(tmp_path, bad))


def test_unknown_material_skips_object(tmp_path, capsys):
    bad = MINIMAL.replace("material: m}", "material: nope}")
    job = build_scene(load_scene_desc(_write(tmp_path, bad)))
    assert job.scene.spheres.center.shape[0] == 0  # skipped with log
    assert "Material nope does not exist!" in capsys.readouterr().out


def test_duplicate_texture_name(tmp_path):
    bad = MINIMAL + """
textures:
  - {name: t, type: solid, colour: [1, 0, 0]}
  - {name: t, type: solid, colour: [0, 1, 0]}
"""
    with pytest.raises(SceneError, match="already exists"):
        load_scene_desc(_write(tmp_path, bad))


def test_all_fixture_scenes_build():
    from hobbyraytracer_tpu.scene.fixtures import ensure_assets
    ensure_assets()
    for name in ["scattered_balls", "cornell_box", "teapot_scene",
                 "cornell_smoke", "shiny_teapot"]:
        job = build_scene(load_scene_desc(os.path.join(SCENES,
                                                       f"{name}.yaml")))
        assert job.width > 0


def test_transform_equivalence_translate():
    """A translated sphere instance must hit exactly like a moved sphere."""
    desc_moved = sir.SphereTable(
        center=jnp.asarray([[3.0, 1.0, -5.0]]), radius=jnp.asarray([1.0]),
        mat_id=jnp.asarray([1], jnp.int32))
    inst = sir.Instance(
        kind="sphere",
        spheres=sir.SphereTable(center=jnp.asarray([[0.0, 0.0, 0.0]]),
                                radius=jnp.asarray([1.0]),
                                mat_id=jnp.asarray([1], jnp.int32)),
        transform=sir.Transform(translate=jnp.asarray([3.0, 1.0, -5.0]),
                                scale=jnp.asarray([1.0, 1.0, 1.0]),
                                quat=jnp.asarray([1.0, 0, 0, 0])))
    rays = Rays(o=jnp.asarray([[3.0, 1.0, 5.0]]),
                d=jnp.asarray([[0.0, 0.0, -1.0]]))
    from hobbyraytracer_tpu.ops import intersect as isect
    h_direct = isect.intersect_spheres(rays, desc_moved.center,
                                       desc_moved.radius, desc_moved.mat_id,
                                       1e-3, BIG)
    h_inst = sir._intersect_instance(inst, rays, 1e-3)
    np.testing.assert_allclose(h_inst.t, h_direct.t, rtol=1e-5)
    np.testing.assert_allclose(h_inst.p, h_direct.p, atol=1e-5)
    np.testing.assert_allclose(h_inst.normal, h_direct.normal, atol=1e-5)


def test_transform_rotate_scale_box_instance():
    """Rotated+scaled rect instance: hit point maps back to world space."""
    import math
    # unit xz_rect at y=0 spanning [-1,1]^2, scaled by 2, rotated 90deg
    # about y, translated to (10,5,0)
    rect = sir.RectTable(axis=jnp.asarray([1], jnp.int32),
                         a0=jnp.asarray([-1.0]), a1=jnp.asarray([1.0]),
                         b0=jnp.asarray([-1.0]), b1=jnp.asarray([1.0]),
                         k=jnp.asarray([0.0]),
                         mat_id=jnp.asarray([2], jnp.int32))
    from hobbyraytracer_tpu.core import quat
    q = quat.from_euler(jnp.asarray([0.0, math.pi / 2, 0.0]))
    inst = sir.Instance(kind="rect", rects=rect, transform=sir.Transform(
        translate=jnp.asarray([10.0, 5.0, 0.0]),
        scale=jnp.asarray([2.0, 2.0, 2.0]), quat=q))
    # world rect now spans x in [8,12], z in [-2,2] at y=5
    rays = Rays(o=jnp.asarray([[9.0, 10.0, 1.0]]),
                d=jnp.asarray([[0.0, -1.0, 0.0]]))
    h = sir._intersect_instance(inst, rays, 1e-3)
    assert bool(h.hit[0])
    np.testing.assert_allclose(h.t[0], 5.0, rtol=1e-5)  # world-unit t
    np.testing.assert_allclose(h.p[0], [9.0, 5.0, 1.0], atol=1e-4)
    np.testing.assert_allclose(h.normal[0], [0.0, 1.0, 0.0], atol=1e-5)


def test_medium_free_flight_statistics():
    """Scatter distance inside a thick medium follows Exp(density)."""
    med = sir.Medium(btype="box", bmin=jnp.asarray([-1e3, -1e3, 0.0]),
                     bmax=jnp.asarray([1e3, 1e3, 1e3]),
                     neg_inv_density=jnp.asarray(-1.0 / 0.05),
                     mat_id=jnp.asarray(1, jnp.int32))
    n = 4000
    rays = Rays(o=jnp.zeros((n, 3), jnp.float32) - jnp.asarray([0, 0, 1.0]),
                d=jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3)))
    h = sir._intersect_medium(med, rays, jax.random.PRNGKey(0), 0, 0,
                              1e-3, BIG)
    t = np.asarray(h.t)[np.asarray(h.hit)]
    assert len(t) > n * 0.99  # optically thick: almost all scatter
    # depth inside medium = t - 1; mean of Exp(0.05) = 20
    np.testing.assert_allclose((t - 1.0).mean(), 20.0, rtol=0.1)

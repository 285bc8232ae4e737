"""Integration renders (small, CPU): structural checks on the fixture
scenes — the reference's golden-image strategy made quantitative
(SURVEY.md §4)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobbyraytracer_tpu.integrator import path
from hobbyraytracer_tpu.scene import build_scene, load_scene_desc

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="module")
def cornell():
    job = build_scene(load_scene_desc(os.path.join(SCENES,
                                                   "cornell_box.yaml")))
    img = path.render_image(job.scene, job.camera, 64, 64, 48,
                            jax.random.PRNGKey(0))
    return np.asarray(img)


def test_cornell_structure(cornell):
    img = cornell
    assert img.shape == (64, 64, 3)
    assert not np.isnan(img).any()
    assert img.min() >= 0.0 and img.max() <= 1.0
    # direct light view: saturated pixels in the upper third, center cols
    assert img[0:21, 24:40].max() >= 0.99
    # brightest 4x16 band is in the upper third (the light patch)
    windows = [(r, img[r:r + 4, 24:40].mean()) for r in range(0, 60)]
    bright_row, bright = max(windows, key=lambda x: x[1])
    floor = img[52:60, 24:40].mean()
    assert bright > 0.5 and bright_row < 21, (bright_row, bright)
    # green wall on image-left (x=555 side), red wall on image-right (x=0):
    # camera looks +z with +x to the left
    left = img[24:40, 2:10].reshape(-1, 3).mean(axis=0)
    right = img[24:40, 54:62].reshape(-1, 3).mean(axis=0)
    assert left[1] > left[0], left    # green dominant
    assert right[0] > right[1], right  # red dominant
    assert floor > 0.05  # bounce light reaches the floor


def test_deterministic_same_key(cornell):
    job = build_scene(load_scene_desc(os.path.join(SCENES,
                                                   "cornell_box.yaml")))
    img2 = path.render_image(job.scene, job.camera, 64, 64, 48,
                             jax.random.PRNGKey(0))
    np.testing.assert_array_equal(cornell, np.asarray(img2))


def test_sample_chunking_equivalent_statistics():
    """Chunked accumulation uses different keys but must agree closely in
    the mean (unbiasedness smoke test)."""
    job = build_scene(load_scene_desc(os.path.join(SCENES,
                                                   "cornell_box.yaml")))
    a = path.render_image(job.scene, job.camera, 32, 32, 32,
                          jax.random.PRNGKey(1))
    b = path.render_image(job.scene, job.camera, 32, 32, 32,
                          jax.random.PRNGKey(1), sample_chunk=8)
    assert abs(float(jnp.mean(a)) - float(jnp.mean(b))) < 0.02


def test_scattered_balls_sky_and_ground():
    job = build_scene(load_scene_desc(os.path.join(
        SCENES, "scattered_balls.yaml")))
    img = np.asarray(path.render_image(job.scene, job.camera, 64, 36, 8,
                                       jax.random.PRNGKey(2)))
    sky = img[0:8].reshape(-1, 3).mean(axis=0)
    # sky gradient: blue-ish dominant, bright
    assert sky[2] >= sky[0] and sky.mean() > 0.7, sky
    assert img[24:].mean() > 0.2  # lit ground region


def test_smoke_scene_renders():
    job = build_scene(load_scene_desc(os.path.join(SCENES,
                                                   "cornell_smoke.yaml")))
    img = np.asarray(path.render_image(job.scene, job.camera, 48, 48, 16,
                                       jax.random.PRNGKey(3)))
    assert not np.isnan(img).any()
    assert img.mean() > 0.05
    # fog box region (image lower-left) scatters light -> not black
    assert img[28:40, 8:24].mean() > 0.05


def test_env_background_gradient():
    """shiny_teapot: metal teapot against the generated hall env map."""
    from hobbyraytracer_tpu.scene.fixtures import ensure_assets
    ensure_assets()
    job = build_scene(load_scene_desc(os.path.join(SCENES,
                                                   "shiny_teapot.yaml")))
    img = np.asarray(path.render_image(job.scene, job.camera, 48, 27, 4,
                                       jax.random.PRNGKey(4)))
    assert not np.isnan(img).any()
    # sky band visible above the teapot
    assert img[0:5].mean() > 0.3


def test_batch_render_progress_fires():
    """Batch integrator per-chunk progress (the wavefront path already had
    it; this closed the `--integrator batch` gap)."""
    job = build_scene(load_scene_desc(os.path.join(SCENES,
                                                   "cornell_box.yaml")))
    seen = []
    path.render_image(job.scene, job.camera, 8, 8, 4,
                      jax.random.PRNGKey(0), max_depth=3, sample_chunk=2,
                      progress_cb=lambda d, t: seen.append((d, t)))
    assert seen[-1] == (8 * 8 * 4, 8 * 8 * 4)
    assert all(a[0] < b[0] for a, b in zip(seen, seen[1:]))

"""Golden-image parity vs the reference's shipped renders
(/root/reference/sampleImages, README.md:18-36).

The reference repo ships the GOLDENS but not the scene YAMLs they were
rendered from (only teapot_scene/shiny_teapot exist, and their assets —
teapot.obj via assimp, old_hall_4k.hdr — are missing LFS blobs). Our
scenes/*.yaml are reconstructions calibrated against the goldens, so
parity is STATISTICAL in tonemapped space:

- per-region means (walls / floor / overall) within an absolute tolerance
  that covers RNG noise at test spp + the asset substitutions;
- hue dominance (green-left / red-right walls, warm light) must match;
- coarse spatial structure (downsampled grid correlation) must match.

Tolerances are deliberately wide (0.10 abs per channel, corr > 0.75); the
sharp radiometry checks live in the unit tests (ACES/film oracles,
furnace-style convergence in test_render.py / test_wavefront.py).
"""
import os

import jax
import numpy as np
import pytest
from PIL import Image

from hobbyraytracer_tpu.integrator import wavefront
from hobbyraytracer_tpu.scene import build_scene, load_scene_desc
from hobbyraytracer_tpu.scene.fixtures import ensure_assets

HERE = os.path.dirname(__file__)
SCENES = os.path.join(HERE, "..", "scenes")
GOLDENS = "/root/reference/sampleImages"

pytestmark = pytest.mark.skipif(not os.path.isdir(GOLDENS),
                                reason="reference goldens not present")


def _golden(name, size):
    p = os.path.join(GOLDENS, name)
    img = Image.open(p).convert("RGB").resize(size)
    return np.asarray(img, np.float32) / 255.0


def _render(scene_file, w, h, spp=48, seed=0):
    ensure_assets()
    job = build_scene(load_scene_desc(os.path.join(SCENES, scene_file)))
    img = wavefront.render_image(job.scene, job.camera, w, h, spp,
                                 jax.random.PRNGKey(seed), pool=16384)
    return np.asarray(img)


def _grid_corr(a, b, n=8):
    h, w, _ = a.shape
    ga = a[:h // n * n, :w // n * n].reshape(n, h // n, n, w // n, 3
                                             ).mean(axis=(1, 3, 4))
    gb = b[:h // n * n, :w // n * n].reshape(n, h // n, n, w // n, 3
                                             ).mean(axis=(1, 3, 4))
    return np.corrcoef(ga.ravel(), gb.ravel())[0, 1]


def test_cornell_box_matches_golden():
    ours = _render("cornell_box.yaml", 64, 64)
    ref = _golden("Cornell-Box.png", (64, 64))
    h = w = 64
    assert abs(ours.mean() - ref.mean()) < 0.10, (ours.mean(), ref.mean())
    # 0.16 on the dominant channel: the golden's red wall reads hotter
    # than a classic 0.65-albedo Cornell red can reach — its unknown scene
    # likely used a brighter red; the minority channels pin the hue tightly
    for sl, label, tol in [
            ((slice(h // 4, 3 * h // 4), slice(0, w // 8)),
             "left wall", 0.10),
            ((slice(h // 4, 3 * h // 4), slice(-w // 8, None)),
             "right wall", 0.16),
            ((slice(-h // 8, None), slice(w // 4, 3 * w // 4)),
             "floor", 0.10)]:
        o = ours[sl].mean(axis=(0, 1))
        r = ref[sl].mean(axis=(0, 1))
        np.testing.assert_allclose(o, r, atol=tol, err_msg=label)
    # hue dominance: green left, red right (README golden layout)
    lw = ours[h // 4:3 * h // 4, :w // 8].mean(axis=(0, 1))
    rw = ours[h // 4:3 * h // 4, -w // 8:].mean(axis=(0, 1))
    assert lw[1] > lw[0] and lw[1] > lw[2], lw
    assert rw[0] > rw[1] and rw[0] > rw[2], rw
    assert _grid_corr(ours, ref) > 0.75


def test_utah_teapot_matches_golden():
    ours = _render("teapot_scene.yaml", 64, 64)
    ref = _golden("Utah-Teapot.png", (64, 64))
    h = w = 64
    assert abs(ours.mean() - ref.mean()) < 0.10, (ours.mean(), ref.mean())
    lw = ours[h // 4:3 * h // 4, :w // 8].mean(axis=(0, 1))
    rw = ours[h // 4:3 * h // 4, -w // 8:].mean(axis=(0, 1))
    rl = ref[h // 4:3 * h // 4, :w // 8].mean(axis=(0, 1))
    rr = ref[h // 4:3 * h // 4, -w // 8:].mean(axis=(0, 1))
    np.testing.assert_allclose(lw, rl, atol=0.10, err_msg="left wall")
    np.testing.assert_allclose(rw, rr, atol=0.10, err_msg="right wall")
    assert lw[1] > lw[0] and rw[0] > rw[1]
    # mesh + env map are procedural stand-ins for the reference's missing
    # LFS assets, so spatial correlation is coarser than Cornell's
    assert _grid_corr(ours, ref) > 0.55


def test_scattered_balls_matches_golden():
    # 16:9 golden (1920x1080); sky-lit outdoor scene with sphere field
    ours = _render("scattered_balls.yaml", 96, 54, spp=32)
    ref = _golden("Scattered-Balls.png", (96, 54))
    assert abs(ours.mean() - ref.mean()) < 0.15, (ours.mean(), ref.mean())
    # top third is sky-dominated and brighter than the ground third in both
    assert ours[:18].mean() > ours[-18:].mean()
    assert ref[:18].mean() > ref[-18:].mean()
    assert _grid_corr(ours, ref) > 0.5  # asset layout differs: coarse only


def test_self_golden_regression():
    """Pin OUR render so shading regressions show up even where golden
    tolerances are loose: stats of cornell at fixed seed/spp. Update these
    only with an investigated radiometry change."""
    ours = _render("cornell_box.yaml", 48, 48, spp=24, seed=7)
    mean = float(ours.mean())  # 0.243 at this seed/spp as of r2 calibration
    assert 0.20 < mean < 0.32, mean
    lw = ours[12:36, :6].mean(axis=(0, 1))  # [0.181, 0.230, 0.138] at r2
    assert lw[1] > 1.15 * lw[0] > 0.0, lw
    assert lw[1] > 1.4 * lw[2], lw

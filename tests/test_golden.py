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

CALIBRATION CAVEAT (advisor r3): the procedural stand-in assets
(scene/fixtures.py) were tuned against these goldens — e.g. the hall
env's ground level — so the reference-golden gates partly verify that
calibration, not independent radiometry. They are kept as coarse parity
evidence; the REAL regression gates are the seed-pinned self-golden
tests below (one per golden scene), which pin OUR renderer's output and
move only with an investigated radiometry change. Do not tune fixtures
further to shrink golden residuals.
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
    """Tolerances derived from the round-3 calibration sweep: per-region
    residual after calibrating (red 0.80 / green dimmed / warm light /
    fov 38) plus >= 2x the seed-to-seed std of each region mean at 48 spp
    (measured sigma 0.01-0.03 per channel over 4 seeds):

    - walls: residual <= 0.07, sigma <= 0.033 -> tol 0.12 (margin > 2x).
    - floor-third: the golden shows brightly lit floor where the classic
      Cornell layout puts the short box's shaded front face — a structural
      difference of the UNKNOWN golden scene, not radiometry — residual
      ~0.12 -> tol 0.18, with the hue ordering asserted separately."""
    ours = _render("cornell_box.yaml", 64, 64)
    ref = _golden("Cornell-Box.png", (64, 64))
    h = w = 64
    assert abs(ours.mean() - ref.mean()) < 0.06, (ours.mean(), ref.mean())
    for sl, label, tol in [
            ((slice(h // 4, 3 * h // 4), slice(0, w // 8)),
             "left wall", 0.12),
            ((slice(h // 4, 3 * h // 4), slice(-w // 8, None)),
             "right wall", 0.12),
            ((slice(-h // 8, None), slice(w // 4, 3 * w // 4)),
             "floor", 0.18)]:
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
    mean = float(ours.mean())  # 0.196 (seed 7) / 0.206 (seed 8) at the
    assert 0.16 < mean < 0.26, mean  # r3 calibration (fov 38, warm light)
    lw = ours[12:36, :6].mean(axis=(0, 1))  # [0.193, 0.244, 0.124] at r3
    assert lw[1] > 1.1 * lw[0] > 0.0, lw
    assert lw[1] > 1.6 * lw[2], lw


def test_self_golden_teapot():
    """Pinned stats of OUR teapot render (fixed seed, 24 spp): regressions
    can't hide behind the loose reference gates (procedural stand-in
    assets). Measured seed 7/8 at fixture v3 (warm hall ground):
    mean 0.356/0.354, centre RGB ~[0.54, 0.47, 0.34]. Update only with an
    investigated radiometry change."""
    ours = _render("teapot_scene.yaml", 48, 48, spp=24, seed=7)
    mean = float(ours.mean())
    assert 0.30 < mean < 0.41, mean
    c = ours[16:32, 16:32].mean(axis=(0, 1))
    assert c[0] > c[1] > c[2], c  # warm centre (light + teapot)
    assert 0.44 < c[0] < 0.66, c


def test_self_golden_scattered_balls():
    """Pinned stats of OUR scattered-balls render. Measured seed 7/8:
    mean 0.642/0.643, top-third (sky) 0.812/0.811, bottom-third 0.544/0.545,
    centre RGB ~[0.575, 0.581, 0.597] (cool: sky-lit)."""
    ours = _render("scattered_balls.yaml", 64, 36, spp=16, seed=7)
    mean = float(ours.mean())
    assert 0.58 < mean < 0.70, mean
    top = float(ours[:12].mean())
    bot = float(ours[-12:].mean())
    assert 0.75 < top < 0.88 and 0.48 < bot < 0.62, (top, bot)
    c = ours[12:24, 21:43].mean(axis=(0, 1))
    assert c[2] > c[0] - 0.01, c  # sky-lit: blue not dominated by red


def test_big_shiny_matches_golden():
    """big_shiny.png = the shiny_teapot scene (the fit target) at
    1920x1080: rough-metal teapot lit only by the hall environment. The
    real old_hall_4k.hdr is a missing LFS blob, so the env is a procedural
    stand-in and gates are tonemapped-statistics only (the golden's warm
    floor-vs-sky split informs the stand-in's ground level)."""
    ours = _render("shiny_teapot.yaml", 64, 36, spp=24)
    ref = _golden("big_shiny.png", (64, 36))
    assert abs(ours.mean() - ref.mean()) < 0.12, (ours.mean(), ref.mean())
    # both halves moderately lit (no blown-out or black thirds)
    for img in (ours, ref):
        assert 0.25 < img[:12].mean() < 0.75, img[:12].mean()
        assert 0.25 < img[-12:].mean() < 0.75, img[-12:].mean()
    # centre (teapot body) is a warm reflective grey in both
    co = ours[12:24, 21:43].mean(axis=(0, 1))
    cr = ref[12:24, 21:43].mean(axis=(0, 1))
    assert co[0] >= co[2] - 0.02 and cr[0] >= cr[2] - 0.02, (co, cr)
    np.testing.assert_allclose(co, cr, atol=0.20)


def test_awesome_reflections_matches_golden():
    """Awesome-Reflections.bmp: reflective teapot on a mirror floor under
    a bright sky, its reflection visible in the floor. Reconstruction
    scene: scenes/awesome_reflections.yaml (procedural sky + teapot).
    Measured at calibration: ours mean 0.625 / golden 0.667, top-third
    0.861/0.873, bottom-third 0.422/0.399."""
    ours = _render("awesome_reflections.yaml", 64, 36, spp=24)
    ref = _golden("Awesome-Reflections.bmp", (64, 36))
    assert abs(ours.mean() - ref.mean()) < 0.10, (ours.mean(), ref.mean())
    # sky-bright top, mirror-floor bottom, in both
    assert abs(ours[:12].mean() - ref[:12].mean()) < 0.10
    assert abs(ours[-12:].mean() - ref[-12:].mean()) < 0.10
    assert ours[:12].mean() > ours[-12:].mean() + 0.2
    assert ref[:12].mean() > ref[-12:].mean() + 0.2
    # the floor shows a reflection: bottom-centre darker than bottom-edge
    for img in (ours, ref):
        centre = img[26:36, 24:40].mean()
        edge = np.concatenate([img[26:36, :12], img[26:36, -12:]],
                              axis=1).mean()
        assert centre < edge - 0.02, (centre, edge)
    assert _grid_corr(ours, ref) > 0.6


def test_self_golden_big_shiny():
    """Pinned stats of OUR shiny_teapot render (the big_shiny scene) at
    fixed seed — the loose reference gate (atol 0.12-0.20 vs a calibrated
    stand-in env) could hide a fairly wrong render; this cannot. Measured
    seed 7/8 at fixture v3: mean 0.5216/0.5220, top-third 0.5877/0.5878,
    bottom-third 0.4425/0.4419, centre RGB ~[0.40, 0.38, 0.36]. Update
    only with an investigated radiometry change."""
    ours = _render("shiny_teapot.yaml", 64, 36, spp=24, seed=7)
    assert 0.49 < float(ours.mean()) < 0.55, ours.mean()
    top = float(ours[:12].mean())
    bot = float(ours[-12:].mean())
    assert 0.55 < top < 0.63 and 0.41 < bot < 0.48, (top, bot)
    c = ours[12:24, 21:43].mean(axis=(0, 1))
    assert c[0] > c[1] > c[2], c          # warm reflective grey
    assert 0.36 < c[0] < 0.45, c


def test_self_golden_awesome_reflections():
    """Pinned stats of OUR awesome_reflections render at fixed seed.
    Measured seed 7/8 at fixture v3: mean 0.6258/0.6251, top-third
    0.8609/0.8607, bottom-third 0.4228/0.4226, centre RGB
    ~[0.45, 0.47, 0.51] (cool: sky reflected in the teapot). Update only
    with an investigated radiometry change."""
    ours = _render("awesome_reflections.yaml", 64, 36, spp=24, seed=7)
    assert 0.60 < float(ours.mean()) < 0.66, ours.mean()
    top = float(ours[:12].mean())
    bot = float(ours[-12:].mean())
    assert 0.83 < top < 0.89 and 0.39 < bot < 0.46, (top, bot)
    c = ours[12:24, 21:43].mean(axis=(0, 1))
    assert c[2] > c[1] > c[0], c          # cool sky-lit centre
    assert 0.47 < c[2] < 0.55, c

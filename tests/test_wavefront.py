"""Regenerative wavefront integrator (integrator/wavefront.py): drains the
whole work queue, converges to the same radiometry as the reference-shaped
batch integrator (integrator/path.py), and reports progress."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobbyraytracer_tpu.integrator import path as path_mod
from hobbyraytracer_tpu.integrator import wavefront
from hobbyraytracer_tpu.scene import build_scene, load_scene_desc
from hobbyraytracer_tpu.scene.fixtures import ensure_assets

import os

HERE = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="module")
def cornell():
    ensure_assets()
    return build_scene(load_scene_desc(os.path.join(HERE,
                                                    "cornell_box.yaml")))


def test_pool_drains_exactly(cornell):
    w = h = 16
    spp = 3
    state = wavefront.render_state(cornell.scene, cornell.camera, w, h, spp,
                                   jax.random.PRNGKey(0), max_depth=6,
                                   pool=256)
    assert int(state.retired) == w * h * spp  # retired counts SAMPLES
    _, n_chunks, _ = wavefront._chunk_geometry(spp, wavefront.SAMPLE_CHUNK)
    assert int(state.counter) == w * h * n_chunks  # counter counts ITEMS
    assert not bool(jnp.any(state.item >= 0))
    # every pixel got exactly spp samples' radiance (all finite)
    assert np.isfinite(np.asarray(state.fb)).all()


def test_pool_drains_exactly_partial_chunk(cornell):
    """spp not divisible by the sample chunk: the last chunk is smaller and
    the retired-sample count still lands exactly."""
    w = h = 8
    spp = 7  # chunk 4 -> chunks of 4 + 3
    state = wavefront.render_state(cornell.scene, cornell.camera, w, h, spp,
                                   jax.random.PRNGKey(0), max_depth=6,
                                   pool=128, sample_chunk=4)
    assert int(state.retired) == w * h * spp
    assert not bool(jnp.any(state.item >= 0))


def test_matches_batch_integrator_radiometry(cornell):
    """Independent RNG streams -> agreement is statistical: per-image mean
    within a few percent at matched spp."""
    w = h = 24
    spp = 96
    img_w = wavefront.render_image(cornell.scene, cornell.camera, w, h, spp,
                                   jax.random.PRNGKey(0), max_depth=10,
                                   pool=2048)
    img_p = path_mod.render_image(cornell.scene, cornell.camera, w, h, spp,
                                  jax.random.PRNGKey(1), max_depth=10)
    mw = float(jnp.mean(img_w))
    mp = float(jnp.mean(img_p))
    assert abs(mw - mp) / mp < 0.10, (mw, mp)
    # spatial structure agrees: downsampled 4x4 block means correlate
    bw = np.asarray(img_w).reshape(6, 4, 6, 4, 3).mean(axis=(1, 3, 4))
    bp = np.asarray(img_p).reshape(6, 4, 6, 4, 3).mean(axis=(1, 3, 4))
    corr = np.corrcoef(bw.ravel(), bp.ravel())[0, 1]
    assert corr > 0.85, corr


def test_wavefront_media_scene():
    """Constant-density media inside the wavefront loop: the smoke scene
    must render finite and show the smoke boxes occluding the walls."""
    ensure_assets()
    job = build_scene(load_scene_desc(os.path.join(HERE,
                                                   "cornell_smoke.yaml")))
    img = wavefront.render_image(job.scene, job.camera, 32, 32, 16,
                                 jax.random.PRNGKey(0), max_depth=16,
                                 pool=1024)
    a = np.asarray(img)
    assert np.isfinite(a).all()
    assert 0.01 < a.mean() < 0.9, a.mean()


def test_progress_callback_fires(cornell):
    seen = []
    wavefront.render_state(cornell.scene, cornell.camera, 8, 8, 2,
                           jax.random.PRNGKey(0), max_depth=4, pool=64,
                           steps_per_call=8,
                           progress_cb=lambda n, total: seen.append((n,
                                                                     total)))
    assert len(seen) >= 1
    assert seen[-1][0] == seen[-1][1] == 8 * 8 * 2
    # monotone non-decreasing progress
    assert all(a[0] <= b[0] for a, b in zip(seen, seen[1:]))


def test_same_pixel_retires_land_exactly(cornell):
    """Two+ lanes finishing the SAME pixel in one segment: the colliding
    scatter-add must land every contribution exactly once (the round-2
    winner-election is gone; scatter-add handles collisions natively)."""
    w = h = 8
    wh = w * h
    pool = 8
    spp = 4
    state = wavefront.init_state(w, h, pool)
    # lanes 0..3 all carry chunk items of pixel 5 (items 5 + k*wh with
    # sample_chunk=1 -> 4 one-sample chunks); lanes 4..7 idle. Rays point
    # AWAY from the 555-box (z decreasing from z=40 misses every rect and
    # both box instances) -> every path finishes this segment with only
    # the (black) background contribution; preloaded per-lane `rad` makes
    # the landed-exactly-once check non-vacuous.
    o = jnp.tile(jnp.asarray([[0.0, 2.5, 40.0]]), (pool, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (pool, 1))
    item = jnp.asarray([5, 5 + wh, 5 + 2 * wh, 5 + 3 * wh,
                        -1, -1, -1, -1], jnp.int32)
    preload = jnp.arange(1.0, pool + 1)[:, None] * jnp.ones((1, 3))
    state = state.replace(o=o, d=d,
                          thr=jnp.ones((pool, 3), jnp.float32),
                          rad=preload.astype(jnp.float32),
                          item=item,
                          counter=jnp.int32(4 * wh))  # queue exhausted
    state = wavefront._segment(state, cornell.scene, w, h,
                               jax.random.PRNGKey(1), 6, spp,
                               sample_chunk=1)
    assert int(state.retired) == 4
    assert not bool(jnp.any(state.defer))
    fb = np.asarray(wavefront.framebuffer(state, w, h))
    # lanes 1..4's preloads all land on pixel 5 (1+2+3+4 = 10)
    np.testing.assert_allclose(fb[5], [10.0, 10.0, 10.0], rtol=1e-6)
    assert np.abs(fb[np.arange(wh) != 5]).max() == 0.0


def test_retire_cap_overflow_defers_and_recovers(cornell):
    """More finished chunks than RETIRE_CAP in one segment: the overflow
    lanes defer (flag set, no radiance lost) and land on a later segment.
    cap = max(pool // 4, 64) -> use pool=256 so cap=64 < 200 finishers."""
    w = h = 16
    wh = w * h
    pool = 256
    spp = 1
    state = wavefront.init_state(w, h, pool)
    o = jnp.tile(jnp.asarray([[0.0, 2.5, 40.0]]), (pool, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (pool, 1))  # all miss
    item = jnp.arange(pool, dtype=jnp.int32)  # 256 distinct pixels
    preload = (jnp.arange(1.0, pool + 1)[:, None]
               * jnp.ones((1, 3))).astype(jnp.float32)
    state = state.replace(o=o, d=d,
                          thr=jnp.ones((pool, 3), jnp.float32),
                          rad=preload,
                          item=item, counter=jnp.int32(wh))
    state = wavefront._segment(state, cornell.scene, w, h,
                               jax.random.PRNGKey(1), 6, spp,
                               sample_chunk=1)
    assert int(state.retired) == 64          # cap-limited
    assert int(jnp.sum(state.defer)) == 192  # deferred, not dropped
    for _ in range(3):
        state = wavefront._segment(state, cornell.scene, w, h,
                                   jax.random.PRNGKey(1), 6, spp,
                                   sample_chunk=1)
    assert int(state.retired) == 256
    assert not bool(jnp.any(state.defer))
    fb = np.asarray(wavefront.framebuffer(state, w, h))
    # every preloaded radiance landed exactly once at its own pixel
    np.testing.assert_allclose(fb[:pool], np.asarray(preload), rtol=1e-6)


@pytest.mark.parametrize("period", [1, 3])
def test_pool_sort_matches_default_radiometry(monkeypatch, period):
    """Opt-in pool-level coherence sort (pool_sort=True / HRT_POOL_SORT):
    permuting the whole lane pool by the mesh key must preserve the
    render's bookkeeping exactly (the packed permute of item/depth/sub/
    defer round-trips through the f32 bitcast) and its radiometry
    statistically (lane permutation reshuffles RNG streams across items,
    so agreement is statistical like wavefront-vs-batch). Needs a mesh
    scene so wavefront_sort_key is non-None; the Pallas key kernel runs
    in interpreter mode on CPU."""
    monkeypatch.setenv("HRT_PALLAS_INTERPRET", "1")
    ensure_assets()
    job = build_scene(load_scene_desc(os.path.join(HERE,
                                                   "shiny_teapot.yaml")))
    w, h, spp = 12, 12, 16
    imgs = {}
    for ps in (False, period):
        state = wavefront.render_state(job.scene, job.camera, w, h, spp,
                                       jax.random.PRNGKey(0), max_depth=4,
                                       pool=144, pool_sort=ps)
        assert int(state.retired) == w * h * spp, ps
        assert not bool(jnp.any(state.item >= 0)), ps
        fb = np.asarray(wavefront.framebuffer(state, w, h))
        assert np.isfinite(fb).all(), ps
        imgs[ps] = fb / spp
    m0, m1 = imgs[False].mean(), imgs[period].mean()
    assert abs(m1 - m0) / m0 < 0.15, (m0, m1)
    corr = np.corrcoef(imgs[False].ravel(), imgs[period].ravel())[0, 1]
    assert corr > 0.9, corr

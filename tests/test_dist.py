"""Distributed tests on the 8-virtual-device CPU mesh (SURVEY.md §4):
sharded render == single-device render bit-for-bit; sharded grads == single
grads."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hobbyraytracer_tpu.parallel import (make_mesh, render_sharded,
                                         replicate_scene)
from hobbyraytracer_tpu.scene import build_scene, load_scene_desc

SCENES = os.path.join(os.path.dirname(__file__), "..", "scenes")


@pytest.fixture(scope="module")
def job():
    return build_scene(load_scene_desc(os.path.join(SCENES,
                                                    "cornell_box.yaml")))


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single(job):
    from hobbyraytracer_tpu.integrator import path
    key = jax.random.PRNGKey(0)
    single = path.render_image(job.scene, job.camera, 32, 32, 8, key)
    mesh = make_mesh(8)
    sharded = render_sharded(job.scene, job.camera, 32, 32, 8, key, mesh)
    # same program partitioned by GSPMD: results must match to float32
    # reassociation noise (bitwise in practice for this elementwise path)
    np.testing.assert_allclose(np.asarray(single), np.asarray(sharded),
                               atol=1e-6)


def test_sharded_grads_match_single(job):
    from hobbyraytracer_tpu.diff.fit import (render_linear, render_loss,
                                             select_params)
    from jax.sharding import NamedSharding, PartitionSpec as P

    w = h = 16
    key = jax.random.PRNGKey(1)
    target = render_linear(job.scene, job.camera, w, h, key, 2, 3)
    params, rebuild = select_params(job.scene)

    def loss_fn(p, k):
        return render_loss(p, rebuild, job.camera, w, h, k, 1, target, 3)

    g_single = jax.grad(loss_fn)(params, key)

    mesh = make_mesh(8)
    params_r = jax.device_put(params, NamedSharding(mesh, P()))
    target_s = jax.device_put(target, NamedSharding(mesh, P("rays")))

    def loss_sharded(p, k):
        return render_loss(p, rebuild, job.camera, w, h, k, 1, target_s, 3)

    g_sharded = jax.jit(jax.grad(loss_sharded))(params_r, key)
    for a, b in zip(jax.tree_util.tree_leaves(g_single),
                    jax.tree_util.tree_leaves(g_sharded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-7)


def test_sharded_wavefront_render(job):
    """shard_map wavefront: 8 workers drain disjoint work-item slices;
    psum-merged framebuffer must match the single-device wavefront render
    statistically (independent RNG streams)."""
    from hobbyraytracer_tpu.integrator import wavefront
    from hobbyraytracer_tpu.parallel.shard import render_wavefront_sharded

    w = h = 24
    spp = 96
    mesh = make_mesh(8)
    img_s = render_wavefront_sharded(job.scene, job.camera, w, h, spp,
                                     jax.random.PRNGKey(0), mesh,
                                     max_depth=8, pool=8 * 512)
    img_1 = wavefront.render_image(job.scene, job.camera, w, h, spp,
                                   jax.random.PRNGKey(1), max_depth=8,
                                   pool=512)
    a, b = np.asarray(img_s), np.asarray(img_1)
    assert np.isfinite(a).all()
    # independent RNG streams: seed-to-seed image means vary ~10% at this
    # size, so the radiometry gate is loose; structure is the sharp check
    assert abs(a.mean() - b.mean()) / b.mean() < 0.15, (a.mean(), b.mean())
    bw = a.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3, 4))
    bp = b.reshape(6, 4, 6, 4, 3).mean(axis=(1, 3, 4))
    corr = np.corrcoef(bw.ravel(), bp.ravel())[0, 1]
    assert corr > 0.85, corr


def test_sharded_wavefront_uneven_items(job):
    """total items not divisible by the mesh: last worker gets a short
    slice; every pixel still receives exactly spp samples."""
    from hobbyraytracer_tpu.parallel.shard import render_wavefront_sharded

    w, h, spp = 10, 9, 3  # 270 items over 8 workers -> per=34, last=32
    mesh = make_mesh(8)
    img = render_wavefront_sharded(job.scene, job.camera, w, h, spp,
                                   jax.random.PRNGKey(0), mesh,
                                   max_depth=4, pool=8 * 64)
    assert img.shape == (h, w, 3)
    assert np.isfinite(np.asarray(img)).all()


def test_sharded_fit_step_runs_and_descends(job):
    """sharded_fit_step (previously dead code): two steps on the 8-device
    mesh reduce the loss toward a perturbed-parameter target."""
    import optax
    from hobbyraytracer_tpu.diff.fit import render_linear, select_params
    from hobbyraytracer_tpu.parallel.shard import sharded_fit_step

    w = h = 16
    key = jax.random.PRNGKey(3)
    target = render_linear(job.scene, job.camera, w, h, key, 2, 3)
    perturbed = job.scene.replace(materials=job.scene.materials.replace(
        albedo=jnp.clip(job.scene.materials.albedo * 0.5 + 0.2, 0, 1)))
    params, rebuild = select_params(perturbed)
    mesh = make_mesh(8)
    opt = optax.adam(5e-2)
    opt_state = opt.init(params)
    losses = []
    for i in range(3):
        params, opt_state, loss = sharded_fit_step(
            params, rebuild, job.camera, w, h, key, 2, target, mesh, opt,
            opt_state, max_depth=3)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_graft_entry_contract():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    fn, args = m.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1024, 3)
    m.dryrun_multichip(8)


def test_scaling_script_core():
    """scripts/scaling.py's measurement path must keep working (the
    SCALING.json artifact is produced by it): tiny virtual-mesh sweep,
    every run drains all items and reports finite positive rates."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "scaling", os.path.join(os.path.dirname(__file__), "..",
                                "scripts", "scaling.py"))
    scaling = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(scaling)
    art = scaling.measure([1, 2], spp=2, dim=16, max_depth=3,
                          verbose=False)
    assert art["mode"] == "virtual-host-mesh"
    assert len(art["runs"]) == 2
    for row in art["runs"]:
        assert row["items_per_s"] > 0
    assert art["runs"][0]["efficiency_vs_1"] == 1.0


def test_sharded_wavefront_checkpoint_resume_exact(job):
    """Multi-chip render with checkpoint/resume (the round-2 CLI silently
    fell back to one device when both were requested): interrupting after
    the first chunk and resuming from the stacked per-worker state must
    reproduce the uninterrupted image EXACTLY, with progress reported."""
    from hobbyraytracer_tpu.parallel.shard import (make_mesh,
                                                   render_wavefront_sharded)

    mesh = make_mesh(8)
    w = h = 16
    spp = 4
    key = jax.random.PRNGKey(5)
    kwargs = dict(max_depth=6, pool=8 * 64, steps_per_call=4)

    seen = []
    ref = render_wavefront_sharded(job.scene, job.camera, w, h, spp, key,
                                   mesh, progress_cb=lambda r, t:
                                   seen.append((r, t)), **kwargs)
    assert seen and seen[-1][0] == seen[-1][1] == w * h * spp
    assert all(a[0] <= b[0] for a, b in zip(seen, seen[1:]))

    class Stop(Exception):
        pass

    saved = []

    def save_once(s):
        saved.append(jax.tree.map(np.asarray, s))
        raise Stop

    try:
        render_wavefront_sharded(job.scene, job.camera, w, h, spp, key,
                                 mesh, checkpoint_cb=save_once, **kwargs)
        assert False, "checkpoint_cb never fired"
    except Stop:
        pass
    state = jax.tree.map(jnp.asarray, saved[0])
    assert int(jnp.sum(state.retired)) < w * h * spp  # genuinely mid-render
    out = render_wavefront_sharded(job.scene, job.camera, w, h, spp, key,
                                   mesh, state=state, **kwargs)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))

    # wrong mesh size refuses loudly instead of corrupting the render
    with pytest.raises(ValueError):
        render_wavefront_sharded(job.scene, job.camera, w, h, spp, key,
                                 make_mesh(4), state=state, **kwargs)


def test_sharded_fit_grads_match_single_bitwise(job):
    """shard_map fit path (round 4): per-device pixel-slice renders with
    span-sliced RNG streams (core/rng.py) make the sharded loss AND its
    parameter gradients match the single-device render_loss bitwise —
    mesh-size invariance, not just statistical agreement."""
    from hobbyraytracer_tpu.diff.fit import (render_linear, render_loss,
                                             select_params)
    from hobbyraytracer_tpu.parallel.shard import sharded_render_loss

    w = h = 16
    key = jax.random.PRNGKey(1)
    target = render_linear(job.scene, job.camera, w, h, key, 2, 3)
    params, rebuild = select_params(job.scene)
    mesh = make_mesh(8)

    l1 = render_loss(params, rebuild, job.camera, w, h, key, 1, target, 3)
    l8 = sharded_render_loss(params, rebuild, job.camera, w, h, key, 1,
                             target, mesh, 3)
    np.testing.assert_allclose(float(l8), float(l1), rtol=1e-6)

    g1 = jax.grad(lambda p: render_loss(
        p, rebuild, job.camera, w, h, key, 1, target, 3))(params)
    g8 = jax.grad(lambda p: sharded_render_loss(
        p, rebuild, job.camera, w, h, key, 1, target, mesh, 3))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sharded_fit_grads_match_pallas(monkeypatch):
    """Round-3 verdict #5: the multi-chip gradient path must run the
    PALLAS find (pallas_replay, interpret mode on CPU), not the pinned
    XLA traversal. Sharded grads on a mesh scene == single-device
    auto_diff grads, both through the kernel find."""
    monkeypatch.setenv("HRT_PALLAS_INTERPRET", "1")
    from hobbyraytracer_tpu.diff.fit import (render_linear, render_loss,
                                             select_params)
    from hobbyraytracer_tpu.parallel.shard import sharded_render_loss
    from hobbyraytracer_tpu.scene import ir as scene_ir
    from hobbyraytracer_tpu.scene.fixtures import ensure_assets

    ensure_assets()
    tj = build_scene(load_scene_desc(os.path.join(SCENES,
                                                  "shiny_teapot.yaml")))
    # the teapot resolves to the Pallas backends under the env override
    assert scene_ir.has_wavefront_sort_key(tj.scene)

    w, h = 16, 8
    key = jax.random.PRNGKey(2)
    target = render_linear(tj.scene, tj.camera, w, h, key, 1, 3)
    # perturb so the correlated loss (and its gradient) is nonzero
    perturbed = tj.scene.replace(materials=tj.scene.materials.replace(
        albedo=jnp.clip(tj.scene.materials.albedo * 0.6 + 0.1, 0, 1),
        roughness=jnp.clip(tj.scene.materials.roughness + 0.1, 0, 1)))
    params, rebuild = select_params(perturbed)
    mesh = make_mesh(8)

    g1 = jax.grad(lambda p: render_loss(
        p, rebuild, tj.camera, w, h, key, 1, target, 3))(params)
    g8 = jax.grad(lambda p: sharded_render_loss(
        p, rebuild, tj.camera, w, h, key, 1, target, mesh, 3))(params)
    nonzero = 0
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g8)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)
        nonzero += int(np.abs(np.asarray(a)).max() > 0)
    assert nonzero >= 1  # the comparison is not vacuous


def test_batch_multidevice_xla_find_is_explicit(caplog):
    """render_sharded pins mesh scenes to the XLA find (no GSPMD rule
    for the Pallas kernel) — that choice must be LOGGED, not silent
    (round-4 verdict #8), and only for scenes where the kernel would
    otherwise run."""
    import logging

    import numpy as np

    from hobbyraytracer_tpu.parallel import shard as shard_mod
    from hobbyraytracer_tpu.scene import build_scene, load_scene_desc
    from hobbyraytracer_tpu.scene.fixtures import ensure_assets

    ensure_assets()
    here = os.path.join(os.path.dirname(__file__), "..", "scenes")
    job = build_scene(load_scene_desc(
        os.path.join(here, "teapot_scene.yaml")))
    os.environ["HRT_PALLAS_INTERPRET"] = "1"   # CPU: route as on-TPU
    try:
        with caplog.at_level(logging.WARNING,
                             logger="hobbyraytracer_tpu.parallel.shard"):
            assert shard_mod._warn_batch_xla_find(job.scene)
    finally:
        del os.environ["HRT_PALLAS_INTERPRET"]
    assert any("XLA mesh traversal" in r.message for r in caplog.records)

    # no mesh -> no warning
    job2 = build_scene(load_scene_desc(
        os.path.join(here, "cornell_box.yaml")))
    assert not shard_mod._warn_batch_xla_find(job2.scene)

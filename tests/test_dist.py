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

"""Checkpoint/resume (io/checkpoint.py): interrupting a render and resuming
from a saved PoolState reproduces the uninterrupted image EXACTLY (the
while-loop body is deterministic in the state; chunk boundaries do not
change which iterations run)."""
import os

import jax
import jax.numpy as jnp
import numpy as np

from hobbyraytracer_tpu.integrator import wavefront
from hobbyraytracer_tpu.io import checkpoint as ckpt
from hobbyraytracer_tpu.scene import build_scene, load_scene_desc
from hobbyraytracer_tpu.scene.fixtures import ensure_assets

HERE = os.path.join(os.path.dirname(__file__), "..", "scenes")


def _job():
    ensure_assets()
    return build_scene(load_scene_desc(os.path.join(HERE,
                                                    "cornell_box.yaml")))


def test_resume_is_exact(tmp_path):
    job = _job()
    w = h = 12
    spp = 4
    key = jax.random.PRNGKey(7)
    kwargs = dict(max_depth=6, pool=128, steps_per_call=16)

    # uninterrupted
    ref = wavefront.render_state(job.scene, job.camera, w, h, spp, key,
                                 **kwargs)

    # interrupted: save at the first chunk boundary, then "crash"
    path = str(tmp_path / "ck.npz")

    class Stop(Exception):
        pass

    def save_once(s):
        ckpt.save_state(path, s)
        raise Stop

    try:
        wavefront.render_state(job.scene, job.camera, w, h, spp, key,
                               checkpoint_cb=save_once, **kwargs)
        assert False, "checkpoint_cb never fired"
    except Stop:
        pass

    state = ckpt.load_state(path)
    assert 0 < int(state.retired) < w * h * spp  # genuinely mid-render
    out = wavefront.render_state(job.scene, job.camera, w, h, spp, key,
                                 state=state, **kwargs)

    np.testing.assert_array_equal(np.asarray(out.fb), np.asarray(ref.fb))
    assert int(out.retired) == int(ref.retired) == w * h * spp


def test_roundtrip_preserves_all_fields(tmp_path):
    state = wavefront.init_state(8, 8, pool=32)
    state = state.replace(counter=jnp.int32(5), it=jnp.int32(9),
                          fb=state.fb + 1.25)
    path = str(tmp_path / "rt.npz")
    ckpt.save_state(path, state)
    back = ckpt.load_state(path)
    for f in ("fb", "o", "d", "thr", "rad", "item", "depth", "sub",
              "defer", "counter", "retired", "it"):
        np.testing.assert_array_equal(np.asarray(getattr(back, f)),
                                      np.asarray(getattr(state, f)), f)

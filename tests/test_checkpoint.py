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


def test_meta_mismatch_rejected(tmp_path):
    """v4 metadata: resuming with different samples/sample_chunk or a
    different worker count must error clearly instead of silently
    mis-mapping work items to pixels (item ids encode the chunk
    geometry)."""
    import pytest

    state = wavefront.init_state(8, 8, pool=32)
    path = str(tmp_path / "meta.npz")
    meta = ckpt.render_meta(8, 8, samples=16, sample_chunk=4, n_workers=1)
    ckpt.save_state(path, state, meta=meta)

    # matching expectation loads fine
    ckpt.load_state(path, expect=meta)
    # and so does loading with no expectation (back-compat)
    ckpt.load_state(path)

    with pytest.raises(ValueError, match="samples"):
        ckpt.load_state(path, expect=ckpt.render_meta(8, 8, 32, 4, 1))
    with pytest.raises(ValueError, match="N-device mesh"):
        ckpt.load_state(path, expect=ckpt.render_meta(8, 8, 16, 4, 4))

    # v3 files (no metadata) still load, with or without expectations
    legacy = str(tmp_path / "legacy.npz")
    arrays = {f: np.asarray(getattr(state, f)) for f in ckpt._FIELDS}
    arrays["__version__"] = np.int32(3)
    np.savez(legacy, **arrays)
    ckpt.load_state(legacy, expect=meta)


def test_stacked_state_rejected_single_device():
    """A multi-worker (stacked) checkpoint resumed single-device must be
    rejected up front, not crash later with shape errors."""
    import pytest

    job = _job()
    base = wavefront.init_state(8, 8, pool=32)
    stacked = jax.tree.map(lambda x: jnp.stack([x, x]), base)
    with pytest.raises(ValueError, match="stacked worker"):
        wavefront.render_state(job.scene, job.camera, 8, 8, 2,
                               jax.random.PRNGKey(0), state=stacked,
                               max_depth=4, pool=32)

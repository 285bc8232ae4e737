"""Render checkpoint/resume (SURVEY §5.4 — the reference has none).

The regenerative wavefront integrator's `PoolState` is the COMPLETE render
state: framebuffer radiance sums, every in-flight path (ray, throughput,
partial radiance, work-item id, depth), the work-queue counter, and the
global iteration counter that indexes every RNG stream. Saving it and
resuming therefore reproduces the uninterrupted render bit-for-bit — the
while-loop body is deterministic in the state, and chunk boundaries do not
change which body iterations run (tests/test_checkpoint.py asserts exact
equality).

Work-item ids encode the (pixel, sample-chunk) geometry, so a checkpoint
is only meaningful for the exact render invocation that wrote it. v4
therefore records that geometry (width/height/samples/sample_chunk/
n_workers) and `load_state(expect=...)` rejects a mismatched resume with
a clear error instead of silently mis-mapping items to pixels.

Format: a plain .npz of the PoolState leaves plus a schema version; written
atomically (tmp file + rename) so a kill mid-write never corrupts the
previous checkpoint.
"""
from __future__ import annotations

from typing import Optional

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ..integrator.wavefront import PoolState

# v3: planar (3, W*H) fb without scratch rows; sample-chunk fields
# `sub`/`defer` replace the election's `pending`; `retired` counts samples.
# v4: adds render-geometry metadata (validated on resume); v3 files still
# load (metadata checks are skipped with a warning-free pass).
_VERSION = 4
_MIN_VERSION = 3
_FIELDS = ("fb", "o", "d", "thr", "rad", "item", "depth", "sub", "defer",
           "counter", "retired", "it")
# metadata keys validated on resume when present in BOTH file and expect
META_KEYS = ("width", "height", "samples", "sample_chunk", "n_workers")


def render_meta(width: int, height: int, samples: int, sample_chunk: int,
                n_workers: int = 1) -> dict:
    """The invocation geometry a checkpoint is only valid for."""
    return {"width": int(width), "height": int(height),
            "samples": int(samples), "sample_chunk": int(sample_chunk),
            "n_workers": int(n_workers)}


def save_state(path: str, state: PoolState,
               meta: Optional[dict] = None) -> None:
    """Atomically write the pool state to `path` (.npz)."""
    arrays = {f: np.asarray(jax.device_get(getattr(state, f)))
              for f in _FIELDS}
    arrays["__version__"] = np.int32(_VERSION)
    if meta:
        for k in META_KEYS:
            if k in meta:
                arrays["__meta_" + k] = np.int64(meta[k])
    d = os.path.dirname(os.path.abspath(path)) or "."
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as fh:
            np.savez(fh, **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str, expect: Optional[dict] = None) -> PoolState:
    """Load a pool state written by save_state.

    expect: a render_meta() dict for the CURRENT invocation. Any key
    recorded in the checkpoint that differs raises ValueError — resuming
    with different samples/sample_chunk silently mis-maps work items to
    pixels (item ids encode the chunk geometry), and a single-device
    state cannot drive a multi-worker mesh or vice versa."""
    with np.load(path) as z:
        version = int(z["__version__"])
        if not _MIN_VERSION <= version <= _VERSION:
            raise ValueError(
                f"checkpoint {path}: version {version} not in "
                f"[{_MIN_VERSION}, {_VERSION}]")
        if expect is not None:
            bad = []
            for k in META_KEYS:
                fk = "__meta_" + k
                if fk in z and k in expect and int(z[fk]) != int(expect[k]):
                    bad.append(f"{k}: checkpoint={int(z[fk])} "
                               f"current={int(expect[k])}")
            if bad:
                hint = ""
                if any(b.startswith("n_workers") for b in bad):
                    hint = (" (a checkpoint written on N devices resumes "
                            "only on an N-device mesh)")
                raise ValueError(
                    f"checkpoint {path} was written by a different render "
                    f"invocation{hint}: " + "; ".join(bad))
        return PoolState(**{f: jnp.asarray(z[f]) for f in _FIELDS})

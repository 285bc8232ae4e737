"""Render checkpoint/resume (SURVEY §5.4 — the reference has none).

The regenerative wavefront integrator's `PoolState` is the COMPLETE render
state: framebuffer radiance sums, every in-flight path (ray, throughput,
partial radiance, work-item id, depth), the work-queue counter, and the
global iteration counter that indexes every RNG stream. Saving it and
resuming therefore reproduces the uninterrupted render bit-for-bit — the
while-loop body is deterministic in the state, and chunk boundaries do not
change which body iterations run (tests/test_checkpoint.py asserts exact
equality).

Format: a plain .npz of the PoolState leaves plus a schema version; written
atomically (tmp file + rename) so a kill mid-write never corrupts the
previous checkpoint.
"""
from __future__ import annotations

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np

from ..integrator.wavefront import PoolState

# v3: planar (3, W*H) fb without scratch rows; sample-chunk fields
# `sub`/`defer` replace the election's `pending`; `retired` counts samples
_VERSION = 3
_FIELDS = ("fb", "o", "d", "thr", "rad", "item", "depth", "sub", "defer",
           "counter", "retired", "it")


def save_state(path: str, state: PoolState) -> None:
    """Atomically write the pool state to `path` (.npz)."""
    arrays = {f: np.asarray(jax.device_get(getattr(state, f)))
              for f in _FIELDS}
    arrays["__version__"] = np.int32(_VERSION)
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


def load_state(path: str) -> PoolState:
    """Load a pool state written by save_state."""
    with np.load(path) as z:
        version = int(z["__version__"])
        if version != _VERSION:
            raise ValueError(
                f"checkpoint {path}: version {version} != {_VERSION}")
        return PoolState(**{f: jnp.asarray(z[f]) for f in _FIELDS})

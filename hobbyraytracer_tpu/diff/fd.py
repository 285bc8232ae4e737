"""Finite-difference gradient validation harness (SURVEY.md §4: pixel
gradient vs finite differences for albedo/roughness/IOR/vertex positions —
the BASELINE acceptance check)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fd_check(f, x0: jnp.ndarray, eps: float = 1e-3, n_probe: int = 4,
             seed: int = 0):
    """Compare autodiff grad of scalar f(x) against central differences
    along random coordinate probes. Returns (ad_grads, fd_grads) for the
    probed coordinates."""
    g = jax.grad(f)(x0)
    flat_g = np.asarray(g).reshape(-1)
    flat_x = np.asarray(x0).reshape(-1)
    rs = np.random.RandomState(seed)
    idxs = rs.choice(flat_x.size, size=min(n_probe, flat_x.size),
                     replace=False)
    fd = []
    for i in idxs:
        xp = flat_x.copy(); xp[i] += eps
        xm = flat_x.copy(); xm[i] -= eps
        fp = float(f(jnp.asarray(xp.reshape(x0.shape))))
        fm = float(f(jnp.asarray(xm.reshape(x0.shape))))
        fd.append((fp - fm) / (2 * eps))
    return flat_g[idxs], np.asarray(fd)

"""Microbenchmark: per-mesh sort+unsort vs pool-level full-state permute.

Verdict-r4 #2 asks whether the coherence-sort machinery's cost can be cut
structurally. The two shapes in play at pool P:

  per-mesh (default):  gather rays8 (P,8) in, then UNDO with a (P,8)
                       scatter + a (P,) scatter after the kernel
  pool-level:          one packed (P,16) full-state gather, never undone
                       (the integrator is lane-order agnostic)

Times each primitive with fresh inputs per repetition (same-input repeats
under-measure through this stack, PERF.md round-4 discipline).

Run on the TPU machine: python scripts/microbench_permute.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

P = int(os.environ.get("MB_POOL", "196608"))
REPS = int(os.environ.get("MB_REPS", "30"))


def timeit(fn, make_args):
    args = [make_args(i) for i in range(REPS + 5)]
    jax.block_until_ready(fn(*args[0]))
    for i in range(1, 5):  # warm the tunnel
        fn(*args[i])
    jax.block_until_ready(args)
    t0 = time.perf_counter()
    outs = [fn(*args[5 + i]) for i in range(REPS)]
    jax.block_until_ready(outs)
    return (time.perf_counter() - t0) / REPS * 1e3


def main():
    key = jax.random.PRNGKey(0)

    def mk(width):
        def make(i):
            k = jax.random.fold_in(key, i * 7 + width)
            data = jax.random.normal(k, (P, width), jnp.float32)
            perm = jax.random.permutation(
                jax.random.fold_in(k, 1), P).astype(jnp.int32)
            ids = jnp.arange(P, dtype=jnp.int32)
            return data, perm, ids
        return make

    gather = jax.jit(lambda d, p, i: d[p])
    undo = jax.jit(lambda d, p, i:
                   (jnp.zeros_like(d).at[p].set(d),
                    jnp.zeros_like(i).at[p].set(i)))
    sortk = jax.jit(lambda d, p, i: jnp.argsort(i ^ (i >> 3)))

    for w in (8, 12, 16):
        print(f"gather (P,{w})      : {timeit(gather, mk(w)):.2f} ms")
    print(f"undo scatter (P,8)+(P,): {timeit(undo, mk(8)):.2f} ms")
    print(f"argsort int32 (P,)    : {timeit(sortk, mk(1)):.2f} ms")

    # the composed pipelines
    per_mesh = jax.jit(lambda d, p, i: (
        jnp.zeros_like(d).at[p].set(d[p] * 2.0),
        jnp.zeros_like(i).at[p].set(i)))
    pool_lvl = jax.jit(lambda d, p, i: d[p] * 2.0)
    print(f"per-mesh  (P,8) gather+2 undo scatters: "
          f"{timeit(per_mesh, mk(8)):.2f} ms")
    print(f"pool-lvl  (P,16) gather only          : "
          f"{timeit(pool_lvl, mk(16)):.2f} ms")


if __name__ == "__main__":
    main()

"""Scaling-efficiency measurement (BASELINE north star: >= 0.8 efficiency
from 1 chip to N >= 2 hosts).

Measures the sharded wavefront renderer's throughput at mesh sizes
1/2/4/... and reports per-device efficiency  eff(n) = T(n) / (n * T(1))
where T is work items per second.

On real multi-chip hardware this is the true number. Without it, run on
the virtual CPU mesh (JAX_PLATFORMS=cpu
XLA_FLAGS=--xla_force_host_platform_device_count=8): virtual devices
share the same host cores, so absolute efficiency is meaningless there —
the virtual run only validates that the sharded program compiles, drains,
and has no hidden cross-device serialization (eff collapsing far below
1/n would indicate added collectives inside the loop; there is exactly
one psum, at the end).

Usage: python scripts/scaling.py [--sizes 1,2,4,8] [--spp 16] [--dim 128]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,2,4,8")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--scene", default="cornell_box.yaml")
    ap.add_argument("--max-depth", type=int, default=16)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon sitecustomize "
                         "overrides JAX_PLATFORMS; this flag actually "
                         "switches)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from hobbyraytracer_tpu.parallel.shard import (make_mesh,
                                                   render_wavefront_sharded)
    from hobbyraytracer_tpu.scene import build_scene, load_scene_desc
    from hobbyraytracer_tpu.scene.fixtures import ensure_assets

    ensure_assets()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    job = build_scene(load_scene_desc(os.path.join(here, "scenes",
                                                   args.scene)))
    w = h = args.dim
    total = w * h * args.spp
    key = jax.random.PRNGKey(0)
    sizes = [int(s) for s in args.sizes.split(",")]
    n_avail = len(jax.devices())
    sizes = [s for s in sizes if s <= n_avail]

    results = {}
    for n in sizes:
        mesh = make_mesh(n)
        # warmup/compile excluded
        img = render_wavefront_sharded(job.scene, job.camera, w, h, 1, key,
                                       mesh, max_depth=args.max_depth)
        jax.block_until_ready(img)
        t0 = time.time()
        img = render_wavefront_sharded(job.scene, job.camera, w, h,
                                       args.spp, key, mesh,
                                       max_depth=args.max_depth)
        jax.block_until_ready(img)
        dt = time.time() - t0
        results[n] = total / dt
        eff = results[n] / (n * results[sizes[0]]) * sizes[0]
        print(json.dumps({"mesh_size": n, "items_per_s": round(results[n]),
                          "efficiency_vs_1": round(eff, 3),
                          "platform": jax.devices()[0].platform}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""Per-segment time decomposition on the real chip (PERF.md evidence).

Renders the bench workload's scene (teapot 640x640) to a realistic
mid-render wavefront state, then times each component of one wavefront
segment in isolation with block_until_ready:

  segment      one full _pool_run step (regenerate + intersect + shade +
               retire), amortized over a chunk
  intersect    intersect_scene (spheres + rects + mesh via auto backend)
  traverse     the fused Pallas traversal kernel alone (pre-packed rays)
  cohsort      coherence keys kernel + argsort + gather + scatter-undo
  shade        emitted + scatter (all lobes, masked)
  retire       the retirement winner-election argsort + unique scatter-add
  regen        work-item issue + camera ray generation

Run on the TPU machine:  python scripts/profile_segment.py
Writes a markdown table to stdout (paste into PERF.md).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from hobbyraytracer_tpu.core.types import Rays
from hobbyraytracer_tpu.integrator import wavefront
from hobbyraytracer_tpu.ops import shade as shade_ops
from hobbyraytracer_tpu.scene import build_scene, load_scene_desc
from hobbyraytracer_tpu.scene import ir as scene_ir
from hobbyraytracer_tpu.scene.fixtures import ensure_assets

REPS = int(os.environ.get("PROF_REPS", "20"))


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(REPS):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / REPS * 1e3  # ms


def main():
    ensure_assets()
    here = os.path.dirname(os.path.abspath(__file__))
    job = build_scene(load_scene_desc(
        os.path.join(here, "..", "scenes",
                     os.environ.get("PROF_SCENE", "teapot_scene.yaml"))))
    scene, camera = job.scene, job.camera
    w = h = int(os.environ.get("PROF_SIZE", "640"))
    pool = int(os.environ.get("PROF_POOL", str(wavefront.DEFAULT_POOL)))
    key = jax.random.PRNGKey(0)
    spp = 100
    schunk = wavefront.SAMPLE_CHUNK
    _, n_chunks, _ = wavefront._chunk_geometry(spp, schunk)
    total = jnp.int32(w * h * n_chunks)

    # advance to a realistic mid-render wavefront (mixed bounce depths);
    # non-donating jit so `state` stays usable for the component timings
    pool_run = jax.jit(wavefront._pool_run.__wrapped__,
                       static_argnums=(5, 6, 8))
    state = wavefront.init_state(w, h, pool)
    state = pool_run(state, scene, camera, key, jnp.int32(8),
                     w, h, total, 50, jnp.int32(spp), jnp.int32(schunk))
    jax.block_until_ready(state)
    rows = []

    # full segment, amortized
    chunk = 32

    def seg_chunk(s):
        return pool_run(s, scene, camera, key, jnp.int32(chunk), w, h,
                        total, 50, jnp.int32(spp), jnp.int32(schunk))

    ms = timeit(seg_chunk, state) / chunk
    rows.append(("segment (total)", ms))

    active = (state.item >= 0) & (state.depth >= 0) & ~state.defer
    r = Rays(o=state.o, d=state.d)

    @jax.jit
    def isect_full(o, d, valid):
        return scene_ir.intersect_scene(scene, Rays(o=o, d=d), key,
                                        state.it, ray_valid=valid,
                                        mesh_backend="auto")

    rows.append(("intersect_scene (auto)",
                 timeit(isect_full, state.o, state.d, active)))

    @jax.jit
    def isect_xla(o, d, valid):
        return scene_ir.intersect_scene(scene, Rays(o=o, d=d), key,
                                        state.it, ray_valid=valid,
                                        mesh_backend="xla")

    rows.append(("intersect_scene (xla)",
                 timeit(isect_xla, state.o, state.d, active)))

    # mesh instance found -> kernel-only + cohsort-only timings
    mesh = None
    for inst in scene.instances:
        if inst.kind == "mesh" and inst.mesh.use_bvh:
            mesh = inst.mesh
            tf = inst.transform
            break
    if mesh is not None and mesh.tri_soa is not None:
        from hobbyraytracer_tpu.kernels import mesh_traverse as kmod
        rm = tf.ray_to_object(r) if tf is not None else r
        n = pool
        # streaming meshes (32-row tables) run at STREAM_BLOCK
        b = (kmod.STREAM_BLOCK
             if mesh.tri_soa.shape[1] == kmod.STREAM_ROWS else kmod.BLOCK)
        nb = n // b
        rays8 = jnp.concatenate(
            [rm.o, rm.d, active.astype(jnp.float32)[:, None],
             jnp.zeros((n, 1), jnp.float32)], axis=1)

        @jax.jit
        def traverse(r8):
            return kmod.traverse_clusters_pallas(
                r8.reshape(nb, b, 8), mesh.bounds8, mesh.tri_soa,
                mesh.cluster_id)

        rows.append(("  mesh traversal kernel", timeit(traverse, rays8)))

        from hobbyraytracer_tpu.core.mathx import BIG
        from hobbyraytracer_tpu.ops.intersect import coherence_key

        @jax.jit
        def cohsort(r8):
            # the shipped HRT_KEY_MODE-resolved key path, so this row
            # cannot drift from shipped behavior
            sk = coherence_key(r8[:, 0:3], r8[:, 3:6],
                               r8[:, 6] > 0, mesh.bounds8, float(BIG))
            perm = jnp.argsort(sk)
            r8s = r8[perm]
            undone = jnp.zeros_like(r8s).at[perm].set(r8s)
            return undone

        rows.append(("  cohsort (key+argsort+gather+undo)",
                     timeit(cohsort, rays8)))

    if not scene.spheres.empty:
        from hobbyraytracer_tpu.core import mathx
        from hobbyraytracer_tpu.core.mathx import BIG as BIGC
        from hobbyraytracer_tpu.ops import intersect as isect_ops

        @jax.jit
        def spheres_only(o, d):
            return isect_ops.intersect_spheres(
                Rays(o=o, d=d), scene.spheres.center, scene.spheres.radius,
                scene.spheres.mat_id, mathx.T_MIN, BIGC)

        rows.append((f"  sphere table ({scene.spheres.center.shape[0]})",
                     timeit(spheres_only, state.o, state.d)))

    hits = isect_full(state.o, state.d, active)
    jax.block_until_ready(hits)

    @jax.jit
    def shade(h, o, d):
        e = shade_ops.emitted(scene.materials, scene.textures, h)
        ok, att, nd = shade_ops.scatter(scene.materials, scene.textures,
                                        Rays(o=o, d=d), h, key, state.it)
        return e, ok, att, nd

    rows.append(("shade (emitted+scatter)",
                 timeit(shade, hits, state.o, state.d)))

    wh = w * h
    cap = min(max(pool // wavefront.RETIRE_DIV, 64), pool)

    @jax.jit
    def retire(item, done, fb, rad):
        skey = jnp.where(done, item % wh, jnp.int32(2**30))
        order = jnp.argsort(skey).astype(jnp.int32)[:cap]
        pix_c = skey[order]
        rad_c = rad[order]
        ok_c = pix_c < jnp.int32(2**30)
        tgt = jnp.where(ok_c, pix_c, 0)
        vals = jnp.where(ok_c[:, None], rad_c, 0.0)
        for c in range(3):
            fb = fb.at[c, tgt].add(vals[:, c])
        return fb

    done = active & (jax.random.uniform(key, (pool,)) < 0.12)
    rows.append(("retire (compact+planar scatter)",
                 timeit(retire, state.item, done, state.fb, state.rad)))

    @jax.jit
    def regen(s):
        return wavefront._regenerate(s, camera, w, h, total, key)

    rows.append(("regenerate", timeit(regen, state)))

    print(f"\n| component | ms @ pool={pool} |")
    print("|---|---|")
    for name, ms in rows:
        print(f"| {name} | {ms:.2f} |")
    n_active = int(jnp.sum(active))
    print(f"\nactive lanes: {n_active}/{pool}")
    seg = rows[0][1]
    print(f"segment throughput: {pool / seg * 1000 / 1e6:.2f}M lane-segments/s")


if __name__ == "__main__":
    main()

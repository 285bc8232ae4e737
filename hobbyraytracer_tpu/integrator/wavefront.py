"""Regenerative wavefront integrator (the TPU performance path).

The round-1 integrator traced the whole pixel batch through a bounce
`while_loop` that only stops when EVERY ray has terminated — so by bounce
30 a few percent of lanes carry live paths while 100% of lanes pay for
traversal. The reference has no such waste: each CPU thread simply moves to
the next pixel when a path dies (main.cpp:111-135).

The TPU-native equivalent of "move to the next pixel" is *ray
regeneration*: keep a fixed-size pool of P lanes; every iteration traces
ONE path segment for every lane; lanes whose paths terminate immediately
pull the next (pixel, sample) work item off a global queue and start a
fresh camera ray. Every lane does useful work every iteration (except the
final drain), shapes stay static for XLA, and the whole render is one
`lax.while_loop`.

Radiance recurrence per segment is identical to integrator/path.py (and
main.cpp:43-76): miss adds throughput*background, hits add
throughput*emitted, scatter multiplies throughput or terminates.

Work-item order is sample-major: item i covers pixel (i % W*H) of sample
(i // W*H), so the image completes in whole-image passes — progress and
checkpoint state are "n samples done + a partial pass".
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp

from ..core import rng
from ..core.types import Rays
from ..ops import film as film_ops
from ..ops import shade as shade_ops
from ..ops.camera import Camera, get_rays
from ..scene import ir as scene_ir
from .path import MAX_DEPTH, background_colour

DEFAULT_POOL = 1 << 18  # 262,144 lanes (~14 MB of pool state)

# RNG purpose tag for work-item issue order (distinct from core/rng tags)
_REGEN = 101


@flax.struct.dataclass
class PoolState:
    """Complete render state — serializable for checkpoint/resume.

    fb holds W*H + P rows: the image accumulator followed by P scratch
    rows that absorb the per-lane dummy writes of the retirement scatter
    (see _segment — guaranteed-unique indices let XLA vectorize the
    scatter-add instead of serializing 262k possibly-colliding updates,
    measured ~9x). Use `framebuffer(state, wh)` for the image part."""
    fb: jnp.ndarray        # (W*H + P, 3) f32 radiance accumulator (sum)
    o: jnp.ndarray         # (P, 3) ray origin
    d: jnp.ndarray         # (P, 3) ray direction
    thr: jnp.ndarray       # (P, 3) path throughput
    rad: jnp.ndarray       # (P, 3) radiance accumulated by the current path
    item: jnp.ndarray      # (P,) int32 work item id, -1 = idle lane
    depth: jnp.ndarray     # (P,) int32 segments already traced for the item
    pending: jnp.ndarray   # (P,) bool: path finished, framebuffer write
                           # deferred because another lane retired the same
                           # pixel this segment (see _segment)
    counter: jnp.ndarray   # () int32 next unissued work item
    retired: jnp.ndarray   # () int32 completed work items
    it: jnp.ndarray        # () int32 global iteration (RNG stream index)


def framebuffer(state: PoolState, width: int, height: int) -> jnp.ndarray:
    """The (W*H, 3) image accumulator (fb minus the scatter scratch rows)."""
    return state.fb[:width * height]


def init_state(width: int, height: int, pool: int = DEFAULT_POOL
               ) -> PoolState:
    return PoolState(
        fb=jnp.zeros((width * height + pool, 3), jnp.float32),
        o=jnp.zeros((pool, 3), jnp.float32),
        d=jnp.ones((pool, 3), jnp.float32),
        thr=jnp.zeros((pool, 3), jnp.float32),
        rad=jnp.zeros((pool, 3), jnp.float32),
        item=jnp.full((pool,), -1, jnp.int32),
        depth=jnp.zeros((pool,), jnp.int32),
        pending=jnp.zeros((pool,), jnp.bool_),
        counter=jnp.int32(0),
        retired=jnp.int32(0),
        it=jnp.int32(0),
    )


def _regenerate(state: PoolState, camera: Camera, width: int, height: int,
                total_items: int, key, item0=0) -> PoolState:
    """Fill idle lanes with fresh camera rays for the next queued items.

    item0: global offset of this worker's item range — state.counter /
    total_items stay worker-local, but the stored ids (and thus pixel
    assignment) are global, so sharded workers cover disjoint slices of
    the same image (parallel/shard.py)."""
    pool = state.item.shape[0]
    wh = width * height
    idle = state.item < 0
    # exclusive prefix rank among idle lanes -> contiguous item ids
    rank = jnp.cumsum(idle.astype(jnp.int32)) - 1
    new_local = state.counter + rank
    new_item = item0 + new_local
    issue = idle & (new_local < total_items)

    pix = new_item % wh
    x = (pix % width).astype(jnp.float32)
    y = (height - pix // width).astype(jnp.float32)  # main.cpp:116 y-flip
    ku = rng.stream(key, rng.PIXEL_JITTER_U, state.it)
    kv = rng.stream(key, rng.PIXEL_JITTER_V, state.it)
    ju = rng.uniform(ku, (pool,))
    jv = rng.uniform(kv, (pool,))
    u = (x + ju) / (width - 1)   # main.cpp:120-121
    v = (y + jv) / (height - 1)
    cam_rays = get_rays(camera, u, v, key=rng.stream(key, rng.LENS, state.it))

    i3 = issue[:, None]
    n_issued = jnp.minimum(jnp.sum(idle.astype(jnp.int32)),
                           jnp.int32(total_items) - state.counter)
    return state.replace(
        o=jnp.where(i3, cam_rays.o, state.o),
        d=jnp.where(i3, cam_rays.d, state.d),
        thr=jnp.where(i3, 1.0, state.thr),
        rad=jnp.where(i3, 0.0, state.rad),
        item=jnp.where(issue, new_item, state.item),
        depth=jnp.where(issue, 0, state.depth),
        counter=state.counter + jnp.maximum(n_issued, 0),
    )


def _segment(state: PoolState, scene: scene_ir.SceneIR, width: int,
             height: int, key, max_depth: int) -> PoolState:
    """Trace one path segment for every active lane; retire finished paths
    into the framebuffer."""
    wh = width * height
    active = (state.item >= 0) & ~state.pending
    r = Rays(o=state.o, d=state.d)
    hits = scene_ir.intersect_scene(scene, r, key, state.it,
                                    ray_valid=active, mesh_backend="auto")

    miss = active & ~hits.hit
    bg = background_colour(scene, state.d)
    rad = state.rad + jnp.where(miss[:, None], state.thr * bg, 0.0)

    emit = shade_ops.emitted(scene.materials, scene.textures, hits)
    hit_active = active & hits.hit
    rad = rad + jnp.where(hit_active[:, None], state.thr * emit, 0.0)

    ok, atten, new_d = shade_ops.scatter(scene.materials, scene.textures,
                                         r, hits, key, state.it)
    depth = state.depth + 1
    cont = hit_active & ok & (depth < max_depth)  # 50-bounce cap main.cpp:43
    thr = jnp.where(cont[:, None], state.thr * atten, state.thr)
    o = jnp.where(cont[:, None], hits.p, state.o)
    d = jnp.where(cont[:, None], new_d, state.d)

    # Retirement scatter with GUARANTEED-unique indices. XLA serializes a
    # possibly-colliding scatter-add (~40% of a segment's device time);
    # with provably unique rows it vectorizes (measured ~9x faster on the
    # isolated op). Two lanes CAN finish the same pixel in one segment
    # (samples of one pixel re-issued while an old path still lingers —
    # rare but real), so per segment we elect ONE winner per pixel via a
    # cheap sort and DEFER the losers: they sit out (pending=True) and
    # retry next segment, when their pixel's winner is gone. Winners
    # write their pixel row; every other lane writes its own scratch row
    # (wh + lane) — all rows distinct by construction, exact radiometry.
    done = (active & ~cont) | state.pending  # finished, fb write owed
    pool = state.item.shape[0]
    lane = jnp.arange(pool, dtype=jnp.int32)
    sort_key = jnp.where(done, state.item % wh, jnp.int32(2**30))
    order = jnp.argsort(sort_key).astype(jnp.int32)
    p_s = sort_key[order]
    head = jnp.concatenate([jnp.ones((1,), jnp.bool_),
                            p_s[1:] != p_s[:-1]])
    win_sorted = head & (p_s < jnp.int32(2**30))
    # back to lane order: `order` is a permutation -> truly unique
    winner = jnp.zeros((pool,), jnp.bool_).at[order].set(
        win_sorted, unique_indices=True)
    target = jnp.where(winner, state.item % wh, wh + lane)
    fb = state.fb.at[target].add(jnp.where(winner[:, None], rad, 0.0),
                                 unique_indices=True)

    return state.replace(
        fb=fb, o=o, d=d, thr=thr, rad=rad,
        item=jnp.where(winner, -1, state.item),
        depth=depth,
        pending=done & ~winner,
        retired=state.retired + jnp.sum(winner.astype(jnp.int32)),
        it=state.it + 1,
    )


@partial(jax.jit, static_argnums=(5, 6, 8), donate_argnums=0)
def _pool_run(state: PoolState, scene, camera, key, n_steps,
              width: int, height: int, total_items,
              max_depth: int) -> PoolState:
    """Advance the pool by up to n_steps iterations (stops early when the
    whole render is done). Donated state -> in-place buffer reuse."""

    def cond(c):
        s, i = c
        return ((i < n_steps)
                & ((s.counter < total_items) | jnp.any(s.item >= 0)))

    def body(c):
        s, i = c
        s = _regenerate(s, camera, width, height, total_items, key)
        s = _segment(s, scene, width, height, key, max_depth)
        return s, i + 1

    state, _ = jax.lax.while_loop(cond, body, (state, jnp.int32(0)))
    return state


def render_state(scene: scene_ir.SceneIR, camera: Camera, width: int,
                 height: int, samples: int, key: jax.Array,
                 max_depth: int = MAX_DEPTH, pool: int = DEFAULT_POOL,
                 steps_per_call: int = 256,
                 progress_cb: Optional[Callable[[int, int], None]] = None,
                 state: Optional[PoolState] = None,
                 checkpoint_cb: Optional[Callable[[PoolState], None]] = None,
                 ) -> PoolState:
    """Run the pool to completion; returns the final state (fb holds the
    radiance SUM over `samples` samples per pixel).

    progress_cb(retired_items, total_items) fires after every jitted chunk
    of `steps_per_call` iterations (the reference's 500 ms reporter thread,
    main.cpp:95-109, becomes a between-chunks callback).
    checkpoint_cb(state) fires on the same cadence with the full state.
    `state` resumes from a checkpoint (see checkpoint.py).
    """
    total_items = width * height * samples
    pool = min(pool, total_items)
    if state is None:
        state = init_state(width, height, pool)
    while True:
        state = _pool_run(state, scene, camera, key,
                          jnp.int32(steps_per_call), width, height,
                          jnp.int32(total_items), max_depth)
        retired = int(jax.device_get(state.retired))
        if progress_cb is not None:
            progress_cb(retired, total_items)
        if checkpoint_cb is not None:
            checkpoint_cb(state)
        if retired >= total_items:
            return state


def render_image(scene: scene_ir.SceneIR, camera: Camera, width: int,
                 height: int, samples: int, key: jax.Array,
                 max_depth: int = MAX_DEPTH, pool: int = DEFAULT_POOL,
                 progress_cb=None, state: Optional[PoolState] = None,
                 checkpoint_cb=None) -> jnp.ndarray:
    """Full render -> tonemapped (H, W, 3) float image in [0,1]; same film
    pipeline as integrator/path.py (average -> ACES -> gamma)."""
    state = render_state(scene, camera, width, height, samples, key,
                         max_depth=max_depth, pool=pool,
                         progress_cb=progress_cb, state=state,
                         checkpoint_cb=checkpoint_cb)
    mean = framebuffer(state, width, height) / jnp.float32(samples)
    img = film_ops.tonemap(mean)
    return img.reshape(height, width, 3)

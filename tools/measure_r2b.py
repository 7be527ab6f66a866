#!/usr/bin/env python
"""Round-2 measurement batch B: raster scan modes, expand block sizes,
batched sort shapes.  Same method as measure_r2.py."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import orbit_cameras
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops import expand as expand_mod
from cudagaussianrenderer_tpu.ops import raster as raster_mod
from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs, splat_tile_rects
from cudagaussianrenderer_tpu.ops.projection import project_splats
from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
from cudagaussianrenderer_tpu.ops.raster import pack_pair_data, rasterize_tiles
from cudagaussianrenderer_tpu.ops.sorting import sort_pairs

REPS = 8


def timed(name, make_fn, *args):
    try:
        fn = jax.jit(make_fn)
        t0 = time.perf_counter()
        np.asarray(fn(jnp.float32(0.0), *args))
        compile_s = time.perf_counter() - t0
        best = float("inf")
        for it in range(1, 4):
            t0 = time.perf_counter()
            out = fn(jnp.float32(it), *args)
            np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / REPS
        print(f"{name:28s} {ms:9.3f} ms/rep   (compile {compile_s:6.1f}s)", flush=True)
        return ms
    except Exception as e:  # noqa
        print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)
        return None


def scanned(body):
    def fn(salt, *args):
        def step(c, s):
            return c + body(s, *args), 0

        c, _ = jax.lax.scan(step, jnp.float32(0.0), salt + jnp.arange(REPS, dtype=jnp.float32))
        return c

    return fn


def main():
    print("backend:", jax.default_backend(), flush=True)
    scene = random_scene(
        1_000_000, seed=0, min_scale=0.002, max_scale=0.03, extent=4.0
    ).pad_to_multiple(256)
    config = RenderConfig(screen_size=1024)
    cam = jax.tree.map(jnp.asarray, orbit_cameras(scene.bounds_min, scene.bounds_max, 8)[0].camera_data())
    capacity = 4194304

    clip = jax.jit(lambda s, c: project_splats(s.means, s.scales, s.quats, c, config))(scene, cam)
    pairs = jax.jit(
        lambda cl, s: build_tile_pairs(cl, s.colors, s.opacities, config, capacity)
    )(clip, scene)
    skeys, _, sattrs = jax.jit(sort_pairs)(pairs)
    starts, counts = jax.jit(lambda k: tile_ranges(k, config))(skeys)
    pair_data = jax.jit(lambda a: pack_pair_data(a, config.raster_chunk))(sattrs)
    np.asarray(starts)

    tiny = jnp.ones((8, 128), jnp.float32)
    timed("baseline", scanned(lambda s, x: jnp.sum(x) + s), tiny)

    # ---- raster scan-mode variants ----
    def raster_body(cfg):
        def body(s, pd, st, ct):
            pd2 = pd.at[3].add(s)
            out = rasterize_tiles(pd2, st, ct, cfg)
            return jnp.sum(out[:, :8, :]) * 1e-6
        return body

    for mode in ("roll", "logmm", "chunk"):
        raster_mod.SCAN_MODE = mode
        timed(f"raster c128 {mode}", scanned(raster_body(config)), pair_data, starts, counts)
    raster_mod.SCAN_MODE = "logmm"
    import dataclasses
    cfg_ep = dataclasses.replace(config, falloff="epanechnikov")
    timed("raster c128 logmm epan", scanned(raster_body(cfg_ep)), pair_data, starts, counts)
    cfg_tpc32 = dataclasses.replace(config, tiles_per_cell=32)
    timed("raster c128 logmm tpc32", scanned(raster_body(cfg_tpc32)), pair_data, starts, counts)
    raster_mod.SCAN_MODE = "roll"

    # ---- expand block/window variants ----
    rects = splat_tile_rects(clip, config)
    incl = jnp.cumsum(rects.counts)
    n = rects.counts.shape[0]
    geom = (
        (rects.x0.astype(jnp.float32) * 256.0 + rects.y0.astype(jnp.float32)) * 256.0
        + rects.w.astype(jnp.float32)
    )
    from cudagaussianrenderer_tpu.ops.binning import pack_rgb_u32, quantize_depth
    qdepth = quantize_depth(clip.clip_z, 19)
    rows14 = jnp.stack(
        [
            geom, qdepth.astype(jnp.float32), jnp.arange(n, dtype=jnp.float32),
            clip.cos_t, clip.sin_t, clip.e0, clip.e1,
            clip.cx, clip.cy, clip.con_a, clip.con_b, clip.con_c,
            pack_rgb_u32(scene.colors).astype(jnp.float32), scene.opacities,
        ]
    )

    def expand_body(s, rows_in, incl_in):
        r = rows_in.at[5].add(s * 1e-12)
        out = expand_mod.segmented_expand(r, incl_in, capacity)
        return jnp.sum(out[:, :1024]) * 1e-9

    for blk, win in ((1024, 512), (2048, 512), (4096, 512), (4096, 1024), (2048, 256), (4096, 256)):
        expand_mod.MAX_BLOCK = blk
        expand_mod.WINDOW = win
        timed(f"expand b{blk} w{win}", scanned(expand_body), rows14, incl)
    expand_mod.MAX_BLOCK = 1024
    expand_mod.WINDOW = 512

    # ---- batched sort shapes (5 operands) ----
    key0 = pairs.keys[0]
    ops5 = (key0, *sattrs)

    def sort_batched(shape):
        def body(s, *ops_in):
            k = ops_in[0] ^ jnp.uint32(1) * s.astype(jnp.uint32)
            ops2 = tuple(o.reshape(*shape) for o in (k, *ops_in[1:]))
            out = jax.lax.sort(ops2, num_keys=1, is_stable=True, dimension=1)
            return sum(jnp.sum(o[:, 0].astype(jnp.float32)) * 1e-9 for o in out)
        return body

    timed("sort [128,32768] x5", scanned(sort_batched((128, 32768))), *ops5)
    timed("sort [256,16384] x5", scanned(sort_batched((256, 16384))), *ops5)
    timed("sort [512,8192] x5", scanned(sort_batched((512, 8192))), *ops5)
    timed("sort [1024,4096] x5", scanned(sort_batched((1024, 4096))), *ops5)
    vals_u32 = jax.lax.bitcast_convert_type(pairs.values, jnp.uint32)
    timed("sort [64,65536] x2", scanned(sort_batched((64, 65536))), key0, vals_u32)
    m = 3670016
    def sort_flat(s, *ops_in):
        k = ops_in[0] ^ jnp.uint32(1) * s.astype(jnp.uint32)
        out = jax.lax.sort((k, *ops_in[1:]), num_keys=1, is_stable=True)
        return sum(o[0].astype(jnp.float32) * 1e-9 + o[-1].astype(jnp.float32) * 1e-9 for o in out)
    timed("sort 3.67M x5", scanned(sort_flat), *(o[:m] for o in ops5))
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

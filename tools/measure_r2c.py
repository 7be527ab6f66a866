#!/usr/bin/env python
"""Round-2 batch C: fixed logmm raster + finer expand block/window."""

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
from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs, splat_tile_rects, pack_rgb_u32, quantize_depth
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
        print(f"{name:28s} {best * 1e3 / REPS:9.3f} ms/rep   (compile {compile_s:6.1f}s)", flush=True)
    except Exception as e:  # noqa
        print(f"{name:28s} FAILED: {type(e).__name__}: {e}", flush=True)


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

    def raster_body(cfg):
        def body(s, pd, st, ct):
            pd2 = pd.at[3].add(s)
            out = rasterize_tiles(pd2, st, ct, cfg)
            return jnp.sum(out[:, :8, :]) * 1e-6
        return body

    import dataclasses
    raster_mod.SCAN_MODE = "logmm"
    timed("raster c128 logmm", scanned(raster_body(config)), pair_data, starts, counts)
    cfg_ep = dataclasses.replace(config, falloff="epanechnikov")
    timed("raster c128 logmm epan", scanned(raster_body(cfg_ep)), pair_data, starts, counts)
    cfg_tpc32 = dataclasses.replace(config, tiles_per_cell=32)
    timed("raster c128 logmm tpc32", scanned(raster_body(cfg_tpc32)), pair_data, starts, counts)
    cfg_tpc4 = dataclasses.replace(config, tiles_per_cell=4)
    timed("raster c128 logmm tpc4", scanned(raster_body(cfg_tpc4)), pair_data, starts, counts)
    raster_mod.SCAN_MODE = "roll"

    # finer expand shapes
    rects = splat_tile_rects(clip, config)
    incl = jnp.cumsum(rects.counts)
    n = rects.counts.shape[0]
    geom = (
        (rects.x0.astype(jnp.float32) * 256.0 + rects.y0.astype(jnp.float32)) * 256.0
        + rects.w.astype(jnp.float32)
    )
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

    for blk, win in ((1024, 256), (512, 256), (1024, 128), (512, 128), (256, 128)):
        expand_mod.MAX_BLOCK = blk
        expand_mod.WINDOW = win
        timed(f"expand b{blk} w{win}", scanned(expand_body), rows14, incl)
    expand_mod.MAX_BLOCK = 1024
    expand_mod.WINDOW = 512
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

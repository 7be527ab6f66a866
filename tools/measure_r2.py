#!/usr/bin/env python
"""Round-2 measurement harness (run on the real TPU, results -> stdout).

Times pipeline stages and candidate optimizations at the bench workload
(1M splats, 1024^2, capacity 4.19M).  Method per the repo's benchmarking
rules: device-side lax.scan over 8 salted reps per dispatch, best of 3
outer reps, trivial-program baseline subtracted, np.asarray to force
materialization.
"""

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
from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs, splat_tile_rects, quantize_depth, pack_rgb_u32
from cudagaussianrenderer_tpu.ops.projection import project_splats
from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
from cudagaussianrenderer_tpu.ops.raster import pack_pair_data, rasterize_tiles, tiles_to_image
from cudagaussianrenderer_tpu.ops.sorting import sort_pairs
from cudagaussianrenderer_tpu.render import render_frame

REPS = 8


def timed(name, make_fn, *args):
    """make_fn(salt, *args) -> small array; internally scans REPS times."""
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
    """Wrap body(salt_scalar) -> scalar into a scan over REPS salts."""

    def fn(salt, *args):
        def step(c, s):
            return c + body(s, *args), 0

        c, _ = jax.lax.scan(step, jnp.float32(0.0), salt + jnp.arange(REPS, dtype=jnp.float32))
        return c

    return fn


def main():
    print("backend:", jax.default_backend(), flush=True)
    n_splats = 1_000_000
    scene = random_scene(
        n_splats, seed=0, min_scale=0.002, max_scale=0.03, extent=4.0
    ).pad_to_multiple(256)
    config = RenderConfig(screen_size=1024)
    cam = orbit_cameras(scene.bounds_min, scene.bounds_max, 8)[0].camera_data()
    cam = jax.tree.map(jnp.asarray, cam)
    capacity = 4194304

    # ---- materialize intermediates once ----
    clip = jax.jit(lambda s, c: project_splats(s.means, s.scales, s.quats, c, config))(scene, cam)
    pairs = jax.jit(
        lambda cl, s: build_tile_pairs(cl, s.colors, s.opacities, config, capacity)
    )(clip, scene)
    skeys, _, sattrs = jax.jit(sort_pairs)(pairs)
    starts, counts = jax.jit(lambda k: tile_ranges(k, config))(skeys)
    pair_data = jax.jit(lambda a: pack_pair_data(a, config.raster_chunk))(sattrs)
    (jax.block_until_ready(pair_data), np.asarray(starts))
    print(
        f"workload: candidates={int(pairs.num_candidates)} pairs={int(pairs.num_pairs)} capacity={capacity}",
        flush=True,
    )

    # ---- baseline (dispatch + tunnel overhead) ----
    tiny = jnp.ones((8, 128), jnp.float32)
    base = timed("baseline", scanned(lambda s, x: jnp.sum(x) + s), tiny)

    # ---- fused whole frame ----
    def frame_body(s, scene, cam):
        cam2 = dict(cam, position=cam["position"] + s * 1e-7)
        img, aux = render_frame(scene, cam2, config, capacity)
        return jnp.sum(img[::64, ::64, 0].astype(jnp.float32))

    timed("frame_fused", scanned(frame_body), scene, cam)

    # ---- sort variants ----
    key0 = pairs.keys[0]
    a_cxcy, a_conic, a_rgba = pairs.attrs  # 3-operand layout
    a_ab, a_cal, a_rgb = a_conic, a_rgba, a_rgba  # legacy aliases for the variant bodies
    vals_u32 = jax.lax.bitcast_convert_type(pairs.values, jnp.uint32)

    def sort_body(s, *ops_in):
        k = ops_in[0] ^ jnp.uint32(1) * s.astype(jnp.uint32)
        out = jax.lax.sort((k, *ops_in[1:]), num_keys=1, is_stable=True)
        acc = jnp.float32(0)
        for o in out:
            acc += o[0].astype(jnp.float32) * 1e-9 + o[-1].astype(jnp.float32) * 1e-9
        return acc

    timed("sort 4.19M x6ops", scanned(sort_body), key0, a_cxcy, a_ab, a_cal, a_rgb, vals_u32)
    timed("sort 4.19M x5ops", scanned(sort_body), key0, a_cxcy, a_ab, a_cal, a_rgb)
    timed("sort 4.19M x2ops", scanned(sort_body), key0, vals_u32)
    timed("sort 4.19M x1op", scanned(sort_body), key0)
    m = 2621440
    timed(
        "sort 2.62M x5ops",
        scanned(sort_body),
        key0[:m], a_cxcy[:m], a_ab[:m], a_cal[:m], a_rgb[:m],
    )

    def sort_batched_body(s, *ops_in):
        k = ops_in[0] ^ jnp.uint32(1) * s.astype(jnp.uint32)
        ops2 = tuple(o.reshape(64, 65536) for o in (k, *ops_in[1:]))
        out = jax.lax.sort(ops2, num_keys=1, is_stable=True, dimension=1)
        acc = jnp.float32(0)
        for o in out:
            acc += jnp.sum(o[:, 0].astype(jnp.float32)) * 1e-9
        return acc

    timed(
        "sort [64,65536] x5ops",
        scanned(sort_batched_body),
        key0, a_cxcy, a_ab, a_cal, a_rgb,
    )

    # ---- expand variants ----
    rects = splat_tile_rects(clip, config)
    incl = jnp.cumsum(rects.counts)
    qdepth = quantize_depth(clip.clip_z, 19)
    n = rects.counts.shape[0]
    geom = (
        (rects.x0.astype(jnp.float32) * 128.0 + rects.y0.astype(jnp.float32)) * 128.0
        + rects.w.astype(jnp.float32)
    )
    rows14 = jnp.stack(
        [
            geom, qdepth.astype(jnp.float32),
            jnp.arange(n, dtype=jnp.float32),
            clip.cos_t, clip.sin_t, clip.e0, clip.e1,
            clip.cx, clip.cy, clip.con_a, clip.con_b, clip.con_c,
            pack_rgb_u32(scene.colors).astype(jnp.float32), scene.opacities,
        ]
    )
    rows16 = jnp.concatenate([rows14, rows14[:2]])  # emulate the old 16-row cost

    def expand_body(s, rows_in, incl_in):
        r = rows_in.at[5].add(s * 1e-12)
        out = expand_mod.segmented_expand(r, incl_in, capacity)
        return jnp.sum(out[:, :1024]) * 1e-9

    timed("expand 16rows w512", scanned(expand_body), rows16, incl)
    timed("expand 14rows w512", scanned(expand_body), rows14, incl)

    saved_w = expand_mod.WINDOW
    expand_mod.WINDOW = 2048
    timed("expand 14rows w2048", scanned(expand_body), rows14, incl)
    expand_mod.WINDOW = 1024
    timed("expand 14rows w1024", scanned(expand_body), rows14, incl)
    expand_mod.WINDOW = saved_w

    # ---- raster variants ----
    def raster_body(cfg):
        def body(s, pd, st, ct):
            pd2 = pd.at[3].add(s)  # perturb packed-rgb values (blue channel)
            out = rasterize_tiles(pd2, st, ct, cfg)
            return jnp.sum(out[:, :8, :]) * 1e-6
        return body

    timed("raster c128 tpc8", scanned(raster_body(config)), pair_data, starts, counts)

    import dataclasses
    cfg512 = dataclasses.replace(config, raster_chunk=512)
    pd512 = jax.jit(lambda a: pack_pair_data(a, 512))(sattrs)
    timed("raster c512 tpc8", scanned(raster_body(cfg512)), pd512, starts, counts)
    cfg512b = dataclasses.replace(config, raster_chunk=512, tiles_per_cell=16)
    timed("raster c512 tpc16", scanned(raster_body(cfg512b)), pd512, starts, counts)
    cfg256 = dataclasses.replace(config, raster_chunk=256)
    pd256 = jax.jit(lambda a: pack_pair_data(a, 256))(sattrs)
    timed("raster c256 tpc8", scanned(raster_body(cfg256)), pd256, starts, counts)

    # ---- small stages ----
    timed(
        "project",
        scanned(
            lambda s, sc, c: jnp.sum(
                project_splats(sc.means, sc.scales, sc.quats, dict(c, position=c["position"] + s * 1e-7), config).cx[:128]
            )
        ),
        scene, cam,
    )
    timed(
        "ranges",
        scanned(lambda s, k: jnp.sum(tile_ranges((k | s.astype(jnp.uint32),), config)[0][:128].astype(jnp.float32))),
        skeys[0],
    )
    timed(
        "pack_pair_data",
        scanned(lambda s, *a: jnp.sum(pack_pair_data((a[0], a[1] + s.astype(jnp.uint32), a[2], a[3]), 128)[:, :128])),
        *sattrs,
    )

    tiles = jax.jit(lambda pd, st, ct: rasterize_tiles(pd, st, ct, config))(pair_data, starts, counts)
    timed(
        "tiles_to_image",
        scanned(lambda s, t: jnp.sum(tiles_to_image(t + s * 1e-9, config)[::64, ::64, 0].astype(jnp.float32))),
        tiles,
    )
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Round-3 raster-stage variant measurements (run on the real TPU).

Variants over the bench workload's sorted pair list:
  * raster_chunk 128 vs 256 (DMA count halves; scan cost per pair is
    constant once the scan runs in SCAN_WIDTH sub-blocks)
  * SCAN_WIDTH 64 vs chunk-wide
  * gaussian vs epanechnikov falloff (the reference's published fast
    mode, README.md:133-136)

Method per docs/PERF_NOTES.md: device-side scan of 8 salted reps,
best-of-3, dispatch baseline subtracted.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import cudagaussianrenderer_tpu.ops.raster as raster_mod
from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import orbit_cameras
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs
from cudagaussianrenderer_tpu.ops.projection import project_splats
from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
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
        print(f"{name:44s} {ms:9.3f} ms/rep  (compile {compile_s:5.1f}s)", flush=True)
        return ms
    except Exception as e:  # noqa
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None


def scanned(body):
    def fn(salt, *args):
        def step(c, s):
            return c + body(s, *args), 0

        c, _ = jax.lax.scan(
            step, jnp.float32(0.0), salt + jnp.arange(REPS, dtype=jnp.float32)
        )
        return c

    return fn


def main():
    print("backend:", jax.default_backend(), flush=True)
    scene = random_scene(
        1_000_000, seed=0, min_scale=0.002, max_scale=0.053, extent=4.0
    ).pad_to_multiple(256)
    cam = orbit_cameras(scene.bounds_min, scene.bounds_max, 8)[0].camera_data()
    cam = jax.tree.map(jnp.asarray, cam)
    capacity = 4_325_376  # 1.04x bucketed bench capacity

    cfg = RenderConfig(screen_size=1024)
    clip = jax.jit(
        lambda s, c: project_splats(s.means, s.scales, s.quats, c, cfg)
    )(scene, cam)
    pairs = jax.jit(
        lambda cl, s: build_tile_pairs(cl, s.colors, s.opacities, cfg, capacity)
    )(clip, scene)
    skeys, _, sattrs = jax.jit(lambda p: sort_pairs(p))(pairs)
    starts, counts = jax.jit(lambda k: tile_ranges(k, cfg))(skeys)
    jax.block_until_ready((sattrs, starts, counts))

    base = timed("dispatch baseline", scanned(lambda s, x: jnp.sum(x) + s),
                 jnp.ones((8, 128), jnp.float32))

    ref_img = None
    cases = [
        ("chunk128 sw128 limbs2 gaussian", 128, 128, "gaussian", 2),
        ("chunk128 sw128 limbs1 gaussian", 128, 128, "gaussian", 1),
        ("chunk128 sw128 limbs1 epanechnikov", 128, 128, "epanechnikov", 1),
    ]
    for name, chunk, sw, falloff, limbs in cases:
        raster_mod.SCAN_WIDTH = sw
        raster_mod.SCAN_LIMBS = limbs
        c = RenderConfig(screen_size=1024, raster_chunk=chunk, falloff=falloff)

        def body(s, a0, a1, a2, st, ct, _c=c, _ck=chunk):
            return jnp.sum(
                raster_mod.tiles_to_image(
                    raster_mod.rasterize_tiles(
                        raster_mod.pack_pair_data(
                            (a0, a1, a2 ^ s.astype(jnp.uint32)), _ck
                        ),
                        st, ct, _c,
                    ),
                    _c,
                )[::64, ::64, 0].astype(jnp.float32)
            )

        ms = timed(name, scanned(body), *sattrs, starts, counts)
        if ms is not None and base is not None:
            print(f"{'':44s} net {ms - base:9.3f} ms", flush=True)

        if falloff == "gaussian" and ms is not None:
            img = np.asarray(jax.jit(
                lambda a0, a1, a2, st, ct, _c=c, _ck=chunk: raster_mod.tiles_to_image(
                    raster_mod.rasterize_tiles(
                        raster_mod.pack_pair_data((a0, a1, a2), _ck), st, ct, _c
                    ),
                    _c,
                )
            )(*sattrs, starts, counts))
            if ref_img is None:
                ref_img = img.astype(np.int32)
            else:
                d = np.abs(img.astype(np.int32) - ref_img)
                print(f"{'':44s} vs case0: bad_px {(d > 2).any(-1).mean():.5f} "
                      f"max {d.max()}", flush=True)

    raster_mod.SCAN_WIDTH = 128
    raster_mod.SCAN_LIMBS = 2


if __name__ == "__main__":
    main()

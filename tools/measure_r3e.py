#!/usr/bin/env python
"""Round-3 session 2: (a) Pallas grid-step overhead probe — the emit
kernel runs ~4080 one-block grid steps; if per-step overhead is ~1 us
that alone is ~4 ms and batching blocks per step wins; (b) re-measure the
raster stage after the m = -dpow/2 op-count reduction (limbs 2 vs 1,
gaussian vs epanechnikov).

Method per docs/PERF_NOTES.md: device-side scan of salted reps,
best-of-3, dispatch baseline subtracted.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

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
            np.asarray(fn(jnp.float32(it), *args))
            best = min(best, time.perf_counter() - t0)
        ms = best * 1e3 / REPS
        print(f"{name:46s} {ms:9.3f} ms/rep  (compile {compile_s:5.1f}s)",
              flush=True)
        return ms
    except Exception as e:  # noqa
        print(f"{name:46s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
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


def grid_probe(base):
    """Same total output (4.18M u32), varying blocks-per-grid-step."""
    total = 4_182_016

    def make(blk):
        def kern(x_ref, o_ref):
            o_ref[...] = x_ref[...] + jax.lax.broadcasted_iota(
                jnp.int32, (blk,), 0
            ).astype(jnp.float32)

        def body(s, x):
            out = pl.pallas_call(
                kern,
                grid=(total // blk,),
                in_specs=[pl.BlockSpec((blk,), lambda i: (i,))],
                out_specs=pl.BlockSpec((blk,), lambda i: (i,)),
                out_shape=jax.ShapeDtypeStruct((total,), jnp.float32),
            )(x + s)
            return jnp.sum(out[:128]) * 1e-9

        return body

    x = jnp.zeros((total,), jnp.float32)
    for blk in (1024, 2048, 4096, 16384):
        ms = timed(f"pallas grid probe blk={blk} ({total//blk} steps)",
                   scanned(make(blk)), x)
        if ms is not None and base is not None:
            us = (ms - base) * 1e3 / (total // blk)
            print(f"{'':46s} net {ms-base:7.3f} ms = {us:6.3f} us/step",
                  flush=True)


def main():
    print("backend:", jax.default_backend(), flush=True)
    base = timed("dispatch baseline", scanned(lambda s, x: jnp.sum(x) + s),
                 jnp.ones((8, 128), jnp.float32))

    grid_probe(base)

    scene = random_scene(
        1_000_000, seed=0, min_scale=0.002, max_scale=0.053, extent=4.0
    ).pad_to_multiple(256)
    cam = orbit_cameras(scene.bounds_min, scene.bounds_max, 8)[0].camera_data()
    cam = jax.tree.map(jnp.asarray, cam)
    capacity = 4_182_016

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

    ref_img = None
    cases = [
        ("raster m-form limbs2 gaussian", "gaussian", 2),
        ("raster m-form limbs1 gaussian", "gaussian", 1),
        ("raster m-form limbs1 epanechnikov", "epanechnikov", 1),
    ]
    for name, falloff, limbs in cases:
        raster_mod.SCAN_LIMBS = limbs
        c = RenderConfig(screen_size=1024, falloff=falloff)
        ck = c.raster_chunk

        def body(s, a0, a1, a2, st, ct, _c=c, _ck=ck):
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
            print(f"{'':46s} net {ms - base:9.3f} ms", flush=True)

        if falloff == "gaussian" and ms is not None:
            img = np.asarray(jax.jit(
                lambda a0, a1, a2, st, ct, _c=c, _ck=ck: raster_mod.tiles_to_image(
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
                print(f"{'':46s} vs case0: bad_px {(d > 2).any(-1).mean():.5f} "
                      f"max {d.max()}", flush=True)

    raster_mod.SCAN_LIMBS = 2


if __name__ == "__main__":
    main()

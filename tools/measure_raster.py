#!/usr/bin/env python
"""Raster variant measurements at the bench workload (run on TPU)."""
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
from cudagaussianrenderer_tpu.ops import raster as raster_mod
from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs
from cudagaussianrenderer_tpu.ops.projection import project_splats
from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
from cudagaussianrenderer_tpu.ops.sorting import sort_pairs

REPS = 8


def timed(name, make_fn, *args):
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
    print(f"{name:36s} {ms:9.3f} ms/rep  (compile {compile_s:5.1f}s)", flush=True)
    return ms


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
    config = RenderConfig(screen_size=1024)
    cam = orbit_cameras(scene.bounds_min, scene.bounds_max, 8)[0].camera_data()
    cam = jax.tree.map(jnp.asarray, cam)
    capacity = 4_587_520

    clip = jax.jit(
        lambda s, c: project_splats(s.means, s.scales, s.quats, c, config)
    )(scene, cam)
    pairs = jax.jit(
        lambda cl, s: build_tile_pairs(cl, s.colors, s.opacities, config, capacity)
    )(clip, scene)
    skeys, _, sattrs = jax.jit(lambda p: sort_pairs(p))(pairs)
    starts, counts = jax.jit(lambda k: tile_ranges(k, config))(skeys)
    jax.block_until_ready(sattrs)

    base = timed("dispatch baseline", scanned(lambda s, x: jnp.sum(x) + s),
                 jnp.ones((8, 128), jnp.float32))

    ref_img = None
    for rows, limbs in ((4, 3), (4, 2)):
        raster_mod.PAIR_ROWS = rows
        raster_mod.SCAN_LIMBS = limbs

        def body(s, a0, a1, a2, st, ct):
            return jnp.sum(
                raster_mod.tiles_to_image(
                    raster_mod.rasterize_tiles(
                        raster_mod.pack_pair_data(
                            (a0, a1, a2 ^ s.astype(jnp.uint32)),
                            config.raster_chunk,
                        ),
                        st, ct, config,
                    ),
                    config,
                )[::64, ::64, 0].astype(jnp.float32)
            )

        ms = timed(f"rows={rows} scan_limbs={limbs}", scanned(body),
                   *sattrs, starts, counts)
        print(f"{'':36s} net {ms - base:9.3f} ms", flush=True)

        img = np.asarray(jax.jit(
            lambda a0, a1, a2, st, ct: raster_mod.tiles_to_image(
                raster_mod.rasterize_tiles(
                    raster_mod.pack_pair_data((a0, a1, a2), config.raster_chunk),
                    st, ct, config,
                ),
                config,
            )
        )(*sattrs, starts, counts))
        if ref_img is None:
            ref_img = img.astype(np.int32)
        else:
            d = np.abs(img.astype(np.int32) - ref_img)
            print(f"{'':36s} vs exact: bad_px {(d > 2).any(-1).mean():.5f} "
                  f"max {d.max()}", flush=True)

    raster_mod.PAIR_ROWS = 4
    raster_mod.SCAN_LIMBS = 3


if __name__ == "__main__":
    main()

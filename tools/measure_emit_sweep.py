#!/usr/bin/env python
"""(MAX_BLOCK, WINDOW) sweep for the emit kernel on the real TPU.

The match-matrix cost per block is ~B x (span + alignment slack) VPU
compares, and span scales with B (avg ~4 slots/splat), so total compare
area is ~C*B/4 — linear in B.  Against that, halving B doubles the grid
steps (per-step scalar/DMA overhead).  This sweeps the tradeoff.

Method per docs/PERF_NOTES.md: scan of 8 salted reps, best-of-3,
dispatch baseline subtracted.
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
except Exception:
    pass

import cudagaussianrenderer_tpu.ops.expand as expand_mod
from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import orbit_cameras
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops.projection import project_splats

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
    capacity = 4_325_376

    cfg = RenderConfig(screen_size=1024)
    clip = jax.jit(
        lambda s, c: project_splats(s.means, s.scales, s.quats, c, cfg)
    )(scene, cam)
    jax.block_until_ready(clip)

    base = timed("dispatch baseline", scanned(lambda s, x: jnp.sum(x) + s),
                 jnp.ones((8, 128), jnp.float32))

    def net(ms):
        return None if ms is None or base is None else ms - base

    from cudagaussianrenderer_tpu.ops.binning import (
        pack_rgb_u32,
        quantize_depth,
        splat_row_packs,
        splat_tile_rects,
    )

    def make_inputs(cl, sc):
        rects = splat_tile_rects(cl, cfg)
        packs = splat_row_packs(cl, rects, cfg)
        incl = jnp.cumsum(packs.counts)
        qdepth = quantize_depth(cl.clip_z, 19)
        rgb = pack_rgb_u32(sc.colors)
        n = packs.counts.shape[0]
        geom = (
            (rects.x0.astype(jnp.float32) * 256.0 + rects.y0.astype(jnp.float32))
            * 256.0
            + rects.w.astype(jnp.float32)
        )
        rows = (
            geom, qdepth.astype(jnp.float32),
            cl.cx, cl.cy, cl.con_a, cl.con_b, cl.con_c,
            rgb.astype(jnp.float32), sc.opacities, *packs.packs,
        )
        return rows, incl

    rows, incl = jax.jit(make_inputs)(clip, scene)
    jax.block_until_ready((rows, incl))

    def kernel_body(s, rows, incl):
        r = (*rows[:2], rows[2] + s * 1e-9, *rows[3:])  # salt cx col
        out = expand_mod.emit_pairs(r, incl, capacity, cfg)
        # Consume every output so nothing is DCE'd.
        return sum(jnp.sum(o[:128].astype(jnp.float32)) for o in out) * 1e-9

    for block, window in ((1024, 512), (1024, 384), (1024, 448)):
        expand_mod.MAX_BLOCK = block
        expand_mod.WINDOW = window
        m = timed(f"emit kernel B={block} W={window}", scanned(kernel_body),
                  rows, incl)
        if m is not None:
            print(f"{'':44s} net {net(m):9.3f} ms", flush=True)
    expand_mod.MAX_BLOCK = 1024
    expand_mod.WINDOW = 512


if __name__ == "__main__":
    main()

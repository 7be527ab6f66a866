#!/usr/bin/env python
"""Round-3 emit-stage (buildTileList) breakdown on the real TPU.

Splits the stage into its XLA pre-pass (projection-derived row build,
per-row pack math, limb split, cumsum, block-start searchsorted) and the
Pallas emit kernel proper, by timing build_tile_pairs end-to-end vs
emit_pairs alone on precomputed inputs.  Also re-tests WINDOW=512 under
the round-3 cross-block w0+w1 prefetch.

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

import cudagaussianrenderer_tpu.ops.expand as expand_mod
from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.models.camera import orbit_cameras
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs
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
    capacity = 4_182_016

    cfg = RenderConfig(screen_size=1024)
    clip = jax.jit(
        lambda s, c: project_splats(s.means, s.scales, s.quats, c, cfg)
    )(scene, cam)
    jax.block_until_ready(clip)

    base = timed("dispatch baseline", scanned(lambda s, x: jnp.sum(x) + s),
                 jnp.ones((8, 128), jnp.float32))

    def net(ms):
        return None if ms is None or base is None else ms - base

    # Whole stage (XLA prep + kernel), salted through a clip field.
    def stage_body(s, cl, sc):
        p = build_tile_pairs(
            cl._replace(cx=cl.cx + s * 1e-9), sc.colors, sc.opacities, cfg, capacity
        )
        return jnp.sum(p.keys[0][:128].astype(jnp.float32)) * 1e-9

    m = timed("build_tile_pairs (stage)", scanned(stage_body), clip, scene)
    if m is not None:
        print(f"{'':44s} net {net(m):9.3f} ms", flush=True)

    # Kernel only: precompute rows + incl once, salt a row the kernel
    # consumes (depth row — feeds the packed keys).
    from cudagaussianrenderer_tpu.ops.binning import splat_row_packs, splat_tile_rects
    from cudagaussianrenderer_tpu.ops.binning import quantize_depth, pack_rgb_u32

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

    def make_kernel_body(limbs):
        def kernel_body(s, rows, incl):
            r = (*rows[:2], rows[2] + s * 1e-9, *rows[3:])  # salt cx col
            out = expand_mod.emit_pairs(
                r, incl, capacity, cfg, unsafe_sel_limbs=limbs
            )
            return jnp.sum(out[0][:128].astype(jnp.float32)) * 1e-9

        return kernel_body

    for window, bps, limbs in (
        (512, 4, 3),
        (640, 4, 3),
        (512, 4, 2),   # TIMING PROBE: wrong payloads, measures MAC share
        (512, 4, 1),   # TIMING PROBE
    ):
        expand_mod.WINDOW = window
        expand_mod.BLOCKS_PER_STEP = bps
        m = timed(f"emit_pairs kernel only W={window} bps={bps} limbs={limbs}",
                  scanned(make_kernel_body(limbs)), rows, incl)
        if m is not None:
            print(f"{'':44s} net {net(m):9.3f} ms", flush=True)
    expand_mod.WINDOW = 512
    expand_mod.BLOCKS_PER_STEP = 4

    # XLA pre-pass pieces: everything in build_tile_pairs BEFORE the
    # kernel (row math, packing, cumsum, interleave, block starts).
    import cudagaussianrenderer_tpu.ops.binning as binning_mod

    real_emit = expand_mod.emit_pairs

    def prepass_only(cols, incl, cap, cfg, interpret=None):
        # Consume every column FULLY (a [0]-element read would let XLA
        # rewrite slice-of-elementwise and DCE the column math).  The 13
        # 1M-sums add ~0.1 ms of their own — small, noted.
        salt = sum(jnp.sum(c) for c in cols) + jnp.sum(incl).astype(
            jnp.float32
        )
        z = jnp.zeros((cap,), jnp.uint32) + salt.astype(jnp.uint32)
        return (z,) * 6

    def prepass_body(s, cl, sc):
        binning_mod_emit = expand_mod.emit_pairs
        try:
            expand_mod.emit_pairs = prepass_only
            p = build_tile_pairs(
                cl._replace(cx=cl.cx + s * 1e-9), sc.colors, sc.opacities,
                cfg, capacity,
            )
        finally:
            expand_mod.emit_pairs = binning_mod_emit
        return jnp.sum(p.keys[0][:128].astype(jnp.float32)) * 1e-9

    m = timed("build_tile_pairs minus kernel (stub)", scanned(prepass_body),
              clip, scene)
    if m is not None:
        print(f"{'':44s} net {net(m):9.3f} ms", flush=True)
    expand_mod.emit_pairs = real_emit


if __name__ == "__main__":
    main()

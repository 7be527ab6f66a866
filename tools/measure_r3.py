#!/usr/bin/env python
"""Round-3 measurement harness (run on the real TPU).

Questions this answers, at the post-exact-emission bench capacity
(4.59M slots):
  1. lax.sort marginal operand cost — what do 4- and 3-operand layouts
     buy over the current 5 (key + cxcy + ab + c|alpha + rgb)?
  2. does an int8 matmul lower in Mosaic, and how does an int8-limb
     one-hot selection compare to the bf16-triple select in the emit
     kernel's inner loop?
  3. raster chunk 64 vs 128 (scan cost ~chunk^2/pair vs DMA issue rate).

Method per docs/PERF_NOTES.md: device-side scan of 8 salted reps,
best-of-3, trivial-dispatch baseline subtracted where relevant, consume
one element of EVERY sort output operand (XLA DCEs unused payloads).
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

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
        print(f"{name:36s} {ms:9.3f} ms/rep  (compile {compile_s:5.1f}s)", flush=True)
        return ms
    except Exception as e:  # noqa
        print(f"{name:36s} FAILED: {type(e).__name__}: {str(e)[:200]}", flush=True)
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


def sort_experiments():
    cap = 4_587_520
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 31, cap, dtype=np.uint32))
    payloads = [
        jnp.asarray(rng.integers(0, 1 << 32, cap, dtype=np.uint32))
        for _ in range(5)
    ]

    base = timed("dispatch baseline", scanned(lambda s, x: jnp.sum(x) + s),
                 jnp.ones((8, 128), jnp.float32))

    for nops in (2, 3, 4, 5, 6):
        ops = payloads[: nops - 1]

        def body(s, k, *ps, _n=nops):
            out = jax.lax.sort(
                (k ^ s.astype(jnp.uint32), *ps), num_keys=1, is_stable=False
            )
            return sum(o[0].astype(jnp.float32) * 1e-9 for o in out)

        ms = timed(f"unstable sort {nops} ops @4.59M", scanned(body), key, *ops)
        if ms is not None and base is not None:
            print(f"{'':36s} net {ms - base:9.3f} ms", flush=True)


def int8_select_experiment():
    """Emit-kernel inner loop: one-hot selection of 14 rows x 1024 slots
    from 256-splat windows — bf16 triple-pass vs int8 limb passes."""
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    BLOCK, W, ROWS, NWIN = 1024, 256, 16, 64

    def kern_bf16(rows_ref, out_ref):
        def body(wi, acc):
            win = rows_ref[:, pl.ds(wi * W, W)]
            excl = win[0:1, :]
            incl = win[1:2, :]
            j = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0).astype(jnp.float32)
            match = ((excl <= j) & (j < incl)).astype(jnp.bfloat16)
            mask = jnp.uint32(0xFFFF0000)
            hi = pltpu.bitcast(pltpu.bitcast(win, jnp.uint32) & mask, jnp.float32)
            r1 = win - hi
            mid = pltpu.bitcast(pltpu.bitcast(r1, jnp.uint32) & mask, jnp.float32)
            lo = r1 - mid

            def sel(p):
                return jax.lax.dot_general(
                    p.astype(jnp.bfloat16), match, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            return acc + (sel(hi) + sel(mid)) + sel(lo)

        out_ref[:, :] = jax.lax.fori_loop(
            0, NWIN, body, jnp.zeros((ROWS, BLOCK), jnp.float32)
        )

    def kern_int8(rows_ref, out_ref):
        """3 int8 limb passes — TIMING ONLY: limbs cast to SIGNED int8,
        so bytes >= 128 go negative and the reconstruction is wrong;
        a production version would need a +128 bias correction."""
        def body(wi, acc):
            win = rows_ref[:, pl.ds(wi * W, W)]  # f32 carrying ints < 2^24
            excl = win[0:1, :]
            incl = win[1:2, :]
            j = jax.lax.broadcasted_iota(jnp.int32, (BLOCK, 1), 0).astype(jnp.float32)
            match = ((excl <= j) & (j < incl)).astype(jnp.int8)
            wi32 = win.astype(jnp.int32)
            l0 = (wi32 & 0xFF).astype(jnp.int8)
            l1 = ((wi32 >> 8) & 0xFF).astype(jnp.int8)
            l2 = ((wi32 >> 16) & 0xFF).astype(jnp.int8)

            def sel(p):
                return jax.lax.dot_general(
                    p, match, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )

            return acc + sel(l0) + (sel(l1) << 8) + (sel(l2) << 16)

        out_ref[:, :] = jax.lax.fori_loop(
            0, NWIN, body, jnp.zeros((ROWS, BLOCK), jnp.int32)
        )

    rng = np.random.default_rng(1)
    rows = jnp.asarray(
        rng.integers(0, 1 << 20, (ROWS, NWIN * W)).astype(np.float32)
    )

    for name, kern, odt in (("bf16 triple select", kern_bf16, jnp.float32),
                            ("int8 limb select", kern_int8, jnp.int32)):
        run = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((ROWS, BLOCK), odt),
            interpret=jax.default_backend() != "tpu",
        )

        def body(s, r):
            return jnp.sum(run(r + s).astype(jnp.float32)[:, :8]) * 1e-9

        timed(f"{name} {NWIN}win", scanned(body), rows)


def raster_chunk_experiment():
    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs
    from cudagaussianrenderer_tpu.ops.projection import project_splats
    from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
    from cudagaussianrenderer_tpu.ops.raster import (
        pack_pair_data, rasterize_tiles, tiles_to_image,
    )
    from cudagaussianrenderer_tpu.ops.sorting import sort_pairs

    scene = random_scene(
        1_000_000, seed=0, min_scale=0.002, max_scale=0.053, extent=4.0
    ).pad_to_multiple(256)
    cam = orbit_cameras(scene.bounds_min, scene.bounds_max, 8)[0].camera_data()
    cam = jax.tree.map(jnp.asarray, cam)
    capacity = 4_587_520

    cfg128 = RenderConfig(screen_size=1024, raster_chunk=128)
    clip = jax.jit(
        lambda s, c: project_splats(s.means, s.scales, s.quats, c, cfg128)
    )(scene, cam)
    pairs = jax.jit(
        lambda cl, s: build_tile_pairs(cl, s.colors, s.opacities, cfg128, capacity)
    )(clip, scene)
    skeys, _, sattrs = jax.jit(lambda p: sort_pairs(p))(pairs)
    starts, counts = jax.jit(lambda k: tile_ranges(k, cfg128))(skeys)
    jax.block_until_ready(sattrs)

    # raster_chunk must be a multiple of 128 (DMA lane alignment).
    for chunk in (128, 256):
        cfg = RenderConfig(screen_size=1024, raster_chunk=chunk)

        def body(s, a0, a1, a2, st, ct, _cfg=cfg, _ck=chunk):
            return jnp.sum(
                tiles_to_image(
                    rasterize_tiles(
                        pack_pair_data(
                            (a0, a1, a2 ^ s.astype(jnp.uint32)), _ck
                        ),
                        st, ct, _cfg,
                    ),
                    _cfg,
                )[::64, ::64, 0].astype(jnp.float32)
            )

        timed(f"raster chunk={chunk}", scanned(body), *sattrs, starts, counts)


def u16_experiment():
    """Does a u16 payload operand cost less than a u32 one?"""
    cap = 4_587_520
    rng = np.random.default_rng(0)
    key = jnp.asarray(rng.integers(0, 1 << 31, cap, dtype=np.uint32))
    p32 = [jnp.asarray(rng.integers(0, 1 << 32, cap, dtype=np.uint32)) for _ in range(3)]
    p16 = [jnp.asarray(rng.integers(0, 1 << 16, cap, dtype=np.uint16)) for _ in range(6)]

    base = timed("dispatch baseline", scanned(lambda s, x: jnp.sum(x) + s),
                 jnp.ones((8, 128), jnp.float32))

    cases = [
        ("key + 1xu32", p32[:1]),
        ("key + 2xu16", p16[:2]),
        ("key + 3xu32", p32[:3]),
        ("key + 6xu16", p16[:6]),
        ("key + 1xu32 + 4xu16", p32[:1] + p16[:4]),
    ]
    for name, ps in cases:
        def body(s, k, *args):
            out = jax.lax.sort(
                (k ^ s.astype(jnp.uint32), *args), num_keys=1, is_stable=False
            )
            return sum(o[0].astype(jnp.float32) * 1e-9 for o in out)

        ms = timed(name, scanned(body), key, *ps)
        if ms is not None and base is not None:
            print(f"{'':36s} net {ms - base:9.3f} ms", flush=True)


if __name__ == "__main__":
    print("backend:", jax.default_backend(), flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("u16",):
        u16_experiment()
    if which in ("all", "sort"):
        sort_experiments()
    if which in ("all", "int8"):
        int8_select_experiment()
    if which in ("all", "raster"):
        raster_chunk_experiment()

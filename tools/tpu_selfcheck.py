#!/usr/bin/env python
"""On-TPU compiled-numerics parity check.

The CPU test suite runs the Pallas kernels in interpreter mode; this is
the one command to run on a real chip to catch compiled-path drift
(bf16-triple splits, pltpu.roll/matmul scans, DMA alignment masking):

    python tools/tpu_selfcheck.py

Renders small procedural scenes with the COMPILED kernels on the default
backend and asserts the same golden-oracle tolerances the CPU suite uses
(tests/test_pipeline.py).  Exits 0 on pass, 1 on drift.
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np
import jax

try:
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
except Exception:
    pass

from cudagaussianrenderer_tpu.config import RenderConfig
from cudagaussianrenderer_tpu.golden import golden_render, scene_to_numpy
from cudagaussianrenderer_tpu.models.camera import Camera
from cudagaussianrenderer_tpu.models.scene import random_scene
from cudagaussianrenderer_tpu.render import render_frame

FAILURES = []


def check(name, got, want, *, pix_tol=8, frac=0.02):
    diff = np.abs(got.astype(np.int32) - want.astype(np.int32))
    bad = float((diff > pix_tol).any(axis=-1).mean())
    status = "ok" if bad <= frac else "DRIFT"
    print(f"{name:42s} bad_px={bad:.4f} max_diff={int(diff.max()):3d}  {status}")
    if bad > frac:
        FAILURES.append(name)


def main():
    backend = jax.default_backend()
    print(f"backend: {backend} (compiled kernels: {backend == 'tpu'})")
    if backend != "tpu":
        print("WARNING: not a TPU backend — this checks interpret mode only")

    cases = [
        ("gaussian 128px", dict(n=500, seed=2, cfg=dict(screen_size=128))),
        ("epanechnikov 128px", dict(n=500, seed=2, cfg=dict(screen_size=128, falloff="epanechnikov"))),
        ("sh-degree-3 128px", dict(n=300, seed=8, sh=3, cfg=dict(screen_size=128))),
        ("rect 192x128", dict(n=400, seed=6, cfg=dict(screen_size=192, screen_height=128))),
        # Tall/wide splats (rect h > 8 rows or w > 63 tiles at 1024px):
        # exercises the emit kernel's full-rect fallthrough division,
        # where TPU's reciprocal-multiply f32 divide needs the one-step
        # quotient correction (wrong-tile emission without it).
        ("huge splats 1024px", dict(
            n=192, seed=9,
            scene_kw=dict(min_scale=0.3, max_scale=1.6, extent=3.0),
            cfg=dict(screen_size=1024), capacity=524288,
        )),
        # Two-operand lexicographic (tile, depth24<<8) sort keys — the
        # path big screens (> 8191 tiles) auto-select; the small screen
        # keeps the golden render cheap.
        ("lex keys (depth_bits=32)", dict(
            n=400, seed=2, cfg=dict(screen_size=128, depth_bits=32),
        )),
        # Band-segmented sort: MXU band compaction + banded emit walk,
        # batched per-band sort, band-offset range starts.  The
        # huge-splat scales also push rects across band boundaries
        # (band-clamped run walk).  ccap avoids compact saturation
        # (pads cluster in one band at these scales).
        ("banded G=8 128px", dict(
            n=500, seed=2, cfg=dict(screen_size=128, sort_bands=8),
            ccap=8 * 1024,
        )),
        ("banded G=16 huge 1024px", dict(
            n=192, seed=9,
            scene_kw=dict(min_scale=0.3, max_scale=1.6, extent=3.0),
            cfg=dict(screen_size=1024, sort_bands=16), capacity=1048576,
            ccap=16 * 1024,
        )),
        # PRODUCTION interleave path: a splat count that is an exact
        # PREP_BLK (4096) multiple takes the no-jnp.pad fast path —
        # prefix rows derived in-kernel (pltpu.roll + SMEM carry across
        # the sequential grid) and the trailing zero block providing
        # the window-overrun pad.  CPU tests cover it in interpret mode
        # only; this is the compiled-kernel gate (the production
        # Renderer/bench scenes all run this path).
        ("prod no-pad interleave 4096", dict(
            n=500, seed=5, pad=4096, cfg=dict(screen_size=128),
            capacity=16384,
        )),
        # Tightened-margin guard for the 1-limb transmittance scan
        # (raster.SCAN_LIMBS=1 rounds log(1-alpha) to one bf16 limb,
        # measured worst-case 4 output LSBs): a dedicated scene at
        # pix_tol=5 so numerics drift stacked on the reduced margin
        # fails HERE before it eats the suite-wide pix_tol=8 budget.
        ("scan-limb margin 128px", dict(
            n=350, seed=4, cfg=dict(screen_size=128), pix_tol=5,
        )),
    ]
    for name, c in cases:
        config = RenderConfig(**c["cfg"])
        scene = random_scene(
            c["n"], seed=c["seed"], sh_degree=c.get("sh", 0), **c.get("scene_kw", {})
        ).pad_to_multiple(c.get("pad", 256))
        cam = Camera(aspect=config.aspect).framed(scene.bounds_min, scene.bounds_max)
        capacity = c.get("capacity", 16384)
        ccap = c.get("ccap", 0)
        got, aux = jax.jit(
            lambda s, cd, cfg=config, cap=capacity, cc=ccap: render_frame(
                s, cd, cfg, cap, compact_capacity=cc
            )
        )(scene, cam.camera_data())
        got = np.asarray(got)
        assert int(aux["num_candidates"]) <= capacity, (
            name, int(aux["num_candidates"]), "saturated — raise case capacity")
        if "band_totals" in aux:
            g = config.sort_bands
            assert int(np.asarray(aux["band_totals"]).max()) <= capacity // g, (
                name, "a band saturated — raise case capacity")
            assert int(np.asarray(aux["band_splats"]).max()) <= ccap // g, (
                name, "band compaction saturated — raise case ccap")
        want = golden_render(scene_to_numpy(scene), cam.camera_data(), config)
        check(name, got, want, pix_tol=c.get("pix_tol", 8))

    # Balanced multi-chip bands on compiled kernels: render each of two
    # balanced bands with the exact per-device program (traced band
    # boundaries through the emit/raster kernels, masked out-of-band
    # tiles, band placement) and compare the assembled frame to the
    # golden oracle.  This is the single-chip hardware gate for
    # config.balanced_bands (parallel.distributed.render_band).
    from cudagaussianrenderer_tpu.parallel.distributed import render_band

    config = RenderConfig(screen_size=128)
    scene = random_scene(500, seed=2).pad_to_multiple(256)
    cam = Camera(aspect=config.aspect).framed(scene.bounds_min, scene.bounds_max)
    n_dev = 2
    fn = jax.jit(render_band, static_argnums=(2, 3, 4, 5))
    total = np.zeros((config.screen_h, config.screen_w, 4), np.int32)
    for d in range(n_dev):
        full, _ = fn(scene, cam.camera_data(), config, 16384, n_dev, d)
        total += np.asarray(full).astype(np.int32)
    want = golden_render(scene_to_numpy(scene), cam.camera_data(), config)
    check("balanced bands 2-dev 128px", total.astype(np.uint8), want)

    if FAILURES:
        print(f"FAILED: {FAILURES}")
        return 1
    print("PASS: compiled numerics match the golden oracle")
    return 0


if __name__ == "__main__":
    sys.exit(main())

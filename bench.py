#!/usr/bin/env python
"""Benchmark driver — renders the headline workload and prints JSON lines.

Workload: the BASELINE.json north star — a ~1M-splat procedural scene at
1024x1024, orbit fly-through with per-frame re-sort, on one TPU chip.  The
procedural scale range is tuned so the exact-test pair density matches the
reference's heaviest published scene (Lilly Boquet runs ~4 sorted pairs
per splat; see vs_baseline below), giving >= 3.9M pairs/frame at 1M splats
versus ~3.3M for the count-scaled reference.

Method: frames-per-second of the fused device pipeline (project -> bin ->
sort -> ranges -> raster), amortized over a device-side scan of the
orbit cameras so host/tunnel dispatch latency is excluded — mirroring how the
reference reports CUDA-kernel-only times (README.md:142).  Inputs are
salted per repetition (the remote runtime memoizes identical executions).

vs_baseline is sorted-pairs-per-second relative to the reference's Lilly
Boquet run: 815,957 splats at ~4 pairs/splat in 12.502574 ms on an RTX
3050 laptop (README.md:146,153) = 261.1M pairs/s.  Pair throughput is the
honest unit — total time scales with tile-list length (README.md:125),
not splat count.

Driver-survivability design (the driver runs this through a sometimes
slow remote tunnel, under a timeout, and parses the LAST JSON line):

  * The persistent compilation cache lives INSIDE the repo checkout
    (``.jaxcache/`` next to this file, committed to git) and is
    pre-warmed on hardware each round — a cold tunnel window otherwise
    costs minutes PER COMPILE (a trivial jit was measured at 578 s
    through a bad window) and this script needs ~10 programs.
  * The headline JSON line is printed and flushed IMMEDIATELY after the
    fused-frame timing; the per-stage breakdown (reference stage names,
    Demo.cpp:556-562) is measured afterwards and printed as a new,
    enriched final JSON line.  If the stage phase crashes or exceeds
    the budget, the plain headline line is re-printed last and the
    script exits 0 — the driver always sees a parseable result.
  * A wall-clock budget (``BENCH_BUDGET_S``, default 900 s) gates each
    phase: past ~40% spent before the capacity probe, the probe is
    skipped for a deterministic fallback capacity (pre-warmed too);
    past ~75%, the stage tables are skipped.
  * Timestamped progress goes to stderr so an rc != 0 is attributable.

``--devices N`` benchmarks the tile-row-sharded multi-chip pipeline on an
N-device mesh instead (requires N attached devices).
"""

import argparse
import json
import os
import sys
import time

import numpy as np

T_START = time.monotonic()


def _log(msg):
    print(f"[bench +{time.monotonic() - T_START:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _timed_ms(fn, args, reps=8, iters=3):
    """Best-of-``iters`` of a jitted fn(salt, *args) scanning `reps`
    salted bodies."""
    import jax
    import jax.numpy as jnp

    def wrapper(salt, *a):
        def step(c, s):
            return c + fn(s, *a), 0

        c, _ = jax.lax.scan(
            step, jnp.float32(0.0), salt + jnp.arange(reps, dtype=jnp.float32)
        )
        return c

    jfn = jax.jit(wrapper)
    np.asarray(jfn(jnp.float32(0.0), *args))  # compile + warm
    best = float("inf")
    for it in range(1, iters + 1):
        t0 = time.perf_counter()
        np.asarray(jfn(jnp.float32(it), *args))
        best = min(best, time.perf_counter() - t0)
    return best * 1e3 / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n_splats", nargs="?", type=int, default=1_000_000)
    # 32 frames amortize the ~31 ms tunnel dispatch to ~1 ms/frame —
    # closer to the reference's dispatch-free CUDA-kernel-only timing.
    ap.add_argument("frames", nargs="?", type=int, default=32)
    ap.add_argument("--devices", type=int, default=1)
    # Headline is 1024; smaller sizes exist for CPU smoke-testing the
    # whole driver script end-to-end (interpret-mode kernels).
    ap.add_argument("--size", type=int, default=1024)
    # The reference also publishes an Epanechnikov-falloff figure
    # (README.md:133-136: 10.30 ms gaussian vs 8.84 ms epanechnikov).
    ap.add_argument("--falloff", choices=["gaussian", "epanechnikov"], default="gaussian")
    ap.add_argument("--stages", action="store_true", default=True)
    ap.add_argument("--no-stages", dest="stages", action="store_false")
    # Testing hook: force the no-probe fallback capacity path so the
    # pre-warm run can populate its compile cache entries too.
    ap.add_argument("--force-fallback-capacity", action="store_true")
    args = ap.parse_args()

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "900"))

    def over_budget(frac):
        return time.monotonic() - T_START > budget_s * frac

    # The axon tunnel's failure mode changed from a fast RuntimeError
    # (BENCH_r03.json) to an indefinite hang at backend init; bound it so
    # the driver gets a clean non-zero exit instead of a stalled process.
    import signal

    def _init_timeout(signum, frame):
        raise SystemExit(
            "bench: backend init exceeded its budget (axon tunnel down?) — aborting"
        )

    signal.signal(signal.SIGALRM, _init_timeout)
    signal.alarm(max(60, int(budget_s * 0.6)))

    import jax

    # Persistent compilation cache, inside the repo checkout (shared
    # with — and pre-warmed for — the driver's run; /tmp proved not to
    # be shared between builder and driver environments in round 4).
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jaxcache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception as e:  # harmless if unsupported
        _log(f"compile cache unavailable: {e}")

    _log("initializing backend...")
    jax.devices()  # force backend init under the alarm
    signal.alarm(0)
    _log(f"backend up: {jax.default_backend()} x{jax.device_count()}")

    import jax.numpy as jnp

    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import render_frame

    # max_scale 0.053 yields ~4.07 exact pairs/splat on the orbit cameras
    # — matched to the reference's Lilly Boquet density (~4 pairs/splat).
    scene = random_scene(
        args.n_splats, seed=0, min_scale=0.002, max_scale=0.053, extent=4.0
    ).pad_to_multiple(4096 * args.devices)
    config = RenderConfig(screen_size=args.size, falloff=args.falloff)
    cams = orbit_cameras(scene.bounds_min, scene.bounds_max, args.frames)
    cam_stack = jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[c.camera_data() for c in cams],
    )
    cam0 = jax.tree.map(lambda x: x[0], cam_stack)

    if args.devices > 1:
        from cudagaussianrenderer_tpu.parallel.distributed import (
            make_mesh,
            render_frame_sharded,
        )

        mesh = make_mesh(args.devices)

        def frame(scene, cam, capacity):
            return render_frame_sharded(scene, cam, config, capacity, mesh)

    else:
        frame = lambda scene, cam, capacity: render_frame(  # noqa: E731
            scene, cam, config, capacity
        )

    # Size capacity like the adaptive Renderer would: probe the orbit's
    # candidate count at EVERY camera (one scanned dispatch) and take the
    # max, so the static headroom can stay tight (every post-binning
    # stage costs O(capacity); the probe covers the exact frame set, so
    # 0.5% headroom + 1024-slot rounding suffices — the salt perturbs
    # views by 1e-6, moving rect boundaries by ~1e-5 px).
    grain = 4096  # whole emit grid steps: odd block counts degrade bps to 1
    if args.force_fallback_capacity or over_budget(0.4):
        # Deterministic no-probe fallback: 4.6 pairs/splat covers the
        # procedural workload's measured ~3.93 peak with headroom.  Must
        # stay deterministic so its compiled program is pre-warmable.
        capacity = -(-int(args.n_splats * 4.6) // grain) * grain
        _log(f"capacity probe skipped (budget/forced): fallback capacity={capacity}")
    else:
        from cudagaussianrenderer_tpu.ops.binning import (
            splat_row_packs,
            splat_tile_rects,
        )
        from cudagaussianrenderer_tpu.ops.projection import project_splats

        def count_candidates(s, cam_stack):
            def step(carry, c):
                clip = project_splats(
                    s.means, s.scales, s.quats, c, config, opacities=s.opacities
                )
                rects = splat_tile_rects(clip, config)
                n = jnp.sum(splat_row_packs(clip, rects, config).counts)
                return jnp.maximum(carry, n), 0

            m, _ = jax.lax.scan(step, jnp.int32(0), cam_stack)
            return m

        _log("probing orbit candidate counts (1 scanned dispatch)...")
        candidates = int(np.asarray(jax.jit(count_candidates)(scene, cam_stack)))
        capacity = max(1 << 17, -(-int(candidates * 1.005) // grain) * grain)
        _log(f"probe: max candidates {candidates} -> capacity {capacity}")
    if args.devices > 1:
        # Per-device capacity for tile-row bands: global/devices with 2x
        # skew headroom (center bands carry more pairs than the mean).
        capacity = max(grain, -(-capacity * 2 // args.devices // grain) * grain)

    # ---- headline: fused whole-frame throughput over the orbit ----
    def frames_body(salt, scene, cam_stack):
        # Salt the view translation: every pipeline stage depends on it.
        view = cam_stack["view"].at[:, 0, 3].add(salt * 1e-6)
        cam_stack = dict(cam_stack, view=view)

        def step(acc, cam):
            img, aux = frame(scene, cam, capacity)
            # num_candidates is the saturation signal on every path: the
            # global exact count single-chip, the pmax'd per-device
            # in-band count sharded (so a saturated band is visible).
            stats = (aux["num_pairs"], aux["num_candidates"])
            acc = acc + jnp.sum(img[::64, ::64, 0].astype(jnp.float32))
            return acc, stats

        c, stats = jax.lax.scan(step, jnp.float32(0.0), cam_stack)
        return c, stats

    _log("compiling + warming the fused frame scan...")
    jfn = jax.jit(frames_body)
    out = jfn(jnp.float32(0.0), scene, cam_stack)
    np.asarray(out[0])
    _log("timing the fused frame scan (3 reps)...")
    best = float("inf")
    for it in range(1, 4):
        t0 = time.perf_counter()
        out = jfn(jnp.float32(it), scene, cam_stack)
        np.asarray(out[0])
        best = min(best, time.perf_counter() - t0)
    ms_per_frame = best * 1e3 / args.frames
    fps = 1e3 / ms_per_frame
    pairs = np.asarray(out[1][0])
    cands = np.asarray(out[1][1])
    pairs_per_frame = int(pairs.mean())
    if int(cands.max()) > capacity:
        per_dev = " per-device" if args.devices > 1 else ""
        _log(
            f"WARNING: pair list saturated (max{per_dev} candidates "
            f"{int(cands.max())} > capacity {capacity}); a frame rendered truncated"
        )

    # Reference pair throughput: Lilly Boquet, 815,957 splats * ~4
    # pairs/splat / 12.502574 ms (reference README.md:146,153).
    ref_pairs_per_sec = 815_957 * 4.0 / 12.502574e-3
    pairs_per_sec = pairs_per_frame * fps
    result = {
        "metric": f"fps_{args.size}x{args.size}_{args.n_splats // 1000}k_splats",
        "value": round(fps, 2),
        "unit": "frames/s",
        # >1 means higher sorted-pair throughput than the reference.
        "vs_baseline": round(pairs_per_sec / ref_pairs_per_sec, 3),
        "ms_per_frame": round(ms_per_frame, 2),
        "pairs_per_frame": pairs_per_frame,
        "pairs_per_sec_M": round(pairs_per_sec / 1e6, 1),
        "capacity": capacity,
        "devices": args.devices,
    }
    # Headline out FIRST — the driver must see a number even if the
    # stage tables below blow the window.
    print(json.dumps(result), flush=True)
    _log(f"headline: {result['value']} FPS ({result['ms_per_frame']} ms/frame)")

    # ---- per-stage breakdown (reference stage names) ----
    if not (args.stages and args.devices == 1):
        return
    if over_budget(0.75):
        _log("stage tables skipped: wall-clock budget spent")
        return
    try:
        stages = {}
        from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs
        from cudagaussianrenderer_tpu.ops.projection import project_splats
        from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
        from cudagaussianrenderer_tpu.ops.raster import (
            pack_pair_data,
            rasterize_tiles,
            tiles_to_image,
        )

        _log("stage tables: dispatch baseline...")
        # Best-of-6: an overestimated baseline floors small stage rows
        # to a suspicious-looking 0.0 in noisy tunnel windows.
        base = _timed_ms(
            lambda s, x: jnp.sum(x) + s,
            (jnp.ones((8, 128), jnp.float32),),
            iters=6,
        )

        clip = jax.jit(
            lambda s, c: project_splats(
                s.means, s.scales, s.quats, c, config, opacities=s.opacities
            )
        )(scene, cam0)

        def build_fn(cl, s):
            return build_tile_pairs(cl, s.colors, s.opacities, config, capacity)

        from cudagaussianrenderer_tpu.ops.sorting import sort_pairs

        pairs = jax.jit(build_fn)(clip, scene)
        skeys, _, sattrs = jax.jit(sort_pairs)(pairs)
        starts, counts = jax.jit(lambda k: tile_ranges(k, config))(skeys)
        pair_data = jax.jit(lambda a: pack_pair_data(a, config.raster_chunk))(sattrs)
        jax.block_until_ready(pair_data)

        def net(ms):
            return max(0.0, round(ms - base, 3))

        _log("stage tables: evaluateClipData...")
        stages["evaluateClipData"] = net(
            _timed_ms(
                # Consume EVERY output field — summing one field lets XLA
                # DCE the eigen/conic math and times a partial stage.
                lambda s, sc, c: sum(
                    jnp.sum(f[:128])
                    for f in project_splats(
                        sc.means, sc.scales, sc.quats,
                        dict(c, view=c["view"].at[0, 3].add(s * 1e-6)), config,
                        opacities=sc.opacities,
                    )
                ),
                (scene, cam0),
            )
        )
        _log("stage tables: buildTileList...")
        stages["buildTileList"] = net(
            _timed_ms(
                lambda s, cl, sc: jnp.sum(
                    build_fn(
                        cl._replace(cx=cl.cx + s * 1e-9), sc
                    ).keys[0][:128].astype(jnp.float32)
                ),
                (clip, scene),
            )
        )
        _log("stage tables: sortTileList...")
        key0 = pairs.keys[0]
        stages["sortTileList"] = net(
            _timed_ms(
                lambda s, k, *a: sum(
                    o[0].astype(jnp.float32) * 1e-9
                    for o in jax.lax.sort(
                        (k ^ s.astype(jnp.uint32), *a), num_keys=1, is_stable=False
                    )
                ),
                (key0, *pairs.attrs),
            )
        )
        _log("stage tables: evaluateTileRanges...")
        stages["evaluateTileRanges"] = net(
            _timed_ms(
                lambda s, k: jnp.sum(
                    tile_ranges((k | s.astype(jnp.uint32),), config)[0][:128].astype(
                        jnp.float32
                    )
                ),
                (skeys[0],),
            )
        )
        _log("stage tables: renderDepthBuffer...")
        stages["renderDepthBuffer"] = net(
            _timed_ms(
                lambda s, a0, a1, a2, st, ct: jnp.sum(
                    tiles_to_image(
                        rasterize_tiles(
                            pack_pair_data(
                                (a0, a1, a2 ^ s.astype(jnp.uint32)),
                                config.raster_chunk,
                            ),
                            st, ct, config,
                        ),
                        config,
                    )[::64, ::64, 0].astype(jnp.float32)
                ),
                (*sattrs, starts, counts),
            )
        )
        result["stages_ms"] = stages
    except Exception as e:
        _log(f"stage tables failed ({type(e).__name__}: {e}); re-printing headline")
    # Final line: enriched if the stage phase succeeded, plain otherwise.
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()

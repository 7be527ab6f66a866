#!/usr/bin/env python
"""Benchmark driver — renders the headline workload and prints ONE JSON line.

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

The JSON line also carries per-stage milliseconds (reference stage names,
Demo.cpp:556-562), each measured as its own scan-amortized jit with
per-repetition salting, so stage regressions are visible to the driver.

``--devices N`` benchmarks the tile-row-sharded multi-chip pipeline on an
N-device mesh instead (requires N attached devices).
"""

import argparse
import json
import sys
import time

import numpy as np


def _timed_ms(fn, args, reps=8):
    """Best-of-3 of a jitted fn(salt, *args) scanning `reps` salted bodies."""
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
    for it in range(1, 4):
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
    # Band-segmented sort (config.sort_bands): batched [G, C/G] stage-D
    # sort with equal-count boundaries carried through the frame scan.
    ap.add_argument("--bands", type=int, default=0)
    # The reference also publishes an Epanechnikov-falloff figure
    # (README.md:133-136: 10.30 ms gaussian vs 8.84 ms epanechnikov).
    ap.add_argument("--falloff", choices=["gaussian", "epanechnikov"], default="gaussian")
    ap.add_argument("--stages", action="store_true", default=True)
    ap.add_argument("--no-stages", dest="stages", action="store_false")
    args = ap.parse_args()

    # The axon tunnel's failure mode changed from a fast RuntimeError
    # (BENCH_r03.json) to an indefinite hang at backend init; bound it so
    # the driver gets a clean non-zero exit instead of a stalled process.
    import signal

    def _init_timeout(signum, frame):
        raise SystemExit(
            "bench: backend init exceeded 900 s (axon tunnel down?) — aborting"
        )

    signal.signal(signal.SIGALRM, _init_timeout)
    signal.alarm(900)

    import jax
    import jax.numpy as jnp

    jax.devices()  # force backend init under the alarm
    signal.alarm(0)

    # Persistent compilation cache: the fused-frame program costs ~10+
    # minutes to compile through the tunnel; cache hits make re-runs
    # start in seconds.  Harmless if unsupported.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    except Exception:
        pass

    from cudagaussianrenderer_tpu.config import RenderConfig
    from cudagaussianrenderer_tpu.models.camera import orbit_cameras
    from cudagaussianrenderer_tpu.models.scene import random_scene
    from cudagaussianrenderer_tpu.render import render_frame

    # max_scale 0.053 yields ~4.07 exact pairs/splat on the orbit cameras
    # — matched to the reference's Lilly Boquet density (~4 pairs/splat).
    scene = random_scene(
        args.n_splats, seed=0, min_scale=0.002, max_scale=0.053, extent=4.0
    ).pad_to_multiple(256 * args.devices)
    config = RenderConfig(
        screen_size=args.size, falloff=args.falloff, sort_bands=args.bands
    )
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

        if args.bands > 1:
            raise SystemExit("--bands is single-device only (use --devices 1)")
        mesh = make_mesh(args.devices)

        def frame(scene, cam, capacity, band_rows=None):
            return render_frame_sharded(scene, cam, config, capacity, mesh)

    else:
        frame = lambda scene, cam, capacity, band_rows=None: render_frame(  # noqa: E731
            scene, cam, config, capacity,
            band_rows=band_rows, compact_capacity=compact_capacity,
        )

    # Size capacity like the adaptive Renderer would: probe the orbit's
    # candidate count at EVERY camera and take the max, so the static
    # headroom can stay tight (every post-binning stage costs
    # O(capacity); the probe covers the exact frame set, so 2% headroom
    # + 1024-slot rounding suffices — the salt perturbs views by 1e-6).
    # The probe runs only binning phase 1 (counts), not the full
    # pipeline — a trivial compile, one dispatch per camera.
    from cudagaussianrenderer_tpu.ops.binning import (
        splat_row_packs,
        splat_tile_rects,
    )
    from cudagaussianrenderer_tpu.ops.projection import project_splats

    def count_candidates(s, c):
        clip = project_splats(
            s.means, s.scales, s.quats, c, config, opacities=s.opacities
        )
        rects = splat_tile_rects(clip, config)
        return jnp.sum(splat_row_packs(clip, rects, config).counts)

    probe = jax.jit(count_candidates)
    candidates = max(
        int(np.asarray(probe(scene, jax.tree.map(lambda x: x[i], cam_stack))))
        for i in range(args.frames)
    )
    # The probe is exact for the very frame set rendered; the only drift
    # is the 1e-6 view salt, which moves rect boundaries by ~1e-5 px.
    # 0.5% headroom + 1024-slot rounding covers it (the saturation
    # warning below would catch a miss).
    grain = 1024 * max(1, args.bands)  # emit-kernel block granularity
    capacity = max(1 << 17, -(-int(candidates * 1.005) // grain) * grain)
    # (--bands overrides this below from the simulated per-band maxima.)
    if args.devices > 1:
        # Per-device capacity for tile-row bands: global/devices with 2x
        # skew headroom (center bands carry more pairs than the mean).
        capacity = max(grain, -(-capacity * 2 // args.devices // grain) * grain)

    # Band-segmented sort: the in-frame MXU band compaction keeps the
    # emission dense for every camera (no splat re-order needed); carry
    # the equal-count boundaries through the frame scan.
    compact_capacity = 0
    if args.bands > 1:
        from cudagaussianrenderer_tpu.ops.binning import band_counts
        from cudagaussianrenderer_tpu.render import (
            rebalance_band_rows,
            uniform_band_rows,
        )

        # Simulate the equal-count boundary controller over the orbit
        # with the cheap phase-1 probe (two passes: converge, then
        # record), so the timed scan starts from converged boundaries
        # and capacity sizes to the SIMULATED per-band maximum instead
        # of a blind skew guess (frame-0 uniform-row imbalance can be
        # 2-3x the mean and would saturate a 12%-headroom capacity).
        def band_stats(s, c, br):
            clip = project_splats(
                s.means, s.scales, s.quats, c, config, opacities=s.opacities
            )
            rects = splat_tile_rects(clip, config)
            packs = splat_row_packs(clip, rects, config)
            cb = band_counts(rects, packs, br)
            return (
                jnp.sum(cb, axis=1),
                jnp.max(jnp.sum((cb > 0).astype(jnp.int32), axis=1)),
            )

        sprobe = jax.jit(band_stats)
        rebalance = jax.jit(
            lambda r, t: rebalance_band_rows(r, t, config.tiles_y)
        )
        rows = jnp.asarray(uniform_band_rows(config))
        max_band_pairs = 0
        max_band_splats = 0
        for it in range(2 * args.frames):
            i = it % args.frames
            totals, msplat = sprobe(
                scene, jax.tree.map(lambda x: x[i], cam_stack), rows
            )
            if it >= args.frames:  # second (converged) pass
                max_band_pairs = max(max_band_pairs, int(np.asarray(totals).max()))
                max_band_splats = max(max_band_splats, int(msplat))
            rows = rebalance(rows, totals)
        band_rows0 = rows
        capacity = -(-int(max_band_pairs * 1.08) * args.bands // grain) * grain
        grain_c = 1024 * args.bands
        compact_capacity = -(-int(max_band_splats * 1.25) * args.bands // grain_c) * grain_c

    # ---- headline: fused whole-frame throughput over the orbit ----
    def frames_body(salt, scene, cam_stack):
        # Salt the view translation: every pipeline stage depends on it.
        view = cam_stack["view"].at[:, 0, 3].add(salt * 1e-6)
        cam_stack = dict(cam_stack, view=view)

        def step(carry, cam):
            acc, band_rows = carry
            img, aux = frame(scene, cam, capacity, band_rows)
            # num_candidates is the saturation signal on every path: the
            # global exact count single-chip, the pmax'd per-device
            # in-band count sharded (so a saturated band is visible).
            if args.bands > 1:
                band_rows = rebalance_band_rows(
                    band_rows, aux["band_totals"], config.tiles_y
                )
                sat = jnp.max(aux["band_totals"]) * args.bands
                csat = jnp.max(aux["band_splats"]) * args.bands
            else:
                sat = aux["num_candidates"]
                csat = jnp.int32(0)
            stats = (aux["num_pairs"], sat, csat)
            acc = acc + jnp.sum(img[::64, ::64, 0].astype(jnp.float32))
            return (acc, band_rows), stats

        init = (jnp.float32(0.0), band_rows0 if args.bands > 1 else None)
        (c, _), stats = jax.lax.scan(step, init, cam_stack)
        return c, stats

    jfn = jax.jit(frames_body)
    out = jfn(jnp.float32(0.0), scene, cam_stack)
    np.asarray(out[0])
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
        print(
            f"WARNING: pair list saturated (max{per_dev} candidates "
            f"{int(cands.max())} > capacity {capacity}); a frame rendered "
            "truncated",
            file=sys.stderr,
        )
    if args.bands > 1 and int(np.asarray(out[1][2]).max()) > compact_capacity:
        print(
            f"WARNING: band compaction saturated (max per-band splats x G "
            f"{int(np.asarray(out[1][2]).max())} > compact capacity "
            f"{compact_capacity}); a frame dropped trailing splats",
            file=sys.stderr,
        )

    # ---- per-stage breakdown (reference stage names) ----
    stages = {}
    if args.stages and args.devices == 1:
        from cudagaussianrenderer_tpu.ops.binning import build_tile_pairs
        from cudagaussianrenderer_tpu.ops.projection import project_splats
        from cudagaussianrenderer_tpu.ops.ranges import tile_ranges
        from cudagaussianrenderer_tpu.ops.raster import (
            pack_pair_data,
            rasterize_tiles,
            tiles_to_image,
        )
        from cudagaussianrenderer_tpu.ops.sorting import sort_pairs

        base = _timed_ms(lambda s, x: jnp.sum(x) + s, (jnp.ones((8, 128), jnp.float32),))

        clip = jax.jit(
            lambda s, c: project_splats(
                s.means, s.scales, s.quats, c, config, opacities=s.opacities
            )
        )(scene, cam0)
        if args.bands > 1:
            from cudagaussianrenderer_tpu.ops.binning import (
                build_tile_pairs_banded,
            )
            from cudagaussianrenderer_tpu.ops.sorting import sort_pairs_banded
            from cudagaussianrenderer_tpu.render import uniform_band_rows

            band_rows = jnp.asarray(uniform_band_rows(config))
            # One rebalance pass so the stage table reflects the scan's
            # steady-state band balance.
            _, totals0, _ = jax.jit(
                lambda cl, s, br: build_tile_pairs_banded(
                    cl, s.colors, s.opacities, config, capacity, br
                )
            )(clip, scene, band_rows)
            from cudagaussianrenderer_tpu.render import rebalance_band_rows

            band_rows = jax.jit(
                lambda br, t: rebalance_band_rows(br, t, config.tiles_y)
            )(band_rows, totals0)

            def build_fn(cl, s):
                return build_tile_pairs_banded(
                    cl, s.colors, s.opacities, config, capacity, band_rows,
                    compact_capacity=compact_capacity,
                )[0]

            sort_fn = lambda p: sort_pairs_banded(p, args.bands)  # noqa: E731
            ranges_fn = lambda k: tile_ranges(  # noqa: E731
                k, config, band_rows=band_rows,
                band_capacity=capacity // args.bands,
            )
        else:
            build_fn = lambda cl, s: build_tile_pairs(  # noqa: E731
                cl, s.colors, s.opacities, config, capacity
            )
            sort_fn = sort_pairs
            ranges_fn = lambda k: tile_ranges(k, config)  # noqa: E731

        pairs = jax.jit(build_fn)(clip, scene)
        skeys, _, sattrs = jax.jit(lambda p: sort_fn(p))(pairs)
        starts, counts = jax.jit(lambda k: ranges_fn(k))(skeys)
        pair_data = jax.jit(lambda a: pack_pair_data(a, config.raster_chunk))(sattrs)
        jax.block_until_ready(pair_data)

        def net(ms):
            return max(0.0, round(ms - base, 3))

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
        key0 = pairs.keys[0]
        if args.bands > 1:
            seg = capacity // args.bands
            stages["sortTileList"] = net(
                _timed_ms(
                    lambda s, k, *a: sum(
                        o[0, 0].astype(jnp.float32) * 1e-9
                        for o in jax.lax.sort(
                            tuple(
                                x.reshape(args.bands, seg)
                                for x in (k ^ s.astype(jnp.uint32), *a)
                            ),
                            dimension=1, num_keys=1, is_stable=False,
                        )
                    ),
                    (key0, *pairs.attrs),
                )
            )
        else:
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
        stages["evaluateTileRanges"] = net(
            _timed_ms(
                lambda s, k: jnp.sum(
                    ranges_fn((k | s.astype(jnp.uint32),))[0][:128].astype(
                        jnp.float32
                    )
                ),
                (skeys[0],),
            )
        )
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
        "stages_ms": stages,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

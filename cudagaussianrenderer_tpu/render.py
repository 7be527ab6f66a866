"""Frame pipeline orchestration.

The reference drives six CUDA kernel stages from a host frame loop with
constant-struct uploads, two memsets, counter resets, a device->host
counter readback and per-stage synchronizing timers between them
(Demo.cpp:394-479; see SURVEY.md §3.2).  On TPU the whole frame is ONE
jitted computation — project -> bin -> sort -> ranges -> gather -> raster —
with no mid-frame host synchronization.  The only optional readback is the
candidate-pair count used for capacity management.

Capacity management mirrors the reference's saturation-doubling
(Demo.cpp:356-366, cu:700-703) at recompile granularity: when a frame's
candidate count exceeds the static list capacity, that frame renders with a
truncated list and the next frame recompiles with doubled capacity.
"""

from __future__ import annotations

import time
import warnings
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import RenderConfig
from .models.camera import Camera
from .models.scene import GaussianScene
from .ops.banded import build_tile_pairs_banded, sort_pairs_banded
from .ops.binning import build_tile_pairs
from .ops.expand import BLOCKS_PER_STEP as _KERNEL_BPS
from .ops.expand import MAX_BLOCK as _KERNEL_BLOCK
from .ops.expand import PREP_BLK as _PREP_BLK
from .ops.expand import MAX_CAPACITY as _KERNEL_MAX_CAPACITY
from .ops.projection import project_splats
from .ops.ranges import tile_ranges
from .ops.raster import pack_pair_data, rasterize_tiles, tiles_to_image
from .ops.sh import evaluate_sh_colors
from .ops.sorting import sort_pairs


def _splat_colors(scene: GaussianScene, camera_data: dict) -> jnp.ndarray:
    """Stage A: per-frame view-dependent colors when the scene has SH,
    otherwise the baked import-time colors (Demo.cpp:432-436)."""
    if scene.sh is not None and scene.sh_degree > 0:
        return evaluate_sh_colors(
            scene.means, scene.sh, camera_data["position"], scene.sh_degree
        )
    return scene.colors


def round_capacity(capacity: int, interpret=None, bands: int = 1) -> int:
    """Round a pair-list capacity up to a whole number of emit GRID
    STEPS (block x BLOCKS_PER_STEP = 4096 slots on TPU; 128 in
    interpret mode, where the kernel shrinks its block down to one
    8x128 tile), times the band count for band-segmented lists.

    Whole grid steps matter, not just whole blocks: an odd block count
    silently degrades the emit kernel's blocks-per-step batching to 1
    (ops.expand divides BLOCKS_PER_STEP down until it divides nblocks),
    measured ~1 ms/frame at the bench workload — the round-4 headline
    capacity 3,943,424 was exactly this case (3851 blocks).

    Applied at every public entry point so an arbitrary capacity renders
    with at-least-requested slots instead of raising inside ops.expand.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    grain = (128 if interpret else _KERNEL_BLOCK * _KERNEL_BPS) * max(
        1, int(bands)
    )
    return -(-max(1, int(capacity)) // grain) * grain


def warn_capacity_ceiling(renderer, candidates: int) -> None:
    """The emit kernel's exact-f32 selection caps pair-list capacity at
    MAX_CAPACITY (~16.5M pairs); a frame whose candidate count exceeds it
    renders with a TRUNCATED pair list and capacity growth cannot fix it
    (the reference grows without bound, Demo.cpp:356-366; we saturate).
    Warn once per renderer, loudly, and point at the escape hatches.

    Shared by render.Renderer and parallel.DistributedRenderer (which
    applies it to the pmax'd per-device candidate count)."""
    if getattr(renderer, "_ceiling_warned", False):
        return
    renderer._ceiling_warned = True
    warnings.warn(
        f"frame produced {candidates} candidate pairs, above the pair-list "
        f"capacity ceiling ({renderer.MAX_CAPACITY}); frames past the ceiling "
        "render with a truncated (depth-ordered per tile, but arbitrarily "
        "cut) pair list. Escape hatches: shard tile rows across devices "
        "(parallel.DistributedRenderer divides the per-device pair count), "
        "lower the candidate count (smaller viewport, opacity-aware "
        "extents), or render in tile-row bands on one chip via "
        "render.render_frame_multipass (n_passes x capacity_per_pass "
        "effective capacity).",
        RuntimeWarning,
        stacklevel=3,
    )


def uniform_band_rows(config: RenderConfig) -> np.ndarray:
    """Default equal-ROW band boundaries for config.sort_bands bands."""
    g = config.sort_bands
    return np.round(np.linspace(0, config.tiles_y, g + 1)).astype(np.int32)


def reorder_scene_by_tile_row(
    scene: GaussianScene, camera_data: dict, config: RenderConfig
) -> GaussianScene:
    """Re-order splats by their projected center tile row.

    A LOCALITY experiment kept for tools/measure.py: the production
    banded path instead runs an in-frame MXU band-compaction pass
    (ops.expand._compact_kernel), which is dense for any camera motion
    — the round-4 drift study showed persistent orders go ~8x stale
    after ONE 5.6-degree orbit step (docs/PERF_NOTES.md).
    """
    clip = project_splats(
        scene.means, scene.scales, scene.quats, camera_data, config,
        opacities=scene.opacities,
    )
    row = jnp.clip(
        jnp.floor((clip.cy + 1.0) * (0.5 * config.tiles_y)),
        0.0,
        float(config.tiles_y - 1),
    ).astype(jnp.int32)
    ops = (
        row,
        scene.means[0], scene.means[1], scene.means[2],
        scene.scales[0], scene.scales[1], scene.scales[2],
        scene.quats,
        scene.opacities,
        scene.colors[0], scene.colors[1], scene.colors[2],
    )
    nsh = 0
    if scene.sh is not None:
        shf = scene.sh.reshape(-1, scene.sh.shape[-1])
        nsh = shf.shape[0]
        ops = ops + tuple(shf[i] for i in range(nsh))
    out = jax.lax.sort(ops, num_keys=1, is_stable=False)
    sh = None
    if scene.sh is not None:
        sh = jnp.stack(out[12:12 + nsh]).reshape(scene.sh.shape)
    import dataclasses

    return dataclasses.replace(
        scene,
        means=jnp.stack(out[1:4]),
        scales=jnp.stack(out[4:7]),
        quats=out[7],
        opacities=out[8],
        colors=jnp.stack(out[9:12]),
        sh=sh,
    )


def rebalance_band_rows(
    band_rows: jnp.ndarray, totals: jnp.ndarray, tiles_y: int
) -> jnp.ndarray:
    """Traced equal-count boundary update (Renderer._rebalance_bands'
    jnp twin, usable inside a lax.scan frame loop): move boundary k to
    the row where the piecewise-linear cumulative load crosses k/G of
    the total, assuming uniform density within each current band."""
    g = band_rows.shape[0] - 1
    rows = band_rows.astype(jnp.float32)
    cum = jnp.concatenate(
        [jnp.zeros(1, jnp.float32), jnp.cumsum(totals.astype(jnp.float32))]
    )
    total = cum[-1]
    targets = jnp.arange(1, g, dtype=jnp.float32) * (total / g)
    # Band containing each target (compare-sum; G is tiny).
    k = jnp.sum(
        cum[1:-1][None, :] <= targets[:, None] - 0.5, axis=1
    ).astype(jnp.int32)
    lo_c = jnp.take(cum, k)
    span_c = jnp.maximum(jnp.take(cum, k + 1) - lo_c, 1e-9)
    frac = (targets - lo_c) / span_c
    lo_r = jnp.take(rows, k)
    new = lo_r + frac * (jnp.take(rows, k + 1) - lo_r)
    arr = jnp.concatenate(
        [jnp.zeros(1, jnp.float32), jnp.round(new),
         jnp.full(1, float(tiles_y), jnp.float32)]
    ).astype(jnp.int32)
    arr = jax.lax.associative_scan(jnp.maximum, arr)
    arr = jnp.clip(arr, 0, tiles_y)
    # An empty frame (total 0) would collapse every boundary to 0; fall
    # back to equal rows so the next live frame starts balanced-ish.
    uniform = jnp.round(
        jnp.arange(g + 1, dtype=jnp.float32) * (tiles_y / g)
    ).astype(jnp.int32)
    return jnp.where(total > 0, arr, uniform)


def render_frame(
    scene: GaussianScene,
    camera_data: dict,
    config: RenderConfig,
    capacity: int,
    *,
    band_rows=None,
    compact_capacity: int = 0,
    interpret=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Render one frame.  Jittable end-to-end (config/capacity static).

    Returns (image uint8 [H, W, 4], aux dict with pair statistics).

    With config.sort_bands = G > 1, the pair list is emitted band-major
    over G tile-row bands (an MXU band-compaction pass keeps the
    emission dense for any camera) and stage D runs as a batched
    [G, capacity/G] sort (fewer bitonic passes).  ``band_rows`` ([G+1]
    tile-row boundaries, traced ints fine) tunes the band balance —
    Renderer feeds back the previous frame's per-band counts; None =
    equal rows.  ``compact_capacity`` (static) sizes the compacted
    splat axis (0 = 2x the splat count).
    """
    banded = config.sort_bands > 1
    capacity = round_capacity(
        capacity, interpret, bands=config.sort_bands if banded else 1
    )
    colors = _splat_colors(scene, camera_data)
    clip = project_splats(
        scene.means, scene.scales, scene.quats, camera_data, config,
        opacities=scene.opacities,
    )
    if banded:
        if band_rows is None:
            band_rows = jnp.asarray(uniform_band_rows(config))
        band_rows = jnp.asarray(band_rows)
        # The emit, sort and ranges stages each derive the band count
        # independently; a mismatched band_rows would silently disagree
        # on segment boundaries and corrupt the frame.
        if band_rows.shape != (config.sort_bands + 1,):
            raise ValueError(
                f"band_rows must have sort_bands + 1 = "
                f"{config.sort_bands + 1} entries, got {band_rows.shape}"
            )
        pairs, band_totals, band_splats = build_tile_pairs_banded(
            clip, colors, scene.opacities, config, capacity, band_rows,
            compact_capacity=compact_capacity, interpret=interpret,
        )
        sorted_keys, _, sorted_attrs = sort_pairs_banded(
            pairs, config.sort_bands, stable=config.stable_sort
        )
        starts, counts = tile_ranges(
            sorted_keys, config,
            band_rows=band_rows,
            band_capacity=capacity // config.sort_bands,
            interpret=interpret,
        )
    else:
        pairs = build_tile_pairs(
            clip, colors, scene.opacities, config, capacity, interpret=interpret
        )
        sorted_keys, _, sorted_attrs = sort_pairs(pairs, stable=config.stable_sort)
        starts, counts = tile_ranges(sorted_keys, config, interpret=interpret)
        band_totals = None
    pair_data = pack_pair_data(sorted_attrs, config.raster_chunk)
    tiles = rasterize_tiles(pair_data, starts, counts, config, interpret=interpret)
    image = tiles_to_image(tiles, config)
    aux = dict(
        num_candidates=pairs.num_candidates,
        num_pairs=pairs.num_pairs,
    )
    if banded:
        aux["band_totals"] = band_totals
        aux["band_splats"] = band_splats
    return image, aux


def render_frame_multipass(
    scene: GaussianScene,
    camera_data: dict,
    config: RenderConfig,
    capacity_per_pass: int,
    n_passes: int,
    *,
    interpret=None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """Escape hatch ABOVE the pair-capacity ceiling: render in
    ``n_passes`` tile-row bands, each an independent build -> sort ->
    ranges -> raster over only that band's pairs
    (build_tile_pairs(row_band=...), the same band-exact clamping the
    multi-chip tile-row sharding uses).  Effective frame capacity is
    n_passes * capacity_per_pass — each pass stays below the emit
    kernel's 2^24 exact-f32 limit, so frames the single-pass pipeline
    could only render truncated (render.Renderer warns; the reference
    grows without bound, Demo.cpp:356-366) render exactly here, at the
    cost of projecting once and sorting per band.

    Jittable end-to-end; tiles_y must divide by n_passes.
    """
    if config.tiles_y % n_passes != 0:
        raise ValueError(
            f"n_passes ({n_passes}) must divide tiles_y ({config.tiles_y})"
        )
    if config.sort_bands > 1:
        raise ValueError("use sort_bands OR multipass, not both")
    band_tiles_ = (config.tiles_y // n_passes) * config.tiles_x
    if band_tiles_ % config.cell_tiles(band_tiles_) != 0:
        # Only reachable with an EXPLICIT tiles_per_cell (the auto
        # default adapts to the pass slice).
        raise ValueError(
            f"per-pass tile count ({band_tiles_}) must be a multiple of "
            f"tiles_per_cell ({config.tiles_per_cell}) — use fewer passes "
            f"or a smaller tiles_per_cell"
        )
    capacity_per_pass = round_capacity(capacity_per_pass, interpret)
    colors = _splat_colors(scene, camera_data)
    clip = project_splats(
        scene.means, scene.scales, scene.quats, camera_data, config,
        opacities=scene.opacities,
    )
    rows_per = config.tiles_y // n_passes
    band_tiles = rows_per * config.tiles_x
    images = []
    pass_candidates = []
    pass_pairs = []
    for p in range(n_passes):
        lo = p * rows_per
        pairs = build_tile_pairs(
            clip, colors, scene.opacities, config, capacity_per_pass,
            row_band=(lo, lo + rows_per), interpret=interpret,
        )
        sorted_keys, _, sorted_attrs = sort_pairs(
            pairs, stable=config.stable_sort
        )
        starts, counts = tile_ranges(sorted_keys, config, interpret=interpret)
        starts_b = jax.lax.dynamic_slice(
            starts, (lo * config.tiles_x,), (band_tiles,)
        )
        counts_b = jax.lax.dynamic_slice(
            counts, (lo * config.tiles_x,), (band_tiles,)
        )
        tiles = rasterize_tiles(
            pack_pair_data(sorted_attrs, config.raster_chunk),
            starts_b, counts_b, config,
            num_tiles=band_tiles, tile_row_offset=lo,
            interpret=interpret,
        )
        images.append(tiles_to_image(tiles, config))
        pass_candidates.append(pairs.num_candidates)
        pass_pairs.append(pairs.num_pairs)
    image = jnp.concatenate(images, axis=0)
    pass_candidates = jnp.stack(pass_candidates)
    pass_pairs = jnp.stack(pass_pairs)
    # Per-pass counts let callers detect PER-PASS saturation: tile-row
    # slabs are rarely uniform (center bands carry 2-3x the mean), so a
    # pass can saturate while the totals look fine.
    return image, dict(
        num_candidates=pass_candidates.sum(),
        num_pairs=pass_pairs.sum(),
        pass_candidates=pass_candidates,
        pass_pairs=pass_pairs,
    )


# Stage names exactly as the reference prints them at exit
# (Demo.cpp:556-562), for comparable profiling reports.
STAGE_NAMES = (
    "evaluateSphericalHarmonics",
    "evaluateClipData",
    "buildTileList",
    "sortTileList",
    "evaluateTileRanges",
    "renderDepthBuffer",
)


class Renderer:
    """Stateful host-side renderer: jit caching, capacity management,
    optional per-stage profiling."""

    def __init__(
        self,
        scene: GaussianScene,
        config: RenderConfig = RenderConfig(),
        *,
        interpret: Optional[bool] = None,
    ):
        self.config = config
        # PREP_BLK multiple: the emit pre-pass skips its jnp.pad
        # fallback when the splat count divides the interleave block.
        self.scene = scene.pad_to_multiple(_PREP_BLK)
        if interpret is None:
            interpret = jax.default_backend() == "cpu"
        self.interpret = interpret
        # Clamp + block-round the INITIAL capacity too: a >=2.1M-splat
        # scene's capacity_factor estimate exceeds the emit kernel's
        # exact-f32 limit, and an explicit config.capacity may not be a
        # block multiple — both crashed the first render() before.  The
        # emit kernel's flat 1D outputs need whole grid steps (4096).
        self.capacity = min(
            round_capacity(config.tile_capacity(self.scene.count), interpret),
            self.MAX_CAPACITY,
        )
        self.saturated = False
        self._fns: dict = {}
        self.stats = {name: 0.0 for name in STAGE_NAMES}
        self.frame_count = 0
        self.profiled_count = 0
        # Adaptive capacity: power-of-two buckets sized from the previous
        # frame's candidate count.  This generalizes the reference's
        # grow-only saturation doubling (Demo.cpp:356-366) — every stage
        # after binning costs O(capacity), so shrinking matters on TPU.
        # An explicit config.capacity opts into the reference's fixed
        # grow-only behavior instead.
        self.adaptive_capacity = config.capacity is None
        self._ceiling_warned = False
        self.last_candidates = 0
        # Band-segmented sort state (config.sort_bands > 1): equal-count
        # boundary controller + adaptive compacted-splat capacity (the
        # MXU band-compaction pass keeps emission dense without any
        # splat re-ordering or cross-frame state).
        self.banded = config.sort_bands > 1
        self.n_bands = max(1, config.sort_bands)
        self.band_rows = uniform_band_rows(config) if self.banded else None
        if self.banded:
            self.capacity = self._round_banded(self.capacity)
            self.compact_capacity = self._round_banded(
                2 * self.scene.padded_count
            )

    # Hard capacity ceiling: the emit kernel's exact f32 one-hot selection
    # requires capacity + 1 < 2^24.  Beyond it the pipeline renders with a
    # truncated list forever (the reference's saturation semantics,
    # cu:700-703) instead of raising mid-run.
    MAX_CAPACITY = _KERNEL_MAX_CAPACITY

    @classmethod
    def _bucket(cls, candidates: int) -> int:
        """Capacity bucket: 8% headroom, 64Ki granularity (bounds the
        number of distinct compiled pipelines while staying tight —
        every post-binning stage costs O(capacity))."""
        want = max(1 << 17, int(candidates * 1.08))
        grain = 1 << 16
        return min(-(-want // grain) * grain, cls.MAX_CAPACITY)

    def _round_banded(self, capacity: int) -> int:
        """Clamp + round a capacity to the banded grain (bands x blocks,
        via round_capacity — one source of the grain rule), never
        exceeding MAX_CAPACITY."""
        grain = round_capacity(1, self.interpret, self.n_bands)
        cap = round_capacity(
            min(capacity, self.MAX_CAPACITY), self.interpret, self.n_bands
        )
        return min(cap, self.MAX_CAPACITY // grain * grain)

    def _bucket_banded(self, band_max: int) -> int:
        """Adaptive banded capacity from the max per-band count: more
        headroom than the flat bucket (20%) because the equal-count
        controller lags the view by a frame, at a finer 16Ki per-band
        grain."""
        per_band = max(1 << 14, int(band_max * 1.20))
        per_band = -(-per_band // (1 << 14)) * (1 << 14)
        return self._round_banded(per_band * self.n_bands)

    def _rebalance_bands(self, totals: np.ndarray) -> None:
        """Move band boundaries toward equal per-band pair counts.

        Models the row density as uniform within each current band; new
        boundary k sits at the row where the piecewise-linear cumulative
        load crosses k/G of the total.  Converges in a few frames for a
        smooth camera; per-band capacity headroom covers the transient.
        """
        total = int(totals.sum())
        ty = self.config.tiles_y
        g = self.n_bands
        if total <= 0:
            self.band_rows = uniform_band_rows(self.config)
            return
        rows = self.band_rows.astype(np.float64)
        cum = np.concatenate([[0.0], np.cumsum(totals.astype(np.float64))])
        targets = np.arange(1, g) * (total / g)
        k = np.searchsorted(cum[1:-1], targets, side="left")  # band of target
        span_c = np.maximum(cum[k + 1] - cum[k], 1e-9)
        frac = (targets - cum[k]) / span_c
        new_rows = rows[k] + frac * (rows[k + 1] - rows[k])
        arr = np.concatenate([[0], np.round(new_rows), [ty]]).astype(np.int32)
        self.band_rows = np.maximum.accumulate(np.clip(arr, 0, ty))

    def _get_fn(self):
        key = (self.capacity, getattr(self, "compact_capacity", None))
        if key not in self._fns:
            cfg, cap, interp = self.config, self.capacity, self.interpret

            if self.banded:
                ccap = self.compact_capacity

                @jax.jit
                def fn(scene, camera_data, band_rows):
                    return render_frame(
                        scene, camera_data, cfg, cap,
                        band_rows=band_rows, compact_capacity=ccap,
                        interpret=interp,
                    )
            else:
                @jax.jit
                def fn(scene, camera_data):
                    return render_frame(
                        scene, camera_data, cfg, cap, interpret=interp
                    )

            self._fns[key] = fn
        return self._fns[key]

    def render(self, camera: Camera, *, check_saturation: bool = True) -> np.ndarray:
        """Render and return a [S, S, 4] uint8 numpy image.

        ``check_saturation`` reads the candidate count back to the host
        (the pipeline's only device->host sync, mirroring the reference's
        single counter readback, cu:793) and resizes the pair-list
        capacity for the NEXT frame; the current frame renders with a
        truncated list if it overflowed, exactly like the reference.
        """
        if self.saturated:
            # Demo.cpp:356-366 grow-on-saturation behavior.
            cap = min(self.capacity * 2, self.MAX_CAPACITY)
            self.capacity = self._round_banded(cap) if self.banded else cap
            self.saturated = False
        if self.banded:
            image, aux = self._get_fn()(
                self.scene, camera.camera_data(), jnp.asarray(self.band_rows)
            )
        else:
            image, aux = self._get_fn()(self.scene, camera.camera_data())
        self.frame_count += 1
        if check_saturation:
            candidates = int(aux["num_candidates"])
            self.last_candidates = candidates
            if candidates > self.MAX_CAPACITY:
                self._warn_capacity_ceiling(candidates)
            if self.banded:
                totals = np.asarray(aux["band_totals"])
                band_max = int(totals.max())
                # Compacted-splat axis: grow if any band's in-band splat
                # count approaches its share (same doubling semantics).
                splat_max = int(np.asarray(aux["band_splats"]).max())
                mc = self.compact_capacity // self.n_bands
                if splat_max > mc:
                    self.compact_capacity = self._round_banded(
                        min(2 * self.compact_capacity, self.MAX_CAPACITY)
                    )
                # Banded capacity saturates PER BAND at its share of the
                # MAX_CAPACITY clamp; the global candidates check above
                # cannot see a single hot band hitting that ceiling
                # (rebalancing cannot split a band below one tile row).
                ceiling_per_band = (
                    self._round_banded(self.MAX_CAPACITY) // self.n_bands
                )
                if self.adaptive_capacity:
                    self.capacity = self._bucket_banded(band_max)
                    self.saturated = False
                    if band_max > ceiling_per_band:
                        self._warn_capacity_ceiling(band_max * self.n_bands)
                else:
                    self.saturated = band_max >= self.capacity // self.n_bands
                    if self.saturated and self.capacity // self.n_bands >= ceiling_per_band:
                        self._warn_capacity_ceiling(band_max * self.n_bands)
                self._rebalance_bands(totals)
            elif self.adaptive_capacity:
                self.capacity = self._bucket(candidates)
                self.saturated = False
            else:
                self.saturated = candidates >= self.capacity
        return np.asarray(image)

    def _warn_capacity_ceiling(self, candidates: int) -> None:
        warn_capacity_ceiling(self, candidates)

    # ------------------------------------------------------------------
    # Profiling mode: stage-sliced timing with reference-matching names.
    # ------------------------------------------------------------------

    def _stage_fns(self):
        """Per-stage jit wrappers, cached like _get_fn: rebuilding them
        each call would leave every profile_frame() measuring trace +
        compile instead of kernels (jit caches are per-wrapper)."""
        key = ("stages", self.capacity, getattr(self, "compact_capacity", None))
        if key in self._fns:
            return self._fns[key]
        cfg, cap, interp = self.config, self.capacity, self.interpret
        sh_fn = jax.jit(lambda s, c: _splat_colors(s, c))
        proj_fn = jax.jit(
            lambda s, c: project_splats(
                s.means, s.scales, s.quats, c, cfg, opacities=s.opacities
            )
        )
        if self.banded:
            g = self.n_bands

            ccap = self.compact_capacity

            @jax.jit
            def bin_fn(clip, colors, s, band_rows):
                pairs, totals, splats = build_tile_pairs_banded(
                    clip, colors, s.opacities, cfg, cap, band_rows,
                    compact_capacity=ccap, interpret=interp,
                )
                return pairs, band_rows, totals

            sort_fn = jax.jit(
                lambda p: sort_pairs_banded(p, g, stable=cfg.stable_sort)
            )
            rng_fn = jax.jit(
                lambda keys, bounds: tile_ranges(
                    keys, cfg, band_rows=bounds,
                    band_capacity=cap // g, interpret=interp,
                )
            )
        else:
            bin_fn = jax.jit(
                lambda clip, colors, s, band_rows: (
                    build_tile_pairs(
                        clip, colors, s.opacities, cfg, cap, interpret=interp
                    ),
                    None,
                    None,
                )
            )
            sort_fn = jax.jit(lambda p: sort_pairs(p, stable=cfg.stable_sort))
            rng_fn = jax.jit(
                lambda keys, bounds: tile_ranges(keys, cfg, interpret=interp)
            )
        rast_fn = jax.jit(
            lambda attrs, starts, counts: rasterize_tiles(
                pack_pair_data(attrs, cfg.raster_chunk),
                starts, counts, cfg, interpret=interp,
            )
        )
        fns = (sh_fn, proj_fn, bin_fn, sort_fn, rng_fn, rast_fn)
        self._fns[key] = fns
        return fns

    def profile_frame(self, camera: Camera, *, warmup: bool = False) -> Dict[str, float]:
        """Time each pipeline stage (ms) via stage-sliced jits.

        This is the analog of the reference's CudaTimer bracketing of every
        launch (Utilities.h:155-187, Demo.cpp:432-476); like the reference
        it serializes stage boundaries, so the total exceeds the fused
        whole-frame time.  On a remote runtime each stage additionally
        pays the dispatch round-trip (~30-40 ms through the axon tunnel)
        — bench.py's scan-amortized stage table is the accurate per-stage
        source; this report is for relative regressions and parity with
        the reference's output format.
        """
        scene, cam = self.scene, camera.camera_data()

        has_sh = scene.sh is not None and scene.sh_degree > 0

        stages = {}

        def timed(name, fn, *args):
            t0 = time.perf_counter()
            out = fn(*args)
            # Materialize ONE element of one leaf: the slice dispatch
            # queues behind the stage, so fetching it waits for the full
            # stage to finish (block_until_ready alone is unreliable
            # through remote runtimes) — while np.asarray of the whole
            # leaf would pull megabytes through a remote tunnel and time
            # the transfer instead of the stage.
            leaf = jax.tree_util.tree_leaves(out)[0]
            np.asarray(leaf[(0,) * getattr(leaf, "ndim", 0)])
            dt = (time.perf_counter() - t0) * 1e3
            stages[name] = stages.get(name, 0.0) + dt
            return out

        sh_fn, proj_fn, bin_fn, sort_fn, rng_fn, rast_fn = self._stage_fns()
        band_rows = jnp.asarray(self.band_rows) if self.banded else None

        if warmup:
            colors = sh_fn(scene, cam)
            clip = proj_fn(scene, cam)
            pairs, bounds, _ = bin_fn(clip, colors, scene, band_rows)
            keys, _, attrs = sort_fn(pairs)
            starts, counts = rng_fn(keys, bounds)
            np.asarray(rast_fn(attrs, starts, counts))
            stages.clear()

        colors = timed("evaluateSphericalHarmonics" if has_sh else "_baked", sh_fn, scene, cam)
        clip = timed("evaluateClipData", proj_fn, scene, cam)
        pairs, bounds, _ = timed("buildTileList", bin_fn, clip, colors, scene, band_rows)
        keys, _, attrs = timed("sortTileList", sort_fn, pairs)
        starts, counts = timed("evaluateTileRanges", rng_fn, keys, bounds)
        timed("renderDepthBuffer", rast_fn, attrs, starts, counts)

        stages.pop("_baked", None)
        for name, ms in stages.items():
            if name in self.stats:
                self.stats[name] += ms
        self.profiled_count += 1
        return stages

    def report(self) -> str:
        """Exit-time style averages report (Demo.cpp:541-562).

        Stage stats accumulate in profile_frame(), so averages divide by
        the number of *profiled* frames (render() alone records none).
        """
        n = max(1, self.profiled_count)
        lines = []
        total = 0.0
        for name in STAGE_NAMES:
            avg = self.stats[name] / n
            lines.append(f"{name} average time ms: {avg:2.6f}")
            if name != "evaluateSphericalHarmonics":
                total += avg
        lines.append(f"Total average time ms: {total:2.6f}")
        return "\n".join(lines)

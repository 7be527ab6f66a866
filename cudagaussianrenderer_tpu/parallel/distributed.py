"""Multi-chip rendering over a jax.sharding.Mesh.

The CUDA reference is strictly single-GPU (SURVEY.md §2: no NCCL/MPI, one
cudaChooseDevice, Demo.cpp:239-248).  The TPU framework adds the scaling
story the reference lacks, following the natural decomposition of the
splat pipeline:

  * SPLAT parallelism: the per-splat stages (SH colors, EWA projection)
    shard over the splat axis — embarrassingly parallel.
  * TILE parallelism: binning, sorting, ranging and rasterization shard
    over IMAGE TILE ROWS.  After projection, the compact per-splat clip
    data is all-gathered over ICI (tens of MB — cheap), and each device
    then builds, sorts and rasterizes ONLY the pairs intersecting its
    band of tile rows: candidate rects are clamped to the band at
    emission, so out-of-band pairs never consume capacity or sort
    bandwidth and the pair lists partition exactly across devices.  The
    sort — the dominant stage — shrinks by the device count, so scaling
    is near-linear where it matters.
  * FRAME parallelism: ``render_frames_sharded`` batches cameras over a
    second mesh axis on a 2D ("frames", "tiles") mesh; each frame group
    renders tile-row-sharded within its slice of the mesh.

The final image comes out row-sharded across devices — exactly the
layout a sharded encoder or tiled display consumer wants.

Everything is expressed with shard_map + explicit collectives riding
ICI; there is no NCCL-style host orchestration to translate.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RenderConfig
from ..models.camera import Camera
from ..models.scene import GaussianScene
from ..ops.binning import build_tile_pairs, splat_tile_rects
from ..ops.projection import SplatClipData, project_splats
from ..ops.ranges import tile_ranges
from ..ops.expand import MAX_CAPACITY as _KERNEL_MAX_CAPACITY
from ..ops.raster import pack_pair_data, rasterize_tiles, tiles_to_image
from ..ops.sorting import sort_pairs
from ..render import _splat_colors, round_capacity, warn_capacity_ceiling


def make_mesh(n_devices: Optional[int] = None, axis: str = "tiles") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), (axis,))


def make_mesh_2d(
    n_frames: int, n_tiles: int, axes: Tuple[str, str] = ("frames", "tiles")
) -> Mesh:
    """2D mesh: data-parallel frames on the outer axis (cheap, no
    communication) x tile-row sharding on the inner axis (ICI
    all-gather of clip data), so the all-gathers ride the fastest links."""
    devices = jax.devices()[: n_frames * n_tiles]
    return Mesh(np.asarray(devices).reshape(n_frames, n_tiles), axes)


def _band_weights(
    clip: SplatClipData, config: RenderConfig, sample_cap: int = 1 << 16
) -> jnp.ndarray:
    """Per-tile-row work estimate [tiles_y] from the (replicated) clip data.

    Each splat's AABB rect spreads its width over the rows it covers —
    proportional to the pairs the row will emit (the exact strip runs
    trim ~40% uniformly, which cancels in the balance).  Splats are
    subsampled to ``sample_cap`` (load balancing needs ~1% accuracy, not
    exactness) so the [tiles_y, S] one-hot reduce stays trivial next to
    the frame.  Culled splats have zero-width rects and drop out.
    """
    n = clip.cx.shape[-1]
    stride = max(1, n // sample_cap)
    sub = SplatClipData(*[f[..., ::stride] for f in clip])
    rects = splat_tile_rects(sub, config)
    y0 = rects.y0[None, :]
    y1 = (rects.y0 + rects.h)[None, :]
    w = rects.w.astype(jnp.float32)[None, :]
    rows = jnp.arange(config.tiles_y, dtype=jnp.int32)[:, None]
    return jnp.sum(jnp.where((rows >= y0) & (rows < y1), w, 0.0), axis=1)


def _band_bounds(weights: jnp.ndarray, n_dev: int, max_rows: int) -> jnp.ndarray:
    """Equal-work band boundaries [n_dev + 1] (traced int32).

    Boundary j lands where the cumulative row weight crosses j/n_dev of
    the total, clamped so every band has >= 1 row and <= ``max_rows``
    rows (the raster buffer's static size) and the remaining devices can
    still cover the remaining rows.  The scan is over tiles_y <= 255
    entries — unrolled over the (static) device count.
    """
    ty = weights.shape[0]
    cdf = jnp.cumsum(weights)
    total = cdf[-1]
    bounds = [jnp.zeros((), jnp.int32)]
    prev = bounds[0]
    for j in range(1, n_dev):
        target = total * (j / n_dev)
        # Boundary candidates straddle the target crossing; snap to the
        # side whose cumulative weight is closer (coarse rows make the
        # difference large — always rounding down starves early bands).
        b0 = jnp.sum((cdf < target).astype(jnp.int32))
        below = jnp.where(b0 > 0, jnp.take(cdf, jnp.maximum(b0 - 1, 0)), 0.0)
        above = jnp.take(cdf, jnp.minimum(b0, ty - 1))
        b = jnp.where(above - target <= target - below, b0 + 1, b0)
        lo = jnp.maximum(prev + 1, ty - (n_dev - j) * max_rows)
        hi = jnp.minimum(prev + max_rows, ty - (n_dev - j))
        prev = jnp.clip(b, lo, hi)
        bounds.append(prev)
    bounds.append(jnp.full((), ty, jnp.int32))
    return jnp.stack(bounds)


def _band_image(clip, colors, opacities, config, capacity, band_lo, band_hi, max_rows):
    """Render one contiguous band of tile rows on one device.

    ``band_lo``/``band_hi`` may be traced (balanced mode re-chooses them
    every frame); ``max_rows`` is the static height of the raster buffer.
    Candidate rects are clamped to the band inside splat_tile_rects, so
    each (splat, tile) pair is emitted in exactly one band and
    num_candidates counts only in-band tiles.  Tiles past the actual band
    (balanced mode renders into a 2x-uniform static buffer) are masked to
    zero count.  Returns (band image [max_rows*tile_size, W, 4], pairs).
    """
    band_tiles = max_rows * config.tiles_x
    pairs = build_tile_pairs(
        clip, colors, opacities, config, capacity,
        row_band=(band_lo, band_hi),
    )
    keys, _, attrs = sort_pairs(pairs, stable=config.stable_sort)
    starts, counts = tile_ranges(keys, config)
    # Pad so the dynamic band slice stays in range for any boundary.
    pad = jnp.zeros((band_tiles,), starts.dtype)
    starts = jnp.concatenate([starts, pad])
    counts = jnp.concatenate([counts, pad])
    t0 = band_lo * config.tiles_x
    starts_b = jax.lax.dynamic_slice(starts, (t0,), (band_tiles,))
    counts_b = jax.lax.dynamic_slice(counts, (t0,), (band_tiles,))
    in_band = jnp.arange(band_tiles, dtype=jnp.int32) < (
        (band_hi - band_lo) * config.tiles_x
    )
    counts_b = jnp.where(in_band, counts_b, 0)
    tiles = rasterize_tiles(
        pack_pair_data(attrs, config.raster_chunk),
        starts_b,
        counts_b,
        config,
        num_tiles=band_tiles,
        tile_row_offset=band_lo,
    )
    return tiles_to_image(tiles, config), pairs


def _place_band(img, band_lo, band_hi, max_rows, config):
    """Zero out-of-band rows and place the band into a zeroed full-height
    frame at its screen position.  Bands partition the tile rows exactly,
    so the element-wise SUM of placed frames over all bands is the
    assembled image."""
    ts = config.tile_size
    rows_px = (band_hi - band_lo) * ts
    keep = jnp.arange(max_rows * ts, dtype=jnp.int32)[:, None, None] < rows_px
    band_img = jnp.where(keep, img, 0)
    full = jnp.zeros((config.screen_h + max_rows * ts,) + img.shape[1:], img.dtype)
    return jax.lax.dynamic_update_slice(
        full, band_img, (band_lo * ts, 0, 0)
    )[: config.screen_h]


def render_band(
    scene: GaussianScene,
    camera_data: dict,
    config: RenderConfig,
    capacity: int,
    n_dev: int,
    dev: int,
):
    """One device's balanced band of an ``n_dev``-device frame, on ONE
    device: the exact per-device program of ``config.balanced_bands``
    minus the collectives (the scene arrives whole instead of
    all-gathered; the psum_scatter reassembly is replaced by placement
    into a zeroed full-height frame).  Summing the returned frames over
    dev = 0..n_dev-1 reconstructs the full image exactly — the
    single-chip hardware validation + measurement surface for the
    balanced multi-chip path (tools/tpu_selfcheck.py, tools/measure.py
    shardbal).  Returns (full-height frame, aux with the band's pair
    counts and traced boundaries).
    """
    capacity = round_capacity(capacity)
    colors = _splat_colors(scene, camera_data)
    clip = project_splats(
        scene.means, scene.scales, scene.quats, camera_data, config,
        opacities=scene.opacities,
    )
    rows_per_dev = config.tiles_y // n_dev
    max_rows = min(config.tiles_y, 2 * rows_per_dev)
    bounds = _band_bounds(_band_weights(clip, config), n_dev, max_rows)
    band_lo, band_hi = bounds[dev], bounds[dev + 1]
    img, pairs = _band_image(
        clip, colors, scene.opacities, config, capacity,
        band_lo, band_hi, max_rows,
    )
    full = _place_band(img, band_lo, band_hi, max_rows, config)
    aux = dict(
        num_candidates=pairs.num_candidates,
        num_pairs=pairs.num_pairs,
        band_lo=band_lo,
        band_hi=band_hi,
    )
    return full, aux


def _render_shard(
    scene: GaussianScene,
    camera_data: dict,
    config: RenderConfig,
    capacity_per_device: int,
    axis: str,
):
    """Per-device body under shard_map.

    The scene arrives splat-sharded on ``axis``; the returned image slice
    is this device's contiguous band of tile rows.
    """
    n_dev = jax.lax.psum(1, axis)
    idx = jax.lax.axis_index(axis)

    # --- splat-parallel stages ---
    colors = _splat_colors(scene, camera_data)
    clip = project_splats(
        scene.means, scene.scales, scene.quats, camera_data, config,
        opacities=scene.opacities,
    )

    # --- all-gather the compact clip data + colors over ICI ---
    def gather(x):
        return jax.lax.all_gather(x, axis, axis=x.ndim - 1, tiled=True)

    clip = SplatClipData(*[gather(f) for f in clip])
    colors = gather(colors)
    opacities = gather(scene.opacities)

    # --- tile-parallel stages: restrict to this device's tile rows ---
    rows_per_dev = config.tiles_y // n_dev
    balanced = config.balanced_bands and n_dev > 1
    if balanced:
        # Equal-WORK contiguous bands, re-chosen every frame from the
        # gathered clip data (replicated => every device computes the
        # same boundaries).  The raster buffer is statically sized at
        # 2x the uniform band; boundary clamping guarantees the fit.
        max_rows = min(config.tiles_y, 2 * rows_per_dev)
        bounds = _band_bounds(_band_weights(clip, config), n_dev, max_rows)
        band_lo, band_hi = bounds[idx], bounds[idx + 1]
    else:
        max_rows = rows_per_dev
        band_lo = idx * rows_per_dev
        band_hi = band_lo + rows_per_dev
    img, pairs = _band_image(
        clip, colors, opacities, config, capacity_per_device,
        band_lo, band_hi, max_rows,
    )
    if balanced:
        # Reassemble variable-height bands into the uniform row sharding
        # the caller expects: one psum_scatter both sums the placed
        # frames and re-shards — (n-1)/n of one uint8 frame over ICI,
        # ~0.1 ms at 4 devices.
        full = _place_band(img, band_lo, band_hi, max_rows, config)
        img = jax.lax.psum_scatter(full, axis, scatter_dimension=0, tiled=True)
    aux = dict(
        # max over devices: the right saturation signal for per-device
        # capacity management
        num_candidates=jax.lax.pmax(pairs.num_candidates, axis),
        # bands partition the pair set exactly, so the sum is the global
        # pair count (equals the single-device count).
        num_pairs=jax.lax.psum(pairs.num_pairs, axis),
    )
    return img, aux


def _scene_spec(scene: GaussianScene, axis: str) -> GaussianScene:
    return GaussianScene(
        means=P(None, axis),
        scales=P(None, axis),
        quats=P(axis),
        opacities=P(axis),
        colors=P(None, axis),
        sh=None if scene.sh is None else P(None, None, axis),
        sh_degree=scene.sh_degree,
        count=scene.count,
        bounds_min=scene.bounds_min,
        bounds_max=scene.bounds_max,
    )


def _validate(config: RenderConfig, mesh: Mesh, axis: str, scene: GaussianScene):
    n_dev = mesh.shape[axis]
    if config.sort_bands > 1:
        raise ValueError(
            "sort_bands is single-device only: the tile-row-sharded "
            "pipeline already divides the sort across devices; run with "
            "sort_bands=0 (bench.py --bands refuses --devices > 1 for "
            "the same reason)"
        )
    if config.tiles_y % n_dev != 0:
        raise ValueError(
            f"tiles_y ({config.tiles_y}) must be divisible "
            f"by the device count ({n_dev}) for tile-row sharding"
        )
    rows = config.tiles_y // n_dev
    if config.balanced_bands and n_dev > 1:
        rows = min(config.tiles_y, 2 * rows)  # static raster-buffer height
    band_tiles = rows * config.tiles_x
    if band_tiles % config.cell_tiles(band_tiles) != 0:
        # Only reachable with an EXPLICIT tiles_per_cell (the auto
        # default adapts to the per-device band).
        raise ValueError(
            f"per-device tile band ({band_tiles} tiles) must be divisible by "
            f"tiles_per_cell ({config.tiles_per_cell})"
        )
    n = scene.means.shape[-1]
    if n % n_dev != 0:
        raise ValueError(
            f"splat count ({n}) must be divisible by the device count "
            f"({n_dev}); pad the scene first (GaussianScene.pad_to_multiple)"
        )


def render_frame_sharded(
    scene: GaussianScene,
    camera_data: dict,
    config: RenderConfig,
    capacity_per_device: int,
    mesh: Mesh,
    axis: str = "tiles",
):
    """Mesh-parallel render: splat-sharded projection, all-gather, tile-row
    sharded binning/sort/raster.  Returns the image with rows sharded over
    ``axis`` plus aggregate pair statistics.
    """
    _validate(config, mesh, axis, scene)
    capacity_per_device = round_capacity(capacity_per_device)
    fn = jax.shard_map(
        functools.partial(
            _render_shard,
            config=config,
            capacity_per_device=capacity_per_device,
            axis=axis,
        ),
        mesh=mesh,
        in_specs=(_scene_spec(scene, axis), P()),
        out_specs=(P(axis), P()),
        # Pallas calls inside the shard don't annotate varying-mesh-axes
        # metadata; skip the strict vma check.
        check_vma=False,
    )
    return fn(scene, camera_data)


def render_frames_sharded(
    scene: GaussianScene,
    camera_batch: dict,
    config: RenderConfig,
    capacity_per_device: int,
    mesh: Mesh,
    frame_axis: str = "frames",
    tile_axis: str = "tiles",
):
    """Frame-parallel + tile-row-sharded render over a 2D mesh.

    ``camera_batch`` is a camera_data pytree with a leading frame axis
    (build with ``stack_cameras``); the batch size must be a multiple of
    the frame-axis size.  Each frame group renders its cameras
    sequentially, tile-row-sharded over the inner axis.  Returns images
    [frames, screen, screen, 4] (sharded over both axes) and per-frame
    pair statistics.
    """
    _validate(config, mesh, tile_axis, scene)
    capacity_per_device = round_capacity(capacity_per_device)
    n_frames = mesh.shape[frame_axis]
    batch = jax.tree_util.tree_leaves(camera_batch)[0].shape[0]
    if batch % n_frames != 0:
        raise ValueError(
            f"camera batch ({batch}) must be divisible by the frame-axis "
            f"size ({n_frames})"
        )

    def body(scene_shard, cams_shard):
        render = functools.partial(
            _render_shard,
            scene_shard,
            config=config,
            capacity_per_device=capacity_per_device,
            axis=tile_axis,
        )
        # Sequential over this group's frames; parallel across groups.
        return jax.lax.map(render, cams_shard)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(_scene_spec(scene, tile_axis), P(frame_axis)),
        out_specs=(P(frame_axis, tile_axis), P(frame_axis)),
        check_vma=False,
    )
    return fn(scene, camera_batch)


def render_frames_tilesharded(
    scene: GaussianScene,
    camera_batch: dict,
    config: RenderConfig,
    capacity_per_device: int,
    mesh: Mesh,
    axis: str = "tiles",
):
    """Sequential-frame render of a camera batch on a 1-axis (tile-row)
    mesh: one dispatch, a device-side ``lax.map`` over frames — no
    per-frame host round-trip (the throughput path for orbit/fly-through
    batches when every device participates in each frame).
    """
    _validate(config, mesh, axis, scene)
    capacity_per_device = round_capacity(capacity_per_device)

    def body(scene_shard, cams):
        render = functools.partial(
            _render_shard,
            scene_shard,
            config=config,
            capacity_per_device=capacity_per_device,
            axis=axis,
        )
        return jax.lax.map(render, cams)

    fn = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(_scene_spec(scene, axis), P()),
        out_specs=(P(None, axis), P()),
        check_vma=False,
    )
    return fn(scene, camera_batch)


def stack_cameras(cameras: List[Camera]) -> dict:
    """[Camera] -> camera_data pytree with a leading frame axis."""
    return jax.tree.map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
        *[c.camera_data() for c in cameras],
    )


class DistributedRenderer:
    """Host-side multi-chip renderer mirroring render.Renderer: jit
    caching over (capacity, mesh), per-device adaptive capacity driven by
    the pmax'd candidate count, and reference-style saturation handling
    (an overflowing frame renders truncated; the next frame grows).
    """

    MAX_CAPACITY = _KERNEL_MAX_CAPACITY

    def __init__(
        self,
        scene: GaussianScene,
        config: RenderConfig = RenderConfig(),
        *,
        mesh: Optional[Mesh] = None,
        n_devices: Optional[int] = None,
    ):
        self.mesh = mesh if mesh is not None else make_mesh(n_devices)
        self.axes = self.mesh.axis_names
        self.tile_axis = self.axes[-1]
        self.n_tile_devices = self.mesh.shape[self.tile_axis]
        self.n_frame_devices = (
            self.mesh.shape[self.axes[0]] if len(self.axes) == 2 else 1
        )
        self.config = config
        # Non-divisible splat counts are padded up front.
        from ..ops.expand import PREP_BLK
        self.scene = scene.pad_to_multiple(PREP_BLK * self.n_tile_devices)
        _validate(config, self.mesh, self.tile_axis, self.scene)
        # Per-device capacity: the global estimate split across bands.
        self.capacity = max(
            1 << 14,
            config.tile_capacity(self.scene.count) // self.n_tile_devices,
        )
        # Clamp to the emit kernel's exact-f32 limit (a big scene's
        # factor estimate can exceed it on a small mesh).
        self.capacity = min(
            round_capacity(self.capacity), self.MAX_CAPACITY
        )
        self.saturated = False
        self.adaptive = config.capacity is None
        self._fns: Dict[tuple, object] = {}
        self.frame_count = 0

    def _bucket(self, candidates: int) -> int:
        """Per-device bucket: 20% headroom, 32Ki grain (the per-device
        counts are smaller and vary more across bands than the global
        Renderer bucket's 8% / 64Ki, render.Renderer._bucket)."""
        want = max(1 << 14, int(candidates * 1.2))
        grain = 1 << 15
        return min(-(-want // grain) * grain, self.MAX_CAPACITY)

    def _get_fn(self, batched: bool):
        key = (self.capacity, batched)
        if key not in self._fns:
            cfg, cap, mesh = self.config, self.capacity, self.mesh
            if batched and len(self.axes) == 2:
                fn = jax.jit(
                    lambda s, c: render_frames_sharded(
                        s, c, cfg, cap, mesh,
                        frame_axis=self.axes[0], tile_axis=self.tile_axis,
                    )
                )
            elif batched:
                fn = jax.jit(
                    lambda s, c: render_frames_tilesharded(
                        s, c, cfg, cap, mesh, axis=self.tile_axis
                    )
                )
            else:
                fn = jax.jit(
                    lambda s, c: render_frame_sharded(
                        s, c, cfg, cap, mesh, axis=self.tile_axis
                    )
                )
            self._fns[key] = fn
        return self._fns[key]

    def _update_capacity(self, candidates: int):
        # ``candidates`` is the pmax'd PER-DEVICE in-band candidate count.
        if candidates > self.MAX_CAPACITY:
            warn_capacity_ceiling(self, candidates)
        if self.adaptive:
            self.capacity = self._bucket(candidates)
            self.saturated = False
        else:
            self.saturated = candidates >= self.capacity

    def render(self, camera: Camera, *, check_saturation: bool = True) -> np.ndarray:
        if self.saturated:
            self.capacity = min(self.capacity * 2, self.MAX_CAPACITY)
            self.saturated = False
        image, aux = self._get_fn(False)(self.scene, camera.camera_data())
        self.frame_count += 1
        if check_saturation:
            self._update_capacity(int(aux["num_candidates"]))
        return np.asarray(image)

    def render_batch(
        self, cameras: List[Camera], *, check_saturation: bool = True
    ) -> np.ndarray:
        """Batch render: frame-parallel on a 2D mesh (make_mesh_2d), or a
        single-dispatch device-side frame loop on a 1-axis mesh — either
        way ONE host round-trip for the whole batch."""
        if self.saturated:
            self.capacity = min(self.capacity * 2, self.MAX_CAPACITY)
            self.saturated = False
        cams = stack_cameras(cameras)
        images, aux = self._get_fn(True)(self.scene, cams)
        self.frame_count += len(cameras)
        if check_saturation:
            self._update_capacity(int(np.asarray(aux["num_candidates"]).max()))
        return np.asarray(images)

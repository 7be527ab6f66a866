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
    slice of tile rows.  The sort — the dominant stage — shrinks by the
    device count, so scaling is near-linear where it matters.
  * FRAME parallelism: an optional leading camera axis batches frames
    data-parallel (each device renders whole frames); compose with tile
    sharding via a 2D mesh.

The final image comes out row-sharded across devices — exactly the
layout a sharded encoder or tiled display consumer wants.

Everything is expressed with shard_map + explicit collectives riding
ICI; there is no NCCL-style host orchestration to translate.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..config import RenderConfig
from ..models.scene import GaussianScene
from ..ops.binning import build_tile_pairs
from ..ops.projection import SplatClipData, project_splats
from ..ops.ranges import tile_ranges
from ..ops.raster import pack_pair_data, rasterize_tiles, tiles_to_image
from ..ops.sorting import sort_pairs
from ..render import _splat_colors


def make_mesh(n_devices: Optional[int] = None, axis: str = "tiles") -> Mesh:
    devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.asarray(devices), (axis,))


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
    clip = project_splats(scene.means, scene.scales, scene.quats, camera_data, config)

    # --- all-gather the compact clip data + colors over ICI ---
    def gather(x):
        return jax.lax.all_gather(x, axis, axis=x.ndim - 1, tiled=True)

    clip = SplatClipData(*[gather(f) for f in clip])
    colors = gather(colors)
    opacities = gather(scene.opacities)

    # --- tile-parallel stages: restrict to this device's tile rows ---
    # Splats whose ellipse AABB misses the band get their extents zeroed;
    # they then emit zero candidate tiles, exactly like culled splats.
    # (Straddling splats still emit a few out-of-band pairs, which sort
    # into tiles this device never rasterizes — harmless.)
    rows_per_dev = config.tiles_per_screen // n_dev
    band_lo = (idx * rows_per_dev).astype(jnp.float32)
    tile_clip = 2.0 * config.tile_size / config.screen_size
    y_lo = band_lo * tile_clip - 1.0
    y_hi = (band_lo + rows_per_dev) * tile_clip - 1.0
    hy = jnp.abs(clip.sin_t * clip.e0) + jnp.abs(clip.cos_t * clip.e1)
    in_band = (clip.cy + hy >= y_lo) & (clip.cy - hy <= y_hi)
    bandf = in_band.astype(jnp.float32)
    clip = clip._replace(e0=clip.e0 * bandf, e1=clip.e1 * bandf)

    pairs = build_tile_pairs(clip, colors, opacities, config, capacity_per_device)
    keys, _, attrs = sort_pairs(pairs)
    starts, counts = tile_ranges(keys, config)
    pair_data = pack_pair_data(attrs, config.raster_chunk)

    # Rasterize only this band's tiles, offset to their screen position.
    band_tiles = rows_per_dev * config.tiles_per_screen
    t0 = idx * band_tiles
    starts_b = jax.lax.dynamic_slice(starts, (t0,), (band_tiles,))
    counts_b = jax.lax.dynamic_slice(counts, (t0,), (band_tiles,))
    tiles = rasterize_tiles(
        pair_data,
        starts_b,
        counts_b,
        config,
        num_tiles=band_tiles,
        tile_row_offset=idx * rows_per_dev,
    )
    img = tiles_to_image(tiles, config)
    aux = dict(
        # max over devices: the right saturation signal for per-device
        # capacity management
        num_candidates=jax.lax.pmax(pairs.num_candidates, axis),
        num_pairs=jax.lax.psum(pairs.num_pairs, axis),
    )
    return img, aux


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
    n_dev = mesh.shape[axis]
    if config.tiles_per_screen % n_dev != 0:
        raise ValueError(
            f"tiles_per_screen ({config.tiles_per_screen}) must be divisible "
            f"by the device count ({n_dev}) for tile-row sharding"
        )
    band_tiles = (config.tiles_per_screen // n_dev) * config.tiles_per_screen
    if band_tiles % config.tiles_per_cell != 0:
        raise ValueError(
            f"per-device tile band ({band_tiles} tiles) must be divisible by "
            f"tiles_per_cell ({config.tiles_per_cell})"
        )
    fn = jax.shard_map(
        functools.partial(
            _render_shard,
            config=config,
            capacity_per_device=capacity_per_device,
            axis=axis,
        ),
        mesh=mesh,
        in_specs=(
            GaussianScene(
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
            ),
            P(),
        ),
        out_specs=(P(axis), P()),
        # Pallas calls inside the shard don't annotate varying-mesh-axes
        # metadata; skip the strict vma check.
        check_vma=False,
    )
    return fn(scene, camera_data)

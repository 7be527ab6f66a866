"""Per-tile list ranges — stage E of the frame pipeline.

The reference launches one thread per sorted pair and scatters range
boundaries on key changes into a tileRange buffer pre-cleared to -1
(evaluateTileRangesKernel, /root/reference/src/GaussianRender.cu:857-906;
clear at Demo.cpp:400-403).  On TPU a scatter is the wrong tool: with the
list sorted, each tile's [start, end) is a pair of vectorized binary
searches over the keys — 2*(tiles+1) searches total, no clear pass, empty
tiles naturally yielding start == end.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

from ..config import RenderConfig
from .binning import DEPTH_BITS_PACKED


def tile_ranges(
    sorted_keys: Tuple[jnp.ndarray, ...], config: RenderConfig
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (starts [T], counts [T]) for all T tiles.

    ``sorted_keys``: operands from sorting.sort_pairs — either the single
    packed uint32 key or (tile, depth).
    """
    t = config.total_tiles
    if len(sorted_keys) == 1:
        keys = sorted_keys[0]
        # Boundary of tile i is the smallest possible key of tile i.
        boundaries = (
            jnp.arange(t + 1, dtype=jnp.uint32) << jnp.uint32(DEPTH_BITS_PACKED)
        )
        edges = jnp.searchsorted(keys, boundaries, side="left").astype(jnp.int32)
    else:
        tiles = sorted_keys[0]
        boundaries = jnp.arange(t + 1, dtype=jnp.uint32)
        edges = jnp.searchsorted(tiles, boundaries, side="left").astype(jnp.int32)
    starts = edges[:-1]
    counts = edges[1:] - edges[:-1]
    return starts, counts


def tile_ranges_grouped(
    sorted_keys: Tuple[jnp.ndarray, ...],
    boundaries: jnp.ndarray,
    group_capacity: int,
    config: RenderConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tile ranges over a flattened per-group-sorted list.

    The flat array is globally key-sorted by construction (group sentinels
    take the next group's first key), so ONE searchsorted pass still finds
    every tile edge; the only correction needed is clamping each tile's
    edges to its own group's row, because a probe on a group boundary can
    land in the previous row's sentinel run.
    """
    t = config.total_tiles
    keys = sorted_keys[0]
    tile_ids = jnp.arange(t + 1, dtype=jnp.uint32)
    edges = jnp.searchsorted(
        keys, tile_ids << jnp.uint32(DEPTH_BITS_PACKED), side="left"
    ).astype(jnp.int32)
    # Group of each tile; duplicate boundaries (empty groups) resolve to
    # the group whose range actually contains the tile.
    g_of_t = (
        jnp.searchsorted(boundaries, jnp.arange(t, dtype=jnp.int32), side="right") - 1
    ).astype(jnp.int32)
    row_lo = g_of_t * group_capacity
    row_hi = row_lo + group_capacity
    starts = jnp.clip(edges[:-1], row_lo, row_hi)
    ends = jnp.clip(edges[1:], row_lo, row_hi)
    return starts, jnp.maximum(ends - starts, 0)

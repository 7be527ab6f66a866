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

"""Tile-list sort — stage D of the frame pipeline.

The reference delegates to cub::DeviceRadixSort over 44 of 64 key bits
(sortTileList, /root/reference/src/GaussianRender.cu:804-855).  On TPU the
baseline is XLA's variadic sort: a single uint32 key (packed tile|depth)
with the int32 splat index as payload, or a two-key lexicographic sort for
the wide-depth mode.  Invalid entries carry the all-ones sentinel key and
therefore land in a dead suffix of the list, which the tile-range stage
never addresses — this is how the dynamically-sized CUDA list becomes a
statically-shaped TPU array.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from .binning import TilePairs


def sort_pairs(pairs: TilePairs) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Sort the pair list by (tile asc, depth front-to-back).

    Returns (sorted key operands, sorted values).
    """
    ops = (*pairs.keys, pairs.values)
    num_keys = len(pairs.keys)
    # Stable: equal-depth pairs keep emission (= splat index) order, making
    # results deterministic — unlike the reference, whose tie order depends
    # on CUDA block scheduling.
    sorted_ops = jax.lax.sort(ops, num_keys=num_keys, is_stable=True)
    return sorted_ops[:num_keys], sorted_ops[num_keys]

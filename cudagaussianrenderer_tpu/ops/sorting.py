"""Tile-list sort — stage D of the frame pipeline.

The reference delegates to cub::DeviceRadixSort over 44 of 64 key bits on
(key, splat-index) pairs, then the rasterizer chases the indices with
uncoalesced loads (sortTileList, /root/reference/src/GaussianRender.cu:
804-855; loads at cu:950-963).  On TPU random gathers are serial and slow,
so the sort is *variadic*: XLA's multi-operand sort moves the raster
attributes together with the key.  The rasterizer then streams attribute
rows sequentially — no post-sort gather exists anywhere in the pipeline.

Invalid entries carry the all-ones sentinel key and land in a dead suffix
of the list, which the tile-range stage never addresses — this is how the
dynamically-sized CUDA list becomes a statically-shaped TPU array.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .binning import TilePairs


def sort_pairs(
    pairs: TilePairs, *, with_values: bool = False, stable: bool = False
) -> Tuple[Tuple[jnp.ndarray, ...], Optional[jnp.ndarray], Tuple[jnp.ndarray, ...]]:
    """Sort the pair list by (tile asc, depth front-to-back).

    Returns (sorted key operands, sorted values or None, sorted attr
    operands).  ``with_values`` additionally carries the splat indices —
    useful for tests and debugging, skipped in production to keep sort
    bandwidth down (and forces a stable sort so the index/attr pairing is
    bit-reproducible).

    ``stable`` keeps emission order among equal keys at a measured 26%
    stage cost; the default unstable sort is still deterministic for a
    given compiled program (the reference's tie order is scheduling-
    dependent, cu:672-712).
    """
    num_keys = len(pairs.keys)
    extra = (pairs.values,) if with_values else ()
    ops = (*pairs.keys, *extra, *pairs.attrs)
    sorted_ops = jax.lax.sort(
        ops, num_keys=num_keys, is_stable=stable or with_values
    )
    keys = sorted_ops[:num_keys]
    off = num_keys
    values = None
    if with_values:
        values = sorted_ops[off]
        off += 1
    attrs = sorted_ops[off:]
    return keys, values, attrs

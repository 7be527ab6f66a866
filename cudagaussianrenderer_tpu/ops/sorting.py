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


def sort_pairs_grouped(
    pairs: TilePairs,
    n_groups: int,
    group_capacity: int,
    *,
    with_values: bool = False,
    stable: bool = False,
) -> Tuple[Tuple[jnp.ndarray, ...], Optional[jnp.ndarray], Tuple[jnp.ndarray, ...]]:
    """Batched per-group sort of a keyspace-grouped pair list.

    Groups are contiguous key ranges and group sentinels carry the next
    group's first key (binning.build_tile_pairs_grouped), so sorting each
    [group_capacity] row independently leaves the FLATTENED array globally
    sorted — at a fraction of a flat lax.sort's cost (measured 16.6 ms ->
    6.8 ms at 4.19M pairs, 5 operands, 128 groups on v5e).
    """
    extra = (pairs.values,) if with_values else ()
    ops = (*pairs.keys, *extra, *pairs.attrs)
    ops2 = tuple(o.reshape(n_groups, group_capacity) for o in ops)
    sorted_ops = jax.lax.sort(
        ops2, num_keys=1, is_stable=stable or with_values, dimension=1
    )
    flat = tuple(o.reshape(-1) for o in sorted_ops)
    keys = flat[:1]
    off = 1
    values = None
    if with_values:
        values = flat[off]
        off += 1
    return keys, values, flat[off:]

"""Per-tile list ranges — stage E of the frame pipeline.

The reference launches one thread per sorted pair and scatters range
boundaries on key changes into a tileRange buffer pre-cleared to -1
(evaluateTileRangesKernel, /root/reference/src/GaussianRender.cu:857-906;
clear at Demo.cpp:400-403).  On TPU a scatter is the wrong tool: with the
list sorted, each tile's [start, end) is a pair of binary searches.

XLA's vectorized ``searchsorted`` executes its per-level gathers over the
full multi-megabyte key array serially and cost 1.85 ms in-frame at the
bench workload (3.7x its cache-warm microbenchmark).  A binary-search
Pallas kernel is no better (scalar dynamic indexing in a per-probe loop
wedges the Mosaic compiler), so the stage inverts the problem: because
the list is SORTED, per-tile counts determine every edge by prefix sum —
and counts are an exact tile HISTOGRAM, which vectorizes perfectly.  The
histogram factorizes over hi = tile >> 6 and lo = tile & 63: per key
block, H[hi, lo] += onehot(hi) x onehot(lo) is a lane-contracting bf16
matmul on the MXU (0/1 products with f32 accumulation are exact below
2^24), the same pattern as the emit kernel's one-hot selection.  Invalid
keys carry sentinel tile ids beyond the probe range and drop out when the
cumulative histogram is sliced to T+1 edges.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from ..config import RenderConfig
from .binning import DEPTH_BITS_PACKED, SENTINEL_KEY_U32

# Lanes per histogram block: [8, 8192] uint32 = 256 KB VMEM (x2 buffers).
_HIST_LANES = 8192


def _hist_kernel(keys_ref, out_ref, *, shift, hi_bins):
    """Accumulate the [hi_bins, 64] tile histogram of one key block."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    u = (keys_ref[:, :] >> shift).astype(jnp.int32)  # [8, L] tile ids
    hi = u >> 6
    lo = u & 63
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (hi_bins, 1), 0)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (64, 1), 0)
    acc = jnp.zeros((hi_bins, 64), jnp.float32)
    for s in range(hi.shape[0]):
        a = (hi[s : s + 1, :] == iota_hi).astype(jnp.bfloat16)  # [hi_bins, L]
        bm = (lo[s : s + 1, :] == iota_lo).astype(jnp.bfloat16)  # [64, L]
        acc = acc + jax.lax.dot_general(
            a, bm, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
    out_ref[:, :] += acc


def _edges_pallas(
    keys: jnp.ndarray, num_probes: int, shift: int, interpret
) -> jnp.ndarray:
    """All-probe edge positions over sorted uint32 ``keys`` (probe t has
    value t << shift; edge = #keys < probe = cumulative tile histogram)."""
    n = keys.shape[0]
    blk = 8 * _HIST_LANES
    nb = -(-n // blk)
    # Sentinel padding maps past the probe range and never lands in a bin
    # that survives the [:num_probes] slice.
    keys_p = jnp.pad(keys, (0, nb * blk - n), constant_values=SENTINEL_KEY_U32)
    keys_2d = keys_p.reshape(nb * 8, _HIST_LANES)

    hi_bins = -(-num_probes // 64)
    hi_bins = max(8, -(-hi_bins // 8) * 8)  # sublane-align
    kernel = functools.partial(_hist_kernel, shift=shift, hi_bins=hi_bins)
    hist = pl.pallas_call(
        kernel,
        grid=(nb,),
        in_specs=[pl.BlockSpec((8, _HIST_LANES), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((hi_bins, 64), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((hi_bins, 64), jnp.float32),
        interpret=interpret,
    )(keys_2d)
    counts = hist.reshape(hi_bins * 64).astype(jnp.int32)
    edges = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), jnp.cumsum(counts)]
    )
    return edges[:num_probes]


def tile_ranges(
    sorted_keys: Tuple[jnp.ndarray, ...],
    config: RenderConfig,
    *,
    band_rows=None,
    band_capacity: int = 0,
    interpret=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Compute (starts [T], counts [T]) for all T tiles.

    ``sorted_keys``: operands from sorting.sort_pairs — either the single
    packed uint32 key or (tile, depth).

    ``band_rows``/``band_capacity``: for band-major lists
    (ops.banded build_tile_pairs_banded + sort_pairs_banded), band
    g's valid pairs start at slot g * band_capacity and its sentinel run
    sits between bands, so starts are the band offset plus the tile's
    WITHIN-BAND cumulative count.  Per-tile counts come from the same
    global histogram either way (sentinels never land in a surviving
    bin, wherever they sit).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    t = config.total_tiles
    if len(sorted_keys) == 1:
        # Boundary of tile i is the smallest possible key of tile i.
        edges = _edges_pallas(
            sorted_keys[0], t + 1, DEPTH_BITS_PACKED, interpret
        )
    else:
        edges = _edges_pallas(sorted_keys[0], t + 1, 0, interpret)
    counts = edges[1:] - edges[:-1]
    if band_rows is None:
        return edges[:-1], counts

    g_bands = band_rows.shape[0] - 1
    tile_row = jnp.arange(t, dtype=jnp.int32) // config.tiles_x
    # Band id per tile + per-tile band base (one-hot selects — G is tiny,
    # and a gather over 4096 tiles would execute serially on TPU).
    starts = jnp.zeros(t, jnp.int32)
    for g in range(g_bands):
        lo = band_rows[g]
        hi = band_rows[g + 1]
        in_band = (tile_row >= lo) & (tile_row < hi)
        band_edge0 = jax.lax.dynamic_index_in_dim(
            edges, lo * config.tiles_x, keepdims=False
        )
        starts = jnp.where(
            in_band, g * band_capacity + edges[:-1] - band_edge0, starts
        )
    return starts, counts

"""Segmented expand — the Pallas workhorse behind tile-list construction.

Problem: replicate per-splat attribute vectors across their candidate-tile
segments — slot j of the pair list gets the attributes of the splat whose
[excl_i, incl_i) prefix-sum segment contains j.  The CUDA reference does
this with warp scans + shared-memory staging (GaussianRender.cu:566-628);
XLA formulations need a gather / scatter / searchsorted over millions of
slots, all of which execute serially on TPU (measured ~100+ ms at 1M
splats on v5e).

TPU-native approach: one-hot selection on the MXU.
  * The slot axis is blocked; a tiny host-side searchsorted gives each
    block its first owning splat (scalar-prefetched).
  * Each block DMAs a lane-aligned window of splat rows, builds the
    match matrix M[j, w] = (excl_w <= j) & (j < incl_w) with iota
    compares, and computes out[:, j] = attrs_window @ M^T on the MXU.
  * Selection is EXACT: each output element is 1*x + 0*... in float32,
    so float payloads pass through bit-identically and integer payloads
    are exact for values < 2^24 (all of ours are).
  * Windows wider than one tile of splats (dense runs of zero-count,
    culled splats) are handled by accumulating over sub-windows in a
    loop — each slot matches exactly one splat globally, so the
    accumulation stays exact.  Window DMAs are double-buffered.
  * Blocks entirely past the candidate total short-circuit to zeros
    (with a generous capacity, a third of the list can be dead).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Slots per grid block and splats per DMA window.
MAX_BLOCK = 1024
WINDOW = 512

# f32 can represent integers exactly only below 2^24; all integer payloads
# (prefix sums clamped to capacity, tile coords, packed rgb, splat ids)
# must stay under this.
MAX_EXACT_I32 = 1 << 24


def _expand_kernel(
    starts_ref, rows_hbm, out_ref, win_buf, sems, *, num_rows, block
):
    b = pl.program_id(0)
    s0 = starts_ref[b]
    s1 = starts_ref[b + 1]
    total = starts_ref[pl.num_programs(0) + 1]
    a0 = (s0 // 128) * 128
    num_windows = (s1 - a0) // WINDOW + 1

    live = b * block < total

    def make_dma(slot, wi):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds(a0 + wi * WINDOW, WINDOW)],
            win_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(jnp.logical_not(live))
    def _():
        out_ref[:, :] = jnp.zeros((num_rows, block), jnp.float32)

    @pl.when(live)
    def _():
        # Absolute slot index of each output column, on sublanes for the
        # match-matrix build.
        j = (
            b * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        ).astype(jnp.float32)

        make_dma(0, 0).start()

        def body(wi, acc):
            slot = jax.lax.rem(wi, 2)

            @pl.when(wi + 1 < num_windows)
            def _():
                make_dma(1 - slot, wi + 1).start()

            make_dma(slot, wi).wait()
            win = win_buf[slot]
            excl = win[0:1, :]  # [1, WINDOW]
            incl = win[1:2, :]
            match = ((excl <= j) & (j < incl)).astype(jnp.bfloat16)  # [block, W]

            # Exact f32 selection via three single-pass bf16 matmuls:
            # truncation-split x = hi + mid + lo (8+8+8 mantissa bits, each
            # part bf16-representable), select each part with the one-hot
            # match (1.0 * part is exact), re-sum in f32 (telescoping sums
            # of the parts are exactly representable).  Half the MXU passes
            # of a Precision.HIGHEST f32 matmul.
            mask = jnp.uint32(0xFFFF0000)
            hi = pltpu.bitcast(pltpu.bitcast(win, jnp.uint32) & mask, jnp.float32)
            r1 = win - hi
            mid = pltpu.bitcast(pltpu.bitcast(r1, jnp.uint32) & mask, jnp.float32)
            lo = r1 - mid

            def sel(part):
                return jax.lax.dot_general(
                    part.astype(jnp.bfloat16),
                    match,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [num_rows, block]

            return acc + (sel(hi) + sel(mid)) + sel(lo)

        acc = jax.lax.fori_loop(
            0, num_windows, body, jnp.zeros((num_rows, block), jnp.float32)
        )
        out_ref[:, :] = acc


def segmented_expand(
    rows: jnp.ndarray, incl: jnp.ndarray, capacity: int, *, interpret=None
) -> jnp.ndarray:
    """Expand per-splat rows into per-slot rows.

    rows: [A, N] float32 per-splat attributes (integers pre-cast to f32,
          all values < 2^24 in magnitude).
    incl: [N] int32 inclusive prefix sum of candidate counts.
    Returns [R, capacity] float32 planar rows, R = A + 2 rounded up to a
    sublane multiple: row 0 = segment start (excl), row 1 = segment end
    (incl) — both clamped to capacity + 1 — rows 2..A+1 the expanded
    attributes, and zero padding rows after.  Slots beyond the total
    candidate count are all-zero.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block = MAX_BLOCK
    while block > 128 and capacity % block:
        block //= 2
    if capacity % block != 0:
        raise ValueError(f"capacity must be a multiple of {block}")
    if capacity + 1 >= MAX_EXACT_I32:
        raise ValueError("capacity too large for exact f32 selection")
    a, n = rows.shape

    clamp = capacity + 1
    incl_c = jnp.minimum(incl, clamp)
    # excl[i] = incl[i-1] (exclusive prefix), excl[0] = 0.
    excl_c = jnp.minimum(jnp.pad(incl[:-1], (1, 0)), clamp)

    full = jnp.concatenate(
        [excl_c[None].astype(jnp.float32), incl_c[None].astype(jnp.float32), rows]
    )  # [A + 2, N]
    # Row count padded to a sublane multiple (Mosaic DMA tiling), columns
    # padded so aligned windows can run past the last splat.
    num_rows = -(-(a + 2) // 8) * 8
    full = jnp.pad(full, ((0, num_rows - (a + 2)), (0, 2 * WINDOW + 128)))

    nblocks = capacity // block
    # First splat owning each block's first slot, a final bound, and the
    # candidate total (for dead-block short-circuiting).
    probes = jnp.arange(nblocks + 1, dtype=jnp.int32) * block
    starts = jnp.clip(
        jnp.searchsorted(incl_c, probes, side="right").astype(jnp.int32), 0, n - 1
    )
    starts = jnp.concatenate([starts, jnp.minimum(incl[-1:], capacity)])

    kernel = functools.partial(_expand_kernel, num_rows=num_rows, block=block)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((num_rows, block), lambda i, *_: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, num_rows, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_rows, capacity), jnp.float32),
        interpret=interpret,
    )(starts, full)

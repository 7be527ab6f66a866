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


def _grouped_expand_kernel(
    ws_ref,        # SMEM [G*nb] i32: first window index per block
    nw_ref,        # SMEM [G*nb] i32: windows to walk per block (0 = dead)
    base_ref,      # SMEM [G*nb] i32: candidate prefix before the first window
    blo_ref,       # SMEM [G+1] i32: group tile-range boundaries
    rows_hbm,      # HBM [16, Npad] f32 (15 attr rows + zero pad row)
    out_ref,       # VMEM [16, block]: rows 0..14 attrs, row 15 = excl
    win_buf,       # VMEM scratch [2, 16, W]
    sems,
    *,
    block,
    nb,
    tiles_x,
):
    pid = pl.program_id(0)
    g = pid // nb
    b = pid - g * nb
    ws = ws_ref[pid]
    nw = nw_ref[pid]
    blo = blo_ref[g]
    bhi = blo_ref[g + 1]
    # Boundary tiles as (row, col); G+1 scalars, serial div is fine.
    r_lo = (blo // tiles_x).astype(jnp.float32)
    c_lo = (blo % tiles_x).astype(jnp.float32)
    r_hi = (bhi // tiles_x).astype(jnp.float32)
    c_hi = (bhi % tiles_x).astype(jnp.float32)

    def make_dma(slot, wi):
        return pltpu.make_async_copy(
            rows_hbm.at[:, pl.ds((ws + wi) * WINDOW, WINDOW)],
            win_buf.at[slot],
            sems.at[slot],
        )

    @pl.when(nw == 0)
    def _():
        out_ref[:, :] = jnp.zeros((16, block), jnp.float32)

    @pl.when(nw > 0)
    def _():
        q = (
            b * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        ).astype(jnp.float32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, WINDOW), 1)

        make_dma(0, 0).start()

        def rect_prefix(r, c, x0, y0, w, h):
            """#tiles of the rect with flat id < row r, col c (exact f32)."""
            full = w * jnp.clip(r - y0, 0.0, h)
            part = jnp.where(
                (y0 <= r) & (r < y0 + h), jnp.clip(c - x0, 0.0, w), 0.0
            )
            return full + part

        def body(wi, carry):
            base, acc = carry
            slot = jax.lax.rem(wi, 2)

            @pl.when(wi + 1 < nw)
            def _():
                make_dma(1 - slot, wi + 1).start()

            make_dma(slot, wi).wait()
            win = win_buf[slot]
            geom_a = win[0:1, :]  # x0*256 + y0
            geom_b = win[1:2, :]  # w*256 + h
            x0 = jnp.floor(geom_a * (1.0 / 256.0))
            y0 = geom_a - x0 * 256.0
            w = jnp.floor(geom_b * (1.0 / 256.0))
            h = geom_b - w * 256.0
            counts = rect_prefix(r_hi, c_hi, x0, y0, w, h) - rect_prefix(
                r_lo, c_lo, x0, y0, w, h
            )  # [1, W]

            # Inclusive cumsum along lanes (exact f32, values < 2^24).
            cum = counts
            shift = 1
            while shift < WINDOW:
                rolled = pltpu.roll(cum, shift, axis=1)
                cum = cum + jnp.where(lane >= shift, rolled, 0.0)
                shift *= 2
            incl = base + cum
            excl = incl - counts
            match = ((excl <= q) & (q < incl)).astype(jnp.bfloat16)  # [block, W]

            # Row 15 is the zero pad row; overwrite with the prefix so the
            # one selection pass carries it to the output.
            win_buf[slot, 15:16, :] = excl
            win = win_buf[slot]

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
                )  # [16, block]

            acc = acc + (sel(hi) + sel(mid)) + sel(lo)
            return incl[0, WINDOW - 1], acc

        base0 = base_ref[pid].astype(jnp.float32)
        _, acc = jax.lax.fori_loop(
            0, nw, body, (base0, jnp.zeros((16, block), jnp.float32))
        )
        out_ref[:, :] = acc


# Output row holding each slot's owning-splat candidate prefix (within its
# group) — appended by the grouped kernel after the 15 attribute rows.
GROUPED_EXCL_ROW = 15


def grouped_expand(
    rows: jnp.ndarray,
    ckpt_incl: jnp.ndarray,
    boundaries: jnp.ndarray,
    group_counts: jnp.ndarray,
    n_groups: int,
    group_capacity: int,
    tiles_x: int,
    *,
    interpret=None,
) -> jnp.ndarray:
    """Keyspace-grouped expansion.

    The pair list is emitted as ``n_groups`` independent segments, group g
    covering the contiguous tile range [boundaries[g], boundaries[g+1]).
    Group boundaries are data-dependent (chosen at equal candidate-count
    quantiles), so the per-splat segment bounds cannot be precomputed like
    segmented_expand's prefix rows; instead each block reconstructs them
    on the fly: window rect rows -> per-splat in-group candidate counts
    (closed form) -> lane cumsum -> running prefix carried across windows,
    seeded from window-granular checkpoints.

    rows: [15, Npad] f32 attr rows, geomA=(x0*256+y0), geomB=(w*256+h)
          first; Npad a multiple of WINDOW.
    ckpt_incl: [G, nwin] i32/f32 inclusive per-window candidate prefixes.
    boundaries: [G+1] i32 tile ids.
    group_counts: [G] i32 candidates per group.
    Returns [16, G * group_capacity]: rows 0..14 = selected attr rows,
    row 15 = owning splat's in-group exclusive prefix.  Slots past a
    group's count are zero.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block = MAX_BLOCK
    while block > 128 and group_capacity % block:
        block //= 2
    if group_capacity % block != 0:
        raise ValueError(f"group_capacity must be a multiple of {block}")
    if n_groups * group_capacity + 1 >= MAX_EXACT_I32:
        raise ValueError("grouped capacity too large for exact f32 selection")
    a, npad = rows.shape
    assert a == 15 and npad % WINDOW == 0, (a, npad)
    nwin = npad // WINDOW
    nb = group_capacity // block

    rows16 = jnp.concatenate([rows, jnp.zeros((1, npad), rows.dtype)])

    # Per-block window ranges + prefix bases, from the checkpoints.
    q0 = jnp.arange(nb, dtype=jnp.int32) * block  # [nb]
    ck = ckpt_incl.astype(jnp.int32)  # [G, nwin]
    ws = jax.vmap(lambda row: jnp.searchsorted(row, q0, side="right"))(ck)
    ws = jnp.minimum(ws, nwin - 1).astype(jnp.int32)  # [G, nb]
    qend = jnp.minimum(q0[None, :] + block, group_counts[:, None]).astype(jnp.int32)
    we = jax.vmap(lambda row, p: jnp.searchsorted(row, p, side="left"))(ck, qend)
    we = jnp.minimum(we, nwin - 1).astype(jnp.int32)
    live = q0[None, :] < group_counts[:, None]
    nw = jnp.where(live, we - ws + 1, 0).astype(jnp.int32)
    base = jnp.where(
        ws > 0, jnp.take_along_axis(ck, jnp.maximum(ws - 1, 0), axis=1), 0
    ).astype(jnp.int32)

    kernel = functools.partial(
        _grouped_expand_kernel, block=block, nb=nb, tiles_x=tiles_x
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n_groups * nb,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((16, block), lambda i, *_: (0, i)),
        scratch_shapes=[
            pltpu.VMEM((2, 16, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((16, n_groups * group_capacity), jnp.float32),
        interpret=interpret,
    )(ws.reshape(-1), nw.reshape(-1), base.reshape(-1), boundaries, rows16)


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

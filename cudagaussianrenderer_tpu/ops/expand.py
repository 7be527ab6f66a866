"""Tile-list emission kernels — the Pallas workhorses behind stage C.

Problem: slot j of the fixed-capacity pair list belongs to the splat whose
[excl_i, incl_i) candidate-count prefix segment contains j; the slot needs
that splat's attributes, its local tile coordinates, and the packed sort
operands.  The CUDA reference does the expansion with warp scans +
shared-memory staging (GaussianRender.cu:566-628); XLA formulations need
a gather / scatter / searchsorted over millions of slots, all of which
execute serially on TPU (measured ~100+ ms at 1M splats on v5e).

TPU-native approach — one fused kernel:
  * The slot axis is blocked; a host-side searchsorted gives each block
    its first owning splat (scalar-prefetched).
  * Each block DMAs lane-aligned [16, W] windows of splat rows (one DMA
    per window), builds the match matrix M[j, w] = (excl_w <= j) &
    (j < incl_w) with iota compares, splits every row into its three
    bf16-exact truncation limbs (8 mantissa bits each) in-VREG, and
    selects the owning rows with ONE [48, W] x [W, block] matmul on the
    MXU — 3x the utilization of per-part M=16 matmuls.
  * Selection is EXACT: each match row is one-hot, so every output
    element IS one limb value, and the telescoping limb re-sum in f32
    reconstructs f32 payloads bit-identically (integers < 2^24 exactly).
  * The per-slot emission math — tile-rect unpack, per-row exact-run
    local tile coords (binning.splat_row_packs; there is no per-candidate
    overlap test to run), sort-key and attribute packing —
    runs IN-KERNEL on the selected rows: keeping it in VMEM instead of a
    post-pass saved ~7 ms/frame of XLA intermediate HBM traffic at 6.3M
    slots, and the kernel writes 8 output rows instead of 16.
  * Window DMAs are double-buffered, and each block's first window is
    prefetched by its predecessor (cross-block software pipeline), hiding
    the per-block HBM latency.
  * Blocks entirely past the candidate total emit sentinel keys directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .geometry import CENTER_SCALE, MF12_K

# Slots per grid block and splats per DMA window (must be a multiple of
# 128 — lane-aligned DMA slices).  A block's splat span averages ~250
# (1024 slots / ~4 pairs each) plus <=127 alignment waste.  Under
# BLOCKS_PER_STEP=4 the wider 512 window wins (kernel-only 4.06 vs 4.49
# ms at W=384): spans past 384 are common enough that the occasional
# second window costs more than 512's larger match area.  256 forces
# two-window walks (5.4 ms); 2048-slot blocks and split 512-slot walks
# both measured worse (see PERF_NOTES).
MAX_BLOCK = 1024
WINDOW = 512
# Consecutive slot blocks emitted per Pallas grid step.  Each block's
# window walk stays independent (match area does NOT grow, unlike
# MAX_BLOCK=2048 which measured worse); batching only amortizes the
# per-grid-step overhead (output-copy DMA issue, step bookkeeping)
# across BPS blocks.
BLOCKS_PER_STEP = 4

# f32 can represent integers exactly only below 2^24; all integer payloads
# (prefix sums clamped to capacity, packed tile rects, packed rgb, splat
# ids) must stay under this.
MAX_EXACT_I32 = 1 << 24
# The largest pair-list capacity the exact-f32 selection supports, with
# block-rounding headroom — the single source of truth for every host
# capacity clamp (render.Renderer, parallel.DistributedRenderer).
MAX_CAPACITY = MAX_EXACT_I32 - (1 << 18)

# Input row layout of the windowed [16, NP] rows array (2 prefix rows +
# 14 attribute rows = one sublane tile).  The array is built by the
# _interleave_rows pass below from flat 1D columns: an XLA jnp.stack of 14
# [1M] rows costs ~1.6 ms of strided sublane writes into (8, 128)-tiled
# memory, while a Pallas pass writing whole (16, blk) tiles is
# bandwidth-bound (~0.15 ms).
R_GEOM, R_DEPTH, R_IDX = 0, 1, 2
R_CX, R_CY = 3, 4
R_CA, R_CB, R_CC, R_RGB, R_ALPHA = 5, 6, 7, 8, 9
R_PACK0 = 10  # .. R_PACK0+3: per-row (dx, w) 6-bit fields, 2 rows each
NUM_ROWS_IN = 14

# Output order (six FLAT [C] uint32 arrays).  Attributes pack to THREE
# sort operands (geometry.py packing: every payload operand costs
# ~3 ms/sort at the bench workload).  Outputs are INTEGER-typed: these
# are arbitrary packed bit patterns, and f32-typed XLA data movement
# corrupts them on TPU (subnormals flush to +/-0, NaN payloads
# canonicalize — see raster.pack_pair_data).  Flat per-operand arrays
# matter for speed: a single [8, C] output made every sort operand a
# sublane row-slice, and extracting six such slices from (8, 128)-tiled
# memory reads the whole array per slice — measured ~2 ms/frame of
# in-frame overhead before the sort.
OUT_KEY0, OUT_KEY1, OUT_VALUES = 0, 1, 2
OUT_CXCY, OUT_CONIC, OUT_RGBA = 3, 4, 5
NUM_OUT = 6

DEPTH_SHIFT = 19
SENTINEL_KEY = 0xFFFFFFFF

# Columns per grid step of the interleave prep kernel (1D input blocks
# must be whole 8x128 tiles).
PREP_BLK = 4096


def _interleave_rows(incl, cols, np_cols, clamp, interpret):
    """Build the [16, NP] windowed rows array from the int32 inclusive
    candidate prefix and 13 flat payload columns, all length NP -
    PREP_BLK (a multiple of PREP_BLK); the final block is zero fill.

    Prefix rows 0-1 (exclusive / inclusive clamped candidate cumsum) are
    derived IN-KERNEL from the single ``incl`` int32 column: the
    exclusive row is a one-lane rotate of the inclusive row with the
    previous block's last value carried through SMEM (the TPU grid runs
    sequentially on one core, so the cross-block carry is exact).  This
    removes the separate excl column and — together with the zero-fill
    of the final grid block — the 15 jnp.pad passes the XLA pre-pass
    used to pay (~0.9 ms/frame at 1M splats; round-5 PERF_NOTES).

    Row 2 + R_IDX (the splat id, a plain iota) is generated in-kernel
    instead of being passed as a column.  The LAST grid block is written
    as all-zeros: it is the window-overrun pad past the final splat
    (zero prefix rows -> zero counts -> no matches), replacing the old
    separately-padded tail.
    """
    n = incl.shape[0]
    nlive = n // PREP_BLK
    assert n % PREP_BLK == 0 and np_cols == n + PREP_BLK

    def kernel(incl_ref, *refs):
        # Signature order: inputs, then outputs, then scratch.
        cols_r, out_ref, carry_ref = refs[:-2], refs[-2], refs[-1]
        i = pl.program_id(0)
        live = i + 1 < pl.num_programs(0)

        def put(r, v):
            out_ref[r : r + 1, :] = jnp.where(
                live, v.reshape(1, PREP_BLK), 0.0
            )

        @pl.when(i == 0)
        def _():
            carry_ref[0] = 0

        incl_b = incl_ref[...].reshape(1, PREP_BLK)
        lane = jax.lax.broadcasted_iota(jnp.int32, (1, PREP_BLK), 1)
        if interpret:
            rolled = jnp.roll(incl_b, 1, axis=1)
        else:
            rolled = pltpu.roll(incl_b, 1, axis=1)
        excl_b = jnp.where(lane == 0, carry_ref[0], rolled)
        # The pad block's prefix rows CONTINUE at the carried total
        # (excl == incl -> zero counts) instead of dropping to zero,
        # keeping the prefix rows globally monotone — windows straddling
        # the live -> pad boundary then carry a well-formed (contiguous,
        # sorted) interval partition, an invariant any future consumer
        # of the rows array can rely on.
        pad_pfx = jnp.broadcast_to(
            jnp.minimum(carry_ref[0], clamp), (1, PREP_BLK)
        ).astype(jnp.float32)
        out_ref[0:1, :] = jnp.where(
            live, jnp.minimum(excl_b, clamp).astype(jnp.float32), pad_pfx
        )
        out_ref[1:2, :] = jnp.where(
            live, jnp.minimum(incl_b, clamp).astype(jnp.float32), pad_pfx
        )

        @pl.when(live)
        def _():
            carry_ref[0] = incl_ref[PREP_BLK - 1]

        k = 0
        for r in range(2, 2 + NUM_ROWS_IN):
            if r == 2 + R_IDX:
                idx = i * PREP_BLK + jax.lax.broadcasted_iota(
                    jnp.int32, (1, PREP_BLK), 1
                )
                put(r, idx.astype(jnp.float32))
            else:
                put(r, cols_r[k][...])
                k += 1

    return pl.pallas_call(
        kernel,
        grid=(np_cols // PREP_BLK,),
        in_specs=[
            pl.BlockSpec((PREP_BLK,), lambda i, n=nlive: (jnp.minimum(i, n - 1),))
            for _ in range(1 + len(cols))
        ],
        out_specs=pl.BlockSpec((2 + NUM_ROWS_IN, PREP_BLK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((2 + NUM_ROWS_IN, np_cols), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
        interpret=interpret,
    )(incl, *cols)


def _rnd_bf16_bits_u32(x, shift=False):
    """Round-to-nearest-even bf16 bit pattern: high half, or the low half
    when ``shift`` (matching geometry._rnd_bf16_bits16)."""
    bits = pltpu.bitcast(x, jnp.uint32)
    r = bits + 0x7FFF + ((bits >> 16) & 1)
    return (r >> 16) if shift else (r & jnp.uint32(0xFFFF0000))


def _emit_kernel(
    starts_ref,
    rows_hbm,
    key0_ref,
    key1_ref,
    values_ref,
    cxcy_ref,
    conic_ref,
    rgba_ref,
    win_buf,
    sems,
    *,
    block,
    bps,
    config: RenderConfig,
    sel_limbs: int = 3,
    bpb: int = 0,
    n_bands: int = 0,
):
    """Slot-expansion emit kernel.

    Flat mode (bpb == 0): prefix rows 0-1 of ``rows_hbm`` carry the
    global clamped candidate cumsum; one dead suffix past ``total``.

    Banded mode (bpb = blocks per band): the rows array is the BAND-
    COMPACTED output of ops.banded._compact_kernel — rows 0-1 carry band-OFFSET
    pair prefixes (g*CG + clamped in-band cumsum), so the walk is dense
    and windows that overrun into a neighboring band's columns are
    self-masking (their prefix segments lie outside this block's slot
    range).  Extra scalars after the block starts give each band's pair
    end slot and tile-row bounds; _emit_payload's band row clamping maps
    band-local ordinals onto in-band tile rows.
    """
    out_refs = (key0_ref, key1_ref, values_ref, cxcy_ref, conic_ref, rgba_ref)
    step = pl.program_id(0)
    nblocks = pl.num_programs(0) * bps
    total = starts_ref[nblocks + 1]
    packed = config.depth_bits == 19
    tiles_x = config.tiles_x

    def make_dma(slot, base, wi):
        """One window = the full [16, W] f32 row block (2 prefix rows +
        14 attr rows) in a single DMA; the bf16 selection limbs are split
        in-VREG, which halves the DMA issue count and drops the 48-row
        bf16 limb array (and its HBM write) from the XLA pre-pass."""
        sl = pl.ds(base + wi * WINDOW, WINDOW)
        return pltpu.make_async_copy(
            rows_hbm.at[:, sl], win_buf.at[slot], sems.at[slot]
        )

    def start(slot, base, wi):
        make_dma(slot, base, wi).start()

    def wait(slot, base, wi):
        make_dma(slot, base, wi).wait()

    # The grid step owns ``bps`` consecutive slot blocks; each keeps its
    # own independent window walk (match area does not grow — batching
    # only amortizes per-step overhead).  The python loop unrolls.
    for k in range(bps):
        _emit_block(
            step * bps + k,
            k,
            nblocks,
            total,
            starts_ref,
            out_refs,
            win_buf,
            sems,
            start,
            wait,
            block=block,
            packed=packed,
            tiles_x=tiles_x,
            config=config,
            sel_limbs=sel_limbs,
            bpb=bpb,
            n_bands=n_bands,
        )


def _store_sentinels(st, out_refs, block, packed, config):
    """All-sentinel output block: keys sort to the dead suffix, values = -1."""
    key0_ref, key1_ref, values_ref, cxcy_ref, conic_ref, rgba_ref = out_refs
    zero = jnp.zeros((1, block), jnp.uint32)
    sent = jnp.full((1, block), SENTINEL_KEY, jnp.uint32)
    if packed:
        st(key0_ref, sent)
        st(key1_ref, zero)
    else:
        st(key0_ref, jnp.full((1, block), config.sentinel_tile, jnp.uint32))
        st(key1_ref, sent)
    st(
        values_ref,
        pltpu.bitcast(jnp.full((1, block), -1, jnp.int32), jnp.uint32),
    )
    st(cxcy_ref, zero)
    st(conic_ref, zero)
    st(rgba_ref, zero)


def _emit_payload(
    acc,
    excl,
    j_lane,
    end_f,
    st,
    out_refs,
    *,
    block,
    packed,
    tiles_x,
    config,
    band_lo=None,
    band_hi=None,
):
    """Fused per-slot emission math on the selected rows (all VMEM).

    ``acc``: [16, block] selected splat rows (R_* layout, rows 0-1 unused
    here), ``excl``: [1, block] each slot's owning-splat exclusive prefix
    (virtual-slot-valued in banded mode), ``end_f``: f32 in-range bound
    for this block's slots.  ``band_lo``/``band_hi`` (traced f32 tile-row
    bounds) activate band-local candidate ordinals: the per-row run walk
    counts only rows inside [band_lo, band_hi) and the full-rect
    fallthrough starts at the first in-band row, mirroring
    ops.banded.band_counts exactly.
    """
    key0_ref, key1_ref, values_ref, cxcy_ref, conic_ref, rgba_ref = out_refs
    banded = band_lo is not None

    def row(r):
        return acc[2 + r : 3 + r, :]  # [1, block]

    in_range = j_lane < end_f

    # Tile rect unpack; /256 is an exact power-of-two float division.
    g = row(R_GEOM)
    g_hi = jnp.floor(g * (1.0 / 256.0))
    w_raw = g - g_hi * 256.0
    x0 = jnp.floor(g_hi * (1.0 / 256.0))
    y0 = g_hi - x0 * 256.0

    # Per-row exact-run slot mapping (binning.splat_row_packs): walk
    # the 8 packed (dx, w) runs to find the row owning local ordinal
    # ``o``; ordinals past the packed total fall through to full-rect
    # rows (row >= 8 of tall splats, or the whole rect of splats too
    # wide to pack, flagged by w_raw > MAX_PACK_W).  All arithmetic
    # on exact small integers in f32.
    o = j_lane - excl
    sel_cum = jnp.zeros((1, block), jnp.float32)
    sel_dx = jnp.zeros((1, block), jnp.float32)
    sel_ly = jnp.zeros((1, block), jnp.float32)
    cum = jnp.zeros((1, block), jnp.float32)
    for p in range(4):
        t = row(R_PACK0 + p)
        t_hi = jnp.floor(t * (1.0 / 4096.0))  # (dx, w) of row 2p
        t_lo = t - t_hi * 4096.0              # (dx, w) of row 2p+1
        for half, r in ((t_hi, 2 * p), (t_lo, 2 * p + 1)):
            dx_r = jnp.floor(half * (1.0 / 64.0))
            w_r = half - dx_r * 64.0
            if banded:
                yr = y0 + float(r)
                w_r = jnp.where((yr >= band_lo) & (yr < band_hi), w_r, 0.0)
            nxt = cum + w_r
            m = ((cum <= o) & (o < nxt)).astype(jnp.float32)
            sel_cum = sel_cum + m * cum
            sel_dx = sel_dx + m * dx_r
            sel_ly = sel_ly + m * float(r)
            cum = nxt
    in_packed = o < cum  # cum = (in-band) packed total
    # Full-rect fallthrough rows.  TPU's f32 divide is a reciprocal
    # multiply, NOT correctly rounded: floor((k*w)/w) lands on k-1
    # for most multiples of many widths (measured: 93% of k at w=61),
    # so correct the quotient by one step against the exact
    # remainder (inputs are exact small ints; the divide is within
    # 1 ulp, so one step suffices).
    extra = o - cum
    w_f = jnp.maximum(w_raw, 1.0)
    ly_rel = jnp.floor(extra / w_f)
    rem = extra - ly_rel * w_f
    ly_rel = (
        ly_rel
        + (rem >= w_f).astype(jnp.float32)
        - (rem < 0.0).astype(jnp.float32)
    )
    lx_o = extra - ly_rel * w_f
    base_row = jnp.where(w_raw > 63.0, 0.0, 8.0)
    if banded:
        # Full-width rows start at the first in-band row (ops.banded.band_counts
        # counts only rows >= max(base, band_lo - y0)).
        base_row = jnp.maximum(base_row, band_lo - y0)
    gy = y0 + jnp.where(in_packed, sel_ly, base_row + ly_rel)
    gx = x0 + jnp.where(in_packed, sel_dx + (o - sel_cum), lx_o)
    valid = in_range

    # Mosaic has no f32->u32 cast; values are < 2^31 so go via i32.
    def to_u32(x):
        return pltpu.bitcast(x.astype(jnp.int32), jnp.uint32)

    tile_u = to_u32(gy * float(tiles_x) + gx)
    q_u = to_u32(row(R_DEPTH))
    sent = jnp.full((1, block), SENTINEL_KEY, jnp.uint32)
    if packed:
        key = (tile_u << DEPTH_SHIFT) | q_u
        key0 = jnp.where(valid, key, sent)
        key1 = jnp.zeros((1, block), jnp.uint32)
    else:
        key0 = jnp.where(
            valid, tile_u, jnp.uint32(config.sentinel_tile)
        )
        key1 = jnp.where(valid, q_u << 8, sent)

    values = jnp.where(
        valid, row(R_IDX).astype(jnp.int32), -1
    )

    # Packed raster attributes (sort operands; must match the XLA
    # packing in geometry.py bit-for-bit).
    def q16(x):
        return to_u32(jnp.clip((x + 1.0) * 0.5, 0.0, 1.0) * CENTER_SCALE + 0.5)

    def mf12(x):
        b16 = _rnd_bf16_bits_u32(x, shift=True)
        v = jnp.clip(
            pltpu.bitcast(b16, jnp.int32) - MF12_K, 0, 4095
        )
        return pltpu.bitcast(v, jnp.uint32)

    def mf12_dec(q):
        return pltpu.bitcast((q + jnp.uint32(MF12_K)) << 16, jnp.float32)

    cxcy = (q16(row(R_CX)) << 16) | q16(row(R_CY))
    qa = mf12(row(R_CA))
    qc = mf12(row(R_CC))
    rho = row(R_CB) / jnp.maximum(
        jnp.sqrt(mf12_dec(qa) * mf12_dec(qc)), 1e-30
    )
    q_rho = to_u32(jnp.clip((rho + 1.0) * 127.5 + 0.5, 0.0, 255.0))
    conic = (qa << 20) | (qc << 8) | q_rho
    rgba = (to_u32(row(R_RGB)) << 8) | to_u32(
        jnp.clip(row(R_ALPHA), 0.0, 1.0) * 255.0 + 0.5
    )

    st(key0_ref, key0)
    st(key1_ref, key1)
    st(values_ref, pltpu.bitcast(values, jnp.uint32))
    st(cxcy_ref, cxcy)
    st(conic_ref, conic)
    st(rgba_ref, rgba)


def _emit_block(
    b,
    k,
    nblocks,
    total,
    starts_ref,
    out_refs,
    win_buf,
    sems,
    start,
    wait,
    *,
    block,
    packed,
    tiles_x,
    config,
    sel_limbs=3,
    bpb=0,
    n_bands=0,
):
    key0_ref, key1_ref, values_ref, cxcy_ref, conic_ref, rgba_ref = out_refs
    s0 = starts_ref[b]
    s1 = starts_ref[b + 1]
    a0 = (s0 // 128) * 128
    num_windows = (s1 - a0) // WINDOW + 1
    # Scalar layout past the block starts, banded mode (bpb > 0):
    # [E + g] band pair-end slot, [E + G + g] lo tile row,
    # [E + 2G + g] hi tile row, with E = nblocks + 2.
    E = nblocks + 2

    def end_of(blk):
        if not bpb:
            return total
        return starts_ref[E + blk // bpb]

    band = None
    if bpb:
        g = b // bpb
        band = (
            starts_ref[E + n_bands + g].astype(jnp.float32),
            starts_ref[E + 2 * n_bands + g].astype(jnp.float32),
        )
    live = b * block < end_of(b)

    # Cross-block software pipeline: windows 0 AND 1 of block b live in
    # slots 2+(b%2) / 4+(b%2), issued by block b-1 (block 0 issues its
    # own), so the typical block — whose walk is exactly two windows —
    # waits on no cold DMA at all.  Slots 0/1 double-buffer windows >= 2.
    my_w0 = 2 + jax.lax.rem(b, 2)
    my_w1 = 4 + jax.lax.rem(b, 2)

    if k == 0:
        @pl.when(b == 0)
        def _():
            start(my_w0, a0, 0)

            @pl.when(live & (num_windows > 1))
            def _():
                start(my_w1, a0, 1)

    @pl.when(b + 1 < nblocks)
    def _():
        next_a0 = (starts_ref[b + 1] // 128) * 128
        start(2 + jax.lax.rem(b + 1, 2), next_a0, 0)
        # Window 1 only for LIVE successors (dead blocks skip the body
        # and would leak the semaphore).
        next_nw = (starts_ref[b + 2] - next_a0) // WINDOW + 1

        @pl.when(((b + 1) * block < end_of(b + 1)) & (next_nw > 1))
        def _():
            start(4 + jax.lax.rem(b + 1, 2), next_a0, 1)

    # Every block's w0 was issued (by its predecessor or itself); always
    # consume it so the semaphore stays balanced even for dead blocks.
    wait(my_w0, a0, 0)

    def st(ref, v):
        ref[pl.ds(k * block, block)] = v.reshape((block,))

    @pl.when(jnp.logical_not(live))
    def _():
        _store_sentinels(st, out_refs, block, packed, config)

    @pl.when(live)
    def _():
        # Absolute slot index of each output column: on sublanes for the
        # match-matrix build (int32), on lanes for the emission math (f32).
        j_sub = b * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
        j_lane = (
            b * block + jax.lax.broadcasted_iota(jnp.int32, (1, block), 1)
        ).astype(jnp.float32)

        def limb_split(win):
            # Split every row into its bf16 truncation limbs (8 mantissa
            # bits each; f32 = hi + mid + lo exactly) in-VREG.  Exact:
            # each match row is one-hot, so every output element IS one
            # limb value; the telescoping limb re-sum in f32
            # reconstructs the original f32 bit-exactly.
            mask = jnp.uint32(0xFFFF0000)
            hi = pltpu.bitcast(
                pltpu.bitcast(win, jnp.uint32) & mask, jnp.float32
            )
            r1 = win - hi
            mid = pltpu.bitcast(
                pltpu.bitcast(r1, jnp.uint32) & mask, jnp.float32
            )
            lo = r1 - mid
            parts = [hi, mid, lo][:sel_limbs]
            return jnp.concatenate(parts).astype(jnp.bfloat16)

        def resum(sel):
            out = sel[0:16]
            for p in range(1, sel_limbs):
                out = out + sel[16 * p : 16 * (p + 1)]
            return out

        def slot_of(wi):
            return jnp.where(
                wi == 0,
                my_w0,
                jnp.where(wi == 1, my_w1, jax.lax.rem(wi, 2)),
            )

        def pipeline(wi, slot):
            @pl.when((wi + 1 < num_windows) & (wi > 0))
            def _():
                start(1 - jax.lax.rem(wi, 2), a0, wi + 1)

            @pl.when(wi > 0)
            def _():
                wait(slot, a0, wi)

        def body(wi, acc):
            slot = slot_of(wi)
            pipeline(wi, slot)
            win = win_buf[slot]  # [16, WINDOW] f32
            # Interval test as ONE unsigned compare: (j - excl) <u count
            # wraps negative j - excl to huge values, so a single compare
            # replaces (excl <= j) & (j < incl) — the [block, W] match
            # matrix build + its MXU materialization dominate the kernel
            # (2.3 of 4.1 ms measured; a sub-block corner-screened
            # formulation measured WORSE at every granularity — Mosaic
            # per-branch overhead, round-5 PERF_NOTES — so the dense
            # full-window match stands).  The prefix rows are exact
            # integers <= capacity + 1 < 2^24, so the f32->i32 converts
            # (on [1, W] rows, cheap) are exact.
            excl_i = win[0:1, :].astype(jnp.int32)
            cnt_u = pltpu.bitcast(
                win[1:2, :].astype(jnp.int32) - excl_i, jnp.uint32
            )
            d_u = pltpu.bitcast(j_sub - excl_i, jnp.uint32)
            match = (d_u < cnt_u).astype(jnp.bfloat16)
            sel = jax.lax.dot_general(
                limb_split(win),
                match,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [16 * limbs, block]
            return acc + resum(sel)

        acc = jax.lax.fori_loop(
            0, num_windows, body, jnp.zeros((16, block), jnp.float32)
        )

        # ---- fused per-slot emission math (all VMEM-resident) ----
        end_f = jnp.minimum(
            end_of(b).astype(jnp.float32), float(block * nblocks)
        )
        _emit_payload(
            acc,
            acc[0:1, :],
            j_lane,
            end_f,
            st,
            out_refs,
            block=block,
            packed=packed,
            tiles_x=tiles_x,
            config=config,
            band_lo=None if band is None else band[0],
            band_hi=None if band is None else band[1],
        )


def emit_pairs(
    cols,
    incl: jnp.ndarray,
    capacity: int,
    config: RenderConfig,
    *,
    interpret=None,
    unsafe_sel_limbs: int = 3,
) -> jnp.ndarray:
    """Expand + test + pack the pair list in one fused kernel.

    cols: 13 flat [N] float32 per-splat attribute columns in R_* order
          with the R_IDX row OMITTED (it is a plain iota, generated
          in-kernel); integers pre-cast to f32, all < 2^24.
    incl: [N] int32 inclusive prefix sum of candidate counts.
    Returns a tuple of six FLAT [capacity] uint32 arrays (order OUT_*):
    sort keys, splat indices (-1 = invalid), and the packed raster
    attributes — ready to feed lax.sort without any row extraction.
    Slots beyond the candidate total carry sentinel keys.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    block = MAX_BLOCK
    if interpret:
        # Interpret mode tolerates odd small capacities (CPU tests); on
        # TPU the flat 1D outputs require whole 8x128 tiles per block.
        while block > 128 and capacity % block:
            block //= 2
    if capacity % block != 0:
        raise ValueError(f"capacity must be a multiple of {block}")
    if capacity + 1 >= MAX_EXACT_I32:
        raise ValueError("capacity too large for exact f32 selection")
    cols = tuple(cols)
    assert len(cols) == NUM_ROWS_IN - 1, len(cols)
    n = incl.shape[0]

    clamp = capacity + 1

    # The interleave pass derives the clamped excl/incl prefix rows
    # in-kernel and zero-fills one extra PREP_BLK block past the last
    # splat so aligned windows can run past it (zero prefix rows ->
    # zero counts -> no matches).  Production scenes are padded to a
    # PREP_BLK multiple (GaussianScene.pad_to_multiple) so this jnp.pad
    # fallback — the only XLA copy left in the pre-pass — never runs on
    # the hot path.
    if n % PREP_BLK:
        pad_n = -(-n // PREP_BLK) * PREP_BLK - n
        # Tail incl repeats the final value: zero counts, dead columns.
        incl = jnp.concatenate(
            [incl, jnp.broadcast_to(incl[-1:], (pad_n,))]
        )
        cols = tuple(
            jnp.pad(c.astype(jnp.float32), (0, pad_n)) for c in cols
        )
    else:
        cols = tuple(c.astype(jnp.float32) for c in cols)
    n_r = incl.shape[0]
    incl_c = jnp.minimum(incl, clamp)
    np_cols = n_r + PREP_BLK
    full = _interleave_rows(incl, cols, np_cols, clamp, interpret)

    nblocks = capacity // block
    # First splat owning each block's first slot, a final bound, and the
    # candidate total (for dead-block short-circuiting).  The block-start
    # probes are arithmetic (b * block), so searchsorted(incl, probes,
    # 'right') collapses to a cumulative histogram of ceil(incl / block)
    # — the same one-hot-matmul edges kernel the tile-range stage uses
    # (XLA's searchsorted gathers serially over the 1M-entry prefix:
    # ~1 ms of the stage's XLA pre-pass).
    #   #(incl <= b*block) = #(ceil(incl/block) < b + 1) = edges[b + 1]
    from .ranges import _edges_pallas

    shift = block.bit_length() - 1
    k = ((incl_c + (block - 1)) >> shift).astype(jnp.uint32)
    edges = _edges_pallas(k, nblocks + 2, 0, interpret)
    starts = jnp.clip(edges[1:], 0, n - 1)
    starts = jnp.concatenate([starts, jnp.minimum(incl[-1:], capacity)])

    # Blocks per grid step: the largest configured batch that divides the
    # block count (capacities at 1024-slot grain may not divide evenly).
    # Interpret mode keeps the same logic so CPU tests exercise the
    # multi-block step path.
    bps = BLOCKS_PER_STEP
    while nblocks % bps:
        bps //= 2

    # unsafe_sel_limbs is a TIMING PROBE ONLY: the number of bf16
    # truncation limbs fed to the selection matmul (M = 16 * limbs).
    # 3 is correct; 2/1 produce WRONG payloads and exist only so
    # tools/measure.py can measure how much of the kernel is MAC-bound.
    kernel = functools.partial(
        _emit_kernel,
        block=block,
        bps=bps,
        config=config,
        sel_limbs=unsafe_sel_limbs,
    )
    flat = jax.ShapeDtypeStruct((capacity,), jnp.uint32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks // bps,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=[
            pl.BlockSpec((block * bps,), lambda i, *_: (i,))
            for _ in range(NUM_OUT)
        ],
        scratch_shapes=[
            # Slots 0/1: in-block double buffer; 2/3 and 4/5: cross-block
            # window-0 / window-1 pipeline (by block parity).
            pltpu.VMEM((6, 16, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[flat] * NUM_OUT,
        interpret=interpret,
    )(starts, full)



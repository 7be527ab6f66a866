"""Band-segmented pair emission — the QUARANTINED banded machinery.

Everything here backs ``config.sort_bands > 1``: an in-frame MXU band
compaction of the splat rows (_compact_kernel) followed by a band-major
emit walk over the compacted axis (emit_pairs_banded, reusing the flat
path's _emit_kernel in banded mode), plus the banded Stage-C entry
point build_tile_pairs_banded and the batched Stage-D sort.

Status: MEASURED NEGATIVE on the bench workload — the flat unstable
4-operand lax.sort beats every banded formulation (1.8-2.5x slower
frames at every G; docs/PERF_NOTES.md rounds 3-4) — but the path stays
in-tree, default-off, for scenes whose tile-row skew exceeds the ~2x
machinery tax and for its per-band saturation semantics.  It lives in
this module so the production flat path (ops.expand, ops.binning) stays
one code path; nothing here is imported unless sort_bands > 1.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .expand import (
    BLOCKS_PER_STEP,
    MAX_BLOCK,
    MAX_EXACT_I32,
    NUM_OUT,
    NUM_ROWS_IN,
    PREP_BLK,
    R_IDX,
    WINDOW,
    _emit_kernel,
)
from .ranges import _edges_pallas
from .binning import (
    DEPTH_BITS_PACKED,
    MAX_PACK_W,
    RowPacks,
    TilePairs,
    TileRects,
    quantize_depth,
    splat_row_packs,
    splat_tile_rects,
)
from .geometry import pack_rgb_u32
from .projection import SplatClipData


def _interleave_rows_padded(prefix_and_cols, np_cols, interpret):
    """Legacy interleave for the BANDED path: 15 pre-padded flat [NP]
    columns -> [16, NP] rows (prefix rows supplied by the caller)."""

    def kernel(*refs):
        cols, out_ref = refs[:-1], refs[-1]
        i = pl.program_id(0)
        k = 0
        for r in range(2 + NUM_ROWS_IN):
            if r == 2 + R_IDX:
                idx = i * PREP_BLK + jax.lax.broadcasted_iota(
                    jnp.int32, (1, PREP_BLK), 1
                )
                out_ref[r : r + 1, :] = idx.astype(jnp.float32)
            else:
                out_ref[r : r + 1, :] = cols[k][...].reshape(1, PREP_BLK)
                k += 1

    return pl.pallas_call(
        kernel,
        grid=(np_cols // PREP_BLK,),
        in_specs=[
            pl.BlockSpec((PREP_BLK,), lambda i: (i,))
            for _ in prefix_and_cols
        ],
        out_specs=pl.BlockSpec((2 + NUM_ROWS_IN, PREP_BLK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((2 + NUM_ROWS_IN, np_cols), jnp.float32),
        interpret=interpret,
    )(*prefix_and_cols)




def _compact_kernel(
    scal_ref,
    rows_hbm,
    pfx_hbm,
    out_ref,
    win_buf,
    pfx_buf,
    sems,
    psems,
    *,
    block,
    bps,
    bpb,
    n_cols,
    nblocks,
    n_bands,
):
    """Band compaction — the per-frame MXU partition that makes banded
    pair emission DENSE for any camera motion (no splat re-order, no
    staleness; see docs/PERF_NOTES.md round-4 drift study).

    Output slot j of band g receives the [16] rows of band g's j-th
    in-band splat: rows 0-1 become that splat's band-offset clamped PAIR
    prefixes (p_excl, p_incl) and rows 2-15 its attribute rows — exactly
    the layout the flat _emit_kernel expects, so the pair emission runs
    dense over the compacted axis with zero extra DMAs.

    Selection is the emit machinery with 0/1 counts: a column matches
    slot j iff j == c_incl - 1 and the splat has in-band pairs
    (p_excl != p_incl) — the one-hot partition by band id that a
    scatter cannot express on TPU.

    Scalar layout (int32):
      [0 .. nblocks]   virtual first-owner per block boundary, over the
                       per-band PADDED source axis (g * n_cols + real)
      [E + g]          band compact end slot (g*MC + min(S_g, MC))
      [E + G + g]      last in-band splat (real source index)
      [E + 2G + g]     band pair end slot (dead/pad prefix fill — keeps
                       the compacted p_incl row monotone for the pair
                       stage's block-start histogram)
    with E = nblocks + 1, G = n_bands.
    pfx rows: [0] c_incl (virtual compact-slot cumsum), [1] p_excl,
    [2] p_incl, [3] dup of p_incl (pads the sublane dim to the f32
    DMA tile of 4).
    """
    step = pl.program_id(0)
    E = nblocks + 1

    def last_of(g):
        return scal_ref[E + n_bands + g]

    def start_dmas(slot, base, g, wi):
        sl = pl.ds(base + wi * WINDOW, WINDOW)
        psl = pl.ds(g * n_cols + base + wi * WINDOW, WINDOW)
        pltpu.make_async_copy(rows_hbm.at[:, sl], win_buf.at[slot], sems.at[slot]).start()
        pltpu.make_async_copy(pfx_hbm.at[:, psl], pfx_buf.at[slot], psems.at[slot]).start()

    def wait_dmas(slot, base, g, wi):
        sl = pl.ds(base + wi * WINDOW, WINDOW)
        psl = pl.ds(g * n_cols + base + wi * WINDOW, WINDOW)
        pltpu.make_async_copy(rows_hbm.at[:, sl], win_buf.at[slot], sems.at[slot]).wait()
        pltpu.make_async_copy(pfx_hbm.at[:, psl], pfx_buf.at[slot], psems.at[slot]).wait()

    def walk_of(b):
        """(band, start, end, a0, num_windows, live) for block b."""
        g = jnp.clip(b // bpb, 0, n_bands - 1)
        last = last_of(g)
        s0 = jnp.clip(scal_ref[b] - g * n_cols, 0, last)
        s1 = jnp.clip(scal_ref[b + 1] - g * n_cols, 0, last + 1)
        a0 = (s0 // 128) * 128
        nw = (s1 - a0) // WINDOW + 1
        live = b * block < scal_ref[E + g]
        return g, a0, nw, live

    for k in range(bps):
        b = step * bps + k
        g, a0, num_windows, live = walk_of(b)
        pair_end = scal_ref[E + 2 * n_bands + g].astype(jnp.float32)

        my_w0 = 2 + jax.lax.rem(b, 2)
        my_w1 = 4 + jax.lax.rem(b, 2)

        if k == 0:
            @pl.when(b == 0)
            def _():
                start_dmas(my_w0, a0, g, 0)

                @pl.when(live & (num_windows > 1))
                def _():
                    start_dmas(my_w1, a0, g, 1)

        @pl.when(b + 1 < nblocks)
        def _():
            ng, next_a0, next_nw, next_live = walk_of(b + 1)
            start_dmas(2 + jax.lax.rem(b + 1, 2), next_a0, ng, 0)

            @pl.when(next_live & (next_nw > 1))
            def _():
                start_dmas(4 + jax.lax.rem(b + 1, 2), next_a0, ng, 1)

        wait_dmas(my_w0, a0, g, 0)

        def st16(v, _k=k):
            out_ref[:, pl.ds(_k * block, block)] = v

        @pl.when(jnp.logical_not(live))
        def _(pair_end=pair_end, st16=st16):
            # Inert pad columns: prefix rows carry the band's pair end
            # (excl == incl: no pair-stage matches; keeps the p_incl row
            # monotone), attribute rows are zero.
            pe = jnp.full((2, block), pair_end, jnp.float32)
            st16(jnp.concatenate([pe, jnp.zeros((14, block), jnp.float32)]))

        @pl.when(live)
        def _(b=b, g=g, a0=a0, num_windows=num_windows, my_w0=my_w0,
              my_w1=my_w1, pair_end=pair_end, st16=st16):
            j_sub = b * block + jax.lax.broadcasted_iota(jnp.int32, (block, 1), 0)
            j_lane = b * block + jax.lax.broadcasted_iota(
                jnp.int32, (1, block), 1
            )

            def body(wi, acc):
                slot = jnp.where(
                    wi == 0,
                    my_w0,
                    jnp.where(wi == 1, my_w1, jax.lax.rem(wi, 2)),
                )

                @pl.when((wi + 1 < num_windows) & (wi > 0))
                def _():
                    start_dmas(1 - jax.lax.rem(wi, 2), a0, g, wi + 1)

                @pl.when(wi > 0)
                def _():
                    wait_dmas(slot, a0, g, wi)

                win = win_buf[slot]   # [16, W] source rows (0-1 unused)
                # [4, W]: c_incl / p_excl / p_incl / dup (DMA alignment)
                pfx = pfx_buf[slot]
                cinc = pfx[0:1, :].astype(jnp.int32)
                has_pairs = pfx[1:2, :] != pfx[2:3, :]
                match = ((j_sub == cinc - 1) & has_pairs).astype(jnp.bfloat16)
                # Payload = 16 source rows + the two pair-prefix rows,
                # split into three bf16 limbs, ONE [54, W] x [W, block]
                # selection matmul (exact one-hot reconstruction).
                win18 = jnp.concatenate([win, pfx[1:3, :]])  # [18, W]
                mask = jnp.uint32(0xFFFF0000)
                hi = pltpu.bitcast(
                    pltpu.bitcast(win18, jnp.uint32) & mask, jnp.float32
                )
                r1 = win18 - hi
                mid = pltpu.bitcast(
                    pltpu.bitcast(r1, jnp.uint32) & mask, jnp.float32
                )
                lo = r1 - mid
                limbs = jnp.concatenate([hi, mid, lo]).astype(jnp.bfloat16)
                sel = jax.lax.dot_general(
                    limbs,
                    match,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # [54, block]
                return acc + (sel[0:18] + sel[18:36] + sel[36:54])

            acc = jax.lax.fori_loop(
                0, num_windows, body, jnp.zeros((18, block), jnp.float32)
            )
            # Slots past the band's compact end inside a live block:
            # prefix rows fall back to the pair end (monotone + inert).
            cend = scal_ref[E + g]
            in_band = (j_lane < cend).astype(jnp.float32)
            prefix = acc[16:18] * in_band + pair_end * (1.0 - in_band)
            st16(jnp.concatenate([prefix, acc[2:16] * in_band]))




def _stackk_kernel(*refs):
    cols, out_ref = refs[:-1], refs[-1]
    for r, c in enumerate(cols):
        out_ref[r : r + 1, :] = c[...].reshape(1, PREP_BLK)


def _stackk(cols, interpret):
    """k flat [M] f32 columns -> one [k, M] row array (Pallas pass; an
    XLA stack costs strided sublane writes into (8, 128)-tiled memory)."""
    k = len(cols)
    m = cols[0].shape[0]
    assert m % PREP_BLK == 0, m
    return pl.pallas_call(
        _stackk_kernel,
        grid=(m // PREP_BLK,),
        in_specs=[pl.BlockSpec((PREP_BLK,), lambda i: (i,)) for _ in cols],
        out_specs=pl.BlockSpec((k, PREP_BLK), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((k, m), jnp.float32),
        interpret=interpret,
    )(*cols)


def emit_pairs_banded(
    cols,
    counts_banded: jnp.ndarray,
    band_rows: jnp.ndarray,
    capacity: int,
    config: RenderConfig,
    *,
    compact_capacity: int = 0,
    interpret=None,
):
    """Band-major expand + pack in TWO dense Pallas passes.

    Slots segment into G equal-capacity tile-row bands (G =
    counts_banded.shape[0]); band g's segment holds exactly that band's
    (splat, tile) pairs, so stage D runs as a batched [G, capacity/G]
    lax.sort and the concatenation is globally tile-ordered (bands
    partition the tile rows in order).

    Pass 1 (_compact_kernel) partitions the splat rows by band on the
    MXU — the one-pass permutation a TPU scatter cannot express — so
    pass 2 (the ordinary flat _emit_kernel walk, plus band row-clamping
    of the per-slot ordinal math) is DENSE for ANY camera motion: no
    splat re-order, no cross-frame staleness (docs/PERF_NOTES.md
    round-4 drift study killed the persistent-order design).

    cols: 13 flat [N] f32 columns as in emit_pairs.
    counts_banded: [G, N] int32 per-band in-band candidate counts
        (binning.band_counts — mirrors the band-clamped slot mapping).
    band_rows: [G + 1] int32 tile-row boundaries (traced fine).
    compact_capacity: static total compacted-splat slots (multiple of
        G * block); 0 -> 2x the splat count (straddlers put the true
        need near N * (1 + straddle fraction)).  A band whose in-band
        splat count exceeds its share drops trailing splats' pairs for
        the frame (saturation semantics; aux reports per-band counts).

    Returns (six flat [capacity] uint32 arrays, band_totals [G] int32,
    band_splats [G] int32).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n_bands = int(counts_banded.shape[0])
    block = MAX_BLOCK
    if interpret:
        _mc = (compact_capacity or 2 * counts_banded.shape[1]) // n_bands
        while block > 128 and ((capacity // n_bands) % block or _mc % block):
            block //= 2
    cg = capacity // n_bands
    if cg * n_bands != capacity or cg % block != 0:
        raise ValueError(
            f"capacity must be a multiple of bands*{block} (got {capacity}, "
            f"{n_bands} bands)"
        )
    if capacity + 1 >= MAX_EXACT_I32:
        raise ValueError("capacity too large for exact f32 selection")
    cols = tuple(cols)
    assert len(cols) == NUM_ROWS_IN - 1, len(cols)
    n = counts_banded.shape[1]
    if not compact_capacity:
        compact_capacity = -(-2 * n // (n_bands * block)) * (n_bands * block)
    mc = compact_capacity // n_bands
    if mc * n_bands != compact_capacity or mc % block != 0:
        raise ValueError("compact_capacity must be a multiple of bands*block")
    if compact_capacity + 1 >= MAX_EXACT_I32:
        raise ValueError("compact_capacity too large for exact f32 selection")

    # ---- per-band prefixes (all exact int32, values < 2^24) ----
    p_cum = jnp.cumsum(counts_banded, axis=1)                  # [G, N]
    band_totals = p_cum[:, -1]
    # A splat is selected only if at least one of its pairs lands below
    # the band pair capacity.  Pair-dry splats (entire range clamped
    # past cg — pair saturation) must be excluded from compaction like
    # compact-saturated ones: a compacted-but-pair-dry splat would own
    # a compact slot that matches nothing in the selection matmul,
    # storing prefix 0 and breaking the monotone p_incl row pass 2's
    # block-start histogram depends on (garbage pairs frame-wide).
    sel = (counts_banded > 0) & (p_cum - counts_banded < cg)
    c_cum = jnp.cumsum(sel.astype(jnp.int32), axis=1)          # [G, N]
    band_splats = c_cum[:, -1]
    offs_c = (jnp.arange(n_bands, dtype=jnp.int32) * mc)[:, None]
    offs_p = (jnp.arange(n_bands, dtype=jnp.int32) * cg)[:, None]
    c_incl_v = offs_c + jnp.minimum(c_cum, mc)
    p_incl_v = offs_p + jnp.minimum(p_cum, cg)
    # Splats beyond the band's compact capacity (c_cum > mc) share the
    # clamped c_incl and would multi-match the last compact slot; give
    # them equal pair prefixes so the has-pairs mask drops them (their
    # pairs are NOT emitted this frame — compact saturation).
    kept = sel & (c_cum <= mc)
    p_excl_v = jnp.where(
        kept, offs_p + jnp.minimum(p_cum - counts_banded, cg), p_incl_v
    )
    # Pairs actually reachable per band: the pair end is the last kept
    # splat's clamped p_incl (kept splats' pair ranges tile
    # [0, pair_end) contiguously — pair-live splats form a prefix of
    # the band's candidates and compact saturation drops a suffix).
    pair_end = offs_p[:, 0] + jnp.minimum(
        jnp.max(jnp.where(kept, p_cum, 0), axis=1), cg
    )
    iota_n = jax.lax.broadcasted_iota(jnp.int32, counts_banded.shape, 1)
    last_owner = jnp.max(jnp.where(sel, iota_n, 0), axis=1)

    # ---- pass-1 inputs: source rows + banded prefix rows ----
    np_cols = -(-(n + 2 * WINDOW + 128) // PREP_BLK) * PREP_BLK
    pad = lambda x: jnp.pad(x.astype(jnp.float32), (0, np_cols - n))  # noqa: E731
    zeros = jnp.zeros((n,), jnp.float32)
    full = _interleave_rows_padded(
        [pad(zeros), pad(zeros)] + [pad(c) for c in cols], np_cols, interpret
    )

    def pad_band(x, tail):
        fill = jnp.broadcast_to(tail.astype(jnp.float32), (n_bands, np_cols - n))
        return jnp.concatenate(
            [x.astype(jnp.float32), fill], axis=1
        ).reshape(n_bands * np_cols)

    # Tails: c_incl pads with its edge (monotone), the pair rows pad
    # with the band's final p_incl so pad columns have excl == incl.
    # Row 3 duplicates row 2 purely for DMA alignment: Mosaic requires
    # an HBM slice's sublane extent to be a multiple of the f32 tile
    # (4); a [3, W] window DMA fails to compile on hardware.
    pfx = _stackk(
        [
            pad_band(c_incl_v, c_incl_v[:, -1:]),
            pad_band(p_excl_v, p_incl_v[:, -1:]),
            pad_band(p_incl_v, p_incl_v[:, -1:]),
            pad_band(p_incl_v, p_incl_v[:, -1:]),
        ],
        interpret,
    )

    shift = block.bit_length() - 1

    # ---- pass 1: band compaction ----
    # The compacted axis is padded so pass 2's window walk can run past
    # the last band (dead blocks there emit inert pad columns).
    slack_blocks = -(-(2 * WINDOW + 128) // block)
    np_m = compact_capacity + slack_blocks * block
    nblocks_c = np_m // block
    kc = ((c_incl_v.reshape(-1) + (block - 1)) >> shift).astype(jnp.uint32)
    edges_c = _edges_pallas(kc, nblocks_c + 2, 0, interpret)
    g_of = jnp.clip(edges_c[1:] // n, 0, n_bands - 1)
    starts_c = edges_c[1:] + g_of * (np_cols - n)
    scalars_c = jnp.concatenate(
        [
            starts_c.astype(jnp.int32),
            (offs_c[:, 0] + jnp.minimum(band_splats, mc)).astype(jnp.int32),
            last_owner.astype(jnp.int32),
            pair_end.astype(jnp.int32),
        ]
    )

    bps_c = BLOCKS_PER_STEP
    while nblocks_c % bps_c:
        bps_c //= 2
    compact = pl.pallas_call(
        functools.partial(
            _compact_kernel,
            block=block,
            bps=bps_c,
            bpb=mc // block,
            n_cols=np_cols,
            nblocks=nblocks_c,
            n_bands=n_bands,
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks_c // bps_c,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=[
                pl.BlockSpec((16, block * bps_c), lambda i, *_: (0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((6, 16, WINDOW), jnp.float32),
                pltpu.VMEM((6, 4, WINDOW), jnp.float32),
                pltpu.SemaphoreType.DMA((6,)),
                pltpu.SemaphoreType.DMA((6,)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((16, np_m), jnp.float32)],
        interpret=interpret,
    )(scalars_c, full, pfx)[0]

    # ---- pass 2: dense pair emission over the compacted axis ----
    nblocks = capacity // block
    # Block starts from the compacted p_incl row (monotone by
    # construction: dead/pad columns carry their band's pair end).
    p_incl_row = compact[1, :].astype(jnp.int32)
    kp = ((p_incl_row + (block - 1)) >> shift).astype(jnp.uint32)
    edges_p = _edges_pallas(kp, nblocks + 2, 0, interpret)
    # Upper clip keeps every dead block's w0 window DMA inside the
    # padded compacted axis (live owners sit below compact_capacity,
    # whose slack already covers their walks).
    starts_p = jnp.clip(edges_p[1:], 0, np_m - WINDOW)
    scalars_p = jnp.concatenate(
        [
            starts_p.astype(jnp.int32),
            jnp.minimum(pair_end[-1:], capacity).astype(jnp.int32),  # total
            pair_end.astype(jnp.int32),
            band_rows[:-1].astype(jnp.int32),
            band_rows[1:].astype(jnp.int32),
        ]
    )

    bps = BLOCKS_PER_STEP
    while (capacity // n_bands // block) % bps:
        bps //= 2
    kernel = functools.partial(
        _emit_kernel,
        block=block,
        bps=bps,
        config=config,
        bpb=cg // block,
        n_bands=n_bands,
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
            pltpu.VMEM((6, 16, WINDOW), jnp.float32),
            pltpu.SemaphoreType.DMA((6,)),
        ],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[flat] * NUM_OUT,
        interpret=interpret,
    )(scalars_p, compact)
    return outs, band_totals, band_splats


# ---------------------------------------------------------------------------
# Band-segmented variant: band-major emission for the batched sort
# ---------------------------------------------------------------------------


def band_counts(
    rects: TileRects, row_packs: RowPacks, band_rows: jnp.ndarray
) -> jnp.ndarray:
    """[G, N] per-band in-band candidate counts.

    ``band_rows``: [G + 1] tile-row boundaries (traced ints fine); band g
    covers tile rows [band_rows[g], band_rows[g+1]).  MUST mirror the
    banded emit kernel's slot mapping (ops.expand._emit_payload with
    band_lo/band_hi): packed rows are masked to the band, full-width
    fallthrough rows run from max(base, lo - y0) to min(h, hi - y0),
    where base is 8 for packable rects and 0 for w > MAX_PACK_W ones.
    Summing over a full partition of the rows reproduces
    row_packs.counts exactly (tested).
    """
    g_bands = band_rows.shape[0] - 1
    y0f = rects.y0.astype(jnp.float32)
    hf = rects.h.astype(jnp.float32)
    wf = rects.w.astype(jnp.float32)
    packable = rects.w <= MAX_PACK_W
    base_flat = jnp.where(packable, 8.0, 0.0)

    # Decode per-row widths from the packed (dx, w) fields; zero for
    # unpackable splats and dead rows by construction (splat_row_packs).
    widths = []
    for p in range(4):
        t = row_packs.packs[p]
        t_hi = jnp.floor(t * (1.0 / 4096.0))
        t_lo = t - t_hi * 4096.0
        for half in (t_hi, t_lo):
            widths.append(half - jnp.floor(half * (1.0 / 64.0)) * 64.0)

    rows = []
    for g in range(g_bands):
        lo = band_rows[g].astype(jnp.float32)
        hi = band_rows[g + 1].astype(jnp.float32)
        packed_sum = jnp.zeros_like(y0f)
        for r, wr in enumerate(widths):
            yr = y0f + float(r)
            packed_sum = packed_sum + jnp.where((yr >= lo) & (yr < hi), wr, 0.0)
        over = wf * jnp.clip(
            jnp.minimum(hf, hi - y0f) - jnp.maximum(base_flat, lo - y0f),
            0.0,
            None,
        )
        rows.append(packed_sum + over)
    return jnp.stack(rows).astype(jnp.int32)


def build_tile_pairs_banded(
    clip_data: SplatClipData,
    colors: jnp.ndarray,
    opacities: jnp.ndarray,
    config: RenderConfig,
    capacity: int,
    band_rows: jnp.ndarray,
    *,
    compact_capacity: int = 0,
    interpret=None,
) -> Tuple[TilePairs, jnp.ndarray, jnp.ndarray]:
    """Band-major expansion: like build_tile_pairs, but the pair list is
    segmented into G = len(band_rows) - 1 equal-capacity tile-row bands
    so stage D can run as a batched [G, capacity/G] sort (fewer bitonic
    passes; see sorting.sort_pairs_banded) and stage E only needs
    band-offset range starts (ranges.tile_ranges with band args).
    Internally two dense Pallas passes: an MXU band compaction of the
    splat rows, then the flat emit walk over the compacted axis
    (ops.expand.emit_pairs_banded).

    Returns (pairs, band_totals [G], band_splats [G]) — unclamped
    per-band pair and in-band splat counts: the saturation signals and
    the rebalancing input for the equal-count boundary controller in
    render.Renderer.
    """
    from .expand import (
        OUT_CONIC,
        OUT_CXCY,
        OUT_KEY0,
        OUT_KEY1,
        OUT_RGBA,
        OUT_VALUES,
    )

    rects = splat_tile_rects(clip_data, config)
    row_packs = splat_row_packs(clip_data, rects, config)
    counts_b = band_counts(rects, row_packs, band_rows)

    depth_bits = (
        DEPTH_BITS_PACKED if config.depth_bits == DEPTH_BITS_PACKED else 24
    )
    qdepth = quantize_depth(clip_data.clip_z, depth_bits)
    rgb_u32 = pack_rgb_u32(colors)
    geom = (
        (rects.x0.astype(jnp.float32) * 256.0 + rects.y0.astype(jnp.float32)) * 256.0
        + rects.w.astype(jnp.float32)
    )
    cols = (
        geom,
        qdepth.astype(jnp.float32),
        clip_data.cx,
        clip_data.cy,
        clip_data.con_a,
        clip_data.con_b,
        clip_data.con_c,
        rgb_u32.astype(jnp.float32),
        opacities,
        *row_packs.packs,
    )

    out, band_totals, band_splats = emit_pairs_banded(
        cols, counts_b, band_rows, capacity, config,
        compact_capacity=compact_capacity, interpret=interpret,
    )

    values = jax.lax.bitcast_convert_type(out[OUT_VALUES], jnp.int32)
    attrs = (out[OUT_CXCY], out[OUT_CONIC], out[OUT_RGBA])
    if config.depth_bits == DEPTH_BITS_PACKED:
        keys = (out[OUT_KEY0],)
    else:
        keys = (out[OUT_KEY0], out[OUT_KEY1])

    pairs = TilePairs(
        keys=keys,
        values=values,
        attrs=attrs,
        num_candidates=jnp.sum(band_totals).astype(jnp.int32),
        num_pairs=jnp.sum(values >= 0).astype(jnp.int32),
    )
    return pairs, band_totals, band_splats


def sort_pairs_banded(
    pairs: TilePairs,
    n_bands: int,
    *,
    with_values: bool = False,
    stable: bool = False,
) -> Tuple[Tuple[jnp.ndarray, ...], Optional[jnp.ndarray], Tuple[jnp.ndarray, ...]]:
    """Batched per-band sort of a band-major pair list
    (binning.build_tile_pairs_banded).

    Each band's segment sorts independently along the last axis of a
    [n_bands, capacity / n_bands] view — a batched sort runs far fewer
    bitonic passes than the flat sort of the same total (log2(seg)^2 vs
    log2(C)^2; measured 2-4.7x cheaper per pair, docs/PERF_NOTES.md).
    The concatenation is globally tile-ordered because bands partition
    the tile rows in order; per-band sentinel runs sit BETWEEN bands and
    are skipped via the band-offset range starts (ranges.tile_ranges
    band arguments), never addressed by the rasterizer.
    """
    num_keys = len(pairs.keys)
    extra = (pairs.values,) if with_values else ()
    ops = (*pairs.keys, *extra, *pairs.attrs)
    cap = ops[0].shape[0]
    seg = cap // n_bands
    ops2 = tuple(o.reshape(n_bands, seg) for o in ops)
    sorted_ops = jax.lax.sort(
        ops2, dimension=1, num_keys=num_keys, is_stable=stable or with_values
    )
    flat = tuple(o.reshape(cap) for o in sorted_ops)
    keys = flat[:num_keys]
    off = num_keys
    values = None
    if with_values:
        values = flat[off]
        off += 1
    return keys, values, flat[off:]

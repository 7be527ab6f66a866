"""Tile rasterizer — stage F, the flagship Pallas TPU kernel.

The CUDA reference rasterizes one 16x16 tile per thread block: one thread
per pixel, 32-splat chunks staged through shared memory by the first warp
(uncoalesced gathers — its known bottleneck, reference README.md:105,138),
front-to-back alpha blending with a cooperative early-saturation exit
(rasterizeTilesKernel, /root/reference/src/GaussianRender.cu:908-1034).

TPU re-design:
  * The random splat gather is gone entirely: the variadic sort carries
    the packed raster attributes with the keys, and pack_pair_data just
    stacks them into a planar [4, C] uint32 streaming buffer (attribute
    rows x sorted pairs; integer-typed — see pack_pair_data).  The kernel then only ever reads *contiguous*
    lane-slices — sequential HBM traffic at full bandwidth instead of
    per-splat random loads.
  * TPU DMA slices along the minor (lane) dimension must be 128-aligned,
    so chunks are 128 pairs wide and each tile's streaming starts at
    ``start & ~127`` — over-fetching into the previous tile's tail and
    masking it out, rather than re-padding the sorted list.
  * Grid steps own ``tiles_per_cell`` tiles each (amortizing per-step
    overhead); each tile runs a ``while_loop`` over chunks with
    double-buffered async DMA into VMEM.
  * Blending is vectorized over the whole [256 pixels, 128 splats] block
    (pixels on sublanes, splats on lanes — broadcast-friendly, no
    transposes): the front-to-back transmittance recurrence T *= (1 - a)
    becomes an O(log chunk) Hillis-Steele cumulative product along the
    lane axis, and the color accumulation sum_k w_k * rgb_k is a
    [256, 128] x [3, 128]^T matmul on the MXU.
  * Early exit happens at chunk granularity via the loop condition
    max(T) > eps, the analog of the reference's __syncthreads_count break
    (cu:994-998) at 128-splat instead of 32-splat granularity.

Pixel centers use clip = pixel * (2 / screen) - 1 with no half-texel
offset, matching cu:933-939.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RenderConfig
from .geometry import MF12_K

# Streaming-buffer row layout ([4, C] planar; row 3 pads the DMA shape).
ROW_CXCY = 0                # (x16 << 16 | y16) fixed point
ROW_CONIC = 1               # a_mf12 | c_mf12 | rho8 (geometry.pack_conic_u32)
ROW_RGBA = 2                # 0xRRGGBBAA
PAIR_ROWS = 4  # power of two for clean DMA shapes

LANE = 128  # TPU lane width; chunk sizes and DMA offsets align to this

# Transmittance-scan implementation, read at trace time:
#   "roll"  — Hillis-Steele lane-roll cumprod (exact product order)
#   "logmm" — exclusive log-cumsum via a strictly-lower-triangular MXU
#             matmul (2 bf16 limbs; ~2^-16 relative on T)
#   "chunk" — order-independent within a chunk (ablation/benchmark only)
# logmm is the production default: measured 15.3 -> 11.7 ms at the bench
# workload on v5e, pixel-identical to roll on the golden scenes.
SCAN_MODE = "logmm"
# Width of each triangular scan matmul: the chunk is scanned in SCAN_WIDTH
# column sub-blocks chained by a per-pixel carry, keeping the per-pair
# scan cost CONSTANT as raster_chunk grows (pixels * chunk * SCAN_WIDTH
# MACs per limb).  128 measured best on v5e: narrower sub-blocks (64)
# LOSE ~1.8 ms/frame — each extra small matmul pays issue latency that
# outweighs the halved MAC count — so the sweet spot is one full-width
# matmul per 128 columns.
SCAN_WIDTH = 128
# bf16 truncation limbs carried through the scan matmul: 2 reconstructs
# log(1 - alpha) to ~2^-16 relative; 1 rounds to nearest bf16 (~2^-9),
# bounding the transmittance error by ~|log T_exit| * 2^-9 < 1% — below
# the 8-bit output quantization once blended.  1 is the default since the
# round-3 m-form op reduction: it halves the scan-matmul MACs and drops
# the in-VREG limb split, measured 7.18 -> 6.92 ms net at the bench
# workload with a worst-case 4-LSB pixel delta vs the 2-limb scan.
SCAN_LIMBS = 1
# NOTE: a density-quadratic-on-the-MXU variant ([pixels, 24] x [24,
# chunk] bf16 with truncation limbs, expanded around the tile center)
# measured +1.8 ms/frame WORSE than this VPU chain on v5e — K=24 matmuls
# are latency-bound and the chain was never the bottleneck.  See
# docs/PERF_NOTES.md round 3; deleted rather than kept as a dead flag.

# Compute the per-(pixel, pair) quadratic form m = -dpow/2 in bfloat16
# instead of f32 (experiment flag, read at trace time; tools/measure.py
# raster flips it).  Numerics: m in [-9, 0] with ~2^-8 relative error
# -> up to ~3.5% density error on the largest exponents — acceptable
# only if it measures FASTER; on TPU the VPU runs bf16 elementwise at
# f32 rate, so this is expected to be a null result (recorded either
# way, see docs/PERF_NOTES.md round 4).
QUAD_BF16 = False

CENTER_INV_SCALE = 2.0 / 65535.0

# Chunk-DMA pipeline depth.  A [PAIR_ROWS, 128] chunk is only 2 KB, so
# the per-chunk HBM latency dwarfs its transfer (and, post-m-form, its
# compute) time; double buffering (depth 2) leaves the loop
# latency-bound.  Depth D keeps D-1 chunk fetches in flight.
PREFETCH_DEPTH = 4


def pack_pair_data(sorted_attrs, chunk: int) -> jnp.ndarray:
    """Sorted attribute operands -> [PAIR_ROWS, C + 2*chunk] uint32 buffer.

    The attributes arrive already in sorted pair order (carried through the
    variadic sort — no gather); this stacks them into planar rows, pads
    rows to a power of two and adds lane tail-padding so the kernel's
    fixed-size DMAs can run past the final partial chunk.

    The buffer is INTEGER-typed on purpose: the rows are arbitrary packed
    bit patterns, and moving them through f32-typed XLA ops corrupts them
    on TPU — subnormal patterns (f32 exponent bits all zero) flush to
    +/-0 and NaN patterns canonicalize to 0x7FC00000 in vector-unit
    copies.  Integer ops are exact for all 2^32 values.
    """
    def u32row(x):
        return (
            x
            if x.dtype == jnp.uint32
            else jax.lax.bitcast_convert_type(x, jnp.uint32)
        )

    rows = jnp.stack([u32row(a) for a in sorted_attrs])
    pad_r = PAIR_ROWS - rows.shape[0]
    return jnp.pad(rows, ((0, pad_r), (0, 2 * chunk)))


def _raster_kernel(
    starts_ref,    # SMEM [num_tiles] int32 (scalar prefetch)
    counts_ref,    # SMEM [num_tiles] int32 (scalar prefetch)
    rowoff_ref,    # SMEM [1] int32: tile-row offset (multi-chip bands)
    pairs_hbm,     # HBM  [PAIR_ROWS, C + 2*chunk] uint32
    out_ref,       # VMEM [tiles_per_cell, pixels, 4] float32
    state,         # VMEM scratch [pixels, 8] (cols: r, g, b, transmittance)
    chunk_buf,     # VMEM scratch [2, PAIR_ROWS, chunk]
    sems,          # DMA semaphores (2,)
    *,
    config: RenderConfig,
    tpc: int,
):
    chunk = config.raster_chunk
    tile_size = config.tile_size
    pixels = tile_size * tile_size
    tiles_x = config.tiles_x
    pix_to_clip_x = 2.0 / float(config.screen_w)
    pix_to_clip_y = 2.0 / float(config.screen_h)
    eps = config.transmittance_eps
    # Gaussian + logmm: carry transmittance in LOG domain and fuse the
    # density exp, the alpha product, the density clip (a dpow >= 0
    # clamp — exp(-dpow/2) <= 1 automatically) and the blend weight
    # t_in * excl * alpha = exp(s_excl + lalpha + log t_in) into the
    # existing log-space machinery: two fewer VPU ops per (pixel, pair)
    # element and one fewer [pixels, chunk] temporary, same 3
    # transcendentals.
    logf = config.falloff == "gaussian" and SCAN_MODE == "logmm"
    cell = pl.program_id(0)

    # Pixel coordinates within a tile, flattened row-major like the
    # reference's threadIdx mapping (cu:934); pixels ride the sublane axis.
    pix = jax.lax.broadcasted_iota(jnp.int32, (pixels, 1), 0)
    px_in_tile = (pix % tile_size).astype(jnp.float32)
    py_in_tile = (pix // tile_size).astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    mask16 = jnp.uint32(0xFFFF0000)

    if SCAN_MODE == "logmm":
        sw = min(SCAN_WIDTH, chunk)
        ik = jax.lax.broadcasted_iota(jnp.int32, (sw, sw), 0)
        jk = jax.lax.broadcasted_iota(jnp.int32, (sw, sw), 1)
        slt1 = (ik < jk).astype(jnp.bfloat16)
        # Both limbs contract in one matmul: [pixels, 2*sw] x [2*sw, sw].
        slt2 = (
            jnp.concatenate([slt1, slt1], axis=0) if SCAN_LIMBS == 2 else slt1
        )

    def make_dma(slot, astart, c):
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(astart + c * chunk, chunk)],
            chunk_buf.at[slot],
            sems.at[slot],
        )

    num_tiles = pl.num_programs(0) * tpc

    def tile_chunks(t):
        """(astart, num_chunks) of tile t; exactly 0 chunks when empty."""
        s = starts_ref[t]
        cnt = counts_ref[t]
        a = (s // chunk) * chunk
        n = jnp.where(cnt > 0, pl.cdiv(s - a + cnt, chunk), 0)
        return a, n

    def head_slot(t):
        # Two dedicated first-chunk slots by tile parity: tile t's chunk 0
        # is DMA'd while tile t-1 is still blending (cross-tile pipeline,
        # hiding the per-tile cold-start HBM latency), so it cannot share
        # the in-tile ring slots.
        return PREFETCH_DEPTH + jax.lax.rem(t, 2)

    def start_head(t):
        """Issue tile t's chunk-0 fetch into its head slot (t traced)."""
        a, n = tile_chunks(t)

        @pl.when(n > 0)
        def _():
            make_dma(head_slot(t), a, 0).start()

    # The very first tile of the grid has no predecessor to issue its
    # head fetch; every other tile's was issued one tile earlier.
    @pl.when(cell == 0)
    def _():
        start_head(0)

    for ti in range(tpc):
        tile = cell * tpc + ti
        start = starts_ref[tile]
        count = counts_ref[tile]
        # DMA offsets must be lane-aligned: stream from the aligned floor
        # of the segment and mask the over-fetched prefix.
        astart = (start // chunk) * chunk
        span = start - astart + count
        num_chunks = jnp.where(count > 0, pl.cdiv(span, chunk), 0)

        tile_x = (tile % tiles_x).astype(jnp.float32)
        tile_y = (tile // tiles_x + rowoff_ref[0]).astype(jnp.float32)
        pcx = (tile_x * tile_size + px_in_tile) * pix_to_clip_x - 1.0  # [pixels,1]
        pcy = (tile_y * tile_size + py_in_tile) * pix_to_clip_y - 1.0

        state[:, 0:3] = jnp.zeros((pixels, 3), jnp.float32)
        # Transmittance column: log T = 0 in the fused log path, T = 1
        # otherwise.
        state[:, 3:4] = jnp.full((pixels, 1), 0.0 if logf else 1.0, jnp.float32)

        # Prologue: chunk 0 is already in flight in this tile's head slot
        # (issued by the previous tile); put chunks 1..D-2 in flight in
        # the ring, then issue the NEXT tile's head fetch so it rides
        # under this tile's blending.
        for d in range(1, PREFETCH_DEPTH - 1):
            @pl.when(d < num_chunks)
            def _(d=d):
                make_dma(d % PREFETCH_DEPTH, astart, d).start()

        @pl.when(tile + 1 < num_tiles)
        def _():
            start_head(tile + 1)

        eps_t = float(np.log(eps)) if logf else eps

        def cond(carry):
            c, t_max = carry
            return (c < num_chunks) & (t_max > eps_t)

        def body(carry):
            c, _ = carry
            slot = jnp.where(
                c == 0, head_slot(tile), jax.lax.rem(c, PREFETCH_DEPTH)
            )

            @pl.when(c + PREFETCH_DEPTH - 1 < num_chunks)
            def _():
                make_dma(
                    jax.lax.rem(c + PREFETCH_DEPTH - 1, PREFETCH_DEPTH),
                    astart,
                    c + PREFETCH_DEPTH - 1,
                ).start()

            make_dma(slot, astart, c).wait()
            data = chunk_buf[slot]  # [PAIR_ROWS, chunk] uint32

            cxcy = data[ROW_CXCY : ROW_CXCY + 1, :]
            cx = (cxcy >> 16).astype(jnp.int32).astype(jnp.float32) * (
                CENTER_INV_SCALE
            ) - 1.0                                     # [1, chunk]
            cy = (cxcy & 0xFFFF).astype(jnp.int32).astype(jnp.float32) * (
                CENTER_INV_SCALE
            ) - 1.0
            con = data[ROW_CONIC : ROW_CONIC + 1, :]
            con_a = pltpu.bitcast(
                ((con >> 20) + jnp.uint32(MF12_K)) << 16, jnp.float32
            )
            con_c = pltpu.bitcast(
                (((con >> 8) & jnp.uint32(0xFFF)) + jnp.uint32(MF12_K)) << 16,
                jnp.float32,
            )
            rho = (con & 0xFF).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / 127.5
            ) - 1.0
            con_b = rho * jnp.sqrt(con_a * con_c)
            rgba = data[ROW_RGBA : ROW_RGBA + 1, :]
            a_s = (rgba & 0xFF).astype(jnp.int32).astype(jnp.float32) * (
                1.0 / 255.0
            )

            # Work directly in m = -dpow/2: the -1/2 folds into the conic
            # rows (free [1, chunk] math) and the quadratic form runs as
            # 5 elementwise ops, m = dx*(na*dx + nb2*dy) + (nc*dy)*dy,
            # instead of the 8-op literal a*dx^2 + c*dy^2 + 2b*dx*dy
            # followed by a separate *-0.5.  The density clip
            # saturate(exp(-dpow/2)) is exactly exp(min(m, 0)).
            na = con_a * -0.5   # [1, chunk] rows
            nc = con_c * -0.5
            nb2 = -con_b
            dx = pcx - cx  # [pixels, chunk]
            dy = pcy - cy
            if QUAD_BF16:
                dxb = dx.astype(jnp.bfloat16)
                dyb = dy.astype(jnp.bfloat16)
                m = (
                    (na.astype(jnp.bfloat16) * dxb
                     + nb2.astype(jnp.bfloat16) * dyb) * dxb
                    + (nc.astype(jnp.bfloat16) * dyb) * dyb
                ).astype(jnp.float32)
            else:
                m = (na * dx + nb2 * dy) * dx + (nc * dy) * dy
            gidx = astart + c * chunk + lane  # [1, chunk] global pair index
            in_seg = (gidx >= start) & (gidx < start + count)
            if logf:
                # alpha = a_s * exp(min(m, 0)) in one exp: log a_s folds
                # into the exponent (row math) and out-of-segment lanes
                # get a -80 log-alpha (alpha == 0 after the exp
                # underflows).
                la_row = jnp.where(
                    in_seg, jnp.log(jnp.maximum(a_s, 1e-30)), -80.0
                )  # [1, chunk]
                lalpha = la_row + jnp.minimum(m, 0.0)
                alpha = jnp.exp(lalpha)
            else:
                if config.falloff == "gaussian":
                    density = jnp.exp(jnp.minimum(m, 0.0))
                else:
                    # Epanechnikov 1 - dpow/7 = 1 + m*(2/7), clipped.
                    density = jnp.clip(1.0 + m * (2.0 / 7.0), 0.0, 1.0)
                alpha = jnp.where(in_seg, a_s * density, 0.0)

            t_in = state[:, 3:4]           # [pixels, 1]: log T if logf
            if SCAN_MODE == "roll":
                # Inclusive cumprod of (1 - alpha) along the splat (lane)
                # axis: Hillis-Steele, log2(chunk) doubling steps.
                acc = 1.0 - alpha
                shift = 1
                while shift < chunk:
                    rolled = pltpu.roll(acc, shift, axis=1)
                    acc = acc * jnp.where(lane >= shift, rolled, 1.0)
                    shift *= 2
                excl = jnp.where(lane >= 1, pltpu.roll(acc, 1, axis=1), 1.0)
                t_out = t_in * acc[:, chunk - 1 : chunk]
                weight = t_in * excl * alpha
            elif SCAN_MODE == "logmm":
                # Log-space: the exclusive cumprod becomes an exclusive
                # cumsum of log(1 - alpha) on the MXU instead of
                # log2(chunk) VPU roll passes — SCAN_WIDTH-column
                # strictly-lower-triangular matmuls chained by a per-pixel
                # carry.  Mosaic has no HIGH-precision dot; l1a splits
                # into two bf16 truncation limbs (16 mantissa bits,
                # ~2^-16 relative on T) contracted in one matmul per
                # sub-block.
                l1a = jnp.log(jnp.maximum(1.0 - alpha, 1e-30))
                parts = []
                # In the fused log path the carry STARTS at log t_in, so
                # s_excl already includes the running transmittance and
                # the per-element + t_in add disappears from the weight.
                carry = t_in if logf else jnp.zeros((pixels, 1), jnp.float32)
                for sb in range(chunk // sw):
                    sl = l1a[:, sb * sw : (sb + 1) * sw]
                    if SCAN_LIMBS == 2:
                        hi = pltpu.bitcast(
                            pltpu.bitcast(sl, jnp.uint32) & mask16, jnp.float32
                        )
                        r1 = sl - hi
                        limbs = jnp.concatenate([hi, r1], axis=1).astype(
                            jnp.bfloat16
                        )  # [pixels, 2*sw]
                    else:
                        # Round-to-nearest single limb (~2^-9 relative).
                        limbs = sl.astype(jnp.bfloat16)
                    se = jax.lax.dot_general(
                        limbs, slt2, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # [pixels, sw] exclusive within the sub-block
                    parts.append(se + carry)
                    carry = carry + se[:, sw - 1 : sw] + sl[:, sw - 1 : sw]
                s_excl = (
                    jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
                )
                if logf:
                    # One exp yields the full blend weight directly.
                    weight = jnp.exp(s_excl + lalpha)
                    t_out = carry  # log-domain transmittance (incl. t_in)
                else:
                    excl = jnp.exp(s_excl)
                    # carry holds the full-chunk log-transmittance sum.
                    t_out = t_in * jnp.exp(carry)
                    weight = t_in * excl * alpha
            else:  # "chunk": order-independent within a chunk (ablation)
                l1a = jnp.log(jnp.maximum(1.0 - alpha, 1e-30))
                t_out = t_in * jnp.exp(jnp.sum(l1a, axis=1, keepdims=True))
                weight = t_in * alpha
            inv255 = jnp.float32(1.0 / 255.0)

            def chan(x):
                return x.astype(jnp.int32).astype(jnp.float32) * inv255

            rgb = jnp.concatenate(
                [
                    chan(rgba >> 24),
                    chan((rgba >> 16) & 0xFF),
                    chan((rgba >> 8) & 0xFF),
                ],
                axis=0,
            )  # [3, chunk]
            contrib = jax.lax.dot_general(
                weight,
                rgb,
                (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=jnp.float32,
            )  # [pixels, 3]
            state[:, 0:3] = state[:, 0:3] + contrib
            state[:, 3:4] = t_out
            return c + 1, jnp.max(t_out)

        final_c, _ = jax.lax.while_loop(
            cond, body, (0, jnp.float32(0.0 if logf else 1.0))
        )

        # Saturation exit leaves up to D-1 speculative chunk DMAs in
        # flight; drain them so the semaphore slots are clean for the
        # next tile.  (The loop always consumes chunk 0 when it runs, so
        # only ring slots can be left in flight; the next tile's head
        # fetch is consumed by that tile, not drained here.)
        for d in range(PREFETCH_DEPTH - 1):
            @pl.when(final_c + d < num_chunks)
            def _(d=d):
                make_dma(
                    jax.lax.rem(final_c + d, PREFETCH_DEPTH),
                    astart,
                    final_c + d,
                ).wait()

        out_ref[ti, :, 0:3] = state[:, 0:3]
        if config.background is None:
            # Reference semantics: channel 3 is tile coverage (cu:1013
            # writes alpha 255; untouched tiles keep the frame clear).
            covered = (count > 0).astype(jnp.float32)
            out_ref[ti, :, 3:4] = jnp.full((pixels, 1), covered, jnp.float32)
        else:
            # Background compositing needs the pixel's remaining
            # transmittance instead (empty tiles hold the init value,
            # T = 1 -> pure background).
            t_col = state[:, 3:4]
            out_ref[ti, :, 3:4] = jnp.exp(t_col) if logf else t_col


def rasterize_tiles(
    pair_data: jnp.ndarray,
    starts: jnp.ndarray,
    counts: jnp.ndarray,
    config: RenderConfig,
    *,
    num_tiles: int = None,
    tile_row_offset=None,
    interpret=None,
) -> jnp.ndarray:
    """Run the raster kernel.

    pair_data: [PAIR_ROWS, C + 2*chunk] from pack_pair_data.
    starts, counts: [num_tiles] int32 from ops.ranges (possibly a band
    slice for multi-chip tile-row sharding; ``tile_row_offset`` then
    shifts pixel coordinates to the band's position on screen).
    Returns [num_tiles, pixels_per_tile, 4] float32 (r, g, b, coverage).
    """
    t = num_tiles if num_tiles is not None else config.total_tiles
    tpc = config.cell_tiles(t)
    pixels = config.pixels_per_tile
    chunk = config.raster_chunk
    if t % tpc != 0:
        # Truncating would leave the last t % tpc tiles' output block
        # uninitialized (config validates total_tiles only; band slices
        # from multipass / tile-row sharding must divide too — only an
        # EXPLICIT tiles_per_cell can reach here, the auto default
        # always divides).
        raise ValueError(
            f"num_tiles ({t}) must be a multiple of tiles_per_cell "
            f"({tpc}); use a tiles_per_cell that divides the band slice"
        )
    num_cells = t // tpc
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if tile_row_offset is None:
        tile_row_offset = 0
    rowoff = jnp.asarray(tile_row_offset, jnp.int32).reshape(1)

    kernel = functools.partial(_raster_kernel, config=config, tpc=tpc)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,  # starts, counts, row offset live in SMEM
        grid=(num_cells,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec((tpc, pixels, 4), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((pixels, 8), jnp.float32),
            # D-slot in-tile ring + 2 cross-tile head slots (by parity).
            pltpu.VMEM((PREFETCH_DEPTH + 2, PAIR_ROWS, chunk), jnp.uint32),
            pltpu.SemaphoreType.DMA((PREFETCH_DEPTH + 2,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((t, pixels, 4), jnp.float32),
        interpret=interpret,
    )(starts, counts, rowoff, pair_data)


def tiles_to_image(tile_rgba: jnp.ndarray, config: RenderConfig) -> jnp.ndarray:
    """[T, pixels, 4] tile-major float -> [height, width, 4] uint8.

    Quantization matches the reference: truncating *255 cast, alpha 255 on
    covered tiles, untouched tiles stay fully zero (cu:1007-1015 plus the
    frame-start clear at Demo.cpp:399).
    """
    tx = config.tiles_x
    ts = config.tile_size
    rows = tile_rgba.shape[0] // tx  # < tiles_y when rendering a band
    img = tile_rgba.reshape(rows, tx, ts, ts, 4)
    img = img.transpose(0, 2, 1, 3, 4).reshape(rows * ts, tx * ts, 4)
    rgb = img[..., :3]
    alpha = img[..., 3:4]
    if config.background is not None:
        # Channel 3 carries per-pixel transmittance in this mode (see
        # the kernel's output write): composite the opaque background
        # under the blended splats.
        bg = jnp.asarray(config.background, jnp.float32)
        rgb = rgb + alpha * bg
        alpha = jnp.ones_like(alpha)
    if config.gamma is not None:
        rgb = jnp.power(jnp.clip(rgb, 0.0, 1.0), config.gamma)
    rgba = jnp.concatenate([rgb, alpha], axis=-1)
    return (jnp.clip(rgba, 0.0, 1.0) * 255.0).astype(jnp.uint8)

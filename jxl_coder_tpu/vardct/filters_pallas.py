"""Fused Gaborish + EPF as a Pallas TPU kernel.

The jnp filter chain costs ~20 HBM passes (every shifted slice and tap
materializes); this kernel streams row tiles through VMEM once:
HBM -> VMEM (tile + halo via async DMA) -> gaborish -> EPF -> HBM.
Semantics match pipeline.apply_filters exactly (same op order/constants);
pipeline falls back to the jnp path off-TPU or for unsupported shapes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pipeline import GABORISH_W1, GABORISH_W2, EPF_CHANNEL_SCALE

HALO = 2   # filter footprint: 1 (gaborish) + 1 (epf pass)
PAD = 4    # row padding in the stacked input (8-row DMA alignment)


def _kernel(in_hbm, out_ref, scratch, sem, *, tile: int, width: int):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        in_hbm.at[:, pl.ds(i * tile, tile + 2 * PAD), :],
        scratch, sem)
    dma.start()
    dma.wait()

    x = scratch[:]                      # (4, tile+8, W)
    img = x[:3]
    inv = x[3]

    # x-edge padding by 2 (global edges; x is not tiled)
    left = img[:, :, :1]
    right = img[:, :, -1:]
    imgp = jnp.concatenate([left, left, img, right, right], axis=2)
    # gaborish rows [PAD-1, PAD+tile+1): output (3, tile+2, W+2)
    k = np.array([[GABORISH_W2, GABORISH_W1, GABORISH_W2],
                  [GABORISH_W1, 1.0, GABORISH_W1],
                  [GABORISH_W2, GABORISH_W1, GABORISH_W2]], np.float32)
    k = k / k.sum()
    t2 = tile + 2
    base = PAD - 2  # first input row touched by the gaborish window
    gab = jnp.zeros((3, t2, width), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            gab = gab + k[dy, dx] * imgp[:, base + dy:base + dy + t2,
                                         1 + dx:1 + dx + width]

    # EPF x-taps replicate the gaborish *output* at the image edge,
    # matching the jnp apply_epf edge-pad semantics.
    gabp = jnp.concatenate([gab[:, :, :1], gab, gab[:, :, -1:]], axis=2)

    # EPF pass on gab: output rows [0, tile), inv_sigma at center rows
    inv_c = inv[PAD:PAD + tile, :]
    s0, s1, s2 = (float(EPF_CHANNEL_SCALE[0]), float(EPF_CHANNEL_SCALE[1]),
                  float(EPF_CHANNEL_SCALE[2]))
    center = gab[:, 1:1 + tile, :]
    num = jnp.zeros((3, tile, width), jnp.float32)
    den = jnp.zeros((tile, width), jnp.float32)
    for (dy, dx) in ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1)):
        shifted = gabp[:, 1 + dy:1 + dy + tile, 1 + dx:1 + dx + width]
        if dy == 0 and dx == 0:
            wgt = jnp.ones((tile, width), jnp.float32)
        else:
            ad = jnp.abs(shifted - center)
            sad = ad[0] * s0 + ad[1] * s1 + ad[2] * s2
            wgt = jnp.maximum(0.0, 1.0 - sad * inv_c)
        num = num + shifted * wgt[None]
        den = den + wgt
    out_ref[:] = num / den[None]


@functools.partial(jax.jit, static_argnames=("tile",))
def fused_gab_epf(stacked: jnp.ndarray, tile: int = 40) -> jnp.ndarray:
    """stacked: (4, H + 2*PAD, W) f32 = [xyb(3) ; inv_sigma(1)], rows
    already padded by PAD (edge-replicated at image borders).
    Returns (3, H, W) filtered."""
    _, hp, w = stacked.shape
    h = hp - 2 * PAD
    assert h % tile == 0 and tile % 8 == 0, (h, tile)
    grid = (h // tile,)
    kernel = functools.partial(_kernel, tile=tile, width=w)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, h, w), jnp.float32),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((3, tile, w),
                               lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, tile + 2 * PAD, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(stacked)


def pick_tile(h: int):
    """8-multiple tile dividing h, small enough for VMEM at 4K widths."""
    for t in (16, 24, 8, 32):
        if h % t == 0:
            return t
    return None


# ---------------------------------------------------------------------------
# Variant: filters + XYB->sRGB8 fused, separate (unconcatenated) inputs

def _kernel2(img_hbm, inv_hbm, out_ref, simg, sinv, sem1, sem2, *,
             tile: int, width: int, to_srgb: bool):
    i = pl.program_id(0)
    d1 = pltpu.make_async_copy(
        img_hbm.at[:, pl.ds(i * tile, tile + 2 * PAD), :], simg, sem1)
    d2 = pltpu.make_async_copy(
        inv_hbm.at[pl.ds(i * tile, tile + 2 * PAD), :], sinv, sem2)
    d1.start()
    d2.start()
    d1.wait()
    d2.wait()

    img = simg[:]
    inv = sinv[:]
    left = img[:, :, :1]
    right = img[:, :, -1:]
    imgp = jnp.concatenate([left, img, right], axis=2)
    k = np.array([[GABORISH_W2, GABORISH_W1, GABORISH_W2],
                  [GABORISH_W1, 1.0, GABORISH_W1],
                  [GABORISH_W2, GABORISH_W1, GABORISH_W2]], np.float32)
    k = k / k.sum()
    t2 = tile + 2
    base = PAD - 2
    gab = jnp.zeros((3, t2, width), jnp.float32)
    for dy in range(3):
        for dx in range(3):
            gab = gab + k[dy, dx] * imgp[:, base + dy:base + dy + t2,
                                         dx:dx + width]
    gabp = jnp.concatenate([gab[:, :, :1], gab, gab[:, :, -1:]], axis=2)
    inv_c = inv[PAD:PAD + tile, :]
    s0, s1, s2 = (float(EPF_CHANNEL_SCALE[0]), float(EPF_CHANNEL_SCALE[1]),
                  float(EPF_CHANNEL_SCALE[2]))
    center = gab[:, 1:1 + tile, :]
    num = jnp.zeros((3, tile, width), jnp.float32)
    den = jnp.zeros((tile, width), jnp.float32)
    for (dy, dx) in ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1)):
        shifted = gabp[:, 1 + dy:1 + dy + tile, 1 + dx:1 + dx + width]
        if dy == 0 and dx == 0:
            wgt = jnp.ones((tile, width), jnp.float32)
        else:
            ad = jnp.abs(shifted - center)
            sad = ad[0] * s0 + ad[1] * s1 + ad[2] * s2
            wgt = jnp.maximum(0.0, 1.0 - sad * inv_c)
        num = num + shifted * wgt[None]
        den = den + wgt
    xyb = num / den[None]

    if not to_srgb:
        out_ref[:] = xyb
        return
    # XYB -> linear RGB -> sRGB8 (matches xyb.py / ops.color exactly)
    from .xyb import DEFAULT_INV_OPSIN, OPSIN_BIAS, CBRT_BIAS
    x_, y_, b_ = xyb[0], xyb[1], xyb[2]
    gl = x_ + y_ + float(CBRT_BIAS)
    gm = y_ - x_ + float(CBRT_BIAS)
    gs = b_ + float(CBRT_BIAS)
    ml = gl * gl * gl - float(OPSIN_BIAS)
    mm = gm * gm * gm - float(OPSIN_BIAS)
    ms = gs * gs * gs - float(OPSIN_BIAS)
    inv_m = np.array(DEFAULT_INV_OPSIN, np.float32).reshape(3, 3)
    rgb = [None] * 3
    for c in range(3):
        rgb[c] = (float(inv_m[c, 0]) * ml + float(inv_m[c, 1]) * mm
                  + float(inv_m[c, 2]) * ms)
    outs = []
    for c in range(3):
        v = jnp.clip(rgb[c], 0.0, 1.0)
        srgb = jnp.where(v <= 0.0031308, v * 12.92,
                         1.055 * v ** (1 / 2.4) - 0.055)
        outs.append(jnp.clip(jnp.round(srgb * 255.0), 0, 255)
                    .astype(jnp.int32).astype(jnp.uint8))
    out_ref[:] = jnp.stack(outs)


@functools.partial(jax.jit, static_argnames=("tile", "to_srgb"))
def fused_filters2(img_padded: jnp.ndarray, inv_padded: jnp.ndarray,
                   tile: int = 16, to_srgb: bool = False) -> jnp.ndarray:
    """img_padded: (3, H+2*PAD, W); inv_padded: (H+2*PAD, W)."""
    _, hp, w = img_padded.shape
    h = hp - 2 * PAD
    assert h % tile == 0 and tile % 8 == 0, (h, tile)
    kernel = functools.partial(_kernel2, tile=tile, width=w,
                               to_srgb=to_srgb)
    dtype = jnp.uint8 if to_srgb else jnp.float32
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, h, w), dtype),
        grid=(h // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((3, tile, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((3, tile + 2 * PAD, w), jnp.float32),
            pltpu.VMEM((tile + 2 * PAD, w), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(img_padded, inv_padded)


# ---------------------------------------------------------------------------
# Real-format fused kernel: gaborish + EPF pass 1 with the pinned wire
# semantics (5-tap patch SADs, per-pixel inverse-sigma incl. the 2/3
# block-border multiplier, activity gate keeping the gaborish output).
# Double-buffered: the DMA for row-tile i+1 is issued before computing
# tile i (scratch persists across sequential grid steps on TPU).

def _kernel_real(img_hbm, aux_hbm, out_ref, sbuf, abuf, sems, asems, *,
                 tile: int, width: int, height: int, cs: tuple,
                 gw1: float, gw2: float, to_srgb: bool = False):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[:, pl.ds(idx * tile, tile + 2 * PAD), :],
            sbuf.at[slot], sems.at[slot])

    def adma(slot, idx):
        return pltpu.make_async_copy(
            aux_hbm.at[pl.ds(idx * tile, tile), :],
            abuf.at[slot], asems.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()
        adma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma((i + 1) % 2, i + 1).start()
        adma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    adma(i % 2, i).wait()
    stk = sbuf[i % 2]

    norm = 1.0 + 4.0 * (gw1 + gw2)
    k = np.array([[gw2, gw1, gw2], [gw1, 1.0, gw1], [gw2, gw1, gw2]],
                 np.float32) / norm
    t6 = tile + 6
    base = PAD - 4  # input row feeding gaborish output row -3, dy=0
    grow = jax.lax.broadcasted_iota(jnp.int32, (t6, 1), 0) + i * tile - 3

    def gab_channel(c):
        img = stk[c]
        imgp = jnp.concatenate([img[:, :1], img, img[:, -1:]], axis=1)
        g = jnp.zeros((t6, width), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                g = g + k[dy, dx] * imgp[base + dy:base + dy + t6,
                                         dx:dx + width]
        # out-of-image gaborish rows -> edge gaborish row replicas
        # (harness pads INPUT rows; host semantics pad the gab OUTPUT)
        g = jnp.where(grow < 0, g[3:4, :], g)
        g = jnp.where(grow > height - 1, g[3 + tile - 1:3 + tile, :], g)
        # x edge replication of the gaborish output by 2 columns
        return jnp.concatenate([g[:, :1], g[:, :1], g,
                                g[:, -1:], g[:, -1:]], axis=1)

    gabs = [gab_channel(c) for c in range(3)]

    # All patch SADs decompose over adjacent-pixel difference planes:
    # sad(0,1)(p) = sum_taps Dh(p+t), sad(0,-1)(p) = sum_taps Dh(p+t-x1)
    # with Dh = sum_c cs_c |g_c - g_c shifted x+1| (likewise Dv for the
    # vertical neighbours) — 2 difference planes instead of 60 slices.
    wx = width + 4
    Dh = jnp.zeros((t6, wx - 1), jnp.float32)
    Dv = jnp.zeros((t6 - 1, wx), jnp.float32)
    for c in range(3):
        g = gabs[c]
        Dh = Dh + cs[c] * jnp.abs(g[:, :-1] - g[:, 1:])
        Dv = Dv + cs[c] * jnp.abs(g[:-1, :] - g[1:, :])

    taps = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))

    def cross_sum(D, oy, ox):
        acc = jnp.zeros((tile, width), jnp.float32)
        for (ty, tx) in taps:
            acc = acc + D[3 + oy + ty:3 + oy + ty + tile,
                          2 + ox + tx:2 + ox + tx + width]
        return acc

    # aux arrives pixel-expanded; activity is implied by inv < 0
    # (KINV is negative; inactive blocks carry inv == 0).  The 2/3
    # block-border SAD multiplier folds in via an iota mask.
    inv_b = abuf[i % 2]
    act_c = inv_b < 0.0
    ry = jax.lax.broadcasted_iota(jnp.int32, (tile, width), 0) % 8
    cx = jax.lax.broadcasted_iota(jnp.int32, (tile, width), 1) % 8
    border = (ry == 0) | (ry == 7) | (cx == 0) | (cx == 7)
    inv_c = jnp.where(border, inv_b * np.float32(2.0 / 3.0), inv_b)
    sads = {(0, 1): cross_sum(Dh, 0, 0),
            (0, -1): cross_sum(Dh, 0, -1),
            (1, 0): cross_sum(Dv, 0, 0),
            (-1, 0): cross_sum(Dv, -1, 0)}

    def at(g, dy, dx):
        return g[3 + dy:3 + dy + tile, 2 + dx:2 + dx + width]

    num = [at(g, 0, 0) for g in gabs]
    den = jnp.ones((tile, width), jnp.float32)
    for (dy, dx), sad in sads.items():
        w = jnp.maximum(0.0, 1.0 + sad * inv_c)
        den = den + w
        for c in range(3):
            num[c] = num[c] + w * at(gabs[c], dy, dx)
    inv_den = 1.0 / den
    xyb = [jnp.where(act_c, num[c] * inv_den, at(gabs[c], 0, 0))
           for c in range(3)]
    if not to_srgb:
        for c in range(3):
            out_ref[c] = xyb[c]
        return
    # XYB -> linear -> sRGB8 with the exact FastLinearToSRGB bit trick
    # (the 16-entry exponent tables become unrolled selects)
    from .dec_real import (_OPSIN_INV, _BIAS, _CBRT_BIAS,
                           _POW25TO18, _POW17TO10)
    cb = np.float32(_CBRT_BIAS)
    bias = np.float32(_BIAS)
    g_r = xyb[1] + xyb[0] + cb
    g_g = xyb[1] - xyb[0] + cb
    g_b = xyb[2] + cb
    ml = g_r * g_r * g_r - bias
    mm = g_g * g_g * g_g - bias
    ms = g_b * g_b * g_b - bias
    M = np.asarray(_OPSIN_INV, np.float32)
    mulbits = [np.uint32((int(_POW25TO18[k]) << 18)
                         | (int(_POW17TO10[k]) << 10) | 0x40000000)
               for k in range(16)]
    for c in range(3):
        v = (np.float32(M[c, 0]) * ml + np.float32(M[c, 1]) * mm
             + np.float32(M[c, 2]) * ms)
        vb = jax.lax.bitcast_convert_type(v, jnp.uint32)
        v025 = jax.lax.bitcast_convert_type(
            (vb | np.uint32(0x3e800000)) & np.uint32(0x3effffff),
            jnp.float32)
        d1 = v025 * np.float32(0.059914046) + np.float32(-0.108894556)
        d2 = d1 * v025 + np.float32(0.107963754)
        pw = d2 * v025 + np.float32(0.018092343)
        exp = ((vb >> np.uint32(23)) - np.uint32(118)) & np.uint32(0xf)
        mb = jnp.full(v.shape, mulbits[0], jnp.uint32)
        for k in range(1, 16):
            mb = jnp.where(exp == np.uint32(k), mulbits[k], mb)
        mul = jax.lax.bitcast_convert_type(mb, jnp.float32)
        srgb = jnp.where(v < np.float32(0.0031308),
                         v * np.float32(12.92),
                         pw * mul + np.float32(-0.055))
        q = jnp.floor(srgb * np.float32(255.0) + np.float32(0.5))
        out_ref[c] = jnp.clip(q, 0.0, 255.0).astype(jnp.int32).astype(jnp.uint8)


# ---------------------------------------------------------------------------
# Full default filter chain fused: gaborish + EPF pass 1 + EPF pass 2
# (the epf_iters=2 chain every default-distance libjxl stream uses) in a
# single VMEM pass, with optional in-kernel XYB->sRGB8/16 output.
# EPF1 is computed on tile rows [-1, tile] so pass 2 sees true interior
# neighbours at tile seams; at global image edges the EPF1 OUTPUT is
# edge-replicated (exactly the host apply_epf2 np.pad(..., "edge")
# semantics in dec_real.apply_epf2).

def _srgb_out(out_ref, xyb, scale):
    """XYB -> linear -> sRGB with the exact FastLinearToSRGB bit trick;
    writes clip(floor(srgb*scale+0.5)) as int channels."""
    from .dec_real import (_OPSIN_INV, _BIAS, _CBRT_BIAS,
                           _POW25TO18, _POW17TO10)
    cb = np.float32(_CBRT_BIAS)
    bias = np.float32(_BIAS)
    g_r = xyb[1] + xyb[0] + cb
    g_g = xyb[1] - xyb[0] + cb
    g_b = xyb[2] + cb
    ml = g_r * g_r * g_r - bias
    mm = g_g * g_g * g_g - bias
    ms = g_b * g_b * g_b - bias
    M = np.asarray(_OPSIN_INV, np.float32)
    mulbits = [np.uint32((int(_POW25TO18[k]) << 18)
                         | (int(_POW17TO10[k]) << 10) | 0x40000000)
               for k in range(16)]
    dt = out_ref.dtype
    for c in range(3):
        v = (np.float32(M[c, 0]) * ml + np.float32(M[c, 1]) * mm
             + np.float32(M[c, 2]) * ms)
        vb = jax.lax.bitcast_convert_type(v, jnp.uint32)
        v025 = jax.lax.bitcast_convert_type(
            (vb | np.uint32(0x3e800000)) & np.uint32(0x3effffff),
            jnp.float32)
        d1 = v025 * np.float32(0.059914046) + np.float32(-0.108894556)
        d2 = d1 * v025 + np.float32(0.107963754)
        pw = d2 * v025 + np.float32(0.018092343)
        exp = ((vb >> np.uint32(23)) - np.uint32(118)) & np.uint32(0xf)
        mb = jnp.full(v.shape, mulbits[0], jnp.uint32)
        for k in range(1, 16):
            mb = jnp.where(exp == np.uint32(k), mulbits[k], mb)
        mul = jax.lax.bitcast_convert_type(mb, jnp.float32)
        srgb = jnp.where(v < np.float32(0.0031308),
                         v * np.float32(12.92),
                         pw * mul + np.float32(-0.055))
        q = jnp.floor(srgb * np.float32(scale) + np.float32(0.5))
        out_ref[c] = jnp.clip(q, 0.0, float(scale)).astype(
            jnp.int32).astype(dt)


def _kernel_chain(img_hbm, aux_hbm, out_ref, sbuf, abuf, sems, asems, *,
                  tile: int, width: int, height: int, cs: tuple,
                  gw1: float, gw2: float, epf_iters: int,
                  pass2_scale: float, to_srgb: bool, bits: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)

    def dma(slot, idx):
        return pltpu.make_async_copy(
            img_hbm.at[:, pl.ds(idx * tile, tile + 2 * PAD), :],
            sbuf.at[slot], sems.at[slot])

    def adma(slot, idx):
        # aux is padded by PAD rows each side on host; rows
        # [idx*tile, idx*tile + tile + 8) cover EPF rows [-1, tile+1]
        return pltpu.make_async_copy(
            aux_hbm.at[pl.ds(idx * tile, tile + 2 * PAD), :],
            abuf.at[slot], asems.at[slot])

    @pl.when(i == 0)
    def _():
        dma(0, 0).start()
        adma(0, 0).start()

    @pl.when(i + 1 < n)
    def _():
        dma((i + 1) % 2, i + 1).start()
        adma((i + 1) % 2, i + 1).start()

    dma(i % 2, i).wait()
    adma(i % 2, i).wait()
    stk = sbuf[i % 2]
    _chain_math([stk[c] for c in range(3)], abuf[i % 2], i, out_ref,
                tile=tile, width=width, height=height, cs=cs, gw1=gw1,
                gw2=gw2, epf_iters=epf_iters, pass2_scale=pass2_scale,
                to_srgb=to_srgb, bits=bits)


def _chain_math(chans, inv_buf, i, out_ref, *, tile, width, height, cs,
                gw1, gw2, epf_iters, pass2_scale, to_srgb, bits,
                pad=PAD):
    """Shared gaborish + EPF1 (+EPF2) (+sRGB) tile computation.

    chans: three (tile + 2*pad, width) row windows (rows i*tile-pad ..,
    edge-replicated at global borders); inv_buf: (tile + 2*pad, width)
    pixel-expanded EPF1 inverse-sigma rows i*tile-pad .. .
    """
    norm = 1.0 + 4.0 * (gw1 + gw2)
    k = np.array([[gw2, gw1, gw2], [gw1, 1.0, gw1], [gw2, gw1, gw2]],
                 np.float32) / norm
    t6 = tile + 6          # gaborish rows: global [i*tile-3, i*tile+tile+2]
    te = tile + 2          # EPF1 output rows: global [i*tile-1, i*tile+tile]
    base = pad - 4
    grow = jax.lax.broadcasted_iota(jnp.int32, (t6, 1), 0) + i * tile - 3

    def gab_channel(c):
        img = chans[c]
        imgp = jnp.concatenate([img[:, :1], img, img[:, -1:]], axis=1)
        g = jnp.zeros((t6, width), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                g = g + k[dy, dx] * imgp[base + dy:base + dy + t6,
                                         dx:dx + width]
        # out-of-image gaborish rows -> libjxl Mirror() of the edge
        # rows (-1 -> 0, -2 -> 1, -3 -> 2); only the first/last grid
        # step has such rows, and they sit at window positions 0..2 /
        # t6-3..t6-1 whose mirror targets are inside the window.
        # (row-reversal via explicit slices: Mosaic has no rev lowering)
        gmt = jnp.concatenate([g[5:6, :], g[4:5, :], g[3:4, :],
                               g[3:, :]], 0)
        g = jnp.where(grow < 0, gmt, g)
        gmb = jnp.concatenate([g[:t6 - 3, :], g[t6 - 4:t6 - 3, :],
                               g[t6 - 5:t6 - 4, :],
                               g[t6 - 6:t6 - 5, :]], 0)
        g = jnp.where(grow > height - 1, gmb, g)
        # x edges: symmetric (Mirror) by 2 columns
        return jnp.concatenate([g[:, 1:2], g[:, 0:1], g,
                                g[:, -1:], g[:, -2:-1]], axis=1)

    gabs = [gab_channel(c) for c in range(3)]

    # adjacent-difference planes: every 5-tap patch SAD decomposes over
    # them (2 planes instead of 60 shifted slices)
    wx = width + 4
    Dh = jnp.zeros((t6, wx - 1), jnp.float32)
    Dv = jnp.zeros((t6 - 1, wx), jnp.float32)
    for c in range(3):
        g = gabs[c]
        Dh = Dh + cs[c] * jnp.abs(g[:, :-1] - g[:, 1:])
        Dv = Dv + cs[c] * jnp.abs(g[:-1, :] - g[1:, :])

    taps = ((0, 0), (0, 1), (0, -1), (1, 0), (-1, 0))

    def cross_sum(D, oy, ox):
        # EPF1 SAD over the extended output rows [-1, tile]
        acc = jnp.zeros((te, width), jnp.float32)
        for (ty, tx) in taps:
            acc = acc + D[2 + oy + ty:2 + oy + ty + te,
                          2 + ox + tx:2 + ox + tx + width]
        return acc

    # inv arrives pixel-expanded, padded by `pad` rows each side; local
    # row j of the EPF1 range (global i*tile+j-1) is buffer row
    # j + pad - 1.
    inv_ext = inv_buf[pad - 1:pad - 1 + te, :]
    act_ext = inv_ext < 0.0
    grow1 = (jax.lax.broadcasted_iota(jnp.int32, (te, width), 0)
             + i * tile - 1)
    ry = (grow1 + 8) % 8
    cx = jax.lax.broadcasted_iota(jnp.int32, (te, width), 1) % 8
    border = (ry == 0) | (ry == 7) | (cx == 0) | (cx == 7)
    inv_ext = jnp.where(border, inv_ext * np.float32(2.0 / 3.0), inv_ext)

    sads = {(0, 1): cross_sum(Dh, 0, 0),
            (0, -1): cross_sum(Dh, 0, -1),
            (1, 0): cross_sum(Dv, 0, 0),
            (-1, 0): cross_sum(Dv, -1, 0)}

    def at(g, dy, dx):
        return g[2 + dy:2 + dy + te, 2 + dx:2 + dx + width]

    num = [at(g, 0, 0) for g in gabs]
    den = jnp.ones((te, width), jnp.float32)
    for (dy, dx), sad in sads.items():
        w = jnp.maximum(0.0, 1.0 + sad * inv_ext)
        den = den + w
        for c in range(3):
            num[c] = num[c] + w * at(gabs[c], dy, dx)
    inv_den = 1.0 / den
    out1 = [jnp.where(act_ext, num[c] * inv_den, at(gabs[c], 0, 0))
            for c in range(3)]

    if epf_iters < 2:
        xyb = [o[1:1 + tile] for o in out1]
    else:
        # edge-replicate the EPF1 OUTPUT at global image borders, then
        # pass 2: 4-neighbour cross, POINTWISE SADs, slope * pass2_scale
        rep = [jnp.where(grow1 < 0, o[1:2, :], o) for o in out1]
        rep = [jnp.where(grow1 > height - 1, o[te - 2:te - 1, :], o)
               for o in rep]
        o1p = [jnp.concatenate([o[:, :1], o, o[:, -1:]], axis=1)
               for o in rep]
        inv2 = inv_ext[1:1 + tile, :] * np.float32(pass2_scale)
        act2 = act_ext[1:1 + tile, :]
        cen = [o[1:1 + tile, 1:1 + width] for o in o1p]
        num2 = [c for c in cen]
        den2 = jnp.ones((tile, width), jnp.float32)
        for (dy, dx) in ((0, 1), (0, -1), (1, 0), (-1, 0)):
            nb = [o[1 + dy:1 + dy + tile, 1 + dx:1 + dx + width]
                  for o in o1p]
            sad = jnp.zeros((tile, width), jnp.float32)
            for c in range(3):
                sad = sad + cs[c] * jnp.abs(cen[c] - nb[c])
            w = jnp.maximum(0.0, 1.0 + sad * inv2)
            den2 = den2 + w
            for c in range(3):
                num2[c] = num2[c] + w * nb[c]
        inv_d2 = 1.0 / den2
        xyb = [jnp.where(act2, num2[c] * inv_d2, cen[c])
               for c in range(3)]

    if not to_srgb:
        for c in range(3):
            out_ref[c] = xyb[c]
        return
    _srgb_out(out_ref, xyb, 255.0 if bits <= 8 else 65535.0)


@functools.partial(jax.jit, static_argnames=(
    "tile", "epf_iters", "pass2_scale", "gw1", "gw2", "to_srgb", "bits"))
def fused_real_filters(img_padded: jnp.ndarray, inv_blocks: jnp.ndarray,
                       tile: int = 16, epf_iters: int = 2,
                       pass2_scale: float = 6.5,
                       gw1: float = 0.115169525, gw2: float = 0.061248592,
                       to_srgb: bool = False, bits: int = 8
                       ) -> jnp.ndarray:
    """Gaborish + EPF1 (+ EPF2) in one VMEM pass, real wire semantics.

    img_padded: (3, H+2*PAD, W) XYB planes, rows edge-padded by PAD;
    inv_blocks: (H/8, W/8) per-BLOCK KINV*2.53/sigma (EPF1 slope), 0
    where inactive.  Returns (3, H, W) f32, or uint8/uint16 sRGB with
    to_srgb (bits selects the output scale).
    """
    from .dec_real import EPF_CHANNEL_SCALE
    _, hp, w = img_padded.shape
    h = hp - 2 * PAD
    assert h % tile == 0 and tile % 8 == 0, (h, tile)
    aux = jnp.repeat(jnp.repeat(inv_blocks, 8, 0), 8, 1)[:h]
    aux = jnp.pad(aux, ((PAD, PAD), (0, 0)), mode="edge")
    kernel = functools.partial(
        _kernel_chain, tile=tile, width=w, height=h,
        cs=tuple(float(c) for c in EPF_CHANNEL_SCALE),
        gw1=float(gw1), gw2=float(gw2), epf_iters=int(epf_iters),
        pass2_scale=float(pass2_scale), to_srgb=to_srgb, bits=bits)
    out_dt = jnp.float32 if not to_srgb else (
        jnp.uint8 if bits <= 8 else jnp.uint16)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, h, w), out_dt),
        grid=(h // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((3, tile, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, tile + 2 * PAD, w), jnp.float32),
            pltpu.VMEM((2, tile + 2 * PAD, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(img_padded, aux)


# ---------------------------------------------------------------------------
# Three-plane variant: consumes the synthesis outputs directly (no
# stack+pad HBM pass).  Row halos are handled in-kernel: edge tiles DMA
# only the in-image rows and replicate the border row into the halo.

PAD3 = 8   # 3-plane kernel halo: Mosaic DMA slices need 8-row alignment


def _kernel_chain3(x_hbm, y_hbm, b_hbm, aux_hbm, out_ref, sbuf, abuf,
                   sems, asems, *, tile: int, width: int, height: int,
                   cs: tuple, gw1: float, gw2: float, epf_iters: int,
                   pass2_scale: float, to_srgb: bool, bits: int):
    i = pl.program_id(0)
    n = pl.num_programs(0)
    PAD_ = PAD3
    win = tile + 2 * PAD_
    chans_hbm = (x_hbm, y_hbm, b_hbm)

    def issue(slot, idx):
        """Branch-keyed DMA sets for tile idx: edge tiles copy only the
        in-image rows (the halo is filled by replication after wait)."""

        def chan_copy(c, src_rows, dst_off, length):
            return pltpu.make_async_copy(
                chans_hbm[c].at[pl.ds(src_rows, length), :],
                sbuf.at[slot, c, pl.ds(dst_off, length)],
                sems.at[slot, c])

        def acopy(src_rows, dst_off, length):
            return pltpu.make_async_copy(
                aux_hbm.at[pl.ds(src_rows, length), :],
                abuf.at[slot, pl.ds(dst_off, length)],
                asems.at[slot])

        if n == 1:
            ops = [chan_copy(c, 0, PAD_, tile) for c in range(3)]
            ops.append(acopy(0, PAD_, tile))
            return {(True, True): ops}
        # write the start as an explicit multiple of 8 so Mosaic's
        # divisibility analysis accepts the dynamic sublane offset
        start = (idx * (tile // 8) - PAD_ // 8) * 8
        return {
            (True, False): (
                [chan_copy(c, 0, PAD_, tile + PAD_) for c in range(3)]
                + [acopy(0, PAD_, tile + PAD_)]),
            (False, True): (
                [chan_copy(c, start, 0, tile + PAD_)
                 for c in range(3)]
                + [acopy(start, 0, tile + PAD_)]),
            (False, False): (
                [chan_copy(c, start, 0, win) for c in range(3)]
                + [acopy(start, 0, win)]),
        }

    def do(table, idx, action):
        first = idx == 0
        last = idx == n - 1
        if len(table) == 1:
            for op in table[(True, True)]:
                getattr(op, action)()
            return

        @pl.when(first)
        def _():
            for op in table[(True, False)]:
                getattr(op, action)()

        @pl.when(jnp.logical_and(jnp.logical_not(first), last))
        def _():
            for op in table[(False, True)]:
                getattr(op, action)()

        @pl.when(jnp.logical_and(jnp.logical_not(first),
                                 jnp.logical_not(last)))
        def _():
            for op in table[(False, False)]:
                getattr(op, action)()

    @pl.when(i == 0)
    def _():
        do(issue(0, 0), 0, "start")

    @pl.when(i + 1 < n)
    def _():
        do(issue((i + 1) % 2, i + 1), i + 1, "start")

    do(issue(i % 2, i), i, "wait")

    # replicate the border rows into the halo (edge tiles only)
    slot = i % 2

    @pl.when(i == 0)
    def _():
        for c in range(3):
            v = sbuf[slot, c]
            sbuf[slot, c, 0:PAD_, :] = jnp.broadcast_to(
                v[PAD_:PAD_ + 1, :], (PAD_, width))
        av = abuf[slot]
        abuf[slot, 0:PAD_, :] = jnp.broadcast_to(
            av[PAD_:PAD_ + 1, :], (PAD_, width))

    @pl.when(i == n - 1)
    def _():
        top = tile + PAD_   # first in-halo row below the DMA'd data
        for c in range(3):
            v = sbuf[slot, c]
            sbuf[slot, c, top:win, :] = jnp.broadcast_to(
                v[top - 1:top, :], (win - top, width))
        av = abuf[slot]
        abuf[slot, top:win, :] = jnp.broadcast_to(
            av[top - 1:top, :], (win - top, width))

    _chain_math([sbuf[slot, c] for c in range(3)], abuf[slot], i, out_ref,
                tile=tile, width=width, height=height, cs=cs, gw1=gw1,
                gw2=gw2, epf_iters=epf_iters, pass2_scale=pass2_scale,
                to_srgb=to_srgb, bits=bits, pad=PAD_)


@functools.partial(jax.jit, static_argnames=(
    "tile", "epf_iters", "pass2_scale", "gw1", "gw2", "to_srgb", "bits"))
def fused_real_filters3(X: jnp.ndarray, Y: jnp.ndarray, B: jnp.ndarray,
                        inv_blocks: jnp.ndarray,
                        tile: int = 16, epf_iters: int = 2,
                        pass2_scale: float = 6.5,
                        gw1: float = 0.115169525, gw2: float = 0.061248592,
                        to_srgb: bool = False, bits: int = 8
                        ) -> jnp.ndarray:
    """Gaborish + EPF1 (+ EPF2) (+ sRGB) from three UNPADDED planes.

    X/Y/B: (H, W) f32; inv_blocks: (H/8, W/8) per-block EPF1 slope
    (negative where active, 0 inactive).  Equivalent to
    fused_real_filters but without the stack+pad HBM pass.
    """
    from .dec_real import EPF_CHANNEL_SCALE
    h, w = Y.shape
    assert h % tile == 0 and tile % 8 == 0, (h, tile)
    aux = jnp.repeat(jnp.repeat(inv_blocks, 8, 0), 8, 1)[:h]
    kernel = functools.partial(
        _kernel_chain3, tile=tile, width=w, height=h,
        cs=tuple(float(c) for c in EPF_CHANNEL_SCALE),
        gw1=float(gw1), gw2=float(gw2), epf_iters=int(epf_iters),
        pass2_scale=float(pass2_scale), to_srgb=to_srgb, bits=bits)
    out_dt = jnp.float32 if not to_srgb else (
        jnp.uint8 if bits <= 8 else jnp.uint16)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, h, w), out_dt),
        grid=(h // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * 4,
        out_specs=pl.BlockSpec((3, tile, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, tile + 2 * PAD3, w), jnp.float32),
            pltpu.VMEM((2, tile + 2 * PAD3, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(X, Y, B, aux)


@functools.partial(jax.jit, static_argnames=("tile", "to_srgb"))
def fused_real_gab_epf1(img_padded: jnp.ndarray, inv_blocks: jnp.ndarray,
                        tile: int = 16, to_srgb: bool = False
                        ) -> jnp.ndarray:
    """Real-format gaborish + EPF1 in one VMEM pass.

    img_padded: (3, H+2*PAD, W) XYB planes, rows edge-padded by PAD;
    inv_blocks: (H/8, W/8) per-BLOCK KINV*2.53/sigma, 0 where the
    block is inactive (activity == inv < 0 in-kernel); the 2/3 border
    multiplier is applied in-kernel.  Returns (3, H, W) f32 (or uint8
    sRGB with to_srgb).
    """
    from .dec_real import EPF_CHANNEL_SCALE
    _, hp, w = img_padded.shape
    h = hp - 2 * PAD
    assert h % tile == 0 and tile % 8 == 0, (h, tile)
    # pixel-expand outside the kernel (Mosaic cannot lane-repeat and
    # sub-8-row DMA slices are unaligned); border mul stays in-kernel
    aux = jnp.repeat(jnp.repeat(inv_blocks, 8, 0), 8, 1)[:h]
    kernel = functools.partial(
        _kernel_real, tile=tile, width=w, height=h,
        cs=tuple(float(c) for c in EPF_CHANNEL_SCALE),
        gw1=0.115169525, gw2=0.061248592, to_srgb=to_srgb)
    out_dt = jnp.uint8 if to_srgb else jnp.float32
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((3, h, w), out_dt),
        grid=(h // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((3, tile, w), lambda i: (0, i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, 3, tile + 2 * PAD, w), jnp.float32),
            pltpu.VMEM((2, tile, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(img_padded, aux)

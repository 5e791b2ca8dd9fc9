"""Real-format VarDCT still encoder (wire-compatible with libjxl).

Round-1 shape: DCT8-only strategy grid, uniform quant field derived
from the target distance, no filters (gaborish off, EPF off, adaptive
DC smoothing skipped via frame flag 0x80), CfL at base factors (Y
subtracted from B; X coded raw).  Multi-group images produce the full
section layout: LfGlobal | LfGroup* | HfGlobal | PassGroup*.
"""

from __future__ import annotations

from typing import List

import numpy as np

from ..bitstream.writer import BitWriter
from ..bitstream.reader import pack_signed
from ..bitstream.headers import ImageHeader, ImageMetadata, SizeHeader
from ..bitstream.frame_header import (FrameHeader, Encoding,
                                      write_frame_header, write_toc)
from ..codec import write_image_header
from ..entropy.coder import TokenStream
from ..modular.image import Channel, ModularImage
from ..modular.stream import GroupHeader, encode_modular_stream
from ..modular.tree import Tree
from .strategies import STRATEGIES
from .dec_real import (nonzero_ctx, zero_density_ctx, DEFAULT_CTX_MAP,
                       NONZERO_BUCKETS, ZERO_DENSITY_CTX_COUNT)
from . import synthesis as S

_BIAS = 0.0037930732552754493
_CBRT_BIAS = float(np.cbrt(_BIAS))
_OPSIN = np.array([[0.30, 0.622, 0.078],
                   [0.23, 0.692, 0.078],
                   [0.24342268924547819, 0.20476744424496821,
                    0.5518098665095536]])

NUM_CTXS = 15
DC_STEPS = (0.000244140625, 0.001953125, 0.00390625)  # x, y, b


def srgb8_to_xyb(pix: np.ndarray):
    f = pix.astype(np.float64) / 255.0
    lin = np.where(f <= 0.04045, f / 12.92,
                   ((f + 0.055) / 1.055) ** 2.4)
    mixed = lin @ _OPSIN.T
    g = np.cbrt(mixed + _BIAS) - _CBRT_BIAS
    return ((g[..., 0] - g[..., 1]) / 2,
            (g[..., 0] + g[..., 1]) / 2,
            g[..., 2])


def _modular_substream(channels) -> BitWriter:
    bw = BitWriter()
    encode_modular_stream(bw, ModularImage(list(channels)),
                          GroupHeader(), Tree.single_leaf(predictor=0))
    return bw


def _write_ac_tokens(ts, vals_by_anchor, xs_b, ys_b, qf):
    nz_map = np.zeros((3, ys_b, xs_b), np.int32)
    for by in range(ys_b):
        for bx in range(xs_b):
            chans = vals_by_anchor[(by, bx)]
            for c in (1, 0, 2):
                vals = chans[c]
                if by == 0:
                    predicted = 32 if bx == 0 else int(nz_map[c, by, bx - 1])
                elif bx == 0:
                    predicted = int(nz_map[c, by - 1, bx])
                else:
                    predicted = (int(nz_map[c, by - 1, bx])
                                 + int(nz_map[c, by, bx - 1]) + 1) // 2
                idx = ((c ^ 1) if c < 2 else 2) * 13
                bctx = DEFAULT_CTX_MAP[idx]
                nz = int(np.count_nonzero(vals[1:]))
                nz_map[c, by, bx] = nz
                ts.add(nonzero_ctx(predicted, bctx, NUM_CTXS), nz)
                ctx_off = NUM_CTXS * NONZERO_BUCKETS \
                    + ZERO_DENSITY_CTX_COUNT * bctx
                prev = 0 if nz > 4 else 1
                nzeros = nz
                k = 1
                while nzeros > 0:
                    v = int(vals[k])
                    ctx = ctx_off + zero_density_ctx(nzeros, k, 1, 0, prev)
                    ts.add(ctx, pack_signed(v))
                    prev = 1 if v else 0
                    nzeros -= prev
                    k += 1


def encode_vardct_real(pixels: np.ndarray, distance: float = 1.0
                       ) -> bytes:
    """uint8 (H, W, 3) sRGB -> real-format VarDCT codestream."""
    H, W, _ = pixels.shape
    xs_b, ys_b = -(-W // 8), -(-H // 8)
    pw, ph = xs_b * 8, ys_b * 8
    pad = np.pad(pixels, ((0, ph - H), (0, pw - W), (0, 0)), mode="edge")
    X, Y, B = srgb8_to_xyb(pad)
    B = B - Y                 # CfL base factor 1.0

    gs = 7340
    igs = 65536.0 / gs
    qf = int(np.clip(round(7.0 / distance), 1, 255))
    qdc = int(np.clip(round(10.0 / distance), 1, 1024))
    inv_qac = igs / qf
    dc_steps = [d * igs / qdc for d in DC_STEPS]

    order = S.scan_to_basis(0)
    tabs = [S.dequant_table(0, c).astype(np.float64) * inv_qac
            for c in range(3)]
    ANA = S.ana_basis(8)

    # per-block coefficients (vectorised analysis)
    def block_coeffs(plane):
        b = plane.reshape(ys_b, 8, xs_b, 8).transpose(0, 2, 1, 3)
        return np.einsum("ky,YXyx,lx->YXkl", ANA, b, ANA)

    co = {0: block_coeffs(X), 1: block_coeffs(Y), 2: block_coeffs(B)}
    dc_int = np.zeros((3, ys_b, xs_b), np.int64)
    dc_int[0] = np.round(co[1][:, :, 0, 0] / dc_steps[1])
    dc_int[1] = np.round(co[0][:, :, 0, 0] / dc_steps[0])
    dc_int[2] = np.round(co[2][:, :, 0, 0] / dc_steps[2])

    vals_all = {}
    for c in range(3):
        flat = co[c].reshape(ys_b, xs_b, 64)
        q = np.zeros((ys_b, xs_b, 64), np.int64)
        idx = order[1:]
        steps = tabs[c][idx]
        q[:, :, 1:] = np.round(flat[:, :, idx] / steps)
        vals_all[c] = q  # scan-indexed

    # ---- frame assembly
    m = ImageMetadata()
    hdr = ImageHeader(size=SizeHeader(xsize=W, ysize=H), metadata=m)
    fh = FrameHeader(encoding=Encoding.VARDCT, flags=128,
                     x_qm_scale=2, b_qm_scale=2)
    fh.restoration_filter.gab = False
    fh.restoration_filter.epf_iters = 0

    gd_b = 32                     # AC group: 32x32 blocks
    lf_b = 256                    # LF group: 256x256 blocks
    gx = -(-xs_b // gd_b)
    gy = -(-ys_b // gd_b)
    ng = gx * gy
    gx_lf = -(-xs_b // lf_b)
    gy_lf = -(-ys_b // lf_b)
    ndc = gx_lf * gy_lf

    def lf_global_bits():
        w_ = BitWriter()
        w_.bool(True)
        w_.u32(gs, (11, 1), (11, 2049), (12, 4097), (16, 8193))
        w_.u32(qdc, 16, (5, 1), (8, 1), (16, 1))
        w_.bool(True)
        w_.bool(True)
        w_.bool(False)
        return w_

    def lf_group_bits(gi):
        lx = (gi % gx_lf) * lf_b
        ly = (gi // gx_lf) * lf_b
        gw = min(lf_b, xs_b - lx)
        gh = min(lf_b, ys_b - ly)
        w_ = BitWriter()
        w_.u(0, 2)
        w_.append_writer(_modular_substream([
            Channel(gw, gh, data=np.ascontiguousarray(
                dc_int[i, ly:ly + gh, lx:lx + gw], np.int32))
            for i in range(3)]))
        nb = gw * gh
        upper = gw * gh
        cb = (upper - 1).bit_length() if upper > 1 else 0
        w_.u(nb - 1, cb)
        blockinfo = np.zeros((2, nb), np.int32)
        blockinfo[1, :] = qf - 1
        cw, ch = -(-gw // 8), -(-gh // 8)
        w_.append_writer(_modular_substream([
            Channel(cw, ch, hshift=3, vshift=3,
                    data=np.zeros((ch, cw), np.int32)),
            Channel(cw, ch, hshift=3, vshift=3,
                    data=np.zeros((ch, cw), np.int32)),
            Channel(nb, 2, data=blockinfo),
            Channel(gw, gh, data=np.zeros((gh, gw), np.int32))]))
        return w_

    def hf_global_bits():
        w_ = BitWriter()
        w_.bool(True)
        if ng > 1:
            w_.u(0, (ng - 1).bit_length())  # num_histograms = 1
        w_.u32(0, 0x5F, 0x13, 0, (13, 0))
        return w_

    # shared AC histograms must cover all groups: gather all tokens
    def group_tokens(gi, ts):
        ax = (gi % gx) * gd_b
        ay = (gi // gx) * gd_b
        gw = min(gd_b, xs_b - ax)
        gh = min(gd_b, ys_b - ay)
        vals = {(by, bx): {c: vals_all[c][ay + by, ax + bx]
                           for c in range(3)}
                for by in range(gh) for bx in range(gw)}
        _write_ac_tokens(ts, vals, gw, gh, qf)

    if ng == 1 and ndc == 1:
        sec = lf_global_bits()
        sec.append_writer(lf_group_bits(0))
        sec.append_writer(hf_global_bits())
        ts = TokenStream(NUM_CTXS * (NONZERO_BUCKETS
                                     + ZERO_DENSITY_CTX_COUNT))
        group_tokens(0, ts)
        ts.write(sec)
        sec.zero_pad_to_byte()
        payloads = [sec.to_bytes()]
    else:
        # per-group token streams share one histogram set: write
        # histograms in HfGlobal?  The AC code lives in HfGlobal and the
        # groups carry only the symbol bits; TokenStream couples both,
        # so emit a joint histogram over all groups' tokens, then write
        # each group with the shared code.
        all_ts = [TokenStream(NUM_CTXS * (NONZERO_BUCKETS
                                          + ZERO_DENSITY_CTX_COUNT))
                  for _ in range(ng)]
        for gi in range(ng):
            group_tokens(gi, all_ts[gi])
        joint = TokenStream(NUM_CTXS * (NONZERO_BUCKETS
                                        + ZERO_DENSITY_CTX_COUNT))
        for t in all_ts:
            joint.tokens.extend(t.tokens)
        hf = hf_global_bits()
        shared = joint.write_histograms(hf)
        sections = []
        for gi in range(ng):
            gw_ = BitWriter()
            all_ts[gi].write_symbols(gw_, shared)
            gw_.zero_pad_to_byte()
            sections.append(gw_.to_bytes())
        lfg = lf_global_bits()
        lfg.zero_pad_to_byte()
        payloads = [lfg.to_bytes()]
        for gi in range(ndc):
            b = lf_group_bits(gi)
            b.zero_pad_to_byte()
            payloads.append(b.to_bytes())
        hf.zero_pad_to_byte()
        payloads.append(hf.to_bytes())
        payloads.extend(sections)

    bw = BitWriter()
    write_image_header(bw, hdr)
    write_frame_header(bw, fh, hdr)
    write_toc(bw, [len(p) for p in payloads])
    return bw.to_bytes() + b"".join(payloads)

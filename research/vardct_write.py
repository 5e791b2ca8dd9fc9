"""Craft real-format VarDCT streams (single group, DCT8-only, filters
off) and feed them to libjxl — the numerical oracle for dequant tables,
DCT conventions, DC quantization and the XYB inverse.
"""
import sys, os
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/research")
os.environ.setdefault("JXL_TPU_NO_NATIVE", "1")

import numpy as np

from jxl_coder_tpu.bitstream.writer import BitWriter
from jxl_coder_tpu.bitstream.reader import pack_signed
from jxl_coder_tpu.bitstream.headers import (ImageHeader, ImageMetadata,
                                             SizeHeader)
from jxl_coder_tpu.bitstream.frame_header import (FrameHeader, Encoding,
                                                  write_frame_header,
                                                  write_toc)
from jxl_coder_tpu.codec import write_image_header
from jxl_coder_tpu.entropy.coder import TokenStream
from jxl_coder_tpu.modular.image import Channel, ModularImage
from jxl_coder_tpu.modular.stream import GroupHeader, encode_modular_stream
from jxl_coder_tpu.modular.tree import Tree

from vardct_trace import (ZIGZAG8, nonzero_ctx, block_context,
                          zero_density_ctx, DEFAULT_CTX_MAP)

NUM_CTXS = 15  # default block ctx map


def write_ac_group(ts, coeffs, acs_arr, qf_arr):
    """Tokens for one pass group; coeffs: (3, by, bx, 64) ints in
    natural (row-major frequency) layout; zigzag applied here."""
    _, ys_b, xs_b, _ = coeffs.shape
    nz_map = np.zeros((3, ys_b, xs_b), np.int32)
    for by in range(ys_b):
        for bx in range(xs_b):
            assert acs_arr[by, bx] == 0
            qf = int(qf_arr[by, bx])
            for c in (1, 0, 2):
                block = coeffs[c, by, bx]
                if by == 0:
                    predicted = 32 if bx == 0 else int(nz_map[c, by, bx - 1])
                elif bx == 0:
                    predicted = int(nz_map[c, by - 1, bx])
                else:
                    predicted = (int(nz_map[c, by - 1, bx])
                                 + int(nz_map[c, by, bx - 1]) + 1) // 2
                bctx = block_context(DEFAULT_CTX_MAP, 1, [], 0, qf, 0, c)
                nz = int(np.count_nonzero(block[1:]))
                nz_map[c, by, bx] = nz
                ts.add(nonzero_ctx(predicted, bctx, NUM_CTXS), nz)
                ctx_off = NUM_CTXS * 37 + 458 * bctx
                prev = 0 if nz > 4 else 1
                nzeros = nz
                k = 1
                while nzeros > 0:
                    v = int(block[ZIGZAG8[k]])
                    ctx = ctx_off + zero_density_ctx(nzeros, k, 1, 0, prev)
                    ts.add(ctx, pack_signed(v))
                    prev = 1 if v else 0
                    nzeros -= prev
                    k += 1


def modular_substream(channels, predictor=0):
    """Encode a standalone modular sub-stream (local single-leaf tree)."""
    bw = BitWriter()
    img = ModularImage(list(channels))
    tree = Tree.single_leaf(predictor=predictor)
    encode_modular_stream(bw, img, GroupHeader(), tree)
    return bw


def craft(dc, coeffs, gs=65536, qdc=16, qf=16, W=64, H=64,
          x_qm_scale=2, b_qm_scale=2):
    """dc: (3, H/8, W/8) ints (Y, X, B order); coeffs (3, H/8, W/8, 64)."""
    ys_b, xs_b = H // 8, W // 8
    m = ImageMetadata()
    hdr = ImageHeader(size=SizeHeader(xsize=W, ysize=H), metadata=m)
    assert m.xyb_encoded
    fh = FrameHeader(encoding=Encoding.VARDCT, flags=128,
                     x_qm_scale=x_qm_scale, b_qm_scale=b_qm_scale)
    fh.restoration_filter.gab = False
    fh.restoration_filter.epf_iters = 0

    sec = BitWriter()
    # ---- LfGlobal
    sec.bool(True)                    # dc_quant all_default
    sec.u32(gs, (11, 1), (11, 2049), (12, 4097), (16, 8193))
    sec.u32(qdc, 16, (5, 1), (8, 1), (16, 1))
    sec.bool(True)                    # block ctx map default
    sec.bool(True)                    # cfl DC default
    sec.bool(False)                   # no global tree (modular global empty)
    # ---- LfGroup
    sec.u(0, 2)                       # extra_precision
    dcw = modular_substream([Channel(xs_b, ys_b,
                                     data=np.ascontiguousarray(
                                         dc[i], np.int32).copy())
                             for i in range(3)])
    sec.append_writer(dcw)
    # AcMetadata
    nb = xs_b * ys_b
    count_bits = max(1, (nb - 1).bit_length()) if nb > 1 else 0
    sec.u(nb - 1, count_bits)
    blockinfo = np.zeros((2, nb), np.int32)
    blockinfo[1, :] = qf - 1
    acmw = modular_substream([
        Channel(1, 1, hshift=3, vshift=3, data=np.zeros((1, 1), np.int32)),
        Channel(1, 1, hshift=3, vshift=3, data=np.zeros((1, 1), np.int32)),
        Channel(nb, 2, data=blockinfo),
        Channel(xs_b, ys_b, data=np.zeros((ys_b, xs_b), np.int32))])
    sec.append_writer(acmw)
    # ---- HfGlobal
    sec.bool(True)                    # dequant matrices all_default
    # num_histograms: CeilLog2(num_groups)=0 bits
    sec.u32(0, 0x5F, 0x13, 0, (13, 0))   # used_orders = 0
    # ---- AC histograms + pass group tokens
    ts = TokenStream(NUM_CTXS * (37 + 458))
    qf_arr = np.full((ys_b, xs_b), qf, np.int32)
    acs_arr = np.zeros((ys_b, xs_b), np.int32)
    write_ac_group(ts, coeffs, acs_arr, qf_arr)
    ts.write(sec)
    sec.zero_pad_to_byte()
    payload = sec.to_bytes()

    bw = BitWriter()
    write_image_header(bw, hdr)
    write_frame_header(bw, fh, hdr)
    write_toc(bw, [len(payload)])
    return bw.to_bytes() + payload


if __name__ == "__main__":
    import refjxl
    dc = np.zeros((3, 8, 8), np.int64)
    coeffs = np.zeros((3, 8, 8, 64), np.int64)
    data = craft(dc, coeffs)
    print("stream:", len(data), "bytes")
    out, info = refjxl.decode(data)
    print("decoded:", out.shape, "uniq:", np.unique(out))

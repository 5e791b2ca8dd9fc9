"""Real-format VarDCT frame decoding (wire-compatible with libjxl).

Layer map (cf. reference dec_frame.cc / dec_group.cc call stacks):
  LfGlobal  : dc-dequant factors, quantizer, block context map,
              colour-correlation DC, global modular (tree+histograms)
  LfGroup   : extra_precision + quantized DC modular stream (Y, X, B),
              AC metadata modular stream (cfl tiles, acs+qf, sharpness)
  HfGlobal  : dequant matrices, num_histograms, per-pass coefficient
              orders + AC histograms
  PassGroup : per-block nonzero counts + coefficients over the
              zero-density context model

Dequant tables are pinned NUMERICALLY against libjxl (single-coefficient
probe streams decoded with float output; see research/vardct_write.py),
not copied: the stored table is the observed response of the reference
decoder.  DCT convention: DC equals the block mean; AC basis
cos(pi(2x+1)k/16) with amplitude sqrt(2); stored index k maps to basis
(ky=k%8, kx=k//8) (transposed storage).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple

import numpy as np

from ..bitstream.reader import BitReader, BitstreamError, unpack_signed
from ..entropy.coder import read_cluster_map, EntropyCode, EntropyDecoder
from ..modular.tree import decode_tree
from ..modular.stream import decode_modular_stream
from ..modular.image import Channel, ModularImage

# ---------------------------------------------------------------------------
# Constants (block context model, §ac_context)

DEFAULT_CTX_MAP = [
    0, 1, 2, 2, 3, 3, 4, 5, 6, 6, 6, 6, 6,
    7, 8, 9, 9, 10, 11, 12, 13, 14, 14, 14, 14, 14,
    7, 8, 9, 9, 10, 11, 12, 13, 14, 14, 14, 14, 14]

ZIGZAG8 = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

K_COEFF_FREQ_CTX = [
    0xBAD, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14,
    15, 15, 16, 16, 17, 17, 18, 18, 19, 19, 20, 20, 21, 21, 22, 22,
    23, 23, 23, 23, 24, 24, 24, 24, 25, 25, 25, 25, 26, 26, 26, 26,
    27, 27, 27, 27, 28, 28, 28, 28, 29, 29, 29, 29, 30, 30, 30, 30]
K_NUM_NZ_CTX = [
    0xBAD, 0, 31, 62, 62, 93, 93, 93, 93, 123, 123, 123, 123,
    152, 152, 152, 152, 152, 152, 152, 152, 180, 180, 180, 180, 180,
    180, 180, 180, 180, 180, 180, 180, 206, 206, 206, 206, 206, 206,
    206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206,
    206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206, 206]
ZERO_DENSITY_CTX_COUNT = 458
NONZERO_BUCKETS = 37
NUM_ORDERS = 13


def zero_density_ctx(nzeros_left, k, covered, log2cov, prev):
    nzeros_left = (nzeros_left + covered - 1) >> log2cov
    k >>= log2cov
    return (K_NUM_NZ_CTX[nzeros_left] + K_COEFF_FREQ_CTX[k]) * 2 + prev


def nonzero_ctx(predicted, block_ctx, num_ctxs):
    if predicted >= 64:
        predicted = 64
    ctx = predicted if predicted < 8 else 4 + predicted // 2
    return ctx * num_ctxs + block_ctx


@dataclasses.dataclass
class BlockCtxMap:
    ctx_map: List[int]
    dc_thresholds: List[List[int]]
    qf_thresholds: List[int]

    @property
    def num_ctxs(self):
        return max(self.ctx_map) + 1

    @property
    def num_dc_ctxs(self):
        n = 1
        for t in self.dc_thresholds:
            n *= len(t) + 1
        return n

    def context(self, dc_idx, qf, ord_, c):
        qf_idx = sum(1 for t in self.qf_thresholds if qf > t)
        idx = (c ^ 1) if c < 2 else 2
        idx = idx * NUM_ORDERS + ord_
        idx = idx * (len(self.qf_thresholds) + 1) + qf_idx
        idx = idx * self.num_dc_ctxs + dc_idx
        return self.ctx_map[idx]

    @staticmethod
    def read(br: BitReader) -> "BlockCtxMap":
        if br.bool():
            return BlockCtxMap(list(DEFAULT_CTX_MAP), [[], [], []], [])
        dc_th = []
        num_dc = 1
        for _ in range(3):
            nt = br.u(4)
            dc_th.append([unpack_signed(
                br.u32((4, 0), (8, 16), (16, 272), (32, 65808)))
                for _ in range(nt)])
            num_dc *= nt + 1
        nq = br.u(4)
        qf_th = [br.u32((2, 0), (3, 4), (5, 12), (8, 44)) + 1
                 for _ in range(nq)]
        size = 3 * NUM_ORDERS * num_dc * (nq + 1)
        if size > 3 * 64:
            raise BitstreamError("block ctx map too large")
        cmap = read_cluster_map(br, size)
        return BlockCtxMap(cmap, dc_th, qf_th)


@dataclasses.dataclass
class LfGlobal:
    dcq: Tuple[float, float, float]
    global_scale: int
    quant_dc: int
    bcm: BlockCtxMap
    cfl_color_factor: int = 84
    cfl_base_x: float = 0.0
    cfl_base_b: float = 1.0
    cfl_ytox_dc: int = 0
    cfl_ytob_dc: int = 0
    gtree: Optional[object] = None
    gcode: Optional[EntropyCode] = None

    @property
    def inv_global_scale(self):
        return 65536.0 / self.global_scale


def read_lf_global(br: BitReader, fh) -> LfGlobal:
    if fh.flags & ~0x80:
        raise BitstreamError(
            "frame flags %#x not supported (patches/splines/noise)"
            % fh.flags)
    from ..codec import read_dc_quant
    dcq = read_dc_quant(br)
    gs = br.u32((11, 1), (11, 2049), (12, 4097), (16, 8193))
    qdc = br.u32(16, (5, 1), (8, 1), (16, 1))
    bcm = BlockCtxMap.read(br)
    lf = LfGlobal(dcq=dcq, global_scale=gs, quant_dc=qdc, bcm=bcm)
    if not br.bool():
        lf.cfl_color_factor = br.u32(84, 256, (8, 2), (16, 258))
        lf.cfl_base_x = br.f16()
        lf.cfl_base_b = br.f16()
        lf.cfl_ytox_dc = br.u(8) - 128
        lf.cfl_ytob_dc = br.u(8) - 128
    if br.bool():
        lf.gtree = decode_tree(br, 1 << 22)
        lf.gcode = EntropyCode(br, (len(lf.gtree.nodes) + 1) // 2)
    return lf


@dataclasses.dataclass
class LfGroup:
    extra_precision: int
    dc: ModularImage          # 3 channels (Y, X, B), quantized ints
    nb_blocks: int
    acm: ModularImage         # ytox, ytob, blockinfo, sharpness


def read_lf_group(br: BitReader, lf: LfGlobal, xs_b: int, ys_b: int,
                  group_index: int, num_dc_groups: int) -> LfGroup:
    ep = br.u(2)
    dc_img = ModularImage([Channel(xs_b, ys_b) for _ in range(3)])
    decode_modular_stream(br, dc_img, stream_id=1 + group_index,
                          global_tree=lf.gtree, global_code=lf.gcode)
    upper = xs_b * ys_b
    nbits = (upper - 1).bit_length() if upper > 1 else 0
    count = br.u(nbits) + 1
    cw = -(-xs_b // 8)
    ch = -(-ys_b // 8)
    acm = ModularImage([
        Channel(cw, ch, hshift=3, vshift=3),
        Channel(cw, ch, hshift=3, vshift=3),
        Channel(count, 2), Channel(xs_b, ys_b)])
    decode_modular_stream(
        br, acm, stream_id=1 + 2 * num_dc_groups + group_index,
        global_tree=lf.gtree, global_code=lf.gcode)
    return LfGroup(extra_precision=ep, dc=dc_img, nb_blocks=count,
                   acm=acm)


@dataclasses.dataclass
class HfGlobal:
    num_histograms: int
    used_orders: int
    orders: Dict[Tuple[int, int], List[int]]
    accodes: List[EntropyCode]


def _perm_ctx(v):
    token = v.bit_length() if v else 0
    return min(token, 7)


def read_permutation(pdec, skip, size):
    end = pdec.read(_perm_ctx(size)) + skip
    if end > size:
        raise BitstreamError("invalid permutation size")
    lehmer = [0] * size
    last = 0
    for i in range(skip, end):
        lehmer[i] = pdec.read(_perm_ctx(last))
        last = lehmer[i]
        if lehmer[i] >= size - i:
            raise BitstreamError("invalid lehmer code")
    temp = list(range(size))
    return [temp.pop(l) for l in lehmer]


def read_hf_global(br: BitReader, lf: LfGlobal, num_groups: int,
                   num_passes: int) -> HfGlobal:
    if not br.bool():
        raise BitstreamError("non-default dequant matrices not supported")
    nb = (num_groups - 1).bit_length() if num_groups > 1 else 0
    num_histograms = 1 + br.u(nb)
    orders: Dict[Tuple[int, int], List[int]] = {}
    accodes = []
    used_orders = 0
    for p in range(num_passes):
        used_orders = br.u32(0x5F, 0x13, 0, (13, 0))
        if used_orders:
            pcode = EntropyCode(br, 8)
            pdec = EntropyDecoder(br, code=pcode)
            for ord_ in range(NUM_ORDERS):
                if used_orders & (1 << ord_):
                    if ord_ != 0:
                        raise BitstreamError(
                            "custom order for transform class %d "
                            "not supported yet" % ord_)
                    for c in range(3):
                        perm = read_permutation(pdec, 1, 64)
                        orders[(ord_, c)] = [ZIGZAG8[v] for v in perm]
            if not pdec.check_final_state():
                raise BitstreamError("permutation checksum failed")
        nctx = num_histograms * lf.bcm.num_ctxs \
            * (NONZERO_BUCKETS + ZERO_DENSITY_CTX_COUNT)
        accodes.append(EntropyCode(br, nctx))
    return HfGlobal(num_histograms=num_histograms,
                    used_orders=used_orders, orders=orders,
                    accodes=accodes)


def dc_context_idx(bcm: BlockCtxMap, dc_vals) -> int:
    """dc_idx from per-channel DC thresholds (c order x, y, b)."""
    idx = 0
    for c in (0, 1, 2):
        th = bcm.dc_thresholds[c]
        if th:
            sub = sum(1 for t in th if dc_vals[c] > t)
            idx = idx * (len(th) + 1) + sub
    return idx


def read_pass_group(br: BitReader, lf: LfGlobal, hf: HfGlobal,
                    lg: LfGroup, xs_b: int, ys_b: int,
                    pass_index: int, histo_index: int,
                    dc_q: np.ndarray) -> np.ndarray:
    """Decode AC coefficients for one group; returns (3, ys_b, xs_b, 64)
    quantized ints (stored-layout indices)."""
    dec = EntropyDecoder(br, code=hf.accodes[pass_index])
    bcm = lf.bcm
    num_ctxs = bcm.num_ctxs
    acs_row = lg.acm.channels[2].data[0]
    qf_row = lg.acm.channels[2].data[1]
    ctx_base = histo_index * num_ctxs \
        * (NONZERO_BUCKETS + ZERO_DENSITY_CTX_COUNT)
    coeffs = np.zeros((3, ys_b, xs_b, 64), np.int32)
    nz_map = np.zeros((3, ys_b, xs_b), np.int32)
    bi = 0
    for by in range(ys_b):
        for bx in range(xs_b):
            acs = int(acs_row[bi])
            qf = int(qf_row[bi]) + 1
            bi += 1
            if acs != 0:
                raise BitstreamError(
                    "AC strategy %d not supported yet" % acs)
            dc_idx = dc_context_idx(
                bcm, (dc_q[1, by, bx], dc_q[0, by, bx], dc_q[2, by, bx]))
            for c in (1, 0, 2):
                order = hf.orders.get((0, c)) or ZIGZAG8
                if by == 0:
                    predicted = 32 if bx == 0 else int(nz_map[c, by, bx - 1])
                elif bx == 0:
                    predicted = int(nz_map[c, by - 1, bx])
                else:
                    predicted = (int(nz_map[c, by - 1, bx])
                                 + int(nz_map[c, by, bx - 1]) + 1) // 2
                bctx = bcm.context(dc_idx, qf, 0, c)
                nz = dec.read(ctx_base + nonzero_ctx(predicted, bctx,
                                                     num_ctxs))
                if nz > 63:
                    raise BitstreamError("too many nonzeros")
                nz_map[c, by, bx] = nz
                ctx_off = ctx_base + num_ctxs * NONZERO_BUCKETS \
                    + ZERO_DENSITY_CTX_COUNT * bctx
                prev = 0 if nz > 4 else 1
                nzeros = nz
                k = 1
                while nzeros > 0:
                    if k >= 64:
                        raise BitstreamError("coeff index overflow")
                    ctx = ctx_off + zero_density_ctx(nzeros, k, 1, 0, prev)
                    v = unpack_signed(dec.read(ctx))
                    coeffs[c, by, bx, order[k]] = v
                    prev = 1 if v else 0
                    nzeros -= prev
                    k += 1
    if not dec.check_final_state():
        raise BitstreamError("AC group checksum failed")
    return coeffs

# ---------------------------------------------------------------------------
# Reconstruction (numpy reference path; the TPU path mirrors this)

_BIAS = 0.0037930732552754493
_CBRT_BIAS = float(np.cbrt(_BIAS))
_OPSIN = np.array([[0.30, 0.622, 0.078],
                   [0.23, 0.692, 0.078],
                   [0.24342268924547819, 0.20476744424496821,
                    0.5518098665095536]])
_OPSIN_INV = np.linalg.inv(_OPSIN)

_IDCT8_BASIS = np.zeros((8, 8), np.float64)
for _k in range(8):
    for _x in range(8):
        _a = 1.0 if _k == 0 else np.sqrt(2.0)
        _IDCT8_BASIS[_k, _x] = _a * np.cos(np.pi * (2 * _x + 1) * _k / 16)


_POW25TO18 = np.array([0x0, 0xa, 0x19, 0x26, 0x32, 0x41, 0x4d, 0x5c,
                       0x68, 0x75, 0x83, 0x8f, 0xa0, 0xaa, 0xb9, 0xc6],
                      np.uint32)
_POW17TO10 = np.array([0x0, 0xb7, 0x4, 0xd, 0xcb, 0xe7, 0x41, 0x68,
                       0x51, 0xd1, 0xeb, 0xf2, 0x0, 0xb7, 0x4, 0xd],
                      np.uint32)


def linear_to_srgb_f32(v):
    """FastLinearToSRGB (float32 bit-exact): cubic approximation of the
    power curve on [0.25, 0.5) recombined with a 16-entry exponent
    table of 2**(5/12) powers.  This, not the analytic transfer
    function, determines the reference's u8 output."""
    v = np.ascontiguousarray(v, np.float32)
    vb = v.view(np.uint32)
    v025 = ((vb | np.uint32(0x3e800000))
            & np.uint32(0x3effffff)).view(np.float32)
    d1 = v025 * np.float32(0.059914046) + np.float32(-0.108894556)
    d2 = d1 * v025 + np.float32(0.107963754)
    pw = d2 * v025 + np.float32(0.018092343)
    exp = ((vb >> np.uint32(23)) - np.uint32(118)) & np.uint32(0xf)
    mul = ((_POW25TO18[exp] << np.uint32(18))
           | (_POW17TO10[exp] << np.uint32(10))
           | np.uint32(0x40000000)).view(np.float32)
    return np.where(v < np.float32(0.0031308),
                    v * np.float32(12.92),
                    pw * mul + np.float32(-0.055))


def xyb_planes_to_srgb8(X, Y, B):
    X = X.astype(np.float32)
    Y = Y.astype(np.float32)
    B = B.astype(np.float32)
    g_r = Y + X + np.float32(_CBRT_BIAS)
    g_g = Y - X + np.float32(_CBRT_BIAS)
    g_b = B + np.float32(_CBRT_BIAS)
    mixed = np.stack([g_r * g_r * g_r - np.float32(_BIAS),
                      g_g * g_g * g_g - np.float32(_BIAS),
                      g_b * g_b * g_b - np.float32(_BIAS)], axis=-1)
    lin = mixed @ _OPSIN_INV.T.astype(np.float32)
    srgb = linear_to_srgb_f32(lin)
    return np.clip(np.floor(srgb * 255.0 + 0.5), 0, 255).astype(np.uint8)


def reconstruct_group_dct8(lf: LfGlobal, lg: LfGroup, coeffs: np.ndarray,
                           fh) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """coeffs: (3, ys_b, xs_b, 64) ints -> X, Y, B float planes."""
    from .tables_real import DCT8_TABLE
    _, ys_b, xs_b, _ = coeffs.shape
    igs = lf.inv_global_scale
    dc_mul = [d * igs / lf.quant_dc / (1 << lg.extra_precision)
              for d in lf.dcq]          # (x, y, b)
    qm = [0.8 ** (fh.x_qm_scale - 2), 1.0, 0.8 ** (fh.b_qm_scale - 2)]
    qf_row = lg.acm.channels[2].data[1].astype(np.int64) + 1
    qf = qf_row.reshape(ys_b, xs_b)
    inv_qac = igs / qf                   # (ys_b, xs_b)

    # dequantized AC (float64): (3, ys_b, xs_b, 64)
    deq = coeffs.astype(np.float64)
    for c in range(3):
        deq[c] *= DCT8_TABLE[c][None, None, :].astype(np.float64) * qm[c]
    deq *= inv_qac[None, :, :, None]

    # CfL on dequantized AC: X += xf*Y, B += bf*Y per 64px tile
    cf = 1.0 / lf.cfl_color_factor
    ytox = lg.acm.channels[0].data.astype(np.float64)
    ytob = lg.acm.channels[1].data.astype(np.float64)
    xf_t = lf.cfl_base_x + ytox * cf     # tile grids
    bf_t = lf.cfl_base_b + ytob * cf
    ty = np.arange(ys_b) // 8
    tx = np.arange(xs_b) // 8
    xf = xf_t[np.ix_(ty, tx)]
    bf = bf_t[np.ix_(ty, tx)]
    deq[0] += xf[:, :, None] * deq[1]
    deq[2] += bf[:, :, None] * deq[1]

    # DC: modular channels (Y, X, B) -> dequant + DC CfL
    dcY = lg.dc.channels[0].data.astype(np.float64) * dc_mul[1]
    dcX = lg.dc.channels[1].data.astype(np.float64) * dc_mul[0]
    dcB = lg.dc.channels[2].data.astype(np.float64) * dc_mul[2]
    xf_dc = lf.cfl_base_x + lf.cfl_ytox_dc * cf
    bf_dc = lf.cfl_base_b + lf.cfl_ytob_dc * cf
    dcX = dcX + xf_dc * dcY
    dcB = dcB + bf_dc * dcY

    planes = []
    A = _IDCT8_BASIS
    for c, dcp in ((0, dcX), (1, dcY), (2, dcB)):
        blocks = deq[c].reshape(ys_b, xs_b, 8, 8)
        blocks[:, :, 0, 0] = dcp
        # stored index k=r*8+c' maps to basis (kx=r, ky=c'): transpose
        km = np.transpose(blocks, (0, 1, 3, 2))
        pix = np.einsum('yxkl,km,ln->yxmn', km, A, A)
        plane = np.transpose(pix, (0, 2, 1, 3)).reshape(ys_b * 8, xs_b * 8)
        planes.append(plane)
    return planes[0], planes[1], planes[2]


def decode_vardct_frame(cs: bytes, hdr, fh, toc) -> np.ndarray:
    """Real-format VarDCT still decode -> (H, W, 3) uint8 sRGB."""
    w, h = fh.coded_size(hdr)
    xs_b, ys_b = -(-w // 8), -(-h // 8)
    ng, ndc = fh.counts(hdr)
    if ng != 1 or fh.passes.num_passes != 1:
        raise BitstreamError("multi-group VarDCT not wired up yet")
    sec = toc.section(0)
    br = BitReader(cs[sec.offset:sec.offset + sec.size])
    lf = read_lf_global(br, fh)
    lg = read_lf_group(br, lf, xs_b, ys_b, 0, ndc)
    hf = read_hf_global(br, lf, 1, 1)
    dc_q = np.stack([lg.dc.channels[1].data, lg.dc.channels[0].data,
                     lg.dc.channels[2].data])  # (x, y, b) for dc ctx
    coeffs = read_pass_group(br, lf, hf, lg, xs_b, ys_b, 0, 0, dc_q)
    X, Y, B = reconstruct_group_dct8(lf, lg, coeffs, fh)
    if not (fh.flags & 0x80):
        X, Y, B = adaptive_dc_smoothing_placeholder(X, Y, B)
    rgb = xyb_planes_to_srgb8(X, Y, B)
    return rgb[:h, :w]


def adaptive_dc_smoothing_placeholder(X, Y, B):
    # DC smoothing not yet pinned; identity for now (flags bit 0x80
    # skips it in streams we generate).
    return X, Y, B

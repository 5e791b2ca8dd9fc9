"""Modular predictors + properties (§H.4-H.5), host reference path.

14 predictors (Zero..Average4 + the self-correcting weighted predictor) and
the MA-tree property vector.  This is the bit-exactness-critical scalar
oracle; vectorized/native paths must match it exactly.

NOTE on conformance: the weighted-predictor fixed-point details and
properties >= 8 are implemented from the spec structure and flagged for
empirical pinning against reference bitstreams; our own encoder restricts
itself to predictors {0,1,2,3,5} and properties 0-7, which are settled.
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..bitstream.reader import BitReader
from ..bitstream.writer import BitWriter

NUM_BASE_PROPS = 16


@dataclasses.dataclass
class WPParams:
    """Weighted-predictor header (§H.5; wp_header in GroupHeader)."""
    p1: int = 16
    p2: int = 10
    p3a: int = 7
    p3b: int = 7
    p3c: int = 7
    p3d: int = 0
    p3e: int = 0
    w0: int = 13
    w1: int = 12
    w2: int = 12
    w3: int = 12

    @staticmethod
    def read(br: BitReader) -> "WPParams":
        w = WPParams()
        if br.bool():  # all_default
            return w
        w.p1 = br.u(5)
        w.p2 = br.u(5)
        w.p3a = br.u(5)
        w.p3b = br.u(5)
        w.p3c = br.u(5)
        w.p3d = br.u(5)
        w.p3e = br.u(5)
        w.w0 = br.u(4)
        w.w1 = br.u(4)
        w.w2 = br.u(4)
        w.w3 = br.u(4)
        return w

    def write(self, bw: BitWriter) -> None:
        if self == WPParams():
            bw.bool(True)
            return
        bw.bool(False)
        for v in (self.p1, self.p2, self.p3a, self.p3b, self.p3c,
                  self.p3d, self.p3e):
            bw.u(v, 5)
        for v in (self.w0, self.w1, self.w2, self.w3):
            bw.u(v, 4)


def _floor_log2(v: int) -> int:
    return v.bit_length() - 1


class WPState:
    """Per-channel rolling state of the self-correcting predictor."""

    def __init__(self, params: WPParams, width: int):
        self.p = params
        self.width = width
        # prediction errors of the 4 subpredictors, previous + current row
        self.pred_errors = [np.zeros(width + 2, np.int64) for _ in range(4)]
        self.pred_errors_prev = [np.zeros(width + 2, np.int64)
                                 for _ in range(4)]
        # true errors (<<3 domain) previous + current row
        self.error = np.zeros(width + 2, np.int64)
        self.error_prev = np.zeros(width + 2, np.int64)
        self.pred = 0  # last prediction (<<3)
        self.max_error = 0
        self._subpred = [0, 0, 0, 0]

    def new_row(self):
        for k in range(4):
            self.pred_errors_prev[k], self.pred_errors[k] = \
                self.pred_errors[k], self.pred_errors_prev[k]
            self.pred_errors[k][:] = 0
        self.error_prev, self.error = self.error, self.error_prev
        self.error[:] = 0

    def predict(self, x: int, y: int, w: int,
                W: int, N: int, NW: int, NE: int, NN: int) -> int:
        p = self.p
        W3, N3, NW3, NE3, NN3 = W << 3, N << 3, NW << 3, NE << 3, NN << 3
        xp = x + 1  # padded index
        err_W = int(self.error[xp - 1]) if x > 0 else 0
        err_N = int(self.error_prev[xp]) if y > 0 else 0
        err_NW = int(self.error_prev[xp - 1]) if (x > 0 and y > 0) else err_N
        err_NE = int(self.error_prev[xp + 1]) if (x + 1 < w and y > 0) \
            else err_N
        err_WW = int(self.error[xp - 2]) if x > 1 else 0

        sp = self._subpred
        sp[0] = W3 + NE3 - N3
        sp[1] = N3 - (((err_W + err_N + err_NE) * p.p1) >> 5)
        sp[2] = W3 - (((err_W + err_N + err_NW) * p.p2) >> 5)
        sp[3] = N3 - ((err_NW * p.p3a + err_N * p.p3b + err_NE * p.p3c
                       + (NN3 - N3) * p.p3d + (NW3 - W3) * p.p3e) >> 5)

        wts = []
        for k, wk in enumerate((p.w0, p.w1, p.w2, p.w3)):
            pe = self.pred_errors[k]
            pep = self.pred_errors_prev[k]
            esum = int(pep[xp]) + int(pep[xp - 1]) + int(pep[xp + 1]) \
                + (int(pe[xp - 1]) if x > 0 else 0)
            shift = max(0, _floor_log2(esum + 1) - 5)
            weight = 4 + ((wk * ((1 << 24) // ((esum >> shift) + 1)))
                          >> shift)
            wts.append(weight)
        swt = sum(wts)
        s = (swt >> 1) - 1
        for k in range(4):
            s += sp[k] * wts[k]
        pred = (s * 2 + 1) // (swt * 2) if swt else sp[0]
        # sign-consistent clamp
        if ((err_N ^ err_W) | (err_N ^ err_NW)) <= 0:
            lo, hi = min(W3, N3, NE3), max(W3, N3, NE3)
            pred = max(lo, min(hi, pred))
        self.pred = pred
        self.max_error = max(abs(err_W), abs(err_N), abs(err_NW),
                             abs(err_NE))
        return pred

    def update(self, x: int, value: int) -> None:
        xp = x + 1
        v3 = value << 3
        self.error[xp] = v3 - self.pred
        for k in range(4):
            e = abs(self.pred - v3) if False else abs(self._subpred[k] - v3)
            e = (e + 3) >> 3
            self.pred_errors[k][xp] += e
            # also accrue into NE position of the next row usage
            self.pred_errors[k][xp + 1] += 0


def neighbors(data: np.ndarray, x: int, y: int, w: int):
    """(W, N, NW, NE, NN, WW, NEE) with spec edge rules."""
    if x > 0:
        W = int(data[y, x - 1])
    elif y > 0:
        W = int(data[y - 1, x])
    else:
        W = 0
    N = int(data[y - 1, x]) if y > 0 else W
    NW = int(data[y - 1, x - 1]) if (x > 0 and y > 0) else W
    NE = int(data[y - 1, x + 1]) if (x + 1 < w and y > 0) else N
    NN = int(data[y - 2, x]) if y > 1 else N
    WW = int(data[y, x - 2]) if x > 1 else W
    NEE = int(data[y - 1, x + 2]) if (x + 2 < w and y > 0) else NE
    return W, N, NW, NE, NN, WW, NEE


def clamped_gradient(N: int, W: int, NW: int) -> int:
    m = min(N, W)
    M = max(N, W)
    grad = N + W - NW
    if NW > M:
        return m
    if NW < m:
        return M
    return grad


def predict(predictor: int, W, N, NW, NE, NN, WW, NEE,
            wp_pred3: Optional[int] = None) -> int:
    if predictor == 0:
        return 0
    if predictor == 1:
        return W
    if predictor == 2:
        return N
    if predictor == 3:
        return (W + N) >> 1
    if predictor == 4:  # Select
        p = W + N - NW
        return W if abs(p - W) <= abs(p - N) else N
    if predictor == 5:
        return clamped_gradient(N, W, NW)
    if predictor == 6:  # Weighted: (wp_pred3 + 3) >> 3
        if wp_pred3 is None:
            raise ValueError("weighted predictor needs WP state")
        return (wp_pred3 + 3) >> 3
    if predictor == 7:
        return NE
    if predictor == 8:
        return NW
    if predictor == 9:
        return WW
    if predictor == 10:
        return (W + NW) >> 1
    if predictor == 11:
        return (N + NW) >> 1
    if predictor == 12:
        return (N + NE) >> 1
    if predictor == 13:
        return (6 * N - 2 * NN + 7 * W + WW + NEE + 3 * NE + 8) >> 4
    raise ValueError(f"bad predictor {predictor}")


def properties_for_pixel(chan_index: int, stream_id: int, x: int, y: int,
                         W, N, NW, NE, NN, WW,
                         max_error: int,
                         prev_channels: List[np.ndarray]) -> List[int]:
    props = [
        chan_index, stream_id, y, x,
        abs(N), abs(W), N, W,
        W + N - NW,          # 8: gradient
        W - NW,              # 9
        NW - N,              # 10
        N - NE,              # 11
        N - NN,              # 12
        W - WW,              # 13
        max_error,           # 14: WP property
        0,                   # 15: reserved
    ]
    for pc in prev_channels:
        v = int(pc[y, x])
        props.append(abs(v))
        props.append(v)
    return props

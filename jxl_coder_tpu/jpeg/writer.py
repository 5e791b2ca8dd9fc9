"""Byte-exact baseline JPEG re-serialization from parsed coefficients.

The reconstruct half of JPEG<->JXL transcoding: given JpegData (original
header/trailer bytes + coefficient planes + tables), re-encodes the
entropy scan deterministically (Huffman coding is bijective given the
tables; padding bits are 1-filled) so output == original input bytes.
"""

from __future__ import annotations

import numpy as np

from .parser import JpegData, JpegError, _extend


class _ScanWriter:
    def __init__(self, padding_bits=None):
        self.out = bytearray()
        self.bitbuf = 0
        self.nbits = 0
        # explicit alignment filler bits (jbrd padding section); None
        # means the standard all-ones fill
        self.pad_iter = iter(padding_bits) if padding_bits else None

    def write_bits(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bitbuf = (self.bitbuf << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                b = self.bitbuf & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.bitbuf = 0
                self.nbits = 0

    def flush(self) -> None:
        """Pad the final partial byte (all-ones, or the recorded
        padding bits when the source JPEG used zero filler)."""
        if self.nbits:
            pad = 8 - self.nbits
            if self.pad_iter is not None:
                bits = 0
                for _ in range(pad):
                    bits = (bits << 1) | next(self.pad_iter, 1)
                self.write_bits(bits, pad)
            else:
                self.write_bits((1 << pad) - 1, pad)

    def write_marker(self, byte: int) -> None:
        self.flush()
        self.out.append(0xFF)
        self.out.append(byte)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_value(v: int, size: int) -> int:
    if v < 0:
        return v + (1 << size) - 1
    return v


def write_jpeg(j: JpegData) -> bytes:
    dc_enc = {t: tbl.build_encode() for t, tbl in j.dc_tables.items()}
    ac_enc = {t: tbl.build_encode() for t, tbl in j.ac_tables.items()}
    pads = getattr(j, "padding_bits", None)
    sw = _ScanWriter(pads if pads and 0 in pads else None)
    dc_pred = {c.id: 0 for c in j.components}
    ri = j.restart_interval
    mcu_count = 0
    rst_idx = 0
    single = len(j.components) == 1
    for my in range(j.mcus_y):
        for mx in range(j.mcus_x):
            if ri and mcu_count and mcu_count % ri == 0:
                sw.write_marker(0xD0 + (rst_idx & 7))
                rst_idx = (rst_idx + 1) & 7
                for c in j.components:
                    dc_pred[c.id] = 0
            for c in j.components:
                ch = 1 if single else c.h
                cv = 1 if single else c.v
                for by in range(cv):
                    for bx in range(ch):
                        block = c.coeffs[my * c.v + by, mx * c.h + bx]
                        denc = dc_enc[c.td]
                        diff = int(block[0]) - dc_pred[c.id]
                        dc_pred[c.id] = int(block[0])
                        size = _category(diff)
                        code, ln = denc[size]
                        sw.write_bits(code, ln)
                        if size:
                            sw.write_bits(_encode_value(diff, size), size)
                        aenc = ac_enc[c.ta]
                        k = 1
                        run = 0
                        last_nz = 0
                        nz = np.nonzero(block[1:])[0]
                        last_nz = (nz[-1] + 1) if len(nz) else 0
                        while k <= last_nz:
                            v = int(block[k])
                            if v == 0:
                                run += 1
                                k += 1
                                continue
                            while run >= 16:
                                code, ln = aenc[0xF0]
                                sw.write_bits(code, ln)
                                run -= 16
                            size = _category(v)
                            code, ln = aenc[(run << 4) | size]
                            sw.write_bits(code, ln)
                            sw.write_bits(_encode_value(v, size), size)
                            run = 0
                            k += 1
                        if last_nz < 63:
                            code, ln = aenc[0x00]  # EOB
                            sw.write_bits(code, ln)
            mcu_count += 1
    sw.flush()
    return bytes(j.header_bytes) + bytes(sw.out) + bytes(j.trailer_bytes)

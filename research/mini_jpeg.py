"""Minimal baseline JPEG synthesizer with fully controlled tables —
probe-stream generator for pinning the jbrd serialization."""
import struct


def _dht(tables):
    """tables: list of (cls, tid, counts16, syms)"""
    body = b""
    for cls, tid, counts, syms in tables:
        body += bytes([cls << 4 | tid]) + bytes(counts) + bytes(syms)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def _dqt(tables):
    """tables: list of (prec, tid, values64zigzag)"""
    body = b""
    for prec, tid, vals in tables:
        body += bytes([prec << 4 | tid])
        if prec:
            body += b"".join(struct.pack(">H", v) for v in vals)
        else:
            body += bytes(vals)
    return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body


class _BW:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                b = self.acc & 0xFF
                self.out.append(b)
                if b == 0xFF:
                    self.out.append(0)
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.put(1, 1)
        return bytes(self.out)


def _codes(counts, syms):
    out = {}
    code = 0
    k = 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[syms[k]] = (code, ln)
            k += 1
            code += 1
        code <<= 1
    return out


def mini_jpeg(dc=( [1]+[0]*15, [0]), ac=([1]+[0]*15, [0]),
              qt=None, w=8, h=8, dc2=None, ac2=None, ncomp=1,
              split_dht=False, qprec=0, restart=0, com=None,
              app=None, blocks_dc=None):
    """Gray (ncomp=1) or color (ncomp=3, no subsampling) baseline JPEG,
    all DC diffs 0 + EOB per block unless blocks_dc gives DC categories.
    """
    if qt is None:
        qt = [16] * 64
    out = b"\xff\xd8"
    if app is not None:
        out += b"\xff\xe0" + struct.pack(">H", 2 + len(app)) + app
    if com is not None:
        out += b"\xff\xfe" + struct.pack(">H", 2 + len(com)) + com
    qts = [(qprec, 0, qt)]
    comps = [(1, 0)]
    if ncomp == 3:
        qts.append((qprec, 1, qt))
        comps = [(1, 0), (2, 1), (3, 1)]
    out += _dqt(qts)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for cid, tq in comps:
        sof += bytes([cid, 0x11, tq])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    dhts = [(0, 0, dc[0], dc[1]), (1, 0, ac[0], ac[1])]
    if ncomp == 3:
        dhts += [(0, 1, (dc2 or dc)[0], (dc2 or dc)[1]),
                 (1, 1, (ac2 or ac)[0], (ac2 or ac)[1])]
    if split_dht:
        for t in dhts:
            out += _dht([t])
    else:
        out += _dht(dhts)
    if restart:
        out += b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(
            ">H", restart)
    sos = bytes([ncomp])
    for i, (cid, tq) in enumerate(comps):
        sos += bytes([cid, (0 if i == 0 else 1) * 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    # scan: per MCU per component: DC cat-0 + EOB
    bw = _BW()
    dcc = {0: _codes(*dc), 1: _codes(*(dc2 or dc))}
    acc = {0: _codes(*ac), 1: _codes(*(ac2 or ac))}
    nmcu = ((w + 7) // 8) * ((h + 7) // 8)
    mcu = 0
    rst = 0
    for m in range(nmcu):
        if restart and m and m % restart == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (rst & 7)])
            rst += 1
        for i in range(ncomp):
            t = 0 if i == 0 else 1
            c, ln = dcc[t][0]
            bw.put(c, ln)
            c, ln = acc[t][0]
            bw.put(c, ln)
    out += bw.flush()
    out += b"\xff\xd9"
    return out

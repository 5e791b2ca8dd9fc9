"""Native host codec cross-checks: C++ path must match the Python oracle
bit-for-bit."""

import numpy as np
import pytest

from jxl_coder_tpu import native as native_mod
from jxl_coder_tpu.bitstream.reader import BitReader
from jxl_coder_tpu.bitstream.writer import BitWriter
from jxl_coder_tpu.entropy.coder import TokenStream, EntropyDecoder
from jxl_coder_tpu.modular.image import Channel, ModularImage
from jxl_coder_tpu.modular.stream import (
    GroupHeader, encode_modular_stream, decode_modular_stream)
from jxl_coder_tpu.modular.tree import Tree, Node

needs_native = pytest.mark.skipif(native_mod.get_lib() is None,
                                  reason="native toolchain unavailable")


def rng():
    return np.random.default_rng(23)


@needs_native
def test_native_entropy_matches_python():
    import random
    r = random.Random(7)
    vals = []
    for _ in range(200):
        vals.extend([(r.randrange(5), 0)] * r.randint(1, 30))
        vals.append((r.randrange(5), r.randint(0, 5000)))
    for lz in (False, True):
        ts = TokenStream(5, lz77=lz)
        for c, v in vals:
            ts.add(c, v)
        bw = BitWriter()
        ts.write(bw)
        data = bw.to_bytes()
        # python
        dpy = EntropyDecoder(BitReader(data), 5)
        py = [dpy.read(c) for c, _ in vals]
        # native
        dec = EntropyDecoder(BitReader(data), 5)
        br2 = BitReader(data)
        # reposition br2 to after headers: re-parse with a fresh decoder
        dec2 = EntropyDecoder(br2, 5)
        nat = native_mod.NativeEntropy(dec2, br2)
        nv = [nat.read(c) for c, _ in vals]
        assert nv == py == [v for _, v in vals]


@needs_native
@pytest.mark.parametrize("predictor", [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10,
                                       11, 12, 13])
def test_native_channel_decode_matches(predictor):
    r = rng()
    ch = Channel(23, 17, data=r.integers(-200, 200, (17, 23))
                 .astype(np.int32))
    orig = ch.data.copy()
    tree = Tree.single_leaf(predictor=predictor)
    bw = BitWriter()
    encode_modular_stream(bw, ModularImage([ch]), GroupHeader(), tree)
    data = bw.to_bytes()
    # decode via the integrated path (native picked automatically)
    img = ModularImage([Channel(23, 17)])
    decode_modular_stream(BitReader(data), img)
    assert np.array_equal(img.channels[0].data, orig)
    # decode via forced-python for cross-check
    import os
    import jxl_coder_tpu.native as nm
    saved = nm._lib
    nm._lib = None
    try:
        img2 = ModularImage([Channel(23, 17)])
        decode_modular_stream(BitReader(data), img2)
    finally:
        nm._lib = saved
    assert np.array_equal(img2.channels[0].data, orig)


@needs_native
def test_native_tree_contexts_and_lz77():
    r = rng()
    # structured image with runs, multi-node tree
    base = np.repeat(r.integers(0, 30, (9, 7)), 3, axis=1)[:, :20]
    ch = Channel(20, 9, data=base.astype(np.int32))
    orig = ch.data.copy()
    nodes = [
        Node(property=3, splitval=9, left=1, right=2),
        Node(property=-1, predictor=1, ctx=0),
        Node(property=6, splitval=15, left=3, right=4),
        Node(property=-1, predictor=5, ctx=1),
        Node(property=-1, predictor=2, ctx=2),
    ]
    tree = Tree(nodes)
    bw = BitWriter()
    encode_modular_stream(bw, ModularImage([ch]), GroupHeader(), tree,
                          lz77=True)
    img = ModularImage([Channel(20, 9)])
    decode_modular_stream(BitReader(bw.to_bytes()), img)
    assert np.array_equal(img.channels[0].data, orig)


@needs_native
def test_native_full_api_roundtrip():
    from jxl_coder_tpu import api
    r = rng()
    x = r.integers(0, 65535, (48, 60, 3)).astype(np.uint16)
    data = api.encode(x, lossless=True)
    out, _ = api.decode(data)
    assert np.array_equal(out, x)


@needs_native
def test_native_greedy_decide_matches_oracle():
    """greedy_decide_native must reproduce the Python oracle exactly
    (same sat float order, same tie behaviour)."""
    from jxl_coder_tpu.vardct import enc_real as ER
    from jxl_coder_tpu import native as NM
    r = rng()
    for _trial in range(4):
        ys_b, xs_b = int(r.integers(8, 48)), int(r.integers(8, 48))
        cost8 = r.random((ys_b, xs_b)) * 10
        qf = r.integers(1, 200, (ys_b, xs_b)).astype(np.int32)
        cands = [(5, 2, 2), (6, 2, 1), (7, 1, 2), (10, 4, 4)]
        cost_data = {}
        for sid, cy, cx in cands:
            nyc, nxc = ys_b // cy, xs_b // cx
            if nyc and nxc:
                cost_data[sid] = (
                    r.random((nyc, nxc)) * cy * cx * 4,
                    r.integers(1, 200, (nyc, nxc)).astype(np.int32))
        a1, q1 = ER._greedy_decide(cands, cost_data, cost8, qf,
                                   ys_b, xs_b)
        lib = NM._lib
        NM._lib = None
        try:
            a2, q2 = ER._greedy_decide(cands, cost_data, cost8, qf,
                                       ys_b, xs_b)
        finally:
            NM._lib = lib
        assert np.array_equal(a1, a2) and np.array_equal(q1, q2)

"""Encoder-side patches (repeated glyphs) + screen-content decision."""

import ctypes.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "research"))

HAVE_LIBJXL = bool(ctypes.util.find_library("jxl"))

from jxl_coder_tpu import api  # noqa: E402
from jxl_coder_tpu.vardct import enc_patches as EP  # noqa: E402
from jxl_coder_tpu.vardct.enc_real import encode_vardct_real  # noqa: E402


def _text_image(flat=True):
    rng = np.random.default_rng(3)
    H, W = 192, 256
    if flat:
        img = np.full((H, W, 3), 235, np.uint8)
    else:
        yy, xx = np.mgrid[0:H, 0:W]
        img = np.clip(np.stack([
            140 + 40 * np.sin(yy / 90), 150 + 30 * np.cos(xx / 120),
            130 + 20 * np.sin((xx + yy) / 150)], -1), 0,
            255).astype(np.uint8)
        img[20:120, 16:240] = 245
    glyph = np.zeros((11, 9), bool)
    glyph[1:10, 2:4] = True
    glyph[1:3, 2:8] = True
    glyph[5:7, 2:7] = True
    g2 = np.zeros((11, 9), bool)
    g2[1:10, 4:6] = True
    g2[8:10, 2:8] = True
    for k, gy in enumerate(range(24, 110, 16)):
        for gx in range(20, 230, 14):
            reg = img[gy:gy + 11, gx:gx + 9]
            reg[glyph if (gx // 14 + k) % 2 else g2] = 25
    return img


def _psnr(a, b):
    m = np.mean((a.astype(float) - b.astype(float)) ** 2)
    return 10 * np.log10(255.0 ** 2 / max(m, 1e-9))


def test_patch_detection_fires_on_text():
    img = _text_image()
    plan = EP.detect(img)
    assert plan is not None
    assert len(plan.rects) >= 1
    assert sum(len(p) for p in plan.placements) >= 10


def test_patch_detection_skips_photo():
    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:160, 0:224]
    photo = np.clip(np.stack([
        120 + 70 * np.sin(yy / 17) + rng.normal(0, 8, yy.shape),
        110 + 60 * np.cos(xx / 23) + rng.normal(0, 8, yy.shape),
        100 + 50 * np.sin((xx + yy) / 31)], -1), 0, 255).astype(np.uint8)
    assert EP.detect(photo) is None


def test_patched_stream_roundtrip_and_rate():
    img = _text_image(flat=False)
    with_p = encode_vardct_real(img, distance=1.0, effort=7)
    without = encode_vardct_real(img, distance=1.0, effort=7,
                                 try_patches=False)
    assert len(with_p) < len(without)
    out, _ = api.decode(with_p)
    out_np, _ = api.decode(without)
    assert _psnr(out, img) >= _psnr(out_np, img) - 0.01


@pytest.mark.skipif(not HAVE_LIBJXL, reason="system libjxl unavailable")
def test_patched_stream_libjxl_conformance():
    import refjxl
    img = _text_image(flat=False)
    data = encode_vardct_real(img, distance=1.0, effort=7)
    ours, _ = api.decode(data)
    theirs = np.asarray(refjxl.decode(data)[0])[:, :, :3]
    # both decoders agree on the patched stream (within the usual
    # float-pipeline tolerance)
    assert np.abs(ours.astype(int) - theirs.astype(int)).max() <= 2


def test_screen_content_mode_decision():
    """Few-colour lossy input: the encoder compares the patched-VarDCT
    and lossless-modular streams and keeps the smaller (cjxl makes the
    same mode decision).  Either way the result must be far smaller
    than the plain VarDCT stream and near-exact."""
    img = _text_image(flat=True)
    lossy = api.encode(img, lossless=False, quality=90)
    out, _ = api.decode(lossy)
    baseline = encode_vardct_real(img, distance=1.0, effort=7,
                                  try_patches=False)
    ll = api.encode(img, lossless=True, effort=7)
    assert len(lossy) <= min(len(ll), len(baseline) // 3)
    assert _psnr(out, img) >= 45.0
    # the decision remains live: force the no-patch path and the
    # lossless fallback must kick in
    from jxl_coder_tpu.vardct import enc_patches as EP
    orig = EP.detect
    EP.detect = lambda *_a, **_k: None
    try:
        lossy2 = api.encode(img, lossless=False, quality=90)
    finally:
        EP.detect = orig
    out2, _ = api.decode(lossy2)
    assert np.array_equal(out2, img)         # picked lossless
    assert len(lossy2) < len(baseline) // 2

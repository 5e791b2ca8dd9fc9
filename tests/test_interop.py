"""Wire-format interoperability with the system libjxl (when present).

These tests are the living proof of format compatibility: our encoder's
output must decode exactly in libjxl, and libjxl's output must decode
exactly (lossless) or near-exactly (lossy, filters pending) here.
"""
import ctypes.util
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "research"))

try:
    import refjxl  # noqa: E402
    HAVE_LIBJXL = True
except Exception:
    HAVE_LIBJXL = False

pytestmark = pytest.mark.skipif(not HAVE_LIBJXL,
                                reason="system libjxl not available")

from jxl_coder_tpu import api  # noqa: E402


def _img(seed=7, h=40, w=56):
    rng = np.random.default_rng(seed)
    base = (np.sin(np.arange(h)[:, None] / 5) * 90
            + np.cos(np.arange(w)[None, :] / 9) * 60 + 128)
    img = (base + rng.normal(0, 12, (h, w))).clip(0, 255)
    return img.astype(np.uint8)[..., None].repeat(3, -1)


def test_lossless_ours_to_libjxl():
    img = _img()
    data = api.encode(img, lossless=True)
    out, _ = refjxl.decode(data)
    assert np.array_equal(out, img)


@pytest.mark.parametrize("effort", [1, 3, 7])
def test_lossless_libjxl_to_ours(effort):
    img = _img(seed=effort)
    data = refjxl.encode(img, lossless=True, effort=effort)
    out, _ = api.decode(data)
    assert np.array_equal(out, img)


def test_lossy_ours_to_libjxl():
    img = _img(seed=3, h=64, w=64)
    data = api.encode(img, lossless=False, quality=90)
    out, _ = refjxl.decode(data)
    d = np.abs(out.astype(int) - img.astype(int))
    assert d.mean() < 4.0


def test_lossy_roundtrip_matches_libjxl_decode():
    img = _img(seed=4, h=64, w=64)
    data = api.encode(img, lossless=False, quality=90)
    ours, _ = api.decode(data)
    theirs, _ = refjxl.decode(data)
    d = np.abs(ours.astype(int) - theirs.astype(int))
    assert d.max() <= 3 and (d > 1).mean() < 0.05


def test_lossy_libjxl_to_ours_e3():
    img = _img(seed=5, h=64, w=64)
    data = refjxl.encode(img, lossless=False, effort=3, distance=1.0)
    ours, _ = api.decode(data)
    theirs, _ = refjxl.decode(data)
    d = np.abs(ours.astype(int) - theirs.astype(int))
    assert d.mean() < 1.0  # EPF/DC-smoothing still pending

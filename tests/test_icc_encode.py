"""Encode-side ICC embedding and custom primaries/white point
(VERDICT r2 missing #2; reference: JxlEncoderSetICCProfile at
interop/JxlEncoding.cpp:125-137 and the named-space map of
JxlEncoder.cpp:228-371)."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                "research"))

from jxl_coder_tpu import api
from jxl_coder_tpu.bitstream import container as C
from jxl_coder_tpu.bitstream.reader import BitReader
from jxl_coder_tpu.bitstream.headers import (read_image_header,
                                             ColourEncoding, CustomXY,
                                             Primaries, WhitePoint)

try:
    import refjxl
    HAVE_LIBJXL = True
except Exception:
    HAVE_LIBJXL = False


def _icc_bytes():
    from PIL import ImageCms
    return ImageCms.ImageCmsProfile(
        ImageCms.createProfile("sRGB")).tobytes()


def _img():
    rng = np.random.default_rng(5)
    return rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)


def test_icc_embed_roundtrip_byte_exact():
    icc = _icc_bytes()
    d = api.encode(_img(), lossless=True, icc=icc)
    cs = C.extract_codestream(d).codestream
    hdr = read_image_header(BitReader(cs))
    assert hdr.metadata.icc_profile == icc
    out, _ = api.decode(d)          # lcms applies the profile
    assert out.shape == (40, 56, 3)


def test_icc_embed_other_profiles():
    """Arbitrary profiles (different sizes/headers) survive byte-exact
    through the predicted-header + entropy-coded want_icc path."""
    from PIL import ImageCms
    for prof in (ImageCms.createProfile("LAB"),
                 ImageCms.createProfile("XYZ")):
        icc = ImageCms.ImageCmsProfile(prof).tobytes()
        d = api.encode(_img(), lossless=True, icc=icc)
        cs = C.extract_codestream(d).codestream
        hdr = read_image_header(BitReader(cs))
        assert hdr.metadata.icc_profile == icc, len(icc)


def test_icc_lossy_converts_to_srgb():
    icc = _icc_bytes()
    yy, xx = np.mgrid[0:40, 0:56]
    img = np.clip(np.stack([120 + 60 * np.sin(yy / 9.0),
                            110 + 50 * np.cos(xx / 7.0),
                            100 + xx], -1), 0, 255).astype(np.uint8)
    d = api.encode(img, lossless=False, quality=90, icc=icc)
    out, _ = api.decode(d)
    # sRGB profile == identity conversion: pixels stay close
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 8


def _custom_ce():
    ce = ColourEncoding()
    ce.primaries = Primaries.CUSTOM
    ce.red = CustomXY.from_float(0.7, 0.29)
    ce.green = CustomXY.from_float(0.17, 0.79)
    ce.blue = CustomXY.from_float(0.13, 0.04)
    ce.white_point = WhitePoint.CUSTOM
    ce.white = CustomXY.from_float(0.3127, 0.329)
    return ce


def test_custom_primaries_signalled_and_decoded():
    d = api.encode(_img(), lossless=False, quality=90,
                   colour=_custom_ce())
    cs = C.extract_codestream(d).codestream
    ce = read_image_header(BitReader(cs)).metadata.colour_encoding
    assert ce.primaries == Primaries.CUSTOM
    assert ce.red.as_float() == (0.7, 0.29)
    assert ce.white.as_float()[0] == pytest.approx(0.3127)
    out, _ = api.decode(d)
    assert out.shape == (40, 56, 3)


@pytest.mark.skipif(not HAVE_LIBJXL, reason="system libjxl missing")
def test_libjxl_decodes_icc_and_custom_primaries():
    d1 = api.encode(_img(), lossless=True, icc=_icc_bytes())
    r = refjxl.decode(d1)
    pix = r[0] if isinstance(r, tuple) else r
    assert np.asarray(pix).shape == (40, 56, 3)
    d2 = api.encode(_img(), lossless=False, quality=90,
                    colour=_custom_ce())
    r2 = refjxl.decode(d2)
    pix2 = r2[0] if isinstance(r2, tuple) else r2
    assert np.asarray(pix2).shape == (40, 56, 3)

"""VarDCT path tests: DCT correctness, XYB invertibility, full lossy
roundtrip quality (BASELINE config[1] shape: PSNR gates)."""

import numpy as np
import pytest

import jax.numpy as jnp

from jxl_coder_tpu.vardct.dct import dct2d, idct2d, dct_matrix, blockify, \
    unblockify
from jxl_coder_tpu.vardct.xyb import linear_rgb_to_xyb, xyb_to_linear_rgb
from jxl_coder_tpu.ops import color as C
from jxl_coder_tpu import api


def rng():
    return np.random.default_rng(7)


def test_dct_orthonormal():
    for n in (2, 4, 8, 16, 32):
        m = dct_matrix(n)
        assert np.allclose(m @ m.T, np.eye(n), atol=1e-5)


def test_dct_idct_roundtrip():
    r = rng()
    blocks = jnp.asarray(r.normal(0, 1, (5, 4, 4, 8, 8)).astype(np.float32))
    rec = idct2d(dct2d(blocks))
    assert np.allclose(np.asarray(rec), np.asarray(blocks), atol=1e-4)


def test_blockify_roundtrip():
    r = rng()
    img = jnp.asarray(r.normal(0, 1, (3, 32, 40)).astype(np.float32))
    assert np.array_equal(np.asarray(unblockify(blockify(img))),
                          np.asarray(img))


def test_dct_dc_is_mean():
    r = rng()
    b = jnp.asarray(r.normal(0, 1, (1, 1, 1, 8, 8)).astype(np.float32))
    c = dct2d(b)
    assert np.allclose(float(c[0, 0, 0, 0, 0]),
                       float(jnp.mean(b)) * 8.0, atol=1e-5)


def test_xyb_roundtrip():
    r = rng()
    rgb = jnp.asarray(r.uniform(0.01, 1.0, (3, 16, 16)).astype(np.float32))
    back = xyb_to_linear_rgb(linear_rgb_to_xyb(rgb))
    assert np.allclose(np.asarray(back), np.asarray(rgb), atol=1e-3)


def test_xyb_grey_axis():
    grey = jnp.full((3, 4, 4), 0.5, jnp.float32)
    xyb = linear_rgb_to_xyb(grey)
    # X (opponent red-green) should be ~0 for neutral grey
    assert abs(float(xyb[0].mean())) < 1e-4


@pytest.mark.parametrize("tf", [1, 8, 13, 16, 17, 18])
def test_transfer_function_roundtrip(tf):
    v = jnp.linspace(1e-4, 1.0, 64)
    enc = C.LINEAR_TO_TRC[tf](v)
    dec = C.TRC_TO_LINEAR[tf](enc)
    assert np.allclose(np.asarray(dec), np.asarray(v), rtol=2e-3, atol=2e-4)


def test_gamut_matrices():
    m = C.conversion_matrix("srgb", "bt2020")
    inv = C.conversion_matrix("bt2020", "srgb")
    assert np.allclose(m @ inv, np.eye(3), atol=1e-5)
    # white maps to white
    assert np.allclose(m @ np.ones(3), np.ones(3), atol=1e-4)


def test_luma_coeffs_bt709():
    lw = C.luma_coeffs(C.PRIMARIES["srgb"])
    assert np.allclose(lw, [0.2126, 0.7152, 0.0722], atol=1e-3)


def _test_image(h=96, w=128):
    r = rng()
    yy, xx = np.mgrid[0:h, 0:w]
    img = np.stack([
        128 + 80 * np.sin(yy / 17) + 30 * np.cos(xx / 11),
        120 + 60 * np.cos((xx + yy) / 23),
        90 + 70 * np.sin(xx / 13),
    ], -1)
    return np.clip(img + r.normal(0, 4, img.shape), 0, 255).astype(np.uint8)


def _psnr(a, b):
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0 ** 2 / mse)


def test_vardct_roundtrip_quality():
    img = _test_image()
    data = api.encode(img, lossless=False, quality=90)
    assert api.is_jxl(data)
    out, info = api.decode(data)
    assert out.shape == img.shape
    p = _psnr(out, img)
    assert p > 32.0, f"PSNR too low: {p}"
    # lossy must actually compress
    assert len(data) < img.size


def test_vardct_quality_ladder():
    img = _test_image(64, 64)
    sizes = []
    psnrs = []
    for q in (30, 70, 95):
        data = api.encode(img, lossless=False, quality=q)
        out, _ = api.decode(data)
        sizes.append(len(data))
        psnrs.append(_psnr(out, img))
    assert sizes[0] < sizes[2], sizes
    assert psnrs[0] < psnrs[2], psnrs


def test_vardct_odd_size_crop():
    img = _test_image(41, 53)
    data = api.encode(img, lossless=False, quality=90)
    out, _ = api.decode(data)
    assert out.shape == (41, 53, 3)
    assert _psnr(out, img) > 30.0


def test_sharded_real_reconstruct_matches_single_device():
    """Real-format sharded reconstruction (8-device mesh, halo exchange)
    matches the single-device device pipeline (ref: libjxl decodes groups
    independently with cross-group filter borders; here the equivalent is
    block-row sharding + ppermute halos)."""
    import jax
    from jxl_coder_tpu.parallel import groups as G
    from jxl_coder_tpu.vardct import tpu_real as tr
    from jxl_coder_tpu.vardct import synthesis as S

    if len(jax.devices()) < 8:
        import pytest
        pytest.skip("needs 8 virtual devices")
    rng = np.random.default_rng(7)
    ys, xs = 16, 24
    co = rng.normal(0, 20, (3, ys, xs, 64)).astype(np.float32)
    dc = rng.integers(-200, 200, (3, ys, xs)).astype(np.int32)
    qf = rng.integers(4, 40, (ys, xs)).astype(np.int32)
    sh = rng.integers(0, 8, (ys, xs)).astype(np.int32)
    xf = rng.normal(0, 0.3, (ys, xs)).astype(np.float32)
    bf = rng.normal(1.0, 0.3, (ys, xs)).astype(np.float32)
    tb = np.stack([S.dequant_table(0, c) for c in range(3)]).astype(
        np.float32)
    igs = np.float32(1.2)
    qdc = np.float32(0.8)
    dcq = np.asarray([0.6, 1.0, 1.5], np.float32)
    one = np.float32(1.0)
    mesh = G.make_mesh(8)
    for gab, epf, dcs in [(True, True, True), (False, True, False),
                          (True, 2, True)]:
        ref = np.asarray(tr.reconstruct_dct8_frame(
            co, dc, qf, sh, xf, bf, tb, igs, qdc, dcq, one, one,
            gab, epf, not dcs))
        fn = G.sharded_reconstruct_real(mesh, gab=gab, epf=epf,
                                        dc_smooth=dcs)
        out = np.asarray(fn(co, dc, qf, sh, xf, bf, tb, igs, qdc, dcq,
                            one, one))
        # different XLA fusion may flip a pixel on a 0.5 rounding boundary
        d = np.abs(ref.astype(int) - out.astype(int))
        assert d.max() <= 1 and (d > 0).sum() <= ref.size // 10000, (
            gab, epf, dcs, d.max(), int((d > 0).sum()))


def test_splines_parse_roundtrip():
    """Splines.write -> Splines.read preserves every field."""
    from jxl_coder_tpu.bitstream.writer import BitWriter
    from jxl_coder_tpu.bitstream.reader import BitReader
    from jxl_coder_tpu.vardct.splines import Splines, QuantizedSpline
    rng = np.random.default_rng(11)
    splines = []
    for i in range(3):
        npts = int(rng.integers(1, 6))
        pts = rng.integers(-20, 120, (npts, 2)).astype(np.float64)
        pts[0] = np.abs(pts[0])  # starting points are coded unsigned
        splines.append(QuantizedSpline(
            points=pts,
            color_dct=rng.integers(-50, 50, (3, 32)),
            sigma_dct=rng.integers(-20, 20, 32)))
    spl = Splines(quantization_adjustment=-3, splines=splines)
    bw = BitWriter()
    spl.write(bw)
    bw.zero_pad_to_byte()
    back = Splines.read(BitReader(bw.to_bytes()), 256 * 256)
    assert back.quantization_adjustment == -3
    assert len(back.splines) == 3
    for a, b in zip(spl.splines, back.splines):
        assert np.array_equal(a.points, b.points)
        assert np.array_equal(a.color_dct, b.color_dct)
        assert np.array_equal(a.sigma_dct, b.sigma_dct)


def test_progressive_two_pass_encode():
    """progressive=True emits a 2-pass stream (coarse + refinement)
    whose accumulated decode is IDENTICAL to the single-pass stream's
    (the split v = (v0 << 1) + v1 is exact)."""
    import numpy as np
    from jxl_coder_tpu import api
    from jxl_coder_tpu.vardct.enc_real import encode_vardct_real
    from jxl_coder_tpu.bitstream import container as container_mod
    from jxl_coder_tpu.bitstream.reader import BitReader
    from jxl_coder_tpu.bitstream.headers import read_image_header
    from jxl_coder_tpu.bitstream.frame_header import read_frame_header
    rng = np.random.default_rng(9)
    yy, xx = np.mgrid[0:96, 0:160]
    img = np.clip(np.stack(
        [128 + 80 * np.sin(yy / 11) + rng.normal(0, 6, yy.shape),
         120 + 60 * np.cos(xx / 13),
         110 + 50 * np.sin((xx + yy) / 17)], -1), 0, 255).astype(np.uint8)
    d1 = encode_vardct_real(img, distance=1.0, effort=5,
                            try_patches=False)
    d2 = encode_vardct_real(img, distance=1.0, effort=5,
                            try_patches=False, progressive=True)
    cs = container_mod.extract_codestream(d2).codestream
    br = BitReader(cs)
    hdr = read_image_header(br)
    fh = read_frame_header(br, hdr)
    assert fh.passes.num_passes == 2
    assert list(fh.passes.shift) == [1]
    o1, _ = api.decode(d1)
    o2, _ = api.decode(d2)
    assert np.array_equal(o1, o2)
    # API surface
    d3 = api.encode(img, lossless=False, quality=90, effort=5,
                    progressive=True)
    o3, _ = api.decode(d3)
    assert o3.shape == img.shape


def test_decode_preview_pass0():
    """decode_preview renders a progressive stream from its first AC
    pass only: lower fidelity than the full decode but a faithful
    image; non-progressive streams decode identically to decode()."""
    import numpy as np
    from jxl_coder_tpu import api
    rng = np.random.default_rng(6)
    yy, xx = np.mgrid[0:96, 0:128]
    img = np.clip(np.stack(
        [128 + 70 * np.sin(yy / 12) + rng.normal(0, 5, yy.shape),
         120 + 60 * np.cos(xx / 15), 110 + 50 * np.sin((xx + yy) / 21)],
        -1), 0, 255).astype(np.uint8)

    def psnr(a, b):
        m = np.mean((a.astype(float) - b.astype(float)) ** 2)
        return 10 * np.log10(255.0 ** 2 / max(m, 1e-9))

    d = api.encode(img, lossless=False, quality=90, effort=5,
                   progressive=True)
    full, _ = api.decode(d)
    prev, _ = api.decode_preview(d, passes=1)
    assert prev.shape == full.shape
    assert psnr(prev, img) > 28.0
    assert psnr(full, img) > psnr(prev, img)
    d1 = api.encode(img, lossless=False, quality=90, effort=5)
    assert np.array_equal(api.decode_preview(d1)[0], api.decode(d1)[0])

import numpy as np, sys, ctypes
from ctypes import c_void_p, c_int, c_int64, c_size_t, c_uint8, byref, POINTER
sys.path.insert(0, '/root/repo/research')
import refjxl
from refjxl import _lib, JxlBasicInfo, JxlPixelFormat, JXL_TYPE_UINT8, JXL_NATIVE_ENDIAN
_lib.JxlEncoderFrameSettingsSetOption.restype = c_int
_lib.JxlEncoderFrameSettingsSetOption.argtypes = [c_void_p, c_int, c_int64]
_lib.JxlEncoderFrameSettingsSetFloatOption.restype = c_int
_lib.JxlEncoderFrameSettingsSetFloatOption.argtypes = [c_void_p, c_int, ctypes.c_float]

def encode_opts(pixels, opts, lossless=False, distance=1.0, effort=7):
    h, w, nch = pixels.shape
    enc = _lib.JxlEncoderCreate(None)
    try:
        info = JxlBasicInfo()
        _lib.JxlEncoderInitBasicInfo(byref(info))
        info.xsize = w; info.ysize = h
        info.bits_per_sample = 8
        info.num_color_channels = 3
        if nch == 4:
            info.alpha_bits = 8; info.num_extra_channels = 1
        info.uses_original_profile = 1 if lossless else 0
        assert _lib.JxlEncoderSetBasicInfo(enc, byref(info)) == 0
        ce = ctypes.create_string_buffer(1024)
        _lib.JxlColorEncodingSetToSRGB(ce, 0)
        assert _lib.JxlEncoderSetColorEncoding(enc, ce) == 0
        o = _lib.JxlEncoderOptionsCreate(enc, None)
        _lib.JxlEncoderOptionsSetEffort(o, effort)
        if lossless: _lib.JxlEncoderOptionsSetLossless(o, 1)
        else: _lib.JxlEncoderOptionsSetDistance(o, ctypes.c_float(distance))
        for k, v in opts.items():
            if isinstance(v, float):
                rc = _lib.JxlEncoderFrameSettingsSetFloatOption(o, k, v)
            else:
                rc = _lib.JxlEncoderFrameSettingsSetOption(o, k, v)
            assert rc == 0, (k, v)
        fmt = JxlPixelFormat(nch, JXL_TYPE_UINT8, JXL_NATIVE_ENDIAN, 0)
        arr = np.ascontiguousarray(pixels, np.uint8)
        assert _lib.JxlEncoderAddImageFrame(o, byref(fmt), arr.ctypes.data_as(c_void_p), arr.nbytes) == 0
        _lib.JxlEncoderCloseInput(enc)
        out = bytearray(); chunk = (c_uint8 * 65536)()
        while True:
            ptr = ctypes.cast(chunk, POINTER(c_uint8)); avail = c_size_t(65536)
            st = _lib.JxlEncoderProcessOutput(enc, byref(ptr), byref(avail))
            out += bytes(chunk[:65536 - avail.value])
            if st == 0: break
            assert st == 2, st
        return bytes(out)
    finally:
        _lib.JxlEncoderDestroy(enc)


_lib.JxlEncoderSetICCProfile.restype = c_int
_lib.JxlEncoderSetICCProfile.argtypes = [c_void_p, c_void_p, ctypes.c_size_t]
_lib.JxlDecoderGetICCProfileSize.restype = c_int
_lib.JxlDecoderGetICCProfileSize.argtypes = [c_void_p, c_void_p, c_int,
                                             ctypes.POINTER(ctypes.c_size_t)]
_lib.JxlDecoderGetColorAsICCProfile.restype = c_int
_lib.JxlDecoderGetColorAsICCProfile.argtypes = [c_void_p, c_void_p, c_int,
                                                c_void_p, ctypes.c_size_t]


def encode_icc(pixels, icc: bytes, lossless=True, distance=1.0, effort=3):
    """Encode with an embedded ICC profile (forces want_icc streams)."""
    import numpy as np
    h, w, nch = pixels.shape
    enc = _lib.JxlEncoderCreate(None)
    try:
        from refjxl import JxlBasicInfo, JxlPixelFormat, JXL_TYPE_UINT8, JXL_NATIVE_ENDIAN
        from ctypes import byref, c_size_t, c_uint8, POINTER
        info = JxlBasicInfo()
        _lib.JxlEncoderInitBasicInfo(byref(info))
        info.xsize = w; info.ysize = h
        info.bits_per_sample = 8
        info.num_color_channels = 3
        info.uses_original_profile = 1 if lossless else 0
        assert _lib.JxlEncoderSetBasicInfo(enc, byref(info)) == 0
        buf = ctypes.create_string_buffer(icc, len(icc))
        assert _lib.JxlEncoderSetICCProfile(enc, buf, len(icc)) == 0
        o = _lib.JxlEncoderOptionsCreate(enc, None)
        _lib.JxlEncoderOptionsSetEffort(o, effort)
        if lossless:
            _lib.JxlEncoderOptionsSetLossless(o, 1)
        else:
            _lib.JxlEncoderOptionsSetDistance(o, ctypes.c_float(distance))
        fmt = JxlPixelFormat(nch, JXL_TYPE_UINT8, JXL_NATIVE_ENDIAN, 0)
        arr = np.ascontiguousarray(pixels, np.uint8)
        assert _lib.JxlEncoderAddImageFrame(o, byref(fmt), arr.ctypes.data_as(c_void_p), arr.nbytes) == 0
        _lib.JxlEncoderCloseInput(enc)
        out = bytearray(); chunk = (c_uint8 * 65536)()
        while True:
            ptr = ctypes.cast(chunk, POINTER(c_uint8)); avail = c_size_t(65536)
            st = _lib.JxlEncoderProcessOutput(enc, byref(ptr), byref(avail))
            out += bytes(chunk[:65536 - avail.value])
            if st == 0: break
            assert st == 2, st
        return bytes(out)
    finally:
        _lib.JxlEncoderDestroy(enc)


def decode_icc(data: bytes) -> bytes:
    """Extract the ICC profile libjxl reports for a stream (oracle)."""
    import ctypes as c
    from ctypes import byref, c_size_t, c_uint8
    dec = _lib.JxlDecoderCreate(None)
    try:
        JXL_DEC_COLOR_ENCODING = 0x100
        assert _lib.JxlDecoderSubscribeEvents(dec, JXL_DEC_COLOR_ENCODING) == 0
        buf = c.create_string_buffer(data, len(data))
        assert _lib.JxlDecoderSetInput(dec, buf, len(data)) == 0
        while True:
            st = _lib.JxlDecoderProcessInput(dec)
            if st == JXL_DEC_COLOR_ENCODING:
                break
            assert st not in (0, 1), st
        size = c_size_t()
        # 0.7 signature: (dec, format*, target, size*)
        JXL_COLOR_PROFILE_TARGET_DATA = 1
        assert _lib.JxlDecoderGetICCProfileSize(
            dec, None, JXL_COLOR_PROFILE_TARGET_DATA, byref(size)) == 0
        out = (c_uint8 * size.value)()
        assert _lib.JxlDecoderGetColorAsICCProfile(
            dec, None, JXL_COLOR_PROFILE_TARGET_DATA, out, size.value) == 0
        return bytes(out)
    finally:
        _lib.JxlDecoderDestroy(dec)

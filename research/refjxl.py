"""ctypes wrapper for the system libjxl 0.7 — reference encoder/decoder.

Used as a conformance oracle: generates known-content streams for
pinning wire-format details and golden pixels for decode comparison.
"""

import ctypes
from ctypes import (POINTER, byref, c_void_p, c_int, c_size_t, c_uint8,
                    c_uint32, c_uint64, c_float, Structure)

import numpy as np

_lib = ctypes.CDLL("/usr/lib/x86_64-linux-gnu/libjxl.so.0.7.0")

# enums (jxl/decode.h, jxl/encode.h 0.7)
JXL_DEC_SUCCESS = 0
JXL_DEC_ERROR = 1
JXL_DEC_NEED_MORE_INPUT = 2
JXL_DEC_BASIC_INFO = 0x40
JXL_DEC_FULL_IMAGE = 0x1000
JXL_ENC_SUCCESS = 0
JXL_TYPE_FLOAT = 0
JXL_TYPE_UINT8 = 2
JXL_TYPE_UINT16 = 3
JXL_NATIVE_ENDIAN = 0


class JxlPixelFormat(Structure):
    _fields_ = [("num_channels", c_uint32), ("data_type", c_int),
                ("endianness", c_int), ("align", c_size_t)]


class JxlBasicInfo(Structure):
    _fields_ = [("have_container", c_int), ("xsize", c_uint32),
                ("ysize", c_uint32), ("bits_per_sample", c_uint32),
                ("exponent_bits_per_sample", c_uint32),
                ("intensity_target", c_float), ("min_nits", c_float),
                ("relative_to_max_display", c_int),
                ("linear_below", c_float), ("uses_original_profile", c_int),
                ("have_preview", c_int), ("have_animation", c_int),
                ("orientation", c_int), ("num_color_channels", c_uint32),
                ("num_extra_channels", c_uint32), ("alpha_bits", c_uint32),
                ("alpha_exponent_bits", c_uint32),
                ("alpha_premultiplied", c_int),
                ("preview_xsize", c_uint32), ("preview_ysize", c_uint32),
                ("animation_tps_numerator", c_uint32),
                ("animation_tps_denominator", c_uint32),
                ("animation_num_loops", c_uint32),
                ("animation_have_timecodes", c_int),
                ("padding", c_uint8 * 108)]


for name, restype, argtypes in [
    ("JxlDecoderCreate", c_void_p, [c_void_p]),
    ("JxlDecoderDestroy", None, [c_void_p]),
    ("JxlDecoderSubscribeEvents", c_int, [c_void_p, c_int]),
    ("JxlDecoderSetInput", c_int, [c_void_p, c_void_p, c_size_t]),
    ("JxlDecoderProcessInput", c_int, [c_void_p]),
    ("JxlDecoderGetBasicInfo", c_int, [c_void_p, POINTER(JxlBasicInfo)]),
    ("JxlDecoderImageOutBufferSize", c_int,
     [c_void_p, POINTER(JxlPixelFormat), POINTER(c_size_t)]),
    ("JxlDecoderSetImageOutBuffer", c_int,
     [c_void_p, POINTER(JxlPixelFormat), c_void_p, c_size_t]),
    ("JxlEncoderCreate", c_void_p, [c_void_p]),
    ("JxlEncoderDestroy", None, [c_void_p]),
    ("JxlEncoderAddImageFrame", c_int,
     [c_void_p, POINTER(JxlPixelFormat), c_void_p, c_size_t]),
    ("JxlEncoderCloseInput", None, [c_void_p]),
    ("JxlEncoderProcessOutput", c_int,
     [c_void_p, POINTER(POINTER(c_uint8)), POINTER(c_size_t)]),
    ("JxlEncoderSetBasicInfo", c_int, [c_void_p, POINTER(JxlBasicInfo)]),
    ("JxlEncoderOptionsCreate", c_void_p, [c_void_p, c_void_p]),
    ("JxlEncoderOptionsSetDistance", c_int, [c_void_p, c_float]),
    ("JxlEncoderOptionsSetEffort", c_int, [c_void_p, c_int]),
    ("JxlEncoderOptionsSetLossless", c_int, [c_void_p, c_int]),
    ("JxlEncoderUseContainer", c_int, [c_void_p, c_int]),
    ("JxlColorEncodingSetToSRGB", None, [c_void_p, c_int]),
    ("JxlEncoderSetColorEncoding", c_int, [c_void_p, c_void_p]),
    ("JxlEncoderInitBasicInfo", None, [POINTER(JxlBasicInfo)]),
    ("JxlEncoderInitFrameHeader", None, [c_void_p]),
    ("JxlEncoderSetFrameHeader", c_int, [c_void_p, c_void_p]),
]:
    try:
        f = getattr(_lib, name)
        f.restype = restype
        f.argtypes = argtypes
    except AttributeError:
        pass


def decode(data: bytes, as_float: bool = False):
    """Decode to (pixels uint8 or float32 (H,W,C), JxlBasicInfo)."""
    dec = _lib.JxlDecoderCreate(None)
    try:
        assert _lib.JxlDecoderSubscribeEvents(
            dec, JXL_DEC_BASIC_INFO | JXL_DEC_FULL_IMAGE) == 0
        buf = ctypes.create_string_buffer(data, len(data))
        assert _lib.JxlDecoderSetInput(dec, buf, len(data)) == 0
        info = JxlBasicInfo()
        pixels = None
        fmt = None
        while True:
            status = _lib.JxlDecoderProcessInput(dec)
            if status == JXL_DEC_BASIC_INFO:
                assert _lib.JxlDecoderGetBasicInfo(dec, byref(info)) == 0
            elif status == 5:  # NEED_IMAGE_OUT_BUFFER
                nch = 3 + (1 if info.alpha_bits else 0)
                ptype = JXL_TYPE_FLOAT if as_float else JXL_TYPE_UINT8
                fmt = JxlPixelFormat(nch, ptype, JXL_NATIVE_ENDIAN, 0)
                size = c_size_t()
                assert _lib.JxlDecoderImageOutBufferSize(
                    dec, byref(fmt), byref(size)) == 0
                pixels = (c_uint8 * size.value)()
                assert _lib.JxlDecoderSetImageOutBuffer(
                    dec, byref(fmt), pixels, size.value) == 0
            elif status == JXL_DEC_FULL_IMAGE:
                pass
            elif status == JXL_DEC_SUCCESS:
                break
            elif status == JXL_DEC_ERROR:
                raise RuntimeError("libjxl decode error")
            elif status == JXL_DEC_NEED_MORE_INPUT:
                raise RuntimeError("truncated input")
            else:
                raise RuntimeError(f"unhandled decoder status {status}")
        nch = fmt.num_channels
        raw = np.ctypeslib.as_array(pixels)
        if as_float:
            arr = raw.view(np.float32).reshape(
                info.ysize, info.xsize, nch).copy()
        else:
            arr = raw.reshape(info.ysize, info.xsize, nch).copy()
        return arr, info
    finally:
        _lib.JxlDecoderDestroy(dec)


def encode(pixels: np.ndarray, lossless: bool = True, effort: int = 7,
           distance: float = 1.0, container: bool = False) -> bytes:
    """Encode uint8 (H, W, 3) with libjxl 0.7."""
    h, w, nch = pixels.shape
    enc = _lib.JxlEncoderCreate(None)
    try:
        _lib.JxlEncoderUseContainer(enc, 1 if container else 0)
        info = JxlBasicInfo()
        _lib.JxlEncoderInitBasicInfo(byref(info))
        info.xsize = w
        info.ysize = h
        info.bits_per_sample = 8
        info.num_color_channels = 3
        if nch == 4:
            info.alpha_bits = 8
            info.num_extra_channels = 1
        info.uses_original_profile = 1 if lossless else 0
        assert _lib.JxlEncoderSetBasicInfo(enc, byref(info)) == 0, \
            "SetBasicInfo failed"
        # color encoding: sRGB
        ce = ctypes.create_string_buffer(1024)
        _lib.JxlColorEncodingSetToSRGB(ce, 0)
        assert _lib.JxlEncoderSetColorEncoding(enc, ce) == 0
        opts = _lib.JxlEncoderOptionsCreate(enc, None)
        _lib.JxlEncoderOptionsSetEffort(opts, effort)
        if lossless:
            _lib.JxlEncoderOptionsSetLossless(opts, 1)
        else:
            _lib.JxlEncoderOptionsSetDistance(opts, distance)
        fmt = JxlPixelFormat(nch, JXL_TYPE_UINT8, JXL_NATIVE_ENDIAN, 0)
        arr = np.ascontiguousarray(pixels, np.uint8)
        assert _lib.JxlEncoderAddImageFrame(
            opts, byref(fmt), arr.ctypes.data_as(c_void_p),
            arr.nbytes) == 0, "AddImageFrame failed"
        _lib.JxlEncoderCloseInput(enc)
        out = bytearray()
        chunk = (c_uint8 * 65536)()
        while True:
            ptr = ctypes.cast(chunk, POINTER(c_uint8))
            avail = c_size_t(65536)
            status = _lib.JxlEncoderProcessOutput(enc, byref(ptr),
                                                  byref(avail))
            used = 65536 - avail.value
            out += bytes(chunk[:used])
            if status == JXL_ENC_SUCCESS:
                break
            if status != 2:  # JXL_ENC_NEED_MORE_OUTPUT
                raise RuntimeError(f"encoder status {status}")
        return bytes(out)
    finally:
        _lib.JxlEncoderDestroy(enc)


if __name__ == "__main__":
    img = np.zeros((16, 16, 3), np.uint8)
    img[:, :, 0] = 128
    data = encode(img, lossless=True, effort=1)
    print("encoded", len(data), "bytes:", data[:32].hex())
    back, info = decode(data)
    print("decoded", back.shape, "exact:", np.array_equal(back, img))


# ---------------------------------------------------------------------------
# Animation encode (multi-frame with durations)

class JxlAnimationHeader(ctypes.Structure):
    _fields_ = [("tps_numerator", c_uint32), ("tps_denominator", c_uint32),
                ("num_loops", c_uint32), ("have_timecodes", ctypes.c_int)]


class JxlBlendInfo(ctypes.Structure):
    _fields_ = [("blendmode", ctypes.c_int), ("source", c_uint32),
                ("alpha", c_uint32), ("clamp", ctypes.c_int)]


class JxlLayerInfo(ctypes.Structure):
    _fields_ = [("have_crop", ctypes.c_int),
                ("crop_x0", ctypes.c_int32), ("crop_y0", ctypes.c_int32),
                ("xsize", c_uint32), ("ysize", c_uint32),
                ("blend_info", JxlBlendInfo),
                ("save_as_reference", c_uint32)]


class JxlFrameHeader(ctypes.Structure):
    _fields_ = [("duration", c_uint32), ("timecode", c_uint32),
                ("name_length", c_uint32), ("is_last", ctypes.c_int),
                ("layer_info", JxlLayerInfo)]


def encode_animation(frames, lossless=True, effort=3, distance=1.0,
                     tps_num=10, tps_den=1):
    """frames: list of uint8 (H, W, 3); each 1 tick duration."""
    h, w, nch = frames[0].shape
    enc = _lib.JxlEncoderCreate(None)
    try:
        info = JxlBasicInfo()
        _lib.JxlEncoderInitBasicInfo(byref(info))
        info.xsize = w
        info.ysize = h
        info.bits_per_sample = 8
        info.num_color_channels = 3
        info.uses_original_profile = 1 if lossless else 0
        info.have_animation = 1
        # animation fields live in the basic info struct tail
        # (animation.tps_numerator etc.)
        info.animation_tps_numerator = tps_num
        info.animation_tps_denominator = tps_den
        info.animation_num_loops = 0
        info.animation_have_timecodes = 0
        assert _lib.JxlEncoderSetBasicInfo(enc, byref(info)) == 0
        ce = ctypes.create_string_buffer(1024)
        _lib.JxlColorEncodingSetToSRGB(ce, 0)
        assert _lib.JxlEncoderSetColorEncoding(enc, ce) == 0
        opts = _lib.JxlEncoderOptionsCreate(enc, None)
        _lib.JxlEncoderOptionsSetEffort(opts, effort)
        if lossless:
            _lib.JxlEncoderOptionsSetLossless(opts, 1)
        else:
            _lib.JxlEncoderOptionsSetDistance(opts, distance)
        fmt = JxlPixelFormat(nch, JXL_TYPE_UINT8, JXL_NATIVE_ENDIAN, 0)
        fhdr = JxlFrameHeader()
        for i, fr in enumerate(frames):
            _lib.JxlEncoderInitFrameHeader(byref(fhdr))
            fhdr.duration = 1
            assert _lib.JxlEncoderSetFrameHeader(opts, byref(fhdr)) == 0
            arr = np.ascontiguousarray(fr, np.uint8)
            assert _lib.JxlEncoderAddImageFrame(
                opts, byref(fmt), arr.ctypes.data_as(c_void_p),
                arr.nbytes) == 0
        _lib.JxlEncoderCloseInput(enc)
        out = bytearray()
        chunk = (c_uint8 * 65536)()
        while True:
            ptr = ctypes.cast(chunk, POINTER(c_uint8))
            avail = c_size_t(65536)
            status = _lib.JxlEncoderProcessOutput(enc, byref(ptr),
                                                  byref(avail))
            used = 65536 - avail.value
            out += bytes(chunk[:used])
            if status == 0:
                break
            if status != 2:
                raise RuntimeError(f"encode error {status}")
        return bytes(out)
    finally:
        _lib.JxlEncoderDestroy(enc)


# ---------------------------------------------------------------------------
# Full-feature encode: custom JxlColorEncoding, 16-bit input, intensity


class JxlColorEncoding(Structure):
    """jxl/color_encoding.h (0.7) struct layout."""
    _fields_ = [("color_space", c_int), ("white_point", c_int),
                ("white_point_xy", ctypes.c_double * 2),
                ("primaries", c_int),
                ("primaries_red_xy", ctypes.c_double * 2),
                ("primaries_green_xy", ctypes.c_double * 2),
                ("primaries_blue_xy", ctypes.c_double * 2),
                ("transfer_function", c_int),
                ("gamma", ctypes.c_double),
                ("rendering_intent", c_int)]


def make_color_encoding(transfer_function=13, primaries=1, white_point=1,
                        gamma=0.0):
    """Wire-numbered JxlColorEncoding (values match our headers enums:
    TRC 16=PQ/18=HLG/13=sRGB, primaries 1=sRGB/9=BT2100/11=P3)."""
    ce = JxlColorEncoding()
    ce.color_space = 0  # RGB
    ce.white_point = white_point
    ce.primaries = primaries
    ce.transfer_function = transfer_function
    ce.gamma = gamma
    ce.rendering_intent = 1  # RELATIVE
    return ce


def encode_ex(pixels: np.ndarray, lossless: bool = False, effort: int = 7,
              distance: float = 1.0, color_encoding=None,
              intensity_target: float = 0.0,
              container: bool = False) -> bytes:
    """Encode uint8/uint16 (H, W, 3|4) with libjxl 0.7, optional custom
    colour encoding + intensity target (for PQ/HLG streams)."""
    h, w, nch = pixels.shape
    bits = 16 if pixels.dtype == np.uint16 else 8
    enc = _lib.JxlEncoderCreate(None)
    try:
        _lib.JxlEncoderUseContainer(enc, 1 if container else 0)
        info = JxlBasicInfo()
        _lib.JxlEncoderInitBasicInfo(byref(info))
        info.xsize = w
        info.ysize = h
        info.bits_per_sample = bits
        info.num_color_channels = 3
        if nch == 4:
            info.alpha_bits = bits
            info.num_extra_channels = 1
        if intensity_target:
            info.intensity_target = intensity_target
        info.uses_original_profile = 1 if lossless else 0
        assert _lib.JxlEncoderSetBasicInfo(enc, byref(info)) == 0
        if color_encoding is None:
            ce = ctypes.create_string_buffer(1024)
            _lib.JxlColorEncodingSetToSRGB(ce, 0)
            assert _lib.JxlEncoderSetColorEncoding(enc, ce) == 0
        else:
            assert _lib.JxlEncoderSetColorEncoding(
                enc, byref(color_encoding)) == 0
        opts = _lib.JxlEncoderOptionsCreate(enc, None)
        _lib.JxlEncoderOptionsSetEffort(opts, effort)
        if lossless:
            _lib.JxlEncoderOptionsSetLossless(opts, 1)
        else:
            _lib.JxlEncoderOptionsSetDistance(opts, distance)
        typ = JXL_TYPE_UINT16 if bits == 16 else JXL_TYPE_UINT8
        fmt = JxlPixelFormat(nch, typ, JXL_NATIVE_ENDIAN, 0)
        arr = np.ascontiguousarray(
            pixels, np.uint16 if bits == 16 else np.uint8)
        assert _lib.JxlEncoderAddImageFrame(
            opts, byref(fmt), arr.ctypes.data_as(c_void_p),
            arr.nbytes) == 0
        _lib.JxlEncoderCloseInput(enc)
        out = bytearray()
        chunk = (c_uint8 * 65536)()
        while True:
            ptr = ctypes.cast(chunk, POINTER(c_uint8))
            avail = c_size_t(65536)
            status = _lib.JxlEncoderProcessOutput(enc, byref(ptr),
                                                  byref(avail))
            out += bytes(chunk[:65536 - avail.value])
            if status == JXL_ENC_SUCCESS:
                break
            if status != 2:
                raise RuntimeError(f"encoder status {status}")
        return bytes(out)
    finally:
        _lib.JxlEncoderDestroy(enc)


# ---------------------------------------------------------------------------
# Threaded decode (libjxl_threads runner) + throughput measurement

_libthreads = None


def _threads_lib():
    global _libthreads
    if _libthreads is None:
        _libthreads = ctypes.CDLL(
            "/usr/lib/x86_64-linux-gnu/libjxl_threads.so.0.7.0")
        _libthreads.JxlThreadParallelRunnerCreate.restype = c_void_p
        _libthreads.JxlThreadParallelRunnerCreate.argtypes = [
            c_void_p, c_size_t]
        _libthreads.JxlThreadParallelRunnerDestroy.argtypes = [c_void_p]
        _lib.JxlDecoderSetParallelRunner.restype = c_int
        _lib.JxlDecoderSetParallelRunner.argtypes = [
            c_void_p, c_void_p, c_void_p]
    return _libthreads


def decode_threaded(data: bytes, threads: int = 0):
    """Decode with the JxlThreadParallelRunner (the reference's decode
    parallelism, interop/JxlDecoding.cpp:46,56-60)."""
    import os as _os
    if threads <= 0:
        threads = _os.cpu_count() or 1
    tl = _threads_lib()
    runner = tl.JxlThreadParallelRunnerCreate(None, threads)
    dec = _lib.JxlDecoderCreate(None)
    try:
        fn = ctypes.cast(tl.JxlThreadParallelRunner, c_void_p)
        assert _lib.JxlDecoderSetParallelRunner(dec, fn, runner) == 0
        assert _lib.JxlDecoderSubscribeEvents(
            dec, JXL_DEC_BASIC_INFO | JXL_DEC_FULL_IMAGE) == 0
        buf = ctypes.create_string_buffer(data, len(data))
        _lib.JxlDecoderSetInput(dec, buf, len(data))
        info = JxlBasicInfo()
        out = None
        fmt = None
        while True:
            status = _lib.JxlDecoderProcessInput(dec)
            if status == JXL_DEC_BASIC_INFO:
                assert _lib.JxlDecoderGetBasicInfo(dec, byref(info)) == 0
            elif status == 5:  # JXL_DEC_NEED_IMAGE_OUT_BUFFER
                nch = 3 + (1 if info.alpha_bits else 0)
                typ = JXL_TYPE_UINT16 if info.bits_per_sample > 8 \
                    else JXL_TYPE_UINT8
                fmt = JxlPixelFormat(nch, typ, JXL_NATIVE_ENDIAN, 0)
                dt = np.uint16 if info.bits_per_sample > 8 else np.uint8
                out = np.empty((info.ysize, info.xsize, nch), dt)
                assert _lib.JxlDecoderSetImageOutBuffer(
                    dec, byref(fmt), out.ctypes.data_as(c_void_p),
                    out.nbytes) == 0
            elif status == JXL_DEC_FULL_IMAGE:
                pass
            elif status == JXL_DEC_SUCCESS:
                return out, info
            elif status == JXL_DEC_NEED_MORE_INPUT:
                raise RuntimeError("truncated")
            elif status == JXL_DEC_ERROR:
                raise RuntimeError("decode error")
    finally:
        _lib.JxlDecoderDestroy(dec)
        tl.JxlThreadParallelRunnerDestroy(runner)


def measure_decode_mps(data: bytes, threads: int, reps: int = 3) -> float:
    """Best-of-reps libjxl decode throughput in MP/s."""
    import time as _time
    out, info = decode_threaded(data, threads)  # warm page cache
    best = float("inf")
    for _ in range(reps):
        t0 = _time.perf_counter()
        decode_threaded(data, threads)
        best = min(best, _time.perf_counter() - t0)
    return info.xsize * info.ysize / best / 1e6


# ---------------------------------------------------------------------------
# JPEG recompression oracle (construct / reconstruct via libjxl 0.7)

def jpeg_construct(jpeg_bytes: bytes, effort: int = 7) -> bytes:
    """Lossless JPEG -> JXL exactly as the reference does it
    (interop/JxlConstruction.hpp:45-102: StoreJPEGMetadata +
    AddJPEGFrame)."""
    enc = _lib.JxlEncoderCreate(None)
    try:
        _lib.JxlEncoderUseContainer.restype = c_int
        assert _lib.JxlEncoderUseContainer(enc, 1) == 0
        _lib.JxlEncoderStoreJPEGMetadata.restype = c_int
        _lib.JxlEncoderStoreJPEGMetadata.argtypes = [c_void_p, c_int]
        assert _lib.JxlEncoderStoreJPEGMetadata(enc, 1) == 0
        opts = _lib.JxlEncoderOptionsCreate(enc, None)
        _lib.JxlEncoderOptionsSetEffort(opts, effort)
        _lib.JxlEncoderAddJPEGFrame.restype = c_int
        _lib.JxlEncoderAddJPEGFrame.argtypes = [c_void_p, c_void_p,
                                                c_size_t]
        buf = ctypes.create_string_buffer(jpeg_bytes, len(jpeg_bytes))
        assert _lib.JxlEncoderAddJPEGFrame(opts, buf,
                                           len(jpeg_bytes)) == 0
        _lib.JxlEncoderCloseInput(enc)
        out = bytearray()
        chunk = (c_uint8 * 65536)()
        while True:
            ptr = ctypes.cast(chunk, POINTER(c_uint8))
            avail = c_size_t(65536)
            status = _lib.JxlEncoderProcessOutput(enc, byref(ptr),
                                                  byref(avail))
            out += bytes(chunk[:65536 - avail.value])
            if status == JXL_ENC_SUCCESS:
                break
            if status != 2:
                raise RuntimeError(f"encoder status {status}")
        return bytes(out)
    finally:
        _lib.JxlEncoderDestroy(enc)


def jpeg_reconstruct(jxl_bytes: bytes) -> bytes:
    """Recompressed JXL -> original JPEG bytes
    (interop/JxlReconstruction.hpp:44-88 semantics)."""
    JXL_DEC_JPEG_RECONSTRUCTION = 0x2000
    JXL_DEC_JPEG_NEED_MORE_OUTPUT = 6
    dec = _lib.JxlDecoderCreate(None)
    try:
        _lib.JxlDecoderSetJPEGBuffer.restype = c_int
        _lib.JxlDecoderSetJPEGBuffer.argtypes = [c_void_p, c_void_p,
                                                 c_size_t]
        _lib.JxlDecoderReleaseJPEGBuffer.restype = c_size_t
        _lib.JxlDecoderReleaseJPEGBuffer.argtypes = [c_void_p]
        assert _lib.JxlDecoderSubscribeEvents(
            dec, JXL_DEC_JPEG_RECONSTRUCTION | JXL_DEC_FULL_IMAGE
            | JXL_DEC_BASIC_INFO) == 0
        src = ctypes.create_string_buffer(jxl_bytes, len(jxl_bytes))
        _lib.JxlDecoderSetInput(dec, src, len(jxl_bytes))
        cap = 1 << 16
        jbuf = ctypes.create_string_buffer(cap)
        used_total = 0
        set_buf = False
        info = JxlBasicInfo()
        out = None
        while True:
            status = _lib.JxlDecoderProcessInput(dec)
            if status == JXL_DEC_JPEG_RECONSTRUCTION:
                assert _lib.JxlDecoderSetJPEGBuffer(dec, jbuf, cap) == 0
                set_buf = True
            elif status == JXL_DEC_JPEG_NEED_MORE_OUTPUT:
                remaining = _lib.JxlDecoderReleaseJPEGBuffer(dec)
                used_total += cap - remaining
                newcap = cap * 2
                newbuf = ctypes.create_string_buffer(newcap)
                ctypes.memmove(newbuf, jbuf, used_total)
                jbuf, cap = newbuf, newcap
                assert _lib.JxlDecoderSetJPEGBuffer(
                    dec, ctypes.byref(jbuf, used_total),
                    cap - used_total) == 0
            elif status == JXL_DEC_BASIC_INFO:
                _lib.JxlDecoderGetBasicInfo(dec, byref(info))
            elif status == 5:  # NEED_IMAGE_OUT_BUFFER
                nch = 3 + (1 if info.alpha_bits else 0)
                fmt = JxlPixelFormat(nch, JXL_TYPE_UINT8,
                                     JXL_NATIVE_ENDIAN, 0)
                out = np.empty((info.ysize, info.xsize, nch), np.uint8)
                _lib.JxlDecoderSetImageOutBuffer(
                    dec, byref(fmt), out.ctypes.data_as(c_void_p),
                    out.nbytes)
            elif status in (JXL_DEC_FULL_IMAGE,):
                pass
            elif status == JXL_DEC_SUCCESS:
                if set_buf:
                    remaining = _lib.JxlDecoderReleaseJPEGBuffer(dec)
                    used_total += cap - remaining
                return bytes(jbuf[:used_total])
            elif status == JXL_DEC_ERROR:
                raise RuntimeError("decode error")
            elif status == JXL_DEC_NEED_MORE_INPUT:
                raise RuntimeError("truncated")
    finally:
        _lib.JxlDecoderDestroy(dec)

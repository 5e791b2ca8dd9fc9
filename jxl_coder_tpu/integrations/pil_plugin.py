"""Pillow image plugin for JXL files decoded by jxl_coder_tpu.

The image-loader integration layer — analogue of the reference's Glide
plugin (app/src/main/java/com/awxkee/jxlcoder/glide/
JxlCoderByteBufferDecoder.kt:19-74, registered by JxlGlideModule.kt):
after register(), `PIL.Image.open("x.jxl")` works everywhere Pillow is
used, with the same magic-sniff gate the Glide decoder uses.
"""

from __future__ import annotations

import io

import numpy as np

from PIL import Image, ImageFile

from .. import api


def _accept(prefix: bytes) -> bool:
    return api.is_jxl(prefix)


class JxlImageFile(ImageFile.ImageFile):
    format = "JXL"
    format_description = "JPEG XL (jxl_coder_tpu)"

    def _open(self):
        self.fp.seek(0)
        data = self.fp.read()
        self._jxl_data = data
        info = api.basic_info(data)
        self._size = (info.xsize, info.ysize)
        if info.alpha:
            self._mode = "RGBA"
        else:
            self._mode = "RGB"
        self.info["bits_per_sample"] = info.bits_per_sample
        self.info["animation"] = info.have_animation
        self.tile = []
        self._decoded = None

    def load(self):
        if self._decoded is None:
            pixels, info = api.decode(self._jxl_data)
            if pixels.dtype == np.uint16:
                pixels = (pixels >> 8).astype(np.uint8)
            if pixels.shape[-1] == 1:
                pixels = np.repeat(pixels, 3, axis=-1)
            want = 4 if self.mode == "RGBA" else 3
            if pixels.shape[-1] != want:
                if want == 4:
                    pixels = np.concatenate(
                        [pixels, np.full_like(pixels[..., :1], 255)], -1)
                else:
                    pixels = pixels[..., :3]
            self._decoded = Image.fromarray(pixels, self.mode)
            self.im = self._decoded.im
        return self._decoded.load()


def _save(im, fp, filename, save_all=False):
    arr = np.asarray(im.convert("RGBA" if "A" in im.mode else "RGB"))
    lossless = im.encoderinfo.get("lossless", True) \
        if hasattr(im, "encoderinfo") else True
    quality = im.encoderinfo.get("quality", 90) \
        if hasattr(im, "encoderinfo") else 90
    fp.write(api.encode(arr, lossless=lossless, quality=quality))


_registered = False


def register() -> None:
    """Register the JXL codec with Pillow (idempotent)."""
    global _registered
    if _registered:
        return
    Image.register_open(JxlImageFile.format, JxlImageFile, _accept)
    Image.register_save(JxlImageFile.format, _save)
    Image.register_extension(JxlImageFile.format, ".jxl")
    Image.register_mime(JxlImageFile.format, "image/jxl")
    _registered = True

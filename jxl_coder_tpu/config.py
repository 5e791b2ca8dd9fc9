"""Typed configuration (SURVEY.md §5.6): the reference has no config
files — configuration is typed API arguments (the 9 Kotlin enums)
mapped onto libjxl frame settings.  This dataclass mirrors that
surface in one place, preserving the exact quality->distance curve
(interop/JxlEncoding.cpp:38-46, via vardct.quant.quality_to_distance).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from .api import (CompressionOption, Effort, DecodingSpeed,
                  ChannelsConfiguration, EncodingPixelFormat,
                  PreferredColorConfig, ScaleMode, ResizeFilter)
from .vardct.quant import quality_to_distance


@dataclasses.dataclass
class EncodeConfig:
    """All encoder knobs, defaulting to the reference's defaults."""
    compression: CompressionOption = CompressionOption.LOSSY
    quality: int = 90
    effort: Effort = Effort.SQUIRREL
    decoding_speed: DecodingSpeed = DecodingSpeed.SLOWEST
    channels: ChannelsConfiguration = ChannelsConfiguration.RGB
    pixel_format: EncodingPixelFormat = EncodingPixelFormat.UNSIGNED_8

    @property
    def lossless(self) -> bool:
        return self.compression == CompressionOption.LOSSLESS

    @property
    def distance(self) -> float:
        return 0.0 if self.lossless else quality_to_distance(self.quality)

    def validate(self) -> None:
        if not 1 <= int(self.effort) <= 10:
            raise ValueError("effort must be 1..10")
        if not 0 <= self.quality <= 100:
            raise ValueError("quality must be 0..100")
        if not 0 <= int(self.decoding_speed) <= 4:
            raise ValueError("decoding_speed must be 0..4")


@dataclasses.dataclass
class DecodeConfig:
    """Decoder-side preferences (decodeSampled surface)."""
    preferred_color_config: PreferredColorConfig = \
        PreferredColorConfig.DEFAULT
    scale_mode: ScaleMode = ScaleMode.FIT
    resize_filter: ResizeFilter = ResizeFilter.MITCHELL
    target_width: int = 0
    target_height: int = 0


def encode(pixels, config: Optional[EncodeConfig] = None, **overrides):
    """Config-object front door over api.encode."""
    from . import api
    cfg = config or EncodeConfig()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    cfg.validate()
    return api.encode(pixels, lossless=cfg.lossless,
                      quality=cfg.quality, effort=int(cfg.effort),
                      decoding_speed=int(cfg.decoding_speed))


def decode_sampled(data: bytes, config: Optional[DecodeConfig] = None):
    from . import api
    cfg = config or DecodeConfig()
    return api.decode_sampled(
        data, cfg.target_width, cfg.target_height,
        preferred_color_config=int(cfg.preferred_color_config),
        scale_mode=int(cfg.scale_mode),
        resize_filter=int(cfg.resize_filter))

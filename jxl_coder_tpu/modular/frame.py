"""Frame-level modular decoding shared by modular and VarDCT frames.

A frame's modular image holds the colour channels (modular frames
only) followed by one channel per extra channel.  The GLOBAL stream
decodes the group header, meta-applies transforms, and decodes every
channel that fits within group_dim; larger channels are decoded
rectangle-by-rectangle by the per-group ModularAC streams
(stream id = 1 + 3*num_dc_groups + num_quant_tables + pass*ng + g).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional

import numpy as np

from ..bitstream.reader import BitReader, BitstreamError
from .image import Channel, ModularImage
from .stream import (GroupHeader, decode_modular_stream, decode_channel,
                     apply_meta_transforms, undo_transforms)
from ..entropy.coder import EntropyDecoder

NUM_QUANT_TABLES = 17


@dataclasses.dataclass
class ModularFrameDecoder:
    image: ModularImage
    header: Optional[GroupHeader] = None
    gtree: object = None
    gcode: object = None
    group_dim: int = 256
    stopped_at: int = 0

    @staticmethod
    def for_frame(hdr, fh, gtree, gcode, include_color: bool,
                  w: int, h: int) -> "ModularFrameDecoder":
        m = hdr.metadata
        chans: List[Channel] = []
        if include_color:
            n_color = 1 if (m.colour_encoding.colour_space == 1
                            and not m.xyb_encoded) else 3
            for _ in range(n_color):
                chans.append(Channel(w, h))
        for i, ec in enumerate(m.extra_channels):
            ds = ec.dim_shift
            up = fh.ec_upsampling[i] if i < len(fh.ec_upsampling) else 1
            cw = -(-w // (up << ds)) if (up << ds) > 1 else w
            ch = -(-h // (up << ds)) if (up << ds) > 1 else h
            chans.append(Channel(cw, ch, hshift=ds, vshift=ds))
        return ModularFrameDecoder(
            image=ModularImage(chans), gtree=gtree, gcode=gcode,
            group_dim=fh.group_dim())

    def read_global(self, br: BitReader) -> None:
        if not self.image.channels:
            self.header = GroupHeader()
            return
        self.header = decode_modular_stream(
            br, self.image, stream_id=0, global_tree=self.gtree,
            global_code=self.gcode, max_chan_size=self.group_dim)
        self.stopped_at = getattr(self.header, "stopped_at",
                                  len(self.image.channels))

    def read_group(self, br: BitReader, group_index: int,
                   num_dc_groups: int, num_groups: int,
                   pass_index: int = 0) -> None:
        """Decode this group's rectangles of the deferred channels."""
        gd = self.group_dim
        todo = []
        for ci in range(self.stopped_at, len(self.image.channels)):
            ch = self.image.channels[ci]
            if ch.width == 0 or ch.height == 0:
                continue
            if ch.width <= gd and ch.height <= gd:
                continue
            todo.append(ci)
        if not todo:
            return
        gx_count = -(-self.image.channels[todo[0]].width // gd) \
            if False else None
        # group grid is defined on frame pixels; channel rects derive
        # from the channel's own shifts.  For round-1 all deferred
        # channels share the frame geometry (shift 0).
        sid = (1 + 3 * num_dc_groups + NUM_QUANT_TABLES
               + num_groups * pass_index + group_index)
        first = self.image.channels[todo[0]]
        gx_n = -(-first.width // gd)
        gx0 = (group_index % gx_n) * gd
        gy0 = (group_index // gx_n) * gd
        views = []
        for ci in todo:
            ch = self.image.channels[ci]
            ch.alloc()
            x0, y0 = gx0 >> ch.hshift, gy0 >> ch.vshift
            rw = min(gd >> ch.hshift, ch.width - x0)
            rh = min(gd >> ch.vshift, ch.height - y0)
            if rw <= 0 or rh <= 0:
                continue
            v = Channel(rw, rh, hshift=ch.hshift, vshift=ch.vshift)
            v.data = ch.data[y0:y0 + rh, x0:x0 + rw]
            views.append(v)
        if not views:
            return
        sub = ModularImage(views, nb_meta_channels=0)
        decode_modular_stream(br, sub, stream_id=sid,
                              global_tree=self.gtree,
                              global_code=self.gcode)

    def finalize(self) -> List[np.ndarray]:
        undo_transforms(self.image, self.header)
        return [c.data for c in self.image.channels]

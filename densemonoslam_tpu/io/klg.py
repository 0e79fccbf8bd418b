""".klg log reader/writer (the reference's RawLogReader format:
`GUI/src/Tools/RawLogReader.cpp`, converters `logs/rgbd/Freiburg.cpp`).

Record layout: `int32 numFrames` header, then per frame
`int64 timestamp, int32 depthSize, int32 imageSize, depth..., image...`
with depth zlib-compressed uint16 (or raw) and image JPEG (or raw RGB).
Decoding uses the native codec library when built (`native/framecodec.cpp`),
otherwise the Python fallback.
"""

from __future__ import annotations

import struct
from typing import Optional, Tuple

import numpy as np

from densemonoslam_tpu.io import native


class KlgReader:
    """LogReader-protocol reader for .klg files."""

    def __init__(self, path: str, width: int, height: int, depth_factor: float = 1000.0):
        self.path = path
        self.width = width
        self.height = height
        self.depth_factor = depth_factor
        self.offsets, self.timestamps, self.depth_sizes, self.image_sizes = (
            native.klg_scan(path)
        )
        self._i = 0

    def __len__(self) -> int:
        return len(self.offsets)

    def has_more(self) -> bool:
        return self._i < len(self.offsets)

    def rewind(self) -> None:
        self._i = 0

    def fast_forward(self, frame: int) -> None:
        self._i = min(frame, len(self.offsets))

    def get_next(self):
        i = self._i
        self._i += 1
        depth, rgb = native.klg_read_frame(
            self.path,
            int(self.offsets[i]),
            int(self.depth_sizes[i]),
            int(self.image_sizes[i]),
            self.width,
            self.height,
        )
        if rgb is None:
            rgb = np.zeros((self.height, self.width, 3), np.uint8)
        return rgb, depth.astype(np.float32) / self.depth_factor, float(self.timestamps[i])


def write_klg(
    path: str,
    frames,  # iterable of (rgb u8 [H,W,3], depth u16 [H,W], timestamp int)
    compress: bool = True,
    jpeg_quality: int = 90,
) -> int:
    """Write a .klg log (the converter role of `logs/rgbd/Freiburg.cpp`).
    Returns the number of frames written."""
    records = []
    for rgb, depth, ts in frames:
        depth = np.ascontiguousarray(depth, np.uint16)
        rgb = np.ascontiguousarray(rgb, np.uint8)
        if compress:
            dbytes = native.zlib_compress(depth)
            ibytes = native.jpeg_encode(rgb, jpeg_quality)
        else:
            dbytes = depth.tobytes()
            ibytes = rgb.tobytes()
        records.append((int(ts), dbytes, ibytes))
    with open(path, "wb") as f:
        f.write(struct.pack("<i", len(records)))
        for ts, dbytes, ibytes in records:
            f.write(struct.pack("<qii", ts, len(dbytes), len(ibytes)))
            f.write(dbytes)
            f.write(ibytes)
    return len(records)

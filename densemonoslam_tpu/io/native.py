"""ctypes bindings for the native frame codec/transport library.

The reference's IO runtime (klg decode, zlib/JPEG codecs, LCM transport) is
C++; ours lives in `native/framecodec.cpp` and is loaded here via ctypes (no
pybind11 in the deployment image).  Every entry point has a pure-Python
fallback (zlib module + PIL) so the framework works before `make -C native`
has run; `HAVE_NATIVE` tells callers which path is active.
"""

from __future__ import annotations

import ctypes
import os
import zlib
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libframecodec.so",
)

_lib = None
if os.path.exists(_LIB_PATH):
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
        _lib.dms_zlib_compress.restype = ctypes.c_long
        _lib.dms_zlib_decompress.restype = ctypes.c_long
        _lib.dms_jpeg_decode.restype = ctypes.c_int
        _lib.dms_jpeg_encode.restype = ctypes.c_long
        _lib.dms_klg_scan.restype = ctypes.c_long
        _lib.dms_klg_read_frame.restype = ctypes.c_int
        # async prefetch executor (newer library builds; probe defensively so
        # a stale libframecodec.so keeps the codec entry points working)
        try:
            _lib.dms_prefetch_open.restype = ctypes.c_void_p
            _lib.dms_prefetch_open.argtypes = [
                ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
                ctypes.c_int,
            ]
            _lib.dms_prefetch_next.restype = ctypes.c_long
            _lib.dms_prefetch_next.argtypes = [
                ctypes.c_void_p,
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_uint8),
                ctypes.POINTER(ctypes.c_int64),
            ]
            _lib.dms_prefetch_frames.restype = ctypes.c_long
            _lib.dms_prefetch_frames.argtypes = [ctypes.c_void_p]
            _lib.dms_prefetch_close.restype = None
            _lib.dms_prefetch_close.argtypes = [ctypes.c_void_p]
            _HAVE_PREFETCH = True
        except AttributeError:
            _HAVE_PREFETCH = False
    except OSError:
        _lib = None
        _HAVE_PREFETCH = False
else:
    _HAVE_PREFETCH = False

HAVE_NATIVE = _lib is not None


def _buf(arr: np.ndarray):
    return arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))


def zlib_compress(data: np.ndarray) -> bytes:
    raw = np.ascontiguousarray(data).view(np.uint8).reshape(-1)
    if _lib is not None:
        cap = len(raw) + len(raw) // 2 + 64
        out = np.empty(cap, np.uint8)
        n = _lib.dms_zlib_compress(_buf(raw), len(raw), _buf(out), cap)
        if n > 0:
            return out[:n].tobytes()
    return zlib.compress(raw.tobytes(), 1)


def zlib_decompress(data: bytes, out_bytes: int) -> np.ndarray:
    if _lib is not None:
        src = np.frombuffer(data, np.uint8)
        out = np.empty(out_bytes, np.uint8)
        n = _lib.dms_zlib_decompress(_buf(src), len(src), _buf(out), out_bytes)
        if n == out_bytes:
            return out
    return np.frombuffer(zlib.decompress(data), np.uint8).copy()


def jpeg_encode(rgb: np.ndarray, quality: int = 90) -> bytes:
    h, w, _ = rgb.shape
    rgb = np.ascontiguousarray(rgb, np.uint8)
    if _lib is not None:
        cap = w * h * 3 + 4096
        out = np.empty(cap, np.uint8)
        n = _lib.dms_jpeg_encode(_buf(rgb.reshape(-1)), w, h, quality, _buf(out), cap)
        if n > 0:
            return out[:n].tobytes()
    import io

    from PIL import Image

    b = io.BytesIO()
    Image.fromarray(rgb).save(b, "JPEG", quality=quality)
    return b.getvalue()


def jpeg_decode(data: bytes, max_w: int = 4096, max_h: int = 4096) -> np.ndarray:
    if _lib is not None:
        src = np.frombuffer(data, np.uint8)
        out = np.empty(max_w * max_h * 3, np.uint8)
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = _lib.dms_jpeg_decode(
            _buf(src), len(src), _buf(out), max_w, max_h,
            ctypes.byref(w), ctypes.byref(h),
        )
        if rc == 0:
            return out[: w.value * h.value * 3].reshape(h.value, w.value, 3).copy()
    import io

    from PIL import Image

    return np.asarray(Image.open(io.BytesIO(data)).convert("RGB"), np.uint8)


def klg_scan(path: str, max_frames: int = 100000):
    """Scan a .klg log; returns (offsets, timestamps, depth_sizes, image_sizes)."""
    if _lib is not None:
        offs = np.zeros(max_frames, np.int64)
        ts = np.zeros(max_frames, np.int64)
        ds = np.zeros(max_frames, np.int32)
        iz = np.zeros(max_frames, np.int32)
        n = _lib.dms_klg_scan(
            path.encode(),
            offs.ctypes.data_as(ctypes.POINTER(ctypes.c_long)),
            ts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            ds.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            iz.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_frames,
        )
        if n >= 0:
            return offs[:n], ts[:n], ds[:n], iz[:n]
    # python fallback
    offs, ts, ds, iz = [], [], [], []
    with open(path, "rb") as f:
        f.read(4)  # frame count header
        while True:
            off = f.tell()
            head = f.read(16)
            if len(head) < 16:
                break
            t = int.from_bytes(head[0:8], "little", signed=True)
            d = int.from_bytes(head[8:12], "little", signed=True)
            i = int.from_bytes(head[12:16], "little", signed=True)
            offs.append(off)
            ts.append(t)
            ds.append(d)
            iz.append(i)
            f.seek(d + i, 1)
    return (
        np.asarray(offs, np.int64),
        np.asarray(ts, np.int64),
        np.asarray(ds, np.int32),
        np.asarray(iz, np.int32),
    )


def klg_read_frame(
    path: str,
    offset: int,
    depth_size: int,
    image_size: int,
    width: int,
    height: int,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """Read + decode one klg frame -> (depth u16 [H,W], rgb u8 [H,W,3] or None)."""
    depth_bytes = width * height * 2
    if _lib is not None:
        depth = np.empty(depth_bytes, np.uint8)
        rgb = np.empty(width * height * 3, np.uint8)
        rc = _lib.dms_klg_read_frame(
            path.encode(), offset, depth_size, image_size,
            _buf(depth), depth_bytes, _buf(rgb), width * height * 3,
            width, height,
        )
        if rc == 0:
            d = depth.view(np.uint16).reshape(height, width).copy()
            r = (
                rgb.reshape(height, width, 3).copy() if image_size > 0 else None
            )
            return d, r
    with open(path, "rb") as f:
        f.seek(offset + 16)
        dbuf = f.read(depth_size)
        ibuf = f.read(image_size)
    if depth_size == depth_bytes:
        d = np.frombuffer(dbuf, np.uint16).reshape(height, width).copy()
    else:
        d = (
            zlib_decompress(dbuf, depth_bytes)
            .view(np.uint16)
            .reshape(height, width)
        )
    r = None
    if image_size == width * height * 3:
        r = np.frombuffer(ibuf, np.uint8).reshape(height, width, 3).copy()
    elif image_size > 0:
        r = jpeg_decode(ibuf, width, height)
    return d, r


HAVE_PREFETCH = HAVE_NATIVE and _HAVE_PREFETCH


class KlgPrefetcher:
    """Async prefetching .klg executor (native worker pool).

    The reference drains frames from a background LCM receive thread through
    a `CircularBuffer` (`Tools/networking/LcmReceiver.cpp:14-34`,
    `Tools/CircularBuffer.h`); this is the log-replay equivalent: C++ worker
    threads decode zlib depth + JPEG RGB ahead of the consumer into a bounded
    ring, overlapping host decode with device compute.  Frames are delivered
    strictly in order.  Use as a context manager or call `close()`.
    """

    def __init__(
        self,
        path: str,
        width: int,
        height: int,
        n_threads: int = 3,
        ring_slots: int = 8,
    ):
        if not HAVE_PREFETCH:
            raise RuntimeError(
                "native prefetcher unavailable (run `make -C native`)"
            )
        self.width = width
        self.height = height
        self._h = _lib.dms_prefetch_open(
            path.encode(), width, height, n_threads, ring_slots
        )
        if not self._h:
            raise IOError(f"cannot open klg log: {path}")
        self.n_frames = int(_lib.dms_prefetch_frames(self._h))

    def __len__(self) -> int:
        return self.n_frames

    def next(self):
        """Blocking next frame -> (index, depth u16 [H,W], rgb u8 [H,W,3],
        timestamp) or None at end of log.  Raises on decode errors."""
        if self._h is None:
            return None
        depth = np.empty(self.height * self.width * 2, np.uint8)
        rgb = np.empty(self.height * self.width * 3, np.uint8)
        ts = ctypes.c_int64()
        idx = _lib.dms_prefetch_next(
            self._h, _buf(depth), _buf(rgb), ctypes.byref(ts)
        )
        if idx == -1:
            return None
        if idx < 0:
            raise IOError(f"klg prefetch decode error at stream position {idx}")
        return (
            int(idx),
            depth.view(np.uint16).reshape(self.height, self.width),
            rgb.reshape(self.height, self.width, 3),
            int(ts.value),
        )

    def close(self) -> None:
        if self._h is not None:
            _lib.dms_prefetch_close(self._h)
            self._h = None

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __del__(self):  # pragma: no cover - GC safety net
        try:
            self.close()
        except Exception:
            pass

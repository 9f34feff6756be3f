"""Planar YUV file I/O (reference behavior: src/yuv_io.c).

Reads/writes raw planar 4:2:0 or 4:0:0 frames, 8-bit or 10-bit little-
endian 16-bit containers, with frame seek.
"""

from __future__ import annotations

import numpy as np


def frame_size_bytes(width: int, height: int, bitdepth: int,
                     chroma420: bool) -> int:
    pix = width * height
    if chroma420:
        pix += pix // 2
    return pix * (2 if bitdepth > 8 else 1)


def read_frames(path: str, width: int, height: int, bitdepth: int = 8,
                chroma420: bool = True, max_frames: int | None = None,
                skip: int = 0):
    """Yield (y, cb, cr) numpy arrays per frame (cb/cr None for 4:0:0)."""
    dtype = np.uint16 if bitdepth > 8 else np.uint8
    fsz = frame_size_bytes(width, height, bitdepth, chroma420)
    n = 0
    with open(path, "rb") as f:
        if skip:
            f.seek(skip * fsz)
        while max_frames is None or n < max_frames:
            buf = f.read(fsz)
            if len(buf) < fsz:
                return
            arr = np.frombuffer(buf, dtype=dtype)
            y = arr[:width * height].reshape(height, width)
            cb = cr = None
            if chroma420:
                cw, ch = width // 2, height // 2
                o = width * height
                cb = arr[o:o + cw * ch].reshape(ch, cw)
                cr = arr[o + cw * ch:].reshape(ch, cw)
            yield y, cb, cr
            n += 1


def write_frame(f, y: np.ndarray, cb=None, cr=None,
                bitdepth: int = 8) -> None:
    dtype = np.uint16 if bitdepth > 8 else np.uint8
    f.write(np.ascontiguousarray(y, dtype=dtype).tobytes())
    if cb is not None:
        f.write(np.ascontiguousarray(cb, dtype=dtype).tobytes())
        f.write(np.ascontiguousarray(cr, dtype=dtype).tobytes())

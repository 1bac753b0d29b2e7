"""Dependency-free PNG writer (no cv2/PIL in this environment).

Used by the Grad-CAM defense outputs (reference writes with cv2,
``defenses/gradcam/gradcam.py:324-338``) and the Neural Cleanse trigger
collage (reference ``defenses/neural_cleanse/combine_images.py:1-15``).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np


def write_png(path: str, arr_u8: np.ndarray) -> None:
    """Write an (H, W, 3) uint8 array as an RGB PNG."""
    arr_u8 = np.ascontiguousarray(arr_u8, dtype=np.uint8)
    h, w, c = arr_u8.shape
    assert c == 3, "write_png expects RGB"
    raw = b"".join(b"\x00" + arr_u8[i].tobytes() for i in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)

    def chunk(tag, data):
        return struct.pack(">I", len(data)) + tag + data + struct.pack(
            ">I", zlib.crc32(tag + data) & 0xFFFFFFFF
        )

    with open(path, "wb") as f:
        f.write(b"\x89PNG\r\n\x1a\n")
        f.write(chunk(b"IHDR", ihdr))
        f.write(chunk(b"IDAT", zlib.compress(raw)))
        f.write(chunk(b"IEND", b""))

"""Real PNG pixel codec — pure stdlib ``zlib``/``struct`` + numpy.

Upgrades the multimodal RESIZE path from a content-address stub to a
real pixel transform for PNG payloads (the container ships no PIL/cv2;
PNG is the one mainstream raster format fully decodable with the
stdlib). Supports the common 8-bit color types — grayscale (0), RGB
(2), gray+alpha (4), RGBA (6) — and all five scanline filters
(None/Sub/Up/Average/Paeth, the complete PNG filter set). Palette
images (color type 3) and sub-8-bit depths raise ``PngError`` and the
caller falls back to the deterministic stub arm.

Shapes: decode returns an ``(h, w, channels) uint8`` numpy array;
encode writes filter-0 scanlines (valid, universally readable output —
optimal filtering is a size optimization, not a correctness one).
Unfiltering is sequential per scanline (Up/Average/Paeth reference the
previous row) but vectorized ACROSS each row with numpy, so cost is
O(pixels) with small constants; this runs inside mapInPandas Arrow
batches, never row-at-a-time across the JVM boundary.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class PngError(ValueError):
    """Not a PNG this codec can decode (caller falls back to the stub)."""


def _chunks(payload: bytes):
    i = 8
    while i + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[i:i + 4])
        tag = payload[i + 4:i + 8]
        data = payload[i + 8:i + 8 + ln]
        if len(data) < ln:
            raise PngError("truncated chunk")
        yield tag, data
        i += 12 + ln  # length + tag + data + crc
        if tag == b"IEND":
            return
    raise PngError("missing IEND")


def png_decode(payload: bytes):
    """PNG bytes -> (h, w, channels) uint8 array. Raises PngError for
    anything outside 8-bit gray/RGB/gray-alpha/RGBA or corrupt data."""
    import numpy as np

    if payload[:8] != _SIG:
        raise PngError("bad signature")
    width = height = None
    channels = 0
    idat = bytearray()
    for tag, data in _chunks(payload):
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8 or ctype not in _CHANNELS:
                raise PngError(f"unsupported depth/color {depth}/{ctype}")
            if comp != 0 or filt != 0 or interlace != 0:
                raise PngError("unsupported compression/filter/interlace")
            channels = _CHANNELS[ctype]
        elif tag == b"IDAT":
            idat += data
    if width is None or not idat:
        raise PngError("missing IHDR/IDAT")
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise PngError(f"bad IDAT: {e}") from e
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise PngError("IDAT size mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).copy()
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = line + prev
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth reference the pixel `channels` bytes to
            # the left — sequential in x, vectorized per channel lane
            cur = line
            prev_i = prev.astype(np.int16)
            cur_i = cur.astype(np.int16)
            for x in range(stride):
                a = int(cur_i[x - channels]) if x >= channels else 0
                b = int(prev_i[x])
                if ftype == 1:
                    cur_i[x] = (cur_i[x] + a) & 0xFF
                elif ftype == 3:
                    cur_i[x] = (cur_i[x] + ((a + b) >> 1)) & 0xFF
                else:  # Paeth
                    c = int(prev_i[x - channels]) if x >= channels else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur_i[x] = (cur_i[x] + pred) & 0xFF
            cur = cur_i.astype(np.uint8)
        else:
            raise PngError(f"unknown filter {ftype}")
        out[y] = cur
        prev = out[y]
    return out.reshape(height, width, channels)


def png_encode(pixels) -> bytes:
    """(h, w, channels) uint8 array -> PNG bytes (filter 0, 8-bit)."""
    import numpy as np

    px = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, channels = px.shape
    ctype = {1: 0, 3: 2, 2: 4, 4: 6}[channels]

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    flat = px.reshape(h, w * channels)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (
        _SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def resize_nearest(pixels, new_w: int, new_h: int):
    """Nearest-neighbor resample (the deterministic choice: no float
    kernels, so the output bytes — and their sha — are identical on
    every platform)."""
    import numpy as np

    h, w, _ = pixels.shape
    ys = (np.arange(new_h) * h) // new_h
    xs = (np.arange(new_w) * w) // new_w
    return pixels[ys][:, xs]


def png_resize(payload: bytes, new_w: int, new_h: int) -> bytes:
    """Decode -> nearest-neighbor resize -> re-encode. PngError passes
    through for the caller's stub fallback."""
    return png_encode(resize_nearest(png_decode(payload), new_w, new_h))

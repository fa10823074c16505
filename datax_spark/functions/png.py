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
Unfilter cost: None/Up are whole-row numpy ops; Sub vectorizes to a
wrapping per-lane ``np.add.accumulate``; Average/Paeth genuinely depend
on the decoded left pixel, so they step per PIXEL COLUMN (w Python
iterations per row, all channel lanes vectorized per step) — O(pixels)
work with numpy inner ops, running inside mapInPandas Arrow batches,
never row-at-a-time across the JVM boundary.
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
        elif ftype == 2:  # Up: fully vectorized (uint8 wraps mod 256)
            cur = line + prev
        elif ftype == 1:
            # Sub: out[x] = line[x] + out[x-ch] is a per-channel-lane
            # running sum mod 256 — np.add.accumulate in uint8 wraps
            # exactly, so the whole row vectorizes with zero loops
            lanes = line.reshape(width, channels)
            cur = np.add.accumulate(lanes, axis=0, dtype=np.uint8).reshape(
                stride
            )
        elif ftype in (3, 4):
            # Average/Paeth reference the decoded pixel to the LEFT, so
            # x is sequential — but only per PIXEL COLUMN: each step
            # computes all `channels` lanes at once (w iterations, not
            # w*channels)
            lanes = line.reshape(width, channels).astype(np.int16)
            up = prev.reshape(width, channels).astype(np.int16)
            dec = np.empty((width, channels), dtype=np.int16)
            left = np.zeros(channels, dtype=np.int16)
            if ftype == 3:  # Average
                for x in range(width):
                    dec[x] = (lanes[x] + ((left + up[x]) >> 1)) & 0xFF
                    left = dec[x]
            else:  # Paeth
                ul = np.zeros(channels, dtype=np.int16)
                for x in range(width):
                    p = left + up[x] - ul
                    pa = np.abs(p - left)
                    pb = np.abs(p - up[x])
                    pc = np.abs(p - ul)
                    pred = np.where(
                        (pa <= pb) & (pa <= pc),
                        left,
                        np.where(pb <= pc, up[x], ul),
                    )
                    dec[x] = (lanes[x] + pred) & 0xFF
                    left = dec[x]
                    ul = up[x]
            cur = dec.astype(np.uint8).reshape(stride)
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

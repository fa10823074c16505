"""Pure-stdlib LZO1X codec: raw bitstream + the two container formats
the reference reads transparently
(plugin-unstructured-storage-util/.../UnstructuredStorageReaderUtil.java:118-137):

- ``compress="lzo"``: the lzop container (magic + checksummed header +
  per-block checksums), read there via ExpandLzopInputStream — the
  shevek/lzo-java LzopInputStream with the library-version gate widened
  to 0x2060 (ExpandLzopInputStream.java:42-58);
- ``compress="lzo_deflate"``: the bare anarres block framing
  ([uncompressed_len u32 BE][compressed_len u32 BE][payload] per block,
  stored when the lengths are equal), read there via
  LzoInputStream(new LzoDecompressor1x_safe()).

The bitstream decoder follows the public LZO1X format (lzo's
doc/LZO.FORMAT / the widely-published lzo1x_decompress_safe structure):
instruction bytes select literal runs (length-extended by zero bytes) or
one of four match families — M1 2-byte near match, M2 len 3-8 within
2 KiB, M3 len>=3 within 16 KiB, M4 len>=3 to 48 KiB (high-distance bit
in the instruction) — each match optionally carrying 0-3 trailing
literals in the low bits of its last distance byte; the stream ends at
the M4-coded EOF marker ``11 00 00``.

The companion compressor is a greedy hash-chain matcher emitting the
same grammar (store-mode literal runs when nothing matches). It is NOT
byte-identical to lzop's output — any spec-valid encoding is — but
every stream it emits round-trips through this decoder and through any
conforming LZO1X decoder. Python-speed: suitable for tests/fixtures and
modest files; the READ path is the production surface (one archive per
task, same as the reference's per-file reader split).
"""

from __future__ import annotations

import struct
import zlib


class LzoError(ValueError):
    """Malformed LZO bitstream or container."""


# ---------------------------------------------------------------------------
# LZO1X bitstream
# ---------------------------------------------------------------------------


def lzo1x_decompress(src: bytes, expected_len: int | None = None) -> bytes:
    """Decompress one raw LZO1X stream (safe: all reads bounds-checked)."""
    out = bytearray()
    ip, n = 0, len(src)

    def byte() -> int:
        nonlocal ip
        if ip >= n:
            raise LzoError("truncated LZO stream")
        b = src[ip]
        ip += 1
        return b

    def literals(count: int) -> None:
        nonlocal ip
        if ip + count > n:
            raise LzoError("truncated literal run")
        out.extend(src[ip:ip + count])
        ip += count

    def copy_match(dist: int, length: int) -> None:
        if dist > len(out):
            raise LzoError(
                f"lookbehind overrun: dist {dist} > output {len(out)}"
            )
        start = len(out) - dist
        if dist >= length:
            out.extend(out[start:start + length])
        else:  # overlapping copy replicates byte-at-a-time semantics
            for k in range(length):
                out.append(out[start + k])

    def ext_length(base: int) -> int:
        # zero-extended length: base + 255 per zero byte + final nonzero
        length = 0
        while True:
            b = byte()
            if b:
                return length + base + b
            length += 255

    _EOF = object()

    def do_match(t: int):
        """One match instruction; returns trailing-literal count or _EOF."""
        if t >= 64:  # M2: len 3..8, dist 1..2048
            dist = ((t >> 2) & 7) + (byte() << 3) + 1
            copy_match(dist, (t >> 5) + 1)
            return t & 3
        if t >= 32:  # M3: len >= 3, dist 1..16384
            length = t & 31
            if length == 0:
                length = ext_length(31)
            ds = byte() | (byte() << 8)
            copy_match((ds >> 2) + 1, length + 2)
            return ds & 3
        if t >= 16:  # M4: len >= 3, dist 16385..49151 — or EOF marker
            length = t & 7
            high = (t & 8) << 11
            if length == 0:
                length = ext_length(7)
            ds = byte() | (byte() << 8)
            dist = high + (ds >> 2)
            if dist == 0:
                if length != 1:
                    raise LzoError("bad EOF marker")
                return _EOF
            copy_match(dist + 0x4000, length + 2)
            return ds & 3
        # M1: len 2, dist 1..1024 (only valid after a match's trail)
        dist = (t >> 2) + (byte() << 2) + 1
        copy_match(dist, 2)
        return t & 3

    def match_context(t):
        """Match-context chain: match, trail literals, repeat while the
        previous match carried trailing literals."""
        while True:
            trail = do_match(t)
            if trail is _EOF:
                return _EOF
            if trail == 0:
                return None  # next instruction is literal-run context
            literals(trail)
            t = byte()

    def after_literal_run():
        t = byte()
        if t < 16:  # M1' special: len 3, dist 2049..3072
            dist = 0x801 + (t >> 2) + (byte() << 2)
            copy_match(dist, 3)
            trail = t & 3
            if trail == 0:
                return None
            literals(trail)
            return match_context(byte())
        return match_context(t)

    # ---- first byte is special
    done = False
    t = byte()
    if t > 17:
        literals(t - 17)
        done = (
            match_context(byte()) if t - 17 < 4 else after_literal_run()
        ) is _EOF
    else:
        ip -= 1  # plain instruction — reprocess in the main loop

    while not done:
        t = byte()
        if t < 16:  # literal run, length 4+
            length = ext_length(15) if t == 0 else t
            literals(length + 3)
            done = after_literal_run() is _EOF
        else:
            done = match_context(t) is _EOF

    if ip != n:
        raise LzoError(f"{n - ip} trailing bytes after EOF marker")
    if expected_len is not None and len(out) != expected_len:
        raise LzoError(
            f"decompressed {len(out)} bytes, expected {expected_len}"
        )
    return bytes(out)


def _ext_bytes(value: int) -> bytes:
    """Zero-extension encoding of ``value`` >= 1 (255 per zero byte)."""
    zeros, last = divmod(value - 1, 255)
    return b"\x00" * zeros + bytes([last + 1])


def lzo1x_compress(src: bytes) -> bytes:
    """Greedy LZO1X encoder (hash of 3-byte keys, latest match wins)."""
    n = len(src)
    out = bytearray()
    if n == 0:
        return b"\x11\x00\x00"

    table: dict[bytes, int] = {}
    trail_pos: list[int] = []  # out-index of the last match's trail byte
    first = True

    def emit_literal_block(lits: bytes) -> None:
        """Emit pending literals in whatever form the context allows."""
        nonlocal first, out
        L = len(lits)
        if L == 0:
            first = False
            return
        if first:
            if L <= 238:
                out.append(17 + L)
            else:
                out.append(0)
                out += _ext_bytes(L - 18)
            out += lits
            first = False
            return
        if L <= 3 and trail_pos:
            # ride the previous match's trail bits — the following
            # instruction is then parsed in match context, so the
            # caller must be about to emit a match (or the EOF marker)
            out[trail_pos.pop()] |= L
            out += lits
            return
        # literal-run instruction (length >= 4; 1..3 unreachable here:
        # any non-first gap of <= 3 always has a preceding match)
        if L < 4:
            raise LzoError(f"unencodable literal gap {L}")
        if L - 3 <= 15:
            out.append(L - 3)
        else:
            out.append(0)
            out += _ext_bytes(L - 18)
        out += lits

    def emit_match(dist: int, length: int) -> None:
        nonlocal out
        trail_pos.clear()
        if dist <= 0x800 and length <= 8:
            # M2
            trail_pos.append(len(out))
            out.append(((length - 1) << 5) | (((dist - 1) & 7) << 2))
            out.append((dist - 1) >> 3)
        elif dist <= 0x4000:
            # M3
            lm2 = length - 2
            if lm2 <= 31:
                out.append(32 | lm2)
            else:
                out.append(32)
                out += _ext_bytes(lm2 - 31)
            ds = (dist - 1) << 2
            trail_pos.append(len(out))
            out.append(ds & 0xFF)
            out.append(ds >> 8)
        else:
            # M4 (dist 16385..49151; 16384 itself is M3-only — the
            # all-zero M4 distance is the EOF marker)
            d = dist - 0x4000
            high = 8 if d >= 0x4000 else 0
            rest = d & 0x3FFF
            lm2 = length - 2
            if lm2 <= 7:
                out.append(16 | high | lm2)
            else:
                out.append(16 | high)
                out += _ext_bytes(lm2 - 7)
            ds = rest << 2
            trail_pos.append(len(out))
            out.append(ds & 0xFF)
            out.append(ds >> 8)

    i = 0
    lit_start = 0
    while i + 3 <= n:
        key = src[i:i + 3]
        j = table.get(key)
        table[key] = i
        if j is None:
            i += 1
            continue
        dist = i - j
        if dist > 0xBFFF:
            i += 1
            continue
        # extend the match
        length = 3
        while i + length < n and src[j + length] == src[i + length]:
            length += 1
        emit_literal_block(src[lit_start:i])
        emit_match(dist, length)
        # seed the table through the matched span (cheap, improves runs)
        end = i + length
        for k in range(i + 1, min(end, n - 2)):
            table[src[k:k + 3]] = k
        i = end
        lit_start = end

    tail = src[lit_start:n]
    emit_literal_block(tail)
    out += b"\x11\x00\x00"
    return bytes(out)


# ---------------------------------------------------------------------------
# anarres block framing (compress="lzo_deflate")
# ---------------------------------------------------------------------------

LZO_BLOCK_SIZE = 256 * 1024


def write_lzo_deflate(data: bytes, block_size: int = LZO_BLOCK_SIZE) -> bytes:
    out = bytearray()
    for off in range(0, len(data), block_size) or [0]:
        block = data[off:off + block_size]
        comp = lzo1x_compress(block)
        out += struct.pack(">I", len(block))
        if len(comp) < len(block):
            out += struct.pack(">I", len(comp)) + comp
        else:
            out += struct.pack(">I", len(block)) + block
    return bytes(out)


def read_lzo_deflate(data: bytes) -> bytes:
    out = bytearray()
    off = 0
    while off < len(data):
        if off + 8 > len(data):
            raise LzoError("truncated block header")
        ulen, clen = struct.unpack_from(">II", data, off)
        off += 8
        payload = data[off:off + clen]
        if len(payload) != clen:
            raise LzoError("truncated block payload")
        off += clen
        if clen == ulen:
            out += payload
        else:
            out += lzo1x_decompress(payload, ulen)
    return bytes(out)


# ---------------------------------------------------------------------------
# lzop container (compress="lzo")
# ---------------------------------------------------------------------------

LZOP_MAGIC = b"\x89LZO\x00\r\n\x1a\n"
F_ADLER32_D = 0x01
F_ADLER32_C = 0x02
F_H_EXTRA_FIELD = 0x40
F_CRC32_D = 0x100
F_CRC32_C = 0x200
F_MULTIPART = 0x400
F_H_FILTER = 0x800
F_H_CRC32 = 0x1000
_LZO_LIB_VERSION_MAX = 0x2060  # ExpandLzopInputStream.java:43 widened gate
_METHODS = {1, 2, 3}  # M_LZO1X_1 / _1_15 / _999


def write_lzop(
    data: bytes,
    block_size: int = LZO_BLOCK_SIZE,
    filename: bytes = b"",
) -> bytes:
    """lzop file: checksummed header + adler32-checksummed blocks.
    Deterministic (mode/mtime zeroed) so fixtures are byte-stable."""
    hdr = struct.pack(
        ">HHHBBIIII",
        0x1040,          # lzop version
        0x2060,          # lzo library version
        0x0940,          # lzop version needed to extract
        1,               # method: M_LZO1X_1
        5,               # level
        F_ADLER32_D,     # flags
        0, 0, 0,         # mode, mtime, gmtdiff
    ) + bytes([len(filename)]) + filename
    out = bytearray(LZOP_MAGIC + hdr)
    out += struct.pack(">I", zlib.adler32(hdr))
    for off in range(0, len(data), block_size) or [0]:
        block = data[off:off + block_size]
        comp = lzo1x_compress(block)
        out += struct.pack(">I", len(block))
        if len(comp) < len(block):
            out += struct.pack(">I", len(comp))
            out += struct.pack(">I", zlib.adler32(block))
            out += comp
        else:
            out += struct.pack(">I", len(block))
            out += struct.pack(">I", zlib.adler32(block))
            out += block
    out += struct.pack(">I", 0)  # EOF block
    return bytes(out)


def read_lzop(data: bytes) -> bytes:
    """Parse + verify an lzop file, mirroring ExpandLzopInputStream:
    header checksum verified (adler32 or crc32 per flags), library
    version accepted up to 0x2060, multipart/filter refused, per-block
    uncompressed/compressed checksums verified when present."""
    if data[:9] != LZOP_MAGIC:
        raise LzoError("not an lzop file (bad magic)")
    off = 9

    def take(k: int) -> bytes:
        nonlocal off
        if off + k > len(data):
            raise LzoError("truncated lzop header")
        b = data[off:off + k]
        off += k
        return b

    hdr_start = off
    _version = struct.unpack(">H", take(2))[0]
    libver = struct.unpack(">H", take(2))[0]
    if libver > _LZO_LIB_VERSION_MAX:
        raise LzoError(
            f"compressed with incompatible lzo version 0x{libver:x} "
            f"(max 0x{_LZO_LIB_VERSION_MAX:x})"
        )
    _extract = struct.unpack(">H", take(2))[0]
    method = take(1)[0]
    if method not in _METHODS:
        raise LzoError(f"invalid lzop method {method}")
    take(1)  # level
    flags = struct.unpack(">I", take(4))[0]
    if flags & F_MULTIPART:
        raise LzoError("multipart lzop not supported")
    if flags & F_H_FILTER:
        raise LzoError("lzop filter not supported")
    take(12)  # mode, mtime, gmtdiff
    fn_len = take(1)[0]
    take(fn_len)
    hdr = data[hdr_start:off]
    want = struct.unpack(">I", take(4))[0]
    got = (
        zlib.crc32(hdr) if flags & F_H_CRC32 else zlib.adler32(hdr)
    ) & 0xFFFFFFFF
    if want != got:
        raise LzoError(
            f"invalid header checksum 0x{got:x} (expected 0x{want:x})"
        )
    if flags & F_H_EXTRA_FIELD:
        ext_len = struct.unpack(">I", take(4))[0]
        take(ext_len + 4)  # field + its checksum (ignored, like lzop 1.08)

    out = bytearray()
    while True:
        ulen = struct.unpack(">I", take(4))[0]
        if ulen == 0:
            break
        clen = struct.unpack(">I", take(4))[0]
        d_adler = d_crc = c_adler = c_crc = None
        if flags & F_ADLER32_D:
            d_adler = struct.unpack(">I", take(4))[0]
        if flags & F_CRC32_D:
            d_crc = struct.unpack(">I", take(4))[0]
        if clen < ulen:  # stored blocks omit the compressed checksums
            if flags & F_ADLER32_C:
                c_adler = struct.unpack(">I", take(4))[0]
            if flags & F_CRC32_C:
                c_crc = struct.unpack(">I", take(4))[0]
        payload = take(clen)
        if c_adler is not None and zlib.adler32(payload) != c_adler:
            raise LzoError("compressed-block adler32 mismatch")
        if c_crc is not None and zlib.crc32(payload) != c_crc:
            raise LzoError("compressed-block crc32 mismatch")
        block = payload if clen == ulen else lzo1x_decompress(payload, ulen)
        if d_adler is not None and zlib.adler32(block) != d_adler:
            raise LzoError("block adler32 mismatch")
        if d_crc is not None and zlib.crc32(block) != d_crc:
            raise LzoError("block crc32 mismatch")
        out += block
    return bytes(out)

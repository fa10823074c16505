"""LZO1X codec (sources/lzo.py): bitstream decode/encode round trips,
hand-built instruction vectors for every match family, and the two
container formats the reference reads
(UnstructuredStorageReaderUtil.java:118-137, ExpandLzopInputStream.java).
No Spark needed — pure stdlib."""

from __future__ import annotations

import random
import struct
import zlib

import pytest

from datax_spark.sources.lzo import (
    LzoError,
    lzo1x_compress,
    lzo1x_decompress,
    read_lzo_deflate,
    read_lzop,
    write_lzo_deflate,
    write_lzop,
)


# ---------------------------------------------------------------------------
# hand-built instruction vectors (independent of our own encoder)
# ---------------------------------------------------------------------------


def test_empty_stream_is_just_the_eof_marker():
    assert lzo1x_decompress(b"\x11\x00\x00") == b""
    assert lzo1x_compress(b"") == b"\x11\x00\x00"


def test_first_byte_literal_form():
    # first byte > 17: t-17 literals
    assert lzo1x_decompress(b"\x16abcde\x11\x00\x00") == b"abcde"


def test_m2_match_vector():
    # 'abc' (first-byte form, t=3 < 4 -> match context), then
    # M2 len 6 dist 3: t = (6-1)<<5 | ((3-1)&7)<<2, next = (3-1)>>3
    v = (
        bytes([17 + 3]) + b"abc"
        + bytes([((6 - 1) << 5) | (((3 - 1) & 7) << 2), (3 - 1) >> 3])
        + b"\x11\x00\x00"
    )
    assert lzo1x_decompress(v) == b"abcabcabc"


def test_m1_match_after_trailing_literal_vector():
    # 'abcd', M2 len 4 dist 4 with trail=1 carrying 'Z', then M1 len 2
    # dist 2 (copies 'dZ'), EOF
    m2 = bytes([((4 - 1) << 5) | (((4 - 1) & 7) << 2) | 1, (4 - 1) >> 3])
    m1 = bytes([((2 - 1) & 3) << 2, 0])
    v = bytes([17 + 4]) + b"abcd" + m2 + b"Z" + m1 + b"\x11\x00\x00"
    assert lzo1x_decompress(v) == b"abcdabcdZdZ"


def test_m1_prime_special_after_literal_run():
    # literal run of 4096 'x' (so a dist-2049 lookbehind exists), then
    # the <16 instruction directly after a literal run is the M1'
    # special: len 3, dist 0x801 + (t>>2) + (next<<2)
    from datax_spark.sources.lzo import _ext_bytes

    lits = b"x" * 4096
    run = b"\x00" + _ext_bytes(4096 - 18) + lits  # 0-ext literal run
    m1p = bytes([0, 0])  # dist 0x801, len 3
    v = run + m1p + b"\x11\x00\x00"
    assert lzo1x_decompress(v) == lits + b"xxx"


def test_truncated_and_overrun_streams_raise():
    with pytest.raises(LzoError, match="truncated"):
        lzo1x_decompress(b"\x16abc")
    # match reaching before the start of output
    bad = bytes([17 + 3]) + b"abc" + bytes([(3 << 5) | (7 << 2), 0xFF])
    with pytest.raises(LzoError, match="lookbehind"):
        lzo1x_decompress(bad + b"\x11\x00\x00")
    with pytest.raises(LzoError, match="expected"):
        lzo1x_decompress(b"\x16abcde\x11\x00\x00", expected_len=99)


# ---------------------------------------------------------------------------
# encoder round trips (exercise every family + extension encodings)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "name,data",
    [
        ("tiny", b"a"),
        ("three", b"abc"),
        ("run", b"a" * 1000),
        ("m2", b"abcabcabcabc"),
        ("long-match-ext", b"pattern!" * 5000),
        ("literal-run-ext", bytes(range(256)) * 4),  # 1024 distinct-ish
        ("first-block-boundary", b"x" * 238),
        ("first-block-over", b"x" * 239),
    ],
)
def test_compress_roundtrip(name, data):
    comp = lzo1x_compress(data)
    assert lzo1x_decompress(comp, len(data)) == data


def test_compress_roundtrip_fuzz():
    rng = random.Random(1234)
    for trial in range(30):
        kind = trial % 3
        n = rng.randrange(0, 30000)
        if kind == 0:
            data = bytes(rng.randrange(256) for _ in range(n))
        elif kind == 1:
            data = bytes(rng.randrange(4) for _ in range(n))  # matchy
        else:
            base = bytes(rng.randrange(256) for _ in range(512))
            data = (base * (n // 512 + 1))[:n]
        comp = lzo1x_compress(data)
        assert lzo1x_decompress(comp, len(data)) == data, (trial, n)


def test_m4_far_distance_roundtrip():
    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(0x9000))
    data = base + base[:500]  # repeat at distance ~0x9000 (> 0x4000)
    assert lzo1x_decompress(lzo1x_compress(data), len(data)) == data


def test_compression_actually_compresses():
    data = (b"the quick brown fox jumps over the lazy dog. " * 500)
    assert len(lzo1x_compress(data)) < len(data) // 5


# ---------------------------------------------------------------------------
# containers
# ---------------------------------------------------------------------------


def test_lzop_container_roundtrip_and_blocks():
    data = b"line one\nline two\n" * 3000
    for bs in (256 * 1024, 1024, 7777):
        assert read_lzop(write_lzop(data, block_size=bs)) == data
    assert read_lzop(write_lzop(b"")) == b""


def test_lzo_deflate_roundtrip():
    data = bytes(random.Random(5).randrange(256) for _ in range(5000))
    for bs in (256 * 1024, 999):
        assert read_lzo_deflate(write_lzo_deflate(data, block_size=bs)) == data


def test_lzop_header_validation():
    good = write_lzop(b"payload payload payload")
    # magic
    with pytest.raises(LzoError, match="magic"):
        read_lzop(b"\x00" + good[1:])
    # header checksum
    corrupt = bytearray(good)
    corrupt[21] ^= 0xFF  # mode field: ignored content, checksummed
    with pytest.raises(LzoError, match="checksum"):
        read_lzop(bytes(corrupt))
    # library version gate (ExpandLzopInputStream widens to 0x2060;
    # above that must refuse like the reference)
    hdr = bytearray(good)
    struct.pack_into(">H", hdr, 11, 0x2070)
    # refresh the header checksum so the version gate is what trips
    body = bytes(hdr[9:9 + 22])  # fixed header fields + fn_len(0)
    struct.pack_into(">I", hdr, 31, zlib.adler32(body))
    with pytest.raises(LzoError, match="incompatible lzo version"):
        read_lzop(bytes(hdr))


def test_lzop_block_checksum_validation():
    good = bytearray(write_lzop(b"checksummed-block " * 200))
    good[-10] ^= 0xFF  # flip a byte inside the last block's payload
    with pytest.raises(LzoError):
        read_lzop(bytes(good))

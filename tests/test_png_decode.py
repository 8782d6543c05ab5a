"""M80 PNG decode: real zlib inflate + filter reconstruction, pinned
against a sequential mirror and structural corruption cases."""

from __future__ import annotations

import struct
import zlib

import pytest

from lawfirm_data_pipeline_spark.operators.multimodal import (
    decode_png_stats,
    synth_png_bytes,
    synth_png_media,
)


def _expected(mid: int) -> tuple[int, int, int]:
    w, h = 4 + mid % 5, 3 + mid % 4
    s = sum(
        (mid * 7 + x * 3 + y * 5) % 256
        + (mid * 11 + x + 2 * y) % 256
        + (mid * 13 + 2 * x + y) % 256
        for x in range(w)
        for y in range(h)
    )
    return w, h, s


def test_png_roundtrip_matches_arithmetic_mirror(spark):
    got = {
        r["media_id"]: (r["width"], r["height"], r["px_sum"])
        for r in decode_png_stats(synth_png_media(spark, n=24)).collect()
    }
    assert got == {mid: _expected(mid) for mid in range(24)}


def test_png_fixture_exercises_all_filters_and_multi_idat(spark):
    # filter byte of scanline y is (id + y) % 5 — with ids 0..23 and
    # h >= 3 every filter type 0..4 occurs; ids % 3 == 0 carry 2 IDATs
    fts = set()
    n_idat = {}
    for mid in range(24):
        raw = synth_png_bytes(mid)
        pos, count = 8, 0
        while pos + 8 <= len(raw):
            ln = struct.unpack_from(">I", raw, pos)[0]
            typ = raw[pos + 4 : pos + 8]
            if typ == b"IDAT":
                count += 1
            pos += 12 + ln
        n_idat[mid] = count
        h = 3 + mid % 4
        fts |= {(mid + y) % 5 for y in range(h)}
    assert fts == {0, 1, 2, 3, 4}
    assert n_idat[0] == 2 and n_idat[3] == 2 and n_idat[1] == 1


def test_png_corrupt_crc_raises(spark):
    raw = bytearray(synth_png_bytes(5))
    # flip a byte inside the IHDR data (after the 8-byte sig + 8-byte
    # length/type) so its stored CRC no longer matches
    raw[17] ^= 0xFF
    media = spark.createDataFrame([(5, bytes(raw))], "media_id long, payload binary")
    with pytest.raises(Exception, match="bad CRC"):
        decode_png_stats(media).collect()


def test_png_truncated_stream_raises(spark):
    # valid chunks but IDAT inflates to the wrong scanline length
    w, h = 4, 3

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    bad = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr) + chunk(
        b"IDAT", zlib.compress(b"\x00" * 10)
    ) + chunk(b"IEND", b"")
    media = spark.createDataFrame([(0, bad)], "media_id long, payload binary")
    with pytest.raises(Exception, match="scanline stream length"):
        decode_png_stats(media).collect()

"""Malformed-input fuzz for the real codec paths (BMP/PNG/WAV).

The decoders' contract is LOUD failure: garbage, wrong-magic, or
truncated payloads must raise (any exception — ValueError from the
explicit guards, or struct/zlib errors from deeper in the parse),
never hang and never return rows.  Silent partial decodes are the
failure mode that poisons a 100 TB media pipeline, so the invariant
worth fuzzing is "no silent success", not a specific message.

Hypothesis drives random byte soups plus structured mutations
(truncations of valid fixtures at arbitrary offsets, magic-preserving
prefixes) — boundary shapes a handwritten corrupt-CRC test misses.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from lawfirm_data_pipeline_spark.operators.multimodal import (
    decode_bmp_stats,
    decode_png_stats,
    decode_wav_stats,
    synth_bmp_bytes,
    synth_png_bytes,
    synth_wav_bytes,
)

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)

_DECODERS = [
    (decode_bmp_stats, synth_bmp_bytes, b"BM"),
    (decode_png_stats, synth_png_bytes, b"\x89PNG\r\n\x1a\n"),
    (decode_wav_stats, synth_wav_bytes, b"RIFF"),
]


def _media(spark, payload: bytes):
    return spark.createDataFrame(
        [(0, payload)], "media_id long, payload binary"
    )


@SLOW
@given(junk=st.binary(min_size=0, max_size=200), which=st.integers(0, 2))
def test_garbage_bytes_never_decode_silently(spark, junk, which):
    decode, synth, magic = _DECODERS[which]
    if junk.startswith(magic[:2]):
        junk = b"\x00\x00" + junk  # keep this strategy on the wrong-magic path
    with pytest.raises(Exception):
        decode(_media(spark, junk)).collect()


@SLOW
@given(
    frac=st.floats(0.05, 0.95),
    mid=st.integers(0, 10),
    which=st.integers(0, 2),
)
def test_truncated_fixture_never_decodes_silently(spark, frac, mid, which):
    decode, synth, magic = _DECODERS[which]
    raw = synth(mid)
    cut = max(1, min(len(raw) - 1, int(len(raw) * frac)))
    with pytest.raises(Exception):
        decode(_media(spark, raw[:cut])).collect()


@SLOW
@given(junk=st.binary(min_size=1, max_size=64), which=st.integers(0, 2))
def test_magic_plus_garbage_never_decodes_silently(spark, junk, which):
    decode, synth, magic = _DECODERS[which]
    with pytest.raises(Exception):
        decode(_media(spark, magic + junk)).collect()


def _framed_blob(texts):
    import struct as _s

    blob = bytearray()
    bounds = [0]
    for i, t in enumerate(texts):
        body = t.encode("utf-8")
        blob += _s.pack(">QI", i, len(body)) + body
        bounds.append(len(blob))
    return bytes(blob), set(bounds)


@SLOW
@given(
    texts=st.lists(st.text(min_size=0, max_size=20), min_size=1, max_size=4),
    frac=st.floats(0.01, 0.99),
)
def test_record_stream_truncation_raises_off_boundary(spark, texts, frac):
    """A cut INSIDE a frame must raise (truncated frame / short
    header); a cut exactly ON a record boundary is a valid shorter
    stream — undetectable in any length-prefixed format without a
    trailer (real WARC included), so it is excluded, not asserted."""
    from lawfirm_data_pipeline_spark.operators.ingest import parse_record_stream

    blob, bounds = _framed_blob(texts)
    cut = max(1, min(len(blob) - 1, int(len(blob) * frac)))
    if cut in bounds:
        return
    df = spark.createDataFrame([(0, blob[:cut])], "file_id long, blob binary")
    with pytest.raises(Exception):
        parse_record_stream(df).collect()


@SLOW
@given(junk=st.binary(min_size=0, max_size=120), frac=st.floats(0.05, 0.95))
def test_zlib_garbage_and_truncation_raise(spark, junk, frac):
    import zlib

    from lawfirm_data_pipeline_spark.operators.ingest import (
        gzip_decompress_stats,
    )

    good = zlib.compress(b"the quick brown fox jumps over the lazy dog" * 3, 6)
    cut = max(1, min(len(good) - 1, int(len(good) * frac)))
    for payload in (junk, good[:cut]):
        try:
            zlib.decompress(payload)
            continue  # astronomically unlikely: junk IS a valid stream
        except zlib.error:
            pass
        df = spark.createDataFrame([(0, payload)], "doc_id long, payload binary")
        with pytest.raises(Exception):
            gzip_decompress_stats(df).collect()

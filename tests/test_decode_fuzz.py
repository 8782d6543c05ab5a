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

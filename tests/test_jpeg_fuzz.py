"""Baseline-JPEG decoder fuzz + independent-mirror tests (q295).

Three independent checks, matching the decode-fuzz contract of the
BMP/PNG/WAV legs plus the shared-derivation mirror discipline:

1. AC-path mirror: entropy streams with arbitrary NONZERO AC
   coefficients (run lengths, ZRL, EOB positions) are hand-encoded by
   a test-local encoder, decoded by the engine, and compared against
   an O(N^4) DIRECT-formula IDCT mirror (the textbook double sum —
   a different factorization from the decoder's matrix form, so a
   transform bug cannot cancel).
2. Truncation/corruption loud-fail: every strict prefix of a valid
   payload must raise, never return rows (silent partial decodes are
   the multimodal fuzz family's target bug class).
3. Profile guards: progressive (SOF2), multi-component SOF0, restart
   intervals, 16-bit quant tables all raise with a named reason.
"""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lawfirm_data_pipeline_spark.operators.multimodal import (
    _JPEG_AC_BITS,
    _JPEG_AC_VALS,
    _JPEG_DC_BITS,
    _JPEG_DC_VALS,
    _JPEG_ZIGZAG,
    _JpegBitWriter,
    _jpeg_canonical_codes,
    decode_jpeg_bytes,
    synth_jpeg_bytes,
)


def _encode_blocks(w: int, h: int, blocks: list[np.ndarray], quant: list[int]) -> bytes:
    """Test-local baseline encoder for ARBITRARY quantized coefficient
    blocks (natural order int arrays): the AC path the synth payloads
    (constant blocks, all-zero AC) never exercise."""
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _JpegBitWriter()
    pred = 0
    for coef in blocks:
        dc = int(coef[0])
        diff = dc - pred
        pred = dc
        size = abs(diff).bit_length() if diff else 0
        code, ln = dc_codes[size]
        bw.put(code, ln)
        if size:
            bw.put(diff if diff > 0 else diff - 1 + (1 << size), size)
        zz = [int(coef[_JPEG_ZIGZAG[k]]) for k in range(64)]
        k = 1
        while k < 64:
            run = 0
            while k < 64 and zz[k] == 0:
                run += 1
                k += 1
            if k == 64:
                code, ln = ac_codes[0x00]  # EOB
                bw.put(code, ln)
                break
            while run >= 16:
                code, ln = ac_codes[0xF0]  # ZRL
                bw.put(code, ln)
                run -= 16
            v = zz[k]
            size = abs(v).bit_length()
            code, ln = ac_codes[(run << 4) | size]
            bw.put(code, ln)
            bw.put(v if v > 0 else v - 1 + (1 << size), size)
            k += 1
        else:
            pass
    scan = bw.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zzq = bytes(quant[_JPEG_ZIGZAG[k]] for k in range(64))
    out = b"\xff\xd8"
    out += seg(0xFFDB, b"\x00" + zzq)
    out += seg(0xFFC0, struct.pack(">BHHB", 8, h, w, 1) + b"\x01\x11\x00")
    out += seg(0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
    out += seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
    out += seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
    return out + scan + b"\xff\xd9"


def _idct_direct(coef: np.ndarray, quant: list[int]) -> np.ndarray:
    """Textbook O(N^4) inverse DCT (T.81 A.3.3 double sum) — an
    independent factorization of the decoder's matrix-form IDCT."""
    deq = coef.astype(np.float64).reshape(8, 8) * np.array(quant, dtype=np.float64).reshape(8, 8)
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv * deq[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s / 4.0
    return np.clip(np.floor(out + 128.0 + 0.5), 0, 255).astype(np.uint8)


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_ac_coefficients_match_direct_idct_mirror(data):
    rng_seed = data.draw(st.integers(0, 2**31 - 1))
    rng = np.random.default_rng(rng_seed)
    nblocks = data.draw(st.integers(1, 4))
    quant = [8] + [int(q) for q in rng.integers(1, 32, 63)]
    blocks = []
    for _ in range(nblocks):
        coef = np.zeros(64, dtype=np.int64)
        coef[0] = int(rng.integers(-128, 128))
        # sparse ACs incl. deliberately long zero runs (ZRL coverage)
        for pos in rng.choice(np.arange(1, 64), size=int(rng.integers(0, 6)), replace=False):
            coef[pos] = int(rng.integers(-64, 64)) or 1
        blocks.append(coef)
    w, h = 8 * nblocks, 8
    raw = _encode_blocks(w, h, blocks, quant)
    img = decode_jpeg_bytes(raw)
    want = np.hstack([_idct_direct(c, quant) for c in blocks])
    assert img.shape == (8, w)
    assert (img == want).all()


def test_truncation_always_raises_never_partial():
    raw = synth_jpeg_bytes(7)
    # EVERY strict prefix must raise — no step that could skip the
    # cuts just before EOI (the r10 ADVICE finding: step-7 sampling
    # missed len-2/len-1, where the image is complete but EOI absent).
    for cut in range(2, len(raw)):
        with pytest.raises(ValueError):
            decode_jpeg_bytes(raw[:cut])


def test_bitflip_in_scan_raises_or_changes_sum():
    """A flipped byte inside the entropy stream must either raise or
    change the decoded content — never a silent identical result."""
    raw = bytearray(synth_jpeg_bytes(3))
    base = decode_jpeg_bytes(bytes(raw)).sum(dtype="int64")
    sos = bytes(raw).find(b"\xff\xda")
    pos = sos + 10  # inside entropy data
    raw[pos] ^= 0x55
    try:
        got = decode_jpeg_bytes(bytes(raw)).sum(dtype="int64")
    except ValueError:
        return
    assert got != base


def test_unsupported_profiles_raise_named():
    raw = synth_jpeg_bytes(1)
    prog = raw.replace(b"\xff\xc0", b"\xff\xc2", 1)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_bytes(prog)
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_bytes(b"\x00\x01" + raw[2:])
    # 3-component SOF0 (dims + per-component specs)
    sof = struct.pack(">BHHB", 8, 8, 8, 3) + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    multi = (
        b"\xff\xd8"
        + struct.pack(">HH", 0xFFC0, len(sof) + 2)
        + sof
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="single-component"):
        decode_jpeg_bytes(multi)
    dri = b"\xff\xd8" + struct.pack(">HHH", 0xFFDD, 4, 8) + raw[2:]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg_bytes(dri)


def test_edge_clipped_dimensions():
    """Non-multiple-of-8 dims: MCU grid covers ceil(w/8) x ceil(h/8),
    decoded image is clipped to (h, w) exactly."""
    blocks = [np.zeros(64, dtype=np.int64) for _ in range(2)]
    blocks[0][0] = 10
    blocks[1][0] = -20
    raw = _encode_blocks(12, 8, blocks, [8] + [16] * 63)
    img = decode_jpeg_bytes(raw)
    assert img.shape == (8, 12)
    assert (img[:, :8] == 138).all() and (img[:, 8:] == 108).all()


def test_zrl_past_63_raises():
    """A spec-invalid scan whose ZRL run crosses coefficient 63 must
    raise, not silently exit the AC loop as if EOB (r10 review)."""
    dc_codes = _jpeg_canonical_codes(_JPEG_DC_BITS, _JPEG_DC_VALS)
    ac_codes = _jpeg_canonical_codes(_JPEG_AC_BITS, _JPEG_AC_VALS)
    bw = _JpegBitWriter()
    code, ln = dc_codes[0]
    bw.put(code, ln)  # DC diff 0
    for _ in range(4):  # k: 1 -> 17 -> 33 -> 49 -> 65
        code, ln = ac_codes[0xF0]
        bw.put(code, ln)
    scan = bw.flush()

    def seg(marker, payload):
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    zzq = bytes([8] + [16] * 63)
    raw = (
        b"\xff\xd8"
        + seg(0xFFDB, b"\x00" + bytes(zzq[_JPEG_ZIGZAG[k]] for k in range(64)))
        + seg(0xFFC0, struct.pack(">BHHB", 8, 8, 8, 1) + b"\x01\x11\x00")
        + seg(0xFFC4, b"\x00" + bytes(_JPEG_DC_BITS) + bytes(_JPEG_DC_VALS))
        + seg(0xFFC4, b"\x10" + bytes(_JPEG_AC_BITS) + bytes(_JPEG_AC_VALS))
        + seg(0xFFDA, b"\x01\x01\x00\x00\x3f\x00")
        + scan
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="ZRL"):
        decode_jpeg_bytes(raw)


def test_bit_accumulators_stay_bounded():
    """The reader/writer accumulators must not grow with stream length
    (the unmasked-bigint O(n^2) regression, r10 review): after every
    operation the residual accumulator holds < 16 bits."""
    from lawfirm_data_pipeline_spark.operators.multimodal import _JpegBitReader

    bw = _JpegBitWriter()
    for i in range(5000):
        bw.put(i & 0x3FF, 10)
        assert bw.acc.bit_length() <= 16
    data = bw.flush()
    br = _JpegBitReader(data, 0)
    for _ in range(3000):
        br.read(10)
        assert br.acc.bit_length() <= 16

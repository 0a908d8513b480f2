"""Unit tests for the REAL baseline JPEG codec (pipeline/jpegcodec.py):
coefficient-level Huffman/zigzag/run-length/stuffing round-trips, the
IDCT against a brute-force reference, DC-only pixel exactness (the
property the driver oracle leans on), marker-walk robustness (APPn/COM
skipping, split DQT/DHT segments), and error paths (progressive SOF,
restart intervals, truncated streams)."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from hive_clone_spark.pipeline.jpegcodec import (
    _A,
    ZIGZAG,
    decode_jpeg,
    decode_jpeg_coeffs,
    encode_jpeg,
    synth_jpeg,
)


def _random_planes(rng, hb, wb, ncomp):
    planes = []
    for _ in range(ncomp):
        pl = np.zeros((hb, wb, 64), dtype=np.int64)
        for by in range(hb):
            for bx in range(wb):
                pl[by, bx, 0] = rng.integers(-1023, 1024)
                nz = int(rng.integers(0, 20))
                idx = rng.choice(np.arange(1, 64), size=nz, replace=False)
                pl[by, bx, idx] = rng.integers(-1023, 1024, size=nz)
        planes.append(pl)
    return planes


@pytest.mark.parametrize("ncomp", [1, 3])
def test_coefficient_roundtrip(ncomp):
    """Quantized coefficients survive encode->entropy-decode exactly:
    pins canonical Huffman codes, DC prediction, run/size AC coding,
    ZRL, EOB, zigzag, and 0xFF byte stuffing at once."""
    rng = np.random.default_rng(11 + ncomp)
    for _ in range(10):
        hb, wb = int(rng.integers(1, 6)), int(rng.integers(1, 6))
        planes = _random_planes(rng, hb, wb, ncomp)
        payload = encode_jpeg(planes, 8 * wb, 8 * hb)
        out, w, h, quants, samp = decode_jpeg_coeffs(payload)
        assert (w, h) == (8 * wb, 8 * hb)
        assert len(out) == ncomp
        for a, b in zip(planes, out):
            np.testing.assert_array_equal(a, b)


def test_stuffed_ff_bytes_occur_and_roundtrip():
    """With enough random blocks the entropy stream contains 0xFF bytes
    (stuffed as FF 00); assert stuffing actually happened so the
    destuffing path is provably exercised."""
    for seed in range(32):
        rng = np.random.default_rng(seed)
        planes = _random_planes(rng, 6, 6, 1)
        payload = encode_jpeg(planes, 48, 48)
        sos = payload.index(b"\xff\xda")
        if b"\xff\x00" in payload[sos:]:
            break
    else:
        pytest.fail("no seed produced a stuffed byte in entropy data")
    out, _, _, _, _ = decode_jpeg_coeffs(payload)
    np.testing.assert_array_equal(planes[0], out[0])


def test_idct_matches_bruteforce_reference():
    rng = np.random.default_rng(5)
    F0 = rng.integers(-200, 200, size=(8, 8)).astype(np.float64)
    fast = np.einsum("ux,uv,vy->xy", _A, F0, _A)
    ref = np.zeros((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / math.sqrt(2) if u == 0 else 1.0
                    cv = 1 / math.sqrt(2) if v == 0 else 1.0
                    s += (
                        0.25 * cu * cv * F0[u, v]
                        * math.cos((2 * x + 1) * u * math.pi / 16)
                        * math.cos((2 * y + 1) * v * math.pi / 16)
                    )
            ref[x, y] = s
    assert np.abs(fast - ref).max() < 1e-9


def test_dc_only_block_is_exact_constant():
    """A DC-only block reconstructs to 128 + DC*Q00/8 exactly — the
    invariant the driver entry's SQL oracle is built on (Q00=16)."""
    for dc in range(-8, 9):
        pl = np.zeros((1, 1, 64), dtype=np.int64)
        pl[0, 0, 0] = dc
        pix = decode_jpeg(encode_jpeg([pl], 8, 8))
        assert pix.shape == (8, 8, 1)
        assert (pix == 128 + 2 * dc).all()


def test_synth_fixture_shapes_and_channels():
    gray = decode_jpeg(synth_jpeg(4))
    ycc = decode_jpeg(synth_jpeg(5))
    assert gray.shape[2] == 1 and ycc.shape[2] == 3
    assert gray.shape == (8 * (1 + (4 * 3) % 6), 8 * (1 + 4 % 8), 1)
    assert ycc.shape == (8 * (1 + (5 * 3) % 6), 8 * (1 + 5 % 8), 3)
    # doc_id % 4 == 3 -> 4:2:0 with 16px tiles: 7 -> cw=1+7%3=2, ch=1+1%3=2
    sub, samp = decode_jpeg(synth_jpeg(7), with_sampling=True)
    assert samp == [(2, 2), (1, 1), (1, 1)]
    assert sub.shape == (32, 32, 3)


def test_420_coefficient_roundtrip():
    """4:2:0 MCU interleave survives encode->entropy-decode exactly:
    2x2 luma blocks then one block per chroma, per MCU, with per-
    component DC prediction chains crossing MCU boundaries."""
    rng = np.random.default_rng(77)
    for _ in range(6):
        mx, my = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        luma = _random_planes(rng, 2 * my, 2 * mx, 1)[0]
        cb = _random_planes(rng, my, mx, 1)[0]
        cr = _random_planes(rng, my, mx, 1)[0]
        payload = encode_jpeg(
            [luma, cb, cr], 16 * mx, 16 * my,
            sampling=[(2, 2), (1, 1), (1, 1)],
        )
        out, w, h, _, samp = decode_jpeg_coeffs(payload)
        assert (w, h) == (16 * mx, 16 * my)
        assert samp == [(2, 2), (1, 1), (1, 1)]
        for a, b in zip([luma, cb, cr], out):
            np.testing.assert_array_equal(a, b)


def test_420_mcu_pixels_match_bruteforce():
    """One 4:2:0 MCU with full random AC content: the decoded pixels
    equal an independent brute-force composition — per-block IDCT,
    2x2 chroma replication, JFIF color conversion."""
    from hive_clone_spark.pipeline.jpegcodec import QUANT_LUMA

    rng = np.random.default_rng(41)
    luma = _random_planes(rng, 2, 2, 1)[0] % 16  # small coeffs: no clamp
    cb = _random_planes(rng, 1, 1, 1)[0] % 8
    cr = _random_planes(rng, 1, 1, 1)[0] % 8
    luma[:, :, 0] = rng.integers(-8, 9, size=(2, 2))
    cb[0, 0, 0] = rng.integers(-3, 4)
    cr[0, 0, 0] = rng.integers(-3, 4)
    payload = encode_jpeg(
        [luma, cb, cr], 16, 16, sampling=[(2, 2), (1, 1), (1, 1)]
    )
    pix = decode_jpeg(payload).astype(np.int64)

    def idct_plane(plane):
        hb, wb = plane.shape[:2]
        deq = (plane * QUANT_LUMA[None, None, :]).astype(np.float64)
        deq = deq.reshape(hb, wb, 8, 8)
        px = np.einsum("ux,ijuv,vy->ijxy", _A, deq, _A)
        px = np.floor(px + 0.5) + 128.0
        return px.transpose(0, 2, 1, 3).reshape(hb * 8, wb * 8)

    y = idct_plane(luma)
    cbp = np.repeat(np.repeat(idct_plane(cb), 2, axis=0), 2, axis=1)
    crp = np.repeat(np.repeat(idct_plane(cr), 2, axis=0), 2, axis=1)
    exp_r = np.floor(y + 1.402 * (crp - 128.0) + 0.5)
    exp_g = np.floor(
        y - 0.344136 * (cbp - 128.0) - 0.714136 * (crp - 128.0) + 0.5
    )
    exp_b = np.floor(y + 1.772 * (cbp - 128.0) + 0.5)
    exp = np.clip(np.stack([exp_r, exp_g, exp_b], axis=-1), 0, 255)
    np.testing.assert_array_equal(pix, exp.astype(np.int64))


def test_444_bitstream_unchanged_by_sampling_support():
    """Default-sampling encode must stay byte-identical to the old
    1x1-only encoder (the MCU generalization is a pure superset)."""
    rng = np.random.default_rng(3)
    planes = _random_planes(rng, 2, 3, 3)
    a = encode_jpeg(planes, 24, 16)
    b = encode_jpeg(planes, 24, 16, sampling=[(1, 1)] * 3)
    assert a == b


def test_color_conversion_against_reference():
    """Nonzero flat chroma: decoded RGB equals the JFIF conversion of
    the known Y/Cb/Cr constants (floor(x+0.5) rounding)."""
    luma = np.zeros((1, 1, 64), dtype=np.int64)
    cb = np.zeros((1, 1, 64), dtype=np.int64)
    cr = np.zeros((1, 1, 64), dtype=np.int64)
    luma[0, 0, 0], cb[0, 0, 0], cr[0, 0, 0] = 5, -3, 2
    pix = decode_jpeg(encode_jpeg([luma, cb, cr], 8, 8)).astype(np.int64)
    y, cbv, crv = 128 + 10, 128 - 6, 128 + 4
    exp_r = math.floor(y + 1.402 * (crv - 128) + 0.5)
    exp_g = math.floor(y - 0.344136 * (cbv - 128) - 0.714136 * (crv - 128) + 0.5)
    exp_b = math.floor(y + 1.772 * (cbv - 128) + 0.5)
    assert (pix[:, :, 0] == exp_r).all()
    assert (pix[:, :, 1] == exp_g).all()
    assert (pix[:, :, 2] == exp_b).all()


def test_unknown_app_and_com_segments_skipped():
    """Decoder must walk over APPn/COM segments it doesn't understand
    (every real camera/exporter inserts them)."""
    pl = np.zeros((1, 2, 64), dtype=np.int64)
    pl[0, :, 0] = [3, -4]
    payload = encode_jpeg([pl], 16, 8)
    extra = (
        b"\xff\xee" + struct.pack(">H", 8) + b"Adobe!"  # APP14-ish
        + b"\xff\xfe" + struct.pack(">H", 9) + b"comment"  # COM
    )
    patched = payload[:2] + extra + payload[2:]
    out, w, h, _, _ = decode_jpeg_coeffs(patched)
    np.testing.assert_array_equal(out[0], pl)


def test_progressive_sof_rejected():
    pl = np.zeros((1, 1, 64), dtype=np.int64)
    payload = bytearray(encode_jpeg([pl], 8, 8))
    payload[payload.index(b"\xff\xc0") + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg_coeffs(bytes(payload))


def test_restart_interval_rejected_when_nonzero():
    pl = np.zeros((1, 1, 64), dtype=np.int64)
    payload = encode_jpeg([pl], 8, 8)
    dri = b"\xff\xdd" + struct.pack(">H", 4) + struct.pack(">H", 2)
    patched = payload[:2] + dri + payload[2:]
    with pytest.raises(ValueError, match="restart"):
        decode_jpeg_coeffs(patched)


def test_missing_soi_rejected():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_coeffs(b"\x00\x00junk")


def test_truncated_entropy_stream_raises():
    rng = np.random.default_rng(9)
    planes = _random_planes(rng, 4, 4, 1)
    payload = encode_jpeg(planes, 32, 32)
    # chop the tail of the entropy data (before EOI)
    with pytest.raises(ValueError):
        decode_jpeg_coeffs(payload[: len(payload) // 2])


def test_dequant_uses_in_file_table():
    """Doubling Q00 in the file's DQT doubles the reconstructed offset:
    proves dequantization reads the FILE's table, not a constant."""
    pl = np.zeros((1, 1, 64), dtype=np.int64)
    pl[0, 0, 0] = 3
    payload = bytearray(encode_jpeg([pl], 8, 8))
    dqt = payload.index(b"\xff\xdb")
    assert payload[dqt + 5] == 16  # zigzag[0] slot of the table
    payload[dqt + 5] = 32
    pix = decode_jpeg(bytes(payload))
    assert (pix == 128 + 2 * 3 * 2).all()


def test_422_coefficient_roundtrip_and_pixels():
    """4:2:2 (2x1 luma sampling) rides the same generalized MCU
    machinery: coefficients roundtrip and chroma replicates
    horizontally only."""
    rng = np.random.default_rng(55)
    mx, my = 2, 3
    luma = _random_planes(rng, my, 2 * mx, 1)[0]
    cb = _random_planes(rng, my, mx, 1)[0]
    cr = _random_planes(rng, my, mx, 1)[0]
    payload = encode_jpeg(
        [luma, cb, cr], 16 * mx, 8 * my, sampling=[(2, 1), (1, 1), (1, 1)]
    )
    out, w, h, _, samp = decode_jpeg_coeffs(payload)
    assert (w, h) == (16 * mx, 8 * my)
    assert samp == [(2, 1), (1, 1), (1, 1)]
    for a, b in zip([luma, cb, cr], out):
        np.testing.assert_array_equal(a, b)
    # DC-only planes: each 8x8 luma block constant, chroma constant
    # over 16x8 tiles (horizontal-only replication)
    luma0 = np.zeros_like(luma); luma0[:, :, 0] = 4
    cb0 = np.zeros_like(cb); cb0[:, :, 0] = -2
    cr0 = np.zeros_like(cr); cr0[:, :, 0] = 1
    pix = decode_jpeg(
        encode_jpeg([luma0, cb0, cr0], 16 * mx, 8 * my,
                    sampling=[(2, 1), (1, 1), (1, 1)])
    ).astype(np.int64)
    import math
    y, cbv, crv = 128 + 8, 128 - 4, 128 + 2
    assert (pix[:, :, 0] == math.floor(y + 1.402 * (crv - 128) + 0.5)).all()

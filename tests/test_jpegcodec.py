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


def test_sof2_marker_on_baseline_scan_rejected():
    """Flipping SOF0 -> SOF2 without a progressive scan script leaves a
    full-band Ss=0/Se=63 scan, illegal for progressive (DC scans must
    have Se = 0) — the decoder must reject, not misparse."""
    pl = np.zeros((1, 1, 64), dtype=np.int64)
    payload = bytearray(encode_jpeg([pl], 8, 8))
    payload[payload.index(b"\xff\xc0") + 1] = 0xC2  # SOF0 -> SOF2
    with pytest.raises(ValueError, match="Se = 0"):
        decode_jpeg_coeffs(bytes(payload))


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


# ---------------------------------------------------------------------------
# progressive (SOF2) + restart intervals (round-7 verdict tasks 4 and 7)
# ---------------------------------------------------------------------------
def _sparse_planes(rng, ncomp, wb, hb, density=0.25, mag=40):
    planes = []
    for _ in range(ncomp):
        p = np.zeros((hb, wb, 64), dtype=np.int64)
        mask = rng.random((hb, wb, 64)) < density
        p[mask] = rng.integers(-mag, mag + 1, int(mask.sum()))
        planes.append(p)
    return planes


def test_progressive_equals_baseline_on_same_coefficients():
    """MCU equivalence: the progressive scan script must reproduce the
    coefficient store EXACTLY (spectral selection + successive
    approximation are lossless given all scans), so progressive and
    baseline decodes of the same planes agree bit-for-bit."""
    rng = np.random.default_rng(11)
    planes = _sparse_planes(rng, 3, 4, 3)
    base = decode_jpeg_coeffs(encode_jpeg(planes, 32, 24))
    prog = decode_jpeg_coeffs(encode_jpeg(planes, 32, 24, progressive=True))
    for a, b in zip(base[0], prog[0]):
        np.testing.assert_array_equal(a, b)


def test_progressive_420_roundtrip():
    rng = np.random.default_rng(12)
    luma = _sparse_planes(rng, 1, 4, 4)[0]
    cb, cr = _sparse_planes(rng, 2, 2, 2)
    payload = encode_jpeg(
        [luma, cb, cr], 32, 32, sampling=[(2, 2), (1, 1), (1, 1)],
        progressive=True,
    )
    out, w, h, _, samp = decode_jpeg_coeffs(payload)
    assert samp == [(2, 2), (1, 1), (1, 1)]
    for a, b in zip([luma, cb, cr], out):
        np.testing.assert_array_equal(a, b)


def test_progressive_ac_refinement_bits_exercised():
    """Magnitudes >= 2 force nonzero history in the Al=1 first pass and
    real correction bits in the refinement pass; magnitude-1 coeffs are
    invisible to the first pass and must appear ONLY via refinement."""
    pl = np.zeros((1, 1, 64), dtype=np.int64)
    pl[0, 0, 0] = 5
    pl[0, 0, 1] = 1    # newly nonzero in refinement only
    pl[0, 0, 9] = -3   # history coeff: correction bit 1
    pl[0, 0, 34] = 2   # history coeff: correction bit 0
    pl[0, 0, 63] = -1  # newly nonzero at the band end
    out = decode_jpeg_coeffs(encode_jpeg([pl], 8, 8, progressive=True))
    np.testing.assert_array_equal(out[0][0], pl)


def test_restart_interval_roundtrip_and_meta():
    rng = np.random.default_rng(13)
    planes = _sparse_planes(rng, 1, 5, 3)
    payload = encode_jpeg(planes, 40, 24, restart_interval=4)
    out, w, h, q, s, meta = decode_jpeg_coeffs(payload, with_meta=True)
    assert meta == {"progressive": False, "restart_interval": 4, "n_scans": 1}
    np.testing.assert_array_equal(out[0], planes[0])


def test_restart_markers_present_and_cycling():
    """15 MCUs at DRI=2 -> 7 RST markers cycling D0..D6."""
    planes = [np.zeros((3, 5, 64), dtype=np.int64)]
    planes[0][:, :, 0] = np.arange(15).reshape(3, 5)
    payload = encode_jpeg(planes, 40, 24, restart_interval=2)
    rsts = []
    for i in range(len(payload) - 1):
        if payload[i] == 0xFF and 0xD0 <= payload[i + 1] <= 0xD7:
            rsts.append(payload[i + 1] - 0xD0)
    assert rsts == [0, 1, 2, 3, 4, 5, 6]


def test_out_of_sequence_restart_marker_rejected():
    planes = [np.zeros((1, 8, 64), dtype=np.int64)]
    planes[0][:, :, 0] = 7  # constant DC -> no FF bytes to collide with
    payload = bytearray(encode_jpeg(planes, 64, 8, restart_interval=2))
    i = payload.index(b"\xff\xd0")
    payload[i + 1] = 0xD5  # break the D0,D1,D2.. cycle
    with pytest.raises(ValueError, match="restart marker"):
        decode_jpeg_coeffs(bytes(payload))


def test_restart_resets_dc_prediction():
    """DC predictors must reset to 0 at each RST: decode a stream where
    mis-carried prediction across the boundary would shift every DC
    after the first interval."""
    planes = [np.zeros((1, 6, 64), dtype=np.int64)]
    planes[0][0, :, 0] = [100, 100, 100, 100, 100, 100]
    payload = encode_jpeg(planes, 48, 8, restart_interval=3)
    out, _, _, _, _ = decode_jpeg_coeffs(payload)
    np.testing.assert_array_equal(out[0][0, :, 0], [100] * 6)


def test_progressive_with_restart_interval():
    rng = np.random.default_rng(14)
    planes = _sparse_planes(rng, 3, 3, 2)
    payload = encode_jpeg(planes, 24, 16, progressive=True, restart_interval=2)
    out, _, _, _, _, meta = decode_jpeg_coeffs(payload, with_meta=True)
    assert meta["progressive"] and meta["restart_interval"] == 2
    assert meta["n_scans"] == 2 + 3 * 3  # DC first/refine + 3 AC scans x comp
    for a, b in zip(planes, out):
        np.testing.assert_array_equal(a, b)


def test_synth_jpeg_mode_rules():
    """doc_id % 3 == 0 -> progressive; doc_id % 5 == 2 -> DRI 2; decoded
    pixels must not depend on the coding mode."""
    for doc_id in (2, 3, 12, 15, 27):
        pix, samp, meta = decode_jpeg(
            synth_jpeg(doc_id), with_sampling=True, with_meta=True
        )
        assert meta["progressive"] == (doc_id % 3 == 0), doc_id
        assert meta["restart_interval"] == (2 if doc_id % 5 == 2 else 0), doc_id


# ---------------------------------------------------------------------------
# property: ANY quantized coefficient content round-trips bit-exactly
# through BOTH coding modes and any restart interval
# ---------------------------------------------------------------------------
from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    seed=st.integers(0, 10_000),
    ncomp=st.sampled_from([1, 3]),
    progressive=st.booleans(),
    ri=st.sampled_from([0, 1, 3]),
)
def test_property_coeff_roundtrip_all_modes(seed, ncomp, progressive, ri):
    rng = np.random.default_rng(seed)
    wb, hb = int(rng.integers(1, 5)), int(rng.integers(1, 5))
    planes = []
    for _ in range(ncomp):
        p = np.zeros((hb, wb, 64), dtype=np.int64)
        mask = rng.random((hb, wb, 64)) < rng.uniform(0.02, 0.6)
        p[mask] = rng.integers(-200, 201, int(mask.sum()))
        planes.append(p)
    payload = encode_jpeg(
        planes, 8 * wb, 8 * hb, progressive=progressive, restart_interval=ri
    )
    out, w, h, _, _ = decode_jpeg_coeffs(payload)
    assert (w, h) == (8 * wb, 8 * hb)
    for a, b in zip(planes, out):
        np.testing.assert_array_equal(a, b)


def test_422_coefficient_roundtrip():
    """4:2:2 ((2,1) luma): 2 luma blocks side-by-side then one block
    per chroma per MCU — the generic MCU machinery's other real-world
    sampling, previously claimed by the decode docstring but never
    exercised by a fixture."""
    rng = np.random.default_rng(78)
    for _ in range(6):
        mx, my = int(rng.integers(1, 4)), int(rng.integers(1, 4))
        luma = _random_planes(rng, my, 2 * mx, 1)[0]
        cb = _random_planes(rng, my, mx, 1)[0]
        cr = _random_planes(rng, my, mx, 1)[0]
        payload = encode_jpeg(
            [luma, cb, cr], 16 * mx, 8 * my,
            sampling=[(2, 1), (1, 1), (1, 1)],
        )
        out, w, h, _, samp = decode_jpeg_coeffs(payload)
        assert (w, h) == (16 * mx, 8 * my)
        assert samp == [(2, 1), (1, 1), (1, 1)]
        for a, b in zip([luma, cb, cr], out):
            np.testing.assert_array_equal(a, b)


def test_422_pixels_match_bruteforce():
    """4:2:2 decoded pixels == brute-force composition with chroma
    replicated HORIZONTALLY only."""
    from hive_clone_spark.pipeline.jpegcodec import QUANT_LUMA

    rng = np.random.default_rng(42)
    luma = _random_planes(rng, 1, 2, 1)[0] % 16
    cb = _random_planes(rng, 1, 1, 1)[0] % 8
    cr = _random_planes(rng, 1, 1, 1)[0] % 8
    payload = encode_jpeg(
        [luma, cb, cr], 16, 8, sampling=[(2, 1), (1, 1), (1, 1)]
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
    cbp = np.repeat(idct_plane(cb), 2, axis=1)  # horizontal only
    crp = np.repeat(idct_plane(cr), 2, axis=1)
    exp_r = np.floor(y + 1.402 * (crp - 128.0) + 0.5)
    exp_g = np.floor(
        y - 0.344136 * (cbp - 128.0) - 0.714136 * (crp - 128.0) + 0.5
    )
    exp_b = np.floor(y + 1.772 * (cbp - 128.0) + 0.5)
    exp = np.clip(np.stack([exp_r, exp_g, exp_b], axis=-1), 0, 255)
    np.testing.assert_array_equal(pix, exp.astype(np.int64))

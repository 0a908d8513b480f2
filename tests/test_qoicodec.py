"""QOI codec: spec vectors, op coverage, hypothesis roundtrips
(pipeline/qoicodec.py)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_clone_spark.pipeline.qoicodec import (
    decode_qoi,
    encode_qoi,
    synth_qoi_pixels,
)


def _img(rows):
    return np.array(rows, dtype=np.uint8)


def test_header_and_single_red_pixel_diff_op():
    img = _img([[[255, 0, 0]]])
    c = encode_qoi(img)
    assert c[:4] == b"qoif"
    assert int.from_bytes(c[4:8], "big") == 1
    assert int.from_bytes(c[8:12], "big") == 1
    assert c[12:14] == b"\x03\x00"
    # (0,0,0,255) -> (255,0,0,255): dr wraps to -1 => QOI_OP_DIFF 0x5A
    assert c[14] == 0x5A
    assert c[-8:] == b"\x00" * 7 + b"\x01"
    w, h, ch, back = decode_qoi(c)
    assert (w, h, ch) == (1, 1, 3)
    assert np.array_equal(back, img)


def test_run_op():
    img = np.full((1, 100, 3), 7, dtype=np.uint8)
    c = encode_qoi(img)
    # first pixel literal-ish, then runs; stream far smaller than raw
    assert len(c) < 30
    assert np.array_equal(decode_qoi(c)[3], img)


def test_index_op_roundtrip():
    # alternating two colors: second occurrence of each hits the index
    a, b = [10, 20, 30], [200, 100, 50]
    img = _img([[a, b, a, b, a, b]])
    c = encode_qoi(img)
    assert np.array_equal(decode_qoi(c)[3], img)


def test_luma_and_rgb_ops():
    img = _img([[[0, 0, 0], [20, 25, 30], [180, 90, 10]]])
    c = encode_qoi(img)
    assert 0xFE in c  # big jump forces an RGB literal
    assert np.array_equal(decode_qoi(c)[3], img)


def test_rgba_roundtrip():
    img = np.zeros((2, 3, 4), dtype=np.uint8)
    img[..., 3] = 255
    img[1, 2] = (9, 8, 7, 128)  # alpha change forces QOI_OP_RGBA
    c = encode_qoi(img)
    assert 0xFF in c
    w, h, ch, back = decode_qoi(c)
    assert ch == 4
    assert np.array_equal(back, img)


def test_decoder_rejects_truncation():
    c = encode_qoi(_img([[[1, 2, 3], [4, 5, 6]]]))
    with pytest.raises(ValueError):
        decode_qoi(c[:-9] + b"\x00" * 7 + b"\x01")  # body cut, marker kept


def test_synth_shapes_match_rule():
    for doc_id in (0, 3, 5, 7, 48, 123):
        pix = synth_qoi_pixels(doc_id)
        h, w, ch = pix.shape
        assert w == 1 + doc_id % 48
        assert h == 1 + (doc_id * 5) % 40
        assert ch == (4 if doc_id % 4 == 3 else 3)


@settings(max_examples=120, deadline=None)
@given(
    st.integers(1, 12),
    st.integers(1, 12),
    st.sampled_from([3, 4]),
    st.integers(0, 2**32 - 1),
)
def test_roundtrip_random(w, h, ch, seed):
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
    c = encode_qoi(img)
    assert np.array_equal(decode_qoi(c)[3], img)
    assert encode_qoi(img) == c  # canonical / deterministic

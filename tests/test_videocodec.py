"""Unit tests for the REAL YUV4MPEG2 codec (pipeline/videocodec.py):
encode/decode round-trips, header-tag robustness (order, unknown
tags, frame params), C420 quarter-res chroma sizing, and corrupt
stream rejection.
"""

from __future__ import annotations

import numpy as np
import pytest

from hive_clone_spark.pipeline.videocodec import decode_y4m, encode_y4m, synth_y4m


def _frames(rng, n, h, w):
    return [
        tuple(rng.integers(0, 256, size=(h, w), dtype=np.uint8) for _ in range(3))
        for _ in range(n)
    ]


@pytest.mark.parametrize("n,h,w", [(1, 2, 2), (3, 5, 7), (5, 12, 16)])
def test_y4m_roundtrip_c444(n, h, w):
    rng = np.random.default_rng(n * 100 + h * 10 + w)
    frames = _frames(rng, n, h, w)
    payload = encode_y4m(frames, fps=(30, 1))
    assert payload.startswith(b"YUV4MPEG2 W%d H%d F30:1 C444\n" % (w, h))
    gw, gh, fps, got = decode_y4m(payload)
    assert (gw, gh, fps, len(got)) == (w, h, (30, 1), n)
    for (y, u, v), (gy, gu, gv) in zip(frames, got):
        np.testing.assert_array_equal(gy, y)
        np.testing.assert_array_equal(gu, u)
        np.testing.assert_array_equal(gv, v)


def test_y4m_header_tag_order_and_unknown_tags():
    """Spec: tags are space-separated, order-free; unknown tags (Ip,
    A..., X...) must be skipped; FRAME lines may carry params."""
    y = np.arange(4, dtype=np.uint8).reshape(2, 2)
    raw = (
        b"YUV4MPEG2 C444 F24:1 Ip A1:1 XCOMMENT H2 W2\n"
        b"FRAME Xparam\n" + y.tobytes() * 3
    )
    w, h, fps, frames = decode_y4m(raw)
    assert (w, h, fps, len(frames)) == (2, 2, (24, 1), 1)
    np.testing.assert_array_equal(frames[0][0], y)


def test_y4m_c420_quarter_chroma():
    """C420*: chroma planes are (h/2, w/2) — sizing must follow the
    colorspace tag, and the spec default (no C tag) is C420jpeg."""
    yp = np.full((4, 6), 9, dtype=np.uint8)
    up = np.full((2, 3), 17, dtype=np.uint8)
    vp = np.full((2, 3), 33, dtype=np.uint8)
    body = b"FRAME\n" + yp.tobytes() + up.tobytes() + vp.tobytes()
    for hdr in (b"YUV4MPEG2 W6 H4 F25:1 C420jpeg\n", b"YUV4MPEG2 W6 H4 F25:1\n"):
        w, h, _, frames = decode_y4m(hdr + body)
        assert (w, h) == (6, 4)
        gy, gu, gv = frames[0]
        assert gy.shape == (4, 6) and gu.shape == (2, 3) and gv.shape == (2, 3)
        np.testing.assert_array_equal(gu, up)
    with pytest.raises(ValueError, match="even dimensions"):
        decode_y4m(b"YUV4MPEG2 W5 H4 F25:1 C420\n" + body)


def test_y4m_rejects_corrupt():
    frames = _frames(np.random.default_rng(0), 2, 3, 3)
    good = encode_y4m(frames)
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        decode_y4m(b"XUV4MPEG2" + good[9:])
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(good[:-4])
    with pytest.raises(ValueError, match="bad FRAME marker"):
        decode_y4m(good.replace(b"FRAME\n", b"FRAMX\n", 1))
    with pytest.raises(ValueError, match="unsupported colorspace"):
        decode_y4m(b"YUV4MPEG2 W2 H2 C999\n" + b"FRAME\n" + b"\x00" * 12)
    with pytest.raises(ValueError, match="missing/bad W/H"):
        decode_y4m(b"YUV4MPEG2 F25:1 C444\n" + b"FRAME\n")


def test_synth_y4m_is_real_and_decodable():
    for doc_id in [0, 1, 4, 15, 16, 59, 12345]:
        payload = synth_y4m(doc_id)
        w, h, fps, frames = decode_y4m(payload)
        assert (w, h) == (2 + doc_id % 16, 2 + (doc_id * 5) % 12)
        assert len(frames) == 1 + doc_id % 5
        assert fps == (25, 1)
        want_len = 25 + len(str(w)) + len(str(h)) + len(frames) * (6 + 3 * w * h)
        assert len(payload) == want_len
        for f, (y, u, v) in enumerate(frames):
            yy = np.arange(h, dtype=np.int64)
            np.testing.assert_array_equal(
                y[:, 0].astype(np.int64), (doc_id + 11 * f + 3 * yy) % 256
            )
            assert (y == y[:, :1]).all()  # row-constant
            assert (u == (doc_id + 7 + f) % 256).all()
            assert (v == (doc_id + 14 + 2 * f) % 256).all()

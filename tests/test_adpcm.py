"""IMA ADPCM codec: step vectors, block format, encoder/decoder
agreement, hypothesis properties (pipeline/adpcmcodec.py)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from hive_clone_spark.pipeline.adpcmcodec import (
    INDEX_TABLE,
    STEP_TABLE,
    _step_state,
    adpcm_decode,
    adpcm_encode,
)


def test_tables_are_the_public_spec():
    assert len(STEP_TABLE) == 89
    assert STEP_TABLE[0] == 7 and STEP_TABLE[88] == 32767
    assert INDEX_TABLE == (-1, -1, -1, -1, 2, 4, 6, 8)


def test_single_step_known_vector():
    # pred=0, idx=0, step=7; sample 100: diff=100 >= 7,3,1 -> code 7,
    # delta = 0+7+3+1 = 11, pred=11, idx 0+8=8
    code, pred, idx = _step_state(100, 0, 0)
    assert (code, pred, idx) == (7, 11, 8)
    # negative: sample -100 -> sign bit set, same magnitude path
    code, pred, idx = _step_state(-100, 0, 0)
    assert (code, pred, idx) == (15, -11, 8)


def test_zero_signal_stays_near_zero():
    s = np.zeros(50, dtype=np.int16)
    blob = adpcm_encode(s)
    recon = adpcm_decode(blob, 50)
    # delta is at least step>>3 = 0 at step 7, so recon oscillates
    # within a couple of counts of zero
    assert np.abs(recon.astype(np.int64)).max() <= 2


def test_block_layout():
    s = np.array([100, -100, 50], dtype=np.int16)
    blob = adpcm_encode(s)
    assert blob[0:2] == b"\x00\x00" and blob[2] == 0 and blob[3] == 0
    assert len(blob) == 4 + 2  # 3 nibbles -> 2 bytes
    # low nibble first: first byte = code0 | code1 << 4
    assert blob[4] & 0x0F == 7


def test_decoder_validates_header():
    s = np.arange(8, dtype=np.int16)
    blob = bytearray(adpcm_encode(s))
    blob[3] = 1
    with pytest.raises(ValueError):
        adpcm_decode(bytes(blob), 8)
    blob[3] = 0
    blob[2] = 90  # index out of range
    with pytest.raises(ValueError):
        adpcm_decode(bytes(blob), 8)


def test_decoder_reproduces_encoder_prediction():
    rng = np.random.default_rng(7)
    s = rng.integers(-32768, 32767, size=333, dtype=np.int16)
    blob = adpcm_encode(s)
    recon = adpcm_decode(blob, 333)
    # replay the encoder recurrence and compare predictor sequences
    pred, idx = 0, 0
    preds = []
    for x in s.astype(np.int64):
        _, pred, idx = _step_state(int(x), pred, idx)
        preds.append(pred)
    assert np.array_equal(recon.astype(np.int64), np.array(preds))


def test_tracking_converges_on_slow_ramp():
    # a gentle ramp should be tracked closely once the step adapts
    s = (np.arange(400) * 3).astype(np.int16)
    recon = adpcm_decode(adpcm_encode(s), 400)
    tail_err = np.abs(
        s[100:].astype(np.int64) - recon[100:].astype(np.int64)
    )
    assert tail_err.max() <= 64


@settings(max_examples=150, deadline=None)
@given(st.lists(st.integers(-32768, 32767), min_size=1, max_size=200))
def test_roundtrip_properties(xs):
    s = np.array(xs, dtype=np.int16)
    blob = adpcm_encode(s)
    assert len(blob) == 4 + (len(xs) + 1) // 2
    recon = adpcm_decode(blob, len(xs))
    assert recon.dtype == np.int16 and len(recon) == len(xs)
    assert adpcm_encode(s) == blob  # deterministic
    # reconstruction error is bounded by the largest step plus slack
    assert np.abs(s.astype(np.int64) - recon.astype(np.int64)).max() <= 65535

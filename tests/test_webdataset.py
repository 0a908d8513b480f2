"""Unit tests for the ustar layer behind p_webdataset
(pipeline/webdataset.py): block rounding, checksum verification,
end-of-archive handling, and the sample-grouping composition with the
real JPEG decoder."""

from __future__ import annotations

import numpy as np
import pytest

from hive_clone_spark.pipeline.jpegcodec import decode_jpeg, synth_jpeg
from hive_clone_spark.pipeline.webdataset import tar_build, tar_member, tar_walk


def test_roundtrip_various_sizes():
    members = [
        ("empty.bin", b""),
        ("one.bin", b"x"),
        ("block.bin", b"a" * 512),
        ("blockplus.bin", b"b" * 513),
        ("big.bin", bytes(range(256)) * 37),
    ]
    assert tar_walk(tar_build(members)) == members


def test_archive_is_block_aligned_with_eot():
    blob = tar_build([("f.txt", b"hi")])
    assert len(blob) % 512 == 0
    assert blob.endswith(b"\x00" * 1024)


def test_checksum_corruption_detected():
    blob = bytearray(tar_build([("f.txt", b"hi")]))
    blob[5] ^= 0xFF  # flip a name byte; stored checksum now wrong
    with pytest.raises(ValueError, match="checksum"):
        tar_walk(bytes(blob))


def test_bad_magic_detected():
    blob = bytearray(tar_build([("f.txt", b"hi")]))
    # recompute checksum after clobbering magic so ONLY magic is bad
    blob[257:262] = b"wrong"
    blob[148:156] = b" " * 8
    chk = sum(blob[:512])
    blob[148:156] = (b"%06o" % chk) + b"\x00 "
    with pytest.raises(ValueError, match="magic"):
        tar_walk(bytes(blob))


def test_truncated_archive_detected():
    blob = tar_build([("f.txt", b"hi")])
    with pytest.raises(ValueError, match="end-of-archive"):
        tar_walk(blob[:-1024])  # chop the EOT blocks


def test_long_name_rejected():
    with pytest.raises(ValueError, match="name too long"):
        tar_member("x" * 101, b"")


def test_sample_composition_with_real_jpeg():
    """A (jpg, txt) sample walks out of the tar and decodes through
    the real JPEG path to the fixture's known constant pixels."""
    jpg = synth_jpeg(4)  # gray fixture
    blob = tar_build([("000000004.jpg", jpg), ("000000004.txt", b"cap")])
    members = dict(tar_walk(blob))
    pix = decode_jpeg(members["000000004.jpg"])
    assert pix.shape[2] == 1
    np.testing.assert_array_equal(pix, decode_jpeg(jpg))

"""Unit tests for the EXIF APP1/TIFF codec (pipeline/exif.py): both
byte orders, inline vs offset values, sub-IFD chaining, marker-walk
robustness, and the splice into real JPEG fixtures."""

from __future__ import annotations

import struct

import pytest

from hive_clone_spark.pipeline.exif import (
    build_exif_app1,
    parse_exif,
    splice_app1,
    synth_exif_jpeg,
)
from hive_clone_spark.pipeline.jpegcodec import decode_jpeg, synth_jpeg


@pytest.mark.parametrize("le", [True, False])
def test_roundtrip_both_byte_orders(le):
    app1 = build_exif_app1(
        byte_order_le=le, orientation=6, x_res=300, make="ACME-9000",
        pixel_x=1024, pixel_y=768,
    )
    jpeg = splice_app1(synth_jpeg(4), app1)
    m = parse_exif(jpeg)
    assert m == {
        "byte_order": "II" if le else "MM",
        "orientation": 6,
        "x_res": 300,
        "make": "ACME-9000",
        "pixel_x": 1024,
        "pixel_y": 768,
    }


def test_offset_values_resolve():
    """Make (ASCII > 4 bytes) and XResolution (RATIONAL, always 8
    bytes) must be fetched via their offset, not read inline."""
    app1 = build_exif_app1(True, 1, 72, "LONGCAMERANAME", 8, 8)
    # the make string must NOT sit inside its IFD entry value field
    tiff = app1[10:]
    assert b"LONGCAMERANAME" in tiff
    m = parse_exif(splice_app1(synth_jpeg(0), app1))
    assert m["make"] == "LONGCAMERANAME" and m["x_res"] == 72


def test_exif_survives_other_app_segments():
    """A JFIF APP0 before the APP1 (synth_jpeg emits one) plus an
    unknown APP14 after it: the marker walk must skip by length."""
    app1 = build_exif_app1(False, 3, 96, "C", 16, 8)
    jpeg = bytearray(splice_app1(synth_jpeg(2), app1))
    app14 = b"\xff\xee" + struct.pack(">H", 8) + b"Adobe!"
    # insert APP14 right after SOI, BEFORE the APP1
    jpeg = bytes(jpeg[:2]) + app14 + bytes(jpeg[2:])
    assert parse_exif(jpeg)["orientation"] == 3


def test_missing_exif_raises():
    with pytest.raises(ValueError, match="no APP1"):
        parse_exif(synth_jpeg(5))


def test_bad_tiff_magic_rejected():
    app1 = bytearray(build_exif_app1(True, 1, 72, "C", 8, 8))
    app1[10:12] = b"XX"  # clobber the byte-order mark
    with pytest.raises(ValueError, match="byte-order"):
        parse_exif(splice_app1(synth_jpeg(0), bytes(app1)))


def test_synth_dims_match_real_decode():
    """The EXIF-declared dimensions must equal the real pixel decode of
    the SAME file — across gray/ycc/420 and progressive/DRI variants."""
    for doc_id in (0, 1, 3, 7, 12, 15, 27):
        jpeg = synth_exif_jpeg(doc_id)
        m = parse_exif(jpeg)
        pix = decode_jpeg(jpeg)
        assert (m["pixel_y"], m["pixel_x"]) == pix.shape[:2], doc_id
        assert m["byte_order"] == ("II" if doc_id % 2 == 0 else "MM")
        assert m["orientation"] == 1 + doc_id % 8

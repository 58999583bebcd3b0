"""Golden-file tests for the stdlib image codec (operators/codec.py) and
the real (non-fake) mapInPandas feature-extraction path."""

from __future__ import annotations

import struct
import zlib

import pytest

from duckdb_spark.operators.codec import (
    Image,
    decode_bmp,
    decode_image,
    decode_png,
    encode_png,
    image_features,
    resize_nearest,
)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(ctype + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + ctype + body + struct.pack(">I", crc)


def _build_png(width, height, color_type, raw_scanlines: bytes) -> bytes:
    """Independent byte-level PNG builder (not encode_png) so decode is
    tested against the spec layout, not our own writer."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw_scanlines))
        + _png_chunk(b"IEND", b"")
    )


def test_png_filters_roundtrip_all_types():
    # 3x3 RGB, one scanline per filter type (0=None, 1=Sub, 2=Up), checked
    # against hand-applied filter math
    row0 = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
    # row1 stored with Sub filter: raw[i] = orig[i] - orig[i-3]
    row1_orig = bytes([5, 5, 5, 15, 25, 35, 115, 125, 135])
    row1_sub = bytes(
        (row1_orig[i] - (row1_orig[i - 3] if i >= 3 else 0)) & 0xFF
        for i in range(9)
    )
    # row2 stored with Up filter: raw[i] = orig[i] - row1_orig[i]
    row2_orig = bytes([6, 7, 8, 16, 27, 38, 200, 210, 220])
    row2_up = bytes((row2_orig[i] - row1_orig[i]) & 0xFF for i in range(9))
    raw = b"\x00" + row0 + b"\x01" + row1_sub + b"\x02" + row2_up
    img = decode_png(_build_png(3, 3, 2, raw))
    assert (img.width, img.height, img.channels) == (3, 3, 3)
    assert img.pixels == row0 + row1_orig + row2_orig
    assert img.pixel(2, 2) == (200, 210, 220)


def test_png_average_and_paeth_filters():
    # 2x2 greyscale exercising Average (3) and Paeth (4)
    row0 = bytes([100, 200])
    # Average: recon[i] = raw[i] + (left + up)//2
    row1_orig = bytes([60, 190])
    row1_avg = bytes([
        (60 - (0 + 100) // 2) & 0xFF,          # left=0, up=100
        (190 - (60 + 200) // 2) & 0xFF,        # left=60, up=200
    ])
    raw = b"\x00" + row0 + b"\x03" + row1_avg
    img = decode_png(_build_png(2, 2, 0, raw))
    assert img.pixels == row0 + row1_orig

    # Paeth on row1: predictor of (a=left, b=up, c=up-left)
    row1_paeth = bytearray()
    recon = [30, 220]
    prev = [100, 200]
    for i, v in enumerate(recon):
        a = recon[i - 1] if i >= 1 else 0
        b = prev[i]
        c = prev[i - 1] if i >= 1 else 0
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        row1_paeth.append((v - pred) & 0xFF)
    raw = b"\x00" + row0 + b"\x04" + bytes(row1_paeth)
    img = decode_png(_build_png(2, 2, 0, raw))
    assert list(img.pixels) == [100, 200, 30, 220]


def test_png_rgba_and_encoder_roundtrip():
    px = bytes(range(64))  # 4x4 RGBA gradient
    img = Image(4, 4, 4, px)
    out = decode_png(encode_png(img))
    assert (out.width, out.height, out.channels) == (4, 4, 4)
    assert out.pixels == px


def test_bmp_24bit_bottom_up():
    # 2x2 BMP: rows padded to 4 bytes, stored bottom-up, BGR order
    top = [(255, 0, 0), (0, 255, 0)]     # red, green
    bottom = [(0, 0, 255), (255, 255, 255)]  # blue, white
    def bgr_row(px):
        row = b"".join(bytes([b, g, r]) for (r, g, b) in px)
        return row + b"\x00" * ((4 - len(row) % 4) % 4)
    pixel_data = bgr_row(bottom) + bgr_row(top)  # bottom-up storage
    header = (
        b"BM" + struct.pack("<IHHI", 54 + len(pixel_data), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(pixel_data),
                      2835, 2835, 0, 0)
    )
    img = decode_bmp(header + pixel_data)
    assert img.pixel(0, 0) == (255, 0, 0)
    assert img.pixel(1, 0) == (0, 255, 0)
    assert img.pixel(0, 1) == (0, 0, 255)
    assert img.pixel(1, 1) == (255, 255, 255)


def test_decode_image_sniffs_and_names_missing_codecs():
    with pytest.raises(ValueError, match="JPEG"):
        decode_image(b"\xff\xd8\xff\xe0rest")
    with pytest.raises(ValueError, match="WebP"):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(ValueError, match="unrecognized"):
        decode_image(b"\x00\x01\x02\x03garbage")


def test_resize_and_features():
    # 2x2 checkerboard upscaled 4x4 nearest-neighbor
    img = Image(2, 2, 1, bytes([0, 255, 255, 0]))
    big = resize_nearest(img, 4, 4)
    assert big.pixel(0, 0) == (0,) and big.pixel(3, 0) == (255,)
    assert big.pixel(0, 3) == (255,) and big.pixel(3, 3) == (0,)
    f = image_features(img, dim=16)
    assert len(f) == 16
    assert abs(f[3] - 127.5 / 255.0) < 1e-9  # channel mean
    assert abs(f[5] - 0.5) < 1e-9            # hist bin 0: two black pixels
    assert abs(f[12] - 0.5) < 1e-9           # hist bin 7: two white pixels


def test_spark_extract_features_real_decode(spark):
    from duckdb_spark.operators.codec import image_features as feat
    from duckdb_spark.operators.multimodal import extract_features

    imgs = {
        1: Image(3, 2, 3, bytes(range(18))),
        2: Image(2, 2, 1, bytes([0, 64, 128, 255])),
    }
    rows = [(i, "image", encode_png(im)) for i, im in imgs.items()]
    df = spark.createDataFrame(rows, "doc_id long, media_type string, payload binary")
    got = {
        r["doc_id"]: r["feat"]
        for r in extract_features(df, dim=16, fake=False).collect()
    }
    for i, im in imgs.items():
        expect = feat(im, 16)
        assert all(abs(a - b) < 1e-6 for a, b in zip(got[i], expect)), i

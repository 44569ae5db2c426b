"""PNG decoder unit tests: color types 0/2/3/4/6, every scanline filter,
interlace/bit-depth rejection, truncation, and parity with the BMP decoder
on identical pixels (the shared luma contract)."""

from __future__ import annotations

import struct
import zlib

import pytest

from server2_vector_search_server_spark.operators.multimodal import (
    _bmp_luma_grid,
    _luma_feature_row,
    _paeth,
    _png_image_features,
    _png_luma_grid,
    build_bmp24,
    build_png,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _png(width, height, ctype, pixel_bytes, *, plte=b"", filters=None,
         depth=8, interlace=0):
    """Hand-rolled PNG with explicit per-row filter bytes (default 0)."""
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    stride = width * channels
    raw = bytearray()
    for y in range(height):
        raw.append((filters or [0] * height)[y])
        raw += pixel_bytes[y * stride:(y + 1) * stride]
    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", width, height, depth, ctype, 0, 0,
                             interlace))
    if plte:
        out += _chunk(b"PLTE", plte)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(
        b"IEND", b"")


def test_rgb_roundtrip_all_filters():
    rows = [[((x * 7 + y * 13) % 256, (x * 3 + y * 5) % 256,
              (x * 11 + y) % 256) for x in range(9)] for y in range(7)]
    w, h, lumas = _png_luma_grid(build_png(rows))
    assert (w, h) == (9, 7)
    assert lumas == [sum(px) for row in rows for px in row]


def test_bmp_png_same_pixels_same_features():
    """The two stdlib decoders must produce identical features for
    identical pixels — the shared-fold guarantee."""
    rows = [[((x * 5 + y) % 256, (y * 9 + x) % 256, (x ^ y) % 256)
             for x in range(16)] for y in range(12)]
    bw, bh, bl = _bmp_luma_grid(build_bmp24(rows))
    pw, ph, pl = _png_luma_grid(build_png(rows))
    assert (bw, bh, bl) == (pw, ph, pl)
    assert (_luma_feature_row("m", bw, bh, bl)
            == _luma_feature_row("m", pw, ph, pl))


def test_grayscale_luma_is_triple():
    pix = bytes([10, 200, 30, 40, 50, 60])
    w, h, lumas = _png_luma_grid(_png(3, 2, 0, pix))
    assert (w, h) == (3, 2)
    assert lumas == [30, 600, 90, 120, 150, 180]


def test_gray_alpha_ignores_alpha():
    pix = bytes([10, 255, 20, 0])      # (v=10,a=255), (v=20,a=0)
    _, _, lumas = _png_luma_grid(_png(2, 1, 4, pix))
    assert lumas == [30, 60]


def test_rgba_ignores_alpha():
    pix = bytes([1, 2, 3, 9, 4, 5, 6, 0])
    _, _, lumas = _png_luma_grid(_png(2, 1, 6, pix))
    assert lumas == [6, 15]


def test_palette_lookup():
    plte = bytes([255, 0, 0, 0, 255, 0, 10, 20, 30])
    pix = bytes([0, 2, 1, 1])
    _, _, lumas = _png_luma_grid(_png(2, 2, 3, pix, plte=plte))
    assert lumas == [255, 60, 255, 255]


def test_palette_index_out_of_range_rejected():
    with pytest.raises(ValueError):
        _png_luma_grid(_png(1, 1, 3, bytes([5]), plte=bytes(3)))


def test_interlace_and_16bit_rejected():
    pix = bytes(3)
    with pytest.raises(ValueError):
        _png_luma_grid(_png(1, 1, 2, pix, interlace=1))
    with pytest.raises(ValueError):
        _png_luma_grid(_png(1, 1, 2, pix, depth=16))


def test_truncated_idat_rejected():
    blob = build_png([[(1, 2, 3)] * 4] * 4)
    with pytest.raises(Exception):
        _png_luma_grid(blob[:len(blob) // 2])


def test_bad_filter_byte_rejected():
    with pytest.raises(ValueError):
        _png_luma_grid(_png(1, 1, 2, bytes(3), filters=[7]))


def test_not_a_png_rejected():
    with pytest.raises(ValueError):
        _png_luma_grid(b"BM....definitely not a png")


def test_quarantine_row_on_garbage():
    row = _png_image_features("x", b"\x89PNG\r\n\x1a\ngarbage")
    assert row["media_id"] == "x" and row["phash"] is None


def test_multi_idat_concatenation():
    """IDAT may be split across chunks at ANY byte boundary."""
    rows = [[(x % 256, (2 * x) % 256, (3 * x) % 256) for x in range(5)]
            for _ in range(3)]
    blob = build_png(rows)
    # re-split the single IDAT into two chunks
    sig, rest = blob[:8], blob[8:]
    ln = struct.unpack_from(">I", rest, 0)[0]
    ihdr_block, rest2 = rest[:12 + 13], rest[12 + 13:]
    ln = struct.unpack_from(">I", rest2, 0)[0]
    idat_data = rest2[8:8 + ln]
    iend = rest2[12 + ln:]
    mid = len(idat_data) // 2
    resplit = (sig + ihdr_block + _chunk(b"IDAT", idat_data[:mid])
               + _chunk(b"IDAT", idat_data[mid:]) + iend)
    assert _png_luma_grid(resplit) == _png_luma_grid(blob)


def test_paeth_tie_breaks():
    """RFC 2083 order: a wins pa<=pb and pa<=pc; else b wins pb<=pc."""
    assert _paeth(1, 1, 0) == 1        # pa == pb == 1, pc = 2 -> a
    assert _paeth(0, 4, 2) == 2        # pc = 0 strictly smallest -> c
    assert _paeth(0, 2, 1) == 1        # pa == pb == 1 > pc = 0 -> c
    assert _paeth(10, 20, 30) == 10    # p = 0: pa smallest -> a
    assert _paeth(3, 3, 3) == 3        # all equal -> a

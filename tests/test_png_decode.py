"""PNG decoder tests: an INDEPENDENT forward encoder (chunks, CRCs,
per-row filters 0-4) exercises every reconstruction path, and malformed
variants must be refused (ValueError) rather than decoded as garbage."""

import struct
import zlib

import numpy as np
import pytest

from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
    decode_image,
)


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, color_type: int, filters: list) -> bytes:
    """Minimal PNG encoder — the forward side of RFC 2083 §6, written
    independently of the decoder under test.  ``pixels`` is
    (height, width*channels) uint8, one filter type per row."""
    channels = {0: 1, 2: 3, 4: 2, 6: 4}[color_type]
    h, stride = pixels.shape
    w = stride // channels
    bpp = channels
    px = pixels.astype(np.int32)
    out = bytearray()
    for y in range(h):
        f = filters[y]
        row = px[y]
        prev = px[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        filt = np.empty(stride, dtype=np.int32)
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
            filt[i] = (row[i] - pred) % 256
        out.append(f)
        out.extend(filt.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def _gradient(h: int, w: int, channels: int) -> np.ndarray:
    """Deterministic non-trivial pixel pattern (wraps mod 256)."""
    n = h * w * channels
    return (np.arange(n, dtype=np.int64) * 7 % 256).astype(np.uint8).reshape(
        h, w * channels
    )


@pytest.mark.parametrize("color_type,channels", [(0, 1), (2, 3), (6, 4)])
def test_png_roundtrip_all_filters(color_type, channels):
    px = _gradient(5, 4, channels)
    png = encode_png(px, color_type, filters=[0, 1, 2, 3, 4])
    meta = decode_image(png)
    assert meta["format"] == "png"
    assert (meta["width"], meta["height"]) == (4, 5)
    assert meta["channels"] == channels
    assert abs(meta["mean_level"] - float(px.mean())) < 1e-9


def test_png_single_filter_each():
    # each filter type alone, so a broken branch cannot hide behind the
    # others agreeing on most rows
    for f in range(5):
        px = _gradient(4, 3, 3)
        meta = decode_image(encode_png(px, 2, filters=[f] * 4))
        assert abs(meta["mean_level"] - float(px.mean())) < 1e-9, f


def test_png_multi_idat():
    # IDAT may be split across chunks; the zlib stream spans them
    px = _gradient(3, 3, 3)
    raw = bytearray()
    for y in range(3):
        raw.append(0)
        raw.extend(px[y].tobytes())
    z = zlib.compress(bytes(raw))
    ihdr = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", z[: len(z) // 2])
        + _chunk(b"IDAT", z[len(z) // 2 :])
        + _chunk(b"IEND", b"")
    )
    meta = decode_image(png)
    assert abs(meta["mean_level"] - float(px.mean())) < 1e-9


def test_png_corrupt_crc_refused():
    png = bytearray(encode_png(_gradient(2, 2, 3), 2, [0, 0]))
    png[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError):
        decode_image(bytes(png))


def test_png_nonzero_method_bytes_refused():
    # IHDR compression-method / filter-method bytes must be 0: a
    # CRC-valid file declaring method 1 must NOT decode as if it were 0
    for comp, filt in ((1, 0), (0, 1)):
        ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, comp, filt, 0)
        raw = b"\x00" + b"\x01" * 6 + b"\x00" + b"\x02" * 6
        png = (
            b"\x89PNG\r\n\x1a\n"
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError):
            decode_image(png)


def _filter_rows(px: np.ndarray, bpp: int, filters) -> bytes:
    """Apply PNG row filters to an (h, stride) int array — shared by the
    Adam7 and palette encoders below, same math as encode_png."""
    h, stride = px.shape
    out = bytearray()
    for y in range(h):
        f = filters[y % len(filters)]
        row = px[y]
        prev = px[y - 1] if y > 0 else np.zeros(stride, dtype=np.int64)
        filt = np.empty(stride, dtype=np.int64)
        for i in range(stride):
            a = row[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (
                    b if pb <= pc else c
                )
            filt[i] = (row[i] - pred) % 256
        out.append(f)
        out.extend(filt.astype(np.uint8).tobytes())
    return bytes(out)


_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def encode_png_adam7(pixels3: np.ndarray, color_type: int) -> bytes:
    """Adam7-interlaced encoder: each pass's sub-image filtered
    independently (filters cycle 0-4), streams concatenated in spec
    order.  ``pixels3`` is (h, w, channels) uint8."""
    h, w, ch = pixels3.shape
    px = pixels3.astype(np.int64)
    out = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = px[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        hp, wp = sub.shape[:2]
        out += _filter_rows(sub.reshape(hp, wp * ch), ch,
                            [0, 1, 2, 3, 4])
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out)))
        + _chunk(b"IEND", b"")
    )


def encode_png_palette(idx: np.ndarray, plte: np.ndarray,
                       filters=(0, 1, 2, 3, 4)) -> bytes:
    """Color-type-3 encoder: ``idx`` (h, w) uint8 indices, ``plte``
    (n, 3) uint8 palette."""
    h, w = idx.shape
    out = _filter_rows(idx.astype(np.int64), 1, list(filters))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", plte.astype(np.uint8).tobytes())
        + _chunk(b"IDAT", zlib.compress(out))
        + _chunk(b"IEND", b"")
    )


def test_png_adam7_matches_sequential():
    rng = np.random.default_rng(7)
    for h, w, ct, ch in ((13, 17, 2, 3), (9, 5, 0, 1), (16, 8, 6, 4)):
        px = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
        plain = decode_image(
            encode_png(px.reshape(h, w * ch), ct, [y % 5 for y in range(h)])
        )
        inter = decode_image(encode_png_adam7(px, ct))
        assert inter == plain
        assert inter["mean_level"] == pytest.approx(float(px.mean()),
                                                    abs=1e-9)


def test_png_palette_maps_through_plte():
    rng = np.random.default_rng(8)
    plte = rng.integers(0, 256, (16, 3)).astype(np.uint8)
    idx = rng.integers(0, 16, (11, 7)).astype(np.uint8)
    d = decode_image(encode_png_palette(idx, plte))
    assert (d["format"], d["channels"]) == ("png", 3)
    assert d["mean_level"] == pytest.approx(float(plte[idx].mean()),
                                            abs=1e-9)


def test_png_palette_index_beyond_plte_refused():
    plte = np.zeros((4, 3), np.uint8)
    idx = np.full((3, 3), 9, np.uint8)  # index 9 with 4-entry palette
    with pytest.raises(ValueError):
        decode_image(encode_png_palette(idx, plte))


def test_png_unsupported_variants_refused():
    # palette color type WITHOUT a PLTE chunk
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0)
    pal = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_image(pal)
    # truncated: signature but no chunks
    with pytest.raises(ValueError):
        decode_image(b"\x89PNG\r\n\x1a\n")
    # dimensions lying about the pixel payload
    ihdr_lie = struct.pack(">IIBBBBB", 99, 99, 8, 2, 0, 0, 0)
    lie = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr_lie)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 12))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError):
        decode_image(lie)


def test_png_through_decode_media_kernel(spark):
    """The Arrow kernel path: a real PNG decodes, garbage falls back."""
    from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
        decode_media,
    )

    px = _gradient(4, 4, 3)
    png = encode_png(px, 2, filters=[0, 1, 2, 3])
    df = spark.createDataFrame(
        [(1, "image", bytearray(png)),
         (2, "image", bytearray(b"\x89PNG\r\n\x1a\nbroken"))],
        "asset_id long, kind string, payload binary",
    )
    out = {r.asset_id: r for r in decode_media(df).collect()}
    assert out[1].format == "png"
    assert (out[1].width, out[1].height, out[1].channels) == (4, 4, 3)
    assert abs(out[1].mean_level - float(px.mean())) < 1e-9
    assert out[2].format is None  # fell back to fake_decode

"""GIF decoder tests, mirroring test_jpeg_decode.py: an INDEPENDENT
forward encoder (trie keyed by (prefix_code, byte) — a different
construction from the forge's bytes-keyed `_gif_lzw_encode`) exercises
the full decode path including code-width growth, the kwkwk corner,
table freeze at 4096, and interlace; structural damage must be refused
(ValueError) rather than decoded as garbage."""

import struct

import numpy as np
import pytest

from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
    _decode_gif,
    _gif_deinterlace,
    _gif_lzw_decode,
    decode_image,
    synthesize_media,
)

# ---- independent forward encoder ------------------------------------------


def _lzw_encode(indices, min_code_size):
    """LZW encoder built differently from the package's: the string table
    is a trie of (prefix_code, next_byte) → code, and codes are packed
    from an explicit bit list."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    trie = {}
    next_code = eoi + 1
    width = min_code_size + 1
    bits = []

    def put(code, w):
        for i in range(w):
            bits.append((code >> i) & 1)

    put(clear, width)
    prev = None  # code of the current prefix
    for b in indices:
        b = int(b)
        if prev is None:
            prev = b  # literals are their own codes
            continue
        if (prev, b) in trie:
            prev = trie[(prev, b)]
            continue
        put(prev, width)
        if next_code < 4096:
            trie[(prev, b)] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = b
    if prev is not None:
        put(prev, width)
    put(eoi, width)
    out = bytearray()
    for i in range(0, len(bits), 8):
        byte = 0
        for j, bit in enumerate(bits[i : i + 8]):
            byte |= bit << j
        out.append(byte)
    return bytes(out)


def _subblocks(data):
    return (
        b"".join(
            bytes([min(255, len(data) - i)]) + data[i : i + 255]
            for i in range(0, len(data), 255)
        )
        + b"\x00"
    )


def _make_gif(w, h, palette, indices, min_code_size, interlaced=False):
    """Assemble a spec-valid single-frame GIF89a around the independent
    encoder.  `palette` is an (n, 3) uint8 array with n a power of two;
    `indices` are given in DISPLAY order (the encoder permutes them into
    pass order when interlaced=True)."""
    n = len(palette)
    size_field = n.bit_length() - 2  # 2**(field+1) == n
    rows = np.asarray(indices, np.uint8).reshape(h, w)
    if interlaced:
        rows = np.concatenate(
            [rows[off::step] for off, step in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
    lzw = _lzw_encode(rows.ravel(), min_code_size)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | size_field, 0, 0)
        + bytes(np.asarray(palette, np.uint8).ravel())
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlaced else 0)
        + bytes([min_code_size])
        + _subblocks(lzw)
        + b"\x3b"
    )


def _rng(seed):
    return np.random.default_rng(seed)


# ---- LZW round-trips -------------------------------------------------------


def test_lzw_roundtrip_random_small_alphabet():
    idx = _rng(1).integers(0, 4, 3000).astype(np.uint8)
    data = _lzw_encode(idx, 2)
    out = _gif_lzw_decode(data, 2, len(idx))
    assert bytes(out) == idx.tobytes()


def test_lzw_roundtrip_grows_to_12_bits_and_freezes():
    # 60k bytes over a 256-symbol alphabet forces the table past 4096:
    # the encoder freezes (deferred clear) and the decoder must track it
    idx = _rng(2).integers(0, 256, 60000).astype(np.uint8)
    data = _lzw_encode(idx, 8)
    out = _gif_lzw_decode(data, 8, len(idx))
    assert bytes(out) == idx.tobytes()


def test_lzw_kwkwk_corner():
    # "ababab..." emits a code equal to the table length (the kwkwk case)
    idx = bytes([0, 1]) * 500
    data = _lzw_encode(idx, 2)
    assert bytes(_gif_lzw_decode(data, 2, len(idx))) == idx


def test_lzw_truncated_stream_refused():
    idx = _rng(3).integers(0, 4, 500).astype(np.uint8)
    data = _lzw_encode(idx, 2)
    with pytest.raises(ValueError):
        _gif_lzw_decode(data[: len(data) // 2], 2, len(idx))


def test_lzw_code_beyond_table_refused():
    # 6-bit-looking garbage: first code after clear must be a literal
    with pytest.raises(ValueError):
        _gif_lzw_decode(bytes([0xFF, 0xFF, 0xFF]), 2, 8)


# ---- full-image decode -----------------------------------------------------


def test_decode_matches_expected_mean_and_dims():
    w, h = 21, 13
    palette = _rng(4).integers(0, 256, (8, 3)).astype(np.uint8)
    idx = _rng(5).integers(0, 8, w * h).astype(np.uint8)
    d = _decode_gif(_make_gif(w, h, palette, idx, 3))
    assert (d["format"], d["width"], d["height"], d["channels"]) == (
        "gif", w, h, 3,
    )
    assert d["mean_level"] == pytest.approx(
        float(palette[idx].mean()), abs=1e-9
    )


def test_decode_via_decode_image_dispatch():
    palette = np.array([[10, 20, 30], [40, 50, 60]], np.uint8)
    idx = np.zeros(16, np.uint8)
    d = decode_image(_make_gif(4, 4, palette, idx, 2))
    assert d["format"] == "gif" and d["mean_level"] == pytest.approx(20.0)


def test_interlaced_decodes_identically():
    w, h = 17, 11  # not multiples of 8: uneven pass sizes
    palette = _rng(6).integers(0, 256, (4, 3)).astype(np.uint8)
    idx = _rng(7).integers(0, 4, w * h).astype(np.uint8)
    plain = _decode_gif(_make_gif(w, h, palette, idx, 2))
    inter = _decode_gif(_make_gif(w, h, palette, idx, 2, interlaced=True))
    assert inter == plain


def test_deinterlace_reorders_passes_exactly():
    rows = np.arange(10)[:, None] * np.ones((1, 3), np.int64)
    # display order 0..9 arrives as passes [0,8], [4], [2,6], [1,3,5,7,9]
    arrival = np.array([0, 8, 4, 2, 6, 1, 3, 5, 7, 9])[:, None] * np.ones(
        (1, 3), np.int64
    )
    assert (_gif_deinterlace(arrival) == rows).all()


def test_extension_blocks_skipped():
    palette = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    idx = np.ones(4, np.uint8)
    gif = _make_gif(2, 2, palette, idx, 2)
    # splice a graphic-control extension between the LSD+GCT and the
    # image descriptor (0x2c)
    at = gif.index(b"\x2c", 6)
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    d = _decode_gif(gif[:at] + gce + gif[at:])
    assert d["mean_level"] == pytest.approx(255.0)


# ---- refusals --------------------------------------------------------------


def test_malformed_gifs_refused():
    palette = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    good = _make_gif(2, 2, palette, np.zeros(4, np.uint8), 2)
    for bad in (
        good[:10],                      # truncated header
        good[:13] + b"\x3b",            # trailer before any image
        good[:-10],                     # truncated image data
        b"GIF89a" + good[6:13],         # GCT flag set, table missing
    ):
        with pytest.raises(ValueError):
            _decode_gif(bad)


def test_pixel_index_beyond_palette_refused():
    palette = np.array([[0, 0, 0], [255, 255, 255]], np.uint8)
    # 2-entry palette but pixel index 3: min_code_size 2 makes 3 a legal
    # LZW literal, so only the palette bound check can catch it
    gif = _make_gif(2, 2, palette, np.full(4, 3, np.uint8), 2)
    with pytest.raises(ValueError):
        _decode_gif(gif)


# ---- the forge and the decoder agree --------------------------------------


def test_synthesize_media_gif_decodes_to_closed_form():
    for doc_id in (6, 13, 20, 97):  # kind == doc_id % 7 == 6
        assert doc_id % 7 == 6
        w, h = 16 + doc_id % 48, 8 + doc_id % 24
        d = decode_image(synthesize_media(doc_id))
        assert (d["format"], d["width"], d["height"]) == ("gif", w, h)
        if doc_id % 2 == 0:
            # constant-level variant (the SQL-oracle-checked one):
            # every pixel is palette entry 0 = gray doc_id % 256
            assert d["mean_level"] == pytest.approx(
                float(doc_id % 256), abs=1e-9
            )
            continue
        palette = np.array(
            [
                [(doc_id + 40 * j + 11 * c) % 256 for c in range(3)]
                for j in range(4)
            ],
            np.uint8,
        )
        idx = np.array(
            [(x + y + doc_id) % 4 for y in range(h) for x in range(w)]
        )
        assert d["mean_level"] == pytest.approx(
            float(palette[idx].mean()), abs=1e-9
        )


def test_subrectangle_first_frame_reports_no_mean():
    """mean_level describes the logical-screen canvas; a first frame
    covering only a sub-rectangle leaves the rest of the canvas
    undefined, so the stat is None while dims stay real (ADVICE r6)."""
    palette = np.array([[10, 10, 10], [20, 20, 20]], np.uint8)
    lzw = _lzw_encode(np.zeros(4, np.uint8), 2)
    gif = (
        b"GIF89a"
        + struct.pack("<HHBBB", 8, 8, 0x80, 0, 0)  # 8x8 canvas, 2-entry GCT
        + bytes(palette.ravel())
        + b"\x2c"
        + struct.pack("<HHHHB", 2, 3, 2, 2, 0)  # 2x2 frame at (2,3)
        + bytes([2])
        + _subblocks(lzw)
        + b"\x3b"
    )
    d = _decode_gif(gif)
    assert (d["width"], d["height"]) == (8, 8)
    assert d["mean_level"] is None

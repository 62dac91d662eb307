"""TIFF pixel-decode tests, mirroring test_gif_decode.py: an INDEPENDENT
file builder + TIFF-LZW encoder (MSB-first bit packing, EARLY code-width
change — grown from the test's own counter, not the package's table
length) exercises the full strip decode path; unsupported variants must
degrade to header-only metadata and structural damage must raise
ValueError."""

import struct

import numpy as np
import pytest

from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
    _packbits_decode,
    _tiff_lzw_decode,
    decode_image,
    synthesize_media,
)

# ---- independent encoders ---------------------------------------------------


def _lzw_encode_tiff(data, count_flush=True):
    """TIFF-variant LZW encoder: bytes-keyed table, MSB-first packing,
    width grows EARLY (when the next free code reaches (1<<w)-1).

    ``count_flush=True`` mirrors libtiff (tif_lzw.c LZWPostEncode): the
    flush of the final pending sequence counts against the code table
    (free_ent++ with no string recorded) and can bump the width before
    EOI — which keeps a lagged-add decoder in sync at the 510/1022/2046
    boundaries.  ``count_flush=False`` mirrors the TIFF6 §13 pseudocode
    literally (no count, EOI at the old width); the package decoder must
    accept BOTH (its old-width EOI tolerance)."""
    clear, eoi = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = eoi + 1
    width = 9
    acc = nbits = 0
    out = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1  # keep the accumulator bounded

    emit(clear)
    seq = b""
    for b in bytes(data):
        nxt = seq + bytes([b])
        if nxt in table:
            seq = nxt
            continue
        emit(table[seq])
        if next_code < 4096:
            table[nxt] = next_code
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
        seq = bytes([b])
    if seq:
        emit(table[seq])
        if count_flush and next_code < 4096:
            next_code += 1
            if next_code == (1 << width) - 1 and width < 12:
                width += 1
    emit(eoi)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data):
    """Naive PackBits: runs of >=3 as repeats, the rest as literals."""
    out = bytearray()
    i = 0
    data = bytes(data)
    while i < len(data):
        run = 1
        while i + run < len(data) and data[i + run] == data[i] and run < 128:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit_start = i
        while (
            i < len(data)
            and i - lit_start < 128
            and not (
                i + 2 < len(data) and data[i] == data[i + 1] == data[i + 2]
            )
        ):
            i += 1
        out += bytes([i - lit_start - 1]) + data[lit_start:i]
    return bytes(out)


def _build_tiff(
    w,
    h,
    channels,
    pixels,
    bo="<",
    compression=1,
    predictor=1,
    rows_per_strip=None,
    photometric=None,
):
    """Assemble a spec-valid striped TIFF around the independent
    encoders.  `pixels` is an (h, w, channels) uint8 array in display
    order; strips are cut, predicted and compressed here, independently
    of the package's decode path."""
    rows_per_strip = rows_per_strip or h
    photometric = photometric if photometric is not None else (
        1 if channels < 3 else 2
    )
    px = np.asarray(pixels, np.uint8).reshape(h, w, channels)
    strips = []
    for y0 in range(0, h, rows_per_strip):
        band = px[y0 : y0 + rows_per_strip]
        if predictor == 2:
            band = np.concatenate(
                [band[:, :1], np.diff(band.astype(np.int16), axis=1)], axis=1
            ).astype(np.uint8)
        raw = band.tobytes()
        if compression == 5:
            strips.append(_lzw_encode_tiff(raw))
        elif compression == 32773:
            strips.append(_packbits_encode(raw))
        else:
            strips.append(raw)
    n_strips = len(strips)
    tags = [
        (256, 3, 1, [w]),
        (257, 3, 1, [h]),
        (258, 3, channels, [8] * channels),
        (259, 3, 1, [compression]),
        (262, 3, 1, [photometric]),
        (273, 4, n_strips, None),  # offsets patched below
        (277, 3, 1, [channels]),
        (278, 3, 1, [rows_per_strip]),
        (279, 4, n_strips, [len(s) for s in strips]),
    ]
    if predictor != 1:
        tags.append((317, 3, 1, [predictor]))
    tags.sort()
    ifd_end = 8 + 2 + len(tags) * 12 + 4
    # external value area: any tag whose values exceed 4 bytes
    sizes = {3: 2, 4: 4}
    ext = bytearray()
    ext_offsets = {}
    for tag, ftype, count, vals in tags:
        if count * sizes[ftype] > 4:
            ext_offsets[tag] = ifd_end + len(ext)
            if vals is not None:
                ext += struct.pack(
                    f"{bo}{count}{'H' if ftype == 3 else 'I'}", *vals
                )
            else:
                ext += b"\x00" * (count * sizes[ftype])
    data_start = ifd_end + len(ext)
    offsets = []
    pos = data_start
    for s in strips:
        offsets.append(pos)
        pos += len(s)
    out = bytearray()
    out += (b"II*\x00" if bo == "<" else b"MM\x00*") + struct.pack(
        f"{bo}I", 8
    )
    out += struct.pack(f"{bo}H", len(tags))
    for tag, ftype, count, vals in tags:
        if tag == 273:
            vals = offsets
        out += struct.pack(f"{bo}HHI", tag, ftype, count)
        if count * sizes[ftype] > 4:
            out += struct.pack(f"{bo}I", ext_offsets[tag])
        else:
            fmt = "H" if ftype == 3 else "I"
            packed = struct.pack(f"{bo}{count}{fmt}", *vals)
            out += packed + b"\x00" * (4 - len(packed))
    out += struct.pack(f"{bo}I", 0)
    # patch StripOffsets into the external area if they spilled
    if 273 in ext_offsets:
        ext_pos = ext_offsets[273] - ifd_end
        ext[ext_pos : ext_pos + 4 * n_strips] = struct.pack(
            f"{bo}{n_strips}I", *offsets
        )
    out += ext
    for s in strips:
        out += s
    return bytes(out)


def _rng(seed):
    return np.random.default_rng(seed)


# ---- codec primitives -------------------------------------------------------


def test_tiff_lzw_roundtrip_random():
    data = _rng(1).integers(0, 256, 50000).astype(np.uint8).tobytes()
    assert bytes(_tiff_lzw_decode(_lzw_encode_tiff(data))) == data


def test_tiff_lzw_large_stream_stays_linear():
    # 400k incompressible bytes ≈ 570k compressed: the decoder must
    # truncate its bit accumulator or this turns quadratic (minutes)
    import time

    data = _rng(11).integers(0, 256, 400_000).astype(np.uint8).tobytes()
    enc = _lzw_encode_tiff(data)
    t0 = time.time()
    assert bytes(_tiff_lzw_decode(enc)) == data
    assert time.time() - t0 < 30  # measured ~0.2s; was ~35s unbounded


def test_zero_count_ifd_entry_refused():
    f = bytearray(_build_tiff(4, 4, 1, np.zeros((4, 4, 1), np.uint8)))
    at = f.index(struct.pack("<HHI", 256, 3, 1))
    struct.pack_into("<HHI", f, at, 256, 3, 0)  # ImageWidth count=0
    with pytest.raises(ValueError):
        decode_image(bytes(f))


def test_strip_count_rowsperstrip_mismatch_refused():
    px = np.zeros((12, 8, 1), np.uint8)
    f = bytearray(_build_tiff(8, 12, 1, px, rows_per_strip=4))  # 3 strips
    at = f.index(struct.pack("<HHI", 278, 3, 1)) + 8
    struct.pack_into("<H", f, at, 6)  # claims 2 strips, table has 3
    with pytest.raises(ValueError):
        decode_image(bytes(f))


def test_tiff_lzw_truncation_refused():
    data = _lzw_encode_tiff(b"abcabcabc" * 100)
    with pytest.raises(ValueError):
        _tiff_lzw_decode(data[: len(data) // 2])


def test_packbits_roundtrip_mixed_runs():
    data = b"\x01" * 10 + bytes(range(50)) + b"\xff" * 200 + b"ab"
    assert bytes(_packbits_decode(_packbits_encode(data))) == data


# ---- full-file decode -------------------------------------------------------


def test_uncompressed_gray_mean_exact():
    px = _rng(2).integers(0, 256, (9, 14, 1)).astype(np.uint8)
    d = decode_image(_build_tiff(14, 9, 1, px))
    assert (d["format"], d["width"], d["height"], d["channels"]) == (
        "tiff", 14, 9, 1,
    )
    assert d["mean_level"] == pytest.approx(float(px.mean()), abs=1e-9)


def test_uncompressed_rgb_multistrip_big_endian():
    px = _rng(3).integers(0, 256, (15, 10, 3)).astype(np.uint8)
    d = decode_image(_build_tiff(10, 15, 3, px, bo=">", rows_per_strip=4))
    assert d["channels"] == 3
    assert d["mean_level"] == pytest.approx(float(px.mean()), abs=1e-9)


def test_packbits_strips_decode():
    base = np.zeros((12, 20, 1), np.uint8)
    base[3:7, 4:16] = 200  # long runs for the RLE to earn its keep
    d = decode_image(_build_tiff(20, 12, 1, base, compression=32773,
                                 rows_per_strip=5))
    assert d["mean_level"] == pytest.approx(float(base.mean()), abs=1e-9)


def test_lzw_strips_decode():
    px = _rng(4).integers(0, 256, (11, 13, 3)).astype(np.uint8)
    d = decode_image(_build_tiff(13, 11, 3, px, compression=5))
    assert d["mean_level"] == pytest.approx(float(px.mean()), abs=1e-9)


def test_lzw_with_horizontal_predictor():
    px = _rng(5).integers(0, 256, (8, 9, 3)).astype(np.uint8)
    d = decode_image(_build_tiff(9, 8, 3, px, compression=5, predictor=2))
    assert d["mean_level"] == pytest.approx(float(px.mean()), abs=1e-9)


# ---- graceful degradation and refusals --------------------------------------


def test_unsupported_variant_degrades_to_header_only():
    # a compression outside the decodable subset is valid TIFF: dims
    # stay real, mean_level stays None, no exception
    px = np.zeros((4, 4, 3), np.uint8)
    f = _build_tiff(4, 4, 3, px)
    f = f.replace(
        struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 1, 0),
        struct.pack("<HHI", 259, 3, 1) + struct.pack("<HH", 7, 0),  # JPEG
    )
    d = decode_image(f)
    assert (d["width"], d["height"]) == (4, 4)
    assert d["mean_level"] is None


def test_strip_past_eof_refused():
    px = np.zeros((4, 4, 1), np.uint8)
    f = _build_tiff(4, 4, 1, px)
    with pytest.raises(ValueError):
        decode_image(f[:-8])  # strip data truncated


def test_short_pixel_data_refused():
    # strip present but shorter than width*height*channels
    px = np.zeros((4, 4, 1), np.uint8)
    f = bytearray(_build_tiff(4, 4, 1, px))
    # shrink the declared ByteCount AND the payload
    cnt_at = f.index(struct.pack("<HHI", 279, 4, 1)) + 8
    struct.pack_into("<I", f, cnt_at, 4)
    with pytest.raises(ValueError):
        decode_image(bytes(f[:-12]))


# ---- the forge and the decoder agree ----------------------------------------


def test_synthesize_media_tiff_decodes_to_closed_form():
    # doc_id % 3 picks the compression sub-variant: 0 → uncompressed
    # constant, 1 → LZW byte ramp (boundary-crossing), 2 → PackBits
    # constant; the sweep covers all three plus the small-strip LZW
    # fallback gate
    seen = set()
    for doc_id in (2, 9, 16, 23, 30, 37, 44, 51, 58):
        assert doc_id % 7 == 2
        w, h, ch = 16 + doc_id % 48, 8 + doc_id % 24, 1 + doc_id % 4
        d = decode_image(synthesize_media(doc_id))
        assert (d["format"], d["width"], d["height"], d["channels"]) == (
            "tiff", w, h, ch,
        )
        n = w * h * ch
        if doc_id % 3 == 1 and n >= 256:
            seen.add("lzw")
            q, r = divmod(n, 256)
            exp = (32640 * q + r * (r - 1) / 2) / n
        else:
            seen.add("packbits" if doc_id % 3 == 2 else "constant")
            exp = float(doc_id % 256)
        assert d["mean_level"] == pytest.approx(exp, abs=1e-9)
    assert seen == {"lzw", "packbits", "constant"}


def test_synthesize_media_lzw_tiffs_cross_width_boundary():
    """Every LZW-compressed forge TIFF must cross at least one code-width
    boundary (that is the point of the sub-variant — the r9 escape was
    only reachable past 510 table adds, which the old constant-strip
    forge never approached)."""
    from test_decoder_properties import _tiff_flush_next_code

    checked = 0
    for doc_id in range(2, 2 + 7 * 40, 7):  # kind 2 ids
        w, h, ch = 16 + doc_id % 48, 8 + doc_id % 24, 1 + doc_id % 4
        n = w * h * ch
        if doc_id % 3 != 1 or n < 256:
            continue
        ramp = bytes(i % 256 for i in range(n))
        assert _tiff_flush_next_code(ramp) > 510
        # and the decoder round-trips the actual forged payload
        d = decode_image(synthesize_media(doc_id))
        q, r = divmod(n, 256)
        assert d["mean_level"] == pytest.approx(
            (32640 * q + r * (r - 1) / 2) / n, abs=1e-9
        )
        checked += 1
    assert checked >= 8


def _emit_codes(codes_and_widths):
    """Pack (code, width) pairs MSB-first, zero-padding the final byte —
    a raw bit emitter for crafting adversarial LZW streams directly."""
    acc = nbits = 0
    out = bytearray()
    for code, width in codes_and_widths:
        acc = (acc << width) | code
        nbits += width
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8
        acc &= (1 << nbits) - 1
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _boundary_prefix():
    """clear + 253 zero literals at 9 bits: the decoder's lagged add lands
    the table exactly on 510 after the 253rd data code, bumping the width
    to 10 with just_bumped set — the r9/ADVICE-r10 tolerance window."""
    return [(256, 9)] + [(0, 9)] * 253


def test_lzw_old_width_eoi_primitive_still_accepted():
    # non-counting writer: EOI at the OLD width right after the boundary
    # bump, followed by sub-byte zero padding — must decode (TIFF6 §13
    # literal writers depend on this).
    stream = _emit_codes(_boundary_prefix() + [(257, 9)])
    assert bytes(_tiff_lzw_decode(stream)) == b"\x00" * 253


def test_lzw_post_bump_beyond_table_with_trailing_data_raises():
    # ADVICE r10: code 514 at the new width (top 9 bits == EOI) but the
    # stream is NOT exhausted — pre-fix this silently returned truncated
    # output from the primitive; it must raise.
    stream = _emit_codes(_boundary_prefix() + [(514, 10)]) + b"\xff"
    with pytest.raises(ValueError):
        _tiff_lzw_decode(stream)


def test_lzw_post_bump_beyond_table_nonzero_padding_raises():
    # ADVICE r10: code 515 (old-width EOI + a NON-zero over-read bit) at
    # end of stream — the padding is not zero, so this is corruption, not
    # a non-counting writer's EOI; it must raise.
    stream = _emit_codes(_boundary_prefix() + [(515, 10)])
    with pytest.raises(ValueError):
        _tiff_lzw_decode(stream)


def test_lzw_post_bump_beyond_table_aligned_eoi_accepted():
    # the legitimate shape of the line-474 path: old-width EOI whose zero
    # byte-padding pushes the new-width reading beyond the table (code
    # 514, even over-read bit, exhausted stream, zero accumulator).
    stream = _emit_codes(_boundary_prefix() + [(514, 10)])
    assert bytes(_tiff_lzw_decode(stream)) == b"\x00" * 253

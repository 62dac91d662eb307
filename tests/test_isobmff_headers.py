"""AVIF/HEIC ISOBMFF header-parse tests: a hand-assembled box tree
(independent of the parser's walk) exercises ftyp brand recognition,
meta/iprp/ipco traversal, pitm+ipma primary-item property resolution,
64-bit largesize boxes, and structural refusals.  Pixel decode is
codec-gated (mean_level None — the lossy-WebP/MP3 contract)."""

import struct

import pytest

from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
    _parse_isobmff,
    decode_image,
)


def box(btype: bytes, body: bytes, large: bool = False) -> bytes:
    if large:
        return struct.pack(">I", 1) + btype + struct.pack(
            ">Q", 16 + len(body)
        ) + body
    return struct.pack(">I", 8 + len(body)) + btype + body


def ftyp(major=b"avif", compat=(b"avif", b"mif1")) -> bytes:
    return box(b"ftyp", major + b"\x00\x00\x00\x00" + b"".join(compat))


def ispe(w: int, h: int) -> bytes:
    return box(b"ispe", b"\x00\x00\x00\x00" + struct.pack(">II", w, h))


def pixi(channels: int) -> bytes:
    return box(
        b"pixi", b"\x00\x00\x00\x00" + bytes([channels] + [8] * channels)
    )


def pitm(item_id: int) -> bytes:
    return box(b"pitm", b"\x00\x00\x00\x00" + struct.pack(">H", item_id))


def ipma(entries: dict) -> bytes:
    """entries: item_id -> list of 1-based ipco property indices."""
    body = b"\x00\x00\x00\x00" + struct.pack(">I", len(entries))
    for item_id, idxs in entries.items():
        body += struct.pack(">H", item_id) + bytes([len(idxs)] + idxs)
    return box(b"ipma", body)


def avif_file(
    props: bytes,
    meta_extra: bytes = b"",
    iprp_extra: bytes = b"",
    major=b"avif",
) -> bytes:
    # spec layout: meta > [pitm, ...] + iprp > ipco + ipma
    meta = b"\x00\x00\x00\x00" + meta_extra + box(
        b"iprp", box(b"ipco", props) + iprp_extra
    )
    return ftyp(major=major) + box(b"meta", meta)


def test_single_image_first_ispe():
    d = decode_image(avif_file(ispe(640, 480) + pixi(3)))
    assert (d["format"], d["width"], d["height"], d["channels"]) == (
        "avif", 640, 480, 3,
    )
    assert d["mean_level"] is None  # pixel decode needs an AV1 codec


def test_primary_item_resolution_skips_alpha_aux():
    # ipco holds the ALPHA auxiliary image's properties first (1-channel,
    # different dims); pitm+ipma must pick the primary item's ispe/pixi
    props = ispe(100, 50) + pixi(1) + ispe(320, 200) + pixi(3)
    d = _parse_isobmff(
        avif_file(
            props,
            meta_extra=pitm(2),
            iprp_extra=ipma({1: [1, 2], 2: [3, 4]}),
        )
    )
    assert (d["width"], d["height"], d["channels"]) == (320, 200, 3)


def test_heic_brand_and_default_channels():
    d = _parse_isobmff(avif_file(ispe(64, 32), major=b"heic"))
    assert d["format"] == "heic"
    assert d["channels"] == 3  # no pixi: default


def test_compatible_brand_fallback():
    # unknown major brand, avif in the compatible list
    d = _parse_isobmff(avif_file(ispe(8, 8), major=b"ma1b"))
    assert d["format"] == "avif"


def test_largesize_box_walk():
    meta = b"\x00\x00\x00\x00" + box(b"iprp", box(b"ipco", ispe(12, 34)))
    d = _parse_isobmff(ftyp() + box(b"meta", meta, large=True))
    assert (d["width"], d["height"]) == (12, 34)


def test_refusals():
    with pytest.raises(ValueError):  # recognized brand but no ispe
        _parse_isobmff(avif_file(pixi(3)))
    with pytest.raises(ValueError):  # unrecognized brands throughout
        _parse_isobmff(ftyp(major=b"mp42", compat=(b"isom",)))
    with pytest.raises(ValueError):  # box overruns the payload
        _parse_isobmff(ftyp() + struct.pack(">I", 4096) + b"meta")


def test_truncated_box_bodies_raise_valueerror_not_indexerror():
    """ADVICE r7: crafted/truncated ftyp/pitm/ipma bodies must raise the
    structural-damage ValueError through the public decode_image
    contract, never an IndexError from indexing past a box body."""
    # empty ftyp body: no brand bytes at all
    with pytest.raises(ValueError):
        _parse_isobmff(box(b"ftyp", b""))
    # empty / sub-minimal pitm body inside meta
    with pytest.raises(ValueError):
        _parse_isobmff(
            avif_file(ispe(8, 8), meta_extra=box(b"pitm", b""))
        )
    with pytest.raises(ValueError):
        _parse_isobmff(
            avif_file(
                ispe(8, 8), meta_extra=box(b"pitm", b"\x00\x00\x00\x00")
            )
        )
    # ipma whose declared entry count runs past the box body
    bad_ipma = box(
        b"ipma", b"\x00\x00\x00\x00" + struct.pack(">I", 3) + b"\x00\x01"
    )
    with pytest.raises(ValueError):
        _parse_isobmff(
            avif_file(ispe(8, 8), meta_extra=pitm(1), iprp_extra=bad_ipma)
        )
    # ipma association indices truncated mid-list
    bad_ipma2 = box(
        b"ipma",
        b"\x00\x00\x00\x00"
        + struct.pack(">I", 1)
        + struct.pack(">H", 1)
        + bytes([4, 1]),  # declares 4 associations, supplies 1
    )
    with pytest.raises(ValueError):
        _parse_isobmff(
            avif_file(ispe(8, 8), meta_extra=pitm(1), iprp_extra=bad_ipma2)
        )


def test_decode_media_routes_avif(spark):
    from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
        decode_media,
    )

    df = spark.createDataFrame(
        [(1, "image", bytearray(avif_file(ispe(77, 33) + pixi(4))))],
        "asset_id long, kind string, payload binary",
    )
    row = decode_media(df).collect()[0]
    assert (row.format, row.width, row.height, row.channels) == (
        "avif", 77, 33, 4,
    )


def test_synthesize_media_avif_decodes_to_closed_form():
    from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
        synthesize_media,
    )

    for doc_id in (22, 50, 78, 106):  # kind 1, doc_id % 4 == 2 => AVIF
        assert doc_id % 7 == 1 and doc_id % 4 == 2
        d = decode_image(synthesize_media(doc_id))
        assert d["format"] == "avif"
        assert (d["width"], d["height"]) == (
            16 + doc_id % 48, 8 + doc_id % 24,
        )
        assert d["channels"] == 3 and d["mean_level"] is None

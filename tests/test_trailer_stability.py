"""Benign-trailer OUTPUT-STABILITY properties (VERDICT r8 task #5).

The r8 mutation-fuzz sweep proved the decoders never crash-or-mislabel
under structural damage (the ValueError contract).  This is the
complementary property: trailers a real encoder/tagger may legally
append — ID3v1 / TAG+ / LYRICS3 / APEv2 / zero padding after MPEG audio
frames, free/skip/mdat boxes after an ISOBMFF container — must leave
the parsed metadata BIT-IDENTICAL to the trailer-less parse.  A trailer
that changed duration_ms or width would mean the walker read past the
logical end of the stream.

Deterministic seeded randomness (no wall-clock, no global random state),
same discipline as the r8 mutation fuzz.
"""

import random
import struct

from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
    _parse_isobmff,
    decode_audio,
)

from test_isobmff_headers import avif_file, box, ftyp, ipma, ispe, pitm, pixi  # noqa: F401
from test_media_headers import _M1L3, _id3v2, _mp3_frames

N_ITER = 200


def _mp3_bases() -> list:
    """Representative valid MPEG streams: bare frames, ID3v2-prefixed,
    and a padded-frame variant (padding bit set, frame length +1)."""
    plain = _mp3_frames(
        5, _M1L3["b1"], _M1L3["b2"], _M1L3["b3"], _M1L3["flen"]
    )
    tagged = _id3v2(57) + _mp3_frames(
        4, _M1L3["b1"], _M1L3["b2"], _M1L3["b3"], _M1L3["flen"]
    )
    padded = _mp3_frames(
        3, _M1L3["b1"], _M1L3["b2"] | 0x02, _M1L3["b3"], _M1L3["flen"] + 1
    )
    return [plain, tagged, padded]


def _id3v1(rng: random.Random) -> bytes:
    return b"TAG" + bytes(rng.randrange(32, 127) for _ in range(125))


def _lyrics3_v1(rng: random.Random) -> bytes:
    text = bytes(rng.randrange(32, 127) for _ in range(rng.randrange(0, 5100)))
    return b"LYRICSBEGIN" + text + b"LYRICSEND"


def _lyrics3_v2(rng: random.Random) -> bytes:
    fields = bytes(rng.randrange(32, 127) for _ in range(rng.randrange(0, 900)))
    block = b"LYRICSBEGIN" + fields
    return block + b"%06d" % len(block) + b"LYRICS200"


def _ape_footer(rng: random.Random) -> bytes:
    return b"APETAGEX" + bytes(rng.randrange(0, 256) for _ in range(24))


def _random_trailer(rng: random.Random) -> bytes:
    kind = rng.randrange(8)
    if kind == 0:
        return _id3v1(rng)
    if kind == 1:  # enhanced tag: 227-byte TAG+ block + ID3v1
        return b"TAG+" + bytes(
            rng.randrange(32, 127) for _ in range(223)
        ) + _id3v1(rng)
    if kind == 2:
        return _lyrics3_v1(rng)
    if kind == 3:
        return _lyrics3_v1(rng) + _id3v1(rng)
    if kind == 4:
        return _lyrics3_v2(rng)
    if kind == 5:
        return _lyrics3_v2(rng) + _id3v1(rng)
    if kind == 6:
        return _ape_footer(rng)
    return b"\x00" * rng.randrange(1, 512)  # encoder flush padding


def test_mp3_benign_trailers_leave_metadata_bit_identical():
    rng = random.Random(0x5EED8)
    bases = _mp3_bases()
    for base in bases:
        want = decode_audio(base)
        assert want["duration_ms"] > 0
        for _ in range(N_ITER):
            got = decode_audio(base + _random_trailer(rng))
            assert got == want


def test_mp3_stacked_trailers_leave_metadata_bit_identical():
    """Real files stack trailers (LYRICS3 then ID3v1 is the spec layout;
    padding before a tag happens with sloppy rippers) — any suffix built
    ONLY from recognized trailers, where the FIRST chunk alone is
    checked by the walker, must still parse identically.  The walker
    accepts the whole tail on its first recognized trailer, so stacking
    is stable by construction — pinned here so a future stricter
    tail-walk keeps the property."""
    rng = random.Random(0xCAFE9)
    base = _mp3_bases()[0]
    want = decode_audio(base)
    for _ in range(N_ITER // 4):
        tail = _lyrics3_v2(rng) + _id3v1(rng)
        assert decode_audio(base + tail) == want


def _isobmff_base() -> bytes:
    return avif_file(ispe(640, 480) + pixi(3))


def _random_box_trailer(rng: random.Random) -> bytes:
    kind = rng.randrange(4)
    body = bytes(rng.randrange(0, 256) for _ in range(rng.randrange(0, 64)))
    if kind == 0:
        return box(b"free", body)
    if kind == 1:
        return box(b"skip", body)
    if kind == 2:
        return box(b"mdat", body)
    return box(b"free", body, large=True)


def test_isobmff_benign_trailing_boxes_leave_metadata_bit_identical():
    rng = random.Random(0xB0CE5)
    base = _isobmff_base()
    want = _parse_isobmff(base)
    assert (want["width"], want["height"]) == (640, 480)
    for _ in range(N_ITER):
        n = rng.randrange(1, 4)
        tail = b"".join(_random_box_trailer(rng) for _ in range(n))
        assert _parse_isobmff(base + tail) == want


def test_isobmff_zero_padding_eight_bytes_or_more_is_stable():
    """>=8 zero bytes after the last box parse as a size-0 unknown box
    extending to EOF — ignored by the walk, metadata unchanged.  1-7
    trailing bytes cannot form a box header and stay a structural
    ValueError (the fuzz contract) — both pinned."""
    import pytest

    base = _isobmff_base()
    want = _parse_isobmff(base)
    for pad in (8, 9, 16, 200):
        assert _parse_isobmff(base + b"\x00" * pad) == want
    for pad in (1, 4, 7):
        with pytest.raises(ValueError):
            _parse_isobmff(base + b"\x00" * pad)


def test_mp3_trailer_never_extends_duration():
    """Adversarial twist: a trailer that EMBEDS valid-looking frame sync
    bytes inside a recognized trailer body must not add frames — the
    walker stops at the trailer boundary, it does not scan inside it."""
    base = _mp3_bases()[0]
    want = decode_audio(base)
    frame = _mp3_frames(
        1, _M1L3["b1"], _M1L3["b2"], _M1L3["b3"], _M1L3["flen"]
    )
    # ID3v1 whose comment field contains a frame header
    tag = (b"TAG" + frame[:100]).ljust(128, b"\x00")
    assert len(tag) == 128
    assert decode_audio(base + tag) == want
    # APEv2 footer carrying sync bytes
    ape = b"APETAGEX" + struct.pack(">I", 2000) + frame[:60]
    assert decode_audio(base + ape) == want

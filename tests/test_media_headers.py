"""WebP (VP8/VP8L/VP8X) header parse and MP3 frame-header walk — the
pure-stdlib metadata decoders (dims / duration / rate / channels; pixel
and PCM entropy decode stay gated on a codec library).  Streams are
forged from the specs, same style as test_jpeg_decode's forged encoder.
"""

import struct

import pytest

from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
    decode_audio,
    decode_image,
)


# ---- forgers --------------------------------------------------------------


def _webp(chunk_id: bytes, body: bytes) -> bytes:
    chunk = chunk_id + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _vp8_body(w: int, h: int) -> bytes:
    return b"\x00\x00\x00" + b"\x9d\x01\x2a" + struct.pack("<HH", w, h)


def _vp8l_body(w: int, h: int, alpha: int = 0) -> bytes:
    bits = (w - 1) | ((h - 1) << 14) | (alpha << 28)
    return bytes([0x2F]) + struct.pack("<I", bits)


def _vp8x_body(w: int, h: int, alpha: int = 0) -> bytes:
    return (
        bytes([0x10 if alpha else 0x00])
        + b"\x00\x00\x00"
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little")
    )


def _mp3_frames(n: int, b1: int, b2: int, b3: int, flen: int) -> bytes:
    frame = bytes([0xFF, b1, b2, b3]) + b"\x00" * (flen - 4)
    return frame * n


def _id3v2(tag_size: int) -> bytes:
    ss = bytes(
        [(tag_size >> 21) & 0x7F, (tag_size >> 14) & 0x7F,
         (tag_size >> 7) & 0x7F, tag_size & 0x7F]
    )
    return b"ID3\x04\x00\x00" + ss + b"\x00" * tag_size


# ---- WebP -----------------------------------------------------------------


def test_webp_vp8_lossy_dims():
    meta = decode_image(_webp(b"VP8 ", _vp8_body(320, 240)))
    assert meta["format"] == "webp"
    assert (meta["width"], meta["height"], meta["channels"]) == (320, 240, 3)
    assert meta["mean_level"] is None  # pixel decode needs a VP8 codec


def test_webp_vp8l_lossless_dims_and_alpha():
    meta = decode_image(_webp(b"VP8L", _vp8l_body(100, 75, alpha=1)))
    assert (meta["width"], meta["height"], meta["channels"]) == (100, 75, 4)
    meta = decode_image(_webp(b"VP8L", _vp8l_body(16383, 1)))
    assert (meta["width"], meta["height"], meta["channels"]) == (16383, 1, 3)


def test_webp_vp8x_extended_canvas():
    meta = decode_image(_webp(b"VP8X", _vp8x_body(4000, 3000, alpha=1)))
    assert (meta["width"], meta["height"], meta["channels"]) == (
        4000, 3000, 4,
    )


def test_webp_malformed_raises_valueerror():
    with pytest.raises(ValueError):
        decode_image(_webp(b"VP8 ", b"\x00\x00\x00WRONG" + b"\x00" * 8))
    with pytest.raises(ValueError):  # no bitstream chunk at all
        decode_image(_webp(b"EXIF", b"\x00" * 16))


# ---- MP3 ------------------------------------------------------------------

# MPEG1 Layer III, 128 kbit/s (idx 9), 44100 Hz (idx 0), stereo:
# frame length = 144 * 128000 // 44100 = 417, 1152 samples/frame
_M1L3 = dict(b1=0xFB, b2=0x90, b3=0x00, flen=417, spf=1152, rate=44100)


def test_mp3_frame_walk_duration():
    raw = _mp3_frames(10, _M1L3["b1"], _M1L3["b2"], _M1L3["b3"], _M1L3["flen"])
    meta = decode_audio(raw)
    assert meta["format"] == "mp3"
    assert meta["sample_rate"] == 44100
    assert meta["channels"] == 2
    assert meta["duration_ms"] == int(10 * 1152 / 44100 * 1000)
    assert meta["rms"] is None  # PCM decode needs a codec library


def test_mp3_id3v2_skip_and_trailing_tag():
    raw = (
        _id3v2(100)
        + _mp3_frames(4, _M1L3["b1"], _M1L3["b2"], _M1L3["b3"], _M1L3["flen"])
        + b"TAG" + b"\x00" * 125  # ID3v1 trailer must not desync the walk
    )
    meta = decode_audio(raw)
    assert meta["duration_ms"] == int(4 * 1152 / 44100 * 1000)


def test_mp3_mono_mpeg2():
    # MPEG2 Layer III, 64 kbit/s (idx 8), 22050 Hz (idx 0), mono:
    # 576 samples/frame, frame length = 72 * 64000 // 22050 = 208
    raw = _mp3_frames(6, 0xF3, 0x80, 0xC0, 208)
    meta = decode_audio(raw)
    assert meta["sample_rate"] == 22050
    assert meta["channels"] == 1
    assert meta["duration_ms"] == int(6 * 576 / 22050 * 1000)


def test_mp3_padding_bit_changes_frame_length():
    # padding bit set: frame is one byte longer; a walk ignoring it
    # desyncs at frame 2 and the test catches it
    raw = _mp3_frames(3, _M1L3["b1"], _M1L3["b2"] | 0x02, _M1L3["b3"], 418)
    meta = decode_audio(raw)
    assert meta["duration_ms"] == int(3 * 1152 / 44100 * 1000)


def test_mp3_garbage_raises_valueerror():
    with pytest.raises(ValueError):
        decode_audio(b"ID3\x04\x00\x00\x00\x00\x00\x02\x00\x00garbage")
    with pytest.raises(ValueError):  # free-format bitrate idx 0 refused
        decode_audio(bytes([0xFF, 0xFB, 0x00, 0x00]) + b"\x00" * 400)


# ---- kernel routing -------------------------------------------------------


def test_decode_media_routes_webp_and_mp3(spark):
    from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
        decode_media,
    )

    webp = _webp(b"VP8 ", _vp8_body(64, 48))
    mp3 = _mp3_frames(
        8, _M1L3["b1"], _M1L3["b2"], _M1L3["b3"], _M1L3["flen"]
    )
    df = spark.createDataFrame(
        [(1, "image", bytearray(webp)), (2, "audio", bytearray(mp3))],
        "asset_id long, kind string, payload binary",
    )
    out = {r.asset_id: r for r in decode_media(df).collect()}
    assert out[1].format == "webp"
    assert (out[1].width, out[1].height) == (64, 48)
    assert out[2].format == "mp3"
    assert out[2].sample_rate == 44100
    assert out[2].duration_ms == int(8 * 1152 / 44100 * 1000)


# ---- TIFF -----------------------------------------------------------------


def _tiff(w: int, h: int, bo: str = "<", channels: int = 3) -> bytes:
    import struct as s

    magic = b"II*\x00" if bo == "<" else b"MM\x00*"
    entries = [
        (256, 3, 1, w),        # ImageWidth SHORT
        (257, 4, 1, h),        # ImageLength LONG
        (277, 3, 1, channels), # SamplesPerPixel SHORT
    ]
    ifd = s.pack(f"{bo}H", len(entries))
    for tag, ftype, count, val in entries:
        ifd += s.pack(f"{bo}HHI", tag, ftype, count)
        ifd += s.pack(f"{bo}I" if ftype == 4 else f"{bo}HH", *(
            (val,) if ftype == 4 else (val, 0)
        ))
    ifd += s.pack(f"{bo}I", 0)  # no next IFD
    return magic + s.pack(f"{bo}I", 8) + ifd


def test_tiff_dims_both_byte_orders():
    for bo in ("<", ">"):
        meta = decode_image(_tiff(640, 480, bo=bo, channels=3))
        assert meta["format"] == "tiff"
        assert (meta["width"], meta["height"], meta["channels"]) == (
            640, 480, 3,
        )
        # no StripOffsets/ByteCounts tags → header-only metadata
        # (full pixel decode is covered in tests/test_tiff_decode.py)
        assert meta["mean_level"] is None


def test_tiff_malformed_raises_valueerror():
    with pytest.raises(ValueError):
        decode_image(b"II*\x00\xff\xff\xff\xff")  # IFD offset OOB
    # IFD present but no dimension tags
    raw = b"II*\x00" + struct.pack("<I", 8) + struct.pack("<H", 0) + b"\x00" * 4
    with pytest.raises(ValueError):
        decode_image(raw)


# ---- FLAC -----------------------------------------------------------------


def _flac(sample_rate: int, channels: int, bps: int, n_samples: int) -> bytes:
    bits = (
        (sample_rate << 44)
        | ((channels - 1) << 41)
        | ((bps - 1) << 36)
        | n_samples
    )
    si = b"\x00" * 10 + bits.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + si


def test_flac_streaminfo():
    meta = decode_audio(_flac(44100, 2, 16, 441000))
    assert meta["format"] == "flac"
    assert meta["sample_rate"] == 44100
    assert meta["channels"] == 2
    assert meta["bits"] == 16
    assert meta["duration_ms"] == 10000
    assert meta["rms"] is None


def test_flac_mono_hires():
    meta = decode_audio(_flac(96000, 1, 24, 96000 * 3 + 48000))
    assert (meta["channels"], meta["bits"]) == (1, 24)
    assert meta["duration_ms"] == 3500


def test_flac_malformed_raises_valueerror():
    with pytest.raises(ValueError):
        decode_audio(b"fLaC\x00\x00\x00\x05short")
    # first block is not STREAMINFO
    bad = b"fLaC" + b"\x84" + (34).to_bytes(3, "big") + b"\x00" * 34
    with pytest.raises(ValueError):
        decode_audio(bad)


# ---- BMP pixel mean ---------------------------------------------------------


def _bmp(px, bpp, compression=0, top_down=False):
    """Independent BMP builder: (h, w, ch) uint8 pixels, BI_RGB rows
    padded to 4 bytes."""
    import struct as s

    h, w, ch = px.shape
    stride = (w * ch + 3) & ~3
    rows = bytearray()
    for y in range(h):
        row = bytes(px[y].reshape(-1)) + b"\x00" * (stride - w * ch)
        rows += row
    off = 14 + 40
    header = b"BM" + s.pack("<IHHI", off + len(rows), 0, 0, off)
    dib = s.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, bpp,
        compression, len(rows), 2835, 2835, 0, 0,
    )
    return header + dib + bytes(rows)


def test_bmp_uncompressed_mean_exact():
    import numpy as np

    rng = np.random.default_rng(31)
    for ch, bpp in ((3, 24), (4, 32)):
        px = rng.integers(0, 256, (5, 7, ch)).astype(np.uint8)
        d = decode_image(_bmp(px, bpp))
        assert (d["format"], d["width"], d["height"]) == ("bmp", 7, 5)
        # mean over B,G,R only — alpha excluded by design
        assert d["mean_level"] == pytest.approx(
            float(px[:, :, :3].mean()), abs=1e-9
        )
        # top-down (negative height) has the same mean
        d2 = decode_image(_bmp(px, bpp, top_down=True))
        assert d2["mean_level"] == d["mean_level"]


def test_bmp_compressed_variant_degrades_to_header():
    import numpy as np

    px = np.zeros((4, 4, 3), np.uint8)
    d = decode_image(_bmp(px, 24, compression=1))  # BI_RLE8-style id
    assert (d["width"], d["height"]) == (4, 4)
    assert d["mean_level"] is None


def test_bmp_truncated_pixels_refused():
    import numpy as np

    px = np.full((6, 6, 3), 9, np.uint8)
    f = _bmp(px, 24)
    with pytest.raises(ValueError):
        decode_image(f[: len(f) - 30])


def test_bmp_pixel_offset_inside_header_refused():
    """A crafted pixel_offset pointing at the headers must not average
    header bytes into a 'real' mean (reproduced pre-fix: offset 0 on an
    all-0xFF image returned 17.75 instead of 255.0)."""
    import numpy as np
    import struct as s

    px = np.full((2, 2, 3), 0xFF, np.uint8)
    f = bytearray(_bmp(px, 24))
    s.pack_into("<I", f, 10, 0)  # pixel_offset = 0
    with pytest.raises(ValueError):
        decode_image(bytes(f))


def test_mp3_midstream_desync_raises_valueerror():
    """Unrecognized bytes BETWEEN frames are a desync, not a trailer:
    the walk must error (→ fake_decode) rather than silently truncate
    the duration (VERDICT r6 contract)."""
    frames = _mp3_frames(
        3, _M1L3["b1"], _M1L3["b2"], _M1L3["b3"], _M1L3["flen"]
    )
    with pytest.raises(ValueError):
        decode_audio(frames + b"garbage-not-a-tag" + frames)
    # zero padding after the last frame is fine (encoder flush)
    meta = decode_audio(frames + b"\x00" * 37)
    assert meta["duration_ms"] == int(3 * 1152 / 44100 * 1000)
    # APEv2 footer is a recognized trailer
    meta = decode_audio(frames + b"APETAGEX" + b"\x00" * 24)
    assert meta["duration_ms"] == int(3 * 1152 / 44100 * 1000)


def test_mp3_lyrics3_and_enhanced_tag_trailers():
    """ADVICE r7: LYRICS3 v1/v2 and enhanced TAG+ trailers are benign —
    the walk must return the real frame metadata, not fall back to
    fake_decode."""
    frames = _mp3_frames(
        3, _M1L3["b1"], _M1L3["b2"], _M1L3["b3"], _M1L3["flen"]
    )
    want = int(3 * 1152 / 44100 * 1000)
    # LYRICS3v2: LYRICSBEGIN ... size + LYRICS200, then ID3v1
    lyr2 = (
        b"LYRICSBEGIN" + b"LYR00011hello world" + b"000030LYRICS200"
        + b"TAG" + b"\x00" * 125
    )
    assert decode_audio(frames + lyr2)["duration_ms"] == want
    # LYRICS3v1: LYRICSBEGIN ... LYRICSEND, no ID3v1
    assert (
        decode_audio(frames + b"LYRICSBEGIN" + b"some text" + b"LYRICSEND")[
            "duration_ms"
        ]
        == want
    )
    # enhanced tag: 227-byte TAG+ block followed by the 128-byte ID3v1
    tagplus = b"TAG+" + b"\x00" * 223 + b"TAG" + b"\x00" * 125
    assert decode_audio(frames + tagplus)["duration_ms"] == want
    # but a TAG+ of the wrong length is still a desync
    with pytest.raises(ValueError):
        decode_audio(frames + b"TAG+" + b"\x00" * 10)


def test_mp3_lyrics3_without_terminator_is_desync():
    """ADVICE r8: a tail that merely STARTS with 'LYRICSBEGIN' is not a
    LYRICS3 trailer — without a valid terminator ('LYRICSEND', or
    size+'LYRICS200' with a size that checks out) it is a mid-stream
    desync and must raise, not silently truncate the duration."""
    frames = _mp3_frames(
        3, _M1L3["b1"], _M1L3["b2"], _M1L3["b3"], _M1L3["flen"]
    )
    # no terminator at all
    with pytest.raises(ValueError):
        decode_audio(frames + b"LYRICSBEGIN" + b"garbage desync bytes")
    # v2 terminator present but the 6-digit size is wrong
    with pytest.raises(ValueError):
        decode_audio(
            frames + b"LYRICSBEGIN" + b"xyz" + b"999999LYRICS200"
        )
    # v2 size digits are not digits
    with pytest.raises(ValueError):
        decode_audio(
            frames + b"LYRICSBEGIN" + b"xyz" + b"00zz30LYRICS200"
        )
    # v1 block over the 5100-byte spec cap
    with pytest.raises(ValueError):
        decode_audio(
            frames + b"LYRICSBEGIN" + b"x" * 5200 + b"LYRICSEND"
        )
    # valid v2 WITHOUT a trailing ID3v1 still accepted
    lyr2 = b"LYRICSBEGIN" + b"LYR00011hello world" + b"000030LYRICS200"
    want = int(3 * 1152 / 44100 * 1000)
    assert decode_audio(frames + lyr2)["duration_ms"] == want


# ---- WAV PCM widths --------------------------------------------------------


def _wav(bits: int, data: bytes, channels: int = 1, rate: int = 8000) -> bytes:
    block = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * block, block, bits)
    body = (
        b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_8bit_unsigned_rms():
    import struct as _s  # noqa: F401
    from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
        decode_audio,
    )

    # square wave around the 128 midpoint: +/- 64 => rms = 0.5
    data = bytes([192, 64] * 50)
    d = decode_audio(_wav(8, data))
    assert d["bits"] == 8 and d["n_samples"] == 100
    assert d["rms"] == pytest.approx(0.5, abs=1e-12)


def test_wav_24bit_signed_rms():
    from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
        decode_audio,
    )

    amp = 1 << 22  # quarter full scale => rms = 0.5
    pos = amp.to_bytes(3, "little")
    neg = (-amp & 0xFFFFFF).to_bytes(3, "little")
    d = decode_audio(_wav(24, (pos + neg) * 50))
    assert d["bits"] == 24 and d["n_samples"] == 100
    assert d["rms"] == pytest.approx(0.5, abs=1e-12)


def test_wav_32bit_signed_rms():
    from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
        decode_audio,
    )

    amp = 1 << 30
    data = b"".join(
        struct.pack("<i", v) for v in ([amp, -amp] * 50)
    )
    d = decode_audio(_wav(32, data))
    assert d["bits"] == 32 and d["n_samples"] == 100
    assert d["rms"] == pytest.approx(0.5, abs=1e-12)


def test_mp3_lyrics3_text_contains_tag_at_id3v1_offset():
    """ADVICE r9: a valid LYRICS3 block with NO trailing ID3v1 whose
    lyric TEXT happens to contain 'TAG' exactly 128 bytes from the end
    must still validate — the old heuristic unconditionally stripped the
    last 128 bytes on that match, destroying the real terminator."""
    frames = _mp3_frames(
        3, _M1L3["b1"], _M1L3["b2"], _M1L3["b3"], _M1L3["flen"]
    )
    want = int(3 * 1152 / 44100 * 1000)
    # v1: place 'TAG' so it starts exactly 128 bytes before the end of
    # the whole trailer (inside the lyric text), terminator LYRICSEND
    text = b"before " + b"TAG" + b"x" * 116
    lyr1 = b"LYRICSBEGIN" + text + b"LYRICSEND"
    assert lyr1[-128:-125] == b"TAG"
    assert decode_audio(frames + lyr1)["duration_ms"] == want
    # v2 analog: 'TAG' lands 128 bytes from the end inside the text,
    # with a size that checks out only on the UNSTRIPPED body
    body_text = b"LYR00100" + b"y" * 20 + b"TAG" + b"y" * 110
    lyr2 = b"LYRICSBEGIN" + body_text + (
        b"%06dLYRICS200" % (11 + len(body_text))
    )
    assert lyr2[-128:-125] == b"TAG"
    assert decode_audio(frames + lyr2)["duration_ms"] == want
    # and a REAL trailing ID3v1 after a valid block is still stripped
    lyr_v1 = b"LYRICSBEGIN" + b"plain text" + b"LYRICSEND"
    assert (
        decode_audio(frames + lyr_v1 + b"TAG" + b"\x00" * 125)[
            "duration_ms"
        ]
        == want
    )

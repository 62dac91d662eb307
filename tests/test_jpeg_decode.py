"""Baseline-JPEG decoder tests, mirroring test_png_decode.py: an
INDEPENDENT forward encoder (markers, canonical Huffman entropy coding,
FDCT + quantization, restart intervals) exercises the full decode path,
and non-baseline variants must be refused (ValueError) rather than
decoded as garbage."""

import math
import struct

import numpy as np
import pytest

from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
    _ZIGZAG,
    decode_image,
)

# ---- independent forward encoder ------------------------------------------

#: custom (non-Annex-K) canonical tables — the decoder must build codes
#: from the stream's DHT, not assume the standard tables
_DC_BITS = [0, 0, 0, 0, 12] + [0] * 11  # twelve 5-bit codes, syms 0..11
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_AC_BITS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS)] + [0] * 8  # all 8-bit


def _canon(bits, syms):
    m, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(bits[ln - 1]):
            m[syms[k]] = (code, ln)
            code += 1
            k += 1
        code <<= 1
    return m


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.acc = (self.acc << 1) | ((v >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def align(self):  # pad with 1-bits (spec behavior)
        while self.n:
            self.bits(1, 1)


def _fdct(block):
    a = np.empty((8, 8))
    for u in range(8):
        cu = (1 / math.sqrt(2)) if u == 0 else 1.0
        for x in range(8):
            a[u, x] = 0.5 * cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return a @ block @ a.T


def _emit_block(w, zf, pred, dc, ac):
    diff = int(zf[0]) - pred
    pred = int(zf[0])
    s = abs(diff).bit_length()
    code, ln = dc[s]
    w.bits(code, ln)
    if s:
        w.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)
    nz = [i for i in range(1, 64) if zf[i]]
    last = nz[-1] if nz else 0
    run, k = 0, 1
    while k <= last:
        if zf[k] == 0:
            run += 1
            k += 1
            continue
        while run >= 16:
            code, ln = ac[0xF0]
            w.bits(code, ln)
            run -= 16
        v = int(zf[k])
        s = abs(v).bit_length()
        code, ln = ac[(run << 4) | s]
        w.bits(code, ln)
        w.bits(v if v >= 0 else v + (1 << s) - 1, s)
        run, k = 0, k + 1
    if last < 63:
        code, ln = ac[0x00]
        w.bits(code, ln)
    return pred


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _headers(h, w, comps, q, restart_interval):
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes(int(x) for x in q))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hv in comps:
        sof += bytes([cid, hv, 0])
    out += _seg(0xC0, sof)
    out += _seg(
        0xC4, bytes([0x00]) + bytes(_DC_BITS) + bytes(_DC_SYMS)
    )
    out += _seg(
        0xC4, bytes([0x10]) + bytes(_AC_BITS) + bytes(_AC_SYMS)
    )
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for cid, _hv in comps:
        sos += bytes([cid, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    return out


def encode_jpeg_gray(px, q=None, restart_interval=0):
    """Single-component baseline JPEG from an (h, w) uint8 array."""
    h, w = px.shape
    if q is None:
        q = np.ones(64, dtype=int)
    bh, bw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = np.pad(
        px.astype(np.float64), ((0, bh - h), (0, bw - w)), mode="edge"
    )
    dc, ac = _canon(_DC_BITS, _DC_SYMS), _canon(_AC_BITS, _AC_SYMS)
    wtr = _BitWriter()
    pred, n, rst = 0, 0, 0
    for by in range(bh // 8):
        for bx in range(bw // 8):
            if restart_interval and n and n % restart_interval == 0:
                wtr.align()
                wtr.out += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                pred = 0
            n += 1
            blk = padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
            zf = np.rint(_fdct(blk).flatten()[_ZIGZAG] / q).astype(int)
            pred = _emit_block(wtr, zf, pred, dc, ac)
    wtr.align()
    return bytes(
        _headers(h, w, [(1, 0x11)], q, restart_interval)
        + wtr.out
        + b"\xff\xd9"
    )


def encode_jpeg_color420_const(h, w, y0, cb0, cr0):
    """One 4:2:0 MCU grid of a CONSTANT YCbCr color (q=1, so each
    block is DC-only: 8·(val−128))."""
    assert h % 16 == 0 and w % 16 == 0
    q = np.ones(64, dtype=int)
    dc, ac = _canon(_DC_BITS, _DC_SYMS), _canon(_AC_BITS, _AC_SYMS)
    wtr = _BitWriter()
    preds = {1: 0, 2: 0, 3: 0}
    dcs = {1: round(8 * (y0 - 128)), 2: round(8 * (cb0 - 128)),
           3: round(8 * (cr0 - 128))}
    zf = np.zeros(64, dtype=int)
    for _my in range(h // 16):
        for _mx in range(w // 16):
            for cid, nblocks in ((1, 4), (2, 1), (3, 1)):
                for _ in range(nblocks):
                    zf[0] = dcs[cid]
                    preds[cid] = _emit_block(wtr, zf, preds[cid], dc, ac)
    wtr.align()
    comps = [(1, 0x22), (2, 0x11), (3, 0x11)]
    return bytes(_headers(h, w, comps, q, 0) + wtr.out + b"\xff\xd9")


def _gradient(h, w):
    return (np.arange(h * w, dtype=np.int64) * 37 % 256).astype(
        np.uint8
    ).reshape(h, w)


# ---- tests ----------------------------------------------------------------


def test_jpeg_gray_roundtrip_exact_blocks():
    # uniform image: DCT is DC-only, round-trip is exact
    px = np.full((8, 8), 200, dtype=np.uint8)
    meta = decode_image(encode_jpeg_gray(px))
    assert meta["format"] == "jpeg"
    assert (meta["width"], meta["height"], meta["channels"]) == (8, 8, 1)
    assert abs(meta["mean_level"] - 200.0) < 1e-9


def test_jpeg_gray_roundtrip_gradient():
    # q=1 quantization: only coefficient rounding error survives
    px = _gradient(24, 16)
    meta = decode_image(encode_jpeg_gray(px))
    assert (meta["width"], meta["height"]) == (16, 24)
    assert abs(meta["mean_level"] - float(px.mean())) < 0.6


def test_jpeg_nonuniform_quant_table():
    # non-uniform q exercises the zigzag-ordered dequantize alignment:
    # a raster/zigzag mixup would scale the wrong coefficients
    q = 1 + (np.arange(64) % 4)
    px = _gradient(16, 16)
    meta = decode_image(encode_jpeg_gray(px, q=q))
    assert abs(meta["mean_level"] - float(px.mean())) < 2.5


def test_jpeg_edge_cropping():
    # dims not multiples of 8: decoder must crop the padded MCU grid
    px = _gradient(10, 12)
    meta = decode_image(encode_jpeg_gray(px))
    assert (meta["width"], meta["height"]) == (12, 10)
    assert abs(meta["mean_level"] - float(px.mean())) < 1.0


def test_jpeg_restart_intervals():
    # 8 MCUs with DRI=2: RST markers + predictor resets + realignment
    px = _gradient(8, 64)
    meta = decode_image(encode_jpeg_gray(px, restart_interval=2))
    assert abs(meta["mean_level"] - float(px.mean())) < 0.6


def test_jpeg_color_420_upsampling():
    y0, cb0, cr0 = 120, 100, 140
    meta = decode_image(encode_jpeg_color420_const(16, 32, y0, cb0, cr0))
    assert (meta["width"], meta["height"], meta["channels"]) == (32, 16, 3)
    r = min(max(round(y0 + 1.402 * (cr0 - 128)), 0), 255)
    g = min(
        max(round(y0 - 0.344136 * (cb0 - 128) - 0.714136 * (cr0 - 128)), 0),
        255,
    )
    b = min(max(round(y0 + 1.772 * (cb0 - 128)), 0), 255)
    assert abs(meta["mean_level"] - (r + g + b) / 3.0) < 0.02


def test_jpeg_progressive_refused():
    # same stream with SOF2 instead of SOF0 must be refused, not
    # misdecoded as sequential
    raw = bytearray(encode_jpeg_gray(np.full((8, 8), 99, np.uint8)))
    i = raw.find(b"\xff\xc0")
    raw[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_image(bytes(raw))


def test_jpeg_truncated_scan_refused():
    raw = encode_jpeg_gray(_gradient(16, 16))
    with pytest.raises(ValueError):
        decode_image(raw[: len(raw) // 2])
    with pytest.raises(ValueError):
        decode_image(b"\xff\xd8\xff\xd9")  # SOI+EOI, no frame


def test_jpeg_through_decode_media_kernel(spark):
    from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
        decode_media,
    )

    px = _gradient(8, 8)
    jpg = encode_jpeg_gray(px)
    df = spark.createDataFrame(
        [(1, "image", bytearray(jpg)),
         (2, "image", bytearray(b"\xff\xd8broken"))],
        "asset_id long, kind string, payload binary",
    )
    out = {r.asset_id: r for r in decode_media(df).collect()}
    assert out[1].format == "jpeg"
    assert (out[1].width, out[1].height, out[1].channels) == (8, 8, 1)
    assert abs(out[1].mean_level - float(px.mean())) < 0.6
    assert out[2].format is None  # fell back to fake_decode


def test_jpeg_fill_bytes_before_marker():
    # spec B.1.1.2: runs of 0xFF fill bytes may precede any marker; the
    # walk must skip them instead of parsing 0xFF as a marker code and
    # misreading a bogus segment length
    px = _gradient(16, 16)
    raw = encode_jpeg_gray(px)
    i = raw.find(b"\xff\xc0")  # pad before SOF0
    padded = raw[:i] + b"\xff" * 5 + raw[i:]
    meta = decode_image(padded)
    assert (meta["width"], meta["height"]) == (16, 16)
    assert abs(meta["mean_level"] - float(px.mean())) < 1.0


def test_jpeg_malformed_tables_raise_valueerror():
    # missing DHT/DQT table ids and truncated SOF/SOS segments are
    # *malformed JPEG*: the documented contract is ValueError (so direct
    # callers catching it reach the fallback), never KeyError/struct.error
    raw = encode_jpeg_gray(_gradient(8, 8))

    # point the scan at a Huffman table id that was never defined
    i = raw.find(b"\xff\xda")
    sos = bytearray(raw)
    sos[i + 6] = 0x33  # td=3, ta=3 (only table 0 exists)
    with pytest.raises(ValueError):
        decode_image(bytes(sos))

    # truncate the SOF segment mid-component (struct would under-read)
    i = raw.find(b"\xff\xc0")
    trunc = raw[: i + 4] + raw[i + 9 :]  # shrink payload, keep stream
    sof = bytearray(trunc)
    struct.pack_into(">H", sof, i + 2, 4)  # length covers 2 payload bytes
    with pytest.raises(ValueError):
        decode_image(bytes(sof))

"""FLAC frame-decoder tests, mirroring test_gif_decode.py: an
INDEPENDENT forward encoder (explicit bit-list writer, its own CRC and
rice routines) exercises CONSTANT/VERBATIM/FIXED/LPC subframes, rice +
rice2 + escape residual partitions, wasted bits and all three stereo
decorrelation modes; corrupt CRCs and truncation must be refused."""

import struct

import numpy as np
import pytest

from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
    decode_audio,
    synthesize_media,
)

SR = 44100

# ---- independent bit writer + encoder ---------------------------------------


class W:
    def __init__(self):
        self.bits = []

    def u(self, v, n):
        self.bits.extend((v >> i) & 1 for i in reversed(range(n)))

    def s(self, v, n):
        self.u(v & ((1 << n) - 1), n)

    def align(self):
        while len(self.bits) % 8:
            self.bits.append(0)

    def to_bytes(self):
        self.align()
        out = bytearray()
        for i in range(0, len(self.bits), 8):
            byte = 0
            for b in self.bits[i : i + 8]:
                byte = (byte << 1) | b
            out.append(byte)
        return bytes(out)


def crc8(data):
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def crc16(data):
    crc = 0
    for b in data:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


def zigzag(r):
    return (r << 1) if r >= 0 else (-r << 1) - 1


_FIXED = {0: (), 1: (1,), 2: (2, -1), 3: (3, -3, 1), 4: (4, -6, 4, -1)}


def enc_residuals(w, res, porder=0, rice2=False, escape=False, order=0,
                  blocksize=None):
    w.u(1 if rice2 else 0, 2)
    w.u(porder, 4)
    pbits = 5 if rice2 else 4
    nparts = 1 << porder
    at = 0
    for p in range(nparts):
        n = blocksize // nparts - (order if p == 0 else 0)
        part = res[at : at + n]
        at += n
        if escape:
            raw = max(2, max((abs(r).bit_length() + 1 for r in part),
                             default=2))
            w.u((1 << pbits) - 1, pbits)
            w.u(raw, 5)
            for r in part:
                w.s(r, raw)
            continue
        zz = [zigzag(r) for r in part]
        param = min(max([z.bit_length() - 1 for z in zz] + [0]),
                    (1 << pbits) - 2)
        w.u(param, pbits)
        for z in zz:
            q = z >> param
            w.u(0, q) if q else None
            w.u(1, 1)
            if param:
                w.u(z & ((1 << param) - 1), param)


def enc_subframe(w, samples, bps, kind="verbatim", order=0, coefs=None,
                 shift=0, wasted=0, **res_kw):
    w.u(0, 1)  # pad
    if kind == "constant":
        w.u(0, 6)
    elif kind == "verbatim":
        w.u(1, 6)
    elif kind == "fixed":
        w.u(8 + order, 6)
    else:  # lpc
        w.u(32 + order - 1, 6)
    if wasted:
        w.u(1, 1)
        w.u(0, wasted - 1)  # unary count-1 zeros...
        w.u(1, 1)
    else:
        w.u(0, 1)
    eff = bps - wasted
    vals = [s >> wasted for s in samples]
    if kind == "constant":
        w.s(vals[0], eff)
        return
    if kind == "verbatim":
        for s in vals:
            w.s(s, eff)
        return
    for s in vals[:order]:
        w.s(s, eff)
    if kind == "lpc":
        precision = 15
        w.u(precision - 1, 4)
        w.u(shift, 5)
        for c in coefs:
            w.s(c, precision)
        res = [
            vals[i]
            - (sum(c * vals[i - j - 1] for j, c in enumerate(coefs)) >> shift)
            for i in range(order, len(vals))
        ]
    else:
        cf = _FIXED[order]
        res = [
            vals[i] - sum(c * vals[i - j - 1] for j, c in enumerate(cf))
            for i in range(order, len(vals))
        ]
    enc_residuals(w, res, order=order, blocksize=len(vals), **res_kw)


def streaminfo(ch, bps, n):
    bits = (SR << 44) | ((ch - 1) << 41) | ((bps - 1) << 36) | n
    si = b"\x00" * 10 + bits.to_bytes(8, "big") + b"\x00" * 16
    return b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + si


def frame(subframe_specs, blocksize, ch_code, bps):
    """subframe_specs: list of (samples, kwargs) per subframe."""
    hdr = bytearray([0xFF, 0xF8, 0x70, (ch_code << 4) | (4 << 1), 0])
    hdr += struct.pack(">H", blocksize - 1)
    hdr.append(crc8(bytes(hdr)))
    w = W()
    for samples, kw in subframe_specs:
        enc_subframe(w, samples, kw.pop("bps", bps), **kw)
    body = bytes(hdr) + w.to_bytes()
    return body + struct.pack(">H", crc16(body))


def flac_file(subframe_specs, blocksize, ch_code, n_channels, bps=16):
    return streaminfo(n_channels, bps, blocksize) + frame(
        subframe_specs, blocksize, ch_code, bps
    )


def rms_of(chans):
    x = np.asarray(chans, np.float64) / 32768.0
    return float(np.sqrt((x * x).mean()))


def _rng(seed):
    return np.random.default_rng(seed)


# ---- subframe types ----------------------------------------------------------


def test_verbatim_mono():
    s = [int(v) for v in _rng(1).integers(-3000, 3000, 96)]
    d = decode_audio(flac_file([(s, {"kind": "verbatim"})], 96, 0, 1))
    assert d["format"] == "flac" and d["n_samples"] == 96
    assert d["rms"] == pytest.approx(rms_of([s]), abs=1e-12)


def test_fixed_orders_with_partitions():
    for order in (0, 1, 2, 3, 4):
        base = np.cumsum(_rng(2 + order).integers(-50, 50, 64))
        s = [int(v) for v in base]
        d = decode_audio(
            flac_file(
                [(s, {"kind": "fixed", "order": order, "porder": 1})],
                64, 0, 1,
            )
        )
        assert d["rms"] == pytest.approx(rms_of([s]), abs=1e-12), order


def test_rice2_and_escape_partitions():
    s = [int(v) for v in _rng(7).integers(-20000, 20000, 48)]
    for kw in ({"rice2": True}, {"escape": True}):
        d = decode_audio(
            flac_file(
                [(s, {"kind": "fixed", "order": 1, **kw})], 48, 0, 1
            )
        )
        assert d["rms"] == pytest.approx(rms_of([s]), abs=1e-12), kw


def test_lpc_subframe():
    base = np.cumsum(_rng(8).integers(-30, 30, 80))
    s = [int(v) for v in base]
    d = decode_audio(
        flac_file(
            [(s, {"kind": "lpc", "order": 2, "coefs": [3, -1], "shift": 1})],
            80, 0, 1,
        )
    )
    assert d["rms"] == pytest.approx(rms_of([s]), abs=1e-12)


def test_wasted_bits():
    s = [int(v) * 4 for v in _rng(9).integers(-500, 500, 32)]
    d = decode_audio(
        flac_file([(s, {"kind": "verbatim", "wasted": 2})], 32, 0, 1)
    )
    assert d["rms"] == pytest.approx(rms_of([s]), abs=1e-12)


# ---- stereo decorrelation ----------------------------------------------------


def _stereo(seed, n=64):
    l = [int(v) for v in _rng(seed).integers(-8000, 8000, n)]
    r = [int(v) for v in _rng(seed + 1).integers(-8000, 8000, n)]
    return l, r


def test_left_side():
    l, r = _stereo(10)
    side = [a - b for a, b in zip(l, r)]
    d = decode_audio(
        flac_file(
            [(l, {"kind": "verbatim"}),
             (side, {"kind": "verbatim", "bps": 17})],
            64, 8, 2,
        )
    )
    assert d["channels"] == 2
    assert d["rms"] == pytest.approx(rms_of([l, r]), abs=1e-12)


def test_right_side():
    l, r = _stereo(12)
    side = [a - b for a, b in zip(l, r)]
    d = decode_audio(
        flac_file(
            [(side, {"kind": "verbatim", "bps": 17}),
             (r, {"kind": "verbatim"})],
            64, 9, 2,
        )
    )
    assert d["rms"] == pytest.approx(rms_of([l, r]), abs=1e-12)


def test_mid_side():
    l, r = _stereo(14)
    side = [a - b for a, b in zip(l, r)]
    mid = [(a + b) >> 1 for a, b in zip(l, r)]
    d = decode_audio(
        flac_file(
            [(mid, {"kind": "verbatim"}),
             (side, {"kind": "verbatim", "bps": 17})],
            64, 10, 2,
        )
    )
    assert d["rms"] == pytest.approx(rms_of([l, r]), abs=1e-12)


# ---- metadata-only contract and refusals --------------------------------------


def test_metadata_only_keeps_header_contract():
    d = decode_audio(streaminfo(2, 16, 12345))
    assert d["n_samples"] == 12345 and d["rms"] is None
    assert d["duration_ms"] == int(12345 * 1000 / SR)


def test_corrupt_crc_degrades_to_streaminfo():
    """Corrupt FRAME sections must not demote the payload to
    fake_decode — STREAMINFO already parsed, so the decoder keeps the
    exact header metadata and just drops the PCM stats (rms None)."""
    s = [int(v) for v in _rng(20).integers(-100, 100, 16)]
    f = bytearray(flac_file([(s, {"kind": "verbatim"})], 16, 0, 1))
    f[-1] ^= 0xFF  # frame CRC-16
    d = decode_audio(bytes(f))
    assert d["format"] == "flac" and d["rms"] is None
    assert d["n_samples"] == 16  # STREAMINFO value, not decoded count
    f = bytearray(flac_file([(s, {"kind": "verbatim"})], 16, 0, 1))
    # header CRC-8 sits right after the 16-bit blocksize field
    f[42 + 7] ^= 0xFF
    d = decode_audio(bytes(f))
    assert d["rms"] is None and d["sample_rate"] == SR


def test_truncated_frame_degrades_to_streaminfo():
    s = [int(v) for v in _rng(21).integers(-100, 100, 64)]
    f = flac_file([(s, {"kind": "verbatim"})], 64, 0, 1)
    d = decode_audio(f[: len(f) - 20])
    assert d["format"] == "flac" and d["rms"] is None
    assert d["duration_ms"] == int(64 * 1000 / SR)


def test_oversize_audio_section_keeps_header_contract():
    """Past _FLAC_DECODE_CAP the per-sample Python decode is skipped:
    exact STREAMINFO metadata, rms None."""
    from end_to_end_datapipeline_project_spark.llm_ops import multimodal as mm

    s = [0] * 16
    f = flac_file([(s, {"kind": "verbatim"})], 16, 0, 1)
    pad = f + b"\x00" * (mm._FLAC_DECODE_CAP + 1)  # audio section > cap
    d = decode_audio(pad)
    assert d["rms"] is None and d["n_samples"] == 16


def test_malformed_streaminfo_refused():
    with pytest.raises(ValueError):
        decode_audio(b"fLaC" + b"\x00" * 10)  # shorter than STREAMINFO
    bad = bytearray(streaminfo(1, 16, 100))
    bad[4] = 0x81  # first block type 1, not STREAMINFO
    with pytest.raises(ValueError):
        decode_audio(bytes(bad))


# ---- the forge and the decoder agree ------------------------------------------


def test_synthesize_media_flac_decodes_to_closed_form():
    for doc_id in (4, 11, 18, 95):  # kind == doc_id % 7 == 4
        assert doc_id % 7 == 4
        d = decode_audio(synthesize_media(doc_id))
        n = 1000 * (1 + doc_id % 90)
        assert (d["format"], d["channels"], d["n_samples"]) == (
            "flac", 1 + doc_id % 2, n,
        )
        assert d["duration_ms"] == int(n * 1000 / SR)
        assert d["rms"] == pytest.approx((doc_id % 16384) / 32768.0,
                                         abs=1e-15)


def test_partition_order_equal_to_predictor_order_refused():
    """Spec: blocksize >> porder must be STRICTLY greater than the
    predictor order — a first partition with zero residual samples is
    invalid, and the stream degrades to the header contract (ADVICE
    r6).  blocksize 64, porder 5 → 2 samples/partition == order 2."""
    base = np.cumsum(_rng(30).integers(-50, 50, 64))
    s = [int(v) for v in base]
    d = decode_audio(
        flac_file([(s, {"kind": "fixed", "order": 2, "porder": 5})], 64, 0, 1)
    )
    assert d["format"] == "flac" and d["rms"] is None
    # one partition more samples than the order still decodes (psize 4 > 2)
    d = decode_audio(
        flac_file([(s, {"kind": "fixed", "order": 2, "porder": 4})], 64, 0, 1)
    )
    assert d["rms"] == pytest.approx(rms_of([s]), abs=1e-12)

"""VP8L (lossless WebP) subset-decoder tests, mirroring
test_gif_decode.py: an INDEPENDENT forward encoder (its own LSB-first
bit writer, canonical-code constructor and LZ77 code inverse) drives
simple and code-length-coded prefix codes, 2D-mapped and plain LZ77
distances, the color cache, and the SUBTRACT-GREEN and COLOR-INDEXING
(delta-coded palette, bundled pixels) inverse transforms; predictor/
color-transform streams must degrade to dims-only (declined by design)
and the distance-map construction must match the spec's explicit
prefix."""

import struct

import numpy as np
import pytest

from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
    _decode_vp8l,
    _vp8l_distance_map,
    decode_image,
    synthesize_media,
)

# ---- independent encoder -----------------------------------------------------


class WLSB:
    def __init__(self):
        self.acc = 0
        self.n = 0
        self.out = bytearray()

    def put(self, v, nb):
        self.acc |= v << self.n
        self.n += nb
        while self.n >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code_msb(self, code, ln):
        for i in reversed(range(ln)):
            self.put((code >> i) & 1, 1)

    def done(self):
        if self.n:
            self.out.append(self.acc & 0xFF)
            self.n = 0
        return bytes(self.out)


def canonical(lengths):
    """deflate-style canonical codes: ordered by (length, symbol)."""
    codes = {}
    code = 0
    prev = 0
    for sym in sorted(lengths, key=lambda s: (lengths[s], s)):
        code <<= lengths[sym] - prev
        codes[sym] = (code, lengths[sym])
        code += 1
        prev = lengths[sym]
    return codes


def simple_code(w, syms):
    """The 'simple' prefix-code form; returns emit(symbol).  Codes are
    CANONICAL (smaller symbol gets code 0) regardless of listing order,
    so a descending pair exercises the decoder's assignment."""
    w.put(1, 1)
    w.put(len(syms) - 1, 1)
    w.put(1, 1)  # 8-bit first symbol
    w.put(syms[0], 8)
    if len(syms) == 2:
        w.put(syms[1], 8)
        lo, hi = sorted(syms)
        table = {lo: (0, 1), hi: (1, 1)}
    else:
        table = {syms[0]: (0, 0)}
    return lambda s: w.put_code_msb(*table[s])


def normal_code(w, lengths, alphabet):
    """The full code-length-coded form: 19 literal 3-bit CL lengths (no
    16/17/18 repeats on the CL layer), then one CL symbol per alphabet
    slot; returns emit(symbol)."""
    used_lens = sorted({ln for ln in lengths.values()} | {0})
    k = max(1, (len(used_lens) - 1).bit_length())
    cl_lengths = {ln: k for ln in used_lens}
    order = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)
    w.put(0, 1)  # not simple
    w.put(19 - 4, 4)
    for cl_sym in order:
        w.put(cl_lengths.get(cl_sym, 0), 3)
    cl_codes = canonical(cl_lengths)
    w.put(0, 1)  # no max_symbol cap
    for sym in range(alphabet):
        w.put_code_msb(*cl_codes[lengths.get(sym, 0)])
    codes = canonical(lengths)
    return lambda s: w.put_code_msb(*codes[s])


def lz77_emit(w, emit_prefix, value):
    """Inverse of the decoder's prefix-value rule: pick the code whose
    range covers `value`, emit it plus the extra bits."""
    for code in range(40):
        if code < 4:
            lo = hi = code + 1
            extra = 0
            base = code
        else:
            extra = (code - 2) >> 1
            base = (2 + (code & 1)) << extra
            lo, hi = base + 1, base + (1 << extra)
        if lo <= value <= hi:
            emit_prefix(code)
            if extra:
                w.put(value - 1 - base, extra)
            return
    raise AssertionError("value out of LZ77 code range")


def vp8l_header(w, width, height, alpha=0):
    w.put(width - 1, 14)
    w.put(height - 1, 14)
    w.put(alpha, 1)
    w.put(0, 3)  # version


def wrap(body):
    chunk = b"VP8L" + struct.pack("<I", len(body)) + body
    chunk += b"\x00" * (len(body) & 1)
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _rng(seed):
    return np.random.default_rng(seed)


# ---- distance map ------------------------------------------------------------


def test_distance_map_matches_spec_prefix():
    m = _vp8l_distance_map()
    assert len(m) == 120
    assert m[:22] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2),
    ]
    assert len(set(m)) == 120


def test_distance_map_matches_spec_tail():
    """The TAIL is where a wrong candidate domain shows up (an (0,8) or
    (-8,y) pair would shift every later code): pin codes 93..102 and
    117..120 against the reference plane-code table (libwebp
    kCodeToPlane inverted: dy = code>>4, dx = 8-(code&0xF))."""
    m = _vp8l_distance_map()
    assert m[92:101] == [
        (5, 6), (-5, 6), (6, 5), (-6, 5), (8, 0), (4, 7), (-4, 7),
        (7, 4), (-7, 4),
    ]
    assert m[101] == (8, 1)
    assert m[116:120] == [(7, 7), (-7, 7), (8, 6), (8, 7)]
    # domain bounds enforced by the nibble encoding
    assert all(-7 <= dx <= 8 and 0 <= dy <= 7 for dx, dy in m)


# ---- prefix-code forms -------------------------------------------------------


def test_two_symbol_simple_codes_checkerboard():
    W_, H_ = 10, 6
    ga, gb = 200, 40  # DESCENDING pair: canonical order != listing order
    w = WLSB()
    w.put(0x2F, 8)
    vp8l_header(w, W_, H_)
    w.put(0, 1)  # no transform
    w.put(0, 1)  # no cache
    w.put(0, 1)  # no meta
    eg = simple_code(w, [ga, gb])
    er = simple_code(w, [10])
    eb = simple_code(w, [20])
    ea = simple_code(w, [255])
    simple_code(w, [0])  # distance, unused
    vals = []
    for i in range(W_ * H_):
        g = ga if i % 2 == 0 else gb
        eg(g)
        vals.append((10 + g + 20) / 3.0)
    d = _decode_vp8l(w.done())
    assert (d["width"], d["height"], d["channels"]) == (W_, H_, 3)
    assert d["mean_level"] == pytest.approx(float(np.mean(vals)), abs=1e-9)


def test_normal_codes_random_small_palette():
    W_, H_ = 9, 7
    palette = [3, 77, 130, 251]
    lengths = {p: 2 for p in palette}
    px = _rng(1).integers(0, 4, W_ * H_)
    w = WLSB()
    w.put(0x2F, 8)
    vp8l_header(w, W_, H_)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    eg = normal_code(w, lengths, 256 + 24)
    er = normal_code(w, lengths, 256)
    eb = normal_code(w, lengths, 256)
    ea = simple_code(w, [255])
    simple_code(w, [0])
    for i in px:
        v = palette[int(i)]
        eg(v)
        er(v)
        eb(v)
        ea(255)
    d = _decode_vp8l(w.done())
    exp = float(np.mean([palette[int(i)] for i in px]))
    assert d["mean_level"] == pytest.approx(exp, abs=1e-9)


# ---- LZ77 and color cache ----------------------------------------------------


def _backref_stream(dist_plain):
    W_, H_ = 8, 5
    row = [int(v) for v in _rng(3).integers(0, 256, W_)]
    length_value = W_ * (H_ - 1)

    def code_for(value):
        for code in range(40):
            if code < 4:
                lo, hi = code + 1, code + 1
                e, base = 0, code
            else:
                e = (code - 2) >> 1
                base = (2 + (code & 1)) << e
                lo, hi = base + 1, base + (1 << e)
            if lo <= value <= hi:
                return code, e, base
        raise AssertionError

    len_code, len_e, len_base = code_for(length_value)
    dist_value = 120 + W_ if dist_plain else 1
    dist_code, dist_e, dist_base = code_for(dist_value)
    glens = {v: 9 for v in set(row)}
    glens[256 + len_code] = 9
    w = WLSB()
    w.put(0x2F, 8)
    vp8l_header(w, W_, H_)
    w.put(0, 1)
    w.put(0, 1)
    w.put(0, 1)
    eg = normal_code(w, glens, 256 + 24)
    er = normal_code(w, {v: 8 for v in set(row)}, 256)
    eb = normal_code(w, {v: 8 for v in set(row)}, 256)
    ea = simple_code(w, [255])
    ed = simple_code(w, [dist_code])
    for v in row:
        eg(v)
        er(v)
        eb(v)
        ea(255)
    eg(256 + len_code)
    if len_e:
        w.put(length_value - 1 - len_base, len_e)
    ed(dist_code)
    if dist_e:
        w.put(dist_value - 1 - dist_base, dist_e)
    return w.done(), row, W_, H_


@pytest.mark.parametrize("dist_plain", [True, False])
def test_lz77_backref_copies_first_row(dist_plain):
    body, row, W_, H_ = _backref_stream(dist_plain)
    d = _decode_vp8l(body)
    assert d["mean_level"] == pytest.approx(float(np.mean(row)), abs=1e-9)


def test_color_cache_hits():
    W_, H_ = 6, 2
    w = WLSB()
    w.put(0x2F, 8)
    vp8l_header(w, W_, H_)
    w.put(0, 1)  # no transform
    w.put(1, 1)  # cache on
    cache_bits = 4
    w.put(cache_bits, 4)
    w.put(0, 1)  # no meta
    g, r, b, a = 80, 30, 60, 255
    argb = (a << 24) | (r << 16) | (g << 8) | b
    idx = (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - cache_bits)
    # cache symbols live at 280+: beyond a simple code's 8-bit symbol
    # field, so the green code must use the code-length-coded form
    eg = normal_code(
        w, {g: 1, 280 + idx: 1}, 256 + 24 + (1 << cache_bits)
    )
    simple_code(w, [r])
    simple_code(w, [b])
    simple_code(w, [a])
    simple_code(w, [0])
    eg(g)  # one literal primes the cache
    for _ in range(W_ * H_ - 1):
        eg(280 + idx)  # the rest are cache hits
    d = _decode_vp8l(w.done())
    assert d["mean_level"] == pytest.approx((g + r + b) / 3.0, abs=1e-9)


# ---- degradation and dispatch --------------------------------------------------


def test_transform_stream_degrades_to_dims():
    w = WLSB()
    w.put(0x2F, 8)
    vp8l_header(w, 33, 21)
    w.put(1, 1)  # a transform IS present
    w.put(0, 2)  # predictor transform type
    d = decode_image(wrap(w.done() + b"\x00" * 8))
    assert (d["width"], d["height"]) == (33, 21)
    assert d["mean_level"] is None


def test_truncated_stream_degrades_to_dims():
    body, _, W_, H_ = _backref_stream(True)
    d = decode_image(wrap(body[: len(body) - 4]))
    assert (d["width"], d["height"]) == (W_, H_)
    assert d["mean_level"] is None


def test_decode_via_dispatch_and_forge_closed_form():
    for doc_id in (1, 15, 29, 43):  # kind 1, odd => VP8L
        d = decode_image(synthesize_media(doc_id))
        exp = (
            (doc_id * 5) % 256 + (doc_id * 3) % 256 + (doc_id * 7) % 256
        ) / 3.0
        assert d["format"] == "webp"
        assert d["mean_level"] == pytest.approx(exp, abs=1e-9)


def test_oversubscribed_prefix_code_degrades_to_dims():
    """Kraft check (ADVICE r6): three length-1 codes over-subscribe the
    green code; canonical assignment would silently alias codes and
    decode deterministically-wrong pixels — the decoder must refuse
    (→ dims-only degradation).  Incomplete codes remain legal for the
    encoder here (unreachable codes never appear in the stream)."""
    w = WLSB()
    w.put(0x2F, 8)
    vp8l_header(w, 6, 5)
    w.put(0, 1)  # no transforms
    w.put(0, 1)  # no color cache
    w.put(0, 1)  # no meta prefix
    normal_code(w, {0: 1, 1: 1, 2: 1}, 256 + 24)  # green: Kraft sum 1.5
    d = decode_image(wrap(w.done() + b"\x00" * 16))
    assert (d["width"], d["height"]) == (6, 5)
    assert d["mean_level"] is None


# ---- transforms: subtract-green + color-indexing ---------------------------


def _literal_emitters(w, pixels):
    """Normal/simple codes for a literal-only ARGB pixel list; returns
    emit(pixel) writing g, r, b, a in stream order."""
    gs = {p[2] for p in pixels}
    rs = {p[1] for p in pixels}
    bs = {p[3] for p in pixels}
    as_ = {p[0] for p in pixels}

    def code_for(vals, alphabet):
        if len(vals) == 1:
            return simple_code(w, [next(iter(vals))])
        return normal_code(w, {v: 8 for v in vals}, alphabet)

    eg = code_for(gs, 256 + 24)
    er = code_for(rs, 256)
    eb = code_for(bs, 256)
    ea = code_for(as_, 256)
    simple_code(w, [0])  # distance code, unused

    def emit(p):
        a, r, g, b = p
        eg(g)
        er(r)
        eb(b)
        ea(a)

    return emit


def test_subtract_green_inverse():
    W_, H_ = 9, 4
    rng = _rng(40)
    argb = [
        (255, int(r), int(g), int(b))
        for r, g, b in rng.integers(0, 256, (W_ * H_, 3))
    ]
    # forward transform: subtract green from red and blue, mod 256
    resid = [(a, (r - g) % 256, g, (b - g) % 256) for a, r, g, b in argb]
    w = WLSB()
    w.put(0x2F, 8)
    vp8l_header(w, W_, H_)
    w.put(1, 1)  # a transform is present
    w.put(2, 2)  # SUBTRACT-GREEN
    w.put(0, 1)  # no more transforms
    w.put(0, 1)  # no color cache
    w.put(0, 1)  # no meta prefix
    emit = _literal_emitters(w, resid)
    for p in resid:
        emit(p)
    d = _decode_vp8l(w.done())
    exp = np.mean([(r + g + b) / 3.0 for _, r, g, b in argb])
    assert d["mean_level"] == pytest.approx(float(exp), abs=1e-9)


def _palette_stream(W_, H_, palette, idx, n_declared=None):
    """Assemble a COLOR-INDEXING stream: delta-coded palette sub-image,
    then the bundled (or plain) index image in the green channel."""
    n = n_declared or len(palette)
    bpp = 1 if n <= 2 else 2 if n <= 4 else 4 if n <= 16 else 8
    w = WLSB()
    w.put(0x2F, 8)
    vp8l_header(w, W_, H_)
    w.put(1, 1)
    w.put(3, 2)  # COLOR-INDEXING (its payload follows immediately;
    # the next transform-present bit comes AFTER the palette sub-image)
    w.put(n - 1, 8)
    # palette sub-image: component-wise delta vs previous entry
    deltas = []
    prev = (0, 0, 0, 0)
    for p in palette:
        deltas.append(tuple((p[i] - prev[i]) % 256 for i in range(4)))
        prev = p
    w.put(0, 1)  # sub-image: no color cache (no meta bit at level > 0)
    emit = _literal_emitters(w, deltas)
    for p in deltas:
        emit(p)
    w.put(0, 1)  # no more transforms
    # main image: packed indices in the green channel
    if bpp < 8:
        ppb = 8 // bpp
        xp = -(-W_ // ppb)
        packed = []
        for y in range(H_):
            for xb in range(xp):
                byte = 0
                for i in range(ppb):
                    x = xb * ppb + i
                    if x < W_:
                        byte |= idx[y * W_ + x] << (i * bpp)
                packed.append(byte)
        greens = packed
        mw = xp
    else:
        greens = list(idx)
        mw = W_
    pixels = [(255, 0, g, 0) for g in greens]
    w.put(0, 1)  # main image: no color cache
    w.put(0, 1)  # no meta prefix (level 0)
    emit = _literal_emitters(w, pixels)
    for p in pixels:
        emit(p)
    return w.done()


def test_color_indexing_bundled_2bit():
    # 4-entry palette => 2-bit indices, 4 pixels per green byte; width 10
    # does not divide evenly so the last byte is partial
    W_, H_ = 10, 3
    palette = [
        (255, 10, 20, 30),
        (255, 200, 100, 50),
        (128, 0, 255, 0),
        (255, 7, 7, 7),
    ]
    rng = _rng(41)
    idx = [int(v) for v in rng.integers(0, 4, W_ * H_)]
    d = _decode_vp8l(_palette_stream(W_, H_, palette, idx))
    exp = np.mean(
        [(palette[i][1] + palette[i][2] + palette[i][3]) / 3.0 for i in idx]
    )
    assert (d["width"], d["height"]) == (W_, H_)
    assert d["mean_level"] == pytest.approx(float(exp), abs=1e-9)


def test_color_indexing_unbundled_large_palette():
    W_, H_ = 6, 2
    rng = _rng(42)
    palette = [
        (255, int(r), int(g), int(b))
        for r, g, b in rng.integers(0, 256, (20, 3))
    ]  # 17..256 entries => bpp 8, no bundling
    idx = [int(v) for v in rng.integers(0, 20, W_ * H_)]
    d = _decode_vp8l(_palette_stream(W_, H_, palette, idx))
    exp = np.mean(
        [(palette[i][1] + palette[i][2] + palette[i][3]) / 3.0 for i in idx]
    )
    assert d["mean_level"] == pytest.approx(float(exp), abs=1e-9)


def test_palette_index_beyond_size_refused():
    # declare 3 entries (still 2-bit bundling) but emit index 3
    W_, H_ = 4, 1
    palette = [(255, 1, 1, 1), (255, 2, 2, 2), (255, 3, 3, 3)]
    body = _palette_stream(W_, H_, palette, [0, 1, 2, 3])
    with pytest.raises(ValueError):
        _decode_vp8l(body)


def test_repeated_transform_refused():
    w = WLSB()
    w.put(0x2F, 8)
    vp8l_header(w, 4, 4)
    w.put(1, 1)
    w.put(2, 2)  # subtract-green
    w.put(1, 1)
    w.put(2, 2)  # subtract-green AGAIN
    with pytest.raises(ValueError):
        _decode_vp8l(w.done() + b"\x00" * 8)


def test_predictor_transform_still_degrades_to_dims():
    # predictor/color transforms are DECLINED by design (border and
    # rounding semantics carry real misreading risk when implemented
    # from memory): dims-only, never wrong pixels
    for ttype in (0, 1):
        w = WLSB()
        w.put(0x2F, 8)
        vp8l_header(w, 12, 7)
        w.put(1, 1)
        w.put(ttype, 2)
        d = decode_image(wrap(w.done() + b"\x00" * 8))
        assert (d["width"], d["height"]) == (12, 7)
        assert d["mean_level"] is None

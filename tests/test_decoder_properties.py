"""Property-based decoder tests (hypothesis): randomized images/streams
round-tripped through the INDEPENDENT test-side encoders and checked
against numpy ground truth.  The example-based suites pin specific
shapes; these sweep the edge geometry — 1-pixel dims, odd sizes where
Adam7 passes go empty, palettes of every power-of-two size, random
filter mixes — no Spark involved, so examples are cheap."""

import numpy as np
import pytest
from hypothesis import example, given, settings, strategies as st

from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
    _decode_gif,
    _decode_vp8l,
    _gif_lzw_decode,
    _packbits_decode,
    _tiff_lzw_decode,
    decode_audio,
    decode_image,
)

from test_flac_decode import flac_file, rms_of
from test_jpeg_decode import encode_jpeg_gray
from test_gif_decode import _lzw_encode as gif_lzw_encode, _make_gif
from test_png_decode import encode_png_adam7, encode_png_palette
from test_tiff_decode import (
    _build_tiff,
    _lzw_encode_tiff,
    _packbits_encode,
)
from test_vp8l_decode import WLSB, normal_code, simple_code, vp8l_header


# ---- raw codec round-trips ---------------------------------------------------


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=4000), st.integers(2, 8))
def test_gif_lzw_roundtrip_any_bytes(data, min_code):
    idx = bytes(b % (1 << min_code) for b in data)
    if not idx:
        return  # GIF images always have >=1 pixel; empty is not a case
    assert bytes(_gif_lzw_decode(gif_lzw_encode(idx, min_code),
                                 min_code, len(idx))) == idx


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=1, max_size=4000))
def test_tiff_lzw_roundtrip_any_bytes(data):
    assert bytes(_tiff_lzw_decode(_lzw_encode_tiff(data))) == data
    # the TIFF6 §13 pseudocode writer convention (final flush not counted
    # against the table) must decode too — the r9 escape was exactly this
    # convention landing on a width boundary
    assert bytes(
        _tiff_lzw_decode(_lzw_encode_tiff(data, count_flush=False))
    ) == data


# ---- final-symbol state-machine boundaries ------------------------------------
# Family sweep for the r9 TIFF LZW escape class: any decoder mirroring an
# encoder state machine with a one-entry (or one-symbol) lag can desync
# on the stream's LAST symbol, because the final flush adds no entry to
# resync on.  Random payloads land the final state change on the exact
# boundary only ~1/10³ of the time, so each strategy below CONSTRUCTS
# payloads whose final add/symbol lands on every boundary deliberately.


def _tiff_flush_next_code(data):
    """Encoder table's next_code just before the final flush emit — equal
    to the decoder's table length right after it processes the final
    data code.  The desync corner is this landing on 510/1022/2046
    (early change: width bumps at (1<<w)-2 given the decoder's lag)."""
    table = {bytes([i]) for i in range(256)}
    next_code = 258
    seq = b""
    for b in bytes(data):
        nxt = seq + bytes([b])
        if nxt in table:
            seq = nxt
            continue
        if next_code < 4096:
            table.add(nxt)
            next_code += 1
        seq = bytes([b])
    return next_code


def _gif_flush_next_code(indices, min_code_size):
    """GIF analog of :func:`_tiff_flush_next_code` (late change: the
    decoder bumps at (1<<w)-1)."""
    trie = {}
    next_code = (1 << min_code_size) + 2
    prev = None
    for b in bytes(indices):
        if prev is None:
            prev = b
            continue
        if (prev, b) in trie:
            prev = trie[(prev, b)]
            continue
        if next_code < 4096:
            trie[(prev, b)] = next_code
            next_code += 1
        prev = b
    return next_code


@settings(max_examples=15, deadline=None)
@given(st.sampled_from([510, 1022, 2046]), st.integers(0, 2**32 - 1))
def test_tiff_lzw_final_add_lands_on_width_boundary(target, seed):
    """The r9 escape: the lagged add performed while processing the FINAL
    data code lands the decoder table exactly on 510/1022/2046, so the
    width bumps with no further data code to resync on.  Both writer
    conventions must decode — libtiff (tif_lzw.c LZWPostEncode counts
    the flush, EOI at the NEW width) and TIFF6 §13 pseudocode (flush not
    counted, EOI at the OLD width, absorbed by the decoder's old-width
    EOI tolerance)."""
    rng = np.random.default_rng(seed)
    data = bytes(rng.integers(0, 256, 2600).astype(np.uint8))
    # adds are monotone in prefix length with unit steps, so the scan
    # always finds an exact landing for near-incompressible bytes
    n = next(
        (k for k in range(max(1, target - 300), len(data) + 1)
         if _tiff_flush_next_code(data[:k]) == target),
        None,
    )
    assert n is not None
    for count_flush in (True, False):
        enc = _lzw_encode_tiff(data[:n], count_flush=count_flush)
        assert bytes(_tiff_lzw_decode(enc)) == data[:n]


@settings(max_examples=15, deadline=None)
@given(st.sampled_from([511, 1023, 2047]), st.integers(0, 2**32 - 1))
def test_gif_lzw_final_add_lands_on_width_boundary(target, seed):
    """GIF analog of the TIFF corner.  Structurally immune — the decode
    loop stops once ``expected`` pixels are out and never reads the
    post-final EOI at the possibly-desynced width — pinned here so it
    STAYS immune if the loop condition ever changes."""
    rng = np.random.default_rng(seed)
    idx = bytes(rng.integers(0, 256, 2600).astype(np.uint8))
    n = next(
        (k for k in range(max(2, target - 560), len(idx) + 1)
         if _gif_flush_next_code(idx[:k], 8) == target),
        None,
    )
    assert n is not None
    data = gif_lzw_encode(idx[:n], 8)
    assert bytes(_gif_lzw_decode(data, 8, n)) == idx[:n]


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 2**32 - 1))
def test_vp8l_final_symbol_at_every_bit_offset(seed):
    """Sweep image width 1..16 at exactly 1 bit/pixel (two-symbol green
    code; the other channels are 0-bit single-symbol codes) so the FINAL
    pixel's symbol lands on every bit offset of the stream's last byte,
    including exactly on a byte boundary with zero padding — the VP8L
    member of the final-symbol boundary family."""
    rng = np.random.default_rng(seed)
    ga, gb = sorted(int(v) for v in rng.choice(256, 2, replace=False))
    for w in range(1, 17):
        wr = WLSB()
        wr.put(0x2F, 8)
        vp8l_header(wr, w, 1)
        wr.put(0, 1)  # no transform
        wr.put(0, 1)  # no cache
        wr.put(0, 1)  # no meta
        eg = simple_code(wr, [ga, gb])
        simple_code(wr, [10])   # red
        simple_code(wr, [20])   # blue
        simple_code(wr, [255])  # alpha
        simple_code(wr, [0])    # distance, unused
        vals = []
        for i in range(w):
            g = ga if (i + seed) % 2 == 0 else gb
            eg(g)
            vals.append((10 + g + 20) / 3.0)
        d = _decode_vp8l(wr.done())
        assert (d["width"], d["height"], d["channels"]) == (w, 1, 3)
        assert d["mean_level"] == pytest.approx(
            float(np.mean(vals)), abs=1e-9
        )


@settings(max_examples=10, deadline=None)
@given(st.integers(1, 8), st.integers(1, 4), st.integers(0, 2**32 - 1))
def test_jpeg_final_mcu_at_restart_boundary(n_mcu, ri, seed):
    """JPEG member of the final-symbol boundary family: sweep MCU count
    against the restart interval so the FINAL MCU lands both exactly ON
    and OFF a restart boundary — the encoder writes no trailing RST
    after the last MCU, so a decoder that expects one desyncs exactly
    when n_mcu % ri == 0 (the analog of the TIFF flush corner).
    Block-constant pixels keep quantization error to the DC term."""
    rng = np.random.default_rng(seed)
    blocks = rng.integers(0, 256, n_mcu)
    px = np.repeat(np.repeat(blocks[None, :], 8, axis=0), 8, axis=1).astype(
        np.uint8
    )
    meta = decode_image(encode_jpeg_gray(px, restart_interval=ri))
    assert (meta["width"], meta["height"]) == (8 * n_mcu, 8)
    assert abs(meta["mean_level"] - float(px.mean())) < 0.75


@settings(max_examples=10, deadline=None)
@given(st.integers(0, 3), st.integers(0, 2**32 - 1))
def test_flac_final_partition_rice_boundary(porder, seed):
    """Rice partition-order member of the family: sweep block sizes
    across multiples of 2^porder so the LAST partition's final rice
    code ends the residual section at varying offsets and partition
    sizes (including the minimum legal psize)."""
    rng = np.random.default_rng(seed)
    nparts = 1 << porder
    for mult in (1, 2, 5):
        n = nparts * mult
        s = [int(v) for v in rng.integers(-300, 300, n)]
        d = decode_audio(
            flac_file(
                [(s, {"kind": "fixed", "order": 0, "porder": porder})],
                n, 0, 1,
            )
        )
        assert d["n_samples"] == n
        assert d["rms"] == pytest.approx(rms_of([s]), abs=1e-12)


def test_flac_final_rice_bit_at_every_offset():
    """Sweep block size 1..16 with all-zero FIXED(0) residuals (rice
    param 0 → exactly 1 bit per residual) so the residual section's
    FINAL bit crosses every offset of its last byte, including landing
    exactly on the pre-CRC byte alignment — the FLAC member of the
    final-symbol boundary family."""
    for n in range(1, 17):
        d = decode_audio(
            flac_file([([0] * n, {"kind": "fixed", "order": 0})], n, 0, 1)
        )
        assert d["n_samples"] == n
        assert d["rms"] == 0.0


@settings(max_examples=50, deadline=None)
@given(st.binary(min_size=0, max_size=4000))
def test_packbits_roundtrip_any_bytes(data):
    assert bytes(_packbits_decode(_packbits_encode(data))) == data


# ---- GIF ----------------------------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    st.integers(1, 24), st.integers(1, 24),
    st.sampled_from([1, 2, 3]),  # color-table size field => 4/8/16 entries
    st.booleans(),
    st.integers(0, 2**32 - 1),
)
def test_gif_mean_matches_numpy(w, h, size_field, interlaced, seed):
    rng = np.random.default_rng(seed)
    n = 2 << size_field
    palette = rng.integers(0, 256, (n, 3)).astype(np.uint8)
    idx = rng.integers(0, n, w * h).astype(np.uint8)
    gif = _make_gif(w, h, palette, idx, size_field + 1,
                    interlaced=interlaced)
    d = _decode_gif(gif)
    assert (d["width"], d["height"]) == (w, h)
    assert d["mean_level"] == pytest.approx(float(palette[idx].mean()),
                                            abs=1e-9)


# ---- PNG ----------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 20), st.integers(1, 20),
    st.sampled_from([(0, 1), (2, 3), (4, 2), (6, 4)]),
    st.integers(0, 2**32 - 1),
)
def test_png_adam7_any_geometry(w, h, ct_ch, seed):
    """Adam7 with arbitrary dims: w or h < 8 leaves whole passes empty —
    the decoder's pass accounting must still consume the exact stream."""
    ct, ch = ct_ch
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    d = decode_image(encode_png_adam7(px, ct))
    assert (d["width"], d["height"]) == (w, h)
    assert d["mean_level"] == pytest.approx(float(px.mean()), abs=1e-9)


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 16), st.integers(1, 16),
       st.integers(1, 8), st.integers(0, 2**32 - 1))
def test_png_palette_any_size(w, h, n_entries, seed):
    rng = np.random.default_rng(seed)
    plte = rng.integers(0, 256, (n_entries, 3)).astype(np.uint8)
    idx = rng.integers(0, n_entries, (h, w)).astype(np.uint8)
    d = decode_image(encode_png_palette(idx, plte))
    assert d["mean_level"] == pytest.approx(float(plte[idx].mean()),
                                            abs=1e-9)


# ---- TIFF ---------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 16), st.integers(1, 16), st.sampled_from([1, 3, 4]),
    st.sampled_from([1, 5, 32773]), st.integers(1, 16),
    st.integers(0, 2**32 - 1),
)
@example(
    w=16,
    h=16,
    ch=3,
    compression=5,
    rps=16,
    seed=7,
).via('discovered failure')
def test_tiff_mean_any_geometry(w, h, ch, compression, rps, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, (h, w, ch)).astype(np.uint8)
    d = decode_image(
        _build_tiff(w, h, ch, px, compression=compression,
                    rows_per_strip=min(rps, h))
    )
    assert (d["width"], d["height"], d["channels"]) == (w, h, ch)
    assert d["mean_level"] == pytest.approx(float(px.mean()), abs=1e-9)


# ---- FLAC ---------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(
    st.integers(1, 96),
    st.sampled_from(["verbatim", "fixed"]),
    st.integers(0, 4),
    st.integers(0, 2**32 - 1),
)
def test_flac_mono_rms_any_block(n, kind, order, seed):
    if kind == "fixed" and order >= n:
        order = max(0, n - 1)
    rng = np.random.default_rng(seed)
    s = [int(v) for v in rng.integers(-3000, 3000, n)]
    kw = {"kind": kind}
    if kind == "fixed":
        kw["order"] = order
    d = decode_audio(flac_file([(s, kw)], n, 0, 1))
    assert d["n_samples"] == n
    assert d["rms"] == pytest.approx(rms_of([s]), abs=1e-12)


# ---- VP8L ---------------------------------------------------------------------


@settings(max_examples=20, deadline=None)
@given(st.integers(1, 16), st.integers(1, 16),
       st.integers(2, 6), st.integers(0, 2**32 - 1))
def test_vp8l_literals_any_geometry(w, h, n_colors, seed):
    rng = np.random.default_rng(seed)
    palette = sorted(
        int(v) for v in rng.choice(256, size=n_colors, replace=False)
    )
    px = rng.integers(0, n_colors, w * h)
    wr = WLSB()
    wr.put(0x2F, 8)
    vp8l_header(wr, w, h)
    wr.put(0, 1)
    wr.put(0, 1)
    wr.put(0, 1)
    lengths = {p: max(1, (n_colors - 1).bit_length()) for p in palette}
    eg = normal_code(wr, lengths, 256 + 24)
    er = normal_code(wr, lengths, 256)
    eb = normal_code(wr, lengths, 256)
    ea = simple_code(wr, [255])
    simple_code(wr, [0])
    for i in px:
        v = palette[int(i)]
        eg(v)
        er(v)
        eb(v)
        ea(255)
    d = _decode_vp8l(wr.done())
    exp = float(np.mean([palette[int(i)] for i in px]))
    assert (d["width"], d["height"]) == (w, h)
    assert d["mean_level"] == pytest.approx(exp, abs=1e-9)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 20), st.integers(1, 12),
       st.integers(1, 20), st.integers(0, 2**32 - 1))
def test_vp8l_palette_transform_any_geometry(w, h, n_pal, seed):
    """COLOR-INDEXING sweep: every bundling regime (1/2/4/8-bit) at
    random geometry, incl. widths that leave a partial trailing byte."""
    from test_vp8l_decode import _palette_stream

    rng = np.random.default_rng(seed)
    palette = [
        (255, int(r), int(g), int(b))
        for r, g, b in rng.integers(0, 256, (n_pal, 3))
    ]
    idx = [int(v) for v in rng.integers(0, n_pal, w * h)]
    d = _decode_vp8l(_palette_stream(w, h, palette, idx))
    exp = float(
        np.mean([(palette[i][1] + palette[i][2] + palette[i][3]) / 3.0
                 for i in idx])
    )
    assert (d["width"], d["height"]) == (w, h)
    assert d["mean_level"] == pytest.approx(exp, abs=1e-9)


@settings(max_examples=25, deadline=None)
@given(st.integers(1, 12), st.integers(1, 12), st.integers(0, 2**32 - 1))
def test_vp8l_subtract_green_any_geometry(w, h, seed):
    from test_vp8l_decode import _literal_emitters

    rng = np.random.default_rng(seed)
    argb = [
        (255, int(r), int(g), int(b))
        for r, g, b in rng.integers(0, 256, (w * h, 3))
    ]
    resid = [(a, (r - g) % 256, g, (b - g) % 256) for a, r, g, b in argb]
    wr = WLSB()
    wr.put(0x2F, 8)
    vp8l_header(wr, w, h)
    wr.put(1, 1)
    wr.put(2, 2)  # SUBTRACT-GREEN
    wr.put(0, 1)  # no more transforms
    wr.put(0, 1)  # no cache
    wr.put(0, 1)  # no meta
    emit = _literal_emitters(wr, resid)
    for p in resid:
        emit(p)
    d = _decode_vp8l(wr.done())
    exp = float(np.mean([(r + g + b) / 3.0 for _, r, g, b in argb]))
    assert d["mean_level"] == pytest.approx(exp, abs=1e-9)


@settings(max_examples=30, deadline=None)
@given(st.integers(1, 2000), st.integers(1, 2000), st.integers(1, 4),
       st.booleans(), st.booleans())
def test_isobmff_any_dims(w, h, channels, with_pitm, large_meta):
    """ISOBMFF sweep: dims/channels survive any geometry, pitm present
    or not, 32- or 64-bit meta box size."""
    import test_isobmff_headers as ib
    from end_to_end_datapipeline_project_spark.llm_ops.multimodal import (
        _parse_isobmff,
    )

    props = ib.ispe(w, h) + ib.pixi(channels)
    meta_extra = ib.pitm(1) if with_pitm else b""
    iprp_body = ib.box(b"ipco", props)
    if with_pitm:
        iprp_body += ib.ipma({1: [1, 2]})
    meta = b"\x00\x00\x00\x00" + meta_extra + ib.box(b"iprp", iprp_body)
    payload = ib.ftyp() + ib.box(b"meta", meta, large=large_meta)
    d = _parse_isobmff(payload)
    assert (d["width"], d["height"], d["channels"]) == (w, h, channels)

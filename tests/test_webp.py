"""WebP VP8L codec (operators/webp.py): encoder↔decoder roundtrips, a
REAL libwebp-produced ground-truth file, hand-forged bitstreams for
every spec construct the literal-only encoder can't emit (LZ77 refs,
color cache, meta prefix tiling, all four transforms), and the
dispatch wiring into probe_bytes / decode_image / image_dhash."""

import base64
import random

import pytest

from kusto_pre_forge_spark.operators import webp as W

#: the widely-published smallest transparent WebP — produced by libwebp,
#: NOT by this module, so it pins bit order, field order, and the
#: simple-prefix-code path against an independent implementation
REAL_1PX = base64.b64decode(
    "UklGRhoAAABXRUJQVlA4TA0AAAAvAAAAEAcQERGIiP4HAA=="
)


def test_real_libwebp_file_decodes():
    assert W.is_webp(REAL_1PX)
    assert W.webp_flavor(REAL_1PX) == "lossless"
    hdr = W.parse_webp_header(REAL_1PX)
    assert (hdr["width"], hdr["height"]) == (1, 1)
    w, h, ch, px = W.decode_webp(REAL_1PX)
    assert (w, h, ch) == (1, 1, 4)
    assert px == b"\x00\x00\x00\x00"  # fully transparent black


def test_roundtrip_channels_and_shapes():
    rng = random.Random(7)
    for (w, h, ch) in [(1, 1, 1), (3, 2, 3), (16, 16, 4), (7, 5, 3),
                       (33, 9, 4), (2, 40, 1)]:
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        dw, dh, dch, dpx = W.decode_webp(W.encode_webp_vp8l(w, h, ch, px))
        assert (dw, dh, dch) == (w, h, 4)
        for i in range(w * h):
            if ch == 1:
                exp = (px[i], px[i], px[i], 255)
            elif ch == 3:
                exp = (*px[3 * i : 3 * i + 3], 255)
            else:
                exp = tuple(px[4 * i : 4 * i + 4])
            assert tuple(dpx[4 * i : 4 * i + 4]) == exp, (w, h, ch, i)


def test_roundtrip_constant_and_two_tone():
    # single-symbol (zero-bit) and simple two-symbol code paths
    for vals in ([42], [0, 255]):
        px = bytes(vals[i % len(vals)] for i in range(8 * 8))
        _, _, _, dpx = W.decode_webp(W.encode_webp_vp8l(8, 8, 1, px))
        assert all(
            dpx[4 * i] == vals[i % len(vals)] for i in range(64)
        )


def test_distance_map_matches_spec_table():
    """The 120-entry 2D distance map is generated (full dy 0..7 ×
    dx −7..8 neighborhood by squared distance); the first rows of the
    spec's literal table pin the generation rule."""
    spec_head = [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
        (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2), (-3, 2), (0, 4), (4, 0),
        (1, 4), (-1, 4), (4, 1), (-4, 1), (3, 3), (-3, 3), (2, 4), (-2, 4),
        (4, 2), (-4, 2), (0, 5), (3, 4), (-3, 4), (4, 3), (-4, 3), (5, 0),
    ]
    assert W._DIST_MAP[: len(spec_head)] == spec_head
    assert len(W._DIST_MAP) == 120
    assert len(set(W._DIST_MAP)) == 120
    # every entry is a strict backward reference
    assert all(dy > 0 or dx > 0 for dx, dy in W._DIST_MAP)
    # the tail region (where dy caps at 7 and dx at 8)
    assert W._DIST_MAP[96] == (8, 0)
    assert W._DIST_MAP[-1] == (8, 7)


def _emit_symbols(bw, codes, symbols):
    single = len(codes) == 1
    for s in symbols:
        if single:
            continue  # single-symbol code: zero bits
        code, ln = codes[s]
        bw.write_code(code, ln)


def _plan(freq_syms, alphabet):
    freqs = {}
    for s in freq_syms:
        freqs[s] = freqs.get(s, 0) + 1
    lengths = W._package_merge(freqs, 15)
    lengths.extend([0] * (alphabet - len(lengths)))
    return lengths, W._canonical_codes(lengths)


def test_hand_forged_lz77_and_color_cache():
    """A stream the encoder never writes: literals A, B then an LZ77
    copy (len 3, dist 2 → the 2D plane-code map) then a color-cache
    hit of B — decoded pixels must be A B A B A B."""
    A = (0xFF, 10, 20, 30)  # (a, r, g, b)
    B = (0xFF, 40, 50, 60)
    pxA = (A[0] << 24) | (A[1] << 16) | (A[2] << 8) | A[3]
    pxB = (B[0] << 24) | (B[1] << 16) | (B[2] << 8) | B[3]
    cache_bits = 4
    idxB = (0x1E35A7BD * pxB & 0xFFFFFFFF) >> (32 - cache_bits)
    w, h = 6, 1
    # dist 2 at xsize 6 → plane (2, 0) → 1-based dist_code
    dist_code = W._DIST_MAP.index((2, 0)) + 1
    assert dist_code == 6
    # lz77 prefix for value 6: prefix 4, 1 extra bit = 1
    # lz77 prefix for length 3: prefix 2, 0 extra bits
    green_alpha = 256 + 24 + (1 << cache_bits)
    bw = W._BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(1, 1)  # color cache present
    bw.write(cache_bits, 4)
    bw.write(0, 1)  # no meta prefix
    g_lens, g_codes = _plan(
        [A[2], B[2], 256 + 2, 256 + 24 + idxB], green_alpha
    )
    r_lens, r_codes = _plan([A[1], B[1]], 256)
    b_lens, b_codes = _plan([A[3], B[3]], 256)
    a_lens, a_codes = _plan([A[0], B[0]], 256)
    d_lens, d_codes = _plan([4], 40)
    for lens, codes in (
        (g_lens, g_codes), (r_lens, r_codes), (b_lens, b_codes),
        (a_lens, a_codes), (d_lens, d_codes),
    ):
        W._write_prefix_code(bw, lens, codes)
    # literal A
    _emit_symbols(bw, g_codes, [A[2]])
    _emit_symbols(bw, r_codes, [A[1]])
    _emit_symbols(bw, b_codes, [A[3]])
    _emit_symbols(bw, a_codes, [A[0]])
    # literal B
    _emit_symbols(bw, g_codes, [B[2]])
    _emit_symbols(bw, r_codes, [B[1]])
    _emit_symbols(bw, b_codes, [B[3]])
    _emit_symbols(bw, a_codes, [B[0]])
    # LZ77: length 3 (green symbol 256+2, 0 extra), dist_code 6
    _emit_symbols(bw, g_codes, [256 + 2])
    _emit_symbols(bw, d_codes, [4])  # distance prefix 4 ...
    bw.write(1, 1)  # ... with 1 extra bit = 1 → value 6
    # color-cache hit of B
    _emit_symbols(bw, g_codes, [256 + 24 + idxB])
    blob = W.wrap_vp8l(b"\x2f" + bw.bytes())
    dw, dh, dch, dpx = W.decode_webp(blob)
    assert (dw, dh) == (6, 1)
    got = [tuple(dpx[4 * i : 4 * i + 4]) for i in range(6)]
    rgbaA = (A[1], A[2], A[3], A[0])
    rgbaB = (B[1], B[2], B[3], B[0])
    assert got == [rgbaA, rgbaB, rgbaA, rgbaB, rgbaA, rgbaB]


def _literal_image_bits(bw, argb_pixels, green_alpha=256 + 24):
    """Write one entropy-coded image (no cache, no meta) of literals."""
    bw.write(0, 1)  # no color cache
    g = [(p >> 8) & 0xFF for p in argb_pixels]
    r = [(p >> 16) & 0xFF for p in argb_pixels]
    b = [p & 0xFF for p in argb_pixels]
    a = [(p >> 24) & 0xFF for p in argb_pixels]
    plans = [
        _plan(g, green_alpha), _plan(r, 256), _plan(b, 256),
        _plan(a, 256), _plan([0], 40),
    ]
    for lens, codes in plans:
        W._write_prefix_code(bw, lens, codes)
    for i in range(len(argb_pixels)):
        for vals, (lens, codes) in zip((g, r, b, a), plans[:4]):
            _emit_symbols(bw, codes, [vals[i]])


def test_hand_forged_subtract_green_transform():
    w, h = 3, 1
    want = [(0xFF, 100, 30, 200), (0xFF, 5, 250, 17), (0xFF, 0, 0, 255)]
    coded = []
    for (a, r, g, b) in want:
        coded.append(
            (a << 24) | (((r - g) & 0xFF) << 16) | (g << 8) | ((b - g) & 0xFF)
        )
    bw = W._BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # transform present
    bw.write(2, 2)  # SUBTRACT_GREEN
    bw.write(0, 1)  # no more transforms
    # main image (ARGB role): cache bit, then meta bit
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g = [(p >> 8) & 0xFF for p in coded]
    r = [(p >> 16) & 0xFF for p in coded]
    b = [p & 0xFF for p in coded]
    a = [(p >> 24) & 0xFF for p in coded]
    plans = [
        _plan(g, 256 + 24), _plan(r, 256), _plan(b, 256),
        _plan(a, 256), _plan([0], 40),
    ]
    for lens, codes in plans:
        W._write_prefix_code(bw, lens, codes)
    for i in range(w * h):
        for vals, (lens, codes) in zip((g, r, b, a), plans[:4]):
            _emit_symbols(bw, codes, [vals[i]])
    blob = W.wrap_vp8l(b"\x2f" + bw.bytes())
    dw, dh, dch, dpx = W.decode_webp(blob)
    got = [tuple(dpx[4 * i : 4 * i + 4]) for i in range(w * h)]
    assert got == [(r, g, b, a) for (a, r, g, b) in want]


def test_hand_forged_palette_with_bundling():
    """COLOR_INDEXING with 4 colors → 2-bit sub-pixel bundling (4
    indices per coded green byte); palette entries are delta-coded."""
    w, h = 8, 1
    palette = [
        (0xFF, 1, 2, 3), (0xFF, 9, 8, 7), (0x80, 100, 0, 0),
        (0xFF, 0, 0, 0),
    ]
    pal_px = [
        (a << 24) | (r << 16) | (g << 8) | b for (a, r, g, b) in palette
    ]
    indices = [0, 1, 2, 3, 3, 2, 1, 0]
    packed = [0xE4, 0x1B]  # LSB-first 2-bit packing of the two quads
    bw = W._BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # transform
    bw.write(3, 2)  # COLOR_INDEXING
    bw.write(len(palette) - 1, 8)
    # palette image: width=n_colors, height=1, DELTA-coded per channel
    deltas = [pal_px[0]]
    for i in range(1, len(pal_px)):
        d = 0
        for sh in (24, 16, 8, 0):
            d |= (((pal_px[i] >> sh) - (pal_px[i - 1] >> sh)) & 0xFF) << sh
        deltas.append(d)
    _literal_image_bits(bw, deltas)
    bw.write(0, 1)  # no more transforms
    # main (packed) image: green holds the bundled indices
    coded = [(0xFF << 24) | (v << 8) for v in packed]
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta (ARGB role)
    g = [(p >> 8) & 0xFF for p in coded]
    plans = [
        _plan(g, 256 + 24), _plan([0], 256), _plan([0], 256),
        _plan([0xFF], 256), _plan([0], 40),
    ]
    for lens, codes in plans:
        W._write_prefix_code(bw, lens, codes)
    for i in range(len(coded)):
        _emit_symbols(bw, plans[0][1], [g[i]])
        _emit_symbols(bw, plans[1][1], [0])
        _emit_symbols(bw, plans[2][1], [0])
        _emit_symbols(bw, plans[3][1], [0xFF])
    blob = W.wrap_vp8l(b"\x2f" + bw.bytes())
    dw, dh, dch, dpx = W.decode_webp(blob)
    assert (dw, dh) == (8, 1)
    got = [tuple(dpx[4 * i : 4 * i + 4]) for i in range(8)]
    want = [palette[i] for i in indices]
    assert got == [(r, g, b, a) for (a, r, g, b) in want]


def test_hand_forged_predictor_transform():
    """PREDICTOR transform, one 4x2 tile with mode 1 (left): residuals
    invert against the spec's edge rules (top-left = opaque black, top
    row = left, first column = top)."""
    w, h = 4, 2
    want = [
        (0xFF, 10, 10, 10), (0xFF, 12, 11, 13), (0xFF, 12, 11, 13),
        (0xFF, 20, 30, 40),
        (0xFF, 10, 10, 10), (0xFF, 9, 9, 9), (0xFF, 9, 9, 9),
        (0xFF, 9, 9, 9),
    ]
    want_px = [
        (a << 24) | (r << 16) | (g << 8) | b for (a, r, g, b) in want
    ]
    residuals = []
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = want_px[pos - 1]
            elif x == 0:
                pred = want_px[pos - w]
            else:
                pred = want_px[pos - 1]  # tile mode 1 = left
            d = 0
            for sh in (24, 16, 8, 0):
                d |= (((want_px[pos] >> sh) - (pred >> sh)) & 0xFF) << sh
            residuals.append(d)
    bw = W._BitWriter()
    bw.write(w - 1, 14)
    bw.write(h - 1, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # transform
    bw.write(0, 2)  # PREDICTOR
    bw.write(0, 3)  # size_bits - 2 = 0 → 4px tiles → 1x1 tile image
    _literal_image_bits(bw, [(0xFF << 24) | (1 << 8)])  # mode 1 in green
    bw.write(0, 1)  # no more transforms
    bw.write(0, 1)  # no cache
    bw.write(0, 1)  # no meta
    g = [(p >> 8) & 0xFF for p in residuals]
    r = [(p >> 16) & 0xFF for p in residuals]
    b = [p & 0xFF for p in residuals]
    a = [(p >> 24) & 0xFF for p in residuals]
    plans = [
        _plan(g, 256 + 24), _plan(r, 256), _plan(b, 256),
        _plan(a, 256), _plan([0], 40),
    ]
    for lens, codes in plans:
        W._write_prefix_code(bw, lens, codes)
    for i in range(w * h):
        for vals, (lens, codes) in zip((g, r, b, a), plans[:4]):
            _emit_symbols(bw, codes, [vals[i]])
    blob = W.wrap_vp8l(b"\x2f" + bw.bytes())
    dw, dh, dch, dpx = W.decode_webp(blob)
    got = [tuple(dpx[4 * i : 4 * i + 4]) for i in range(w * h)]
    assert got == [(r, g, b, a) for (a, r, g, b) in want]


def _lossy_blob() -> bytes:
    # a minimal VP8 (lossy) container (header-only bitstream, 16×8)
    body = b"\x00\x00\x00\x9d\x01\x2a\x10\x00\x08\x00" + b"\x00" * 6
    chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
    return b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk


def test_lossy_vp8_refuses_naming_the_hatch():
    from kusto_pre_forge_spark.operators import multimodal

    if multimodal.pyav_available():
        pytest.skip("pyav present: the hatch is open, refusal unreachable")
    blob = _lossy_blob()
    assert W.webp_flavor(blob) == "lossy"
    hdr = W.parse_webp_header(blob)
    assert (hdr["width"], hdr["height"]) == (16, 8)
    with pytest.raises(NotImplementedError, match="pyav|install av"):
        W.decode_webp(blob)
    from kusto_pre_forge_spark.operators.mediacodec import decodable_image

    assert not decodable_image(blob)  # NULL-row path, not a crash


def test_lossy_vp8_routes_through_pyav_when_present(monkeypatch):
    """The hatch is ROUTED, not just named: with an importable ``av``,
    decode_webp hands the WHOLE container to pyav and returns its RGBA
    frame, and decodable_image flips to True for lossy WebP. A stub
    ``av`` module stands in for the wheel so the routing is pinned in
    every environment (the real-decoder twin is env-gated below)."""
    import sys
    import types

    import numpy as np

    w, h = 16, 8
    rgba = np.arange(w * h * 4, dtype=np.uint8).reshape(h, w, 4)

    class _Frame:
        def to_ndarray(self, format):
            assert format == "rgba"
            return rgba

    class _Container:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video=0):
            yield _Frame()

    captured = {}
    fake = types.ModuleType("av")

    def _open(buf):
        captured["raw"] = buf.read()
        return _Container()

    fake.open = _open
    monkeypatch.setitem(sys.modules, "av", fake)

    blob = _lossy_blob()
    dw, dh, ch, px = W.decode_webp(blob)
    assert (dw, dh, ch) == (16, 8, 4)
    assert px == rgba.tobytes()
    assert captured["raw"] == blob  # the whole container reaches pyav
    from kusto_pre_forge_spark.operators.mediacodec import decodable_image

    assert decodable_image(blob)


def test_lossy_vp8_pyav_real_decode():
    """Env-gated twin (the compressed-audio pattern): where the real
    pyav wheel is importable, a lossy still decodes to pixels of the
    header's dimensions through the same route the stub test pins."""
    from kusto_pre_forge_spark.operators import multimodal

    if not multimodal.pyav_available():
        pytest.skip("pyav not installed in this environment")
    # the stub-test blob is header-only (no coefficient data), so forge
    # nothing: any failure to produce frames must surface, not silently
    # pass. A real lossy file is not forgeable dependency-free; assert
    # the route raises pyav's own error rather than the refusal.
    try:
        W.decode_webp(_lossy_blob())
    except NotImplementedError:  # pragma: no cover
        pytest.fail("pyav present but the lossy route still refused")
    except Exception:
        pass  # pyav rejected the truncated bitstream — route exercised


def test_wrap_anmf_still_lossless_roundtrip():
    """wrap_anmf_still re-containers an ANMF frame's sub-chunks into a
    standalone WebP — pinned WITHOUT pyav by wrapping a VP8L sub-chunk
    and decoding the result through the in-tree lossless decoder."""
    src = W.encode_webp_vp8l(
        2, 2, 4, bytes([255, 0, 0, 255, 0, 255, 0, 255] * 2)
    )
    vp8l = next(body for tag, body in W._webp_chunks(src) if tag == b"VP8L")
    sub = b"VP8L" + len(vp8l).to_bytes(4, "little") + vp8l
    if len(vp8l) & 1:
        sub += b"\x00"
    wrapped = W.wrap_anmf_still(sub, 2, 2)
    assert W.is_webp(wrapped)
    w, h, ch, px = W.decode_webp(wrapped)
    assert (w, h, ch) == (2, 2, 4)
    assert px == bytes([255, 0, 0, 255, 0, 255, 0, 255] * 2)


def test_wrap_anmf_still_alpha_forces_vp8x():
    """An ALPH sub-chunk forces the VP8X extended layout with the alpha
    flag and keeps ALPH before the image chunk (container spec order)."""
    alph = b"ALPH" + (3).to_bytes(4, "little") + b"\x00ab" + b"\x00"
    body = b"\x00" * 10
    vp8 = b"VP8 " + len(body).to_bytes(4, "little") + body
    wrapped = W.wrap_anmf_still(alph + vp8, 16, 8)
    tags = [t for t, _ in W._webp_chunks(wrapped)]
    assert tags == [b"VP8X", b"ALPH", b"VP8 "]
    vp8x = next(b for t, b in W._webp_chunks(wrapped) if t == b"VP8X")
    assert vp8x[0] & 0x10  # alpha flag
    assert int.from_bytes(vp8x[4:7], "little") + 1 == 16
    assert int.from_bytes(vp8x[7:10], "little") + 1 == 8


def test_lossy_anmf_frame_routes_through_pyav(monkeypatch):
    """An animated WebP whose frames are lossy VP8 composites through
    the pyav route: each ANMF frame re-wraps as a standalone still and
    its decoded RGBA lands on the canvas."""
    import sys
    import types

    import numpy as np

    fw, fh = 4, 2
    rgba = np.full((fh, fw, 4), 7, dtype=np.uint8)

    class _Frame:
        def to_ndarray(self, format):
            return rgba

    class _Container:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def decode(self, video=0):
            yield _Frame()

    seen = []
    fake = types.ModuleType("av")

    def _open(buf):
        seen.append(buf.read())
        return _Container()

    fake.open = _open
    monkeypatch.setitem(sys.modules, "av", fake)

    body = b"\x00" * 10
    sub = b"VP8 " + len(body).to_bytes(4, "little") + body
    anmf_body = (
        (0).to_bytes(3, "little")
        + (0).to_bytes(3, "little")
        + (fw - 1).to_bytes(3, "little")
        + (fh - 1).to_bytes(3, "little")
        + (100).to_bytes(3, "little")
        + bytes([0x02])  # no_blend
        + sub
    )
    vp8x_body = (
        bytes([0x02, 0, 0, 0])  # animation flag
        + (fw - 1).to_bytes(3, "little")
        + (fh - 1).to_bytes(3, "little")
    )
    payload = (
        b"VP8X" + len(vp8x_body).to_bytes(4, "little") + vp8x_body
        + b"ANMF" + len(anmf_body).to_bytes(4, "little") + anmf_body
    )
    blob = (
        b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP" + payload
    )
    cw, ch_, frames, durs = W.decode_webp_frames(blob)
    assert (cw, ch_) == (fw, fh)
    assert frames == [rgba.tobytes()]
    assert durs == [100]
    # the re-wrapped still that reached pyav is a valid WebP container
    assert len(seen) == 1 and W.is_webp(seen[0])
    assert [t for t, _ in W._webp_chunks(seen[0])] == [b"VP8 "]


def test_vp8x_extended_container_walk():
    """VP8L inside a VP8X extended container still decodes (the layout
    files with EXIF/ICC metadata use)."""
    inner = W.encode_webp_vp8l(3, 2, 3, bytes(range(18)))
    # extract the VP8L chunk and rewrap with a VP8X front chunk
    vp8l_chunk = inner[12:]
    vp8x_body = bytes([0, 0, 0, 0]) + (2).to_bytes(3, "little") + (
        1
    ).to_bytes(3, "little")
    vp8x = b"VP8X" + len(vp8x_body).to_bytes(4, "little") + vp8x_body
    payload = vp8x + vp8l_chunk
    blob = b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP" + payload
    w, h, ch, px = W.decode_webp(blob)
    assert (w, h, ch) == (3, 2, 4)
    hdr = W.parse_webp_header(blob)
    assert (hdr["width"], hdr["height"]) == (3, 2)


def test_dispatch_probe_decode_image_dhash(spark):
    from kusto_pre_forge_spark.operators import mediacodec as mc
    from kusto_pre_forge_spark.operators import multimodal
    from kusto_pre_forge_spark.sources.autoextract import (
        extract_auto,
        sniff_format,
    )

    grad = bytes(x * 14 for x in range(18)) * 8
    blob = W.encode_webp_vp8l(18, 8, 1, grad)
    assert sniff_format(blob) == "webp"
    assert extract_auto(blob) == ("webp", None)
    assert mc.probe_bytes(blob)["media_kind"] == "webp"
    assert mc.decodable_image(blob)
    w, h, ch, px = mc.decode_image(blob)
    assert (w, h, ch) == (18, 8, 4)
    # the image-dedup family sees WebP: gradient hashes -1 like GIF/PNG
    df = spark.createDataFrame([(1, blob)], "doc_id long, blob binary")
    row = multimodal.image_dhash(df).collect()[0]
    assert (row.dhash, row.width, row.height) == (-1, 18, 8)
    # lossy WebP takes the NULL-row soft path, never crashes the task
    body = b"\x00\x00\x00\x9d\x01\x2a\x12\x00\x08\x00" + b"\x00" * 6
    chunk = b"VP8 " + len(body).to_bytes(4, "little") + body
    lossy = b"RIFF" + (4 + len(chunk)).to_bytes(4, "little") + b"WEBP" + chunk
    assert not mc.decodable_image(lossy)
    df2 = spark.createDataFrame([(2, lossy)], "doc_id long, blob binary")
    row2 = multimodal.image_dhash(df2).collect()[0]
    assert row2.dhash is None and row2.width == 18


def test_hypothesis_roundtrip():
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(
        st.integers(1, 12), st.integers(1, 12),
        st.sampled_from([1, 3, 4]), st.randoms(use_true_random=False),
    )
    def check(w, h, ch, rng):
        px = bytes(rng.randrange(256) for _ in range(w * h * ch))
        dw, dh, dch, dpx = W.decode_webp(W.encode_webp_vp8l(w, h, ch, px))
        assert (dw, dh, dch) == (w, h, 4)
        if ch == 4:
            assert dpx == px

    check()


def test_roundtrip_uniform_noise_degenerate_codes():
    """All-256-symbols-uniform channels force the degenerate
    single-symbol CODE-LENGTH code (every length 8): the encoder must
    emit ZERO bits per symbol length — the libwebp 0-bit convention
    the decoder implements. Caught live on a 256x256 noise image."""
    rng = random.Random(1)
    w = h = 32
    px = bytes(rng.randrange(256) for _ in range(w * h * 4))
    dw, dh, dch, dpx = W.decode_webp(W.encode_webp_vp8l(w, h, 4, px))
    assert dpx == px


def test_animated_webp_compositing(spark):
    """ANMF compositing mirrors the GIF contract: a fully transparent
    blended overlay leaves the canvas unchanged, a no-blend sub-frame
    overwrites its rectangle, dispose clears it, and sample_frames
    fingerprints the composited canvas states."""
    from kusto_pre_forge_spark.operators import multimodal

    w = h = 8
    grad = bytes(
        c for y in range(h) for x in range(w) for c in (x * 30 % 256,) * 3 + (255,)
    )
    const = bytes((7, 8, 9, 255)) * (w * h)
    overlay = bytes((255, 0, 0, 255)) * 16
    trans = bytes((0, 0, 0, 0)) * 16
    blob = W.encode_webp_animation(w, h, [
        {"pixels": grad, "duration": 50},
        {"pixels": trans, "w": 4, "h": 4, "x": 2, "y": 2, "duration": 60},
        {"pixels": overlay, "w": 4, "h": 4, "x": 4, "y": 4,
         "blend": False, "duration": 70, "dispose": True},
        {"pixels": const, "duration": 80},
    ])
    assert W.is_animated_webp(blob)
    assert W.webp_flavor(blob) == "lossless"
    cw, ch, frames, durs = W.decode_webp_frames(blob)
    assert (cw, ch, len(frames), durs) == (8, 8, 4, [50, 60, 70, 80])
    assert frames[0] == frames[1]  # transparent blend is a no-op
    assert tuple(frames[2][4 * (5 * w + 5) :][:4]) == (255, 0, 0, 255)
    # dispose cleared the overlay rect before the final frame painted
    assert all(
        tuple(frames[3][4 * i : 4 * i + 4]) == (7, 8, 9, 255)
        for i in range(w * h)
    )
    # decode_image view of an animation = first composited frame
    dw, dh, dch, first = W.decode_webp(blob)
    assert (dw, dh, dch) == (8, 8, 4) and first == frames[0]
    # max_frames early-stop
    assert len(W.decode_webp_frames(blob, max_frames=2)[2]) == 2
    # sample_frames: every_n=2 keeps composited frames 0 and 2
    df = spark.createDataFrame([(1, blob)], "doc_id long, blob binary")
    rows = sorted(
        multimodal.sample_frames(df, every_n=2).collect(),
        key=lambda r: r.frame_index,
    )
    import hashlib

    assert [(r.frame_index, r.frame_sha) for r in rows] == [
        (0, hashlib.sha256(frames[0]).hexdigest()),
        (2, hashlib.sha256(frames[2]).hexdigest()),
    ]

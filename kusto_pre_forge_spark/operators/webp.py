"""WebP (VP8L lossless) codec — dependency-free, from the public WebP
Lossless Bitstream Specification (the same class of work as the GIF LZW
and PNG inflate decoders in ``mediacodec``). WebP is the most common
post-2015 crawl image format after JPEG; without this branch the whole
perceptual-hash dedup family (``image_dhash``/``image_phash``/
``hamming_pairs``) is blind to it.

Scope: the LOSSLESS stream ('VP8L' chunk, incl. inside a 'VP8X'
extended container) decodes fully — prefix codes (simple + code-length
coded, max-symbol form), meta prefix-code tiling, LZ77 backward
references with the 120-entry 2D distance map, the color cache, and all
four transforms (predictor ×14 modes, cross-color, subtract-green,
color-indexing with sub-pixel bundling). LOSSY streams ('VP8 ' chunk)
route through the pyav import-try hatch where the wheel is present
(the ``decode_audio_any`` convention — a DCT video-intra decoder is
pyav's job, not stdlib arithmetic), and refuse loudly NAMING the hatch
where it is not: lossy is the majority of CDN-served crawl WebP, so on
a pyav-equipped cluster the whole image-dedup family sees it.

The encoder (:func:`encode_webp_vp8l`) is the fixture forge AND the
roundtrip oracle: literal-only coding, no transforms, package-merge
depth-limited canonical codes — every byte it writes exercises the
decoder's prefix-code reader (simple, code-length, and max-symbol
paths).

Parity note: the reference (microsoft/kusto-pre-forge, EtlRun.cs:87-89)
declares no image handling at all — this is extension surface for the
LLM-data pipeline (multimodal dedup over crawl images).
"""

from __future__ import annotations

import struct

# ------------------------------------------------------------- bit I/O
# VP8L bit order: bits fill bytes LSB-first; prefix-code bits are read
# one at a time, first-read bit = MSB of the canonical code (the
# DEFLATE convention).


class _BitReader:
    """LSB-first reader over a byte window. Each read slices only the
    bytes it touches (a whole-stream big-int shift would make every
    read O(stream size) — quadratic on megabyte images)."""

    __slots__ = ("data", "pos", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.nbits = 8 * len(data)
        self.pos = 0

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        pos = self.pos
        if pos + n > self.nbits:
            raise ValueError("VP8L bitstream truncated")
        self.pos = pos + n
        first = pos >> 3
        last = (pos + n + 7) >> 3
        chunk = int.from_bytes(self.data[first:last], "little")
        return (chunk >> (pos & 7)) & ((1 << n) - 1)


class _BitWriter:
    __slots__ = ("out", "cur", "n")

    def __init__(self):
        self.out = bytearray()
        self.cur = 0
        self.n = 0

    def write(self, value: int, n: int) -> None:
        self.cur |= (value & ((1 << n) - 1)) << self.n
        self.n += n
        while self.n >= 8:
            self.out.append(self.cur & 0xFF)
            self.cur >>= 8
            self.n -= 8

    def write_code(self, code: int, length: int) -> None:
        """Canonical prefix code: MSB first, one bit at a time."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        if self.n:
            self.out.append(self.cur & 0xFF)
            self.cur, self.n = 0, 0
        return bytes(self.out)


# ------------------------------------------- canonical prefix codes


class _PrefixCode:
    """Canonical (RFC 1951-style) prefix code from code lengths; decode
    reads one bit at a time, first bit = MSB (zlib's incremental walk).
    A single-symbol code decodes with ZERO bits read (the spec's
    length-0 convention)."""

    __slots__ = ("counts", "offsets", "symbols", "single")

    def __init__(self, lengths: list[int]):
        nz = [(ln, s) for s, ln in enumerate(lengths) if ln > 0]
        if not nz:
            raise ValueError("prefix code with no symbols")
        if len(nz) == 1:
            self.single = nz[0][1]
            return
        self.single = None
        max_len = max(ln for ln, _ in nz)
        counts = [0] * (max_len + 1)
        for ln, _ in nz:
            counts[ln] += 1
        # Kraft completeness: an over/under-subscribed code is corrupt
        total = 0
        for ln in range(1, max_len + 1):
            total = (total << 1) + counts[ln]
        if total != (1 << max_len):
            raise ValueError("invalid prefix code (Kraft violation)")
        nz.sort()
        self.counts = counts
        self.symbols = [s for _, s in nz]
        offs = [0] * (max_len + 1)
        acc = 0
        for ln in range(1, max_len + 1):
            offs[ln] = acc
            acc += counts[ln]
        self.offsets = offs

    def decode(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        first = 0
        for ln in range(1, len(self.counts)):
            code = (code << 1) | br.read(1)
            cnt = self.counts[ln]
            if code - first < cnt:
                return self.symbols[self.offsets[ln] + code - first]
            first = (first + cnt) << 1
        raise ValueError("invalid prefix-code bits")


def _canonical_codes(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), RFC 1951 canonical assignment."""
    nz = sorted((ln, s) for s, ln in enumerate(lengths) if ln > 0)
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    prev_len = 0
    for ln, s in nz:
        code <<= ln - prev_len
        codes[s] = (code, ln)
        code += 1
        prev_len = ln
    return codes


def _package_merge(freqs: dict[int, int], max_len: int) -> list[int]:
    """Depth-limited optimal code lengths (package-merge). Returns a
    full lengths list over max(symbol)+1 entries (0 = unused)."""
    syms = sorted(freqs)
    n = len(syms)
    size = (max(syms) + 1) if syms else 0
    lengths = [0] * size
    if n == 1:
        lengths[syms[0]] = 1
        return lengths
    # packages: list of (weight, {sym: count}) built level by level
    level: list[tuple[int, dict]] = []
    for _ in range(max_len):
        items = [(freqs[s], {s: 1}) for s in syms]
        merged: list[tuple[int, dict]] = []
        pool = sorted(items + level, key=lambda x: x[0])
        for i in range(0, len(pool) - 1, 2):
            w = pool[i][0] + pool[i + 1][0]
            d: dict = {}
            for src in (pool[i][1], pool[i + 1][1]):
                for k, v in src.items():
                    d[k] = d.get(k, 0) + v
            merged.append((w, d))
        level = merged
    level.sort(key=lambda x: x[0])
    active = {}
    for _, d in level[: n - 1]:
        for k, v in d.items():
            active[k] = active.get(k, 0) + v
    for s in syms:
        lengths[s] = active.get(s, 0)
    return lengths


# ------------------------------------------------- spec constants

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)

#: 2D LZ77 distance map (spec "plane codes"): the COMPLETE neighborhood
#: dy in 0..7, dx in -7..8 (dy>0, or dy==0 with dx>0 — 120 offsets
#: exactly), ordered by squared euclidean distance, ties broken larger
#: dy first, then larger dx. This reproduces the spec's 120-entry table
#: algorithmically; dist_code > 120 means a plain linear distance.
_DIST_MAP = sorted(
    (
        (dx, dy)
        for dy in range(8)
        for dx in range(-7, 9)
        if dy > 0 or dx > 0
    ),
    key=lambda p: (p[0] * p[0] + p[1] * p[1], -p[1], -p[0]),
)
assert len(_DIST_MAP) == 120

_GREEN_BASE = 256
_N_LENGTH = 24
_N_DIST = 40


def _lz77_value(prefix: int, br: _BitReader) -> int:
    """Length/distance prefix symbol -> value (spec LZ77 prefix coding)."""
    if prefix < 4:
        return prefix + 1
    extra = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra
    return offset + br.read(extra) + 1


def _dist_from_code(dist_code: int, xsize: int) -> int:
    if dist_code > 120:
        return dist_code - 120
    dx, dy = _DIST_MAP[dist_code - 1]
    return max(1, dy * xsize + dx)


# --------------------------------------------------------- decoding


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        first_8bits = br.read(1)
        sym0 = br.read(8 if first_8bits else 1)
        lengths = [0] * alphabet_size
        if num_symbols == 1:
            if sym0 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = 1  # single symbol → 0-bit decode
        else:
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            lengths[sym0] = 1
            lengths[sym1] = 1
        return _PrefixCode(lengths)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_code = _PrefixCode(cl_lengths)
    if br.read(1):  # explicit max symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = []
    prev = 8
    while len(lengths) < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        s = cl_code.decode(br)
        if s < 16:
            lengths.append(s)
            if s:
                prev = s
        elif s == 16:
            lengths.extend([prev] * (3 + br.read(2)))
        elif s == 17:
            lengths.extend([0] * (3 + br.read(3)))
        else:
            lengths.extend([0] * (11 + br.read(7)))
    lengths = lengths[:alphabet_size]
    lengths.extend([0] * (alphabet_size - len(lengths)))
    return _PrefixCode(lengths)


def _div_round_up(a: int, shift: int) -> int:
    return (a + (1 << shift) - 1) >> shift


def _decode_entropy_image(
    br: _BitReader, w: int, h: int, allow_meta: bool
) -> list[int]:
    """One entropy-coded VP8L image (spec 'decoding image data') →
    row-major ARGB uint32 list. ``allow_meta``: only the ARGB-role
    image may carry a meta prefix-code tiling."""
    cache_bits = 0
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError(f"bad color-cache bits {cache_bits}")
    meta = None
    meta_bits = 0
    num_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw, mh = _div_round_up(w, meta_bits), _div_round_up(h, meta_bits)
        meta = _decode_entropy_image(br, mw, mh, allow_meta=False)
        num_groups = 1 + max(((p >> 8) & 0xFFFF) for p in meta)
    green_size = _GREEN_BASE + _N_LENGTH + (1 << cache_bits if cache_bits else 0)
    groups = []
    for _ in range(num_groups):
        groups.append(
            (
                _read_prefix_code(br, green_size),
                _read_prefix_code(br, 256),  # red
                _read_prefix_code(br, 256),  # blue
                _read_prefix_code(br, 256),  # alpha
                _read_prefix_code(br, _N_DIST),
            )
        )
    cache = [0] * (1 << cache_bits) if cache_bits else None
    cache_shift = 32 - cache_bits if cache_bits else 0
    n = w * h
    out = [0] * n
    pos = 0
    tiles_per_row = _div_round_up(w, meta_bits) if meta is not None else 0
    group = groups[0]
    while pos < n:
        if meta is not None:
            x, y = pos % w, pos // w
            mp = meta[(y >> meta_bits) * tiles_per_row + (x >> meta_bits)]
            group = groups[(mp >> 8) & 0xFFFF]
        g_code, r_code, b_code, a_code, d_code = group
        s = g_code.decode(br)
        if s < _GREEN_BASE:
            red = r_code.decode(br)
            blue = b_code.decode(br)
            alpha = a_code.decode(br)
            px = (alpha << 24) | (red << 16) | (s << 8) | blue
            out[pos] = px
            if cache is not None:
                cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> cache_shift] = px
            pos += 1
        elif s < _GREEN_BASE + _N_LENGTH:
            length = _lz77_value(s - _GREEN_BASE, br)
            dist_code = _lz77_value(d_code.decode(br), br)
            dist = _dist_from_code(dist_code, w)
            if dist > pos or pos + length > n:
                raise ValueError("VP8L backward reference out of range")
            for _ in range(length):
                px = out[pos - dist]
                out[pos] = px
                if cache is not None:
                    cache[(0x1E35A7BD * px & 0xFFFFFFFF) >> cache_shift] = px
                pos += 1
        else:
            if cache is None:
                raise ValueError("color-cache symbol without a cache")
            out[pos] = cache[s - _GREEN_BASE - _N_LENGTH]
            pos += 1
    return out


# ------------------------------------------------- inverse transforms


def _avg2(a: int, b: int) -> int:
    return (a + b) >> 1


def _predict(mode: int, left: int, top: int, tl: int, tr: int) -> int:
    """One of the 14 spatial predictors, per-channel on packed ARGB."""
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return left
    if mode == 2:
        return top
    if mode == 3:
        return tr
    if mode == 4:
        return tl

    def per_channel(f) -> int:
        out = 0
        for sh in (24, 16, 8, 0):
            out |= (
                f((left >> sh) & 0xFF, (top >> sh) & 0xFF,
                  (tl >> sh) & 0xFF, (tr >> sh) & 0xFF) & 0xFF
            ) << sh
        return out

    if mode == 5:
        return per_channel(lambda l, t, c, r: _avg2(_avg2(l, r), t))
    if mode == 6:
        return per_channel(lambda l, t, c, r: _avg2(l, c))
    if mode == 7:
        return per_channel(lambda l, t, c, r: _avg2(l, t))
    if mode == 8:
        return per_channel(lambda l, t, c, r: _avg2(c, t))
    if mode == 9:
        return per_channel(lambda l, t, c, r: _avg2(t, r))
    if mode == 10:
        return per_channel(lambda l, t, c, r: _avg2(_avg2(l, c), _avg2(t, r)))
    if mode == 11:
        # Select: whichever of top/left is closer to the gradient
        pa = pb = 0
        for sh in (24, 16, 8, 0):
            lc = (left >> sh) & 0xFF
            tc = (top >> sh) & 0xFF
            cc = (tl >> sh) & 0xFF
            pa += abs(lc - cc)
            pb += abs(tc - cc)
        return top if pa <= pb else left
    if mode == 12:
        return per_channel(
            lambda l, t, c, r: min(255, max(0, l + t - c))
        )
    if mode == 13:
        def half(l, t, c, r):
            a = _avg2(l, t)
            d = a - c
            q = d // 2 if d >= 0 else -((-d) // 2)  # C trunc-toward-zero
            return min(255, max(0, a + q))

        return per_channel(half)
    raise ValueError(f"unknown predictor mode {mode}")


def _inv_predictor(
    pixels: list[int], w: int, h: int, tiles: list[int], bits: int
) -> None:
    tiles_per_row = _div_round_up(w, bits)
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            if pos == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[pos - 1]  # left
            elif x == 0:
                pred = pixels[pos - w]  # top
            else:
                mode = (
                    tiles[(y >> bits) * tiles_per_row + (x >> bits)] >> 8
                ) & 0xFF
                pred = _predict(
                    mode,
                    pixels[pos - 1],
                    pixels[pos - w],
                    pixels[pos - w - 1],
                    pixels[pos - w + 1],
                )
            px = pixels[pos]
            out = 0
            for sh in (24, 16, 8, 0):
                out |= (((px >> sh) + (pred >> sh)) & 0xFF) << sh
            pixels[pos] = out


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-8bit t × signed-8bit c, >> 5."""
    if t >= 128:
        t -= 256
    if c >= 128:
        c -= 256
    return (t * c) >> 5


def _inv_color_transform(
    pixels: list[int], w: int, h: int, tiles: list[int], bits: int
) -> None:
    tiles_per_row = _div_round_up(w, bits)
    for y in range(h):
        for x in range(w):
            pos = y * w + x
            m = tiles[(y >> bits) * tiles_per_row + (x >> bits)]
            g2r = m & 0xFF          # blue byte
            g2b = (m >> 8) & 0xFF   # green byte
            r2b = (m >> 16) & 0xFF  # red byte
            px = pixels[pos]
            a = (px >> 24) & 0xFF
            r = (px >> 16) & 0xFF
            g = (px >> 8) & 0xFF
            b = px & 0xFF
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            pixels[pos] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(pixels: list[int]) -> None:
    for i, px in enumerate(pixels):
        g = (px >> 8) & 0xFF
        r = (((px >> 16) & 0xFF) + g) & 0xFF
        b = ((px & 0xFF) + g) & 0xFF
        pixels[i] = (px & 0xFF00FF00) | (r << 16) | b


def decode_vp8l(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode one VP8L chunk payload → (width, height, 4, RGBA bytes)."""
    if not data or data[0] != 0x2F:
        raise ValueError("not a VP8L stream (bad signature)")
    br = _BitReader(data[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    br.read(1)  # alpha-is-used hint
    if br.read(3) != 0:
        raise ValueError("unsupported VP8L version")
    # transforms (top level only), each at most once, read order kept
    transforms: list[tuple] = []
    cur_w = w
    seen = set()
    while br.read(1):
        ttype = br.read(2)
        if ttype in seen:
            raise ValueError("duplicate VP8L transform")
        seen.add(ttype)
        if ttype == 2:  # subtract green — no data
            transforms.append((2, None, None))
        elif ttype in (0, 1):  # predictor / color transform
            bits = br.read(3) + 2
            tw, th = _div_round_up(cur_w, bits), _div_round_up(h, bits)
            tiles = _decode_entropy_image(br, tw, th, allow_meta=False)
            transforms.append((ttype, bits, tiles))
        else:  # 3: color indexing
            n_colors = br.read(8) + 1
            pal = _decode_entropy_image(br, n_colors, 1, allow_meta=False)
            # palette entries are per-channel deltas of the previous
            for i in range(1, n_colors):
                prev, cur = pal[i - 1], pal[i]
                px = 0
                for sh in (24, 16, 8, 0):
                    px |= (((cur >> sh) + (prev >> sh)) & 0xFF) << sh
                pal[i] = px
            if n_colors <= 2:
                pbits = 3
            elif n_colors <= 4:
                pbits = 2
            elif n_colors <= 16:
                pbits = 1
            else:
                pbits = 0
            transforms.append((3, (pbits, n_colors, cur_w), pal))
            cur_w = _div_round_up(cur_w, pbits) if pbits else cur_w
    pixels = _decode_entropy_image(br, cur_w, h, allow_meta=True)
    # inverse transforms, reverse read order
    for ttype, arg, payload in reversed(transforms):
        if ttype == 3:
            pbits, n_colors, full_w = arg
            if pbits:
                expanded = [0] * (full_w * h)
                per = 1 << pbits
                idx_bits = 8 >> pbits
                mask = (1 << idx_bits) - 1
                packed_w = _div_round_up(full_w, pbits)
                for y in range(h):
                    for px_i in range(packed_w):
                        packed = (pixels[y * packed_w + px_i] >> 8) & 0xFF
                        for k in range(per):
                            x = px_i * per + k
                            if x >= full_w:
                                break
                            idx = (packed >> (k * idx_bits)) & mask
                            expanded[y * full_w + x] = (
                                payload[idx] if idx < n_colors else 0
                            )
                pixels = expanded
                cur_w = full_w
            else:
                pixels = [
                    payload[(p >> 8) & 0xFF]
                    if ((p >> 8) & 0xFF) < n_colors
                    else 0
                    for p in pixels
                ]
        elif ttype == 2:
            _inv_subtract_green(pixels)
        elif ttype == 0:
            _inv_predictor(pixels, cur_w, h, payload, arg)
        else:
            _inv_color_transform(pixels, cur_w, h, payload, arg)
    out = bytearray(w * h * 4)
    for i, px in enumerate(pixels):
        out[4 * i] = (px >> 16) & 0xFF      # R
        out[4 * i + 1] = (px >> 8) & 0xFF   # G
        out[4 * i + 2] = px & 0xFF          # B
        out[4 * i + 3] = (px >> 24) & 0xFF  # A
    return w, h, 4, bytes(out)


# ------------------------------------------------- container walk


def _webp_chunks(raw: bytes):
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WEBP":
        return
    pos = 12
    while pos + 8 <= len(raw):
        tag = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        yield tag, raw[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned


def is_webp(raw: bytes) -> bool:
    return len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"WEBP"


def parse_webp_header(raw: bytes) -> dict | None:
    """probe_bytes-compatible header: media_kind 'webp' with canvas
    dims from VP8L (exact), VP8X (canvas fields), or VP8 (lossy frame
    header) — no pixel decode."""
    if not is_webp(bytes(raw)):
        return None
    raw = bytes(raw)
    out: dict = {"media_kind": "webp"}
    for tag, body in _webp_chunks(raw):
        if tag == b"VP8L" and body and body[0] == 0x2F and len(body) >= 5:
            bits = int.from_bytes(body[1:5], "little")
            out["width"] = (bits & 0x3FFF) + 1
            out["height"] = ((bits >> 14) & 0x3FFF) + 1
            out["channels"] = 4
            return out
        if tag == b"VP8X" and len(body) >= 10:
            out["width"] = int.from_bytes(body[4:7], "little") + 1
            out["height"] = int.from_bytes(body[7:10], "little") + 1
            # keep walking — a VP8L chunk refines nothing but confirms
        if tag == b"VP8 " and len(body) >= 10:
            # lossy key-frame header: start code 9d 01 2a then dims
            if body[3:6] == b"\x9d\x01\x2a":
                out.setdefault(
                    "width", int.from_bytes(body[6:8], "little") & 0x3FFF
                )
                out.setdefault(
                    "height", int.from_bytes(body[8:10], "little") & 0x3FFF
                )
    return out


def webp_flavor(raw: bytes) -> str:
    """'lossless' | 'lossy' | 'unknown' — the decode-route diagnostic.
    Animated files classify by their FIRST frame's image chunk (ANMF
    sub-chunks walk like top-level ones)."""
    chunks = list(_webp_chunks(bytes(raw)))
    for tag, body in chunks:
        if tag == b"ANMF" and len(body) > 16:
            sub = body[16:]
            pos = 0
            while pos + 8 <= len(sub):
                stag = sub[pos : pos + 4]
                (size,) = struct.unpack("<I", sub[pos + 4 : pos + 8])
                if stag == b"VP8L":
                    return "lossless"
                if stag == b"VP8 ":
                    return "lossy"
                pos += 8 + size + (size & 1)
    for tag, _ in chunks:
        if tag == b"VP8L":
            return "lossless"
    for tag, _ in chunks:
        if tag == b"VP8 ":
            return "lossy"
    return "unknown"


def is_animated_webp(raw: bytes) -> bool:
    return any(tag == b"ANMF" for tag, _ in _webp_chunks(bytes(raw)))


def _pyav_webp_rgba(container: bytes) -> tuple[int, int, int, bytes]:
    """First frame of a (lossy) WebP container via pyav → (w, h, 4,
    RGBA bytes). Deferred import: called only after the hatch probe
    says the wheel is present on THIS executor."""
    import io

    import av

    with av.open(io.BytesIO(container)) as c:
        for frame in c.decode(video=0):
            arr = frame.to_ndarray(format="rgba")
            h, w = int(arr.shape[0]), int(arr.shape[1])
            return w, h, 4, arr.tobytes()
    raise ValueError("pyav produced no frames for the WebP payload")


def wrap_anmf_still(sub: bytes, fw: int, fh: int) -> bytes:
    """Wrap one ANMF frame's sub-chunk bytes (optional ALPH + VP8/VP8L)
    into a minimal STANDALONE WebP container, so a lossy animation
    frame decodes through the same still-image route (pyav included).
    An ALPH plane forces the VP8X extended layout with the alpha flag,
    per the container spec's chunk-ordering rules."""
    chunks: list[tuple[bytes, bytes]] = []
    has_alpha = False
    pos = 0
    while pos + 8 <= len(sub):
        tag = sub[pos : pos + 4]
        (size,) = struct.unpack("<I", sub[pos + 4 : pos + 8])
        body = sub[pos + 8 : pos + 8 + size]
        if tag == b"ALPH":
            has_alpha = True
            chunks.append((tag, body))
        elif tag in (b"VP8 ", b"VP8L"):
            chunks.append((tag, body))
        pos += 8 + size + (size & 1)
    payload = b""
    if has_alpha:
        vp8x = (
            bytes([0x10, 0, 0, 0])
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
        )
        payload += b"VP8X" + len(vp8x).to_bytes(4, "little") + vp8x
    for tag, body in chunks:
        payload += tag + len(body).to_bytes(4, "little") + body
        if len(body) & 1:
            payload += b"\x00"
    return (
        b"RIFF" + (4 + len(payload)).to_bytes(4, "little") + b"WEBP" + payload
    )


def decode_webp(raw: bytes) -> tuple[int, int, int, bytes]:
    """(width, height, 4, RGBA bytes) for ANY WebP: lossless (VP8L)
    decodes dependency-free; lossy VP8 routes through pyav where the
    wheel is importable on this executor, and refuses loudly naming
    the hatch where it is not (the ``decode_audio_any`` convention)."""
    raw = bytes(raw)
    if not is_webp(raw):
        raise ValueError("not a WebP container")
    if is_animated_webp(raw):
        # still-image view of an animation: the first composited frame
        # (the decode_gif convention)
        w, h, frames, _ = decode_webp_frames(raw, max_frames=1)
        return w, h, 4, frames[0]
    for tag, body in _webp_chunks(raw):
        if tag == b"VP8L":
            return decode_vp8l(body)
    for tag, _ in _webp_chunks(raw):
        if tag == b"VP8 ":
            from kusto_pre_forge_spark.operators.multimodal import (
                pyav_available,
            )

            if pyav_available():
                return _pyav_webp_rgba(raw)
            raise NotImplementedError(
                "lossy WebP (VP8 intra-frame) decodes through the pyav "
                "hatch: `pip install av` on the executors, or transcode "
                "to lossless/PNG upstream"
            )
    raise ValueError("WebP container without an image chunk")


# --------------------------------------------------------- encoding


def _write_prefix_code(
    bw: _BitWriter, lengths: list[int], codes: dict[int, tuple[int, int]]
) -> None:
    """Emit one prefix code: simple form for ≤2 symbols, else the
    code-length-coded form with the explicit max-symbol field (no
    16/17/18 repeats — fixture-forge simplicity, decoder generality)."""
    used = [s for s, ln in enumerate(lengths) if ln > 0]
    if len(used) <= 2 and all(s < 256 for s in used):
        bw.write(1, 1)  # simple
        bw.write(len(used) - 1, 1)
        if used[0] > 1:
            bw.write(1, 1)
            bw.write(used[0], 8)
        else:
            bw.write(0, 1)
            bw.write(used[0], 1)
        if len(used) == 2:
            bw.write(used[1], 8)
        return
    bw.write(0, 1)  # code-length-coded
    max_symbol = max(used) + 1
    cl_freqs: dict[int, int] = {}
    for s in range(max_symbol):
        cl_freqs[lengths[s]] = cl_freqs.get(lengths[s], 0) + 1
    cl_lengths = _package_merge(cl_freqs, 7)
    cl_lengths.extend([0] * (19 - len(cl_lengths)))
    # num_code_lengths must cover every nonzero slot in _CL_ORDER order
    num_cl = max(
        i + 1 for i in range(19) if cl_lengths[_CL_ORDER[i]] > 0 or i < 4
    )
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths[_CL_ORDER[i]], 3)
    cl_codes = _canonical_codes(cl_lengths)
    # explicit max symbol (16-bit field — covers the 280-wide green)
    bw.write(1, 1)
    bw.write(7, 3)  # length_nbits = 2 + 2*7 = 16
    bw.write(max_symbol - 2, 16)
    if len(cl_codes) == 1:
        return  # single-symbol code-length code decodes with ZERO bits
    for s in range(max_symbol):
        code, ln = cl_codes[lengths[s]]
        bw.write_code(code, ln)


def encode_webp_vp8l(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """Forge one spec-valid LOSSLESS WebP from interleaved 8-bit pixels
    (1/3/4 channels — the decode_image contract). Literal-only coding
    (no LZ77, no cache, no transforms), canonical depth-limited codes:
    decode_webp(encode_webp_vp8l(img)) == img EXACTLY — the roundtrip
    IS the oracle (the GIF/PNG forge pattern)."""
    n = width * height
    argb = []
    for i in range(n):
        if channels == 1:
            g = pixels[i]
            argb.append((0xFF << 24) | (g << 16) | (g << 8) | g)
        elif channels == 3:
            r, g, b = pixels[3 * i : 3 * i + 3]
            argb.append((0xFF << 24) | (r << 16) | (g << 8) | b)
        elif channels == 4:
            r, g, b, a = pixels[4 * i : 4 * i + 4]
            argb.append((a << 24) | (r << 16) | (g << 8) | b)
        else:
            raise ValueError(f"unsupported channel count {channels}")
    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    bw.write(0, 1)  # no transforms
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix codes
    chans = {
        "g": [(p >> 8) & 0xFF for p in argb],
        "r": [(p >> 16) & 0xFF for p in argb],
        "b": [p & 0xFF for p in argb],
        "a": [(p >> 24) & 0xFF for p in argb],
    }
    green_size = _GREEN_BASE + _N_LENGTH
    plans = {}
    for key, alphabet in (
        ("g", green_size), ("r", 256), ("b", 256), ("a", 256),
    ):
        freqs: dict[int, int] = {}
        for v in chans[key]:
            freqs[v] = freqs.get(v, 0) + 1
        lengths = _package_merge(freqs, 15)
        lengths.extend([0] * (alphabet - len(lengths)))
        plans[key] = (lengths, _canonical_codes(lengths))
    dist_lengths = [0] * _N_DIST
    dist_lengths[0] = 1  # unused single-symbol distance code
    plans["d"] = (dist_lengths, _canonical_codes(dist_lengths))
    for key in ("g", "r", "b", "a", "d"):
        _write_prefix_code(bw, plans[key][0], plans[key][1])
    g_codes, r_codes, b_codes, a_codes = (
        plans["g"][1], plans["r"][1], plans["b"][1], plans["a"][1],
    )
    single = {k: len([x for x in plans[k][0] if x]) == 1 for k in "grba"}
    for i in range(n):
        for key, codes in (
            ("g", g_codes), ("r", r_codes), ("b", b_codes), ("a", a_codes),
        ):
            if single[key]:
                continue  # single-symbol codes decode with zero bits
            code, ln = codes[chans[key][i]]
            bw.write_code(code, ln)
    return wrap_vp8l(b"\x2f" + bw.bytes())


def vp8l_payload(
    width: int, height: int, channels: int, pixels: bytes
) -> bytes:
    """The bare VP8L chunk payload for one image — what
    :func:`encode_webp_vp8l` wraps, and what ANMF animation frames
    embed as sub-chunks."""
    blob = encode_webp_vp8l(width, height, channels, pixels)
    for tag, body in _webp_chunks(blob):
        if tag == b"VP8L":
            return body
    raise AssertionError("encoder produced no VP8L chunk")


def wrap_vp8l(payload: bytes) -> bytes:
    """RIFF/WEBP container around one VP8L chunk payload (2-byte chunk
    alignment per RIFF) — shared by the encoder and the hand-forged
    spec-construct test streams."""
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


# --------------------------------------------------------- animation
# Animated WebP (VP8X + ANIM + ANMF chunks — the container spec): each
# ANMF frame is a sub-image placed at an even (2x, 2y) offset onto the
# running canvas, alpha-BLENDED or overwritten per its flags, and
# optionally DISPOSED to transparent after snapshotting — the same
# compositing contract decode_gif_frames implements for GIF89a, so the
# frame-sampling family treats both containers identically.


def _blend_px(dst: tuple, src: tuple) -> tuple:
    """Container-spec alpha blend of src OVER dst (RGBA 0-255)."""
    sa, da = src[3] / 255.0, dst[3] / 255.0
    oa = sa + da * (1.0 - sa)
    if oa <= 0.0:
        return (0, 0, 0, 0)
    out = tuple(
        int(round((src[i] * sa + dst[i] * da * (1.0 - sa)) / oa))
        for i in range(3)
    )
    return (*out, int(round(oa * 255.0)))


def decode_webp_frames(
    raw: bytes, max_frames: int | None = None
) -> tuple[int, int, list[bytes], list[int]]:
    """(canvas_w, canvas_h, composited RGBA frames, durations_ms) for a
    WebP — still OR animated. Lossless (VP8L) frames decode
    dependency-free; a lossy (VP8) frame re-wraps as a standalone still
    (:func:`wrap_anmf_still`) and routes through pyav where the wheel
    is present, refusing naming the hatch where it is not. Disposal
    fills the frame rectangle with transparent black after the snapshot
    (the alpha-canvas convention libwebp's demuxer applies)."""
    raw = bytes(raw)
    if not is_webp(raw):
        raise ValueError("not a WebP container")
    anmf = [body for tag, body in _webp_chunks(raw) if tag == b"ANMF"]
    if not anmf:
        w, h, _, px = decode_webp(raw)
        return w, h, [px], [0]
    cw = ch_ = None
    for tag, body in _webp_chunks(raw):
        if tag == b"VP8X" and len(body) >= 10:
            cw = int.from_bytes(body[4:7], "little") + 1
            ch_ = int.from_bytes(body[7:10], "little") + 1
    if cw is None:
        raise ValueError("animated WebP without a VP8X canvas")
    canvas = [(0, 0, 0, 0)] * (cw * ch_)
    frames: list[bytes] = []
    durations: list[int] = []
    for body in anmf:
        if max_frames is not None and len(frames) >= max_frames:
            break
        if len(body) < 16:
            raise ValueError("short ANMF chunk")
        fx = int.from_bytes(body[0:3], "little") * 2
        fy = int.from_bytes(body[3:6], "little") * 2
        fw = int.from_bytes(body[6:9], "little") + 1
        fh = int.from_bytes(body[9:12], "little") + 1
        dur = int.from_bytes(body[12:15], "little")
        flags = body[15]
        sub = body[16:]
        fpx = None
        pos = 0
        while pos + 8 <= len(sub):
            tag = sub[pos : pos + 4]
            (size,) = struct.unpack("<I", sub[pos + 4 : pos + 8])
            if tag == b"VP8L":
                dw, dh, _, fpx = decode_vp8l(sub[pos + 8 : pos + 8 + size])
                if (dw, dh) != (fw, fh):
                    raise ValueError("ANMF frame dims disagree with header")
                break
            if tag == b"VP8 ":
                from kusto_pre_forge_spark.operators.multimodal import (
                    pyav_available,
                )

                if pyav_available():
                    dw, dh, _, fpx = _pyav_webp_rgba(
                        wrap_anmf_still(sub, fw, fh)
                    )
                    if (dw, dh) != (fw, fh):
                        raise ValueError(
                            "ANMF frame dims disagree with header"
                        )
                    break
                raise NotImplementedError(
                    "lossy animated-WebP frames (VP8) decode through the "
                    "pyav hatch: `pip install av` on the executors"
                )
            pos += 8 + size + (size & 1)
        if fpx is None:
            raise ValueError("ANMF frame without an image chunk")
        no_blend = bool(flags & 0x02)
        dispose_bg = bool(flags & 0x01)
        for y in range(fh):
            cy = fy + y
            if cy >= ch_:
                break
            for x in range(fw):
                cx = fx + x
                if cx >= cw:
                    break
                i = 4 * (y * fw + x)
                src = (fpx[i], fpx[i + 1], fpx[i + 2], fpx[i + 3])
                ci = cy * cw + cx
                canvas[ci] = (
                    src if no_blend else _blend_px(canvas[ci], src)
                )
        snap = bytearray(cw * ch_ * 4)
        for i, (r, g, b, a) in enumerate(canvas):
            snap[4 * i : 4 * i + 4] = bytes((r, g, b, a))
        frames.append(bytes(snap))
        durations.append(dur)
        if dispose_bg:
            for y in range(fh):
                cy = fy + y
                if cy >= ch_:
                    break
                for x in range(fw):
                    cx = fx + x
                    if cx >= cw:
                        break
                    canvas[cy * cw + cx] = (0, 0, 0, 0)
    return cw, ch_, frames, durations


def encode_webp_animation(
    canvas_w: int,
    canvas_h: int,
    frames: list[dict],
    loop_count: int = 0,
) -> bytes:
    """Forge one spec-valid ANIMATED WebP: VP8X (animation flag +
    canvas) + ANIM + one ANMF per frame dict (keys: ``pixels`` RGBA
    bytes, optional ``x``/``y`` even offsets, ``w``/``h`` sub-frame
    dims (default canvas), ``duration`` ms, ``blend`` bool (default
    True), ``dispose`` bool). decode(encode(frames)) is the roundtrip
    oracle, exactly the GIF-animation forge pattern."""
    chunks = bytearray()
    vp8x = bytes([0x02, 0, 0, 0]) + (canvas_w - 1).to_bytes(
        3, "little"
    ) + (canvas_h - 1).to_bytes(3, "little")
    chunks += b"VP8X" + struct.pack("<I", len(vp8x)) + vp8x
    anim = b"\x00\x00\x00\x00" + int(loop_count).to_bytes(2, "little")
    chunks += b"ANIM" + struct.pack("<I", len(anim)) + anim
    for fr in frames:
        fw = int(fr.get("w", canvas_w))
        fh = int(fr.get("h", canvas_h))
        fx, fy = int(fr.get("x", 0)), int(fr.get("y", 0))
        if fx % 2 or fy % 2:
            raise ValueError("ANMF offsets must be even (stored /2)")
        payload = vp8l_payload(fw, fh, 4, bytes(fr["pixels"]))
        sub = b"VP8L" + struct.pack("<I", len(payload)) + payload
        if len(payload) & 1:
            sub += b"\x00"
        flags = (0x00 if fr.get("blend", True) else 0x02) | (
            0x01 if fr.get("dispose", False) else 0x00
        )
        body = (
            (fx // 2).to_bytes(3, "little")
            + (fy // 2).to_bytes(3, "little")
            + (fw - 1).to_bytes(3, "little")
            + (fh - 1).to_bytes(3, "little")
            + int(fr.get("duration", 100)).to_bytes(3, "little")
            + bytes([flags])
            + sub
        )
        chunks += b"ANMF" + struct.pack("<I", len(body)) + body
        if len(body) & 1:
            chunks += b"\x00"
    return (
        b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WEBP" + bytes(chunks)
    )

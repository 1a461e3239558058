"""Dependency-free media container codecs (pure stdlib).

The sandbox has no PIL/libvips/ffmpeg, but the common container headers
are just fixed binary layouts — and PNG/WAV are fully decodable with
nothing but ``zlib`` and ``struct``:

- header probing: PNG IHDR, JPEG SOFn, GIF logical screen descriptor,
  BMP info header, WAV ``fmt ``/``data`` chunks → true width/height/
  channels/sample-rate/bit-depth from real bytes;
- full decode: PNG (inflate + scanline unfilter; bit depth 8, color
  types 0/2/4/6, non-interlaced) and WAV (PCM 8/16-bit) → real pixels /
  samples;
- encode: minimal valid PNG (filter 0) and PCM16 WAV writers, used to
  fabricate REAL media fixtures deterministically inside tests and
  driver queries.

Everything here is plain-Python byte slicing intended to run inside
Arrow-batched ``mapInPandas`` workers (see ``multimodal.py``) — media
rows are few and large, so per-file Python header parsing is nowhere
near the hot path a per-row UDF over a scalar table would be.
"""

from __future__ import annotations

import struct
import zlib

# ---------------------------------------------------------------- probing

_JPEG_SOF_MARKERS = (
    set(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}  # DHT / JPG / DAC are not SOF
)

#: PNG color type → channel count
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def parse_png_header(raw: bytes) -> dict | None:
    """PNG signature + IHDR: width/height (BE32), bit depth, color type."""
    if len(raw) < 33 or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    if raw[12:16] != b"IHDR":
        return None
    width, height = struct.unpack(">II", raw[16:24])
    bit_depth, color_type = raw[24], raw[25]
    if color_type not in _PNG_CHANNELS:
        return None
    return {
        "media_kind": "png",
        "width": width,
        "height": height,
        "channels": _PNG_CHANNELS[color_type],
        "bits_per_sample": bit_depth,
    }


def parse_jpeg_header(raw: bytes) -> dict | None:
    """Scan JPEG markers for the first SOFn frame header."""
    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        return None
    pos = 2
    n = len(raw)
    while pos + 4 <= n:
        if raw[pos] != 0xFF:
            return None
        marker = raw[pos + 1]
        if marker == 0xFF:  # fill byte
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:  # standalone markers
            pos += 2
            continue
        if pos + 4 > n:
            return None
        seg_len = struct.unpack(">H", raw[pos + 2 : pos + 4])[0]
        if marker in _JPEG_SOF_MARKERS:
            if pos + 10 > n:
                return None
            precision = raw[pos + 4]
            height, width = struct.unpack(">HH", raw[pos + 5 : pos + 9])
            n_components = raw[pos + 9]
            return {
                "media_kind": "jpeg",
                "width": width,
                "height": height,
                "channels": n_components,
                "bits_per_sample": precision,
            }
        if marker == 0xDA:  # SOS before any SOF: give up
            return None
        pos += 2 + seg_len
    return None


def parse_gif_header(raw: bytes) -> dict | None:
    """GIF87a/89a logical screen descriptor: width/height (LE16)."""
    if len(raw) < 10 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    width, height = struct.unpack("<HH", raw[6:10])
    return {
        "media_kind": "gif",
        "width": width,
        "height": height,
        "channels": 3,  # palette entries are RGB triples
        "bits_per_sample": ((raw[10] & 0x07) + 1) if len(raw) > 10 else None,
    }


def parse_bmp_header(raw: bytes) -> dict | None:
    """BMP BITMAPINFOHEADER: width/height at byte 18/22 (LE32, signed)."""
    if len(raw) < 30 or raw[:2] != b"BM":
        return None
    width, height = struct.unpack("<ii", raw[18:26])
    bits = struct.unpack("<H", raw[28:30])[0]
    return {
        "media_kind": "bmp",
        "width": width,
        "height": abs(height),  # negative height = top-down rows
        "channels": max(bits // 8, 1),
        "bits_per_sample": min(bits, 8) if bits else None,
    }


def parse_wav_header(raw: bytes) -> dict | None:
    """RIFF/WAVE chunk walk: ``fmt `` (format, channels, rate, bits) and
    ``data`` (payload size → sample count / duration)."""
    if len(raw) < 12 or raw[:4] != b"RIFF" or raw[8:12] != b"WAVE":
        return None
    out: dict = {"media_kind": "wav"}
    pos = 12
    n = len(raw)
    block_align = None
    while pos + 8 <= n:
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt " and len(body) >= 16:
            (_fmt, channels, rate, _brate, block_align, bits) = struct.unpack(
                "<HHIIHH", body[:16]
            )
            out.update(
                {"channels": channels, "sample_rate": rate, "bits_per_sample": bits}
            )
        elif cid == b"data":
            out["_data_bytes"] = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if "sample_rate" not in out:
        return None
    data_bytes = out.pop("_data_bytes", None)
    if data_bytes is not None and block_align:
        out["n_samples"] = data_bytes // block_align
        out["duration_s"] = out["n_samples"] / out["sample_rate"]
    return out


def _mp4_boxes(raw: bytes, start: int, end: int):
    """Yield (type, body_start, body_end) for ISO-BMFF boxes in a range."""
    pos = start
    while pos + 8 <= end:
        size = struct.unpack(">I", raw[pos : pos + 4])[0]
        btype = raw[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize follows the type
            if pos + 16 > end:
                return
            size = struct.unpack(">Q", raw[pos + 8 : pos + 16])[0]
            body = pos + 16
        if size < 8 or pos + size > end:
            return
        yield btype, body, pos + size
        pos += size


def parse_mp4_header(raw: bytes) -> dict | None:
    """ISO-BMFF (MP4/MOV) box walk: ``moov/mvhd`` gives timescale+duration,
    the first ``moov/trak/tkhd`` with a nonzero 16.16-fixed width/height
    gives the visual track dimensions. Version 0 and 1 boxes both handled;
    no decoder, no dependency — pure struct reads, like the other probes."""
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        return None
    out: dict = {"media_kind": "mp4"}
    for btype, bs, be in _mp4_boxes(raw, 0, len(raw)):
        if btype != b"moov":
            continue
        for ctype, cs, ce in _mp4_boxes(raw, bs, be):
            if ctype == b"mvhd" and ce - cs >= 24:
                ver = raw[cs]
                if ver == 1 and ce - cs >= 32:
                    timescale = struct.unpack(">I", raw[cs + 20 : cs + 24])[0]
                    duration = struct.unpack(">Q", raw[cs + 24 : cs + 32])[0]
                else:
                    timescale = struct.unpack(">I", raw[cs + 12 : cs + 16])[0]
                    duration = struct.unpack(">I", raw[cs + 16 : cs + 20])[0]
                if timescale:
                    out["duration_s"] = duration / timescale
            elif ctype == b"trak" and "width" not in out:
                for ttype, ts, te in _mp4_boxes(raw, cs, ce):
                    if ttype != b"tkhd":
                        continue
                    off = ts + (88 if raw[ts] == 1 else 76)
                    if te - off >= 8:
                        w = struct.unpack(">I", raw[off : off + 4])[0] >> 16
                        h = struct.unpack(">I", raw[off + 4 : off + 8])[0] >> 16
                        if w and h:
                            out["width"], out["height"] = w, h
    return out


def encode_mp4_meta(
    width: int, height: int, duration_units: int, timescale: int = 1000
) -> bytes:
    """Minimal valid metadata-only ISO-BMFF file (ftyp + moov(mvhd +
    trak(tkhd))) — the test-fixture twin of ``parse_mp4_header``, as
    ``encode_png``/``encode_wav`` are for their parsers (no media data)."""

    def box(btype: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + btype + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0) + b"isom")
    mvhd = box(
        b"mvhd",
        bytes(4)  # version 0 + flags
        + bytes(8)  # creation/modification
        + struct.pack(">II", timescale, duration_units)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + bytes(10)
        + _MP4_UNITY_MATRIX
        + bytes(24)
        + struct.pack(">I", 2),  # next track id
    )
    tkhd = box(
        b"tkhd",
        bytes(1) + b"\x00\x00\x07"  # version 0, flags: enabled|in-movie|preview
        + bytes(8)
        + struct.pack(">I", 1)  # track id
        + bytes(4)
        + struct.pack(">I", duration_units)
        + bytes(8)
        + bytes(8)  # layer/alt-group/volume/reserved
        + _MP4_UNITY_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    moov = box(b"moov", mvhd + box(b"trak", tkhd))
    return ftyp + moov


_MP4_UNITY_MATRIX = struct.pack(
    ">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000
)


_PROBES = (
    parse_png_header,
    parse_jpeg_header,
    parse_gif_header,
    parse_bmp_header,
    parse_wav_header,
    parse_mp4_header,
)

_PROBE_FIELDS = (
    "media_kind",
    "width",
    "height",
    "channels",
    "sample_rate",
    "bits_per_sample",
    "n_samples",
    "duration_s",
)


def probe_bytes(raw: bytes) -> dict:
    """Identify the container and return its normalized header fields
    (missing fields are None; unknown containers → media_kind 'unknown')."""
    for probe in _PROBES:
        got = probe(raw)
        if got is not None:
            return {f: got.get(f) for f in _PROBE_FIELDS}
    out = {f: None for f in _PROBE_FIELDS}
    out["media_kind"] = "unknown"
    return out


# ---------------------------------------------------------------- PNG codec


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(raw: bytes) -> tuple[int, int, int, bytes]:
    """Full PNG decode: (width, height, channels, interleaved 8-bit pixels).

    Supports bit depth 8, color types 0 (gray) / 2 (RGB) / 4 (gray+alpha)
    / 6 (RGBA), non-interlaced — i.e. everything :func:`encode_png`
    produces plus the common cases. Raises ValueError otherwise.
    """
    hdr = parse_png_header(raw)
    if hdr is None:
        raise ValueError("not a PNG")
    if hdr["bits_per_sample"] != 8:
        raise ValueError(f"unsupported PNG bit depth {hdr['bits_per_sample']}")
    if raw[28] != 0:
        raise ValueError("interlaced PNG unsupported")
    color_type = raw[25]
    if color_type == 3:
        raise ValueError("palette PNG unsupported")
    width, height, channels = hdr["width"], hdr["height"], hdr["channels"]

    # concatenate IDAT chunk payloads
    idat = bytearray()
    pos = 8
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        if ctype == b"IDAT":
            idat += raw[pos + 8 : pos + 8 + length]
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    scan = zlib.decompress(bytes(idat))

    stride = width * channels
    out = bytearray(height * stride)
    prev = bytearray(stride)
    for y in range(height):
        off = y * (stride + 1)
        ftype = scan[off]
        line = bytearray(scan[off + 1 : off + 1 + stride])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                upleft = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"unknown PNG filter {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal valid PNG: 8-bit, filter 0 scanlines, one IDAT chunk.

    ``pixels`` is interleaved row-major (len == width*height*channels);
    channels 1 (gray), 2 (gray+alpha), 3 (RGB) or 4 (RGBA).
    """
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    stride = width * channels
    scan = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(scan, 6))
        + _png_chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------- WAV codec


def decode_wav(raw: bytes) -> tuple[int, int, list[float]]:
    """Full PCM WAV decode: (sample_rate, channels, samples in [-1, 1]).

    Supports PCM (format 1) at 8-bit unsigned / 16-bit signed. Multi-
    channel data stays interleaved.
    """
    hdr = parse_wav_header(raw)
    if hdr is None:
        raise ValueError("not a WAV")
    bits = hdr.get("bits_per_sample")
    if bits not in (8, 16):
        raise ValueError(f"unsupported WAV bit depth {bits}")
    # locate the data chunk payload
    pos, n = 12, len(raw)
    data = None
    while pos + 8 <= n:
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        if cid == b"data":
            data = raw[pos + 8 : pos + 8 + size]
            break
        pos += 8 + size + (size & 1)
    if data is None:
        raise ValueError("WAV has no data chunk")
    if bits == 16:
        ints = struct.unpack(f"<{len(data) // 2}h", data[: len(data) // 2 * 2])
        samples = [v / 32768.0 for v in ints]
    else:
        samples = [(v - 128) / 128.0 for v in data]
    return hdr["sample_rate"], hdr.get("channels", 1), samples


def encode_wav(sample_rate: int, samples: list[int], channels: int = 1) -> bytes:
    """Minimal PCM16 WAV: interleaved signed 16-bit ``samples``."""
    body = struct.pack(f"<{len(samples)}h", *samples)
    block_align = 2 * channels
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align, block_align, 16
    )
    chunks = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + body
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks

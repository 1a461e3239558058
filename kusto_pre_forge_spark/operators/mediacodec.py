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
from collections.abc import Sequence

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


def parse_exif_orientation(raw: bytes) -> int:
    """The EXIF ``Orientation`` tag (0x0112) from a JPEG's APP1
    segment, 1-8; 1 (upright) for anything absent or malformed — a
    crawl decoder never crashes on a bad EXIF blob. Walks the JPEG
    marker stream to APP1 (``Exif\\x00\\x00`` payload), then the TIFF
    header (II little- / MM big-endian) and IFD0's 12-byte entries.
    Camera JPEGs routinely store sensor-rotated pixels with this tag;
    ignoring it makes a rotated duplicate hash differently from its
    upright re-encode, so the perceptual-dedup family misses the whole
    class."""
    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        return 1
    pos = 2
    n = len(raw)
    while pos + 4 <= n:
        if raw[pos] != 0xFF:
            return 1
        marker = raw[pos + 1]
        if marker == 0xFF:
            pos += 1
            continue
        if 0xD0 <= marker <= 0xD9 or marker == 0x01:
            pos += 2
            continue
        if pos + 4 > n:
            return 1
        seg_len = struct.unpack(">H", raw[pos + 2 : pos + 4])[0]
        if marker == 0xDA:  # scan data: no APP1 ahead
            return 1
        if marker == 0xE1 and raw[pos + 4 : pos + 10] == b"Exif\x00\x00":
            tiff = raw[pos + 10 : pos + 2 + seg_len]
            return _tiff_orientation(tiff)
        pos += 2 + seg_len
    return 1


def _tiff_orientation(tiff: bytes) -> int:
    """Orientation from a TIFF blob (EXIF APP1 payload past the
    ``Exif\\x00\\x00`` prefix): header endianness, IFD0 walk, tag
    0x0112 type SHORT. 1 on anything malformed."""
    if len(tiff) < 8:
        return 1
    if tiff[:4] == b"II*\x00":
        e = "<"
    elif tiff[:4] == b"MM\x00*":
        e = ">"
    else:
        return 1
    try:
        (ifd0,) = struct.unpack(e + "I", tiff[4:8])
        if ifd0 + 2 > len(tiff):
            return 1
        (count,) = struct.unpack(e + "H", tiff[ifd0 : ifd0 + 2])
        for i in range(count):
            at = ifd0 + 2 + 12 * i
            if at + 12 > len(tiff):
                return 1
            tag, typ = struct.unpack(e + "HH", tiff[at : at + 4])
            if tag == 0x0112 and typ == 3:  # SHORT, value inline
                (val,) = struct.unpack(e + "H", tiff[at + 8 : at + 10])
                return val if 1 <= val <= 8 else 1
    except struct.error:
        return 1
    return 1


def _png_exif_orientation(raw: bytes) -> int:
    """Orientation from a PNG's ``eXIf`` chunk (PNG 1.2 extension,
    standardized 2017 — the chunk payload is a raw TIFF blob); 1 when
    absent or malformed."""
    if len(raw) < 8 or raw[:8] != b"\x89PNG\r\n\x1a\n":
        return 1
    pos = 8
    n = len(raw)
    while pos + 8 <= n:
        (size,) = struct.unpack(">I", raw[pos : pos + 4])
        ctype = raw[pos + 4 : pos + 8]
        if ctype == b"eXIf":
            return _tiff_orientation(raw[pos + 8 : pos + 8 + size])
        if ctype == b"IEND":
            return 1
        pos += 12 + size
    return 1


def _webp_exif_orientation(raw: bytes) -> int:
    """Orientation from a WebP VP8X container's ``EXIF`` chunk (TIFF
    blob, with or without the JPEG-style ``Exif\\x00\\x00`` prefix some
    encoders write); 1 when absent or malformed."""
    if len(raw) < 16 or raw[:4] != b"RIFF" or raw[8:12] != b"WEBP":
        return 1
    pos = 12
    n = len(raw)
    while pos + 8 <= n:
        tag = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        if tag == b"EXIF":
            body = raw[pos + 8 : pos + 8 + size]
            if body[:6] == b"Exif\x00\x00":
                body = body[6:]
            return _tiff_orientation(body)
        pos += 8 + size + (size & 1)
    return 1


def image_exif_orientation(raw: bytes) -> int:
    """The EXIF/TIFF Orientation value (1-8) for ANY container that can
    carry one — JPEG APP1, TIFF IFD0, PNG eXIf, WebP EXIF — and 1 for
    everything else: the single probe :func:`decode_image` normalizes
    through, so a rotated capture hashes like its upright re-encode in
    every format the camera/export pipeline might have produced."""
    raw = bytes(raw)
    if raw[:2] == b"\xff\xd8":
        return parse_exif_orientation(raw)
    if raw[:4] in (b"II*\x00", b"MM\x00*"):
        return _tiff_orientation(raw)
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        return _png_exif_orientation(raw)
    if raw[:4] == b"RIFF" and raw[8:12] == b"WEBP":
        return _webp_exif_orientation(raw)
    return 1


def apply_exif_orientation(
    width: int, height: int, channels: int, pixels: bytes, orientation: int
) -> tuple[int, int, int, bytes]:
    """Return the UPRIGHT view of decoded pixels for an EXIF
    orientation value 1-8 (TIFF 6.0 §Orientation / EXIF 2.32): 2
    mirrors, 3 rotates 180°, 4 flips vertically, 5 transposes, 6
    rotates 90° CW, 7 transverses, 8 rotates 90° CCW. Orientations 5-8
    swap width and height."""
    if orientation == 1 or not 1 <= orientation <= 8:
        return width, height, channels, pixels
    import numpy as np

    a = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
    if orientation == 2:
        a = a[:, ::-1]
    elif orientation == 3:
        a = a[::-1, ::-1]
    elif orientation == 4:
        a = a[::-1, :]
    elif orientation == 5:
        a = a.transpose(1, 0, 2)
    elif orientation == 6:
        a = a.transpose(1, 0, 2)[:, ::-1]
    elif orientation == 7:
        a = a.transpose(1, 0, 2)[::-1, ::-1]
    elif orientation == 8:
        a = a.transpose(1, 0, 2)[::-1, :]
    h, w = int(a.shape[0]), int(a.shape[1])
    return w, h, channels, np.ascontiguousarray(a).tobytes()


def exif_app1(orientation: int, endian: str = "<") -> bytes:
    """Forge one minimal EXIF APP1 segment (marker + length + Exif
    prefix + TIFF header + a 1-entry IFD0 carrying Orientation) — the
    fixture side of :func:`parse_exif_orientation`; ``endian`` '<'
    forges II (Intel) layout, '>' MM (Motorola)."""
    if endian == "<":
        tiff = b"II*\x00" + struct.pack("<I", 8)
        tiff += struct.pack("<H", 1)
        tiff += struct.pack("<HHIHH", 0x0112, 3, 1, orientation, 0)
        tiff += struct.pack("<I", 0)
    else:
        tiff = b"MM\x00*" + struct.pack(">I", 8)
        tiff += struct.pack(">H", 1)
        tiff += struct.pack(">HHIHH", 0x0112, 3, 1, orientation, 0)
        tiff += struct.pack(">I", 0)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload


def insert_exif_app1(jpeg: bytes, orientation: int, endian: str = "<") -> bytes:
    """Insert a forged Orientation APP1 right after SOI — turns any
    baseline JPEG fixture into a camera-rotated one."""
    if jpeg[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    return jpeg[:2] + exif_app1(orientation, endian) + jpeg[2:]


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
            (fmt_tag, channels, rate, _brate, block_align, bits) = struct.unpack(
                "<HHIIHH", body[:16]
            )
            out.update(
                {
                    "channels": channels,
                    "sample_rate": rate,
                    "bits_per_sample": bits,
                    "format_tag": fmt_tag,
                }
            )
        elif cid == b"data":
            out["_data_bytes"] = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if "sample_rate" not in out:
        return None
    data_bytes = out.pop("_data_bytes", None)
    if data_bytes is not None and block_align:
        if out.get("format_tag") == 0x11:
            # IMA ADPCM: block_align is a BLOCK, not a sample — samples
            # per block = header sample + 2 nibbles per remaining byte
            spb = (block_align - 4 * out.get("channels", 1)) * 2 // max(
                out.get("channels", 1), 1
            ) + 1
            out["n_samples"] = (data_bytes // block_align) * spb
        else:
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


_HEIF_AVIF_BRANDS = frozenset((b"avif", b"avis"))
_HEIF_HEIC_BRANDS = frozenset(
    (b"heic", b"heix", b"heim", b"heis", b"hevc", b"hevx", b"mif1", b"msf1")
)


def _heif_kind(raw: bytes) -> str | None:
    """'avif' / 'heic' from the ISO-BMFF ``ftyp`` brand set, None for
    every other container (including plain MP4/MOV). Any avif/avis brand
    — major or compatible — wins over the HEVC family; a bare structural
    brand (mif1/msf1) with no codec brand classifies as heic (the
    dominant producer of brand-minimal HEIF files is Apple's HEIC
    pipeline)."""
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        return None
    for btype, bs, be in _mp4_boxes(raw, 0, min(len(raw), 1 << 16)):
        if btype != b"ftyp":
            continue
        brands = [raw[bs : bs + 4]]
        brands += [raw[p : p + 4] for p in range(bs + 8, be - 3, 4)]
        if any(b in _HEIF_AVIF_BRANDS for b in brands):
            return "avif"
        if any(b in _HEIF_HEIC_BRANDS for b in brands):
            return "heic"
        return None
    return None


def parse_heif_header(raw: bytes) -> dict | None:
    """AVIF/HEIC header probe — dependency-free ISO-BMFF walk, the
    lossy-WebP playbook's probe half: brands from ``ftyp`` (avif/avis →
    avif; heic/heix/…/mif1 → heic), stored dimensions from the largest
    ``meta/iprp/ipco/ispe`` item property (thumbnails carry their own,
    smaller, ispe), display transforms from ``irot`` (90° CCW units) and
    ``imir`` (mirror axis). ``meta`` and ``ispe`` are FullBoxes — their
    bodies start past the 4 version/flags bytes. Pixel decode routes
    through the pyav hatch in :func:`decode_image`; this probe makes the
    blobs VISIBLE (dims, brand, front-door tag) with zero dependencies."""
    raw = bytes(raw)
    kind = _heif_kind(raw)
    if kind is None:
        return None
    out: dict = {"media_kind": kind}
    best = None
    for btype, bs, be in _mp4_boxes(raw, 0, len(raw)):
        if btype != b"meta":
            continue
        for ctype, cs, ce in _mp4_boxes(raw, bs + 4, be):
            if ctype != b"iprp":
                continue
            for ptype, ps, pe in _mp4_boxes(raw, cs, ce):
                if ptype != b"ipco":
                    continue
                for itype, is_, ie in _mp4_boxes(raw, ps, pe):
                    if itype == b"ispe" and ie - is_ >= 12:
                        w, h = struct.unpack(">II", raw[is_ + 4 : is_ + 12])
                        if best is None or w * h > best[0] * best[1]:
                            best = (w, h)
                    elif itype == b"irot" and ie - is_ >= 1:
                        out["_irot"] = raw[is_] & 0x03
                    elif itype == b"imir" and ie - is_ >= 1:
                        out["_imir"] = raw[is_] & 0x01
    if best is not None:
        out["width"], out["height"] = best
    return out


def encode_heif_meta(
    width: int,
    height: int,
    brand: bytes = b"avif",
    thumb: "tuple[int, int] | None" = None,
    irot: int | None = None,
    imir: int | None = None,
) -> bytes:
    """Minimal metadata-only AVIF/HEIC file (ftyp + meta(iprp(ipco(
    ispe…)))) — the test-fixture twin of :func:`parse_heif_header`, as
    ``encode_mp4_meta`` is for the MP4 probe (no coded image data)."""

    def box(t: bytes, b: bytes) -> bytes:
        return struct.pack(">I", 8 + len(b)) + t + b

    ftyp = box(b"ftyp", brand + b"\x00" * 4 + brand + b"mif1")
    props = box(b"ispe", b"\x00" * 4 + struct.pack(">II", width, height))
    if thumb is not None:
        props += box(
            b"ispe", b"\x00" * 4 + struct.pack(">II", *thumb)
        )
    if irot is not None:
        props += box(b"irot", bytes([irot & 0x03]))
    if imir is not None:
        props += box(b"imir", bytes([imir & 0x01]))
    meta = box(b"meta", b"\x00" * 4 + box(b"iprp", box(b"ipco", props)))
    return ftyp + meta


def parse_mp4_header(raw: bytes) -> dict | None:
    """ISO-BMFF (MP4/MOV) box walk: ``moov/mvhd`` gives timescale+duration,
    the first ``moov/trak/tkhd`` with a nonzero 16.16-fixed width/height
    gives the visual track dimensions. Version 0 and 1 boxes both handled;
    no decoder, no dependency — pure struct reads, like the other probes."""
    if len(raw) < 12 or raw[4:8] != b"ftyp":
        return None
    if _heif_kind(bytes(raw)) is not None:
        return None  # AVIF/HEIC are still images — parse_heif_header owns them
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


def parse_tiff_header(raw: bytes) -> dict | None:
    """Baseline TIFF header: endianness magic (II*/MM*), first IFD walk
    for ImageWidth/ImageLength/SamplesPerPixel/BitsPerSample."""
    if len(raw) < 8:
        return None
    if raw[:4] == b"II*\x00":
        e = "<"
    elif raw[:4] == b"MM\x00*":
        e = ">"
    else:
        return None
    (ifd_off,) = struct.unpack(e + "I", raw[4:8])
    if ifd_off + 2 > len(raw):
        return None
    (n_entries,) = struct.unpack(e + "H", raw[ifd_off : ifd_off + 2])
    out = {"media_kind": "tiff", "channels": 1, "bits_per_sample": 8}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(raw):
            break
        tag, typ, cnt = struct.unpack(e + "HHI", raw[off : off + 8])
        val_bytes = raw[off + 8 : off + 12]
        if typ == 3:  # SHORT
            val = struct.unpack(e + "H", val_bytes[:2])[0]
        else:
            val = struct.unpack(e + "I", val_bytes)[0]
        if tag == 256:
            out["width"] = val
        elif tag == 257:
            out["height"] = val
        elif tag == 277:
            out["channels"] = val
    if "width" not in out or "height" not in out:
        return None
    return out


_PROBES = (
    parse_png_header,
    parse_jpeg_header,
    parse_gif_header,
    parse_bmp_header,
    parse_tiff_header,
    parse_wav_header,
    parse_heif_header,  # before mp4: both start with ftyp, brands decide
    parse_mp4_header,
)
# parse_avi_header is appended to _PROBES after its definition below
# (RIFF 'AVI ' never collides with RIFF 'WAVE')

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


def _g711_ulaw_to_linear(u: int) -> int:
    """ITU-T G.711 µ-law byte → 16-bit linear (the audioop/spec table)."""
    u = ~u & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 3) + 0x84) << exp) - 0x84
    return -x if sign else x


def _g711_alaw_to_linear(a: int) -> int:
    """ITU-T G.711 A-law byte → 16-bit linear (the audioop/spec table)."""
    a ^= 0x55
    sign = a & 0x80
    exp = (a >> 4) & 0x07
    mant = a & 0x0F
    if exp == 0:
        x = (mant << 4) + 8
    else:
        x = ((mant << 4) + 0x108) << (exp - 1)
    return x if sign else -x  # A-law: set sign bit = POSITIVE (vs µ-law)


def decode_wav(raw: bytes) -> tuple[int, int, list[float]]:
    """Full WAV decode: (sample_rate, channels, samples in [-1, 1]).

    Supports linear PCM (format 1) at 8-bit unsigned / 16-bit signed,
    the two G.711 telephony companding laws — A-law (format 6) and
    µ-law (format 7), expanded per the ITU-T spec formulas (cross-checked
    against stdlib ``audioop`` over all 256 code points in tests) — and
    mono IMA/DVI ADPCM (format 0x11, dispatched to
    :func:`decode_wav_ima_adpcm`). Multi-channel data stays interleaved.
    """
    hdr = parse_wav_header(raw)
    if hdr is None:
        raise ValueError("not a WAV")
    bits = hdr.get("bits_per_sample")
    fmt_tag = hdr.get("format_tag", 1)
    if fmt_tag == 0x11:
        return decode_wav_ima_adpcm(raw)
    if fmt_tag not in (1, 6, 7):
        raise ValueError(f"unsupported WAV format tag {fmt_tag}")
    if fmt_tag == 1 and bits not in (8, 16):
        raise ValueError(f"unsupported WAV bit depth {bits}")
    if fmt_tag in (6, 7) and bits != 8:
        raise ValueError(f"G.711 WAV must be 8-bit, got {bits}")
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
    if fmt_tag == 6:
        samples = [_g711_alaw_to_linear(v) / 32768.0 for v in data]
    elif fmt_tag == 7:
        samples = [_g711_ulaw_to_linear(v) / 32768.0 for v in data]
    elif bits == 16:
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


_IMA_INDEX_TABLE = (-1, -1, -1, -1, 2, 4, 6, 8)
_IMA_STEP_TABLE = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)


def _ima_decode_nibble(n: int, predictor: int, index: int) -> tuple[int, int]:
    """One IMA-ADPCM nibble step (IMA ADPCM spec / MS WAVE format 0x11):
    returns (new_predictor, new_index)."""
    step = _IMA_STEP_TABLE[index]
    diff = step >> 3
    if n & 1:
        diff += step >> 2
    if n & 2:
        diff += step >> 1
    if n & 4:
        diff += step
    predictor = predictor - diff if n & 8 else predictor + diff
    predictor = max(-32768, min(32767, predictor))
    index = max(0, min(88, index + _IMA_INDEX_TABLE[n & 7]))
    return predictor, index


def decode_wav_ima_adpcm(raw: bytes) -> tuple[int, int, list[float]]:
    """IMA/DVI ADPCM WAV (format tag 0x11, mono) → (rate, 1, samples in
    [-1, 1]). Each ``block_align`` block: a 4-byte header (initial int16
    predictor + step index) then 2 nibbles per byte, LOW nibble first —
    the 4:1 compressed telephony/game-audio format. Stereo blocks
    (channel-interleaved 4-byte groups) raise; stdlib-free."""
    hdr = parse_wav_header(raw)
    if hdr is None or hdr.get("format_tag") != 0x11:
        raise ValueError("not an IMA ADPCM WAV")
    if hdr.get("channels", 1) != 1:
        raise ValueError("IMA ADPCM decode supports mono only")
    # block_align comes from the fmt chunk; re-walk for it and the data
    pos, n = 12, len(raw)
    block_align = None
    data = None
    while pos + 8 <= n:
        cid = raw[pos : pos + 4]
        size = struct.unpack("<I", raw[pos + 4 : pos + 8])[0]
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            block_align = struct.unpack("<H", body[12:14])[0]
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if data is None or not block_align or block_align < 5:
        raise ValueError("malformed IMA ADPCM WAV")
    out: list[float] = []
    for bstart in range(0, len(data) - block_align + 1, block_align):
        block = data[bstart : bstart + block_align]
        predictor = struct.unpack("<h", block[0:2])[0]
        index = block[2]
        if index > 88:
            raise ValueError("corrupt IMA ADPCM: step index > 88")
        out.append(predictor / 32768.0)
        for byte in block[4:]:
            for nib in (byte & 0x0F, byte >> 4):  # LOW nibble first
                predictor, index = _ima_decode_nibble(nib, predictor, index)
                out.append(predictor / 32768.0)
    return hdr["sample_rate"], 1, out


def encode_wav_ima_adpcm(
    sample_rate: int, samples: list[int], block_align: int = 256
) -> bytes:
    """Mono IMA ADPCM WAV fixture encoder (real quantizer: greedy
    nibble search over the same decode tables, so encode→decode tracks
    the input within the codec's quantization error)."""
    spb = (block_align - 4) * 2 + 1  # samples per block
    body = bytearray()
    i = 0
    index = 0
    while i < len(samples):
        chunk = samples[i : i + spb]
        predictor = max(-32768, min(32767, int(chunk[0])))
        body += struct.pack("<hBB", predictor, index, 0)
        nibbles: list[int] = []
        for target in chunk[1:]:
            best, best_err = 0, None
            for n in range(16):
                p2, _ = _ima_decode_nibble(n, predictor, index)
                err = abs(int(target) - p2)
                if best_err is None or err < best_err:
                    best, best_err = n, err
            predictor, index = _ima_decode_nibble(best, predictor, index)
            nibbles.append(best)
        if len(nibbles) % 2:
            nibbles.append(0)
        for j in range(0, len(nibbles), 2):
            body.append(nibbles[j] | (nibbles[j + 1] << 4))
        # pad the final short block to block_align
        pad = block_align - 4 - len(nibbles) // 2
        body += b"\x00" * pad
        i += spb
    fmt = struct.pack(
        "<HHIIHHHH", 0x11, 1, sample_rate,
        sample_rate * block_align // spb, block_align, 4, 2, spb,
    )
    chunks = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(body))
        + bytes(body)
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def encode_wav_g711(
    sample_rate: int, codes: bytes, law: str = "ulaw", channels: int = 1
) -> bytes:
    """Minimal G.711 WAV fixture: raw companded ``codes`` bytes under
    format tag 7 (µ-law) or 6 (A-law), 8 bits per sample."""
    tag = {"ulaw": 7, "alaw": 6}.get(law)
    if tag is None:
        raise ValueError("law must be 'ulaw' or 'alaw'")
    block_align = channels
    fmt = struct.pack(
        "<HHIIHH", tag, channels, sample_rate, sample_rate * block_align,
        block_align, 8,
    )
    chunks = (
        b"WAVE"
        + b"fmt "
        + struct.pack("<I", len(fmt))
        + fmt
        + b"data"
        + struct.pack("<I", len(codes))
        + codes
        + (b"\x00" if len(codes) & 1 else b"")
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# ---------------------------------------------------------------- JPEG codec
#
# Baseline sequential JFIF (ITU-T T.81) in numpy — the decode path the
# verdict asked for: a 100 TB multimodal corpus is dominated by JPEGs, and
# header metadata alone can't feed the perceptual dHash. The decoder is
# general (tables come from the file's DQT/DHT segments, any sampling
# factors, DRI/RSTn restarts); the encoder exists to fabricate REAL
# spec-valid fixtures deterministically (4:4:4 or 4:2:0, IJG quality
# scaling) — the same role encode_png/encode_wav play for their formats.
# Progressive (SOF2) and arithmetic coding raise ValueError.

#: zigzag index -> natural (row-major) block index, T.81 figure A.6
_JPEG_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K quantization tables (zigzag order follows from raster tables
# being indexed through _JPEG_ZIGZAG at use sites; these are RASTER order)
_JPEG_Q_LUM = [
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]
_JPEG_Q_CHR = [
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]

# Annex K Huffman specs: (16 code-length counts, symbol values)
_JPEG_HUFF_DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
_JPEG_HUFF_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
        0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
        0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
        0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
        0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
        0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
        0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
        0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
        0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_JPEG_HUFF_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
        0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
        0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
        0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
        0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
        0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
        0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
        0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
        0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
        0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
        0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
        0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)


def _dct_matrix():
    """Orthonormal 8x8 DCT-II matrix T: forward F = T f T', inverse
    f = T' F T."""
    import numpy as np

    x = np.arange(8)
    T = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16.0)
    T *= 0.5
    T[0, :] = np.sqrt(1.0 / 8.0)
    return T


def _build_huff_decoder(counts, vals) -> dict:
    """Canonical Huffman: (code_length, code) -> symbol."""
    lut = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            lut[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return lut


class _BitReader:
    """MSB-first bit reader over already-unstuffed entropy bytes."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            # past-the-end reads behave as 1-padding (spec: fill bits are
            # 1s) — lets a final EOB-less block terminate cleanly
            return 1
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _huff_decode(br: _BitReader, lut: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.read_bit()
        sym = lut.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 EXTEND: map an s-bit magnitude to its signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(raw: bytes):
    """Wrapper converting truncation artifacts (IndexError / struct
    unpack errors from cut-off header segments) into clean ValueErrors.
    See :func:`_decode_jpeg` for the actual decoder contract."""
    try:
        return _decode_jpeg(raw)
    except (IndexError, struct.error) as exc:
        raise ValueError(f"truncated or corrupt JPEG: {exc}") from exc


def _decode_jpeg(raw: bytes):
    """Full baseline JPEG decode → (width, height, channels, pixels).

    Pixels are interleaved 8-bit row-major (RGB for 3-component YCbCr
    frames, single-channel for grayscale) — the same contract as
    :func:`decode_png`. Supports baseline + extended sequential Huffman
    (SOF0/SOF1), any sampling factors (nearest-neighbor chroma
    upsampling), 8-bit precision, DRI/RSTn restart intervals, tables read
    from the file's own DQT/DHT segments. Progressive and arithmetic
    frames raise ValueError.
    """
    import numpy as np

    if len(raw) < 4 or raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, "np.ndarray"] = {}
    huff: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    while pos + 2 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = raw[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI before SOS
            break
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue  # standalone markers
        if pos + 2 > len(raw):
            raise ValueError("truncated JPEG segment")
        (seglen,) = struct.unpack(">H", raw[pos : pos + 2])
        seg = raw[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    qt[tq] = np.frombuffer(seg[i : i + 64], np.uint8).astype(
                        np.int32
                    )
                    i += 64
                else:
                    qt[tq] = np.frombuffer(seg[i : i + 128], ">u2").astype(
                        np.int32
                    )
                    i += 128
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                i += 1
                counts = list(seg[i : i + 16])
                i += 16
                nv = sum(counts)
                huff[(tc, th)] = _build_huff_decoder(counts, seg[i : i + nv])
                i += nv
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            if seg[0] != 8:
                raise ValueError(f"unsupported JPEG precision {seg[0]}")
            h, w = struct.unpack(">HH", seg[1:5])
            comps = []
            for ci in range(seg[5]):
                cid, samp, tq = seg[6 + 3 * ci : 9 + 3 * ci]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 15, "tq": tq}
                )
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise ValueError("progressive JPEG unsupported")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type 0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            scomps = []
            for ci in range(seg[0]):
                cs, tt = seg[1 + 2 * ci], seg[2 + 2 * ci]
                scomps.append((cs, tt >> 4, tt & 15))
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            return _decode_jpeg_scan(
                raw, pos + seglen, frame, qt, huff, scomps, restart
            )
        pos += seglen
    raise ValueError("no JPEG scan found")


def _decode_jpeg_scan(raw, start, frame, qt, huff, scomps, restart):
    import numpy as np

    h, w, comps = frame
    byid = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))

    # split entropy data at restart markers, unstuffing 0xFF00
    segments = []
    cur = bytearray()
    i = start
    n = len(raw)
    while i < n:
        b = raw[i]
        if b == 0xFF:
            nb = raw[i + 1] if i + 1 < n else 0xD9
            if nb == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= nb <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # EOI or next real marker
        cur.append(b)
        i += 1
    segments.append(bytes(cur))

    zz = _JPEG_ZIGZAG
    # per-component zigzag-ordered dequant vectors and coef planes
    coef = {}
    for c in comps:
        bw_, bh_ = mcus_x * c["h"], mcus_y * c["v"]
        coef[c["id"]] = np.zeros((bh_, bw_, 64), dtype=np.int32)
    dq = {c["id"]: qt[c["tq"]] for c in comps}

    pred = {c["id"]: 0 for c in comps}
    seg_idx = 0
    br = _BitReader(segments[0])
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu and mcu % restart == 0:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("missing JPEG restart segment")
                br = _BitReader(segments[seg_idx])
                pred = {c["id"]: 0 for c in comps}
            for cid, td, ta in scomps:
                c = byid[cid]
                dctab, actab = huff[(0, td)], huff[(1, ta)]
                q = dq[cid]
                plane = coef[cid]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        blk = plane[my * c["v"] + by, mx * c["h"] + bx]
                        s = _huff_decode(br, dctab)
                        pred[cid] += _extend(br.read_bits(s), s)
                        blk[0] = pred[cid] * int(q[0])
                        k = 1
                        while k < 64:
                            rs = _huff_decode(br, actab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[k] = _extend(br.read_bits(s), s) * int(q[k])
                            k += 1
            mcu += 1

    # batched IDCT per component, then upsample + color convert
    T = _dct_matrix()
    planes = {}
    for c in comps:
        cid = c["id"]
        bh_, bw_ = coef[cid].shape[:2]
        nat = np.zeros((bh_, bw_, 64), dtype=np.float64)
        nat[:, :, zz] = coef[cid]  # dezigzag: nat[natural_idx] = coef[zz_idx]
        blocks = nat.reshape(bh_, bw_, 8, 8)
        spatial = np.einsum("ab,ijbc,cd->ijad", T.T, blocks, T)
        plane = spatial.transpose(0, 2, 1, 3).reshape(bh_ * 8, bw_ * 8)
        plane = np.clip(np.round(plane + 128.0), 0, 255)
        # nearest-neighbor upsample to full frame resolution
        ys = (np.arange(h) * c["v"]) // vmax
        xs = (np.arange(w) * c["h"]) // hmax
        planes[cid] = plane[np.ix_(ys, xs)]

    if len(comps) == 1:
        out = planes[comps[0]["id"]].astype(np.uint8)
        return w, h, 1, out.tobytes()
    if len(comps) != 3:
        raise ValueError(f"unsupported JPEG component count {len(comps)}")
    y = planes[comps[0]["id"]]
    cb = planes[comps[1]["id"]] - 128.0
    cr = planes[comps[2]["id"]] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    out = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, 3, out.tobytes()


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing."""

    __slots__ = ("out", "acc", "nbits")

    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int) -> None:
        self.acc = (self.acc << n) | (value & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)

    def restart_marker(self, idx: int) -> None:
        """Byte-align with 1-fill, then emit RSTn (markers are never
        stuffed)."""
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)
        self.out += bytes([0xFF, 0xD0 + (idx & 7)])


def _build_huff_encoder(counts, vals) -> dict:
    """Canonical Huffman: symbol -> (code, length)."""
    enc = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            enc[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return enc


def _jpeg_quality_tables(quality: int):
    """IJG quality scaling of the Annex K tables, clipped to [1, 255]."""
    import numpy as np

    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_JPEG_Q_LUM, _JPEG_Q_CHR):
        q = (np.array(base, dtype=np.int64) * scale + 50) // 100
        out.append(np.clip(q, 1, 255).astype(np.int32))
    return out


def encode_jpeg(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    quality: int = 90,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Minimal valid baseline JFIF encoder (Annex K tables, IJG quality
    scaling): grayscale (channels=1) or RGB→YCbCr (channels=3) with
    4:4:4 or 4:2:0 (``subsampling``) chroma. Exists to fabricate real
    spec-valid JPEG fixtures deterministically — the fixture-forging role
    of :func:`encode_png` — and to round-trip-test :func:`decode_jpeg`.
    ``restart_interval`` > 0 emits DRI + RSTn markers every that many
    MCUs (exercises the decoder's restart path).
    """
    import numpy as np

    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if subsampling not in ("444", "420", "422"):
        raise ValueError("subsampling must be '444', '420' or '422'")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    a = np.frombuffer(pixels, np.uint8).reshape(height, width, channels)
    a = a.astype(np.float64)
    if channels == 3:
        r, g, b = a[..., 0], a[..., 1], a[..., 2]
        yp = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [yp, cb, cr]
    else:
        planes = [a[..., 0]]
        subsampling = "444"

    q_lum, q_chr = _jpeg_quality_tables(quality)
    zz = _JPEG_ZIGZAG
    q_lum_zz, q_chr_zz = q_lum[zz], q_chr[zz]
    T = _dct_matrix()

    def pad8(p):
        ph = -(-p.shape[0] // 8) * 8
        pw = -(-p.shape[1] // 8) * 8
        return np.pad(
            p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
        )

    sub = subsampling in ("420", "422") and channels == 3
    if sub:
        # hy x vy box-average chroma, padded to sampling multiples first
        hy, vy = (2, 2) if subsampling == "420" else (2, 1)

        def down(p):
            pp = np.pad(
                p,
                ((0, (-p.shape[0]) % vy), (0, (-p.shape[1]) % hy)),
                mode="edge",
            )
            acc = np.zeros((pp.shape[0] // vy, pp.shape[1] // hy))
            for dy in range(vy):
                for dx in range(hy):
                    acc += pp[dy::vy, dx::hy]
            return acc / (vy * hy)

        planes = [planes[0], down(planes[1]), down(planes[2])]
        samp = [(hy, vy), (1, 1), (1, 1)]
    else:
        samp = [(1, 1)] * len(planes)

    # headers
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)

    def dqt(tq, q_zz_):
        body = bytes([tq]) + bytes(int(v) for v in q_zz_)
        return b"\xff\xdb" + struct.pack(">H", 2 + len(body)) + body

    out += dqt(0, q_lum_zz)
    if channels == 3:
        out += dqt(1, q_chr_zz)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    nc = len(planes)
    sof = struct.pack(">BHHB", 8, height, width, nc)
    for ci in range(nc):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc, th, spec):
        counts, vals = spec
        body = bytes([(tc << 4) | th]) + bytes(counts) + bytes(vals)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, _JPEG_HUFF_DC_LUM) + dht(1, 0, _JPEG_HUFF_AC_LUM)
    if channels == 3:
        out += dht(0, 1, _JPEG_HUFF_DC_CHR) + dht(1, 1, _JPEG_HUFF_AC_CHR)

    sos = bytes([nc])
    for ci in range(nc):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l = _build_huff_encoder(*_JPEG_HUFF_DC_LUM)
    ac_l = _build_huff_encoder(*_JPEG_HUFF_AC_LUM)
    dc_c = _build_huff_encoder(*_JPEG_HUFF_DC_CHR)
    ac_c = _build_huff_encoder(*_JPEG_HUFF_AC_CHR)

    bw_ = _BitWriter()
    padded = [pad8(p) for p in planes]
    if not sub:
        # interleaved 1x1 MCUs: one block per component per MCU
        preds = [0] * nc
        ph, pw = padded[0].shape
        T_ = T
        import numpy as _np

        qzs = [q_lum_zz] + [q_chr_zz] * (nc - 1)
        encs = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (nc - 1)
        # precompute quantized zigzag blocks per plane
        qblocks = []
        for ci, p in enumerate(padded):
            hh, ww = p.shape
            blocks = (
                p.reshape(hh // 8, 8, ww // 8, 8).transpose(0, 2, 1, 3)
                - 128.0
            )
            F2 = _np.einsum("ab,ijbc,cd->ijad", T_, blocks, T_.T)
            flat = F2.reshape(hh // 8, ww // 8, 64)[:, :, zz]
            qblocks.append(_np.round(flat / qzs[ci]).astype(_np.int32))
        n_mcus = (ph // 8) * (pw // 8)
        mcu_i = 0
        for by in range(ph // 8):
            for bx in range(pw // 8):
                for ci in range(nc):
                    preds[ci] = _write_jpeg_block(
                        bw_, qblocks[ci][by, bx], encs[ci], preds[ci]
                    )
                mcu_i += 1
                if (
                    restart_interval
                    and mcu_i % restart_interval == 0
                    and mcu_i < n_mcus
                ):
                    bw_.restart_marker(mcu_i // restart_interval - 1)
                    preds = [0] * nc
    else:
        # subsampled MCU: vy x hy Y blocks then Cb, Cr
        import numpy as _np

        # luma padded to MCU multiples (8*hy x 8*vy) so every MCU is full
        p = padded[0]
        hh = -(-p.shape[0] // (8 * vy)) * (8 * vy)
        ww = -(-p.shape[1] // (8 * hy)) * (8 * hy)
        padded[0] = _np.pad(
            p,
            ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
            mode="edge",
        )
        planes_q = []
        for ci, p in enumerate(padded):
            ph_, pw_ = p.shape
            blocks = (
                p.reshape(ph_ // 8, 8, pw_ // 8, 8).transpose(0, 2, 1, 3)
                - 128.0
            )
            F2 = _np.einsum("ab,ijbc,cd->ijad", T, blocks, T.T)
            flat = F2.reshape(ph_ // 8, pw_ // 8, 64)[:, :, zz]
            qz_ = q_lum_zz if ci == 0 else q_chr_zz
            planes_q.append(_np.round(flat / qz_).astype(_np.int32))
        yq, cbq, crq = planes_q
        mcus_y, mcus_x = hh // (8 * vy), ww // (8 * hy)
        predy = predcb = predcr = 0
        n_mcus = mcus_y * mcus_x
        mcu_i = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                for by in range(vy):
                    for bx in range(hy):
                        predy = _write_jpeg_block(
                            bw_,
                            yq[vy * my + by, hy * mx + bx],
                            (dc_l, ac_l),
                            predy,
                        )
                predcb = _write_jpeg_block(
                    bw_, cbq[my, mx], (dc_c, ac_c), predcb
                )
                predcr = _write_jpeg_block(
                    bw_, crq[my, mx], (dc_c, ac_c), predcr
                )
                mcu_i += 1
                if (
                    restart_interval
                    and mcu_i % restart_interval == 0
                    and mcu_i < n_mcus
                ):
                    bw_.restart_marker(mcu_i // restart_interval - 1)
                    predy = predcb = predcr = 0

    out += bw_.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def _write_jpeg_block(bw_, blk, encs, pred: int) -> int:
    """Huffman-encode one quantized zigzag block; returns new DC pred."""
    import numpy as np

    dc_enc, ac_enc = encs
    diff = int(blk[0]) - pred
    pred = int(blk[0])
    s = abs(diff).bit_length()
    code, ln = dc_enc[s]
    bw_.write(code, ln)
    if s:
        bw_.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    nz = np.nonzero(blk[1:])[0]
    last = int(nz[-1]) + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(blk[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_enc[0xF0]
            bw_.write(code, ln)
            run -= 16
        s = abs(v).bit_length()
        code, ln = ac_enc[(run << 4) | s]
        bw_.write(code, ln)
        bw_.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last < 63:
        code, ln = ac_enc[0x00]
        bw_.write(code, ln)
    return pred


# ---------------------------------------------------------------- GIF codec
#
# GIF87a/89a decode — pure stdlib: the container is palette indices
# compressed with variable-width LZW (LSB-first code packing). Covers
# stills AND full animations (decode_gif_frames: per-frame Graphic
# Control transparency + disposal compositing), so GIF joins MJPEG-AVI
# as a real video-frame source for the sampling pipeline. encode_gif /
# encode_gif_animation forge spec-valid fixtures with a real LZW
# compressor.


def _gif_lzw_decode(min_code_size: int, data: bytes) -> bytearray:
    """Variable-width GIF LZW → palette indices."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    # dictionary: code -> byte sequence
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return out  # missing EOI: tolerate truncation
            acc |= data[pos] << nbits  # LSB-first packing
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(base)
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return out
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream")
        out += entry
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    return out


def decode_gif_frames(raw: bytes, max_frames: int | None = None):
    """Decode a GIF — still OR animated — into composited full-canvas
    frames: ``(width, height, frames, delays_cs)`` where ``frames`` is a
    list of RGB byte buffers at logical-screen size and ``delays_cs`` the
    per-frame Graphic Control delays in centiseconds (0 when absent).

    Full GIF89a animation semantics, stdlib-only: each frame composites
    at its (left, top) sub-rectangle onto the running canvas,
    Graphic-Control transparency indices leave the underlying pixels
    visible, and the disposal method is applied AFTER the frame is
    snapshotted — 0/1 leave the canvas, 2 restores the frame rectangle to
    the background color, 3 restores the pre-frame canvas. Interlaced
    frames are unwoven per the 4-pass row order. ``max_frames`` stops
    early (the frame-sampling path decodes only what it keeps).
    Raises ValueError on malformed input.
    """
    hdr = parse_gif_header(raw)
    if hdr is None:
        raise ValueError("not a GIF")
    sw, sh = hdr["width"], hdr["height"]
    packed = raw[10]
    bg_index = raw[11]
    pos = 13
    gct = None
    if packed & 0x80:
        ncolors = 2 << (packed & 0x07)
        gct = raw[pos : pos + 3 * ncolors]
        pos += 3 * ncolors
    if gct is not None and 3 * bg_index + 3 <= len(gct):
        bg = gct[3 * bg_index : 3 * bg_index + 3]
    else:
        bg = b"\x00\x00\x00"
    canvas = bytearray(bg * (sw * sh))
    frames: list[bytes] = []
    delays: list[int] = []
    gce: tuple[int, int | None, int] | None = None  # (disposal, tidx, delay)
    while pos < len(raw):
        intro = raw[pos]
        if intro == 0x3B:  # trailer
            break
        if intro == 0x21:  # extension
            if pos + 1 < len(raw) and raw[pos + 1] == 0xF9 and pos + 7 < len(raw):
                flags = raw[pos + 3]
                delay = raw[pos + 4] | (raw[pos + 5] << 8)
                gce = (
                    (flags >> 2) & 0x07,
                    raw[pos + 6] if flags & 0x01 else None,
                    delay,
                )
            pos += 2
            while pos < len(raw) and raw[pos] != 0:
                pos += 1 + raw[pos]
            pos += 1
            continue
        if intro != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{intro:02x}")
        left, top, fw, fh = struct.unpack("<HHHH", raw[pos + 1 : pos + 9])
        ipacked = raw[pos + 9]
        pos += 10
        ct = gct
        if ipacked & 0x80:  # local color table
            ncolors = 2 << (ipacked & 0x07)
            ct = raw[pos : pos + 3 * ncolors]
            pos += 3 * ncolors
        if ct is None:
            raise ValueError("GIF image with no color table")
        min_code_size = raw[pos]
        pos += 1
        data = bytearray()
        while pos < len(raw) and raw[pos] != 0:
            ln = raw[pos]
            data += raw[pos + 1 : pos + 1 + ln]
            pos += 1 + ln
        pos += 1
        idx = _gif_lzw_decode(min_code_size, bytes(data))
        if len(idx) < fw * fh:
            raise ValueError("GIF pixel data truncated")
        if ipacked & 0x40:  # interlaced: 4-pass row order
            rows = [None] * fh
            src = 0
            for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                for y in range(start, fh, step):
                    rows[y] = idx[src * fw : (src + 1) * fw]
                    src += 1
            flat = bytearray()
            for r in rows:
                flat += r
            idx = flat
        disposal, tidx, delay = gce if gce is not None else (0, None, 0)
        saved = bytes(canvas) if disposal == 3 else None
        # a palette index past the color table would make ct[c:c+3] a
        # short slice; assigning it into the 3-byte canvas slice silently
        # SHRINKS the bytearray, corrupting every later pixel and breaking
        # the w*h*3 length contract (image_dhash reshapes by it) — reject
        n_colors = len(ct) // 3
        for y in range(fh):
            cy = top + y
            if cy >= sh:
                break
            row = idx[y * fw : (y + 1) * fw]
            for x in range(min(fw, sw - left)):
                if row[x] >= n_colors:
                    raise ValueError("corrupt GIF: palette index out of range")
                if tidx is not None and row[x] == tidx:
                    continue  # transparent: underlying pixel shows through
                o = 3 * (cy * sw + left + x)
                c = 3 * row[x]
                canvas[o : o + 3] = ct[c : c + 3]
        frames.append(bytes(canvas))
        delays.append(delay)
        if max_frames is not None and len(frames) >= max_frames:
            return sw, sh, frames, delays
        if disposal == 2:  # restore frame rect to background
            for y in range(fh):
                cy = top + y
                if cy >= sh:
                    break
                for x in range(min(fw, sw - left)):
                    o = 3 * (cy * sw + left + x)
                    canvas[o : o + 3] = bg
        elif disposal == 3 and saved is not None:
            canvas = bytearray(saved)
        gce = None
    if not frames:
        raise ValueError("no image data in GIF")
    return sw, sh, frames, delays


def decode_gif(raw: bytes):
    """Decode the FIRST frame of a GIF → (width, height, 3, RGB bytes) at
    logical-screen size: canvas filled with the background palette color,
    frame composited at its (left, top) offset, interlacing unwoven,
    Graphic-Control transparency honored. Raises ValueError on malformed
    input. (Thin wrapper over :func:`decode_gif_frames`.)"""
    sw, sh, frames, _delays = decode_gif_frames(raw, max_frames=1)
    return sw, sh, 3, frames[0]


def _gif_lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """Real GIF LZW compressor (variable-width, LSB-first packing)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    acc = 0
    nbits = 0
    out = bytearray()

    def emit(code: int, w: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    run = b""
    for b in indices:
        cand = run + bytes([b])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            emit(clear, width)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        run = bytes([b])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int, height: int, pixels: bytes, channels: int = 3
) -> bytes:
    """Minimal valid GIF89a still image with a real LZW compressor.

    ``pixels``: interleaved RGB (channels=3) or grayscale (channels=1);
    at most 256 distinct colors (GIF's palette limit) — raises otherwise.
    """
    if channels == 1:
        rgb = bytes(b for v in pixels for b in (v, v, v))
    elif channels == 3:
        rgb = pixels
    else:
        raise ValueError("channels must be 1 or 3")
    if len(rgb) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    palette: dict[bytes, int] = {}
    indices = bytearray()
    for i in range(0, len(rgb), 3):
        c = rgb[i : i + 3]
        j = palette.get(c)
        if j is None:
            j = len(palette)
            if j >= 256:
                raise ValueError("more than 256 distinct colors")
            palette[c] = j
        indices.append(j)
    bits = max(1, (len(palette) - 1).bit_length())
    ncolors = 1 << bits
    ct = b"".join(sorted(palette, key=palette.get)) + b"\x00\x00\x00" * (
        ncolors - len(palette)
    )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg 0, aspect
    out += ct
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    min_code_size = max(2, bits)
    out += bytes([min_code_size])
    lzw = _gif_lzw_encode(min_code_size, bytes(indices))
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def encode_gif_animation(
    width: int, height: int, frames: "Sequence[dict]"
) -> bytes:
    """Spec-valid animated GIF89a fixture encoder (real LZW, GCE blocks).

    Each frame dict: ``pixels`` (RGB bytes, fw*fh*3), ``left``/``top``
    (default 0), ``fw``/``fh`` (default full canvas), ``delay_cs``
    (default 4), ``disposal`` (0-3, default 1), ``transparent`` (an RGB
    3-tuple whose pixels become the GCE transparent index, default None).
    One GLOBAL color table is built across all frames (≤256 colors —
    raises otherwise), so the tests' hand-computed composites and the
    decoder agree color-for-color.
    """
    palette: dict[bytes, int] = {}

    def idx_of(c: bytes) -> int:
        j = palette.get(c)
        if j is None:
            j = len(palette)
            if j >= 256:
                raise ValueError("more than 256 distinct colors")
            palette[c] = j
        return j

    norm = []
    for fr in frames:
        fw = int(fr.get("fw", width))
        fh = int(fr.get("fh", height))
        px = fr["pixels"]
        if len(px) != fw * fh * 3:
            raise ValueError("frame pixel buffer size mismatch")
        tr = fr.get("transparent")
        tidx = idx_of(bytes(tr)) if tr is not None else None
        indices = bytes(
            idx_of(px[i : i + 3]) for i in range(0, len(px), 3)
        )
        norm.append(
            (
                int(fr.get("left", 0)),
                int(fr.get("top", 0)),
                fw,
                fh,
                indices,
                int(fr.get("delay_cs", 4)),
                int(fr.get("disposal", 1)),
                tidx,
            )
        )
    bits = max(1, (len(palette) - 1).bit_length())
    ncolors = 1 << bits
    ct = b"".join(sorted(palette, key=palette.get)) + b"\x00\x00\x00" * (
        ncolors - len(palette)
    )
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", width, height)
    out += bytes([0x80 | (bits - 1), 0, 0])  # GCT flag + size, bg 0, aspect
    out += ct
    for left, top, fw, fh, indices, delay, disposal, tidx in norm:
        flags = (disposal & 0x07) << 2
        if tidx is not None:
            flags |= 0x01
        out += bytes([0x21, 0xF9, 0x04, flags, delay & 0xFF, delay >> 8])
        out += bytes([tidx if tidx is not None else 0, 0x00])
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh) + b"\x00"
        min_code_size = max(2, bits)
        out += bytes([min_code_size])
        lzw = _gif_lzw_encode(min_code_size, indices)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


# ---------------------------------------------------------------- BMP codec
#
# Uncompressed BITMAPINFOHEADER BMP (BI_RGB): rows are 4-byte aligned and
# stored bottom-up (negative height = top-down). 24/32-bit truecolor is
# BGR(A) per pixel; 8-bit is palette-indexed via the BGRA color table.
# The last still-image container gap — with PNG/JPEG/GIF this makes every
# common image format's real pixels reachable without codec libraries.


def decode_bmp(raw: bytes):
    """Decode an uncompressed BMP → (width, height, 3, RGB bytes).
    Supports 24/32-bit BI_RGB and 8-bit palettized; other depths or
    compressions raise ValueError."""
    hdr = parse_bmp_header(raw)
    if hdr is None:
        raise ValueError("not a BMP")
    (data_off,) = struct.unpack("<I", raw[10:14])
    (hdr_size,) = struct.unpack("<I", raw[14:18])
    width, height_raw = struct.unpack("<ii", raw[18:26])
    (bits,) = struct.unpack("<H", raw[28:30])
    (compression,) = struct.unpack("<I", raw[30:34])
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bits not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth {bits}")
    if width <= 0 or height_raw == 0:
        raise ValueError("degenerate BMP dimensions")
    height = abs(height_raw)
    top_down = height_raw < 0
    palette = None
    if bits == 8:
        (n_colors,) = struct.unpack("<I", raw[46:50])
        n_colors = n_colors or 256
        pstart = 14 + hdr_size
        palette = raw[pstart : pstart + 4 * n_colors]  # BGRA quads
    stride = ((width * bits // 8) + 3) & ~3
    out = bytearray(width * height * 3)
    for row in range(height):
        src_row = row if top_down else height - 1 - row
        off = data_off + src_row * stride
        line = raw[off : off + stride]
        if len(line) < width * bits // 8:
            raise ValueError("BMP pixel data truncated")
        o = row * width * 3
        if bits == 8:
            for x in range(width):
                p = 4 * line[x]
                out[o + 3 * x : o + 3 * x + 3] = bytes(
                    (palette[p + 2], palette[p + 1], palette[p])
                )
        else:
            step = bits // 8
            for x in range(width):
                i = x * step
                out[o + 3 * x : o + 3 * x + 3] = bytes(
                    (line[i + 2], line[i + 1], line[i])
                )
    return width, height, 3, bytes(out)


def encode_bmp(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal valid 24-bit BI_RGB BMP (bottom-up rows, 4-byte-aligned).
    ``pixels``: interleaved RGB (channels=3) or grayscale (channels=1)."""
    if channels == 1:
        rgb = bytes(b for v in pixels for b in (v, v, v))
    elif channels == 3:
        rgb = pixels
    else:
        raise ValueError("channels must be 1 or 3")
    if len(rgb) != width * height * 3:
        raise ValueError("pixel buffer size mismatch")
    stride = ((width * 3) + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    body = bytearray()
    for row in range(height - 1, -1, -1):  # bottom-up
        o = row * width * 3
        line = rgb[o : o + width * 3]
        body += bytes(
            b
            for x in range(width)
            for b in (line[3 * x + 2], line[3 * x + 1], line[3 * x])
        )
        body += pad
    data_off = 14 + 40
    out = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    out += struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return out + bytes(body)


# --------------------------------------------------------------- TIFF codec
#
# Baseline TIFF (the scanner/science/print-pipeline format): both byte
# orders, strip-organized 8-bit grayscale or RGB, Compression 1 (none)
# or 32773 (PackBits run-length). Written from the TIFF 6.0 spec; the
# fixture encoder emits both compressions so decode is lossless-oracled.


def _packbits_decode(data: bytes, expect: int) -> bytearray:
    """TIFF PackBits: n in 0..127 → copy n+1 literals; n in -127..-1 →
    repeat next byte 1-n times; -128 is a no-op."""
    out = bytearray()
    i = 0
    while i < len(data) and len(out) < expect:
        n = data[i]
        i += 1
        if n < 128:
            out += data[i : i + n + 1]
            i += n + 1
        elif n > 128:
            out += bytes([data[i]]) * (257 - n)
            i += 1
        # 128: no-op
    if len(out) < expect:
        raise ValueError("corrupt PackBits strip: short output")
    return out[:expect]


def _packbits_encode(row: bytes) -> bytes:
    """Greedy PackBits encoder (runs ≥3 become repeats)."""
    out = bytearray()
    i, n = 0, len(row)
    while i < n:
        run = 1
        while i + run < n and run < 128 and row[i + run] == row[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, row[i]])
            i += run
            continue
        lit_start = i
        i += run
        while i < n and (len(row) - i < 3 or not (
            i + 2 < n and row[i] == row[i + 1] == row[i + 2]
        )) and i - lit_start < 128:
            i += 1
        out += bytes([i - lit_start - 1]) + row[lit_start:i]
    return bytes(out)


def decode_tiff(raw: bytes):
    """Decode a baseline TIFF → (width, height, channels, pixel bytes).
    8-bit gray (ch=1) or RGB (ch=3), strip-organized, Compression 1
    (uncompressed) or 32773 (PackBits), either byte order. Other bit
    depths/compressions raise ValueError."""
    hdr = parse_tiff_header(raw)
    if hdr is None:
        raise ValueError("not a TIFF")
    e = "<" if raw[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(e + "I", raw[4:8])
    (n_entries,) = struct.unpack(e + "H", raw[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    for i in range(n_entries):
        off = ifd_off + 2 + 12 * i
        tag, typ, cnt = struct.unpack(e + "HHI", raw[off : off + 8])
        tags[tag] = (typ, cnt, raw[off + 8 : off + 12])

    def values(tag: int, default=None) -> list[int]:
        if tag not in tags:
            return default
        typ, cnt, vb = tags[tag]
        size = 2 if typ == 3 else 4
        fmt = "H" if typ == 3 else "I"
        if cnt * size <= 4:
            return list(
                struct.unpack(e + fmt * cnt, vb[: cnt * size])
            )
        (ptr,) = struct.unpack(e + "I", vb)
        return list(
            struct.unpack(e + fmt * cnt, raw[ptr : ptr + cnt * size])
        )

    w = values(256)[0]
    h = values(257)[0]
    ch = values(277, [1])[0]
    bits = values(258, [8])
    comp = values(259, [1])[0]
    if any(b != 8 for b in bits):
        raise ValueError(f"unsupported TIFF bit depths {bits} (8 only)")
    if ch not in (1, 3):
        raise ValueError(f"unsupported TIFF samples/pixel {ch}")
    if comp not in (1, 32773):
        raise ValueError(f"unsupported TIFF compression {comp}")
    offsets = values(273)
    counts = values(279)
    rows_per_strip = values(278, [h])[0]
    if offsets is None or counts is None:
        raise ValueError("TIFF missing strip offsets/counts")
    out = bytearray()
    row_bytes = w * ch
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        strip = raw[so : so + sc]
        n_rows = min(rows_per_strip, h - si * rows_per_strip)
        expect = n_rows * row_bytes
        if comp == 32773:
            out += _packbits_decode(strip, expect)
        else:
            if len(strip) < expect:
                raise ValueError("TIFF strip truncated")
            out += strip[:expect]
    if len(out) != h * row_bytes:
        raise ValueError("TIFF pixel data size mismatch")
    return w, h, ch, bytes(out)


def encode_tiff(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    packbits: bool = False,
    big_endian: bool = False,
    rows_per_strip: int = 4,
    orientation: int = 1,
) -> bytes:
    """Spec-valid baseline TIFF fixture encoder: 8-bit gray/RGB, strip
    layout, optional PackBits compression, either byte order; a
    non-upright ``orientation`` writes tag 274 (the fixture side of the
    decode_image normalization)."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    e = ">" if big_endian else "<"
    row_bytes = width * channels
    strips = []
    for r0 in range(0, height, rows_per_strip):
        rows = pixels[r0 * row_bytes : min(r0 + rows_per_strip, height) * row_bytes]
        strips.append(_packbits_encode(rows) if packbits else rows)
    # layout: header(8) + strip data + bits array (if rgb) + IFD
    pos = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(pos)
        pos += len(s)
    bits_off = pos
    if channels == 3:
        pos += 6
    ifd_off = pos
    entries = []

    def entry(tag, typ, cnt, val):
        entries.append(struct.pack(e + "HHI", tag, typ, cnt) + val)

    def short_val(v):
        return struct.pack(e + "H", v) + b"\x00\x00"

    def long_val(v):
        return struct.pack(e + "I", v)

    entry(256, 4, 1, long_val(width))
    entry(257, 4, 1, long_val(height))
    if channels == 3:
        entry(258, 3, 3, long_val(bits_off))
    else:
        entry(258, 3, 1, short_val(8))
    entry(259, 3, 1, short_val(32773 if packbits else 1))
    entry(262, 3, 1, short_val(2 if channels == 3 else 1))
    if orientation != 1:
        entry(274, 3, 1, short_val(orientation))
    if len(strips) == 1:
        entry(273, 4, 1, long_val(strip_offsets[0]))
    else:
        entry(273, 4, len(strips), long_val(ifd_off + 2 + 0))  # patched below
    entry(277, 3, 1, short_val(channels))
    entry(278, 4, 1, long_val(rows_per_strip))
    if len(strips) == 1:
        entry(279, 4, 1, long_val(len(strips[0])))
    else:
        entry(279, 4, len(strips), long_val(0))  # patched below
    entries.sort(key=lambda b: struct.unpack(e + "H", b[:2])[0])
    ifd_size = 2 + 12 * len(entries) + 4
    arrays_off = ifd_off + ifd_size
    # patch multi-strip offset/count arrays to live after the IFD
    if len(strips) > 1:
        so_off = arrays_off
        sc_off = arrays_off + 4 * len(strips)
        for i, b in enumerate(entries):
            tag = struct.unpack(e + "H", b[:2])[0]
            if tag == 273:
                entries[i] = b[:8] + long_val(so_off)
            elif tag == 279:
                entries[i] = b[:8] + long_val(sc_off)
    out = bytearray()
    out += (b"MM\x00*" if big_endian else b"II*\x00") + struct.pack(
        e + "I", ifd_off
    )
    for s in strips:
        out += s
    if channels == 3:
        out += struct.pack(e + "HHH", 8, 8, 8)
    out += struct.pack(e + "H", len(entries))
    for b in entries:
        out += b
    out += struct.pack(e + "I", 0)  # next IFD
    if len(strips) > 1:
        for so in strip_offsets:
            out += struct.pack(e + "I", so)
        for s in strips:
            out += struct.pack(e + "I", len(s))
    return bytes(out)


# -------------------------------------------------------------- Netpbm codec
#
# Binary PGM (P5, 8-bit gray) and PPM (P6, 8-bit RGB): ASCII header
# (magic, whitespace/comments, width height maxval) then raw samples —
# the exchange format of scientific/CV pipelines. Trivial by design;
# included so a corpus of .pgm/.ppm masks/frames decodes like any other
# still container.


def parse_pnm_header(raw: bytes) -> dict | None:
    """P5/P6 header: (width, height, channels) after comment-tolerant
    whitespace tokenization."""
    if len(raw) < 2 or raw[0:1] != b"P" or raw[1:2] not in b"56":
        return None
    ch = 1 if raw[1:2] == b"5" else 3
    toks: list[int] = []
    i = 2
    n = len(raw)
    while i < n and len(toks) < 3:
        c = raw[i]
        if c in b" \t\r\n":
            i += 1
        elif c == ord("#"):
            while i < n and raw[i] not in b"\r\n":
                i += 1
        elif 48 <= c <= 57:
            v = 0
            while i < n and 48 <= raw[i] <= 57:
                v = v * 10 + raw[i] - 48
                i += 1
            toks.append(v)
        else:
            return None
    if len(toks) < 3:
        return None
    w, h, maxval = toks
    if w <= 0 or h <= 0:
        return None
    return {
        "media_kind": "pnm",
        "width": w,
        "height": h,
        "channels": ch,
        "bits_per_sample": 8 if maxval < 256 else 16,
        "_data_off": i + 1,  # single whitespace after maxval
    }


def decode_pnm(raw: bytes):
    """Decode binary PGM/PPM → (width, height, channels, bytes).
    8-bit maxval only (the overwhelmingly common case)."""
    hdr = parse_pnm_header(raw)
    if hdr is None:
        raise ValueError("not a binary PGM/PPM")
    if hdr["bits_per_sample"] != 8:
        raise ValueError("only 8-bit PNM supported")
    w, h, ch = hdr["width"], hdr["height"], hdr["channels"]
    off = hdr["_data_off"]
    need = w * h * ch
    data = raw[off : off + need]
    if len(data) < need:
        raise ValueError("PNM pixel data truncated")
    return w, h, ch, bytes(data)


def encode_pnm(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Binary PGM (channels=1) / PPM (channels=3) encoder."""
    if channels not in (1, 3):
        raise ValueError("channels must be 1 or 3")
    if len(pixels) != width * height * channels:
        raise ValueError("pixel buffer size mismatch")
    magic = b"P5" if channels == 1 else b"P6"
    return magic + f"\n{width} {height}\n255\n".encode() + pixels


IMAGE_KINDS = (
    "png", "jpeg", "gif", "bmp", "tiff", "pnm", "webp", "avif", "heic",
)


def decode_image(raw: bytes):
    """Decode ANY supported still-image container → (width, height,
    channels, pixel bytes): the single dispatch point for
    PNG/JPEG/GIF/BMP/TIFF (probe on magic bytes, then the per-format
    decoder). Raises ValueError for non-image payloads."""
    kind = probe_bytes(raw)["media_kind"]
    # camera/export pipelines store sensor-rotated pixels + an
    # Orientation tag (JPEG APP1, TIFF IFD0, PNG eXIf, WebP EXIF):
    # normalize to the upright view so a rotated capture and its
    # upright re-encode hash as the duplicates they are
    # (perceptual-dedup correctness, not cosmetics)
    if kind == "png":
        out = decode_png(raw)
    elif kind == "jpeg":
        out = decode_jpeg(raw)
    elif kind == "gif":
        return decode_gif(raw)
    elif kind == "bmp":
        return decode_bmp(raw)
    elif kind == "tiff":
        out = decode_tiff(raw)
    elif kind == "pnm":
        return decode_pnm(raw)
    elif kind == "webp":
        # VP8L lossless decodes dependency-free (operators/webp.py);
        # lossy VP8 routes through pyav where importable, refuses
        # naming the hatch otherwise
        from kusto_pre_forge_spark.operators.webp import decode_webp

        out = decode_webp(raw)
    elif kind in ("avif", "heic"):
        # the lossy-WebP playbook: AV1/HEVC intra frames decode through
        # the pyav hatch where importable on THIS executor, refuse
        # naming the hatch otherwise; display transforms come from the
        # container's irot/imir item properties (HEIF carries them
        # there, not in EXIF), normalized through the same
        # apply_exif_orientation the EXIF family uses
        from kusto_pre_forge_spark.operators.multimodal import (
            pyav_available,
        )

        if not pyav_available():
            raise NotImplementedError(
                f"{kind} (AV1/HEVC intra-frame) decodes through the pyav "
                "hatch: `pip install av` on the executors, or transcode "
                "to PNG/lossless upstream"
            )
        out = _pyav_first_frame_rgba(bytes(raw))
        return apply_exif_orientation(*out, heif_display_orientation(raw))
    else:
        raise ValueError(f"not a decodable image container (kind={kind})")
    return apply_exif_orientation(*out, image_exif_orientation(raw))


def _pyav_first_frame_rgba(container: bytes) -> tuple[int, int, int, bytes]:
    """First decoded frame of any pyav-readable container → (w, h, 4,
    RGBA bytes). Deferred import: called only after ``pyav_available``
    said the wheel is present on THIS executor (the decode_webp
    convention)."""
    import io

    import av

    with io.BytesIO(container) as buf, av.open(buf) as c:
        for frame in c.decode(video=0):
            arr = frame.to_ndarray(format="rgba")
            return int(arr.shape[1]), int(arr.shape[0]), 4, arr.tobytes()
    raise ValueError("pyav produced no frames for the payload")


def heif_display_orientation(raw: bytes) -> int:
    """Map HEIF ``irot``/``imir`` item properties to the EXIF
    orientation value :func:`apply_exif_orientation` understands, so an
    irot-rotated AVIF and its upright re-encode hash as duplicates.
    irot counts 90° CCW steps (1→EXIF 8, 2→EXIF 3, 3→EXIF 6); imir
    axis 0 mirrors about the vertical axis (EXIF 2), 1 about the
    horizontal (EXIF 4). A file carrying BOTH maps to the composed
    transverse/transpose orientations (ISO 23008-12 applies rotation
    before mirror in the property order writers emit)."""
    hdr = parse_heif_header(bytes(raw))
    if hdr is None:
        return 1
    irot = hdr.get("_irot", 0)
    imir = hdr.get("_imir")
    if imir is None:
        return {0: 1, 1: 8, 2: 3, 3: 6}[irot]
    # rotate-then-mirror compositions (mirror applied after the
    # rotation): mirror(rot90ccw^k(a)) reduced to the single EXIF code
    if imir == 0:  # vertical-axis mirror (horizontal flip)
        return {0: 2, 1: 7, 2: 4, 3: 5}[irot]
    return {0: 4, 1: 5, 2: 2, 3: 7}[irot]


# ---------------------------------------------------------------- AVI codec
#
# Video-in-AVI: the RIFF container is a chunk walk. Two codecs decode
# for real with zero dependencies — 'MJPG' (every '00dc' chunk is a
# complete baseline JPEG; the format security cameras, capture cards and
# many datasets actually use) and BI_RGB uncompressed DIB ('00db' raw
# bottom-up BGR frames, the capture/intermediate format). Other video
# codecs (H.264 etc.) stay behind the sample_frames(decoder=...) hook.


def parse_avi_header(raw: bytes) -> dict | None:
    """RIFF-AVI main header (avih): width/height, frame count, fps."""
    if len(raw) < 64 or raw[:4] != b"RIFF" or raw[8:12] != b"AVI ":
        return None
    pos = 12
    info = None
    while pos + 8 <= len(raw):
        ctype = raw[pos : pos + 4]
        (csize,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        if ctype == b"LIST" and raw[pos + 8 : pos + 12] == b"hdrl":
            inner = pos + 12
            end = pos + 8 + csize
            while inner + 8 <= min(end, len(raw)):
                ic = raw[inner : inner + 4]
                (isz,) = struct.unpack("<I", raw[inner + 4 : inner + 8])
                if ic == b"avih" and isz >= 40:
                    a = raw[inner + 8 : inner + 8 + isz]
                    usec_pf, _, _, _, total = struct.unpack("<IIIII", a[:20])
                    w, h = struct.unpack("<II", a[32:40])
                    info = {
                        "media_kind": "avi",
                        "width": w,
                        "height": h,
                        "channels": 3,
                        "n_samples": total,  # frames, the WAV convention
                        "duration_s": (
                            total * usec_pf / 1e6 if usec_pf else None
                        ),
                    }
                    return info
                inner += 8 + isz + (isz & 1)
        pos += 8 + csize + (csize & 1)
    return info


def iter_avi_mjpeg_frames(raw: bytes):
    """Yield (frame_index, jpeg_bytes) for every '00dc'/'00db' video
    chunk in the movi list. Raises ValueError if the container is not
    AVI or a video chunk is not JPEG."""
    if parse_avi_header(raw) is None:
        raise ValueError("not an AVI")
    pos = 12
    idx = 0
    while pos + 8 <= len(raw):
        ctype = raw[pos : pos + 4]
        (csize,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        if ctype == b"LIST" and raw[pos + 8 : pos + 12] == b"movi":
            inner = pos + 12
            end = min(pos + 8 + csize, len(raw))
            while inner + 8 <= end:
                ic = raw[inner : inner + 4]
                (isz,) = struct.unpack("<I", raw[inner + 4 : inner + 8])
                if ic in (b"00dc", b"00db"):
                    frame = raw[inner + 8 : inner + 8 + isz]
                    if frame[:2] != b"\xff\xd8":
                        raise ValueError(
                            "AVI video chunk is not MJPEG (only the MJPG "
                            "codec decodes without external libraries)"
                        )
                    yield idx, frame
                    idx += 1
                inner += 8 + isz + (isz & 1)
        pos += 8 + csize + (csize & 1)


def _avi_video_format(raw: bytes):
    """The first 'vids' stream's BITMAPINFOHEADER essentials:
    (compression, bit_count, width, height) — compression is the fourcc
    int (0 = BI_RGB uncompressed DIB, 0x47504A4D = 'MJPG')."""
    pos = 12
    while pos + 8 <= len(raw):
        ctype = raw[pos : pos + 4]
        (csize,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        if ctype == b"LIST" and raw[pos + 8 : pos + 12] == b"hdrl":
            inner = pos + 12
            end = min(pos + 8 + csize, len(raw))
            while inner + 8 <= end:
                ic = raw[inner : inner + 4]
                (isz,) = struct.unpack("<I", raw[inner + 4 : inner + 8])
                if ic == b"LIST" and raw[inner + 8 : inner + 12] == b"strl":
                    sl = inner + 12
                    send = min(inner + 8 + isz, len(raw))
                    is_vids = False
                    while sl + 8 <= send:
                        sc = raw[sl : sl + 4]
                        (ssz,) = struct.unpack("<I", raw[sl + 4 : sl + 8])
                        body = raw[sl + 8 : sl + 8 + ssz]
                        if sc == b"strh":
                            is_vids = body[:4] == b"vids"
                        elif sc == b"strf" and is_vids and ssz >= 40:
                            w, h = struct.unpack("<ii", body[4:12])
                            (bits,) = struct.unpack("<H", body[14:16])
                            (comp,) = struct.unpack("<I", body[16:20])
                            return comp, bits, w, h
                        sl += 8 + ssz + (ssz & 1)
                inner += 8 + isz + (isz & 1)
        pos += 8 + csize + (csize & 1)
    return None


def iter_avi_frames(raw: bytes):
    """Yield ``(frame_index, width, height, channels, pixels)`` for every
    video chunk, DECODED per the stream's declared codec: 'MJPG' chunks
    go through the baseline JPEG decoder; BI_RGB (compression 0, 24-bit)
    chunks are uncompressed DIB frames — bottom-up, 4-byte-aligned BGR
    rows, flipped and swizzled to RGB (the same layout as a 24-bit BMP
    body). Any other codec raises ValueError naming the
    ``sample_frames(decoder=...)`` extension hook. The MJPEG-only
    :func:`iter_avi_mjpeg_frames` remains for callers that want the
    undecoded JPEG bytes."""
    if parse_avi_header(raw) is None:
        raise ValueError("not an AVI")
    fmt = _avi_video_format(raw)
    comp = fmt[0] if fmt is not None else None  # None -> sniff per frame
    if fmt is not None and comp == 0 and fmt[1] != 24:
        raise ValueError(f"unsupported DIB bit depth {fmt[1]} (24 only)")
    pos = 12
    idx = 0
    while pos + 8 <= len(raw):
        ctype = raw[pos : pos + 4]
        (csize,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        if ctype == b"LIST" and raw[pos + 8 : pos + 12] == b"movi":
            inner = pos + 12
            end = min(pos + 8 + csize, len(raw))
            while inner + 8 <= end:
                ic = raw[inner : inner + 4]
                (isz,) = struct.unpack("<I", raw[inner + 4 : inner + 8])
                if ic in (b"00dc", b"00db"):
                    frame = raw[inner + 8 : inner + 8 + isz]
                    # Dispatch on the stream's DECLARED compression first;
                    # content-sniff only when no strf header was found. A
                    # BI_RGB frame whose first two BGR bytes happen to be
                    # FF D8 must not be misrouted to the JPEG decoder.
                    if comp == 0x47504A4D or (
                        fmt is None and frame[:2] == b"\xff\xd8"
                    ):
                        # per-frame EXIF: a camera that stores rotated
                        # MJPEG frames + Orientation tags must sample
                        # upright like the still-image path does
                        w, h, ch, px = apply_exif_orientation(
                            *decode_jpeg(frame),
                            parse_exif_orientation(frame),
                        )
                        yield idx, w, h, ch, px
                    elif comp == 0 and fmt is not None:
                        w, h = fmt[2], abs(fmt[3])
                        top_down = fmt[3] < 0
                        stride = ((w * 3) + 3) & ~3
                        if len(frame) < stride * h:
                            raise ValueError("AVI DIB frame truncated")
                        out = bytearray(w * h * 3)
                        for row in range(h):
                            src_row = row if top_down else h - 1 - row
                            off = src_row * stride
                            o = row * w * 3
                            for x in range(w):
                                i = off + 3 * x
                                out[o + 3 * x : o + 3 * x + 3] = bytes(
                                    (frame[i + 2], frame[i + 1], frame[i])
                                )
                        yield idx, w, h, 3, bytes(out)
                    else:
                        raise ValueError(
                            "AVI video codec is neither MJPG nor BI_RGB "
                            "DIB; pass sample_frames(decoder=...) to plug "
                            "an external codec"
                        )
                    idx += 1
                inner += 8 + isz + (isz & 1)
        pos += 8 + csize + (csize & 1)


def encode_avi_dib(
    width: int, height: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Minimal valid uncompressed-DIB AVI (BI_RGB 24-bit): each RGB frame
    is stored as bottom-up, 4-byte-aligned BGR rows in a '00db' chunk —
    the second real, dependency-free AVI codec next to MJPEG."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    stride = ((width * 3) + 3) & ~3
    pad = b"\x00" * (stride - width * 3)
    dibs = []
    for f in frames:
        if len(f) != width * height * 3:
            raise ValueError("frame pixel buffer size mismatch")
        rows = []
        for y in range(height - 1, -1, -1):  # bottom-up
            row = f[y * width * 3 : (y + 1) * width * 3]
            rows.append(
                bytes(
                    b
                    for x in range(width)
                    for b in (
                        row[3 * x + 2],
                        row[3 * x + 1],
                        row[3 * x],
                    )
                )
                + pad
            )
        dibs.append(b"".join(rows))
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),
        0, 0, 0,
        len(frames),
        0, 1, 0,
        width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"\x00\x00\x00\x00"  # DIB: no fourcc
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0,  # BI_RGB
        stride * height, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00db", f) for f in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_avi_mjpeg(
    width: int, height: int, frames: list[bytes], fps: int = 10
) -> bytes:
    """Minimal valid MJPEG AVI: avih + one 'vids'/'MJPG' stream + movi
    with one '00dc' chunk per JPEG frame. The fixture forge for the real
    video-decode path."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // max(fps, 1),  # usec per frame
        0, 0, 0,
        len(frames),
        0, 1, 0,
        width, height,
        0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), 0, 0, 0, 0)
        + struct.pack("<hhhh", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0x47504A4D,  # 'MJPG'
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


_PROBES = _PROBES + (parse_avi_header, parse_pnm_header)


# ------------------------------------------- compressed-audio probes
# MP3/OGG/FLAC are what real audio corpora ship; their SAMPLES decode
# only through the pyav import-try hatch (multimodal.pyav_decode_audio),
# but the container HEADERS parse here dependency-free so probe_bytes /
# routing / datacards see them (the WebP-tag posture: identified, never
# silently 'unknown').


def parse_flac_header(raw: bytes):
    """fLaC STREAMINFO (the mandatory first metadata block): sample
    rate (20 bits), channels (3 bits + 1), bits-per-sample (5 bits +
    1), total samples (36 bits) — offsets per the FLAC format spec."""
    if raw[:4] != b"fLaC" or len(raw) < 4 + 4 + 34:
        return None
    if raw[4] & 0x7F != 0:  # first block must be STREAMINFO (type 0)
        return None
    si = raw[8 : 8 + 34]
    sample_rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 0x07) + 1
    bps = (((si[12] & 0x01) << 4) | (si[13] >> 4)) + 1
    n_samples = ((si[13] & 0x0F) << 32) | int.from_bytes(si[14:18], "big")
    out = {
        "media_kind": "flac",
        "sample_rate": sample_rate or None,
        "channels": channels,
        "bits_per_sample": bps,
        "n_samples": n_samples or None,
    }
    if sample_rate and n_samples:
        out["duration_s"] = n_samples / sample_rate
    return out


_MP3_RATES = {0: 44100, 1: 48000, 2: 32000}  # MPEG-1; /2 for MPEG-2


def parse_mp3_header(raw: bytes):
    """MPEG audio: an ID3v2 tag or a frame sync (11 set bits). Sample
    rate from the first frame header's version + rate-index bits."""
    pos = 0
    if raw[:3] == b"ID3" and len(raw) >= 10:
        # syncsafe 28-bit tag size
        size = (
            (raw[6] << 21) | (raw[7] << 14) | (raw[8] << 7) | raw[9]
        )
        pos = 10 + size
    if len(raw) < pos + 4:
        return {"media_kind": "mp3"} if pos else None
    b0, b1, b2 = raw[pos], raw[pos + 1], raw[pos + 2]
    if b0 != 0xFF or (b1 & 0xE0) != 0xE0:
        return {"media_kind": "mp3"} if pos else None
    version = (b1 >> 3) & 0x03  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    rate_idx = (b2 >> 2) & 0x03
    rate = _MP3_RATES.get(rate_idx)
    if rate is not None:
        if version == 2:
            rate //= 2
        elif version == 0:
            rate //= 4
    channels_bits = (raw[pos + 3] >> 6) & 0x03 if len(raw) > pos + 3 else 3
    return {
        "media_kind": "mp3",
        "sample_rate": rate,
        "channels": 1 if channels_bits == 3 else 2,
    }


def parse_ogg_header(raw: bytes):
    """OggS capture pattern; a Vorbis identification header in the
    first page carries channels + sample rate at fixed offsets."""
    if raw[:4] != b"OggS":
        return None
    out = {"media_kind": "ogg"}
    i = raw.find(b"\x01vorbis")
    if 0 <= i and len(raw) >= i + 16:
        out["channels"] = raw[i + 11]
        out["sample_rate"] = (
            int.from_bytes(raw[i + 12 : i + 16], "little") or None
        )
    return out


_PROBES = _PROBES + (parse_flac_header, parse_mp3_header, parse_ogg_header)


def parse_webp_probe(raw: bytes):
    """RIFF/WEBP header probe — delegates to operators/webp.py (the
    VP8L codec module); registered last so RIFF 'WAVE'/'AVI ' never
    collide (different FourCCs)."""
    from kusto_pre_forge_spark.operators.webp import parse_webp_header

    return parse_webp_header(raw)


_PROBES = _PROBES + (parse_webp_probe,)


def decodable_image(raw: bytes) -> bool:
    """True when :func:`decode_image` will return pixels for this blob —
    the soft-path guard the hash/feature operators use. A lossy-VP8
    WebP decodes only through the pyav hatch: where the wheel is
    importable on this executor it is decodable (and the image-dedup
    family sees it), otherwise it takes the NULL-row path instead of
    crashing the task."""
    kind = probe_bytes(raw)["media_kind"]
    if kind == "webp":
        from kusto_pre_forge_spark.operators.multimodal import (
            pyav_available,
        )
        from kusto_pre_forge_spark.operators.webp import webp_flavor

        flavor = webp_flavor(raw)
        return flavor == "lossless" or (
            flavor == "lossy" and pyav_available()
        )
    if kind in ("avif", "heic"):
        # truthful per-worker: decodable exactly where the pyav hatch
        # is open (the lossy-WebP contract)
        from kusto_pre_forge_spark.operators.multimodal import (
            pyav_available,
        )

        return pyav_available()
    return kind in IMAGE_KINDS

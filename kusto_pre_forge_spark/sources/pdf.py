"""PDF text-extraction source — the most common document container in a
real training corpus after HTML.

Reference parity: the reference ingests whatever blob bytes land in the
landing container (code/KustoPreForgeLib/BlobSources/ListBlobSource.cs)
and its format dispatch throws for anything beyond txt
(code/KustoPreForgeLib/EtlRun.cs:87-89); this sibling of ``sources/warc.py``
continues closing that gap for the crawl→text pipeline (a crawl yields
PDFs as well as HTML).

Implemented purely from the public spec (ISO 32000-1 / PDF 1.7):

- **xref/trailer walk** (§7.5.4-7.5.5): the ``startxref`` tail scan finds
  the last cross-reference table; subsections of ``offset gen n|f`` lines
  map object numbers to byte offsets; the ``trailer`` dictionary names
  ``/Root`` and chains ``/Prev`` tables (newest entries win).
- **object syntax** (§7.3): dictionaries ``<<…>>``, arrays, names,
  numbers, booleans/null, indirect references ``n g R``, literal strings
  with the full escape table (§7.3.4.2 — ``\\n \\r \\t \\b \\f \\( \\) \\\\``,
  octal ``\\ddd``, line continuations) and hex strings ``<…>`` (§7.3.4.3).
- **streams** (§7.3.8): ``/Length``-framed with an ``endstream`` fallback;
  ``/FlateDecode`` via stdlib ``zlib`` and ``/ASCIIHexDecode`` are
  supported — other filters raise ``NotImplementedError`` naming the
  filter (the house unsupported-input guard; DCT/JBIG2 etc. are image
  filters a text pass never needs).
- **page tree** (§7.7.3): ``/Root → /Pages → /Kids`` recursion (interior
  ``/Pages`` nodes allowed), per-page ``/Contents`` as one stream or an
  array of streams.
- **text extraction** (§9.4): ``BT…ET`` blocks; show-text operators
  ``Tj``, ``'``, ``"``, and ``TJ`` (array form — kerning numbers are
  ignored); the line-advancing operators ``T* Td TD ' "`` start a new
  output line. Strings decode per the §7.9.2.2 text-string convention:
  a UTF-16BE BOM means UTF-16BE, a UTF-8 BOM means UTF-8, otherwise
  byte-per-char (PDFDocEncoding approximated as latin-1).

Spark-first layout (the ``sources/warc.py`` playbook): files parallelize
through the built-in ``binaryFile`` source — one task per blob — and
pages decode in Arrow batches via ``mapInPandas``; the plan is a pure
map stage (scan + project, zero exchanges) at any corpus size. The
parser is a pure function over bytes (``extract_pdf_pages``), so framing
and text assembly are unit-testable without Spark, and a fixture-forging
writer (``pdf_bytes``) emits spec-valid PDFs — real xref offsets, Flate
content streams — so tests and oracles exercise the REAL parser.
"""

from __future__ import annotations

import re
import zlib
from functools import lru_cache as _lru_cache

from pyspark.sql import DataFrame, SparkSession

PDF_DDL = (
    "page_no int, page_text string, n_pages int, n_chars int, "
    "has_images boolean, _kpf_source string"
)

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"


class _Ref:
    __slots__ = ("num", "gen")

    def __init__(self, num: int, gen: int):
        self.num, self.gen = num, gen

    def __repr__(self):  # pragma: no cover - debug aid
        return f"{self.num} {self.gen} R"


class _Name(str):
    """A PDF name token (/Type); subclasses str so dict keys read naturally."""


def _skip_ws(data: bytes, i: int) -> int:
    n = len(data)
    while i < n:
        c = data[i : i + 1]
        if c in b"%":  # comment runs to end of line (§7.2.4)
            j = data.find(b"\n", i)
            i = n if j < 0 else j + 1
        elif c in _WS:
            i += 1
        else:
            break
    return i


def _parse_name(data: bytes, i: int):
    j = i + 1
    n = len(data)
    out = bytearray()
    while j < n and data[j : j + 1] not in _WS and data[j : j + 1] not in _DELIM:
        if data[j : j + 1] == b"#" and j + 2 < n:  # §7.3.5 hex escape
            out.append(int(data[j + 1 : j + 3], 16))
            j += 3
        else:
            out.append(data[j])
            j += 1
    return _Name(out.decode("latin-1")), j


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\f",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_literal_string(data: bytes, i: int):
    """§7.3.4.2: balanced parens, backslash escapes, octal, line folds."""
    out = bytearray()
    depth = 1
    j = i + 1
    n = len(data)
    while j < n and depth:
        c = data[j]
        if c == 0x5C:  # backslash
            j += 1
            if j >= n:
                break
            e = data[j]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                j += 1
            elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                k = j
                while k < min(j + 3, n) and 0x30 <= data[k] <= 0x37:
                    k += 1
                out.append(int(data[j:k], 8) & 0xFF)
                j = k
            elif e in (0x0A, 0x0D):  # line continuation
                j += 1
                if e == 0x0D and j < n and data[j] == 0x0A:
                    j += 1
            else:  # unknown escape: the char stands for itself
                out.append(e)
                j += 1
        elif c == 0x28:  # (
            depth += 1
            out.append(c)
            j += 1
        elif c == 0x29:  # )
            depth -= 1
            if depth:
                out.append(c)
            j += 1
        else:
            out.append(c)
            j += 1
    return bytes(out), j


def _parse_hex_string(data: bytes, i: int):
    j = data.find(b">", i)
    if j < 0:
        j = len(data)
    hx = re.sub(rb"[^0-9A-Fa-f]", b"", data[i + 1 : j])
    if len(hx) % 2:
        hx += b"0"  # §7.3.4.3: odd count → trailing zero
    return bytes.fromhex(hx.decode("ascii")), j + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"\s+(\d+)\s+R(?![A-Za-z0-9])")


def _parse_value(data: bytes, i: int):
    """Recursive-descent parse of one object value at ``i`` →
    (value, next_index). Indirect references collapse to ``_Ref``."""
    i = _skip_ws(data, i)
    c = data[i : i + 1]
    if c == b"/":
        return _parse_name(data, i)
    if data[i : i + 2] == b"<<":
        d: dict = {}
        j = i + 2
        while True:
            j = _skip_ws(data, j)
            if data[j : j + 2] == b">>":
                return d, j + 2
            if j >= len(data):
                return d, j
            key, j = _parse_name(data, j)
            val, j = _parse_value(data, j)
            d[str(key)] = val
    if c == b"<":
        return _parse_hex_string(data, i)
    if c == b"(":
        return _parse_literal_string(data, i)
    if c == b"[":
        arr = []
        j = i + 1
        while True:
            j = _skip_ws(data, j)
            if data[j : j + 1] == b"]":
                return arr, j + 1
            if j >= len(data):
                return arr, j
            val, j = _parse_value(data, j)
            arr.append(val)
    if data[i : i + 4] == b"true":
        return True, i + 4
    if data[i : i + 5] == b"false":
        return False, i + 5
    if data[i : i + 4] == b"null":
        return None, i + 4
    m = _NUM_RE.match(data, i)
    if m:
        tok = m.group()
        if b"." not in tok:
            num = int(tok)
            r = _REF_RE.match(data, m.end())
            if r:  # "n g R" indirect reference
                return _Ref(num, int(r.group(1))), r.end()
            return num, m.end()
        return float(tok), m.end()
    # unknown byte — consume it so the caller can't loop forever
    return None, i + 1


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def _parse_indirect_at(data: bytes, i: int):
    """Parse ``n g obj … endobj`` at offset ``i`` →
    (num, value, stream_bytes_or_None). Streams are framed by /Length
    when it is a direct integer, with an ``endstream`` search fallback
    (covers /Length given as an indirect reference)."""
    m = _OBJ_RE.match(data, _skip_ws(data, i))
    if not m:
        return None
    num = int(m.group(1))
    val, j = _parse_value(data, m.end())
    j = _skip_ws(data, j)
    stream = None
    if data[j : j + 6] == b"stream":
        j += 6
        if data[j : j + 2] == b"\r\n":
            j += 2
        elif data[j : j + 1] == b"\n":
            j += 1
        length = val.get("Length") if isinstance(val, dict) else None
        if isinstance(length, int):
            stream = data[j : j + length]
            tail = _skip_ws(data, j + length)
            if data[tail : tail + 9] != b"endstream":
                length = None  # mis-declared — fall back to the search
        if not isinstance(length, int):
            end = data.find(b"endstream", j)
            if end < 0:
                end = len(data)
            stream = data[j:end].rstrip(b"\r\n")
    return num, val, stream


def _xref_offsets(data: bytes):
    """The §7.5.4 walk: startxref tail scan → xref table(s) → (offsets
    by object number, trailer dict). Returns None when the file has no
    classic xref table (e.g. PDF 1.5 xref streams) or the tail is
    damaged — the caller then falls back to a full object scan."""
    tail = data.rfind(b"startxref")
    if tail < 0:
        return None
    m = re.match(rb"\s*(\d+)", data[tail + 9 : tail + 40])
    if not m:
        return None
    offsets: dict[int, int] = {}
    trailer: dict = {}
    seen = set()
    claimed: set[int] = set()  # newest section wins — INCLUDING free rows
    pos = int(m.group(1))
    while pos not in seen:
        seen.add(pos)
        i = _skip_ws(data, pos)
        if data[i : i + 4] != b"xref":
            return None
        i += 4
        while True:
            i = _skip_ws(data, i)
            sec = re.match(rb"(\d+)\s+(\d+)", data[i : i + 40])
            if not sec:
                break
            start, count = int(sec.group(1)), int(sec.group(2))
            i += sec.end()
            for k in range(count):
                i = _skip_ws(data, i)
                ent = re.match(rb"(\d{10})\s+(\d{5})\s+([nf])", data[i : i + 20])
                if not ent:
                    return None
                # A newer section's 'f' (free) row must SHADOW an older
                # 'n' offset — an object deleted in an incremental
                # update would otherwise be resurrected with stale
                # content (§7.5.4: later updates supersede earlier).
                if start + k not in claimed:
                    claimed.add(start + k)
                    if ent.group(3) == b"n":
                        offsets[start + k] = int(ent.group(1))
                i += ent.end()
        i = _skip_ws(data, i)
        if data[i : i + 7] != b"trailer":
            return None
        tr, _ = _parse_value(data, i + 7)
        if not isinstance(tr, dict):
            return None
        for k, v in tr.items():
            trailer.setdefault(k, v)
        prev = tr.get("Prev")
        if not isinstance(prev, int):
            break
        pos = prev
    return offsets, trailer


def _png_unpredict(data: bytes, columns: int) -> bytes:
    """Reverse the PNG row filters (§7.4.4.4 via RFC 2083) for
    Predictor ≥ 10 streams — xref streams use Colors=1 /
    BitsPerComponent=8, so bytes-per-pixel is 1 and each row is one
    filter-type byte + ``columns`` data bytes."""
    out = bytearray()
    prev = bytearray(columns)
    i, n = 0, len(data)
    while i < n:
        ft = data[i]
        row = bytearray(data[i + 1 : i + 1 + columns])
        i += 1 + columns
        if len(row) < columns:
            row.extend(b"\x00" * (columns - len(row)))
        if ft == 1:  # Sub
            for j in range(1, columns):
                row[j] = (row[j] + row[j - 1]) & 0xFF
        elif ft == 2:  # Up
            for j in range(columns):
                row[j] = (row[j] + prev[j]) & 0xFF
        elif ft == 3:  # Average
            for j in range(columns):
                left = row[j - 1] if j else 0
                row[j] = (row[j] + ((left + prev[j]) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for j in range(columns):
                a = row[j - 1] if j else 0
                b, c = prev[j], (prev[j - 1] if j else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                row[j] = (row[j] + pred) & 0xFF
        out += row
        prev = row
    return bytes(out)


def _apply_predictor(raw: bytes, parms, objects: dict) -> bytes:
    """Apply a /DecodeParms predictor after filter decode (§7.4.4.4):
    1 = none, 2 = TIFF horizontal (bpp 1), ≥10 = PNG row filters."""
    parms = _resolve(objects, parms)
    if not isinstance(parms, dict):
        return raw
    pred = _resolve(objects, parms.get("Predictor", 1))
    if not isinstance(pred, int) or pred <= 1:
        return raw
    columns = _resolve(objects, parms.get("Columns", 1)) or 1
    if pred == 2:
        out = bytearray(raw)
        for r in range(0, len(out) - columns + 1, columns):
            for j in range(1, columns):
                out[r + j] = (out[r + j] + out[r + j - 1]) & 0xFF
        return bytes(out)
    return _png_unpredict(raw, int(columns))


def _xref_stream_load(data: bytes):
    """The §7.5.8 cross-reference STREAM walk (PDF 1.5+ — what most
    modern PDFs write instead of the classic table): parse the indirect
    object at the startxref offset, decode its /W-packed binary rows
    (predictor-aware), and return (offsets by object number, compressed
    {objnum: (objstm_num, index)}, trailer dict from the stream's own
    dictionary). Follows /Prev chains; returns None when the tail
    doesn't frame an XRef stream."""
    tail = data.rfind(b"startxref")
    if tail < 0:
        return None
    m = re.match(rb"\s*(\d+)", data[tail + 9 : tail + 40])
    if not m:
        return None
    offsets: dict[int, int] = {}
    compressed: dict[int, tuple[int, int]] = {}
    trailer: dict = {}
    seen = set()
    claimed: set[int] = set()  # newest section wins — INCLUDING type-0
    pos = int(m.group(1))
    while pos not in seen and 0 <= pos < len(data):
        seen.add(pos)
        parsed = _parse_indirect_at(data, pos)
        if not parsed or not isinstance(parsed[1], dict):
            return None
        _, d, raw = parsed
        if str(d.get("Type", "")) != "XRef" or raw is None:
            return None
        try:
            body = decode_stream((d, raw), {})
        except NotImplementedError:
            return None
        body = _apply_predictor(body, d.get("DecodeParms") or d.get("DP"), {})
        w = d.get("W")
        if not (isinstance(w, list) and len(w) >= 3):
            return None
        w1, w2, w3 = (int(x) for x in w[:3])
        size = int(d.get("Size", 0))
        index = d.get("Index") or [0, size]
        rowlen = w1 + w2 + w3
        rows = [
            body[i : i + rowlen] for i in range(0, len(body) - rowlen + 1, rowlen)
        ]
        ri = 0
        for s in range(0, len(index) - 1, 2):
            start, count = int(index[s]), int(index[s + 1])
            for k in range(count):
                if ri >= len(rows):
                    break
                row = rows[ri]
                ri += 1
                t = int.from_bytes(row[:w1], "big") if w1 else 1
                f2 = int.from_bytes(row[w1 : w1 + w2], "big")
                f3 = int.from_bytes(row[w1 + w2 :], "big")
                num = start + k
                if num in claimed:
                    continue  # newest table wins — type-0 (free) too
                claimed.add(num)
                if t == 1:
                    offsets[num] = f2
                elif t == 2:
                    compressed[num] = (f2, f3)
        for k, v in d.items():
            trailer.setdefault(k, v)
        prev = d.get("Prev")
        if not isinstance(prev, int):
            break
        pos = prev
    return offsets, compressed, trailer


def _explode_objstms(objects: dict) -> None:
    """Unpack every /Type /ObjStm (§7.5.7 object stream — N compressed
    non-stream objects: a 'num offset …' header then the serialized
    values at /First + offset) into the object map, in place."""
    for num in list(objects):
        val, raw = objects[num]
        if not isinstance(val, dict) or str(val.get("Type", "")) != "ObjStm":
            continue
        try:
            body = decode_stream((val, raw), objects)
        except NotImplementedError:
            continue
        first = _resolve(objects, val.get("First"))
        count = _resolve(objects, val.get("N"))
        if not isinstance(first, int) or not isinstance(count, int):
            continue
        header = body[:first].split()
        for k in range(0, min(len(header) - 1, 2 * count - 1), 2):
            try:
                onum, off = int(header[k]), int(header[k + 1])
            except ValueError:
                break
            value, _ = _parse_value(body, first + off)
            objects.setdefault(onum, (value, None))


def _scan_objects(data: bytes):
    """Fallback reconstruction: scan for every ``n g obj`` (what a repair
    tool does for crawl-grade PDFs with broken xref tables)."""
    objects: dict[int, tuple] = {}
    for m in _OBJ_RE.finditer(data):
        parsed = _parse_indirect_at(data, m.start())
        if parsed:
            num, val, stream = parsed
            objects[num] = (val, stream)
    return objects


def load_pdf_objects(data: bytes):
    """(objects: {num: (value, stream|None)}, root_ref_or_None). Walks
    the classic xref TABLE first (§7.5.4), then the xref STREAM
    (§7.5.8 — the PDF 1.5+ layout most modern files write, including
    /Type /ObjStm compressed-object unpacking); a damaged tail falls
    back to the full object scan, which also explodes any object
    streams it finds (scan-reconstruction can't see packed objects
    otherwise)."""
    objects: dict[int, tuple] = {}
    root = None
    xr = _xref_offsets(data)
    if xr:
        offsets, trailer = xr
        root = trailer.get("Root")
        for num, off in offsets.items():
            parsed = _parse_indirect_at(data, off) if 0 <= off < len(data) else None
            if parsed and parsed[0] == num:
                objects[num] = (parsed[1], parsed[2])
            else:
                objects = {}
                break
        if objects:
            _maybe_decrypt(objects, trailer)
    if not objects:
        xs = _xref_stream_load(data)
        if xs:
            offsets, compressed, trailer = xs
            root = trailer.get("Root") or root
            ok = True
            for num, off in offsets.items():
                parsed = (
                    _parse_indirect_at(data, off) if 0 <= off < len(data) else None
                )
                if parsed and parsed[0] == num:
                    objects[num] = (parsed[1], parsed[2])
                else:
                    ok = False
                    break
            if ok:
                # decrypt BEFORE exploding object streams: packed
                # objects are covered by their container's encryption
                _maybe_decrypt(objects, trailer)
            if ok and compressed:
                _explode_objstms(objects)
                # type-2 entries name their container; anything the
                # exploder didn't surface marks the walk as damaged
                ok = all(num in objects for num in compressed)
            if not ok:
                objects = {}
    if not objects:
        objects = _scan_objects(data)
        if _is_encrypted(data):
            # damaged tail on an encrypted file: recover the trailer
            # dict by probe (the _is_encrypted fallbacks) so the scan
            # path decrypts too, or refuse by name
            trailer = None
            for m in re.finditer(rb"trailer", data):
                tr, _ = _parse_value(data, m.end())
                if isinstance(tr, dict) and "Encrypt" in tr:
                    trailer = tr
            if trailer is None:
                for m in re.finditer(rb"/Encrypt", data):
                    start = data.rfind(b"<<", max(0, m.start() - 4096), m.start())
                    if start < 0:
                        continue
                    d, _ = _parse_value(data, start)
                    if isinstance(d, dict) and "Encrypt" in d and "Root" in d:
                        trailer = d
            if trailer is None:
                raise NotImplementedError(
                    "PDF is encrypted and its trailer is unrecoverable — "
                    "cannot derive the decryption key"
                )
            _maybe_decrypt(objects, trailer)
        _explode_objstms(objects)
    return objects, root


def _resolve(objects: dict, val):
    hops = 0
    while isinstance(val, _Ref) and hops < 32:
        val = objects.get(val.num, (None, None))[0]
        hops += 1
    return val


def decode_stream(entry: tuple, objects: dict) -> bytes:
    """Apply a stream's /Filter chain (§7.4). Flate + ASCIIHex are the
    text-relevant filters; anything else is a genuine unsupported input."""
    val, raw = entry
    if raw is None:
        return b""
    filters = _resolve(objects, val.get("Filter")) if isinstance(val, dict) else None
    if filters is None:
        chain = []
    elif isinstance(filters, list):
        chain = [str(_resolve(objects, f)) for f in filters]
    else:
        chain = [str(filters)]
    for f in chain:
        if f == "FlateDecode":
            raw = zlib.decompress(raw)
        elif f == "ASCIIHexDecode":
            hx = re.sub(rb"[^0-9A-Fa-f]", b"", raw.split(b">")[0])
            if len(hx) % 2:
                hx += b"0"
            raw = bytes.fromhex(hx.decode("ascii"))
        else:
            raise NotImplementedError(
                f"PDF stream filter {f!r} is not supported (text "
                "extraction handles FlateDecode/ASCIIHexDecode; image "
                "filters like DCTDecode carry no text)"
            )
    return raw


def decode_pdf_string(b: bytes) -> str:
    """§7.9.2.2 text-string convention: BOM-tagged UTF-16BE or UTF-8,
    else single-byte (PDFDocEncoding ≈ latin-1 for the printable range)."""
    if b[:2] == b"\xfe\xff":
        return b[2:].decode("utf-16-be", "replace")
    if b[:3] == b"\xef\xbb\xbf":
        return b[3:].decode("utf-8", "replace")
    return b.decode("latin-1")


def parse_cmap(data: bytes) -> dict[bytes, str]:
    """Parse a /ToUnicode CMap stream (§9.10.3, built on Adobe CMap
    syntax): ``beginbfchar`` pairs and ``beginbfrange`` ranges (both the
    incrementing-destination and explicit-array forms) → {code bytes:
    unicode string}. Subset-embedded fonts store show-text as GLYPH
    CODES; without this map their text is unrecoverable garbage — the
    single most common real-world PDF extraction gap."""
    out: dict[bytes, str] = {}

    def hexbytes(tok: bytes) -> bytes:
        hx = re.sub(rb"[^0-9A-Fa-f]", b"", tok)
        if len(hx) % 2:
            hx += b"0"
        return bytes.fromhex(hx.decode("ascii"))

    def dst_str(b: bytes) -> str:
        return b.decode("utf-16-be", "replace") if b else ""

    for m in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.DOTALL):
        toks = re.findall(rb"<([0-9A-Fa-f\s]*)>", m.group(1))
        for i in range(0, len(toks) - 1, 2):
            out[hexbytes(toks[i])] = dst_str(hexbytes(toks[i + 1]))
    for m in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.DOTALL):
        body = m.group(1)
        # explicit-array form: <lo> <hi> [<d1> <d2> ...]
        pos = 0
        triple = re.compile(
            rb"<([0-9A-Fa-f\s]*)>\s*<([0-9A-Fa-f\s]*)>\s*"
            rb"(\[(?:\s*<[0-9A-Fa-f\s]*>)*\s*\]|<[0-9A-Fa-f\s]*>)"
        )
        for t in triple.finditer(body):
            lo, hi = hexbytes(t.group(1)), hexbytes(t.group(2))
            width = len(lo)
            lo_i = int.from_bytes(lo, "big")
            hi_i = int.from_bytes(hi, "big") if hi else lo_i
            dst = t.group(3)
            if dst.startswith(b"["):
                dsts = re.findall(rb"<([0-9A-Fa-f\s]*)>", dst)
                for k, d in enumerate(dsts):
                    if lo_i + k > hi_i:
                        break
                    out[(lo_i + k).to_bytes(width, "big")] = dst_str(
                        hexbytes(d)
                    )
            else:
                base = hexbytes(dst)
                if len(base) > 2:
                    # Non-BMP destination (UTF-16BE surrogate pair):
                    # increment the CODEPOINT, not the raw integer — a
                    # raw +k crosses surrogate boundaries (0xDFFF→0xE000
                    # in the low half) and lands on wrong codepoints.
                    base_cp = ord(dst_str(base)[:1] or "\x00") if (
                        len(dst_str(base)) == 1
                    ) else None
                    for k in range(hi_i - lo_i + 1):
                        if base_cp is not None:
                            out[(lo_i + k).to_bytes(width, "big")] = chr(
                                base_cp + k
                            )
                        else:  # multi-char destination: spec says only
                            # the LAST code unit increments (§CMap);
                            # keep prefix, bump final codepoint
                            s = dst_str(base)
                            out[(lo_i + k).to_bytes(width, "big")] = (
                                s[:-1] + chr(ord(s[-1]) + k) if s else ""
                            )
                else:
                    base_i = int.from_bytes(base, "big") if base else 0
                    for k in range(hi_i - lo_i + 1):
                        out[(lo_i + k).to_bytes(width, "big")] = dst_str(
                            (base_i + k).to_bytes(max(len(base), 2), "big")
                        )
    return out


def _decode_with_cmap(b: bytes, cmap: dict[bytes, str]) -> str:
    """Decode show-text bytes through a ToUnicode CMap: greedy
    longest-code-first over the map's code widths; bytes outside the
    map fall back to latin-1 (what a viewer shows for unmapped glyphs
    is undefined — surfacing the raw byte beats dropping it)."""
    widths = sorted({len(k) for k in cmap}, reverse=True) or [1]
    out = []
    i, n = 0, len(b)
    while i < n:
        for w in widths:
            piece = b[i : i + w]
            if len(piece) == w and piece in cmap:
                out.append(cmap[piece])
                i += w
                break
        else:
            out.append(b[i : i + 1].decode("latin-1"))
            i += 1
    return "".join(out)


# --------------------------------------------- simple-font /Encoding
#
# Pre-CID PDFs (the dominant pre-2005 layout) carry Type1/TrueType
# fonts whose show-text bytes decode through a NAMED base encoding
# (§D.2: Standard/WinAnsi/MacRoman) optionally patched by an
# /Encoding dict's /Differences array of glyph NAMES. Without this
# table — and without a /ToUnicode CMap — raw byte decode silently
# mis-extracts every accented/symbol character. Glyph names resolve
# through the Adobe Glyph List convention (public: the AGL
# specification); the subset below covers the names the three base
# encodings and common /Differences arrays actually use, plus the
# algorithmic uniXXXX/uXXXXXX forms.

_AGL = {
    # digits and basic punctuation
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    # Latin-1 supplement
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "currency": "¤", "yen": "¥", "brokenbar": "¦",
    "section": "§", "dieresis": "¨", "copyright": "©",
    "ordfeminine": "ª", "guillemotleft": "«",
    "logicalnot": "¬", "registered": "®", "macron": "¯",
    "degree": "°", "plusminus": "±", "acute": "´",
    "mu": "µ", "paragraph": "¶", "periodcentered": "·",
    "cedilla": "¸", "ordmasculine": "º",
    "guillemotright": "»", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾",
    "questiondown": "¿", "multiply": "×", "divide": "÷",
    # accented capitals
    "Agrave": "À", "Aacute": "Á", "Acircumflex": "Â",
    "Atilde": "Ã", "Adieresis": "Ä", "Aring": "Å",
    "AE": "Æ", "Ccedilla": "Ç", "Egrave": "È",
    "Eacute": "É", "Ecircumflex": "Ê", "Edieresis": "Ë",
    "Igrave": "Ì", "Iacute": "Í", "Icircumflex": "Î",
    "Idieresis": "Ï", "Eth": "Ð", "Ntilde": "Ñ",
    "Ograve": "Ò", "Oacute": "Ó", "Ocircumflex": "Ô",
    "Otilde": "Õ", "Odieresis": "Ö", "Oslash": "Ø",
    "Ugrave": "Ù", "Uacute": "Ú", "Ucircumflex": "Û",
    "Udieresis": "Ü", "Yacute": "Ý", "Thorn": "Þ",
    # accented lowercase
    "germandbls": "ß", "agrave": "à", "aacute": "á",
    "acircumflex": "â", "atilde": "ã", "adieresis": "ä",
    "aring": "å", "ae": "æ", "ccedilla": "ç",
    "egrave": "è", "eacute": "é", "ecircumflex": "ê",
    "edieresis": "ë", "igrave": "ì", "iacute": "í",
    "icircumflex": "î", "idieresis": "ï", "eth": "ð",
    "ntilde": "ñ", "ograve": "ò", "oacute": "ó",
    "ocircumflex": "ô", "otilde": "õ", "odieresis": "ö",
    "oslash": "ø", "ugrave": "ù", "uacute": "ú",
    "ucircumflex": "û", "udieresis": "ü", "yacute": "ý",
    "thorn": "þ", "ydieresis": "ÿ",
    # central European + extended Latin the Win/Mac sets reach
    "Scaron": "Š", "scaron": "š", "Zcaron": "Ž",
    "zcaron": "ž", "OE": "Œ", "oe": "œ",
    "Ydieresis": "Ÿ", "Lslash": "Ł", "lslash": "ł",
    "dotlessi": "ı", "florin": "ƒ",
    # typography
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "dagger": "†", "daggerdbl": "‡", "bullet": "•",
    "ellipsis": "…", "perthousand": "‰",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "fraction": "⁄", "endash": "–", "emdash": "—",
    "trademark": "™", "minus": "−", "Euro": "€",
    "fi": "ﬁ", "fl": "ﬂ",
    # spacing accents
    "circumflex": "ˆ", "caron": "ˇ", "breve": "˘",
    "dotaccent": "˙", "ring": "˚", "ogonek": "˛",
    "tilde": "˜", "hungarumlaut": "˝",
}

# StandardEncoding's non-ASCII half (PDF spec Appendix D.2, octal
# codes) — no Python codec exists for it, unlike WinAnsi/MacRoman
_STD_HIGH = {
    0o241: "exclamdown", 0o242: "cent", 0o243: "sterling",
    0o244: "fraction", 0o245: "yen", 0o246: "florin", 0o247: "section",
    0o250: "currency", 0o251: "quotesingle", 0o252: "quotedblleft",
    0o253: "guillemotleft", 0o254: "guilsinglleft",
    0o255: "guilsinglright", 0o256: "fi", 0o257: "fl",
    0o261: "endash", 0o262: "dagger", 0o263: "daggerdbl",
    0o264: "periodcentered", 0o266: "paragraph", 0o267: "bullet",
    0o270: "quotesinglbase", 0o271: "quotedblbase",
    0o272: "quotedblright", 0o273: "guillemotright", 0o274: "ellipsis",
    0o275: "perthousand", 0o277: "questiondown", 0o301: "grave",
    0o302: "acute", 0o303: "circumflex", 0o304: "tilde",
    0o305: "macron", 0o306: "breve", 0o307: "dotaccent",
    0o310: "dieresis", 0o312: "ring", 0o313: "cedilla",
    0o315: "hungarumlaut", 0o316: "ogonek", 0o317: "caron",
    0o320: "emdash", 0o341: "AE", 0o343: "ordfeminine",
    0o350: "Lslash", 0o351: "Oslash", 0o352: "OE",
    0o353: "ordmasculine", 0o361: "ae", 0o365: "dotlessi",
    0o370: "lslash", 0o371: "oslash", 0o372: "oe",
    0o373: "germandbls",
}


def glyph_name_to_char(name: str) -> str | None:
    """AGL-convention glyph name → unicode: the explicit subset table,
    single-character names as themselves, and the algorithmic
    uniXXXX / uXXXX(XX) forms. None for unresolvable names (gNN/cidNN
    subset-private glyphs) — the caller keeps the base-encoding byte."""
    got = _AGL.get(name)
    if got is not None:
        return got
    if len(name) == 1:
        return name
    m = re.fullmatch(r"uni([0-9A-Fa-f]{4})", name)
    if m:
        return chr(int(m.group(1), 16))
    m = re.fullmatch(r"u([0-9A-Fa-f]{4,6})", name)
    if m:
        cp = int(m.group(1), 16)
        if cp <= 0x10FFFF:
            return chr(cp)
    return None


def _base_encoding_table(name: str | None) -> dict[bytes, str]:
    """code byte → unicode for one of the §D.2 base encodings.
    WinAnsi is cp1252 and MacRoman is mac_roman (both stdlib codecs,
    byte-exact for the defined codes); Standard — also the fallback
    when no /BaseEncoding is named — is ASCII with the Appendix D.2
    high half and its two low-range divergences (0x27 → quoteright,
    0x60 → quoteleft)."""
    table: dict[bytes, str] = {}
    codec = {
        "WinAnsiEncoding": "cp1252",
        "MacRomanEncoding": "mac_roman",
    }.get(name or "")
    if codec is not None:
        for c in range(256):
            try:
                table[bytes([c])] = bytes([c]).decode(codec)
            except UnicodeDecodeError:
                pass  # cp1252's five undefined codes
        return table
    for c in range(0x20, 0x7F):
        table[bytes([c])] = chr(c)
    table[b"'"] = "’"
    table[b"`"] = "‘"
    for code, gname in _STD_HIGH.items():
        ch = glyph_name_to_char(gname)
        if ch is not None:
            table[bytes([code])] = ch
    return table


def simple_font_encoding_map(font: dict, objects: dict) -> dict | None:
    """{code byte: unicode} for a simple (Type1/TrueType/Type3) font's
    /Encoding — base-encoding name or dict with /BaseEncoding +
    /Differences (§9.6.6) — or None when the font declares no
    /Encoding (its built-in encoding applies; raw byte decode is the
    documented fallback) or is a composite font (CID text decodes only
    through /ToUnicode). The result plugs into the same
    ``_decode_with_cmap`` path ToUnicode CMaps use (all codes 1 byte
    wide)."""
    subtype = str(font.get("Subtype", ""))
    if subtype not in ("Type1", "TrueType", "Type3", "MMType1"):
        return None
    enc = _resolve(objects, font.get("Encoding"))
    if isinstance(enc, _Name):
        return _base_encoding_table(str(enc))
    if not isinstance(enc, dict):
        return None
    base = enc.get("BaseEncoding")
    table = _base_encoding_table(str(base) if base is not None else None)
    diffs = _resolve(objects, enc.get("Differences"))
    if isinstance(diffs, list):
        code = 0
        for item in diffs:
            if isinstance(item, _Name):
                ch = glyph_name_to_char(str(item))
                if ch is not None and 0 <= code <= 255:
                    table[bytes([code])] = ch
                code += 1
            else:
                try:
                    code = int(float(item))
                except (TypeError, ValueError):
                    pass
    return table


_TOKEN_RE = re.compile(rb"[^\s()<>\[\]{}/%]+")
_NEWLINE_OPS = {b"T*", b"Td", b"TD", b"'", b'"'}
_SHOW_OPS = {b"Tj", b"'", b'"'}


def content_stream_text(
    content: bytes, font_cmaps=None, tj_space_threshold: float = -180.0
) -> str:
    """Extract the show-text stream of one page's content (§9.4):
    operator-driven, newline on the line-advancing operators.
    ``font_cmaps`` maps font resource names (the ``Tf`` operand, e.g.
    'F1') to ToUnicode CMaps — when the CURRENT font has one, show-text
    bytes decode through it (subset fonts); otherwise the §7.9.2.2 BOM
    heuristic applies. TJ kerning numbers are in thousandths of an em
    (§9.4.3); writers often encode INTER-WORD GAPS as a large negative
    adjustment instead of a space glyph, so adjustments below
    ``tj_space_threshold`` (≈0.18 em) emit one space — smaller tweaks
    (typographic kerning) are ignored. Output lines join with ``\\n``."""
    font_cmaps = font_cmaps or {}
    cmap: dict | None = None
    lines: list[str] = []
    cur: list[str] = []
    stack: list = []
    in_text = False
    i, n = 0, len(content)

    def decode(b: bytes) -> str:
        if cmap:
            return _decode_with_cmap(b, cmap)
        return decode_pdf_string(b)

    def newline():
        lines.append("".join(cur))
        cur.clear()

    while i < n:
        i = _skip_ws(content, i)
        if i >= n:
            break
        c = content[i : i + 1]
        if c in b"(<[/" and not (c == b"<" and content[i : i + 2] == b"<<"):
            val, i = _parse_value(content, i)
            stack.append(val)
            continue
        if content[i : i + 2] == b"<<":
            val, i = _parse_value(content, i)
            stack.append(val)
            continue
        m = _NUM_RE.match(content, i)
        if m:
            stack.append(m.group())
            i = m.end()
            continue
        t = _TOKEN_RE.match(content, i)
        if not t:
            i += 1
            continue
        op = t.group()
        i = t.end()
        if op == b"BT":
            in_text = True
        elif op == b"Tf":
            name = next(
                (v for v in reversed(stack) if isinstance(v, _Name)), None
            )
            cmap = font_cmaps.get(str(name)) if name is not None else None
        elif op == b"ET":
            in_text = False
        elif in_text:
            if op in _NEWLINE_OPS and (lines or cur):
                newline()
            if op in _SHOW_OPS:
                s = next(
                    (v for v in reversed(stack) if isinstance(v, bytes)), b""
                )
                cur.append(decode(s))
            elif op == b"TJ":
                arr = next(
                    (v for v in reversed(stack) if isinstance(v, list)), []
                )
                parts = []
                for e in arr:
                    if isinstance(e, bytes):
                        parts.append(decode(e))
                    elif (
                        isinstance(e, (int, float))
                        and e < tj_space_threshold
                    ):
                        parts.append(" ")
                cur.append("".join(parts))
        stack.clear()  # operands are postfix — consumed by their operator
    if cur or lines:
        newline()
    return "\n".join(lines)


def _is_encrypted(data: bytes) -> bool:
    """True when a trailer (classic or xref-stream) carries /Encrypt.
    Cheap tail probe: both trailer forms live near the file end, and a
    false negative just means the garbage-looking output a legacy parser
    would produce anyway; a false positive requires the literal key in
    the last trailer dict, where it only legitimately appears."""
    if b"/Encrypt" not in data:
        return False
    xr = _xref_offsets(data)
    if xr:
        return "Encrypt" in xr[1]
    xs = _xref_stream_load(data)
    if xs:
        return "Encrypt" in xs[2]
    # Both xref walks failed (damaged tail). A bare substring probe
    # would silently drop a decryptable document whose tail merely
    # CONTAINS the token (comment, stream bytes) — require /Encrypt
    # inside a parsed trailer-like dict instead: either a literal
    # ``trailer << … /Encrypt … >>`` or an XRef-stream dict carrying
    # both /Root and /Encrypt.
    for m in re.finditer(rb"trailer", data):
        tr, _ = _parse_value(data, m.end())
        if isinstance(tr, dict) and "Encrypt" in tr:
            return True
    for m in re.finditer(rb"/Encrypt", data):
        start = data.rfind(b"<<", max(0, m.start() - 4096), m.start())
        if start < 0:
            continue
        d, _ = _parse_value(data, start)
        if isinstance(d, dict) and "Encrypt" in d and "Root" in d:
            return True
    return False


# ------------------------------------------- standard security handler
# ISO 32000-1 §7.6.3: a large share of real-world PDFs are encrypted
# with an OWNER password only (print/copy restrictions) and a BLANK
# user password — legally and technically openable by any reader. The
# RC4 paths (V 1/2, R 2/3, and V 4 crypt filters with /CFM /V2) are
# ~60 lines of stdlib arithmetic; AES-128 (/CFM /AESV2, the Acrobat-7+
# default) rides the pure-stdlib FIPS-197 core below; and the V5
# AES-256 handler (R5/AESV3 ExtensionLevel 3 and R6/PDF 2.0, the
# Acrobat-X+ default) derives via SHA-256 / Algorithm 2.B and unwraps
# the file key from /UE-/OE — all of those documents extract instead
# of dropping. Real (non-blank) passwords and non-Standard (PKI)
# handlers refuse loudly by name.

_PW_PAD = bytes(
    [
        0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41,
        0x64, 0x00, 0x4E, 0x56, 0xFF, 0xFA, 0x01, 0x08,
        0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
        0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A,
    ]
)


# Native cipher kernels (r15, guide §4.2): RC4/AES are bit-exact
# specifications, so OpenSSL (via the public `cryptography` package)
# produces byte-identical output to the pure-Python implementations
# below at a fraction of the per-block cost — the decrypt pipeline's
# map stage is pure cipher arithmetic, and the R6 hash-2.B chain runs
# tens of thousands of AES blocks per (uncached) derivation. The pure
# forms stay as the import-free fallback AND as the reference the
# FIPS-197 / RC4 vector tests pin; every call site dispatches here.
try:  # pragma: no cover - exercised wherever cryptography is installed
    from cryptography.hazmat.primitives.ciphers import (
        Cipher as _NCipher,
    )
    from cryptography.hazmat.primitives.ciphers import (
        algorithms as _nalgorithms,
    )
    from cryptography.hazmat.primitives.ciphers import modes as _nmodes

    try:  # ARC4 moved to the decrepit namespace in cryptography >= 43
        from cryptography.hazmat.decrepit.ciphers.algorithms import (
            ARC4 as _NARC4,
        )
    except ImportError:  # pragma: no cover
        from cryptography.hazmat.primitives.ciphers.algorithms import (
            ARC4 as _NARC4,
        )

    _HAVE_NATIVE_CRYPTO = True
except Exception:  # pragma: no cover - pure-Python fallback
    _HAVE_NATIVE_CRYPTO = False


def _native_aes_cbc(key: bytes, iv: bytes, data: bytes, decrypt: bool) -> bytes:
    c = _NCipher(_nalgorithms.AES(key), _nmodes.CBC(iv))
    op = c.decryptor() if decrypt else c.encryptor()
    return op.update(data) + op.finalize()


def _rc4(key: bytes, data: bytes) -> bytes:
    """RC4 stream cipher (the §7.6.2 'RC4 function'). Dispatches to the
    native kernel when available and the key length is one OpenSSL
    accepts (PDF keys are md5-derived 5/10/16 bytes — all accepted;
    the known-vector tests use shorter ones → pure path)."""
    if _HAVE_NATIVE_CRYPTO and len(key) in (5, 7, 8, 10, 16, 20, 24, 32):
        enc = _NCipher(_NARC4(key), mode=None).encryptor()
        return enc.update(data) + enc.finalize()
    return _rc4_py(key, data)


def _rc4_py(key: bytes, data: bytes) -> bytes:
    """Pure-stdlib RC4 — fallback + the reference the vector tests pin."""
    S = list(range(256))
    j = 0
    for i in range(256):
        j = (j + S[i] + key[i % len(key)]) & 0xFF
        S[i], S[j] = S[j], S[i]
    out = bytearray(len(data))
    i = j = 0
    for k, b in enumerate(data):
        i = (i + 1) & 0xFF
        j = (j + S[i]) & 0xFF
        S[i], S[j] = S[j], S[i]
        out[k] = b ^ S[(S[i] + S[j]) & 0xFF]
    return bytes(out)


# AES-128 (FIPS-197) — pure stdlib, decrypt + encrypt (the encryptor
# exists for the fixture forge; the cipher core is pinned against the
# FIPS-197 Appendix C.1 vector in tests). PDF's /CFM /AESV2 is
# AES-128-CBC with a per-object salted key (ISO 32000 §7.6.2) — the
# Acrobat 7+ default, so a large share of encrypted PDFs in the wild.

_AES_SBOX = bytes.fromhex(
    "637c777bf26b6fc53001672bfed7ab76ca82c97dfa5947f0add4a2af9ca472c0"
    "b7fd9326363ff7cc34a5e5f171d8311504c723c31896059a071280e2eb27b275"
    "09832c1a1b6e5aa0523bd6b329e32f8453d100ed20fcb15b6acbbe394a4c58cf"
    "d0efaafb434d338545f9027f503c9fa851a3408f929d38f5bcb6da2110fff3d2"
    "cd0c13ec5f974417c4a77e3d645d197360814fdc222a908846eeb814de5e0bdb"
    "e0323a0a4906245cc2d3ac629195e479e7c8376d8dd54ea96c56f4ea657aae08"
    "ba78252e1ca6b4c6e8dd741f4bbd8b8a703eb5664803f60e613557b986c11d9e"
    "e1f8981169d98e949b1e87e9ce5528df8ca1890dbfe6426841992d0fb054bb16"
)
_AES_INV_SBOX = bytes(256)
_AES_INV_SBOX = bytearray(256)
for _i, _v in enumerate(_AES_SBOX):
    _AES_INV_SBOX[_v] = _i
_AES_INV_SBOX = bytes(_AES_INV_SBOX)
_AES_RCON = (0x01, 0x02, 0x04, 0x08, 0x10, 0x20, 0x40, 0x80, 0x1B, 0x36)


def _xtime(a: int) -> int:
    a <<= 1
    return (a ^ 0x1B) & 0xFF if a & 0x100 else a


def _gmul(a: int, b: int) -> int:
    p = 0
    for _ in range(8):
        if b & 1:
            p ^= a
        b >>= 1
        a = _xtime(a)
    return p


# precomputed GF(2^8) multiplication tables for the MixColumns
# constants — the per-byte bit loop would dominate per-block time
_GM = {
    k: bytes(_gmul(x, k) for x in range(256))
    for k in (2, 3, 9, 11, 13, 14)
}


@_lru_cache(maxsize=64)
def _aes_expand_key(key: bytes) -> tuple[bytes, ...]:
    """FIPS-197 §5.2 key schedule — AES-128 (Nk=4, 10 rounds) and
    AES-256 (Nk=8, 14 rounds, with the extra SubWord at i≡4 mod Nk —
    the V5 PDF handler's key size). Both pinned on Appendix C vectors
    in tests. Cached: every object in a document (and every document
    sharing a forged file key) reuses one schedule instead of
    re-expanding per CBC call."""
    nk = len(key) // 4
    nr = {4: 10, 8: 14}[nk]
    words = [key[4 * i : 4 * i + 4] for i in range(nk)]
    i = nk
    while len(words) < 4 * (nr + 1):
        t = words[-1]
        if i % nk == 0:
            t = bytes(_AES_SBOX[t[(j + 1) % 4]] for j in range(4))
            t = bytes([t[0] ^ _AES_RCON[i // nk - 1]]) + t[1:]
        elif nk == 8 and i % nk == 4:
            t = bytes(_AES_SBOX[b] for b in t)
        words.append(bytes(x ^ y for x, y in zip(words[-nk], t)))
        i += 1
    return tuple(b"".join(words[4 * r : 4 * r + 4]) for r in range(nr + 1))


# 32-bit T-tables (Te0..Te3): each round becomes 4 lookups + 4 XORs
# per column instead of byte-wise SubBytes/ShiftRows/MixColumns — the
# R6 hash-2.B chain runs tens of thousands of blocks per derivation,
# so per-block Python cost is the whole game.
_TE0 = [0] * 256
_TE1 = [0] * 256
_TE2 = [0] * 256
_TE3 = [0] * 256
for _x in range(256):
    _s = _AES_SBOX[_x]
    _t = (_gmul(_s, 2) << 24) | (_s << 16) | (_s << 8) | _gmul(_s, 3)
    _TE0[_x] = _t
    _TE1[_x] = ((_t >> 8) | ((_t & 0xFF) << 24)) & 0xFFFFFFFF
    _TE2[_x] = ((_t >> 16) | ((_t & 0xFFFF) << 16)) & 0xFFFFFFFF
    _TE3[_x] = ((_t >> 24) | ((_t & 0xFFFFFF) << 8)) & 0xFFFFFFFF
del _x, _s, _t

# inverse T-tables (Td0..Td3) for the FIPS-197 §5.3.5 EQUIVALENT INVERSE
# CIPHER: decryption becomes the same 4-lookup/4-XOR round as encryption
# (the byte-wise InvShiftRows/InvSubBytes/InvMixColumns loop was ~10× the
# per-block cost and dominated pipeline_pdf_decrypt's map stage).
_TD0 = [0] * 256
_TD1 = [0] * 256
_TD2 = [0] * 256
_TD3 = [0] * 256
for _x in range(256):
    _s = _AES_INV_SBOX[_x]
    _t = (
        (_gmul(_s, 14) << 24)
        | (_gmul(_s, 9) << 16)
        | (_gmul(_s, 13) << 8)
        | _gmul(_s, 11)
    )
    _TD0[_x] = _t
    _TD1[_x] = ((_t >> 8) | ((_t & 0xFF) << 24)) & 0xFFFFFFFF
    _TD2[_x] = ((_t >> 16) | ((_t & 0xFFFF) << 16)) & 0xFFFFFFFF
    _TD3[_x] = ((_t >> 24) | ((_t & 0xFFFFFF) << 8)) & 0xFFFFFFFF
del _x, _s, _t


def _rk_words(rk: list[bytes]) -> list[int]:
    return [
        int.from_bytes(r[4 * c : 4 * c + 4], "big")
        for r in rk
        for c in range(4)
    ]


def _aes_encrypt_block(block: bytes, rk: list[bytes]) -> bytes:
    return _aes_encrypt_block_w(block, _rk_words(rk), len(rk) - 1)


def _aes_encrypt_block_w(block: bytes, w: list[int], nr: int) -> bytes:
    c0 = int.from_bytes(block[0:4], "big") ^ w[0]
    c1 = int.from_bytes(block[4:8], "big") ^ w[1]
    c2 = int.from_bytes(block[8:12], "big") ^ w[2]
    c3 = int.from_bytes(block[12:16], "big") ^ w[3]
    t0, t1, t2, t3 = _TE0, _TE1, _TE2, _TE3
    k = 4
    for _ in range(nr - 1):
        n0 = (
            t0[c0 >> 24]
            ^ t1[(c1 >> 16) & 255]
            ^ t2[(c2 >> 8) & 255]
            ^ t3[c3 & 255]
            ^ w[k]
        )
        n1 = (
            t0[c1 >> 24]
            ^ t1[(c2 >> 16) & 255]
            ^ t2[(c3 >> 8) & 255]
            ^ t3[c0 & 255]
            ^ w[k + 1]
        )
        n2 = (
            t0[c2 >> 24]
            ^ t1[(c3 >> 16) & 255]
            ^ t2[(c0 >> 8) & 255]
            ^ t3[c1 & 255]
            ^ w[k + 2]
        )
        n3 = (
            t0[c3 >> 24]
            ^ t1[(c0 >> 16) & 255]
            ^ t2[(c1 >> 8) & 255]
            ^ t3[c2 & 255]
            ^ w[k + 3]
        )
        c0, c1, c2, c3 = n0, n1, n2, n3
        k += 4
    sb = _AES_SBOX
    n0 = (
        (sb[c0 >> 24] << 24)
        | (sb[(c1 >> 16) & 255] << 16)
        | (sb[(c2 >> 8) & 255] << 8)
        | sb[c3 & 255]
    ) ^ w[k]
    n1 = (
        (sb[c1 >> 24] << 24)
        | (sb[(c2 >> 16) & 255] << 16)
        | (sb[(c3 >> 8) & 255] << 8)
        | sb[c0 & 255]
    ) ^ w[k + 1]
    n2 = (
        (sb[c2 >> 24] << 24)
        | (sb[(c3 >> 16) & 255] << 16)
        | (sb[(c0 >> 8) & 255] << 8)
        | sb[c1 & 255]
    ) ^ w[k + 2]
    n3 = (
        (sb[c3 >> 24] << 24)
        | (sb[(c0 >> 16) & 255] << 16)
        | (sb[(c1 >> 8) & 255] << 8)
        | sb[c2 & 255]
    ) ^ w[k + 3]
    return (
        n0.to_bytes(4, "big")
        + n1.to_bytes(4, "big")
        + n2.to_bytes(4, "big")
        + n3.to_bytes(4, "big")
    )


@_lru_cache(maxsize=64)
def _aes_dec_schedule(rk: tuple[bytes, ...]) -> tuple[tuple[int, ...], int]:
    """Decryption round keys for the equivalent inverse cipher
    (§5.3.5): the encryption schedule reversed, with InvMixColumns
    applied to the inner rounds — computed via the Td∘SBox identity
    (Td0[SBox[x]] is InvMixColumns of column (x,0,0,0)). Cached per
    schedule: one derivation per file key per worker."""
    w = _rk_words(list(rk))
    nr = len(rk) - 1
    dw: list[int] = []
    for r in range(nr, -1, -1):
        for c in range(4):
            word = w[4 * r + c]
            if 0 < r < nr:
                word = (
                    _TD0[_AES_SBOX[word >> 24]]
                    ^ _TD1[_AES_SBOX[(word >> 16) & 255]]
                    ^ _TD2[_AES_SBOX[(word >> 8) & 255]]
                    ^ _TD3[_AES_SBOX[word & 255]]
                )
            dw.append(word)
    return tuple(dw), nr


def _aes_decrypt_block(block: bytes, rk: list[bytes]) -> bytes:
    w, nr = _aes_dec_schedule(tuple(rk))
    c0 = int.from_bytes(block[0:4], "big") ^ w[0]
    c1 = int.from_bytes(block[4:8], "big") ^ w[1]
    c2 = int.from_bytes(block[8:12], "big") ^ w[2]
    c3 = int.from_bytes(block[12:16], "big") ^ w[3]
    t0, t1, t2, t3 = _TD0, _TD1, _TD2, _TD3
    k = 4
    for _ in range(nr - 1):
        n0 = (
            t0[c0 >> 24]
            ^ t1[(c3 >> 16) & 255]
            ^ t2[(c2 >> 8) & 255]
            ^ t3[c1 & 255]
            ^ w[k]
        )
        n1 = (
            t0[c1 >> 24]
            ^ t1[(c0 >> 16) & 255]
            ^ t2[(c3 >> 8) & 255]
            ^ t3[c2 & 255]
            ^ w[k + 1]
        )
        n2 = (
            t0[c2 >> 24]
            ^ t1[(c1 >> 16) & 255]
            ^ t2[(c0 >> 8) & 255]
            ^ t3[c3 & 255]
            ^ w[k + 2]
        )
        n3 = (
            t0[c3 >> 24]
            ^ t1[(c2 >> 16) & 255]
            ^ t2[(c1 >> 8) & 255]
            ^ t3[c0 & 255]
            ^ w[k + 3]
        )
        c0, c1, c2, c3 = n0, n1, n2, n3
        k += 4
    sb = _AES_INV_SBOX
    n0 = (
        (sb[c0 >> 24] << 24)
        | (sb[(c3 >> 16) & 255] << 16)
        | (sb[(c2 >> 8) & 255] << 8)
        | sb[c1 & 255]
    ) ^ w[k]
    n1 = (
        (sb[c1 >> 24] << 24)
        | (sb[(c0 >> 16) & 255] << 16)
        | (sb[(c3 >> 8) & 255] << 8)
        | sb[c2 & 255]
    ) ^ w[k + 1]
    n2 = (
        (sb[c2 >> 24] << 24)
        | (sb[(c1 >> 16) & 255] << 16)
        | (sb[(c0 >> 8) & 255] << 8)
        | sb[c3 & 255]
    ) ^ w[k + 2]
    n3 = (
        (sb[c3 >> 24] << 24)
        | (sb[(c2 >> 16) & 255] << 16)
        | (sb[(c1 >> 8) & 255] << 8)
        | sb[c0 & 255]
    ) ^ w[k + 3]
    return (
        n0.to_bytes(4, "big")
        + n1.to_bytes(4, "big")
        + n2.to_bytes(4, "big")
        + n3.to_bytes(4, "big")
    )


def _aes_cbc_decrypt(key: bytes, data: bytes) -> bytes:
    """AESV2 payload: first 16 bytes are the IV, PKCS#7 padding
    (§7.6.2 Algorithm 1 step b). Malformed framing → ValueError."""
    if len(data) < 32 or len(data) % 16:
        raise ValueError("AES-CBC payload framing invalid")
    if _HAVE_NATIVE_CRYPTO:
        out = bytearray(_native_aes_cbc(key, data[:16], data[16:], True))
    else:
        rk = _aes_expand_key(key)
        iv = data[:16]
        out = bytearray()
        prev = iv
        for i in range(16, len(data), 16):
            block = data[i : i + 16]
            out += bytes(
                x ^ y for x, y in zip(_aes_decrypt_block(block, rk), prev)
            )
            prev = block
    pad = out[-1]
    if not 1 <= pad <= 16 or out[-pad:] != bytearray([pad]) * pad:
        raise ValueError("AES-CBC padding invalid")
    return bytes(out[:-pad])


def _aes_cbc_encrypt(key: bytes, data: bytes, iv: bytes) -> bytes:
    pad = 16 - (len(data) % 16)
    data = data + bytes([pad]) * pad
    if _HAVE_NATIVE_CRYPTO:
        return iv + _native_aes_cbc(key, iv, data, False)
    rk = _aes_expand_key(key)
    out = bytearray(iv)
    prev = iv
    for i in range(0, len(data), 16):
        block = bytes(x ^ y for x, y in zip(data[i : i + 16], prev))
        prev = _aes_encrypt_block(block, rk)
        out += prev
    return bytes(out)


def _aes_cbc_encrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    """Raw CBC, NO padding, IV not emitted — the ISO 32000-2 hash-2.B
    round function and the /UE-/OE file-key wrap both use this form."""
    if len(data) % 16:
        raise ValueError("no-pad CBC needs a 16-byte-aligned payload")
    if _HAVE_NATIVE_CRYPTO:
        return _native_aes_cbc(key, iv, data, False)
    rk = _aes_expand_key(key)
    w, nr = _rk_words(rk), len(rk) - 1
    out = bytearray()
    pv = int.from_bytes(iv, "big")
    for i in range(0, len(data), 16):
        block = (
            int.from_bytes(data[i : i + 16], "big") ^ pv
        ).to_bytes(16, "big")
        enc = _aes_encrypt_block_w(block, w, nr)
        pv = int.from_bytes(enc, "big")
        out += enc
    return bytes(out)


def _aes_cbc_decrypt_nopad(key: bytes, iv: bytes, data: bytes) -> bytes:
    if len(data) % 16:
        raise ValueError("no-pad CBC needs a 16-byte-aligned payload")
    if _HAVE_NATIVE_CRYPTO:
        return _native_aes_cbc(key, iv, data, True)
    rk = _aes_expand_key(key)
    out = bytearray()
    prev = iv
    for i in range(0, len(data), 16):
        block = data[i : i + 16]
        out += bytes(
            x ^ y for x, y in zip(_aes_decrypt_block(block, rk), prev)
        )
        prev = block
    return bytes(out)


@_lru_cache(maxsize=64)
def _hash_2b(password: bytes, salt: bytes, udata: bytes = b"") -> bytes:
    """ISO 32000-2 §7.6.4.3.4 Algorithm 2.B — the R6 password hash: an
    iterated SHA-256/384/512 chain keyed by AES-128-CBC rounds over 64
    repetitions of (password ‖ K ‖ udata), ending when ≥64 rounds ran
    AND the last cipher byte ≤ rounds−32. Cached: a corpus of documents
    forged or encrypted with the same salts pays the ~64-round chain
    once per worker, not once per blob."""
    import hashlib

    k = hashlib.sha256(password + salt + udata).digest()
    rounds = 0
    while True:
        k1 = (password + k + udata) * 64
        e = _aes_cbc_encrypt_nopad(k[:16], k[16:32], k1)
        k = (
            hashlib.sha256,
            hashlib.sha384,
            hashlib.sha512,
        )[sum(e[:16]) % 3](e).digest()
        rounds += 1
        if rounds >= 64 and e[-1] <= rounds - 32:
            return k[:32]


def _v5_file_key(enc: dict, objects: dict) -> bytes:
    """ISO 32000-2 §7.6.4.3.3/4 + §7.6.4.4.10-11: the V5 (AES-256)
    standard handler for a BLANK password. /U carries hash(32) ‖
    validation-salt(8) ‖ key-salt(8); a blank USER password validates
    against the hash (R5: plain SHA-256, the deprecated Adobe
    ExtensionLevel-3 AESV3; R6: Algorithm 2.B), then the file key
    unwraps from /UE via AES-256-CBC, zero IV, no padding. When the
    user hash misses, the blank OWNER password is tried against /O
    (udata = the full 48-byte /U string) and the key unwraps from /OE.
    Real (non-blank) passwords refuse by name."""
    import hashlib

    r = int(_resolve(objects, enc.get("R", 0)) or 0)
    if r not in (5, 6):
        raise NotImplementedError(
            f"PDF V5 handler revision /R {r} is not supported — R5 "
            "(AESV3 ExtensionLevel 3) and R6 (PDF 2.0) decrypt here"
        )
    u = _resolve(objects, enc.get("U"))
    ue = _resolve(objects, enc.get("UE"))
    o = _resolve(objects, enc.get("O"))
    oe = _resolve(objects, enc.get("OE"))
    if not (isinstance(u, bytes) and len(u) >= 48):
        raise NotImplementedError("PDF V5 /Encrypt dict lacks a 48-byte /U")

    def hsh(salt: bytes, udata: bytes = b"") -> bytes:
        if r == 5:
            return hashlib.sha256(b"" + salt + udata).digest()
        return _hash_2b(b"", salt, udata)

    if hsh(u[32:40]) == u[:32]:
        if not (isinstance(ue, bytes) and len(ue) >= 32):
            raise NotImplementedError("PDF V5 /Encrypt dict lacks /UE")
        ik = hsh(u[40:48])
        key = _aes_cbc_decrypt_nopad(ik, b"\x00" * 16, ue[:32])
    elif (
        isinstance(o, bytes)
        and len(o) >= 48
        and isinstance(oe, bytes)
        and len(oe) >= 32
        and hsh(o[32:40], u[:48]) == o[:32]
    ):
        ik = hsh(o[40:48], u[:48])
        key = _aes_cbc_decrypt_nopad(ik, b"\x00" * 16, oe[:32])
    else:
        raise NotImplementedError(
            "PDF has a real (non-blank) user password: decryption "
            "without the password is not possible — supply the "
            "plaintext upstream or drop the document"
        )
    perms = _resolve(objects, enc.get("Perms"))
    if isinstance(perms, bytes) and len(perms) >= 16:
        dec = _aes_decrypt_block(perms[:16], _aes_expand_key(key))
        if dec[9:12] != b"adb":
            raise NotImplementedError(
                "PDF V5 /Perms sanity check failed — wrong file key "
                "(corrupt document or unsupported handler variant)"
            )
    return key


def _std_file_key(
    enc: dict, objects: dict, file_id: bytes
) -> tuple[bytes, str]:
    """(file key, method 'rc4'|'aes'|'aes256') for a BLANK password,
    verified against /U (Algorithm 4/5 inverse check for R2-R4, the
    validation-salt hash for V5). Raises ``NotImplementedError`` naming
    the gap for non-Standard handlers (PKI/custom) and real (non-blank)
    passwords."""
    import hashlib

    filt = str(_resolve(objects, enc.get("Filter", "")))
    if filt != "Standard":
        raise NotImplementedError(
            f"PDF security handler /{filt} is not supported — only the "
            "standard handler (§7.6.3) decrypts here"
        )
    v = int(_resolve(objects, enc.get("V", 0)) or 0)
    r = int(_resolve(objects, enc.get("R", 2)) or 2)
    method = "rc4"
    if v == 5:
        # AES-256: R5 (AESV3 ExtensionLevel 3) / R6 (PDF 2.0 §7.6.4)
        return _v5_file_key(enc, objects), "aes256"
    if v == 4:
        # crypt filters: RC4 (/CFM /V2) and AES-128 (/CFM /AESV2 —
        # the Acrobat 7+ default) both decrypt; anything else refuses
        cf = _resolve(objects, enc.get("CF")) or {}
        stmf = str(_resolve(objects, enc.get("StmF", "Identity")))
        strf = str(_resolve(objects, enc.get("StrF", "Identity")))
        cfms = set()
        for name in {stmf, strf} - {"Identity"}:
            cfms.add(str(
                _resolve(objects, (_resolve(objects, cf.get(name)) or {}).get("CFM", ""))
            ))
        if cfms == {"AESV2"}:
            method = "aes"
        elif cfms - {"V2"}:
            raise NotImplementedError(
                f"PDF crypt filters use /CFM {sorted(cfms)}: only RC4 "
                "(/V2) and AES-128 (/AESV2) are valid at /V 4 — "
                "AES-256 (/AESV3) requires the V5 handler layout"
            )
    elif v not in (1, 2):
        raise NotImplementedError(
            f"PDF encryption /V {v} is not supported — V 1/2 (RC4), "
            "V 4 (RC4 or AES-128) and V 5 (AES-256) decrypt here"
        )
    if r not in (2, 3, 4):
        raise NotImplementedError(
            f"PDF standard handler revision /R {r} is not supported"
        )
    o = _resolve(objects, enc.get("O"))
    u = _resolve(objects, enc.get("U"))
    if not isinstance(o, bytes) or not isinstance(u, bytes):
        raise NotImplementedError("PDF /Encrypt dict lacks /O or /U strings")
    p = int(_resolve(objects, enc.get("P", -1)))
    n = 5 if r == 2 else max(5, int(_resolve(objects, enc.get("Length", 40)) or 40) // 8)
    # /P as its 4 two's-complement little-endian bytes (§7.6.3.3)
    h = hashlib.md5(_PW_PAD + o[:32] + (p & 0xFFFFFFFF).to_bytes(4, "little") + file_id)
    if r >= 4 and _resolve(objects, enc.get("EncryptMetadata", True)) is False:
        h.update(b"\xff\xff\xff\xff")
    key = h.digest()[:n]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()[:n]
    # verify the BLANK user password against /U
    if r == 2:
        ok = _rc4(key, _PW_PAD) == u[:32]
    else:
        x = hashlib.md5(_PW_PAD + file_id).digest()
        x = _rc4(key, x)
        for i in range(1, 20):
            x = _rc4(bytes(b ^ i for b in key), x)
        ok = x[:16] == u[:16]
    if not ok:
        raise NotImplementedError(
            "PDF has a real (non-blank) user password: decryption "
            "without the password is not possible — supply the "
            "plaintext upstream or drop the document"
        )
    return key, method


def _decrypt_value(val, obj_key: bytes, fn):
    """Per-object string decryption: strings parse to ``bytes``; names
    (str) and numbers pass through untouched."""
    if isinstance(val, bytes):
        return fn(obj_key, val)
    if isinstance(val, list):
        return [_decrypt_value(v, obj_key, fn) for v in val]
    if isinstance(val, dict):
        return {k: _decrypt_value(v, obj_key, fn) for k, v in val.items()}
    return val


def _decrypt_objects(
    objects: dict, enc_ref, file_key: bytes, method: str = "rc4"
) -> None:
    """In-place Algorithm-1 decryption of every object's strings and
    stream bytes BEFORE filter decoding / ObjStm explosion (strings
    inside object streams are covered by the container's encryption,
    never twice). Skips the /Encrypt dict itself and XRef streams —
    the spec never encrypts either. ``method='aes'`` salts the
    per-object key with sAlT and runs AES-128-CBC (§7.6.2);
    ``method='aes256'`` (the V5 handler) uses the 32-byte file key
    DIRECTLY for every object — ISO 32000-2 drops the per-object MD5
    derivation."""
    import hashlib

    salt = b"sAlT" if method == "aes" else b""
    fn = _aes_cbc_decrypt if method in ("aes", "aes256") else _rc4
    skip = enc_ref.num if isinstance(enc_ref, _Ref) else None
    for num, (val, stream) in list(objects.items()):
        if num == skip:
            continue
        if isinstance(val, dict) and str(val.get("Type", "")) == "XRef":
            continue
        if method == "aes256":
            obj_key = file_key
        else:
            obj_key = hashlib.md5(
                file_key
                + num.to_bytes(3, "little")
                + (0).to_bytes(2, "little")
                + salt
            ).digest()[: min(len(file_key) + 5, 16)]
        new_val = _decrypt_value(val, obj_key, fn)
        new_stream = fn(obj_key, stream) if stream is not None else None
        objects[num] = (new_val, new_stream)


def _maybe_decrypt(objects: dict, trailer: dict) -> None:
    """If the trailer carries /Encrypt, derive the blank-user-password
    file key and decrypt in place; refusals propagate by name."""
    enc_ref = trailer.get("Encrypt")
    if enc_ref is None:
        return
    enc = _resolve(objects, enc_ref)
    if not isinstance(enc, dict):
        raise NotImplementedError("PDF /Encrypt entry does not resolve")
    ids = trailer.get("ID")
    file_id = ids[0] if isinstance(ids, list) and ids and isinstance(ids[0], bytes) else b""
    key, method = _std_file_key(enc, objects, file_id)
    try:
        _decrypt_objects(objects, enc_ref, key, method)
    except ValueError as e:
        # corrupt ciphertext/padding: quarantine, not a task crash
        raise NotImplementedError(f"PDF decryption failed: {e}") from e


def pdf_encryption(data: bytes) -> str:
    """Classify a document's encryption: ``'none'``, ``'decryptable'``
    (standard handler, RC4 / AES-128 / AES-256, blank password), or
    the refusal reason string — the routing diagnostic the quarantine
    path surfaces."""
    data = bytes(data)
    if not _is_encrypted(data):
        return "none"
    try:
        load_pdf_objects(data)
        return "decryptable"
    except NotImplementedError as e:
        return str(e)


def _walk_pages(objects: dict, node, acc: list, depth: int = 0):
    node = _resolve(objects, node)
    if not isinstance(node, dict) or depth > 64:
        return
    t = str(node.get("Type", ""))
    if t == "Pages" or (t != "Page" and "Kids" in node):
        for kid in _resolve(objects, node.get("Kids")) or []:
            _walk_pages(objects, kid, acc, depth + 1)
    elif t == "Page" or "Contents" in node:
        acc.append(node)


def extract_pdf_pages(data: bytes, errors: str = "skip") -> list[str]:
    """Per-page extracted text, in page-tree order — the text view of
    :func:`extract_pdf_page_infos` (which also carries the scanned-PDF
    diagnostics)."""
    return [p["text"] for p in extract_pdf_page_infos(data, errors=errors)]


def extract_pdf_page_infos(
    data: bytes, errors: str = "skip"
) -> list[dict]:
    """The whole pipeline as a pure function: bytes → one dict per page
    (``text``, ``has_images``), in page-tree order. ``errors="skip"``
    (crawl posture) turns an unsupported-filter page into '' and
    surfaces what parsed; ``errors="strict"`` re-raises. Encrypted
    documents (an /Encrypt trailer entry — §7.6) DECRYPT in place when
    the standard handler applies with a blank password
    (the owner-password-only restriction case — most encrypted PDFs in
    a crawl) across RC4, AES-128 (AESV2) and AES-256 (the V5 handler);
    real (non-blank) passwords and PKI handlers remain genuine
    unsupported inputs: strict mode raises naming the gap, skip mode
    yields no pages (``pdf_encryption`` surfaces the reason for
    routing).

    ``has_images`` is the scanned-PDF diagnostic (round-11): an
    image-only page — /Subtype /Image XObjects in the (inheritable)
    /Resources, no show-text — extracts as '' for a structural reason,
    not a quality one, and must route to the multimodal/OCR family
    instead of silently passing quality gates as an empty string. The
    probe walks the XObject dict only; it never decodes image data."""
    data = bytes(data)
    try:
        objects, root = load_pdf_objects(data)  # decrypts blank-password docs
    except NotImplementedError:
        if errors == "strict":
            raise
        return []
    pages: list[dict] = []
    root_dict = _resolve(objects, root) if root is not None else None
    if isinstance(root_dict, dict) and "Pages" in root_dict:
        _walk_pages(objects, root_dict["Pages"], pages)
    else:  # no usable catalog — find one by /Type (repair posture)
        for num in sorted(objects):
            val = objects[num][0]
            if isinstance(val, dict) and str(val.get("Type", "")) == "Catalog":
                _walk_pages(objects, val.get("Pages"), pages)
                break
    out: list[dict] = []
    for page in pages:
        contents = _resolve(objects, page.get("Contents"))
        refs = contents if isinstance(contents, list) else [page.get("Contents")]
        buf = bytearray()
        for ref in refs:
            target = ref
            while isinstance(target, _Ref):
                entry = objects.get(target.num)
                target = None
                if entry is not None:
                    try:
                        buf += decode_stream(entry, objects)
                        buf += b"\n"  # §7.8.2: streams concatenate with WS
                    except NotImplementedError:
                        if errors == "strict":
                            raise
        out.append(
            {
                "text": content_stream_text(
                    bytes(buf), _page_font_cmaps(objects, page, errors)
                ),
                "has_images": _page_has_image_xobjects(objects, page),
            }
        )
    return out


def _page_resources(objects: dict, page: dict):
    """The page's /Resources dict, following §7.7.3.4 inheritance
    (absent on the page, it comes from the nearest ancestor /Pages
    node via /Parent)."""
    node = page
    resources = None
    for _ in range(64):
        resources = _resolve(objects, node.get("Resources"))
        if isinstance(resources, dict) or "Parent" not in node:
            break
        node = _resolve(objects, node.get("Parent"))
        if not isinstance(node, dict):
            break
    return resources if isinstance(resources, dict) else None


def _page_has_image_xobjects(objects: dict, page: dict) -> bool:
    """True when the page's (inheritable) /Resources /XObject dict
    carries any /Subtype /Image entry — dictionary walk only, the image
    stream is never decoded (DCT/JBIG2/JPX data routes to the
    multimodal codecs, not this parser)."""
    resources = _page_resources(objects, page)
    if resources is None:
        return False
    xobjects = _resolve(objects, resources.get("XObject"))
    if not isinstance(xobjects, dict):
        return False
    for ref in xobjects.values():
        d = _resolve(objects, ref)
        if isinstance(d, dict) and str(d.get("Subtype", "")) == "Image":
            return True
    return False


def _page_font_cmaps(objects: dict, page: dict, errors: str) -> dict:
    """{font resource name: ToUnicode CMap} for one page, /Resources
    inheritance included."""
    resources = _page_resources(objects, page)
    if resources is None:
        return {}
    fonts = _resolve(objects, resources.get("Font"))
    if not isinstance(fonts, dict):
        return {}
    cmaps: dict[str, dict] = {}
    for name, ref in fonts.items():
        font = _resolve(objects, ref)
        if not isinstance(font, dict):
            continue
        tu = font.get("ToUnicode")
        target = tu
        while isinstance(target, _Ref):
            entry = objects.get(target.num)
            target = None
            if entry is not None:
                try:
                    cmaps[str(name)] = parse_cmap(decode_stream(entry, objects))
                except NotImplementedError:
                    if errors == "strict":
                        raise
        if str(name) not in cmaps:
            # no ToUnicode: a simple font's named /Encoding (+
            # /Differences) is the pre-2005 decode path — without it
            # accented/symbol text silently mis-extracts as raw bytes
            enc_map = simple_font_encoding_map(font, objects)
            if enc_map is not None:
                cmaps[str(name)] = enc_map
    return cmaps


# ------------------------------------------------------------- Spark layer


def parse_pdf_blobs(blobs: DataFrame, errors: str = "skip") -> DataFrame:
    """(path, content) blob rows → one row per page (PDF_DDL columns).

    Arrow-batched ``mapInPandas``, pure map stage: each blob's pages
    never leave the task that read it — scan + project at any corpus
    size, the ``parse_warc_blobs`` posture."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                infos = extract_pdf_page_infos(content, errors=errors)
                for i, info in enumerate(infos):
                    rows.append(
                        {
                            "page_no": i,
                            "page_text": info["text"],
                            "n_pages": len(infos),
                            "n_chars": len(info["text"]),
                            "has_images": info["has_images"],
                            "_kpf_source": p,
                        }
                    )
            cols = [c.split()[0] for c in PDF_DDL.split(", ")]
            yield pd.DataFrame(rows, columns=cols)

    return blobs.select("path", "content").mapInPandas(batches, PDF_DDL)


def read_pdf(
    spark: SparkSession, path: str, errors: str = "skip", stream: bool = False
) -> DataFrame:
    """Read a PDF directory/glob as one typed row per page with
    ``_kpf_source`` lineage — compose with the ``textstats`` quality
    gates downstream exactly like ``html_extract`` output.

    ``stream=True`` reads each file inside the worker via
    ``blob.read_blobs_via_paths`` — past ``binaryFile``'s JVM 2 GiB
    per-file cap (the xref tail means a PDF must be whole-file in
    memory either way, but Python's heap has no Int.MaxValue array
    limit). Results are identical."""
    if stream:
        from kusto_pre_forge_spark.sources.blob import read_blobs_via_paths

        return parse_pdf_blobs(read_blobs_via_paths(spark, path), errors=errors)
    bf = spark.read.format("binaryFile").load(path)
    return parse_pdf_blobs(bf, errors=errors)


def extract_pdf_images(data: bytes, errors: str = "skip") -> list[dict]:
    """Pull the embedded image XObjects out of a PDF — the payload the
    multimodal family consumes once :func:`route_pdf_documents` sends a
    scanned document its way. One dict per (page, image): ``page_no``,
    ``name`` (resource key), ``width``/``height``/``bits``/
    ``color_space`` from the image dict, ``codec`` + ``data``:

    - ``/DCTDecode`` → ``codec='jpeg'``, data = the RAW stream bytes —
      a DCT-encoded XObject IS a complete JFIF/JPEG payload
      (ISO 32000 §7.4.8), decodable by ``mediacodec.decode_jpeg``;
    - Flate/uncompressed → ``codec='raw'``, data = decoded samples
      (``decode_stream``), row-major, ready for ``encode_png``;
    - other filters (JPX/JBIG2/CCITT) → skipped in skip mode, raised
      in strict — the escape hatches name themselves.

    Shares the encrypted-document guard with text extraction."""
    data = bytes(data)
    try:
        objects, root = load_pdf_objects(data)  # decrypts blank-password docs
    except NotImplementedError:
        if errors == "strict":
            raise
        return []
    pages: list[dict] = []
    root_dict = _resolve(objects, root) if root is not None else None
    if isinstance(root_dict, dict) and "Pages" in root_dict:
        _walk_pages(objects, root_dict["Pages"], pages)
    else:
        for num in sorted(objects):
            val = objects[num][0]
            if isinstance(val, dict) and str(val.get("Type", "")) == "Catalog":
                _walk_pages(objects, val.get("Pages"), pages)
                break
    out: list[dict] = []
    for page_no, page in enumerate(pages):
        resources = _page_resources(objects, page)
        if resources is None:
            continue
        xobjects = _resolve(objects, resources.get("XObject"))
        if not isinstance(xobjects, dict):
            continue
        for name, ref in sorted(xobjects.items(), key=lambda kv: str(kv[0])):
            d = _resolve(objects, ref)
            if not isinstance(d, dict) or str(d.get("Subtype", "")) != "Image":
                continue
            entry = objects.get(ref.num) if isinstance(ref, _Ref) else None
            raw = entry[1] if entry else None
            if raw is None:
                continue
            filt = d.get("Filter")
            filt_names = [str(f) for f in (filt if isinstance(filt, list) else [filt] if filt else [])]
            meta = {
                "page_no": page_no,
                "name": str(name),
                "width": int(_resolve(objects, d.get("Width")) or 0),
                "height": int(_resolve(objects, d.get("Height")) or 0),
                "bits": int(_resolve(objects, d.get("BitsPerComponent")) or 0),
                "color_space": str(_resolve(objects, d.get("ColorSpace")) or ""),
            }
            if filt_names == ["DCTDecode"]:
                out.append({**meta, "codec": "jpeg", "data": raw})
            elif filt_names in ([], ["FlateDecode"]):
                try:
                    body = decode_stream(entry, objects)
                except NotImplementedError:
                    if errors == "strict":
                        raise
                    continue
                out.append({**meta, "codec": "raw", "data": body})
            else:
                if errors == "strict":
                    raise NotImplementedError(
                        f"image XObject filter {'+'.join(filt_names)} is "
                        "not decodable here — route the raw stream to an "
                        "external decoder"
                    )
    return out


def parse_pdf_images(blobs: DataFrame, errors: str = "skip") -> DataFrame:
    """(path, content) blob rows → one row per embedded image — the
    multimodal hand-off as a pure Arrow map stage (the
    ``parse_pdf_blobs`` posture)."""
    import pandas as pd

    ddl = (
        "page_no int, name string, width int, height int, bits int, "
        "color_space string, codec string, data binary, _kpf_source string"
    )

    def batches(it):
        for pdf in it:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                for img in extract_pdf_images(content, errors=errors):
                    rows.append({**img, "_kpf_source": p})
            cols = [c.split()[0] for c in ddl.split(", ")]
            yield pd.DataFrame(rows, columns=cols)

    return blobs.select("path", "content").mapInPandas(batches, ddl)


def route_pdf_documents(
    parsed: DataFrame, blobs: DataFrame | None = None
) -> DataFrame:
    """Per-DOCUMENT routing over :func:`parse_pdf_blobs` output — the
    scanned-PDF escape hatch (round-11): an image-only document (zero
    extracted chars, image XObjects present) extracts '' for a
    STRUCTURAL reason and must go to the multimodal/OCR family, not
    through text quality gates that would pass/fail an empty string for
    the wrong reason. Routes:

    - ``multimodal`` — no text anywhere, ≥1 page carries /Image
      XObjects (the scanned/figure-only case; OCR or image features)
    - ``empty``      — no text and no images (blank or unsupported)
    - ``text``       — extracted text present (images may coexist)

    - ``unparsed``   — only with ``blobs``: the source produced ZERO
      page rows (encrypted, truncated beyond repair) — the quarantine
      row a reject stream reviews; without the listing these documents
      would vanish silently, which is the one thing a router must
      never do.

    One map-side-combined aggregate per source; composes upstream of
    the gates at any corpus size. Pass the original ``blobs`` frame
    (its ``path`` column) to surface zero-page documents."""
    from pyspark.sql import functions as F

    routed = parsed.groupBy("_kpf_source").agg(
        F.max("n_pages").cast("int").alias("n_pages"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.max(F.col("has_images").cast("int")).cast("boolean").alias(
            "has_images"
        ),
    ).withColumn(
        "route",
        F.when(
            (F.col("n_chars") == 0) & F.col("has_images"), F.lit("multimodal")
        )
        .when(F.col("n_chars") == 0, F.lit("empty"))
        .otherwise(F.lit("text")),
    )
    if blobs is None:
        return routed
    all_sources = blobs.select(F.col("path").alias("_kpf_source")).distinct()
    return (
        all_sources.join(routed, "_kpf_source", "left")
        .withColumn("route", F.coalesce("route", F.lit("unparsed")))
        .withColumn("n_pages", F.coalesce("n_pages", F.lit(0)))
        .withColumn("n_chars", F.coalesce("n_chars", F.lit(0).cast("long")))
        .withColumn("has_images", F.coalesce("has_images", F.lit(False)))
    )


# --------------------------------------------------- fixture-forging writer


def _pdf_text_string(s: str) -> bytes:
    """Forge encoding: hex string of BOM + UTF-16BE — round-trips any
    Unicode content with zero escape interactions (§7.9.2.2)."""
    return b"<" + (b"\xfe\xff" + s.encode("utf-16-be")).hex().encode() + b">"


def _page_content(text: str) -> bytes:
    shows = b" T*\n".join(
        _pdf_text_string(line) + b" Tj" for line in text.split("\n")
    )
    return b"BT\n/F1 12 Tf\n14 TL\n1 0 0 1 72 720 Tm\n" + shows + b"\nET"


def pdf_bytes_xrefstream(pages: list[str]) -> bytes:
    """Forge the MODERN (PDF 1.5+) layout of :func:`pdf_bytes`: the
    catalog, page tree, page dictionaries, and font pack into ONE
    /Type /ObjStm object stream (§7.5.7); content streams stay regular
    indirect objects; the cross-reference is a /Type /XRef STREAM
    (§7.5.8) with W [1 4 2] binary rows, FlateDecode, and the PNG Up
    predictor (/DecodeParms /Predictor 12) — the exact shape common PDF
    writers emit, so the decoder's predictor/W/Index/type-2 paths are
    all on the hook. Extracted text must equal :func:`pdf_bytes`'s."""
    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    font_num = 3 + 2 * n
    packed: dict[int, bytes] = {
        1: b"<< /Type /Catalog /Pages 2 0 R >>",
        2: f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode(),
        font_num: b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    }
    regular: dict[int, bytes] = {}
    for i, text in enumerate(pages):
        page_num, cont_num = 3 + 2 * i, 4 + 2 * i
        packed[page_num] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Contents {cont_num} 0 R /Resources << /Font "
            f"<< /F1 {font_num} 0 R >> >> >>"
        ).encode()
        body = zlib.compress(_page_content(text))
        regular[cont_num] = (
            b"<< /Length " + str(len(body)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + body + b"\nendstream"
        )
    objstm_num, xref_num = 4 + 2 * n, 5 + 2 * n
    # object stream: "num offset ..." header, then the packed values
    payload = bytearray()
    header = []
    for num in sorted(packed):
        header.append(f"{num} {len(payload)}")
        payload += packed[num] + b"\n"
    head = (" ".join(header) + "\n").encode()
    stm = zlib.compress(head + bytes(payload))
    regular[objstm_num] = (
        f"<< /Type /ObjStm /N {len(packed)} /First {len(head)} /Length "
        f"{len(stm)} /Filter /FlateDecode >>".encode()
        + b"\nstream\n" + stm + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets: dict[int, int] = {}
    for num in sorted(regular):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + regular[num] + b"\nendobj\n"
    # XRef stream rows, W = [1 4 2]: type 0 free / 1 offset / 2 packed
    size = xref_num + 1
    rows = bytearray()
    for num in range(size):
        if num == 0:
            rows += bytes([0]) + (0).to_bytes(4, "big") + (65535).to_bytes(2, "big")
        elif num in packed:
            idx = sorted(packed).index(num)
            rows += bytes([2]) + objstm_num.to_bytes(4, "big") + idx.to_bytes(2, "big")
        elif num in offsets:
            rows += bytes([1]) + offsets[num].to_bytes(4, "big") + (0).to_bytes(2, "big")
        elif num == xref_num:
            rows += bytes([1]) + len(out).to_bytes(4, "big") + (0).to_bytes(2, "big")
        else:
            rows += bytes([0]) + (0).to_bytes(4, "big") + (0).to_bytes(2, "big")
    # PNG Up predictor over 7-byte columns, then Flate
    cols = 7
    filtered = bytearray()
    prev = bytes(cols)
    for r in range(0, len(rows), cols):
        row = bytes(rows[r : r + cols])
        filtered += bytes([2]) + bytes(
            (row[j] - prev[j]) & 0xFF for j in range(cols)
        )
        prev = row
    xbody = zlib.compress(bytes(filtered))
    xref_at = len(out)
    out += (
        f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
        f"/Root 1 0 R /Filter /FlateDecode "
        f"/DecodeParms << /Predictor 12 /Columns {cols} >> /Length "
        f"{len(xbody)} >>\nstream\n".encode()
    )
    out += xbody
    out += f"\nendstream\nendobj\nstartxref\n{xref_at}\n%%EOF\n".encode()
    return bytes(out)


def pdf_bytes_cid(pages: list[str]) -> bytes:
    """Forge the SUBSET-FONT layout of :func:`pdf_bytes`: show-text is
    2-byte GLYPH CODES (not character bytes), recoverable ONLY through
    the font's /ToUnicode CMap (§9.10.3) — the layout every PDF with an
    embedded font subset uses. Each page's distinct characters get
    arbitrary codes; consecutive-codepoint runs are emitted as bfrange
    entries (one incrementing, plus the array form for the first run)
    and the rest as bfchar pairs, so all three CMap constructs are on
    the hook. Extracted text must equal the classic layout's."""
    all_chars = sorted({ch for t in pages for ch in t if ch != "\n"})
    # glyph code assignment: arbitrary but deterministic, starts at 7
    code_of = {ch: i + 7 for i, ch in enumerate(all_chars)}

    # CMap body: first run as an explicit-array bfrange, the next run as
    # an incrementing bfrange, everything else as bfchar pairs
    def u16(s: str) -> str:
        return s.encode("utf-16-be").hex()

    entries = sorted((c, ch) for ch, c in code_of.items())
    bfchars, bfranges = [], []
    i = 0
    runs = 0
    while i < len(entries):
        j = i
        while (
            j + 1 < len(entries)
            and entries[j + 1][0] == entries[j][0] + 1
            and len(entries[j + 1][1]) == 1
            and len(entries[i][1]) == 1
            and ord(entries[j + 1][1]) == ord(entries[j][1]) + 1
        ):
            j += 1
        if j > i and runs == 0:
            dsts = " ".join(f"<{u16(ch)}>" for _, ch in entries[i : j + 1])
            bfranges.append(
                f"<{entries[i][0]:04x}> <{entries[j][0]:04x}> [{dsts}]"
            )
            runs += 1
        elif j > i:
            bfranges.append(
                f"<{entries[i][0]:04x}> <{entries[j][0]:04x}> "
                f"<{u16(entries[i][1])}>"
            )
        else:
            bfchars.append(f"<{entries[i][0]:04x}> <{u16(entries[i][1])}>")
        i = j + 1
    cmap_src = (
        "/CIDInit /ProcSet findresource begin\n"
        "1 begincodespacerange\n<0000> <ffff>\nendcodespacerange\n"
    )
    if bfranges:
        cmap_src += (
            f"{len(bfranges)} beginbfrange\n"
            + "\n".join(bfranges)
            + "\nendbfrange\n"
        )
    if bfchars:
        cmap_src += (
            f"{len(bfchars)} beginbfchar\n"
            + "\n".join(bfchars)
            + "\nendbfchar\n"
        )
    cmap_src += "end\n"
    cmap_body = zlib.compress(cmap_src.encode("ascii"))

    def code_string(line: str) -> bytes:
        codes = b"".join(code_of[ch].to_bytes(2, "big") for ch in line)
        return b"<" + codes.hex().encode() + b">"

    objs: list[bytes] = []
    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    font_num, cmap_num = 3 + 2 * n, 4 + 2 * n
    for i, text in enumerate(pages):
        cont_num = 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {cont_num} 0 R /Resources << /Font "
                f"<< /F9 {font_num} 0 R >> >> >>"
            ).encode()
        )
        shows = b" T*\n".join(
            code_string(line) + b" Tj" for line in text.split("\n")
        )
        content = b"BT\n/F9 12 Tf\n14 TL\n1 0 0 1 72 720 Tm\n" + shows + b"\nET"
        body = zlib.compress(content)
        objs.append(
            b"<< /Length " + str(len(body)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + body + b"\nendstream"
        )
    objs.append(
        (
            f"<< /Type /Font /Subtype /Type0 /BaseFont /KPF-Subset "
            f"/Encoding /Identity-H /ToUnicode {cmap_num} 0 R >>"
        ).encode()
    )
    objs.append(
        b"<< /Length " + str(len(cmap_body)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + cmap_body + b"\nendstream"
    )

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def pdf_bytes_scanned(
    n_pages: int = 1,
    jpeg_payload: bytes | None = None,
    pixels: bytes | None = None,
    width: int = 1275,
    height: int = 1650,
) -> bytes:
    """Forge a SCANNED-style PDF: each page's content is a single
    ``/ImN Do`` image paint (no BT..ET text at all), with a /Subtype
    /Image /Filter /DCTDecode XObject in /Resources — the structure a
    scanner/OCR-less export writes. The parser must yield '' text with
    ``has_images=True`` per page, so the corpus pipeline routes the
    document to the multimodal family instead of passing empty strings
    through quality gates. Pass ``pixels`` (row-major RGB samples, with
    ``width``/``height``) to embed a REAL /FlateDecode /DeviceRGB image
    instead of the fake-JPEG stub — the extract_pdf_images →
    mediacodec hand-off then carries genuine decodable pixel data."""
    if pixels is not None:
        payload = zlib.compress(bytes(pixels))
        filt = b"/FlateDecode"
    else:
        payload = jpeg_payload if jpeg_payload is not None else (
            b"\xff\xd8\xff\xe0\x00\x10JFIF\x00fake-scan\xff\xd9"
        )
        filt = b"/DCTDecode"
    objs: list[bytes] = []
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n_pages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    for i in range(n_pages):
        cont_num, img_num = 4 + 2 * i, 3 + 2 * n_pages + i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {cont_num} 0 R /Resources << /XObject "
                f"<< /Im0 {img_num} 0 R >> >> >>"
            ).encode()
        )
        content = b"q 612 0 0 792 0 0 cm /Im0 Do Q"
        objs.append(
            b"<< /Length " + str(len(content)).encode() + b" >>\n"
            b"stream\n" + content + b"\nendstream"
        )
    for _ in range(n_pages):
        objs.append(
            b"<< /Type /XObject /Subtype /Image /Width "
            + str(int(width)).encode()
            + b" /Height "
            + str(int(height)).encode()
            + b" /ColorSpace /DeviceRGB /BitsPerComponent 8"
            b" /Filter " + filt + b" /Length "
            + str(len(payload)).encode()
            + b" >>\nstream\n" + payload + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def pdf_bytes(pages: list[str], compress: bool = True) -> bytes:
    """Forge one spec-valid PDF: real xref offsets, a page tree, one
    Flate (or raw) content stream per page, text as hex-encoded
    UTF-16BE show-text lines separated by ``T*``. The parser under test
    must reproduce each page string EXACTLY (lines re-join with \\n) —
    the closed-form contract oracles replay.

    This writes the CLASSIC (table-xref) layout;
    :func:`pdf_bytes_xrefstream` writes the same document in the modern
    xref-stream + object-stream layout."""
    objs: list[bytes] = []  # bodies; object number = index + 1
    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode()
    )
    font_num = 3 + 2 * n
    for i, text in enumerate(pages):
        page_num, cont_num = 3 + 2 * i, 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {cont_num} 0 R /Resources << /Font "
                f"<< /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        content = _page_content(text)
        if compress:
            body, filt = zlib.compress(content), b" /Filter /FlateDecode"
        else:
            body, filt = content, b""
        objs.append(
            b"<< /Length " + str(len(body)).encode() + filt + b" >>\n"
            b"stream\n" + body + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]  # object 0 is the free-list head
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def pdf_bytes_differences(pages: list[str]) -> bytes:
    """Forge the pre-2005 SIMPLE-FONT layout: a Type1 font with NO
    /ToUnicode whose /Encoding dict patches /BaseEncoding
    /WinAnsiEncoding with a /Differences array remapping codes
    0x80–0x99 to the glyph names /a–/z (§9.6.6). Show-text encodes
    lowercase letters through the remap, so raw byte decode yields
    cp1252 high-range garbage and ONLY the /Differences table recovers
    the text — the decode path this fixture pins. Extracted text must
    equal :func:`pdf_bytes`'s for the same pages (ASCII input)."""
    diffs = " ".join(f"/{chr(c)}" for c in range(ord("a"), ord("z") + 1))

    def needs_f2(ch: str) -> bool:
        # characters whose cp1252 byte collides with the remapped
        # 0x80–0x99 range (curly quotes, dashes, €, ™, …) — and
        # anything cp1252 can't encode — show through the PLAIN second
        # font as UTF-16 text, so extraction stays lossless for ANY
        # input while lowercase still exercises the /Differences path
        if "a" <= ch <= "z":
            return False
        try:
            b = ch.encode("cp1252")
        except UnicodeEncodeError:
            return True
        return len(b) != 1 or 0x80 <= b[0] <= 0x99

    def enc_line(line: str) -> bytes:
        runs: list[tuple[bool, str]] = []
        for ch in line:
            f2 = needs_f2(ch)
            if runs and runs[-1][0] == f2:
                runs[-1] = (f2, runs[-1][1] + ch)
            else:
                runs.append((f2, ch))
        ops: list[bytes] = []
        for f2, txt in runs:
            if f2:
                ops.append(b"/F2 12 Tf " + _pdf_text_string(txt) + b" Tj")
            else:
                bs = bytearray()
                for ch in txt:
                    if "a" <= ch <= "z":
                        bs.append(0x80 + ord(ch) - ord("a"))
                    else:
                        bs += ch.encode("cp1252")
                ops.append(
                    b"/F1 12 Tf <" + bytes(bs).hex().encode() + b"> Tj"
                )
        return b" ".join(ops) if ops else b"<> Tj"

    def page_content(text: str) -> bytes:
        shows = b" T*\n".join(enc_line(line) for line in text.split("\n"))
        return b"BT\n/F1 12 Tf\n14 TL\n1 0 0 1 72 720 Tm\n" + shows + b"\nET"

    objs: list[bytes] = []
    n = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(n))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {n} >>".encode())
    font_num = 3 + 2 * n
    font2_num = font_num + 1
    for i, text in enumerate(pages):
        cont_num = 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {cont_num} 0 R /Resources << /Font "
                f"<< /F1 {font_num} 0 R /F2 {font2_num} 0 R >> >> >>"
            ).encode()
        )
        body = zlib.compress(page_content(text))
        objs.append(
            b"<< /Length " + str(len(body)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + body + b"\nendstream"
        )
    objs.append(
        (
            "<< /Type /Font /Subtype /Type1 /BaseFont /CustomOldStyle "
            "/Encoding << /Type /Encoding /BaseEncoding /WinAnsiEncoding "
            f"/Differences [128 {diffs}] >> >>"
        ).encode()
    )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _pdf_bytes_encrypted_v5(
    pages: list[str], r: int, owner_pw: bytes, p: int,
    user_pw: bytes = b"",
) -> bytes:
    """The REAL V5 (AES-256) forge behind ``pdf_bytes_encrypted(r=5|6)``:
    blank user password (R5 plain-SHA-256 / R6 Algorithm 2.B hashes),
    real owner password, /UE and /OE file-key wraps (AES-256-CBC, zero
    IV, no pad), the /Perms ECB block, and per-object AES-256-CBC
    content with the file key used directly (no per-object MD5 — the
    ISO 32000-2 change). Salts are FIXED so the expensive 2.B chain
    caches across a forged corpus; the file key is content-derived so
    forges stay deterministic."""
    import hashlib

    file_key = hashlib.sha256(b"kpf-v5-filekey" + str(pages).encode()).digest()
    vsalt, ksalt = b"kpfVsalt", b"kpfKsalt"
    ovsalt, oksalt = b"kpfOVslt", b"kpfOKslt"

    def hsh(pw: bytes, salt: bytes, udata: bytes = b"") -> bytes:
        if r == 5:
            return hashlib.sha256(pw + salt + udata).digest()
        return _hash_2b(pw, salt, udata)

    u = hsh(user_pw, vsalt) + vsalt + ksalt
    ue = _aes_cbc_encrypt_nopad(hsh(user_pw, ksalt), b"\x00" * 16, file_key)
    o = hsh(owner_pw, ovsalt, u) + ovsalt + oksalt
    oe = _aes_cbc_encrypt_nopad(
        hsh(owner_pw, oksalt, u), b"\x00" * 16, file_key
    )
    perms_plain = (
        (p & 0xFFFFFFFF).to_bytes(4, "little")
        + b"\xff\xff\xff\xff"
        + b"T"  # EncryptMetadata true
        + b"adb"
        + b"kpf0"
    )
    perms = _aes_encrypt_block(perms_plain, _aes_expand_key(file_key))

    def enc_bytes(num: int, data: bytes) -> bytes:
        iv = hashlib.md5(b"kpf-v5-iv" + num.to_bytes(3, "little")).digest()
        return _aes_cbc_encrypt(file_key, data, iv)

    objs: list[bytes] = []
    npages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(npages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode())
    font_num = 3 + 2 * npages
    for i, text in enumerate(pages):
        cont_num = 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {cont_num} 0 R /Resources << /Font "
                f"<< /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        body = enc_bytes(cont_num, zlib.compress(_page_content(text)))
        objs.append(
            b"<< /Length " + str(len(body)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + body + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    enc_num = len(objs) + 1
    objs.append(
        (
            f"<< /Filter /Standard /V 5 /R {r} /Length 256 "
            f"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >> "
            f"/StmF /StdCF /StrF /StdCF "
            f"/O <{o.hex()}> /U <{u.hex()}> "
            f"/OE <{oe.hex()}> /UE <{ue.hex()}> "
            f"/P {p} /Perms <{perms.hex()}> >>"
        ).encode()
    )

    file_id = hashlib.md5(b"kpf-fixture-v5" + str(pages).encode()).digest()
    out = bytearray(b"%PDF-2.0\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R "
        f"/Encrypt {enc_num} 0 R "
        f"/ID [<{file_id.hex()}> <{file_id.hex()}>] >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)


def pdf_bytes_encrypted(
    pages: list[str],
    r: int = 3,
    owner_pw: bytes = b"owner",
    p: int = -3904,
    aes: bool = False,
    v5_marker: bool = False,
    user_pw: bytes = b"",
) -> bytes:
    """Forge :func:`pdf_bytes`'s document ENCRYPTED with the standard
    security handler (§7.6.3) — owner password set, user password
    BLANK, exactly the restriction-only case the decryptor targets.
    ``r=2`` writes V1/RC4-40, ``r=3`` V2/RC4-128, ``r=4`` the V4
    crypt-filter layout (/CF /StdCF /CFM /V2 — or REAL AES-128-CBC
    content with /CFM /AESV2 when ``aes=True``, deterministic
    per-object IVs so forges are byte-stable), ``r=5``/``r=6`` the
    REAL V5 AES-256 layout (/CFM /AESV3: R5 hashes with plain SHA-256,
    R6 with Algorithm 2.B; blank user password, real owner password,
    /UE-/OE key wraps, /Perms block — fixed salts so the 2.B chain
    caches across a forged corpus). ``v5_marker=True`` writes a V5/R6
    dict whose /U can NEVER validate (a stand-in for a real-password
    document — the remaining refusal class). The encryptor IS the test
    oracle: decrypt(encrypt(doc)) must equal the plaintext forge's
    extraction."""
    import hashlib

    if aes and r != 4:
        raise ValueError("AESV2 requires the V4 crypt-filter layout (r=4)")

    if r in (5, 6) and not v5_marker:
        return _pdf_bytes_encrypted_v5(pages, r, owner_pw, p, user_pw)
    if v5_marker:
        r = 3  # the RC4 machinery below only feeds the bogus V5 dict
    if r not in (2, 3, 4):
        raise ValueError("r must be 2, 3, 4, 5 or 6")
    v = {2: 1, 3: 2, 4: 4}[r]
    n = 5 if r == 2 else 16
    file_id = hashlib.md5(b"kpf-fixture" + str(pages).encode()).digest()

    def pad_pw(pw: bytes) -> bytes:
        return (pw + _PW_PAD)[:32]

    # Algorithm 3: /O from the owner password (user pw blank)
    okey = hashlib.md5(pad_pw(owner_pw)).digest()
    if r >= 3:
        for _ in range(50):
            okey = hashlib.md5(okey).digest()
    okey = okey[:n]
    o = _rc4(okey, pad_pw(b""))
    if r >= 3:
        for i in range(1, 20):
            o = _rc4(bytes(b ^ i for b in okey), o)
    # Algorithm 2: file key for the blank user password
    h = hashlib.md5(
        _PW_PAD + o + (p & 0xFFFFFFFF).to_bytes(4, "little") + file_id
    )
    key = h.digest()[:n]
    if r >= 3:
        for _ in range(50):
            key = hashlib.md5(key).digest()[:n]
    # Algorithm 4/5: /U
    if r == 2:
        u = _rc4(key, _PW_PAD)
    else:
        u = _rc4(key, hashlib.md5(_PW_PAD + file_id).digest())
        for i in range(1, 20):
            u = _rc4(bytes(b ^ i for b in key), u)
        u = u + b"\x00" * 16  # padded to 32 (§7.6.3.4 step f)

    salt = b"sAlT" if aes else b""

    def obj_key(num: int) -> bytes:
        return hashlib.md5(
            key + num.to_bytes(3, "little") + (0).to_bytes(2, "little")
            + salt
        ).digest()[: min(n + 5, 16)]

    def enc_bytes(num: int, data: bytes) -> bytes:
        if aes:
            iv = hashlib.md5(b"kpf-iv" + num.to_bytes(3, "little") + file_id).digest()
            return _aes_cbc_encrypt(obj_key(num), data, iv)
        return _rc4(obj_key(num), data)

    # same object layout as pdf_bytes, content streams encrypted
    objs: list[bytes] = []
    npages = len(pages)
    kids = " ".join(f"{3 + 2 * i} 0 R" for i in range(npages))
    objs.append(b"<< /Type /Catalog /Pages 2 0 R >>")
    objs.append(f"<< /Type /Pages /Kids [{kids}] /Count {npages} >>".encode())
    font_num = 3 + 2 * npages
    for i, text in enumerate(pages):
        cont_num = 4 + 2 * i
        objs.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Contents {cont_num} 0 R /Resources << /Font "
                f"<< /F1 {font_num} 0 R >> >> >>"
            ).encode()
        )
        body = enc_bytes(cont_num, zlib.compress(_page_content(text)))
        objs.append(
            b"<< /Length " + str(len(body)).encode()
            + b" /Filter /FlateDecode >>\nstream\n" + body + b"\nendstream"
        )
    objs.append(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    enc_num = len(objs) + 1
    if v5_marker:
        # /R 5 on purpose: the SHA-256 validation (not the 64-round
        # 2.B chain) is enough to PROVE the password mismatch, so a
        # corpus of real-password stand-ins stays cheap to refuse
        enc_body = (
            f"<< /Filter /Standard /V 5 /R 5 /Length 256 "
            f"/CF << /StdCF << /CFM /AESV3 /AuthEvent /DocOpen >> >> "
            f"/StmF /StdCF /StrF /StdCF "
            f"/O <{(o + o).hex()}> /U <{(u + u).hex()}> /P {p} "
            f"/OE <{o.hex()}> /UE <{u.hex()}> /Perms <{o[:16].hex()}> >>"
        ).encode()
    elif r == 4:
        cfm = "AESV2" if aes else "V2"
        enc_body = (
            f"<< /Filter /Standard /V 4 /R 4 /Length 128 "
            f"/CF << /StdCF << /CFM /{cfm} /AuthEvent /DocOpen >> >> "
            f"/StmF /StdCF /StrF /StdCF "
            f"/O <{o.hex()}> /U <{u.hex()}> /P {p} >>"
        ).encode()
    else:
        enc_body = (
            f"<< /Filter /Standard /V {v} /R {r} /Length {n * 8} "
            f"/O <{o.hex()}> /U <{u.hex()}> /P {p} >>"
        ).encode()
    objs.append(enc_body)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(objs) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {len(objs) + 1} /Root 1 0 R "
        f"/Encrypt {enc_num} 0 R "
        f"/ID [<{file_id.hex()}> <{file_id.hex()}>] >>\n"
        f"startxref\n{xref_at}\n%%EOF\n"
    ).encode()
    return bytes(out)

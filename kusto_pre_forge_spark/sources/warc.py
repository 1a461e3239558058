"""WARC (Web ARChive) source — Common Crawl's native container.

Reference parity: the reference ingests whatever blob bytes land in the
landing container (code/KustoPreForgeLib/BlobSources/ListBlobSource.cs) and
delegates format handling; a crawl pipeline's raw input is WARC, so this
sibling of the Avro/W3C readers closes the crawl-input front. Implemented
from the public spec (ISO 28500 / WARC 1.1,
https://iipc.github.io/warc-specifications/specifications/warc-format/warc-1.1/):
a record is a ``WARC/1.x`` version line, CRLF-terminated named headers, a
blank line, ``Content-Length`` octets of block, and a two-CRLF terminator.
``response`` records carry an HTTP/1.x message as their block; the payload
is the entity body (de-chunked when ``Transfer-Encoding: chunked``).

Spark-first layout (the ``sources/avro.py`` playbook): files parallelize
through the built-in ``binaryFile`` source — one task per blob, which is
also Common Crawl's unit of distribution (~1 GB segments) — and records
decode in Arrow batches via ``mapInPandas``. ``.gz`` members handle the
Common Crawl convention of one gzip MEMBER per record: ``gzip.decompress``
consumes concatenated members, so whole-file and per-record compression
both just work.

The parser is intentionally a pure function over bytes
(``iter_warc_records``), so the record framing is unit-testable without
Spark and reusable by the streaming landing path.
"""

from __future__ import annotations

import gzip
import zlib
import io

from pyspark.sql import DataFrame, SparkSession

WARC_DDL = (
    "warc_type string, record_id string, warc_date timestamp, "
    "target_uri string, content_type string, content_length long, "
    "http_status int, http_content_type string, payload binary, "
    "payload_text string, _kpf_source string"
)


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked transfer encoding body (RFC 9112 §7.1).
    Malformed chunking returns the raw bytes — a crawl archive's job is
    to surface what was captured, not to drop it."""
    out = bytearray()
    buf = io.BytesIO(body)
    try:
        while True:
            line = buf.readline()
            if not line:
                return bytes(body)
            size = int(line.split(b";")[0].strip() or b"0", 16)
            if size == 0:
                break
            chunk = buf.read(size)
            if len(chunk) < size:
                return bytes(body)
            out.extend(chunk)
            buf.read(2)  # chunk's trailing CRLF
    except ValueError:
        return bytes(body)
    return bytes(out)


def parse_http_response(block: bytes):
    """(status:int|None, headers:dict[lower str,str], body:bytes) from an
    HTTP response message. Non-HTTP blocks return (None, {}, block)."""
    if not block.startswith(b"HTTP/"):
        return None, {}, block
    head, sep, body = block.partition(b"\r\n\r\n")
    if not sep:
        return None, {}, block
    lines = head.split(b"\r\n")
    try:
        status = int(lines[0].split()[1])
    except (IndexError, ValueError):
        return None, {}, block
    headers: dict[str, str] = {}
    for ln in lines[1:]:
        name, _, value = ln.partition(b":")
        if _:
            headers[name.strip().lower().decode("latin-1")] = (
                value.strip().decode("latin-1")
            )
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    return status, headers, body


def iter_warc_records(raw: bytes):
    """Yield (headers: dict[lower str, str], block: bytes) per WARC
    record. Framing is Content-Length-driven (the spec's contract);
    stray bytes between records (padding, truncated tails) are skipped
    by scanning to the next ``WARC/`` version line."""
    n = len(raw)
    pos = 0
    while pos < n:
        nxt = raw.find(b"WARC/", pos)
        if nxt < 0:
            return
        head_end = raw.find(b"\r\n\r\n", nxt)
        if head_end < 0:
            return
        lines = raw[nxt:head_end].split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            pos = nxt + 5
            continue
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            name, sep, value = ln.partition(b":")
            if sep:
                headers[name.strip().lower().decode("latin-1")] = (
                    value.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            pos = head_end + 4
            continue
        block_start = head_end + 4
        block = raw[block_start : block_start + length]
        if len(block) < length:
            return  # truncated tail — surface what framed completely
        yield headers, block
        pos = block_start + length


def iter_warc_records_from(fileobj, chunk_size: int = 1 << 20):
    """Streaming twin of :func:`iter_warc_records`: yield (headers,
    block) from a FILE OBJECT, reading ``chunk_size`` bytes at a time
    and never holding more than one record (+ one chunk) in memory —
    the path that lifts ``binaryFile``'s 2 GiB-per-blob ceiling and its
    whole-blob materialization. Framing, header parsing, and
    stray-byte skipping are IDENTICAL to the in-memory iterator (same
    parsing decisions byte for byte), so the two paths are bit-exact on
    the same input; the equivalence is pinned by tests."""
    buf = bytearray()
    eof = False

    def fill(need: int) -> bool:
        nonlocal eof
        while len(buf) < need and not eof:
            chunk = fileobj.read(chunk_size)
            if not chunk:
                eof = True
                return len(buf) >= need
            buf.extend(chunk)
        return len(buf) >= need

    while True:
        # scan to the next version line (same contract as the in-memory
        # iterator: stray padding/truncated tails between records skip)
        while True:
            nxt = buf.find(b"WARC/")
            if nxt >= 0:
                del buf[:nxt]
                break
            if eof:
                return
            # keep the last 4 bytes — a marker could straddle the chunk seam
            del buf[: max(0, len(buf) - 4)]
            if not fill(len(buf) + 1):
                return
        # accumulate the full header (blank-line terminated)
        while True:
            head_end = buf.find(b"\r\n\r\n")
            if head_end >= 0:
                break
            if eof:
                return
            fill(len(buf) + 1)
        lines = bytes(buf[:head_end]).split(b"\r\n")
        if not lines[0].startswith(b"WARC/"):
            del buf[:5]
            continue
        headers: dict[str, str] = {}
        for ln in lines[1:]:
            name, sep, value = ln.partition(b":")
            if sep:
                headers[name.strip().lower().decode("latin-1")] = (
                    value.strip().decode("utf-8", "replace")
                )
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            del buf[: head_end + 4]
            continue
        if not fill(head_end + 4 + length):
            return  # truncated tail — surface what framed completely
        block = bytes(buf[head_end + 4 : head_end + 4 + length])
        del buf[: head_end + 4 + length]
        yield headers, block


def _maybe_gunzip(content: bytes) -> bytes:
    """Transparent for plain bytes; decompresses gzip, INCLUDING the
    Common Crawl one-member-per-record concatenation."""
    if content[:2] == b"\x1f\x8b":
        return gzip.decompress(content)
    return content


def _record_row(path: str, headers: dict, block: bytes, want) -> dict | None:
    """(headers, block) → one WARC_DDL row dict, or None when filtered.
    Shared by the in-memory, path-streaming, and streaming-landing paths
    so every reader builds IDENTICAL rows."""
    wtype = headers.get("warc-type", "")
    if want is not None and wtype.lower() not in want:
        return None
    status, http_headers, body = parse_http_response(block)
    payload = body if status is not None else block
    return {
        "warc_type": wtype,
        "record_id": headers.get("warc-record-id"),
        "warc_date": headers.get("warc-date"),
        "target_uri": headers.get("warc-target-uri"),
        "content_type": headers.get("content-type"),
        "content_length": int(headers["content-length"]),
        "http_status": status,
        "http_content_type": http_headers.get("content-type"),
        "payload": payload,
        "payload_text": payload.decode("utf-8", "replace"),
        "_kpf_source": path,
    }


def records_to_rows(path: str, content: bytes, record_types):
    """One WARC blob → list of row dicts (the WARC_DDL columns). A blob
    whose gzip framing is corrupt quarantines as zero rows — one bad
    archive must not fail the task holding ten thousand good ones (the
    reject-stream posture; truncated TAILS already surface what framed
    completely)."""
    want = {t.lower() for t in record_types} if record_types else None
    try:
        raw = _maybe_gunzip(bytes(content))
    except (OSError, EOFError, zlib.error):
        return []
    rows = []
    for headers, block in iter_warc_records(raw):
        row = _record_row(path, headers, block, want)
        if row is not None:
            rows.append(row)
    return rows


def parse_warc_blobs(
    blobs: DataFrame, record_types=("response",)
) -> DataFrame:
    """(path, content) blob rows → one typed row per WARC record.

    Arrow-batched ``mapInPandas``, pure map stage: each blob's records
    never leave the task that read it — the plan is scan + project at
    any corpus size, and filtering to ``record_types`` (default:
    ``response`` only, the records a text pipeline wants) happens before
    any bytes are materialized into rows. ``record_types=None`` keeps
    everything (warcinfo/request/metadata included)."""
    import pandas as pd

    def batches(it):
        for pdf in it:
            out = []
            for p, content in zip(pdf["path"], pdf["content"]):
                out.extend(records_to_rows(p, content, record_types))
            cols = [c.split()[0] for c in WARC_DDL.split(", ")]
            res = pd.DataFrame(out, columns=cols)
            res["warc_date"] = pd.to_datetime(
                res["warc_date"], format="ISO8601", errors="coerce", utc=True
            ).dt.tz_localize(None)
            yield res

    return blobs.select("path", "content").mapInPandas(batches, WARC_DDL)


# Spark's binaryFile source materializes each file as ONE byte array whose
# length must fit a JVM array (Int.MaxValue) — the in-memory path's hard
# per-blob ceiling. Module constant so tests can exercise the guard.
BINARYFILE_MAX_BYTES = 2_147_483_647


def _open_for_records(path: str):
    """Open a worker-local path for incremental record reading. Strips
    the ``file:`` scheme Spark's listers emit; ``.gz`` wraps in
    GzipFile (multi-member concatenation — the Common Crawl layout —
    decompresses transparently and incrementally).

    Stream mode reads through Python's ``open`` inside the worker, so it
    covers filesystems the worker OS can address (local disks, NFS/
    fuse-mounted object stores — the common >2 GiB-archive deployments).
    A bare remote scheme (s3://, abfss://, hdfs://) has no Python-side
    client here; refuse with the workaround named rather than surfacing
    a bewildering FileNotFoundError from ``open``."""
    p = path
    if p.startswith("file://"):
        p = p[7:]
    elif p.startswith("file:"):
        p = p[5:]
    scheme = p.split("://", 1)[0] if "://" in p else ""
    if scheme:
        raise NotImplementedError(
            f"read_warc(stream=True) opens files with the worker's own "
            f"filesystem and cannot address the '{scheme}://' scheme "
            "directly; mount the store (fuse/NFS) or, for files under "
            "the 2 GiB binaryFile ceiling, use stream=False"
        )
    f = open(p, "rb")
    if p.endswith(".gz"):
        return gzip.GzipFile(fileobj=f)
    return f


def stream_warc_paths(
    paths: DataFrame, record_types=("response",)
) -> DataFrame:
    """(path) rows → one typed row per WARC record, opening each file
    INSIDE the worker and iterating records incrementally
    (:func:`iter_warc_records_from`) — never materializing a whole blob.
    This is the >2 GiB-archive path: memory per task is one record plus
    one read chunk, regardless of file size. Rows are bit-identical to
    :func:`parse_warc_blobs` on the same files (shared ``_record_row``
    builder + framing-equivalent iterators; pinned by tests)."""
    import pandas as pd

    want = {t.lower() for t in record_types} if record_types else None
    cols = [c.split()[0] for c in WARC_DDL.split(", ")]

    def batches(it):
        for pdf in it:
            out = []
            for p in pdf["path"]:
                with _open_for_records(p) as f:
                    for headers, block in iter_warc_records_from(f):
                        row = _record_row(p, headers, block, want)
                        if row is not None:
                            out.append(row)
            res = pd.DataFrame(out, columns=cols)
            res["warc_date"] = pd.to_datetime(
                res["warc_date"], format="ISO8601", errors="coerce", utc=True
            ).dt.tz_localize(None)
            yield res

    return paths.select("path").mapInPandas(batches, WARC_DDL)


def read_warc(
    spark: SparkSession,
    path: str,
    record_types=("response",),
    stream: bool = False,
) -> DataFrame:
    """Read a WARC directory/glob (``.warc`` / ``.warc.gz``) as a typed
    DataFrame with ``_kpf_source`` lineage — the crawl→text pipeline's
    first reader; compose with ``textprep.html_extract`` on
    ``payload_text`` for main-content extraction.

    ``stream=False`` (default) rides ``binaryFile`` — one task per blob,
    the Common Crawl ~1 GiB distribution unit — and materializes each
    blob once per task. That source hard-caps a file at
    ``BINARYFILE_MAX_BYTES`` (a JVM byte-array limit); oversized files
    raise a clear ValueError here, at the engine surface, instead of a
    Spark-internal error mid-job. ``stream=True`` distributes PATHS and
    opens each file inside the worker, iterating records incrementally —
    no per-file size ceiling and no whole-blob memory spike; results are
    bit-identical. The listing itself is metadata-only either way
    (``binaryFile`` prunes the content column when only path/length are
    selected)."""
    bf = spark.read.format("binaryFile").load(path)
    if stream:
        n = max(1, len(bf.select("path").inputFiles()) or 1)
        # one file per task (records decode where the file is opened)
        return stream_warc_paths(
            bf.select("path").repartition(min(n, 10_000), "path"),
            record_types,
        )
    over = (
        bf.selectExpr("max(length) AS m").first().m or 0
    )  # metadata-only: binaryFile prunes content for status-level columns
    if over > BINARYFILE_MAX_BYTES:
        raise ValueError(
            f"read_warc: an input file is {over} bytes, past the "
            f"binaryFile per-blob ceiling ({BINARYFILE_MAX_BYTES}); "
            "pass stream=True to read it incrementally (path-streaming "
            "mode has no per-file limit)"
        )
    return parse_warc_blobs(bf, record_types)


# --------------------------------------------------- fixture-forging writer


def warc_record_bytes(
    uri: str,
    body: bytes,
    date: str = "2024-01-01T00:00:00Z",
    record_id: str | None = None,
    warc_type: str = "response",
    http_content_type: str = "text/html; charset=utf-8",
    content_type: str | None = None,
) -> bytes:
    """One spec-shaped record for fixtures/tests (response records wrap
    the body in an HTTP/1.1 200 message, like a crawler capture).
    ``content_type`` overrides the record-level Content-Type header —
    WET conversion records declare ``text/plain``, WAT metadata records
    ``application/json`` (the Common Crawl sidecar conventions)."""
    if warc_type == "response":
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: "
            + http_content_type.encode()
            + b"\r\nContent-Length: "
            + str(len(body)).encode()
            + b"\r\n\r\n"
            + body
        )
        block, ctype = http, "application/http; msgtype=response"
    else:
        block, ctype = body, "application/octet-stream"
    if content_type is not None:
        ctype = content_type
    rid = record_id or f"<urn:uuid:{abs(hash(uri)) % 10**12}>"
    head = (
        f"WARC/1.1\r\nWARC-Type: {warc_type}\r\nWARC-Record-ID: {rid}\r\n"
        f"WARC-Date: {date}\r\nWARC-Target-URI: {uri}\r\n"
        f"Content-Type: {ctype}\r\nContent-Length: {len(block)}\r\n\r\n"
    )
    return head.encode() + block + b"\r\n\r\n"


def write_warc(records, gzip_per_record: bool = False) -> bytes:
    """Concatenate forged records into one WARC blob; with
    ``gzip_per_record`` each record becomes its own gzip member (the
    Common Crawl convention). Level 1: fixture forging is CPU-bound on
    compression and the reader must handle any valid member anyway."""
    if gzip_per_record:
        return b"".join(gzip.compress(r, compresslevel=1) for r in records)
    return b"".join(records)

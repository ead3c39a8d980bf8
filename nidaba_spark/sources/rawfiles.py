"""Raw-crawl ingestion: a directory of page files → the pages schema.

The web-scale shape (SURVEY.md §2B B3): WARC-split drops land as raw
files; `spark.read.format('binaryFile')` gives (path, modificationTime,
length, content) with the blob untouched — no decode until the
pipeline's own charset stage, which is the point (the crawler cannot
be trusted to know the encoding). Analog of nidaba's storage ingest
(reference: nidaba/storage.py StorageFile creation from uploads).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_raw_pages(
    spark: SparkSession,
    path: str,
    glob: str = "*.html",
    default_lang: str = "und",
) -> DataFrame:
    """binaryFile directory → pages(url, warc_ts, html, text, lang).

    url = file path, warc_ts = file mtime, crawler text = null (the
    pipeline's fallback column is simply absent for raw drops).
    """
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )
    return raw.select(
        F.col("path").alias("url"),
        F.col("modificationTime").alias("warc_ts"),
        F.col("content").alias("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(default_lang).alias("lang"),
    )


# --------------------------------------------------------------- WARC
# Minimal ISO 28500 (WARC/1.0-1.1) reader for Common-Crawl-style
# drops: one file = many concatenated records, each
#   WARC/1.x CRLF  (header: value CRLF)*  CRLF  <Content-Length bytes>
#   CRLF CRLF
# `response` records carry an HTTP response as payload (body after
# the first CRLFCRLF); `conversion` records (WET) carry plain text.
# Whole-file gzip and Common Crawl's member-per-record gzip both
# decode via one zlib decompressobj loop (concatenated members).
#
# Scale note: binaryFile hands a WHOLE file to one task, so the unit
# of parallelism is the WARC file — exactly how Common Crawl ships
# (tens of thousands of ~1 GB segments per crawl; fleet-wide that is
# plenty of tasks, and `spark.sql.files.maxPartitionBytes` is
# irrelevant since files are indivisible here). A single mega-WARC
# would need the per-record-gzip property to byte-split; that reader
# variant is a documented seam, not needed for CC-shaped input.


_GZ_CHUNK0 = 1 << 16  # first feed per gzip member: 64 KiB
_GZ_CHUNK_MAX = 1 << 22  # per-feed cap once a member proves large


def _decompress_member(d, mv, pos, n):
    """Feed one gzip member from ``mv[pos:]`` into decompressobj ``d``
    in exponentially-growing chunks (64 KiB → 4 MiB). Returns
    (parts, fed): decoded byte chunks and the absolute offset fed so
    far. The overshoot past the member's end — which zlib hands back
    as a COPIED ``unused_data`` — is bounded by the last chunk, so a
    CC-typical ~20 KiB member costs one 64 KiB copy instead of a copy
    of the entire remaining segment."""
    parts = []
    fed, step = pos, _GZ_CHUNK0
    while not d.eof and fed < n:
        take = min(step, n - fed)
        parts.append(d.decompress(mv[fed:fed + take]))
        fed += take
        step = min(step * 2, _GZ_CHUNK_MAX)
    parts.append(d.flush())
    return parts, fed


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (CC per-record gzip).

    Tolerant at the tail like the record parser: a truncated or
    corrupt trailing member (partial download) yields everything
    decoded so far; trailing non-gzip garbage stops the loop.

    Fed in bounded chunks off a zero-copy memoryview: the naive
    ``d.decompress(data); data = d.unused_data`` loop copies the
    ENTIRE remaining buffer per member (slice in, ``unused_data``
    out) — O(bytes × members) memcpy, which on a CC-shaped segment
    (~1 GB, ~50k members) is terabytes of copying per task. Chunked
    feeding caps the per-member overshoot at one chunk, so the whole
    scan is O(bytes)."""
    import zlib

    mv = memoryview(data)
    out = []
    pos, n = 0, len(mv)
    while pos < n and bytes(mv[pos:pos + 2]) == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            parts, fed = _decompress_member(d, mv, pos, n)
        except zlib.error:
            break
        out.extend(parts)
        if not d.eof:
            break  # truncated final member (partial output kept)
        pos = fed - len(d.unused_data)
    return b"".join(out)


def _parse_plain_located(data: bytes):
    """Yield (headers, payload, offset, length) per UNCOMPRESSED WARC
    record, where offset/length span the record's bytes including its
    trailing CRLFCRLF — the range that re-parses standalone."""
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos:pos + 5] != b"WARC/":
            break  # trailing padding/garbage
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0:
            break  # truncated mid-header (partial download tail)
        headers = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            # header NAMES get the same tolerant decode as values — a
            # single mojibake byte must not kill the whole file's task
            headers[k.strip().decode("utf-8", "replace").lower()] = v.strip().decode(
                "utf-8", "replace"
            )
        length = int(headers["content-length"])
        body_start = head_end + 4
        if body_start + length > n:
            break  # truncated mid-payload — drop the partial record
        rec_end = min(body_start + length + 4, n)
        yield headers, data[body_start:body_start + length], pos, rec_end - pos
        pos = body_start + length + 4  # skip the record's CRLFCRLF


def parse_warc_records(data: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record.

    Pure function of the bytes (unit-tested without Spark). Tolerates
    trailing garbage after the last record; raises on a record with a
    missing/invalid Content-Length (framing is not recoverable).
    Gzip'd input is decompressed as a WHOLE (cross-member records
    tolerated); use parse_warc_records_located when the per-member
    byte ranges matter."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
    for headers, payload, _off, _ln in _parse_plain_located(data):
        yield headers, payload


def _iter_gzip_members(data: bytes):
    """(offset, length, decompressed bytes) per gzip member — the
    compressed byte ranges CC's CDX stores, each independently
    range-fetchable. Truncated/corrupt tail members stop the loop
    (same tolerance as _gunzip_members). Chunk-fed off a memoryview
    for the same O(bytes × members) → O(bytes) reason as
    _gunzip_members."""
    import zlib

    mv = memoryview(data)
    pos, n = 0, len(mv)
    while pos < n and bytes(mv[pos:pos + 2]) == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            parts, fed = _decompress_member(d, mv, pos, n)
        except zlib.error:
            break
        if not d.eof:
            break  # truncated final member
        end = fed - len(d.unused_data)
        yield pos, end - pos, b"".join(parts)
        pos = end


def parse_warc_records_located(data: bytes):
    """parse_warc_records plus the (offset, length) byte range of the
    ORIGINAL file that independently contains each record: the gzip
    member for member-gzip'd archives (range-request it, gunzip, get
    the record — exactly what Common Crawl's CDX offsets mean), the
    record span for plain WARCs. A nonstandard multi-record member
    yields that member's whole range for each of its records."""
    if data[:2] == b"\x1f\x8b":
        # a member whose bytes start mid-record means the archive is
        # NOT member-aligned — its per-member offsets would be
        # meaningless and silently yielding nothing loses every
        # record (review r05). A non-aligned LAST member is the
        # truncated-tail case the whole parser family tolerates; a
        # non-aligned MIDDLE member is structural and fails loudly.
        pending = None
        saw_warc_member = False
        for m in _iter_gzip_members(data):
            if pending is not None:
                moff, mlen, raw = pending
                if not raw.startswith(b"WARC/"):
                    raise ValueError(
                        "gzip member at offset %d does not start a WARC "
                        "record: the archive is not member-aligned, so "
                        "per-member byte ranges are meaningless — read "
                        "it with parse_warc_records/read_warc_pages "
                        "instead" % moff
                    )
                saw_warc_member = True
                for headers, payload, _o, _l in _parse_plain_located(raw):
                    yield headers, payload, moff, mlen
            pending = m
        if pending is not None:
            moff, mlen, raw = pending
            if raw.startswith(b"WARC/"):
                for headers, payload, _o, _l in _parse_plain_located(raw):
                    yield headers, payload, moff, mlen
            elif not saw_warc_member:
                # a SOLE non-WARC member is not a truncated tail — it
                # is the not-member-aligned (or not-WARC-at-all) case,
                # and tolerating it silently yields zero records from
                # the whole file (ADVICE r05 #3); the lenient tail
                # path only applies once earlier members proved the
                # archive member-aligned
                raise ValueError(
                    "gzip member at offset %d does not start a WARC "
                    "record and is the archive's only member: not a "
                    "member-aligned WARC — read it with "
                    "parse_warc_records/read_warc_pages instead" % moff
                )
            # else: truncated/corrupt tail member after >=1 aligned
            # member — tolerated, like the non-located parsers
    else:
        yield from _parse_plain_located(data)


def _http_split(payload: bytes):
    """(header block, body) of an HTTP payload. Header/body separator
    is the first CRLFCRLF **or bare LFLF** — noncompliant servers emit
    bare-LF headers and crawl archives store them verbatim, so a
    CRLF-only split would silently leak the header block into the
    body (and lose Location/Content-Type in _http_meta)."""
    sep_crlf = payload.find(b"\r\n\r\n")
    sep_lf = payload.find(b"\n\n")
    if sep_crlf >= 0 and (sep_lf < 0 or sep_crlf <= sep_lf):
        return payload[:sep_crlf], payload[sep_crlf + 4:]
    if sep_lf >= 0:
        return payload[:sep_lf], payload[sep_lf + 2:]
    return payload, None


def _http_body(payload: bytes) -> bytes:
    """Body of an HTTP response payload (after its header block).
    Chunked transfer decoding is out of scope for crawl archives —
    CC stores identity bodies; seam documented. Non-HTTP-framed
    payloads pass through whole — a raw dump's own blank lines must
    not truncate it."""
    if not payload.startswith(b"HTTP/"):
        return payload
    _head, body = _http_split(payload)
    return payload if body is None else body


def _http_meta(payload: bytes):
    """(status, mime, location, etag, last_modified) from an HTTP
    response payload's header block; all-None when the payload is not
    HTTP-framed. mime is the Content-Type media type lowercased with
    parameters (charset=...) stripped; location is the raw Location
    header value (resolution against the capture url is the
    consumer's step — operators/links.redirect_edges); etag /
    last_modified are the raw validator values a recrawler echoes
    back in If-None-Match / If-Modified-Since. First occurrence of
    each header wins; a non-numeric status token yields status None
    rather than a task kill; bare-LF header lines parse the same as
    CRLF (crawl archives contain every malformation)."""
    if not payload.startswith(b"HTTP/"):
        return None, None, None, None, None
    head, _body = _http_split(payload)
    lines = head.replace(b"\r\n", b"\n").split(b"\n")
    parts = lines[0].split(None, 2)
    status = int(parts[1]) if len(parts) >= 2 and parts[1].isdigit() else None
    mime = location = etag = last_modified = None
    for line in lines[1:]:
        k, _, v = line.partition(b":")
        k = k.strip().lower()
        if k == b"content-type" and mime is None:
            mime = (
                v.split(b";", 1)[0].strip().decode("utf-8", "replace").lower()
                or None
            )
        elif k == b"location" and location is None:
            location = v.strip().decode("utf-8", "replace") or None
        elif k == b"etag" and etag is None:
            etag = v.strip().decode("utf-8", "replace") or None
        elif k == b"last-modified" and last_modified is None:
            last_modified = v.strip().decode("utf-8", "replace") or None
    return status, mime, location, etag, last_modified


# ----------------------------------------------------------- WET egress
# The writer half of the WARC/WET story: emit an extracted corpus AS
# Common-Crawl-shaped WET segment files (`conversion` records), so the
# engine's output can feed any tool that already consumes CC WET drops
# — including this repo's own read_warc_pages, which pins the
# round-trip byte-identically in tests/test_sources.py.


def wet_record_bytes(url: str, ts_iso: str, text: str) -> bytes:
    """One ISO 28500 `conversion` record, deterministically.

    WARC-Record-ID is a urn:uuid derived from md5(url, ts) — stable
    across runs (no wall-clock, no random), so re-writing the same
    corpus yields byte-identical segments. Content-Length counts the
    UTF-8 payload bytes, exactly what parse_warc_records re-frames on.
    """
    import hashlib
    import uuid

    payload = text.encode("utf-8")
    rid = uuid.UUID(bytes=hashlib.md5((url + "\x00" + ts_iso).encode("utf-8")).digest())
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: conversion\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts_iso}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        "Content-Type: text/plain\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def _wet_warcinfo_bytes(filename: str) -> bytes:
    """The segment-leading `warcinfo` record CC WET files carry (the
    reader skips non-conversion types, so it costs the round-trip
    nothing, and keeps the files shaped like real CC drops)."""
    import hashlib
    import uuid

    body = (
        "software: nidaba-spark\r\n"
        "format: WARC File Format 1.0\r\n"
        f"isPartOf: {filename}\r\n"
    ).encode("utf-8")
    rid = uuid.UUID(bytes=hashlib.md5(filename.encode("utf-8")).digest())
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: warcinfo\r\n"
        f"WARC-Filename: {filename}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        "Content-Type: application/warc-fields\r\n"
        f"Content-Length: {len(body)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + body + b"\r\n\r\n"


def write_wet(
    docs: DataFrame,
    out_dir: str,
    num_segments: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    text_col: str = "text",
    gzip_members: bool = True,
) -> DataFrame:
    """Write docs as ``num_segments`` WET segment files + a manifest.

    Layout follows how Common Crawl itself ships text: the corpus is
    cut into segment files (CC uses ~1 GB each — pick num_segments =
    total_bytes/1e9 at scale), each a concatenation of `conversion`
    records, per-record-gzip'd by default (CC's framing: one gzip
    member per record, so segments are byte-splittable and the
    tolerant reader recovers a truncated tail).

    Determinism end-to-end: rows are assigned to segments by the same
    md5-uniform permutation shard_assign uses (pure function of url —
    reproducible regardless of upstream partitioning), ordered within
    a segment by that hash, and every record's bytes are a pure
    function of (url, warc_ts, text) — so two runs over the same
    corpus produce byte-identical files, pinned by the manifest's
    sha256.

    Executes ONE job: applyInPandas over segment groups — each task
    writes its group to ``<out_dir>/wet-{seg:05d}.warc.wet[.gz]``
    (note applyInPandas materializes the whole group in the task, so
    a segment must fit in executor memory — CC's ~1 GB segment
    convention is comfortably inside any sane executor; don't set
    num_segments so low that segments grow past that)
    (tmp file + atomic rename, so a retried/speculated task cannot
    leave a torn segment) and returns the manifest row. Returns the
    manifest DataFrame (segment, path, n_records, n_bytes, sha256),
    already materialized. Segment sizes are balanced to ±O(sqrt) by
    the uniform hash — no skew key exists. Local/NFS filesystem
    writes; an object-store/HDFS variant is a deploy seam (same
    record bytes through the Hadoop FS API), like sources/iceberg.

    Timestamps are formatted as UTC-naive ISO8601 'Z' (the corpus's
    TIMESTAMP_NTZ face value — see NOTES.md on NTZ); null text writes
    an empty payload, null url an empty URI.
    """
    slim = docs.select(
        F.col(url_col).alias("url"),
        F.date_format(F.col(ts_col), "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("ts_iso"),
        F.col(text_col).alias("text"),
    )
    return _write_warc_segments(
        slim,
        out_dir,
        num_segments,
        prefix="wet",
        suffix=".warc.wet.gz" if gzip_members else ".warc.wet",
        record_cols=("url", "ts_iso", "text"),
        record_fn=wet_record_bytes,
        gz=bool(gzip_members),
        salt="wet",
    )


def wat_record_bytes(url: str, ts_iso: str, payload_json: str) -> bytes:
    """One ISO 28500 `metadata` record carrying a WAT JSON envelope.

    Deterministic like wet_record_bytes: WARC-Record-ID derives from
    md5(url, ts, 'wat'); WARC-Refers-To is the id the SAME page's
    conversion/response record gets from wet_record_bytes' md5(url,
    ts) — so a WET+WAT export pair cross-references without either
    writer seeing the other's output."""
    import hashlib
    import uuid

    payload = payload_json.encode("utf-8")
    rid = uuid.UUID(
        bytes=hashlib.md5((url + "\x00" + ts_iso + "\x00wat").encode("utf-8")).digest()
    )
    ref = uuid.UUID(bytes=hashlib.md5((url + "\x00" + ts_iso).encode("utf-8")).digest())
    head = (
        "WARC/1.0\r\n"
        "WARC-Type: metadata\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts_iso}\r\n"
        f"WARC-Record-ID: <urn:uuid:{rid}>\r\n"
        f"WARC-Refers-To: <urn:uuid:{ref}>\r\n"
        "Content-Type: application/json\r\n"
        f"Content-Length: {len(payload)}\r\n"
        "\r\n"
    ).encode("utf-8")
    return head + payload + b"\r\n\r\n"


def write_wat(
    pages: DataFrame,
    out_dir: str,
    num_segments: int,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
    gzip_members: bool = True,
) -> DataFrame:
    """Write per-page WAT metadata segments (the third Common-Crawl
    artifact, next to WET text and the CDX capture index): one
    `metadata` record per page whose JSON envelope carries the head
    metadata (title, robots meta, canonical link) and the resolved
    outlinks with anchor text — everything a link-graph or
    frontier-generation consumer needs WITHOUT re-shipping page bytes.

    The envelope is built entirely JVM-side (operators/links.page_wat:
    regexp extracts + higher-order array transforms + to_json, one
    narrow codegen'd scan of html — no explode, no shuffle beyond the
    segment exchange); the Python task only frames and gzips, same as
    write_wet. Determinism, atomicity, manifest: see write_wet — the
    writer is shared (_write_warc_segments). Returns the materialized
    manifest (segment, path, n_records, n_bytes, sha256)."""
    from ..operators.links import page_wat

    slim = page_wat(pages, url_col=url_col, ts_col=ts_col, html_col=html_col)
    return _write_warc_segments(
        slim,
        out_dir,
        num_segments,
        prefix="wat",
        suffix=".warc.wat.gz" if gzip_members else ".warc.wat",
        record_cols=("url", "ts_iso", "wat_json"),
        record_fn=wat_record_bytes,
        gz=bool(gzip_members),
        # same salt as write_wet ON PURPOSE: the md5-uniform permutation
        # is then identical, so page P lands in wat-00007 exactly when
        # its text landed in wet-00007 — paired segment files, like CC's
        # own WET/WAT segment correspondence
        salt="wet",
    )


def _write_warc_segments(
    slim: DataFrame,
    out_dir: str,
    num_segments: int,
    prefix: str,
    suffix: str,
    record_cols: tuple,
    record_fn,
    gz: bool,
    salt: str,
) -> DataFrame:
    """Shared segment-file writer behind write_wet / write_wat.

    ``slim`` must carry a ``url`` column plus ``record_cols`` (url
    first); each record's bytes are ``record_fn(*cols)`` with nulls
    coerced to ''. One job: shard_assign (the md5-uniform permutation,
    pure function of url) then applyInPandas over segment groups —
    tmp-file + atomic-rename per segment, deterministic in-segment
    order, per-record gzip members when ``gz``. Returns the
    materialized manifest (segment, path, n_records, n_bytes, sha256).
    Scale/determinism rationale documented on write_wet."""
    import hashlib
    import os

    import pandas as pd

    from ..operators.packing import shard_assign

    os.makedirs(out_dir, exist_ok=True)
    # overwrite semantics, like write_cdx: stale segment files from a
    # previous run with more segments (or leftover .inprogress tmps
    # from a killed task) would otherwise survive and be ingested by
    # the readers' globs alongside the fresh export (review r05)
    for stale in os.listdir(out_dir):
        if (
            stale.startswith(f"{prefix}-") and stale.endswith(suffix)
        ) or ".inprogress." in stale:
            os.remove(os.path.join(out_dir, stale))
    payload_cols = list(record_cols)
    assigned = shard_assign(slim, num_segments, id_col="url", salt=salt)

    def _write_segment(key, pdf):
        import gzip as gzmod

        from pyspark import TaskContext

        seg = int(key[0])
        name = f"{prefix}-{seg:05d}{suffix}"
        final = os.path.join(out_dir, name)
        # tmp name carries the task ATTEMPT id: with speculation (or a
        # zombie straggler) two attempts for the same segment would
        # otherwise interleave writes into one inode and publish a
        # torn file; distinct tmp paths make the os.replace the only
        # contended step, and it is atomic (review r05)
        ctx = TaskContext.get()
        attempt = ctx.taskAttemptId() if ctx is not None else os.getpid()
        # dot-prefixed tmp: a leftover from a killed attempt must stay
        # invisible to the readers' globs and Spark's hidden-file
        # filter — '<final>.inprogress.N' matched '*.warc*' and was
        # ingested as a torn duplicate segment (review r05)
        tmp = os.path.join(out_dir, f".{name}.inprogress.{attempt}")
        # Duplicate url values share a uniform-hash key, so their
        # individual shard_pos assignments are arbitrary per run; the
        # BLOCK of positions they occupy is deterministic (contiguous
        # in the u-order). Order by the block start, then the payload
        # columns, so byte-determinism holds even for un-deduped
        # inputs (review r05).
        pdf = pdf.assign(
            _upos=pdf.groupby("url")["shard_pos"].transform("min")
        ).sort_values(["_upos"] + payload_cols)
        h = hashlib.sha256()
        n_bytes = 0
        with open(tmp, "wb") as f:
            # frame→compress→write one record at a time: buffering
            # every framed record first doubled per-task peak memory
            # on top of the pandas group (review r05). mtime=0: gzip's
            # default header stamps wall-clock time, which would
            # break byte-determinism.
            def _emit(c: bytes) -> None:
                nonlocal n_bytes
                data = gzmod.compress(c, 6, mtime=0) if gz else c
                f.write(data)
                h.update(data)
                n_bytes += len(data)

            _emit(_wet_warcinfo_bytes(name))
            for tup in zip(*(pdf[c] for c in payload_cols)):
                _emit(record_fn(*(v or "" for v in tup)))
        os.replace(tmp, final)
        return pd.DataFrame(
            {
                "segment": [seg],
                "path": [final],
                "n_records": [len(pdf)],
                "n_bytes": [n_bytes],
                "sha256": [h.hexdigest()],
            }
        )

    manifest = assigned.groupBy("shard_id").applyInPandas(
        _write_segment,
        "segment int, path string, n_records long, n_bytes long, sha256 string",
    )
    # materialize: the writes ARE the job; hand back the small result
    # as a fresh local DataFrame (reusing the lazy plan would re-run
    # the write job on every downstream action)
    rows = manifest.collect()
    return slim.sparkSession.createDataFrame(rows, manifest.schema)


def read_warc_pages(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    default_lang: str = "und",
) -> DataFrame:
    """WARC/WET drops → pages(url, warc_ts, html, text, lang).

    `response` records land their HTTP body in ``html`` (undecoded —
    the pipeline's charset stage owns decoding); `conversion` (WET)
    records land their text payload in ``text`` with html empty, so a
    WET-only corpus flows through the extract pipeline's crawler-text
    fallback. Other record types (warcinfo, request, metadata) are
    skipped. Arrow-batched mapInPandas over binaryFile rows; one task
    per WARC file (see scale note above).
    """
    import pandas as pd

    def _records(batches):
        for pdf in batches:
            rows = {"url": [], "warc_ts": [], "html": [], "text": [], "lang": []}
            for content in pdf["content"]:
                for h, payload in parse_warc_records(bytes(content)):
                    rtype = h.get("warc-type", "")
                    if rtype not in ("response", "conversion"):
                        continue
                    rows["url"].append(h.get("warc-target-uri", ""))
                    # utc=True normalizes 'Z' AND '+hh:mm' offsets to
                    # one tz, errors='coerce' turns malformed dates
                    # into NaT — mixed-offset or junk dates must not
                    # produce an object column (Arrow would reject it)
                    # or kill the task (review-pass finding)
                    ts = pd.to_datetime(
                        h.get("warc-date"), utc=True, errors="coerce"
                    )
                    rows["warc_ts"].append(
                        ts.tz_localize(None) if ts is not pd.NaT else pd.NaT
                    )
                    if rtype == "response":
                        rows["html"].append(_http_body(payload))
                        rows["text"].append(None)
                    else:
                        rows["html"].append(b"")
                        rows["text"].append(payload.decode("utf-8", "replace"))
                    rows["lang"].append(default_lang)
            yield pd.DataFrame(rows)

    raw = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    ).select("content")
    return raw.mapInPandas(
        _records,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )


def read_warc_responses(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
) -> DataFrame:
    """WARC drops → the HTTP-layer view of `response` records:
    (url, warc_ts, status, mime, location, etag, last_modified, html).

    What read_warc_pages throws away on purpose (its consumers want
    page bytes), this reader keeps: the HTTP status code, the
    Content-Type media type (parameters stripped, lowercased), the
    raw Location header, and the ETag / Last-Modified validators —
    the inputs for redirect-alias resolution (operators/links.
    redirect_edges), mime-aware CDX records (build_cdx(mime_col=...)),
    status-filtered extraction (a 404's body is error boilerplate,
    not content), and conditional-recrawl scheduling (operators/
    snapshot.fetch_validators: echo the validators back as
    If-None-Match / If-Modified-Since and a 304 costs headers, not a
    body). Non-HTTP-framed payloads get null HTTP columns with the
    whole payload as html — same tolerance as _http_body. Same
    one-task-per-WARC-file Arrow-batched scan as the sibling
    readers."""
    import pandas as pd

    def _records(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "url": [], "warc_ts": [], "status": [], "mime": [],
                "location": [], "etag": [], "last_modified": [], "html": [],
            }
            for content in pdf["content"]:
                for h, payload in parse_warc_records(bytes(content)):
                    if h.get("warc-type") != "response":
                        continue
                    rows["url"].append(h.get("warc-target-uri", ""))
                    ts = pd.to_datetime(
                        h.get("warc-date"), utc=True, errors="coerce"
                    )
                    rows["warc_ts"].append(
                        ts.tz_localize(None) if ts is not pd.NaT else pd.NaT
                    )
                    status, mime, location, etag, lastmod = _http_meta(payload)
                    rows["status"].append(status)
                    rows["mime"].append(mime)
                    rows["location"].append(location)
                    rows["etag"].append(etag)
                    rows["last_modified"].append(lastmod)
                    rows["html"].append(_http_body(payload))
            df = pd.DataFrame(rows)
            # all-null status must stay integer-typed for Arrow
            df["status"] = df["status"].astype("Int32")
            yield df

    raw = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    ).select("content")
    return raw.mapInPandas(
        _records,
        "url string, warc_ts timestamp, status int, mime string, "
        "location string, etag string, last_modified string, html binary",
    )


# ------------------------------------------- random-access capture serving
# The CDX story's other half (operators/cdx.py builds the index): a
# capture's (warc_file, offset, length) lets a lookup service read ONE
# gzip member / record span out of a petabyte archive with a ranged
# read — no segment scan. read_warc_captures surfaces those ranges at
# ingest; fetch_capture is the point read.


def read_warc_captures(
    spark: SparkSession,
    path: str,
    glob: str = "*.warc*",
    default_lang: str = "und",
) -> DataFrame:
    """read_warc_pages plus the addressing columns CC's CDX records:
    (url, warc_ts, html, text, lang, warc_file, offset, length) where
    offset/length span the gzip member (member-gzip'd segments) or
    record bytes (plain WARCs) inside ``warc_file``. Same one-task-
    per-file Arrow-batched scan; feed the result to
    operators/cdx.build_cdx with carry=('warc_file','offset','length')
    for a fully serveable index."""
    import pandas as pd

    def _records(batches):
        for pdf in batches:
            rows: dict[str, list] = {
                "url": [], "warc_ts": [], "html": [], "text": [],
                "lang": [], "warc_file": [], "offset": [], "length": [],
            }
            for fname, content in zip(pdf["path"], pdf["content"]):
                for h, payload, off, ln in parse_warc_records_located(
                    bytes(content)
                ):
                    rtype = h.get("warc-type", "")
                    if rtype not in ("response", "conversion"):
                        continue
                    rows["url"].append(h.get("warc-target-uri", ""))
                    ts = pd.to_datetime(
                        h.get("warc-date"), utc=True, errors="coerce"
                    )
                    rows["warc_ts"].append(
                        ts.tz_localize(None) if ts is not pd.NaT else pd.NaT
                    )
                    if rtype == "response":
                        rows["html"].append(_http_body(payload))
                        rows["text"].append(None)
                    else:
                        rows["html"].append(b"")
                        rows["text"].append(payload.decode("utf-8", "replace"))
                    rows["lang"].append(default_lang)
                    rows["warc_file"].append(fname)
                    rows["offset"].append(off)
                    rows["length"].append(ln)
            yield pd.DataFrame(rows)

    raw = (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    ).select("path", "content")
    return raw.mapInPandas(
        _records,
        "url string, warc_ts timestamp, html binary, text string, "
        "lang string, warc_file string, offset long, length long",
    )


def fetch_capture(
    spark: SparkSession, warc_file: str, offset: int, length: int
) -> tuple[dict, bytes]:
    """Point lookup on the serving path (CDX hit → one capture):
    opens the archive through the Hadoop FS layer (file://, hdfs://,
    s3a:// alike), seeks to the stored range, reads ``length`` bytes,
    and parses the single record they contain. Driver-side by design
    — this is the millisecond random read a lookup service does per
    request, not a Spark job. Returns (headers, payload) of the
    record (the HTTP body for `response` captures)."""
    sc = spark.sparkContext
    jvm = sc._jvm
    p = jvm.org.apache.hadoop.fs.Path(warc_file)
    fs = p.getFileSystem(sc._jsc.hadoopConfiguration())
    stream = fs.open(p)
    try:
        stream.seek(offset)
        data = bytes(
            jvm.org.apache.commons.io.IOUtils.toByteArray(stream, length)
        )
    finally:
        stream.close()
    for headers, payload in parse_warc_records(data):
        if headers.get("warc-type") == "response":
            return headers, _http_body(payload)
        return headers, payload
    raise ValueError(
        f"no WARC record at {warc_file}:{offset}+{length} "
        "(stale index or wrong archive?)"
    )

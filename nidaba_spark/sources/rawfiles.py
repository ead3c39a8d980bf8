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


def _gunzip_members(data: bytes) -> bytes:
    """Decompress concatenated gzip members (CC per-record gzip).

    Tolerant at the tail like the record parser: a truncated or
    corrupt trailing member (partial download) yields everything
    decoded so far; trailing non-gzip garbage stops the loop."""
    import zlib

    out = []
    while data[:2] == b"\x1f\x8b":
        d = zlib.decompressobj(wbits=31)
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error:
            break
        data = d.unused_data
    return b"".join(out)


def parse_warc_records(data: bytes):
    """Yield (headers: dict, payload: bytes) per WARC record.

    Pure function of the bytes (unit-tested without Spark). Tolerates
    trailing garbage after the last record; raises on a record with a
    missing/invalid Content-Length (framing is not recoverable)."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data)
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
        yield headers, data[body_start:body_start + length]
        pos = body_start + length + 4  # skip the record's CRLFCRLF


def _http_body(payload: bytes) -> bytes:
    """Body of an HTTP response payload (after its header block).
    Chunked transfer decoding is out of scope for crawl archives —
    CC stores identity bodies; seam documented."""
    sep = payload.find(b"\r\n\r\n")
    return payload[sep + 4:] if sep >= 0 else payload


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

"""CDX capture index over a crawl table — the web-archive lookup
artifact (Common Crawl's ``cdx-NNNNN.gz`` shards + ``cluster.idx``)
re-expressed as a globally key-sorted parquet table.

A CDX index answers "which captures exist for this URL (or URL
prefix), and where" without scanning the crawl. Its key is the SURT
(Sort-friendly URI Reordering Transform) of the URL — host labels
reversed and comma-joined so one domain's captures are contiguous
under a plain lexicographic sort: ``https://www.Example.COM/a?b=2&a=1``
→ ``com,example)/a?a=1&b=2``.

Spark-first shape: ``surt_key`` is pure string/array expressions
(lower / regexp_extract / split / reverse / array_join / array_sort)
— whole-stage-codegen'd, zero Python, and the page scan reads only
(url, ts, payload). ``build_cdx`` then range-partitions by (surt, ts)
and sorts within partitions: the ONE shuffle a global sort needs, and
the output is exactly the Common Crawl shard layout — N files, each
internally sorted, with disjoint key ranges across files. Lookups
(``cdx_lookup``) are a parquet scan with a StartsWith/range predicate:
sortedness makes parquet row-group min/max stats surgical, so a
prefix probe reads a handful of row groups out of a 10^12-capture
index instead of scanning it (the distributed analog of the binary
search ``cluster.idx`` exists for). ``cdx_cluster_index`` emits that
summary — first key + capture count per shard — as a tiny driver-side
manifest (P rows for P shards, like the packing offsets).

SURT subset implemented (documented deviations from the full IA
canonicalizer, each irrelevant to key locality): leading ``www.`` and
leading/trailing host dots are stripped (``example.com.`` — the FQDN
trailing-dot form — keys identically to ``example.com``); a
NON-default port is kept as ``:port`` after the reversed host while
the scheme's default (http:80 / https:443) is dropped so explicit-
default captures sort with their plain siblings; path+query are
lowercased; query params are ampersand-split, empties dropped,
sorted, rejoined; fragments drop; IPv6 literal hosts and
percent-encoding normalization are out of scope. Scheme and userinfo
never reach the key (captures of http/https variants of one URL sort
adjacent, as in real CDX).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# host[:port] of an absolute URL, userinfo excluded
_HOSTPORT_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)"
# scheme://authority prefix (for stripping down to path?query#frag)
_ORIGIN_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*"

def surt_key(url: Column) -> Column:
    """SURT key of an absolute URL as one codegen expression tree
    (see module docstring for the exact subset). Non-absolute inputs
    (no ``scheme://host``) yield NULL — callers filter them."""
    u = F.trim(url)
    scheme = F.lower(F.regexp_extract(u, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    hostport = F.regexp_extract(u, _HOSTPORT_RE, 1)
    host = F.lower(F.substring_index(hostport, ":", 1))
    # FQDN trailing dot (and any stray leading dot) first, so
    # 'example.com.' keys with 'example.com' instead of minting a
    # malformed ',com,example)' key outside every lookup prefix
    host = F.regexp_replace(host, r"^\.+|\.+$", "")
    host = F.regexp_replace(host, r"^www\.", "")
    rhost = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    portval = F.substring_index(hostport, ":", -1)
    # the scheme's default port is identity, not information: an
    # explicit :80/:443 capture must sort WITH its plain sibling
    is_default = (
        (scheme == F.lit("http")) & (portval == F.lit("80"))
    ) | ((scheme == F.lit("https")) & (portval == F.lit("443")))
    port = F.when(
        hostport.contains(":") & ~is_default,
        F.concat(F.lit(":"), portval),
    ).otherwise(F.lit(""))
    # path?query with scheme/authority and fragment stripped, lowered
    rest = F.lower(F.substring_index(F.regexp_replace(u, _ORIGIN_RE, ""), "#", 1))
    path = F.substring_index(rest, "?", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    qsorted = F.array_join(
        F.array_sort(F.filter(F.split(query, "&"), lambda x: x != "")), "&"
    )
    key = F.concat(
        rhost,
        port,
        F.lit(")"),
        path,
        F.when(qsorted == "", F.lit("")).otherwise(F.concat(F.lit("?"), qsorted)),
    )
    return F.when(hostport == "", F.lit(None).cast("string")).otherwise(key)


def build_cdx(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    mime: str = "text/html",
    mime_col: str | None = None,
    npartitions: int | None = None,
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """pages → globally (surt, ts)-sorted CDX records
    ``(surt, ts, url, digest, mime, length, *carry)``. Pass
    ``carry=('warc_file', 'offset', 'length')`` over a
    sources/rawfiles.read_warc_captures frame (aliasing its ``length``
    first) to make the index serveable via fetch_capture — the full
    Common Crawl CDX record.

    digest = sha256 hex of the payload bytes (Common Crawl uses
    sha1/base32; sha256 is the strongest digest BOTH engines ship as
    a built-in, and the CDX role — capture identity / revisit
    detection — only needs any fixed collision-resistant digest).
    One range-partitioning exchange is the whole shuffle cost, and it
    carries the slim record — never the payload: digest/length are
    computed BEFORE the exchange so page bytes stay in the scan
    stage. At 10^12 captures the shuffle moves ~100 B/row.
    """
    spark = pages.sparkSession
    n = npartitions or spark.sparkContext.defaultParallelism * 2
    ts_field = pages.schema[ts_col].dataType
    # TimestampNTZType is NOT a subclass of TimestampType — and NTZ is
    # what parquet-loaded corpora read as in this sandbox (NOTES), so
    # missing it silently emitted '2024-01-01 12:34:56'-style keys
    # instead of the 14-digit CDX ts (review r05)
    if isinstance(ts_field, (T.TimestampType, T.TimestampNTZType)):
        ts = F.date_format(F.col(ts_col), "yyyyMMddHHmmss")
    else:
        ts = F.col(ts_col).cast("string")
    payload = F.col(payload_col)
    if not isinstance(pages.schema[payload_col].dataType, T.BinaryType):
        payload = F.encode(payload, "UTF-8")
    slim = pages.select(
        surt_key(F.col(url_col)).alias("surt"),
        ts.alias("ts"),
        F.col(url_col).alias("url"),
        F.sha2(payload, 256).alias("digest"),
        # mime_col (e.g. read_warc_responses' parsed Content-Type)
        # beats the literal default; null parses fall back to it
        (
            F.coalesce(F.col(mime_col), F.lit(mime))
            if mime_col
            else F.lit(mime)
        ).alias("mime"),
        F.octet_length(payload).alias("length"),
        *[F.col(c) for c in carry],
    ).filter(F.col("surt").isNotNull())
    return slim.repartitionByRange(n, "surt", "ts").sortWithinPartitions(
        "surt", "ts"
    )


def write_cdx(
    cdx: DataFrame, path: str
) -> list[tuple[str, int]]:
    """Persist a ``build_cdx`` result preserving the shard layout
    (one file per range partition, internally sorted, disjoint key
    ranges — the cdx-NNNNN.gz shape) and return the shard manifest.
    Plain parquet write: Spark emits one file per partition and
    parquet stores per-row-group min/max for ``surt``, which is what
    makes ``cdx_lookup`` prune. The returned manifest comes from
    ``cdx_manifest`` — i.e. from the files actually written — never
    from a second execution of the lazy plan."""
    cdx.write.mode("overwrite").parquet(path)
    return cdx_manifest(cdx.sparkSession, path)


def cdx_manifest(spark, path: str) -> list[tuple[str, int]]:
    """(first surt, capture count) per WRITTEN shard file — the
    ``cluster.idx`` analog, derived by reading the persisted index
    back. Authoritative by construction: a manifest computed from the
    in-memory frame re-executes the range exchange, and a
    nondeterministic upstream (sample/limit/unstable file listing)
    could hand it different shard boundaries than the files on disk —
    the same double-execution hazard packing.pack_assignments pins
    with localCheckpoint (ADVICE r04). P rows cross the driver for P
    shards (never captures); file names sort in partition order, and
    empty range partitions write no file, so the manifest lists
    exactly the servable shards."""
    rows = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("shard"), "surt")
        .groupBy("shard")
        .agg(F.min("surt").alias("first_key"), F.count("*").alias("n"))
        .orderBy("shard")
        .collect()
    )
    return [(r["first_key"], r["n"]) for r in rows]


def cdx_cluster_index(cdx: DataFrame) -> list[tuple[str, int]]:
    """(first surt, capture count) per physical shard of the
    IN-MEMORY frame. For a persisted index prefer ``cdx_manifest`` /
    the ``write_cdx`` return value, which describe the written files
    and cannot drift from them via plan re-execution."""
    rows = (
        cdx.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid")
        .agg(F.min("surt").alias("first_key"), F.count("*").alias("n"))
        .orderBy("_pid")
        .collect()
    )
    return [(r["first_key"], r["n"]) for r in rows]


def cdx_lookup(
    spark, path: str, surt_prefix: str
) -> DataFrame:
    """All captures whose SURT starts with ``surt_prefix`` — e.g.
    ``com,example)/docs`` for a path subtree of one host. StartsWith
    pushes to the parquet scan; because the index is globally sorted,
    row-group pruning touches only the shards/row-groups covering the
    prefix range. NOTE: ``com,example)`` matches the exact host only —
    a subdomain's key is ``com,example,sub)…``, which that prefix does
    NOT cover; use ``cdx_domain_lookup`` for host-plus-subdomains."""
    return spark.read.parquet(path).filter(
        F.col("surt").startswith(surt_prefix)
    )


def cdx_domain_lookup(spark, path: str, host: str) -> DataFrame:
    """All captures of ``host`` AND its subdomains, on any port: the
    reversed-host key space puts them under three prefixes —
    ``com,example)`` (the host itself), ``com,example,`` (every
    subdomain), and ``com,example:`` (the host on an explicit
    non-default port; subdomain ports fall under the ``,`` prefix).
    The ``)``/``,`` pair is adjacent in the sort order; the ``:``
    prefix sits a short range away (bytes 0x2D–0x39 — e.g. an
    ``example-x.com`` host — can sort between), so the OR of three
    pushed StartsWith filters reads at most two contiguous shard
    ranges."""
    h = host.lower().strip(".")
    h = h[4:] if h.startswith("www.") else h  # match surt_key's strip
    rh = ",".join(reversed(h.split(".")))
    return spark.read.parquet(path).filter(
        F.col("surt").startswith(rh + ")")
        | F.col("surt").startswith(rh + ",")
        | F.col("surt").startswith(rh + ":")
    )

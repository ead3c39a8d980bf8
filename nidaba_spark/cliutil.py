"""Shared plumbing for the spark-submit entry points under jobs/.

Each helper here existed as two-or-three hand-kept copies across the
job scripts (review r05): the dotted-table-vs-path input routing, the
``@file``-or-comma-list host parsing (which also leaked its file
handle), the ``k=v`` rate parsing (whose error message named the
wrong flag for --split and let a malformed fraction escape as a raw
ValueError), and the CDX-for-WET export block. One definition each
keeps the entry points byte-interchangeable.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_pages(spark: SparkSession, input_str: str) -> DataFrame:
    """Route --input to a catalog table iff it looks like db.table:
    dotted AND path-free — a bare '.' test misroutes remote URIs
    (s3a://my.bucket/x, hdfs://nn.prod/y), which always fail
    os.path.exists (review r05)."""
    if (
        "." in input_str
        and "/" not in input_str
        and not os.path.exists(input_str)
    ):
        return spark.read.table(input_str)
    return spark.read.parquet(input_str)


def parse_hosts_arg(value: str | None) -> list[str] | None:
    """--blocked-hosts value: '@path/to/file' (one host per line) or
    an inline comma list. None/empty in, None out."""
    if not value:
        return None
    if value.startswith("@"):
        with open(value[1:]) as fh:
            raw = fh.read().splitlines()
    else:
        raw = value.split(",")
    return [h.strip() for h in raw if h.strip()]


def parse_rates(
    pairs: list[str] | None, flag: str = "--rate"
) -> dict[str, float] | None:
    """Parse repeated ``key=fraction`` flags; a malformed key OR
    fraction exits with a message naming the actual flag."""
    if not pairs:
        return None
    out: dict[str, float] = {}
    for p in pairs:
        k, sep, v = p.partition("=")
        if not sep or not k:
            raise SystemExit(f"{flag} expects key=frac, got {p!r}")
        try:
            out[k] = float(v)
        except ValueError:
            raise SystemExit(
                f"{flag} expects key=frac with a numeric frac, got {p!r}"
            ) from None
    return out


def export_wet_cdx(spark: SparkSession, wet_dir: str, out_path: str) -> int:
    """Build and write the serveable CDX index over a written WET
    export (surt-sorted, carrying each record's gzip member range for
    fetch_capture point reads). Returns the capture count. The column
    list/mime/carry tuple live HERE so every job's CDX artifact stays
    interchangeable."""
    from .operators.cdx import build_cdx, write_cdx
    from .sources.rawfiles import read_warc_captures

    caps = read_warc_captures(spark, wet_dir, glob="*.warc.wet*").select(
        "url",
        "warc_ts",
        "text",
        "warc_file",
        "offset",
        F.col("length").alias("warc_len"),
    )
    write_cdx(
        build_cdx(
            caps,
            payload_col="text",
            mime="text/plain",
            carry=("warc_file", "offset", "warc_len"),
        ),
        out_path,
    )
    return spark.read.parquet(out_path).count()

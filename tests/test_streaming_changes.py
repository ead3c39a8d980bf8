"""Recrawl change detection (streaming/changes.py) — custom stateful
operator via applyInPandasWithState.

  * drop 1: every url is a first sighting (change_seq 0).
  * drop 2 (same checkpoint): recrawls with IDENTICAL content emit
    nothing; modified pages emit change_seq 1 — the per-url state
    survived the restart via the engine checkpoint.
  * an unchanged-then-changed-then-unchanged triple within one batch
    emits exactly the transitions (in-batch ordering by warc_ts).
"""

from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nidaba_spark.streaming import changes as cx

T0 = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)


def _write_drop(rows: list[tuple], path: str) -> None:
    schema = pa.schema(
        [
            pa.field("url", pa.string()),
            pa.field("warc_ts", pa.timestamp("us", tz="UTC")),
            pa.field("html", pa.binary()),
            pa.field("text", pa.string()),
            pa.field("lang", pa.string()),
        ]
    )
    pq.write_table(
        pa.Table.from_pylist(
            [
                {"url": u, "warc_ts": ts, "html": h, "text": t, "lang": "en"}
                for (u, ts, h, t) in rows
            ],
            schema=schema,
        ),
        path,
    )


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream_changes")
    (base / "drops").mkdir()
    return {
        "src": str(base / "drops"),
        "out": str(base / "out"),
        "ckpt": str(base / "ckpt"),
    }


def _log(spark, out_dir):
    df = spark.read.schema(cx.CHANGES).parquet(out_dir)
    return sorted(
        (r["url"], r["change_seq"], r["warc_ts"])
        for r in df.collect()
    )


def test_change_detection_across_restarts(spark, dirs):
    ts = lambda k: T0 + dt.timedelta(hours=k)

    # drop 1: 3 urls first seen; url-c revisited unchanged + changed
    _write_drop(
        [
            ("a", ts(0), b"<p>alpha</p>", "alpha"),
            ("b", ts(0), b"<p>beta</p>", "beta"),
            ("c", ts(0), b"<p>gamma</p>", "gamma"),
            ("c", ts(1), b"<p>gamma</p>", "gamma"),  # unchanged recrawl
            ("c", ts(2), b"<p>gamma2</p>", "gamma2"),  # changed
            ("c", ts(3), b"<p>gamma2</p>", "gamma2"),  # unchanged again
        ],
        os.path.join(dirs["src"], "d1.parquet"),
    )
    cx.changed_pages_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    got = _log(spark, dirs["out"])
    assert [(u, s) for (u, s, _) in got] == [
        ("a", 0),
        ("b", 0),
        ("c", 0),
        ("c", 1),
    ]

    # drop 2, same checkpoint: a unchanged, b changed, d new
    _write_drop(
        [
            ("a", ts(10), b"<p>alpha</p>", "alpha"),  # no emission
            ("b", ts(10), b"<p>beta-v2</p>", "beta v2"),  # change_seq 1
            ("d", ts(10), b"<p>delta</p>", "delta"),  # first sighting
        ],
        os.path.join(dirs["src"], "d2.parquet"),
    )
    cx.changed_pages_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    got = _log(spark, dirs["out"])
    assert [(u, s) for (u, s, _) in got] == [
        ("a", 0),
        ("b", 0),
        ("b", 1),  # state remembered beta across the restart
        ("c", 0),
        ("c", 1),
        ("d", 0),
    ]

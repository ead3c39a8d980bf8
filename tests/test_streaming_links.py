"""Incremental streaming link graph (streaming/links.py): merged
stream counts == single-shot batch host_edges over the union of
drops, checkpoint resume reprocesses nothing, replayed batches
converge (idempotent partition overwrite), and compaction keeps the
merged graph byte-identical."""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from nidaba_spark.operators.links import host_edges, page_links  # noqa: E402
from nidaba_spark.streaming.links import (  # noqa: E402
    compact_edges,
    link_graph_stream,
    read_edges,
)

SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("html", T.BinaryType()),
    ]
)


def _page(i: int, host: str, outlinks: list[str]):
    body = "".join(f'<a href="{h}">x</a>' for h in outlinks)
    return (
        f"https://{host}/p/{i}",
        bytearray(f"<html><body>{body}</body></html>".encode()),
    )


def _drop_rows(start: int, n: int):
    rows = []
    for i in range(start, start + n):
        host = f"h{i % 3}.example"
        rows.append(
            _page(
                i,
                host,
                [
                    f"https://h{(i + 1) % 3}.example/t",
                    "/self-link",
                    f"https://ext{i % 2}.example/x",
                ],
            )
        )
    return rows


@pytest.fixture()
def dirs(spark, tmp_path):
    src = str(tmp_path / "drops")
    work = str(tmp_path / "work")
    os.makedirs(src)
    return src, work


def _write_drop(spark, src: str, name: str, rows) -> None:
    tmp = src + f"_{name}_tmp"
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("overwrite").parquet(tmp)
    for f in os.listdir(tmp):
        if f.endswith(".parquet"):
            shutil.move(os.path.join(tmp, f), os.path.join(src, f"{name}.parquet"))
    shutil.rmtree(tmp)


def _edge_map(df):
    return {(r["src_host"], r["dst_host"]): r["n_links"] for r in df.collect()}


def test_stream_equals_batch_and_resumes(spark, dirs):
    src, work = dirs
    d1, d2 = _drop_rows(0, 12), _drop_rows(12, 9)
    _write_drop(spark, src, "d1", d1)
    link_graph_stream(spark, src, work, SCHEMA)
    got1 = _edge_map(read_edges(spark, work))
    all1 = spark.createDataFrame(d1, SCHEMA)
    assert got1 == _edge_map(host_edges(page_links(all1)))

    # second drop: merged graph == batch over the UNION of drops
    _write_drop(spark, src, "d2", d2)
    link_graph_stream(spark, src, work, SCHEMA)
    got2 = _edge_map(read_edges(spark, work))
    union = spark.createDataFrame(d1 + d2, SCHEMA)
    assert got2 == _edge_map(host_edges(page_links(union)))

    # resume with nothing new: no change (checkpoint reprocesses nothing)
    link_graph_stream(spark, src, work, SCHEMA)
    assert _edge_map(read_edges(spark, work)) == got2


def test_replayed_batch_converges(spark, dirs):
    """Simulate a crash-replay: rewriting the same batch partition is
    an overwrite, so a re-run of handle() converges to the same graph."""
    src, work = dirs
    d1 = _drop_rows(0, 6)
    _write_drop(spark, src, "d1", d1)
    link_graph_stream(spark, src, work, SCHEMA)
    before = _edge_map(read_edges(spark, work))
    # manual replay of batch 0 with identical input
    batch = spark.createDataFrame(d1, SCHEMA)
    host_edges(page_links(batch)).write.mode("overwrite").parquet(
        os.path.join(work, "edges", "batch=0")
    )
    assert _edge_map(read_edges(spark, work)) == before


def test_compaction_preserves_graph(spark, dirs):
    src, work = dirs
    _write_drop(spark, src, "d1", _drop_rows(0, 10))
    link_graph_stream(spark, src, work, SCHEMA)
    _write_drop(spark, src, "d2", _drop_rows(10, 10))
    link_graph_stream(spark, src, work, SCHEMA)
    before = _edge_map(read_edges(spark, work))
    info = compact_edges(spark, work)
    assert info["batches_before"] >= 2 and info["batches_after"] == 1
    assert _edge_map(read_edges(spark, work)) == before


def test_pagerank_over_stream_graph(spark, dirs):
    from nidaba_spark.operators.graphrank import pagerank

    src, work = dirs
    _write_drop(spark, src, "d1", _drop_rows(0, 15))
    link_graph_stream(spark, src, work, SCHEMA)
    ranks = pagerank(
        read_edges(spark, work), iters=5,
        src="src_host", dst="dst_host", weight="n_links",
    ).collect()
    assert ranks and abs(sum(r["rank"] for r in ranks) - 1.0) < 1e-6

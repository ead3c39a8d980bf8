"""Continuous incremental dedup stream (streaming/dedup.py):
cross-drop near-dups are dropped against the persisted index without
rescanning drop 1, within-drop dups keep the min id, uniques survive,
and re-running on the same checkpoint reprocesses nothing.
"""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import types as T  # noqa: E402

from nidaba_spark.streaming.dedup import dedup_docs_stream, read_kept  # noqa: E402

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)


def _doc(seed: int, n: int = 40) -> str:
    return " ".join(f"tok{seed}x{i}" for i in range(n))


def _near(text: str, tag: str) -> str:
    words = text.split()
    words[5] = f"changed{tag}"
    return " ".join(words)


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


def test_continuous_dedup_across_drops(spark, dirs):
    src, work = dirs
    # drop 1: three uniques + an internal near-dup of doc 1 (id 3)
    d1 = [
        (1, _doc(1)),
        (2, _doc(2)),
        (3, _near(_doc(1), "a")),
        (4, _doc(4)),
    ]
    _write_drop(spark, src, "drop1", d1)
    dedup_docs_stream(spark, src, work, SCHEMA, threshold=0.5)
    kept1 = {r["doc_id"] for r in read_kept(spark, work).collect()}
    assert kept1 == {1, 2, 4}  # 3 lost keep-min to 1

    # drop 2: near-dup of historical doc 2, one new unique, and an
    # internal dup pair (11 < 12 -> 12 dropped)
    d2 = [
        (10, _near(_doc(2), "b")),
        (11, _doc(11)),
        (12, _near(_doc(11), "c")),
    ]
    _write_drop(spark, src, "drop2", d2)
    dedup_docs_stream(spark, src, work, SCHEMA, threshold=0.5)
    kept2 = {r["doc_id"] for r in read_kept(spark, work).collect()}
    assert kept2 == {1, 2, 4, 11}

    # survivors' texts intact (no mutation along the way)
    texts = {r["doc_id"]: r["text"] for r in read_kept(spark, work).collect()}
    assert texts[11] == _doc(11)

    # idempotent resume: nothing new to process -> identical output
    dedup_docs_stream(spark, src, work, SCHEMA, threshold=0.5)
    kept3 = {r["doc_id"] for r in read_kept(spark, work).collect()}
    assert kept3 == kept2


def test_fresh_checkpoint_sees_all_drops_in_order(spark, dirs):
    """Both drops present before the first run: the file source still
    batches them (one availableNow drain), and the keep policy is
    order-insensitive for this fixture because history-wins and
    keep-min agree with id order."""
    src, work = dirs
    _write_drop(spark, src, "drop1", [(1, _doc(1)), (2, _doc(2))])
    _write_drop(spark, src, "drop2", [(10, _near(_doc(2), "b")), (11, _doc(11))])
    dedup_docs_stream(spark, src, work, SCHEMA, threshold=0.5)
    kept = {r["doc_id"] for r in read_kept(spark, work).collect()}
    assert kept == {1, 2, 11}

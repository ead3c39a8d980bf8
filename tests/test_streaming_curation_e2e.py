"""End-to-end continuous curation: crawl drops → streaming fused
extraction → streaming incremental dedup, both resuming from their
own checkpoints. A recrawl clone (same html, new url) arriving in a
later drop must be dropped against the PERSISTED index of drop 1's
extractions — without drop 1 ever being rescanned.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from nidaba_spark import corpus, schemas
from nidaba_spark.streaming import extract as sx
from nidaba_spark.streaming.dedup import dedup_docs_stream, read_kept

N = 120


def _write_drop(rows: list[dict], path: str) -> None:
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
            [{k: r[k] for k in ("url", "warc_ts", "html", "text", "lang")} for r in rows],
            schema=schema,
        ),
        path,
    )


@pytest.fixture(scope="module")
def dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("curation_e2e")
    (base / "drops").mkdir()
    return {
        "src": str(base / "drops"),
        "out": str(base / "extracted"),
        "ckpt": str(base / "ckpt_extract"),
        "dedup": str(base / "dedup_work"),
    }


def _run_both(spark, dirs):
    sx.extract_pages_stream(spark, dirs["src"], dirs["out"], dirs["ckpt"])
    dedup_docs_stream(
        spark,
        dirs["out"],
        dirs["dedup"],
        schemas.EXTRACTED,
        threshold=0.85,
        id_col="url",
        text_col="text",
    )
    kept = read_kept(spark, dirs["dedup"])
    return {r["url"] for r in kept.select("url").collect()}


def test_recrawl_clone_dropped_against_persisted_index(spark, dirs):
    rows = corpus.generate_rows(N)
    half = N // 2

    _write_drop(rows[:half], os.path.join(dirs["src"], "drop1.parquet"))
    kept1 = _run_both(spark, dirs)
    assert rows[0]["url"] in kept1 and len(kept1) > 0

    clone = dict(rows[0])
    clone["url"] = "https://recrawl.example/clone-of-first"
    _write_drop(
        rows[half:] + [clone], os.path.join(dirs["src"], "drop2.parquet")
    )
    kept2 = _run_both(spark, dirs)

    # the clone's extracted text is byte-identical to a drop-1 doc:
    # history wins, clone dropped
    assert clone["url"] not in kept2
    assert rows[0]["url"] in kept2
    # drop-1 decisions are immutable (kept dirs are append-only)
    assert kept1 <= kept2
    # genuinely new pages from drop 2 survive
    new_urls = {r["url"] for r in rows[half:]}
    assert len(kept2 & new_urls) > 0

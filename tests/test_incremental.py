"""Row-level incremental resume (anti-join new urls, SURVEY.md §3.2 E2')."""

from __future__ import annotations

from nidaba_spark import corpus, pipeline


def test_incremental_processes_only_new_urls(spark, tmp_path, golden):
    pages_300 = str(tmp_path / "p300.parquet")
    pages_500 = str(tmp_path / "p500.parquet")
    corpus.write_pages_parquet(pages_300, 300)
    corpus.write_pages_parquet(pages_500, 500)

    p = pipeline.Pipeline(spark, str(tmp_path / "run"), run_id="inc")
    first = p.run_incremental(spark.read.parquet(pages_300))
    assert first.count() == 300
    m1 = p.manifest("merge")
    assert m1["incremental"] and m1["accumulators"]["docs_in"] == 300

    # grown input: only the 200 new urls must be processed
    out = p.run_incremental(spark.read.parquet(pages_500))
    assert out.count() == 500
    m2 = p.manifest("merge")
    assert m2["accumulators"]["docs_in"] == 200
    assert m2["attempt"] == m1["attempt"] + 1

    got = {r["url"]: r["text"] for r in out.collect()}
    assert all(got[u] == golden[u][0] for u in got)

    # idempotent: nothing left to do
    again = p.run_incremental(spark.read.parquet(pages_500))
    assert again.count() == 500
    assert p.manifest("merge")["accumulators"]["docs_in"] == 0

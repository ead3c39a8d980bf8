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


def test_incremental_manifest_recount_after_orphaned_move(spark, tmp_path):
    """ADVICE r03 (medium): a crash AFTER some inc{k} part-files moved
    into the checkpoint but BEFORE the manifest rewrite leaves real
    rows under the old still-valid manifest. The next incremental run
    must detect the orphans (inc files with attempt > manifest
    attempt) and reconcile via a recovery count — not trust the stale
    manifest arithmetic forever."""
    import json
    import os

    pages_300 = str(tmp_path / "p300.parquet")
    pages_500 = str(tmp_path / "p500.parquet")
    corpus.write_pages_parquet(pages_300, 300)
    corpus.write_pages_parquet(pages_500, 500)

    p = pipeline.Pipeline(spark, str(tmp_path / "run"), run_id="orph")
    p.run_incremental(spark.read.parquet(pages_300))
    with open(p._manifest_path("merge")) as f:
        old_manifest = f.read()
    assert json.loads(old_manifest)["rows"] == 300

    # attempt 2 completes its file moves, then "crashes" before the
    # manifest write — simulated by restoring the attempt-1 manifest
    p.run_incremental(spark.read.parquet(pages_500))
    with open(p._manifest_path("merge"), "w") as f:
        f.write(old_manifest)
    assert os.path.isdir(p._stage_path("merge"))

    out = p.run_incremental(spark.read.parquet(pages_500))  # nothing new
    assert out.count() == 500
    m = p.manifest("merge")
    assert m["rows"] == 500, f"stale manifest arithmetic survived: {m['rows']}"
    assert m["accumulators"]["docs_in"] == 0  # anti-join saw the orphan rows


def test_incremental_append_is_crash_consistent(spark, tmp_path, golden):
    """The stage-commit protocol for incremental appends: new rows are
    written to a tmp dir and moved in with per-file atomic renames, so
    an interruption leaves a PREFIX of whole part-files — readers see
    only complete rows, and the url anti-join reprocesses exactly the
    unmoved remainder. Simulated by moving one data file back out of
    the checkpoint (as if the crash hit mid-move) and re-running."""
    import glob
    import os
    import shutil

    pages_300 = str(tmp_path / "p300.parquet")
    pages_500 = str(tmp_path / "p500.parquet")
    corpus.write_pages_parquet(pages_300, 300)
    corpus.write_pages_parquet(pages_500, 500)

    p = pipeline.Pipeline(spark, str(tmp_path / "run"), run_id="crash")
    p.run_incremental(spark.read.parquet(pages_300))
    merge_dir = p._stage_path("merge")

    # grow the input; then simulate a crash mid-move: one of the newly
    # moved inc files vanishes from the checkpoint (move interrupted
    # after N-1 renames), manifest already rewritten or not — either
    # way readers must still see only whole files
    p.run_incremental(spark.read.parquet(pages_500))
    inc_files = sorted(glob.glob(os.path.join(merge_dir, "inc*-part-*")))
    assert inc_files, "expected per-file renamed increments"
    stash = str(tmp_path / "stash.parquet")
    shutil.move(inc_files[0], stash)

    partial = spark.read.parquet(merge_dir)
    n_partial = partial.count()
    assert n_partial < 500  # some new rows missing, none torn

    # recovery: the anti-join picks up exactly the missing urls
    out = p.run_incremental(spark.read.parquet(pages_500))
    assert out.count() == 500
    got = {r["url"]: r["text"] for r in out.collect()}
    assert len(got) == 500  # no duplicate urls from the recovery pass
    assert all(got[u] == golden[u][0] for u in got)

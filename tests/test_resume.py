"""Checkpoint/resume + lineage semantics (SURVEY.md §5.2.6, FIXTURES.md §4)."""

from __future__ import annotations

import pytest

from nidaba_spark import pipeline


@pytest.fixture(scope="module")
def run(spark, pages_path, tmp_path_factory):
    run_dir = str(tmp_path_factory.mktemp("ckpt"))
    pages = spark.read.parquet(pages_path)
    p = pipeline.Pipeline(spark, run_dir, run_id="r1")
    ext = p.run(pages)
    baseline = {r["url"]: r["text"] for r in ext.collect()}
    return p, pages, baseline


def test_all_stages_checkpointed(run):
    p, _, _ = run
    for s in pipeline.STAGES:
        assert p.is_complete(s), s


def test_lineage_rows_written(run):
    p, _, _ = run
    lin = p.lineage().collect()
    stages = {r["stage"] for r in lin}
    assert stages == set(pipeline.STAGES)
    for r in lin:
        assert r["status"] == "ok" and r["output_rows"] > 0 and r["attempt"] == 1


def test_resume_recomputes_only_tail(run):
    p, pages, baseline = run
    started_before = {
        s: p.manifest(s)["started"] for s in pipeline.STAGES
    }
    # kill stages >= classify, then resume
    p.invalidate_from("classify")
    assert not p.is_complete("classify") and not p.is_complete("merge")
    ext = p.run(pages, resume=True)
    got = {r["url"]: r["text"] for r in ext.collect()}
    # (a) byte-identical output after resume
    assert got == baseline
    # (b) untouched earlier stages keep their original manifests/timestamps
    for s in ("decode", "segment"):
        assert p.manifest(s)["started"] == started_before[s]
        assert p.manifest(s)["attempt"] == 1
    # (c) re-executed stages have attempt bumped in lineage
    lin = p.lineage().collect()
    attempts = {}
    for r in lin:
        attempts.setdefault(r["stage"], set()).add(r["attempt"])
    assert attempts["decode"] == {1} and attempts["segment"] == {1}
    assert 2 in attempts["classify"] and 2 in attempts["merge"]


def test_manifest_requires_directory(run, spark, tmp_path):
    import json
    import os

    p2 = pipeline.Pipeline(spark, str(tmp_path), run_id="gap")
    os.makedirs(p2.run_dir, exist_ok=True)
    # a manifest claiming ok without its checkpoint dir must not count
    with open(p2._manifest_path("decode"), "w") as f:
        json.dump({"status": "ok", "attempt": 1, "rows": 1}, f)
    assert not p2.is_complete("decode")
    p2.invalidate_from("decode")
    assert p2.manifest("decode") is None

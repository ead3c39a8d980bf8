"""Model-based quality classifier: train determinism, separation
gates on both fresh and pinned coefficients, codegen-only inference.

The full DuckDB row-for-row oracle for the exposed query
(quality_model_score) runs in tests/test_offdriver_oracles.py.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nidaba_spark.operators import quality_model  # noqa: E402
from nidaba_spark.plans.trainingdata import q_quality_model_score  # noqa: E402

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )


def _accuracy(scored) -> float:
    return scored.select(
        F.avg(
            ((F.col("model_score") >= 0.5) == (F.col("label") == 1.0)).cast("double")
        ).alias("acc")
    ).collect()[0]["acc"]


def test_train_is_deterministic_and_separates(spark):
    feats = quality_model.training_frame(_docs(spark))
    m1 = quality_model.train_quality_classifier(feats)
    m2 = quality_model.train_quality_classifier(feats)
    assert m1 == m2, "6-dp-rounded coefficients must be run-stable"
    acc = _accuracy(quality_model.score(feats, m1))
    assert acc >= 0.95, f"fresh-trained separation too weak: {acc}"


def test_pinned_model_separates_clean_from_degraded(spark):
    feats = quality_model.training_frame(_docs(spark))
    scored = quality_model.score(feats)  # DEFAULT_MODEL
    acc = _accuracy(scored)
    assert acc >= 0.95, f"pinned DEFAULT_MODEL separation too weak: {acc}"
    med = (
        scored.groupBy("label")
        .agg(F.median("model_score").alias("med"))
        .collect()
    )
    by_label = {r["label"]: r["med"] for r in med}
    assert by_label[1.0] > 0.5 > by_label[0.0]


def test_scoring_is_pure_codegen(spark):
    df = q_quality_model_score(spark, SF)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="formatted")
    plan = buf.getvalue()
    # inference must not ship Python or an ML model to executors
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF", "MapInPandas"):
        assert marker not in plan, f"scoring plan contains {marker}"
    # '* Project' = the scoring projection sits inside WholeStageCodegen
    assert "* Project" in plan, plan

#!/usr/bin/env python
"""Train the quality-classifier coefficients pinned in
nidaba_spark/operators/quality_model.py DEFAULT_MODEL.

Run:  python scripts/train_quality_model.py [sf_dir]
Prints the coefficient dict (6-dp rounded) and holdout-free training
accuracy vs the weak label (lang == 'en'); paste the dict into
DEFAULT_MODEL when the feature set or corpus changes.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from nidaba_spark.operators import quality_model  # noqa: E402
from nidaba_spark.session import get_spark  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    spark = get_spark(app="train-quality", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    feats = quality_model.training_frame(docs)
    model = quality_model.train_quality_classifier(feats)
    print(json.dumps(model, indent=2))
    scored = quality_model.score(feats, model)
    acc = (
        scored.select(
            F.avg(
                ((F.col("model_score") >= 0.5) == (F.col("label") == 1.0)).cast("double")
            ).alias("acc")
        ).collect()[0]["acc"]
    )
    n = feats.count()
    pos = feats.filter("label = 1.0").count()
    print(f"rows={n} positives={pos} training_accuracy={acc:.4f}")
    spark.stop()


if __name__ == "__main__":
    main()

"""Executor-side metrics via Spark accumulators (SURVEY.md §2A A20 —
the analog of nidaba's NidabaTask per-task bookkeeping, reference:
nidaba/tasks/helper.py).

Accumulator updates flow back with task completion, so totals are live
while a stage runs (the driver can report docs/bytes progress without
an extra job); the `_lineage` table (pipeline.py) remains the durable
per-partition record.

Caveat (inherent to Spark accumulators): task retries can double-count
— treat these as operational gauges, not exact audit numbers; the
lineage aggregation is the exact one.
"""

from __future__ import annotations

from pyspark import SparkContext


class StageMetrics:
    """docs/bytes counters updated from inside Arrow-batched stages."""

    def __init__(self, sc: SparkContext, stage: str) -> None:
        self.stage = stage
        self.docs_in = sc.accumulator(0)
        self.bytes_in = sc.accumulator(0)
        self.docs_out = sc.accumulator(0)

    def snapshot(self) -> dict:
        return {
            "stage": self.stage,
            "docs_in": self.docs_in.value,
            "bytes_in": self.bytes_in.value,
            "docs_out": self.docs_out.value,
        }

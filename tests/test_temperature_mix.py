"""Temperature-scaled mixture planning (operators/mixing
.temperature_rates / temperature_mix): the budget identity, the T=1
proportional law, T>1 flattening, deterministic epoch realization.

Full DuckDB oracle parity for q_temperature_rates runs in
tests/test_offdriver_oracles.py like every other off-driver query.
"""

from __future__ import annotations

import math
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark.operators.mixing import (  # noqa: E402
    temperature_mix,
    temperature_rates,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, src, ln)
        for i, (src, ln) in enumerate(
            [("web", 100)] * 80 + [("books", 400)] * 10 + [("wiki", 50)] * 10
        )
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, n_tokens long")


def _plan(docs, budget, t):
    rows = temperature_rates(docs, budget, t, token_col="n_tokens").collect()
    return {r["key"]: r.asDict() for r in rows}


def test_budget_identity_and_shares_sum_to_one(docs):
    for t in (1.0, 2.0, 5.0):
        plan = _plan(docs, 6000, t)
        assert sum(p["share"] for p in plan.values()) == pytest.approx(1.0, abs=1e-5)
        spent = sum(p["rate"] * p["n_tokens"] for p in plan.values())
        assert spent == pytest.approx(6000, rel=1e-4)


def test_t1_is_proportional_sampling(docs):
    """T=1: every source sees the SAME rate = budget/total tokens."""
    plan = _plan(docs, 6000, 1.0)
    total = 80 * 100 + 10 * 400 + 10 * 50  # 12500
    for p in plan.values():
        assert p["rate"] == pytest.approx(6000 / total, abs=1e-6)


def test_high_t_flattens_toward_uniform(docs):
    """T>1 upweights small sources: wiki's share rises with T while
    the share ORDER (web > books > wiki) never flips."""
    s2 = _plan(docs, 6000, 2.0)
    s8 = _plan(docs, 6000, 8.0)
    assert s8["wiki"]["share"] > s2["wiki"]["share"] > 50 * 10 / 12500
    for plan in (s2, s8):
        assert plan["web"]["share"] > plan["books"]["share"] > plan["wiki"]["share"]
    # exact closed form at T=2
    z = math.sqrt(8000) + math.sqrt(4000) + math.sqrt(500)
    assert s2["books"]["share"] == pytest.approx(math.sqrt(4000) / z, abs=1e-6)


def test_epochs_and_mix_realization(docs, spark):
    """A budget above a source's size upsamples it (rate > 1, epochs
    >= 2) and temperature_mix realizes floor/ceil copies per row,
    deterministically (two runs byte-identical)."""
    plan = _plan(docs, 30000, 8.0)
    assert plan["wiki"]["rate"] > 1 and plan["wiki"]["epochs"] >= 2
    out = temperature_mix(docs, 30000, 8.0, token_col="n_tokens")
    per_doc = {
        r["doc_id"]: r["n"]
        for r in out.groupBy("doc_id").count().withColumnRenamed("count", "n").collect()
    }
    wiki_rate = plan["wiki"]["rate"]
    wiki_ids = range(90, 100)
    for i in wiki_ids:
        assert per_doc.get(i, 0) in (math.floor(wiki_rate), math.ceil(wiki_rate))
    again = temperature_mix(docs, 30000, 8.0, token_col="n_tokens")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_row_count_weighting_and_validation(docs):
    """token_col=None weights by row count; T<=0 rejects."""
    plan = temperature_rates(docs, 50, 1.0).collect()
    assert {r["key"]: r["n_tokens"] for r in plan} == {
        "web": 80, "books": 10, "wiki": 10,
    }
    with pytest.raises(ValueError):
        temperature_rates(docs, 50, 0.0)

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nidaba_spark import corpus  # noqa: E402
from nidaba_spark.session import get_spark  # noqa: E402

SMOKE_N = 500  # covers every variant class (mod 101 and mod 1009 hits)


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="nidaba-tests", cores=8, driver_memory="8g")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_path(tmp_path_factory) -> str:
    p = str(tmp_path_factory.mktemp("corpus") / "pages.parquet")
    corpus.write_pages_parquet(p, SMOKE_N)
    return p


@pytest.fixture(scope="session")
def corpus_rows():
    return corpus.generate_rows(SMOKE_N)


@pytest.fixture(scope="session")
def golden(corpus_rows):
    from nidaba_spark import oracle

    out = {}
    for r in corpus_rows:
        text, spans = oracle.extract(r["html"], r["text"])
        out[r["url"]] = (text, [(s.block_id, s.start, s.end, s.kind) for s in spans])
    return out

"""Pin the Iceberg deploy-seam DDL to schemas.py (SURVEY.md §2B B2).

The sandbox has no Iceberg jars, so sources/iceberg.py never executes
here — which is exactly how its DDL strings could silently drift from
the parquet schemas the local pipeline writes. This test parses each
CREATE TABLE column list and asserts column-for-column (name + Spark
type) agreement with the authoritative StructTypes.
"""

from __future__ import annotations

import re

import pytest

from nidaba_spark import schemas
from nidaba_spark.sources import iceberg


def _parse_ddl_columns(ddl: str) -> list[tuple[str, str]]:
    """Extract [(name, normalized_type)] from a CREATE TABLE statement."""
    body = ddl[ddl.index("(") + 1 :]
    # cut at the ')' that closes the column list (before USING)
    depth, end = 1, None
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                end = i
                break
    assert end is not None, "unbalanced DDL parens"
    cols_src = body[:end]
    # split on commas at angle-bracket/paren depth 0
    cols, buf, ang, par = [], [], 0, 0
    for ch in cols_src:
        if ch == "<":
            ang += 1
        elif ch == ">":
            ang -= 1
        elif ch == "(":
            par += 1
        elif ch == ")":
            par -= 1
        if ch == "," and ang == 0 and par == 0:
            cols.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    cols.append("".join(buf))
    out = []
    for c in cols:
        c = c.strip()
        if not c:
            continue
        name, typ = re.split(r"\s+", c, maxsplit=1)
        out.append((name, re.sub(r"\s+", "", typ.lower())))
    return out


def _schema_columns(struct) -> list[tuple[str, str]]:
    return [(f.name, f.dataType.simpleString()) for f in struct.fields]


@pytest.mark.parametrize(
    "ddl,schema",
    [
        (iceberg.PAGES_DDL, schemas.PAGES),
        (iceberg.EXTRACTED_DDL, schemas.EXTRACTED),
        (iceberg.LINEAGE_DDL, schemas.LINEAGE),
    ],
    ids=["pages", "extracted", "lineage"],
)
def test_ddl_matches_schema(ddl, schema):
    assert _parse_ddl_columns(ddl) == _schema_columns(schema)

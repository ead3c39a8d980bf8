"""Feature-hashed document vectors: text → dense embedding with NO
model, so every embedding-consuming operator (SemDeDup, IVF/PQ ANN,
embedding near-dup, ICLM ordering) composes on corpora that ship no
embedding column.

The hashing trick (Weinberger et al. 2009 / vowpal wabbit): each
token hashes to one of ``dim`` slots plus a ±1 sign, the vector is
the signed term-frequency histogram, L2-normalized — inner products
approximate token-overlap cosine without any vocabulary or training.
Deterministic by construction: slot and sign come from md5(word:salt)
hex digits (the repo's cross-engine uniform-hash idiom — same value
in DuckDB, so the whole vector is fully oracle-checkable, unlike a
learned embedding).

Scale shape: ONE doc-keyed shuffle — tokens explode, then a single
map-side-combined hash aggregate with ``dim`` conditional sums (the
gopher_repetition pivot idiom); the vector assembles scan-side from
the agg row. No per-word state, no vocabulary broadcast, no Python.
Skew is bounded by the largest single document. The HOF alternative
(aggregate() over the words array) would re-evaluate md5 per
(word, slot) pair — the quadratic-eval trap — and is deliberately
avoided.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import tokens_col


def hashed_tf_embedding(
    docs: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "htf",
    normalize: bool = True,
) -> DataFrame:
    """(id, embedding array<double>) — signed hashed-TF vectors.

    slot(word) = int(md5(word:salt)[0:4], 16) % dim  (dim must divide
    2^16 for exact uniformity; 2..65536 powers of two recommended),
    sign(word) = ±1 from hex digit 5. Normalized vectors round to 6
    decimals (the repo's cross-engine float convention); documents
    with no tokens get the zero vector, which every consumer already
    treats as 'cosine 0 against everything'.
    """
    h = F.md5(F.concat_ws(":", F.col("_w"), F.lit(salt)))
    slot = F.pmod(F.conv(F.substring(h, 1, 4), 16, 10).cast("long"), F.lit(dim))
    sign = (
        F.conv(F.substring(h, 5, 1), 16, 10).cast("long") % 2 * 2 - 1
    ).cast("long")
    # explode_OUTER keeps one null-word row for token-less documents,
    # so every doc survives the single aggregate — the previous
    # re-attach join re-scanned the full docs source and added a
    # second doc-keyed shuffle purely to restore empty docs,
    # contradicting the ONE-shuffle scale claim above (review r05).
    # The null row's slot/sign are null, so it contributes nothing
    # (a bare concat_ws would have hashed NULL to the constant
    # md5(salt) slot instead).
    w = docs.select(
        F.col(id_col), F.explode_outer(tokens_col(F.col(text_col))).alias("_w")
    ).select(
        id_col,
        F.when(F.col("_w").isNotNull(), slot).alias("_slot"),
        F.when(F.col("_w").isNotNull(), sign).alias("_sign"),
    )
    aggs = [
        F.sum(
            F.when(F.col("_slot") == i, F.col("_sign")).otherwise(F.lit(0))
        ).alias(f"_v{i}")
        for i in range(dim)
    ]
    base = w.groupBy(id_col).agg(*aggs)
    vals = [F.coalesce(F.col(f"_v{i}"), F.lit(0)).cast("double") for i in range(dim)]
    if not normalize:
        return base.select(id_col, F.array(*vals).alias("embedding"))
    nrm = F.sqrt(sum((v * v for v in vals), F.lit(0.0)))
    out = [
        F.round(
            F.when(nrm == 0, F.lit(0.0)).otherwise(v / nrm), 6
        )
        for v in vals
    ]
    return base.select(id_col, F.array(*out).alias("embedding"))

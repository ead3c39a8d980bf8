"""Training-data-pipeline queries: dedup, similarity search, text
analysis, multimodal plumbing, streaming ingest, and the flagship
extraction query — with DuckDB oracles where SQL can express them.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import dedup, multimodal, similarity, textstats
from ..sources.tables import load, spread_scan

ORACLE: dict[str, str] = {}

_WORDS_SQL = "list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '')"


# ------------------------------------------------------------- dedup: exact
def q_dedup_exact(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.exact_dedup(load(spark, sf, "documents"))


ORACLE["dedup_exact"] = """
SELECT min(doc_id) AS keep_id, count(*) AS n_dupes FROM documents GROUP BY text
"""


# ---------------------------------------------------- dedup: n-gram Jaccard
# The exposed query runs the prefix-filtered scale path; because
# prefix filtering is COMPLETE for J >= t (operators/dedup.py), the
# oracle is the plain exact all-pairs Jaccard — the harness thereby
# checks that the candidate pruning loses nothing, instead of
# mirroring the pruning (which would hide recall loss, ADVICE r02).
def q_dedup_ngram_jaccard(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.ngram_jaccard_pairs(load(spark, sf, "documents"), threshold=0.4)


ORACLE["dedup_ngram_jaccard"] = """
WITH tsets AS (
  SELECT doc_id AS id,
         list_distinct(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '')) AS ts
  FROM documents),
toks AS (SELECT id, unnest(ts) AS tok FROM tsets),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS o
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(o / (len(ta.ts) + len(tb.ts) - o), 6) AS jaccard
FROM shared
JOIN tsets ta ON ta.id = id_a
JOIN tsets tb ON tb.id = id_b
WHERE round(o / (len(ta.ts) + len(tb.ts) - o), 6) >= 0.4
"""


# -------------------------------------------------- dedup: MinHash LSH (rows-only)
def q_dedup_minhash_lsh(spark: SparkSession, sf: str) -> DataFrame:
    # spread_scan: signature hashing is per-row compute bound by the
    # input's single row group otherwise (r06; 0.38 -> 0.23 s at sf1.0).
    # min_bytes: shingle+minhash is cheap per byte, so below ~2 MiB the
    # exchange costs more than it buys (0.15 unspread vs 0.35 s spread
    # at the 595 KB sf0.1 table — r06 A/B).
    return dedup.minhash_lsh_pairs(
        spread_scan(load(spark, sf, "documents"), key="doc_id", min_bytes=2 << 20),
        threshold=0.4,
    )


def q_dedup_incremental_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Incremental near-dup: odd doc_ids are the NEW crawl batch,
    deduped against the even-id historical corpus via its persisted
    MinHash-LSH index — the historical text is never rescanned.
    Rows-only (xxhash64 chain); recall/soundness gates in
    tests/test_incremental_lsh.py (index associativity, parquet
    round-trip parity, no historical-only pairs, batch-pipeline
    recall >= 0.8)."""
    docs = load(spark, sf, "documents")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    return dedup.minhash_lsh_pairs_incremental(
        new, dedup.minhash_index(hist), threshold=0.4
    ).orderBy("id_a", "id_b")


# ---------------------------------------------------- dedup: SimHash (rows-only)
def q_dedup_simhash(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.simhash_pairs(load(spark, sf, "documents"), max_hamming=3)


# --------------------------------------------------------- similarity: ANN
def q_ann_brute_force(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.brute_force_topk(emb, queries, k=5, dim=64)


ORACLE["ann_brute_force"] = """
WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 10),
scored AS (
  SELECT q.query_id, e.vec_id,
         list_sum(list_transform(range(1, len(e.embedding) + 1),
                  i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(e.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(q.qv, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS s
  FROM embeddings e CROSS JOIN q)
SELECT query_id, vec_id, round(s, 6) AS sim, rank FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id) AS rank
  FROM scored)
WHERE rank <= 5
"""


def q_embedding_near_dup(spark: SparkSession, sf: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact baseline, codegen'd dot)."""
    return similarity.near_dup_pairs(load(spark, sf, "embeddings"), threshold=0.45, dim=64)


ORACLE["embedding_near_dup"] = """
WITH s AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         list_sum(list_transform(range(1, 65),
                  k -> CAST(a.embedding[k] AS DOUBLE) * CAST(b.embedding[k] AS DOUBLE)))
         / (sqrt(list_sum(list_transform(a.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
          * sqrt(list_sum(list_transform(b.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))) AS s
  FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id)
SELECT id_a, id_b, round(s, 6) AS sim FROM s WHERE round(s, 6) >= 0.45
"""


def q_embedding_near_dup_lsh(spark: SparkSession, sf: str) -> DataFrame:
    """Scale path for embedding near-dup: banded hyperplane-LSH
    prefilter + exact re-verify (subset of embedding_near_dup by
    construction; rows-only here — the xxhash64-derived planes are not
    SQL-expressible — with precision/recall gates in
    tests/test_lsh_recall.py)."""
    return similarity.near_dup_pairs_lsh(
        load(spark, sf, "embeddings"), threshold=0.45, dim=64
    )


def clustered_embeddings(emb: DataFrame) -> DataFrame:
    """Deterministic planted-cluster fixture derived from the
    embeddings table entirely IN Spark (broadcast join + JVM-side
    zip_with, no driver-side data): the 20 lowest vec_ids act as
    centroids and row i becomes centroid(i % 20) + 0.15·v_i. With
    comparable centroid/vector norms that puts same-cluster cosines
    near 1/(1+0.15²) ≈ 0.978 and cross-cluster pairs at the
    centroid-background level — the regime the strict production LSH
    layout (r=8/B=8, t ≥ 0.85) is tuned for. The stock synthetic
    embeddings have NO pairs above 0.51 (measured, NOTES.md r04), so
    the strict query must plant its own clusters to be non-vacuous."""
    cent = emb.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    return emb.join(
        F.broadcast(cent), F.pmod(F.col("vec_id"), F.lit(20)) == F.col("cid")
    ).select(
        "vec_id",
        F.zip_with(
            "cvec",
            "embedding",
            lambda c, v: (c.cast("double") + F.lit(0.15) * v.cast("double")).cast(
                "float"
            ),
        ).alias("embedding"),
    )


def q_embedding_near_dup_lsh_strict(spark: SparkSession, sf: str) -> DataFrame:
    """Production-regime embedding near-dup (VERDICT r03 next #7): the
    r=8/B=8, t ≥ 0.85 configuration the near_dup_pairs_lsh docstring
    recommends for real dedup thresholds, run over the planted-cluster
    fixture. Rows-only for the driver (the xxhash-free but
    numpy-seeded planes are not SQL-expressible); precision 1.0 by
    construction (exact re-verify) and recall/candidate-rate gates in
    tests/test_lsh_recall.py::test_embedding_near_dup_lsh_strict."""
    return similarity.near_dup_pairs_lsh(
        clustered_embeddings(load(spark, sf, "embeddings")),
        threshold=0.85,
        bands=8,
        band_bits=8,
        dim=64,
    )


def q_ann_lsh(spark: SparkSession, sf: str) -> DataFrame:
    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return similarity.lsh_topk(emb, queries, k=5)


def q_ann_pq(spark: SparkSession, sf: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): per-subspace
    k-means codebooks (distributed training, one combined shuffle per
    iteration), m-byte codes (32x vector compression), ADC lookup-table
    scoring inside one mapInPandas emitting per-batch shortlists, exact
    re-rank of the global shortlist. Rows-only for the driver
    (iterative training); gated by tests/test_pq.py: full-shortlist ==
    brute force EXACTLY, recall floors on near-uniform + planted
    clusters, determinism, compression arithmetic."""
    from ..operators import pq

    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq.pq_topk(emb, queries, k=5, m=8, ksub=16, iters=3, shortlist=50)


def q_ann_ivfpq(spark: SparkSession, sf: str) -> DataFrame:
    """IVF-PQ composed index (operators/pq.py ivfpq_topk — the FAISS
    IndexIVFPQ + refine analog): coarse cells prune the scan, ADC
    tables score m-byte codes within probed cells, exact re-rank on
    the shortlist. Rows-only (iterative training); gated by
    tests/test_pq.py: wide-open probe+shortlist == brute force
    EXACTLY, planted-cluster recall >= 0.9."""
    from ..operators import pq

    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return pq.ivfpq_topk(
        emb, queries, k=5, nlist=16, nprobe=4, m=8, ksub=16, iters=3,
        shortlist=50,
    )


def q_ann_ivf(spark: SparkSession, sf: str) -> DataFrame:
    """IVF (inverted-file) ANN — the index-structured scale path
    beside ann_lsh (hash-structured): distributed k-means coarse
    quantizer, cell-pruned probe, exact in-cell re-rank
    (operators/ivf.py). Rows-only for the driver (centroid training
    is iterative, not SQL-expressible); gated instead by
    tests/test_ivf.py: exhaustive-probe == brute force EXACTLY,
    planted-cluster recall >= 0.9 at nprobe=4/24, determinism."""
    from ..operators import ivf

    emb = load(spark, sf, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return ivf.ivf_topk(emb, queries, k=5, nlist=16, nprobe=4, iters=3, dim=64)


# -------------------------------------------------------------- text stats
def q_doc_quality(spark: SparkSession, sf: str) -> DataFrame:
    # spread_scan: the five regex passes are the cost; a 1-row-group
    # input otherwise serializes them on one core (r06, guide §2.2)
    docs = spread_scan(load(spark, sf, "documents"), key="doc_id")
    text = F.col("text")
    return docs.select(
        "doc_id", *textstats.quality_bound_cols(text)
    ).select(
        "doc_id",
        *textstats.quality_feature_cols(),
        textstats.quality_score_col().alias("quality"),
    )


_STOPLIST_SQL = "[" + ", ".join(f"'{s}'" for s in textstats.STOPWORDS) + "]"

ORACLE["doc_quality"] = f"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), t -> t != '') AS words
  FROM documents),
f AS (
  SELECT doc_id, text, words,
         length(text) AS n_chars,
         len(words) AS n_words,
         len(list_filter(words, x -> list_contains({_STOPLIST_SQL}, x))) AS n_stop,
         length(regexp_replace(text, '[^\\.,;:!\\?''"-]', '', 'g')) AS n_punct,
         list_sum(list_transform(words, x -> length(x))) AS sum_wl
  FROM w)
SELECT doc_id, n_chars, n_words,
       CASE WHEN n_words > 0 THEN round(n_stop / n_words, 4) ELSE 0.0 END AS stop_ratio,
       CASE WHEN n_chars > 0 THEN round(n_punct / n_chars, 4) ELSE 0.0 END AS punct_ratio,
       CASE WHEN n_words > 0 THEN round(sum_wl / n_words, 4) ELSE 0.0 END AS mean_word_len,
       round((least(n_words / 100.0, 1.0)
            + least((CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0 END) * 5.0, 1.0)
            + (1.0 - least((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) * 5.0, 1.0)))
            / 3.0, 4) AS quality
FROM f
"""


def q_paragraph_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet-style corpus-wide paragraph dedup (operators/dedup.py
    paragraph_dedup): first occurrence of each distinct paragraph
    survives, documents are rebuilt in order. The driver documents
    table is single-paragraph (no newlines), so here the operator
    degenerates to exact first-occurrence text dedup — still a full
    cross-engine check of the explode → window-keep → rebuild
    machinery; the multi-paragraph semantics are pinned on structured
    rows in tests/test_offdriver_oracles.py."""
    docs = load(spark, sf, "documents").select("doc_id", "text")
    return dedup.paragraph_dedup(docs)


ORACLE["paragraph_dedup"] = r"""
WITH a AS (
  SELECT doc_id, string_split_regex(text, '\n\n') AS arr FROM documents),
u AS (
  SELECT doc_id, unnest(arr) AS para, unnest(generate_series(1, len(arr))) AS pos
  FROM a),
p AS (
  SELECT doc_id, para, pos FROM u WHERE para != ''),
k AS (
  SELECT doc_id, para, pos,
         row_number() OVER (PARTITION BY para ORDER BY doc_id, pos) AS rn
  FROM p),
r AS (
  SELECT doc_id, string_agg(para, E'\n\n' ORDER BY pos) AS text
  FROM k WHERE rn = 1 GROUP BY doc_id)
SELECT d.doc_id, coalesce(r.text, '') AS text
FROM documents d LEFT JOIN r USING (doc_id)
"""


def q_quality_model_score(spark: SparkSession, sf: str) -> DataFrame:
    """Model-based quality filter: the pinned LR coefficients
    (operators/quality_model.py DEFAULT_MODEL, trained distributed via
    pyspark.ml, clean-vs-degraded bootstrap labels) applied as a pure
    codegen sigmoid over the surface features — inference at 100 TB is
    whole-stage-codegen arithmetic, no Python, no model object."""
    from ..operators import quality_model

    docs = load(spark, sf, "documents").select("doc_id", "text")
    feats = quality_model.featurize(docs)
    return quality_model.score(feats).select("doc_id", "model_score")


def _quality_model_oracle() -> str:
    from ..operators import quality_model

    return f"""
WITH w AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), t -> t != '') AS words
  FROM documents),
f AS (
  SELECT doc_id,
         length(text) AS n_chars,
         len(words) AS n_words,
         len(list_filter(words, x -> list_contains({_STOPLIST_SQL}, x))) AS n_stop,
         length(regexp_replace(text, '[^\\.,;:!\\?''"-]', '', 'g')) AS n_punct,
         list_sum(list_transform(words, x -> length(x))) AS sum_wl
  FROM w),
g AS (
  SELECT doc_id,
         round(ln(1 + n_chars), 6) AS log_chars,
         round(ln(1 + n_words), 6) AS log_words,
         CASE WHEN n_words > 0 THEN round(n_stop / n_words, 4) ELSE 0.0 END AS stop_ratio,
         CASE WHEN n_chars > 0 THEN round(n_punct / n_chars, 4) ELSE 0.0 END AS punct_ratio,
         CASE WHEN n_words > 0 THEN round(sum_wl / n_words, 4) ELSE 0.0 END AS mean_word_len
  FROM f)
SELECT doc_id, {quality_model.oracle_score_sql()} AS model_score FROM g
"""


ORACLE["quality_model_score"] = _quality_model_oracle()


def q_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return docs.select(
        "doc_id",
        textstats.token_count_ws(F.col("text")).alias("n_ws_tokens"),
        textstats.token_count_bpe(F.col("text")).alias("n_bpe_tokens"),
    )


ORACLE["token_counts"] = """
SELECT doc_id,
       len(list_filter(string_split_regex(text, '\\s+'), t -> t != '')) AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]{1,4}|[0-9]+|[^a-zA-Z0-9\\s]')) AS n_bpe_tokens
FROM documents
"""


def q_source_mix(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted source mixing (operators/mixing.py): deterministic
    md5-hash sampling to target per-source rates — one scan, zero
    shuffles, nested subsets under rate tightening. Off the pinned
    driver surface; the identical md5-uniform oracle is pinned
    cross-engine in tests/test_mixing.py."""
    from ..operators import mixing

    docs = load(spark, sf, "documents")
    return mixing.weighted_sample(
        docs, {"src0": 0.25, "src1": 1.0, "src2": 0.5}, default=0.75
    ).select("doc_id", "source")


def q_bm25_search(spark: SparkSession, sf: str) -> DataFrame:
    """BM25 top-20 full-text search (operators/search.py) for a fixed
    3-term query over documents — scores rounded 4dp inside the
    operator so the identical-formula DuckDB oracle reproduces the
    exact doubles; deterministic (score desc, doc_id) tie-break."""
    from ..operators.search import bm25_topk

    docs = load(spark, sf, "documents")
    return bm25_topk(docs, ["data", "model", "quality"], k=20)


ORACLE["bm25_search"] = """
WITH w AS (
  SELECT doc_id, unnest(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), x -> x <> ''
         )) AS term
  FROM documents
), dl AS (
  SELECT doc_id, count(*) AS dl FROM w GROUP BY doc_id
), stats AS (
  SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
), tf AS (
  SELECT doc_id, term, count(*) AS tf FROM w
  WHERE term IN ('data', 'model', 'quality')
  GROUP BY doc_id, term
), dft AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM tf GROUP BY term
)
SELECT doc_id,
       round(sum(
         ln(1.0 + (stats.n_docs - dft.df + 0.5) / (dft.df + 0.5))
         * tf.tf / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl))
       ), 4) AS score
FROM tf JOIN dft USING (term) JOIN dl USING (doc_id) CROSS JOIN stats
GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 20
"""


def q_compression_ratio(spark: SparkSession, sf: str) -> DataFrame:
    """RefinedWeb-style compressibility quality signal: zlib
    compressed/raw bytes per doc (repetition/boilerplate → low ratio,
    gibberish → ~1). Rows-only (DuckDB has no zlib); monotonicity
    gates in tests/test_trainingdata_ops.py."""
    from ..operators.textstats import compression_ratio

    return compression_ratio(load(spark, sf, "documents")).orderBy("doc_id")


def q_split_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified train/val/test assignment
    (operators/mixing.split_assign): cumulative thresholds over the
    md5-uniform — one scan, zero shuffles, exhaustive/disjoint/
    stratified by construction. Full DuckDB oracle (the identical md5
    arithmetic); stratification/monotonicity gates in
    tests/test_mixing.py."""
    from ..operators import mixing

    docs = load(spark, sf, "documents")
    return mixing.split_assign(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}
    ).select("doc_id", "split")


ORACLE["split_assign"] = """
WITH u AS (
  SELECT doc_id,
         (list_sum(list_transform(range(1, 9), j ->
            CAST(strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR) || ':split'), j, 1)) - 1 AS BIGINT)
            * (CAST(1 AS BIGINT) << (4 * (8 - j)))))
          / 4294967296.0) AS uu
  FROM documents
)
SELECT doc_id,
       CASE WHEN uu < 0.8 THEN 'train'
            WHEN uu < 0.9 THEN 'val'
            ELSE 'test' END AS split
FROM u
"""


def q_pack_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Sequence packing (operators/packing.py): documents → fixed
    1024-token training examples via the distributed prefix sum.
    Driver-oracled since the r05 surface rotation: the oracle is the
    naive SQL GLOBAL window (the single-partition antipattern the
    operator exists to avoid) — same numbers, computed scalably; a
    plan-shape assertion in tests/test_packing.py pins the absence of
    any SinglePartition exchange."""
    from ..operators import packing

    docs = load(spark, sf, "documents")
    return packing.pack_assignments(
        docs, textstats.token_count_ws(F.col("text")), budget=1024
    )


# tokens_before is sum(BIGINT) -> HUGEINT in DuckDB; CAST keeps the
# driver's dtype-sensitive compare aligned with Spark's long.
ORACLE["pack_documents"] = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x != '')) AS BIGINT) AS n_tokens
  FROM documents),
c AS (
  SELECT doc_id, n_tokens,
         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS tokens_before
  FROM t)
SELECT doc_id, n_tokens, tokens_before,
       CAST(floor(tokens_before / 1024) AS BIGINT) AS pack_id,
       CAST(row_number() OVER (
         PARTITION BY floor(tokens_before / 1024) ORDER BY doc_id) - 1
         AS INT) AS pack_pos
FROM c
"""


def q_doc_fingerprint(spark: SparkSession, sf: str) -> DataFrame:
    docs = load(spark, sf, "documents")
    return docs.select("doc_id", textstats.fingerprint(F.col("text")).alias("fp"))


ORACLE["doc_fingerprint"] = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents)
SELECT doc_id,
       CAST(coalesce(list_sum(list_transform(range(1, len(words) + 1), i ->
            (list_sum(list_transform(range(1, 5), j ->
              (strpos('0123456789abcdef', substr(md5(words[i]), j, 1)) - 1)
              * (1 << (4 * (4 - j))))) * i) % 2147483647)), 0) % 2147483647 AS BIGINT) AS fp
FROM w
"""


def q_lang_id(spark: SparkSession, sf: str) -> DataFrame:
    """Arrow-batched n-gram language ID. The driver-checked output is
    the decision column (doc_id, lang_pred): marker counts are
    SQL-expressible via the replace-length trick, so the prediction
    gets a full DuckDB oracle. lang_conf (a rounded float whose
    banker's-rounding semantics differ between engines at exact-half
    decimals) stays an operator-level feature pinned by unit tests."""
    return textstats.lang_id(load(spark, sf, "documents")).select("doc_id", "lang_pred")


def _lang_id_oracle_sql() -> str:
    """Mirror of _lang_id_batches: non-overlapping substring counts per
    marker ((len - len(replace))/len(marker)), summed per language,
    argmax with (score desc, lang asc) tie-break, 'und' on zero total."""
    score_exprs = []
    for lang, ms in textstats.LANG_MARKERS.items():
        total = " + ".join(
            f"(len(t) - len(replace(t, '{m}', ''))) / {len(m)}" for m in ms
        )
        score_exprs.append(f"CAST({total} AS BIGINT) AS {lang}")
    langs = sorted(textstats.LANG_MARKERS)
    return f"""
WITH s AS (SELECT doc_id, lower(text) AS t FROM documents),
sc AS (SELECT doc_id, {', '.join(score_exprs)} FROM s),
r AS (SELECT doc_id, unnest([{', '.join(repr(lang) for lang in langs)}]) AS lang,
             unnest([{', '.join(langs)}]) AS score FROM sc)
SELECT doc_id,
       CASE WHEN sum(score) = 0 THEN 'und'
            ELSE (min(struct_pack(k := -score, l := lang))).l END AS lang_pred
FROM r GROUP BY doc_id
"""


ORACLE["lang_id"] = _lang_id_oracle_sql()


# -------------------------------------------------------------- multimodal
def q_media_metadata(spark: SparkSession, sf: str) -> DataFrame:
    media = multimodal.synthesize_media(load(spark, sf, "documents"))
    feats = multimodal.extract_features(media)
    return feats.select("media_id", "n_bytes", "sha")


ORACLE["media_metadata"] = """
SELECT doc_id AS media_id, octet_length(encode(text)) AS n_bytes, sha256(text) AS sha
FROM documents
"""


def q_media_features(spark: SparkSession, sf: str) -> DataFrame:
    """Full feature vectors from the stubbed decoder, quantized for the
    harness: the raw ``array<float>`` column is unhashable/unsortable in
    the driver's canonicalizer (r01 err), so emit each feature as
    round(x*1e6) joined with ','. The fake featureizer is
    sha256-derived, so the quantized vector is SQL-expressible and gets
    a full oracle (features are b/255 rounded to 6 places — b/255 never
    lands on an exact half at the 6th decimal, so both engines round
    identically, and the *1e6 quantization absorbs float32 storage
    error ~6e-8)."""
    media = multimodal.synthesize_media(load(spark, sf, "documents"))
    feats = multimodal.extract_features(media)
    return feats.select(
        "media_id",
        "n_bytes",
        "sha",
        F.array_join(
            F.transform(
                "features",
                lambda x: F.round(x * F.lit(1000000.0)).cast("int").cast("string"),
            ),
            ",",
        ).alias("features_q"),
    )


ORACLE["media_features"] = """
WITH m AS (
  SELECT doc_id AS media_id,
         octet_length(encode(text)) AS n_bytes,
         sha256(text) AS sha
  FROM documents)
SELECT media_id, n_bytes, sha,
  array_to_string(list_transform(range(1, 9), j ->
    CAST(round(round((
      (strpos('0123456789abcdef', substr(sha, 2*j - 1, 1)) - 1) * 16
      + strpos('0123456789abcdef', substr(sha, 2*j, 1)) - 1
    ) / 255.0, 6) * 1000000) AS INT)), ',') AS features_q
FROM m
"""


def q_media_resize(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal resize stage (1→1 binary mapInPandas): deterministic
    fake resizer (stride byte-subsample to 64x64/64 = 64 bytes) behind
    the injectable codec seam; emitted as hex so the harness can hash
    it (DuckDB 1.0 has no blob slicing — the oracle mirrors the stride
    math on hex(payload) with exact-arithmetic indices: /64 is a
    power-of-two divide, so floor(i*L/64.0) is fp-exact)."""
    media = multimodal.synthesize_media(load(spark, sf, "documents"))
    resized = multimodal.resize_media(media, width=64, height=64)
    return resized.select(
        "media_id",
        F.hex("payload").alias("resized_hex"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
    )


ORACLE["media_resize"] = """
WITH m AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS L
  FROM documents)
SELECT media_id,
  CASE WHEN L <= 64 THEN h ELSE
    list_reduce(list_transform(range(0, 64),
      i -> substr(h, 2 * CAST(floor(i * (L / 64.0)) AS BIGINT) + 1, 2)),
      (a, b) -> a || b)
  END AS resized_hex,
  64 AS width, 64 AS height
FROM m
"""


def q_media_frames(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal frame sampling (1→N mapInPandas): synthesize
    video-flavored media (duration = 10 ms per char) and emit one row
    per sampled frame, frame bytes as hex."""
    docs = load(spark, sf, "documents")
    media = docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake/raw").alias("format"),
            F.lit(0).cast("int").alias("width"),
            F.lit(0).cast("int").alias("height"),
            (F.length("text").cast("long") * 10).alias("duration_ms"),
        ).alias("meta"),
    )
    frames = multimodal.sample_frames(media, every_ms=1000, frame_bytes=32, max_frames=16)
    return frames.select(
        "media_id", "frame_idx", "ts_ms", F.hex("frame").alias("frame_hex"), "n_bytes"
    )


ORACLE["media_frames"] = """
WITH m AS (
  SELECT doc_id AS media_id, hex(encode(text)) AS h,
         octet_length(encode(text)) AS L, length(text) * 10 AS dur
  FROM documents),
n AS (SELECT *, least(dur // 1000 + 1, 16, greatest(L // 32, 1)) AS nf FROM m)
SELECT media_id, CAST(k AS INT) AS frame_idx, CAST(k * 1000 AS BIGINT) AS ts_ms,
       substr(h, CAST(k * 64 + 1 AS BIGINT), 64) AS frame_hex,
       CAST(least(L - k * 32, 32) AS INT) AS n_bytes
FROM n, unnest(range(0, nf)) AS t(k)
"""


# ---------------------------------------------------------------- B44 UDTF
def q_udtf_chunks(spark: SparkSession, sf: str) -> DataFrame:
    """Python UDTF (1→N rows): fixed-size word chunks per document —
    the SQL-callable flavor of block expansion (rows-only oracle;
    prefer mapInPandas for hot paths, SURVEY.md §2B B44)."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id: bigint, chunk_id: int, chunk: string, n_words: int")
    class ChunkDoc:
        def eval(self, doc_id: int, text: str, size: int):
            words = (text or "").split()
            for i in range(0, len(words), size):
                piece = words[i : i + size]
                yield doc_id, i // size, " ".join(piece), len(piece)

    load(spark, sf, "documents").createOrReplaceTempView("documents_v")
    spark.udtf.register("chunk_doc", ChunkDoc)
    return spark.sql(
        "SELECT c.* FROM documents_v, LATERAL chunk_doc(doc_id, text, 25) AS c"
    )


ORACLE["udtf_chunks"] = r"""
WITH w AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), t -> t != '') AS words
  FROM documents)
SELECT doc_id, CAST(g AS INT) AS chunk_id,
       array_to_string(words[CAST(g*25+1 AS BIGINT) : CAST(least((g+1)*25, len(words)) AS BIGINT)], ' ') AS chunk,
       CAST(least((g+1)*25, len(words)) - g*25 AS INT) AS n_words
FROM w, unnest(range(0, CAST(ceil(len(words)/25.0) AS BIGINT))) AS t(g)
"""


# ------------------------------------------------------------- streaming
def q_stream_events_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """Structured Streaming ingest (availableNow) with watermarked
    stateful dedup, then hourly rollup of the ingested table.

    Exercises B45/B46/B49; the oracle is the batch equivalent because
    replaying the whole file in one availableNow run drops nothing.
    """
    from ..streaming.events import ingest_events_stream

    batch_schema = load(spark, sf, "events").schema
    out_dir = ingest_events_stream(
        spark, os.path.join(sf, "events.parquet"), batch_schema,
        tempfile.mkdtemp(prefix="nidaba_stream_")
    )
    ingested = spark.read.schema(batch_schema).parquet(out_dir)
    return (
        ingested.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


ORACLE["stream_events_hourly"] = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
       count(*) AS n, round(sum(value), 2) AS sum_value
FROM events GROUP BY 1
"""


def q_stream_sessionize_events(spark: SparkSession, sf: str) -> DataFrame:
    """Stateful streaming session_window (B48, stream form): 5-min-gap
    sessions per user computed IN the stream (availableNow → memory
    sink), exposing the driver-checked counterpart of the batch
    sessionize_events query. The oracle is the batch lag+cumsum CTE:
    Spark's session_window closes at gap >= 5 min while the batch rule
    starts a new session at gap > 5 min, but the events corpus has no
    exact 5-min gaps at any SF (verified), so the two agree row-for-row
    on this data; tests/test_session_window.py cross-checks the
    semantics independently."""
    from ..streaming.events import _as_stream_dir

    schema = load(spark, sf, "events").schema
    work = tempfile.mkdtemp(prefix="nidaba_sess_stream_")
    src = _as_stream_dir(os.path.join(sf, "events.parquet"), work)
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .withColumn("ts_tz", F.col("ts").cast("timestamp"))
        .withWatermark("ts_tz", "10 minutes")
        .groupBy(
            F.session_window("ts_tz", "5 minutes").alias("sw"), F.col("user_id")
        )
        .agg(
            F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias(
                "session_start"
            ),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("session_value"),
        )
    )
    name = "sess_" + os.path.basename(work).replace("-", "_").replace(".", "_")
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.sql(
        f"SELECT user_id, session_start, n_events, session_value FROM {name}"
    )


ORACLE["stream_sessionize_events"] = """
WITH marked AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts > lag(ts) OVER w + INTERVAL 5 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
  FROM marked)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       count(*) AS n_events, round(sum(value), 2) AS session_value
FROM sess GROUP BY user_id, sess_id
"""


# ------------------------------------------------- flagship extraction
def q_extract_documents(spark: SparkSession, sf: str) -> DataFrame:
    """Flagship: synthesize Common-Crawl-style pages around the
    documents corpus (boilerplate nav/sidebar/footer + the doc text as
    the content block), run the FULL extraction pipeline, return the
    extracted text per doc.

    The oracle is expressible because the synthesized page's main
    content is exactly the document text: whether the classifier keeps
    the content block or routes through the crawler-text fallback, the
    extracted text equals the whitespace-normalized document text.
    """
    from .. import pipeline

    docs = load(spark, sf, "documents")
    html = F.concat(
        F.lit(
            "<!DOCTYPE html><html><head><meta charset=\"utf-8\"><title>doc</title></head>"
            "<body><nav><ul><li><a href=\"/home\">home</a></li><li><a href=\"/about\">about</a></li>"
            "<li><a href=\"/blog\">blog</a></li></ul></nav><article><p>"
        ),
        F.col("text"),
        F.lit(
            "</p></article><aside><div class=\"ad\"><a href=\"/x\">deal now</a></div></aside>"
            "<footer><p>© 2024 example inc</p><div><a href=\"/a\">a</a> <a href=\"/b\">b</a></div>"
            "</footer></body></html>"
        ),
    )
    pages = docs.select(
        F.concat(F.lit("doc://"), F.col("doc_id")).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    ext = pipeline.extract(pages)
    return ext.select(
        F.substring("url", 7, 100).cast("bigint").alias("doc_id"),
        F.col("text").alias("extracted_text"),
    )


ORACLE["extract_documents"] = r"""
SELECT doc_id, trim(regexp_replace(text, '[ \t\r\n\v\f]+', ' ', 'g')) AS extracted_text
FROM documents
"""


_MD_INTRO = (
    "This introductory paragraph exists so that the boilerplate classifier "
    "keeps the article body that follows because a long low link density "
    "block right before a heading makes every later decision in this "
    "synthetic fixture fully deterministic for the oracle at any scale"
)
_MD_QUOTE = (
    "A reliably quoted passage of exactly seventeen words keeps this "
    "block via the current word count rule"
)
# the ```-wrapped token pins the dynamic fence rule (fence grows to
# one backtick more than the content's longest run — here 4); still
# exactly seventeen whitespace words for the segmenter's keep rule
_MD_CODE = (
    "def synthetic_function(): return the seventeen word code ```sample``` "
    "that survives the current block rule here now today"
)


def q_extract_markdown(spark: SparkSession, sf: str) -> DataFrame:
    """Structure-preserving extraction (operators/markdown.py): pages
    synthesized around the documents corpus with a full structural
    spread — boilerplate nav/footer, intro paragraph, h1/h2 headings,
    the doc text, a blockquote, two list items, a pre block — run
    through decode → segment → markdown_stage. Every NumWordsRules
    keep/drop decision in the fixture is word-count-engineered to be
    unconditional (the intro carries >40 words so the post-nav
    high-link rule keeps it; quote/code carry exactly 17 so the
    curr>16 rule keeps them; headings/list items ride neighbor
    rules), so the oracle reconstructs the exact Markdown string."""
    from ..operators.markdown import extract_markdown

    # r06: no spread_scan here — extract_markdown's prepare() already
    # repartitions; npartitions is pinned to cores*2 below instead of
    # prepare's cores*8 default (50k ~1KB pages over-fragment at 256
    # tasks: per-task Python batch overhead dominated, 7.5 -> 3.3 s)
    docs = load(spark, sf, "documents")
    i_s = F.col("doc_id").cast("string")
    html = F.concat(
        F.lit(
            '<!DOCTYPE html><html><head><meta charset="utf-8"><title>doc</title>'
            '</head><body><nav><ul><li><a href="/home">home</a></li></ul></nav>'
            f"<article><p>{_MD_INTRO}</p><h1>Guide to article "
        ),
        i_s,
        F.lit(" part one</h1><p>"),
        F.col("text"),
        F.lit(f"</p><h2>Related notes</h2><blockquote>{_MD_QUOTE}</blockquote><ul><li>alpha item "),
        i_s,
        F.lit("</li><li>beta item "),
        i_s,
        F.lit(f"</li></ul><pre>{_MD_CODE}</pre></article>"),
        F.lit(
            '<footer><div><a href="/a">a</a> <a href="/b">b</a></div>'
            "<p>© 2024 example inc</p></footer></body></html>"
        ),
    )
    pages = docs.select(
        F.concat(F.lit("doc://"), i_s).alias("url"),
        F.lit("2024-01-01 00:00:00").cast("timestamp").alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.col("text"),
        F.col("lang"),
    )
    nparts = 2 * spark.sparkContext.defaultParallelism
    md = extract_markdown(pages, npartitions=nparts)
    return md.select(
        F.substring("url", 7, 100).cast("bigint").alias("doc_id"),
        F.col("markdown"),
        F.col("n_blocks_kept"),
    )


ORACLE["extract_markdown"] = rf"""
SELECT doc_id,
       '{_MD_INTRO}' || chr(10) || chr(10)
       || '# Guide to article ' || doc_id || ' part one' || chr(10) || chr(10)
       || trim(regexp_replace(text, '[ \t\r\n\v\f]+', ' ', 'g')) || chr(10) || chr(10)
       || '## Related notes' || chr(10) || chr(10)
       || '> {_MD_QUOTE}' || chr(10) || chr(10)
       || '- alpha item ' || doc_id || chr(10) || chr(10)
       || '- beta item ' || doc_id || chr(10) || chr(10)
       || '````' || chr(10) || '{_MD_CODE}' || chr(10) || '````' AS markdown,
       CAST(8 AS INTEGER) AS n_blocks_kept
FROM documents
"""


def q_readability(spark: SparkSession, sf: str) -> DataFrame:
    """Flesch / Flesch-Kincaid readability annotation
    (operators/textstats.readability_cols): pure codegen counts +
    arithmetic, oracle runs the identical regexes and formulas."""
    from ..operators.textstats import readability_cols

    return load(spark, sf, "documents").select(
        "doc_id", *readability_cols(F.col("text"))
    )


ORACLE["readability"] = r"""
WITH n AS (
  SELECT doc_id, trim(regexp_replace(text, '[ \t\r\n\f\x0B]+', ' ', 'g')) AS s
  FROM documents),
c AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(s, '[^ ]+')) AS INTEGER) AS n_words,
         CAST(len(regexp_extract_all(
           s, '[^.!?。！？]*[^.!?。！？\s]\s*[.!?。！？]+|[^.!?。！？]*[^.!?。！？\s]$'
         )) AS INTEGER) AS n_sentences,
         CAST(len(regexp_extract_all(lower(s), '[aeiouy]+')) AS INTEGER)
           AS n_syllables
  FROM n)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(206.835
             - 1.015 * (n_words / CAST(greatest(n_sentences, 1) AS DOUBLE))
             - 84.6 * (n_syllables / CAST(greatest(n_words, 1) AS DOUBLE)),
             4) AS flesch,
       round(0.39 * (n_words / CAST(greatest(n_sentences, 1) AS DOUBLE))
             + 11.8 * (n_syllables / CAST(greatest(n_words, 1) AS DOUBLE))
             - 15.59, 4) AS fk_grade
FROM c
"""


def q_sentences(spark: SparkSession, sf: str) -> DataFrame:
    """Sentence segmentation (operators/textstats.sentence_rows): one
    row per sentence with document-order index and word count; the
    pattern is the Java-regex ∩ RE2 subset so the oracle runs the
    IDENTICAL split."""
    from ..operators.textstats import sentence_rows

    return sentence_rows(spread_scan(load(spark, sf, "documents"), key="doc_id"))


ORACLE["sentences"] = r"""
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(
           trim(regexp_replace(text, '[ \t\r\n\f\x0B]+', ' ', 'g')),
           '[^.!?。！？]*[^.!?。！？\s]\s*[.!?。！？]+|[^.!?。！？]*[^.!?。！？\s]$'
         ) AS sents
  FROM documents)
SELECT doc_id,
       CAST(i - 1 AS INTEGER) AS sent_idx,
       trim(sents[i]) AS sentence,
       CAST(len(string_split(trim(sents[i]), ' ')) AS INTEGER) AS n_words
FROM w, UNNEST(generate_series(1, len(sents))) AS t(i)
"""


# -------------------------------------------- corpus-hygiene filters
def q_duplicate_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Substring-level duplication stats (operators/filters.py
    duplicate_span_stats, the Lee-et-al span-hash approximation) at a
    10-token window — small enough that most synthetic docs carry
    spans while exact-duplicate docs light up at dup_span_frac=1."""
    from ..operators.filters import duplicate_span_stats

    return duplicate_span_stats(load(spark, sf, "documents"), n=10)


ORACLE["duplicate_spans"] = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS words
  FROM documents),
g AS (
  SELECT doc_id, array_to_string(words[i:i+9], ' ') AS span
  FROM w, UNNEST(generate_series(1, len(words)-9)) AS t(i)),
c AS (SELECT span, count(*) AS cnt FROM g GROUP BY span)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       round(avg(CASE WHEN c.cnt > 1 THEN 1.0 ELSE 0.0 END), 4) AS dup_span_frac
FROM g JOIN c USING (span)
GROUP BY doc_id
"""


def q_repetition_filter(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher-style repetition stats (word-bigram granularity) for
    every document, flagging the most-common-bigram mass > 0.18 cut
    (Rae et al. 2021 use 0.18 for top-2-gram character fraction)."""
    from ..operators.filters import repetition_stats

    docs = load(spark, sf, "documents")
    stats = repetition_stats(docs)
    return stats.select(
        "doc_id",
        "n_bigrams",
        "top_bigram_frac",
        "dup_bigram_frac",
        (F.col("top_bigram_frac") > 0.18).alias("repetitive"),
    )


ORACLE["repetition_filter"] = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS words
  FROM documents
), b AS (
  SELECT doc_id, words[i] || ' ' || words[i+1] AS bigram
  FROM w, UNNEST(generate_series(1, len(words)-1)) AS t(i)
), c AS (
  SELECT doc_id, bigram, count(*) AS c FROM b GROUP BY doc_id, bigram
)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       round(max(c)::DOUBLE / sum(c), 4) AS top_bigram_frac,
       round(1.0 - count(*)::DOUBLE / sum(c), 4) AS dup_bigram_frac,
       round(max(c)::DOUBLE / sum(c), 4) > 0.18 AS repetitive
FROM c GROUP BY doc_id
"""


def q_decontaminate(spark: SparkSession, sf: str) -> DataFrame:
    """Eval-set decontamination: docs with doc_id % 97 == 0 form the
    held-out eval set; every other doc sharing a word-5-gram with it
    is flagged with its distinct-overlap count."""
    from ..operators.filters import decontaminate

    docs = load(spark, sf, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(train, eval_df, n=5)


ORACLE["decontaminate"] = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS words
  FROM documents
), g AS (
  SELECT doc_id, array_to_string(words[i:i+4], ' ') AS gram
  FROM w, UNNEST(generate_series(1, len(words)-4)) AS t(i)
), eval_g AS (
  SELECT DISTINCT gram FROM g WHERE doc_id % 97 = 0
), train_g AS (
  SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 97 <> 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_overlap
FROM train_g JOIN eval_g USING (gram)
GROUP BY doc_id
"""


def q_decontaminate_bloom(spark: SparkSession, sf: str) -> DataFrame:
    """Bloom-filter decontamination (the 10^12-row scale path): same
    eval split as q_decontaminate, but the train side probes a
    broadcast Bloom filter of the eval grams' xxhash64s — ONE scan,
    ZERO train-side shuffles (no explode, no distinct, no join).

    Oracle = the exact-decontamination SQL: bloom membership of an
    inserted key is certain (no false negatives ever), and at
    fpp=1e-9 the expected false-positive count over this corpus's
    distinct train grams is < 1e-3, so the deterministic output
    coincides with the exact result (the superset guarantee at looser
    fpp is pinned separately in tests/test_bloom_decontaminate.py).
    """
    from ..operators.filters import decontaminate_bloom

    docs = load(spark, sf, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate_bloom(train, eval_df, n=5, fpp=1e-9)


ORACLE["decontaminate_bloom"] = ORACLE["decontaminate"]


def q_decontaminate_fuzzy(spark: SparkSession, sf: str) -> DataFrame:
    """Fuzzy per-eval-sample decontamination (GPT-3 appendix-C /
    Llama-2 family): docs with doc_id % 7 == 0 form the eval set (a
    split that catches one member of several of the corpus's planted
    near-dup pairs, so the rule fires at every SF — the %97 split of
    q_decontaminate misses them all at sf0.01), and a (train doc,
    eval item) pair is flagged only when the shared distinct
    word-5-grams cover >= 20% of THAT eval item's grams — leakage of
    a benchmark sample, not a stray boilerplate phrase. Eval gram
    table + per-item totals broadcast; train side pays the one
    distinct it already pays for exact decontamination."""
    from ..operators.filters import decontaminate_fuzzy

    docs = load(spark, sf, "documents")
    eval_df = docs.filter(F.col("doc_id") % 7 == 0)
    train = docs.filter(F.col("doc_id") % 7 != 0)
    return decontaminate_fuzzy(train, eval_df, n=5, threshold=0.2)


ORACLE["decontaminate_fuzzy"] = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS words
  FROM documents
), g AS (
  SELECT doc_id, array_to_string(words[i:i+4], ' ') AS gram
  FROM w, UNNEST(generate_series(1, len(words)-4)) AS t(i)
), eval_g AS (
  SELECT DISTINCT doc_id AS eval_id, gram FROM g WHERE doc_id % 7 = 0
), eval_tot AS (
  SELECT eval_id, CAST(count(*) AS BIGINT) AS eval_grams
  FROM eval_g GROUP BY eval_id
), train_g AS (
  SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 7 <> 0
), hits AS (
  SELECT t.doc_id, e.eval_id, CAST(count(*) AS BIGINT) AS n_shared
  FROM train_g t JOIN eval_g e USING (gram)
  GROUP BY t.doc_id, e.eval_id
)
SELECT h.doc_id, h.eval_id, h.n_shared, et.eval_grams,
       round(h.n_shared::DOUBLE / et.eval_grams, 4) AS overlap_frac
FROM hits h JOIN eval_tot et USING (eval_id)
WHERE h.n_shared >= et.eval_grams * 0.2
"""


def q_source_pagerank(spark: SparkSession, sf: str) -> DataFrame:
    """Domain-authority ranking over a deterministic planted link
    graph: every doc links to its 7-block head doc (doc_id - doc_id%7)
    and to its successor, edge endpoints being the docs' sources (the
    corpus has no link column — same planting convention as
    q_redact_pii; the block-head rule skews in-links so ranks are
    non-degenerate). Rows-only (iterative float algorithm); exact
    numpy-reference parity gates live in tests/test_graphrank.py."""
    from ..operators.graphrank import pagerank

    docs = load(spark, sf, "documents").select("doc_id", "source")
    targets = docs.select(
        F.col("doc_id").alias("_t"), F.col("source").alias("dst")
    )
    by_head = docs.withColumn("_t", F.col("doc_id") - F.col("doc_id") % 7)
    by_next = docs.withColumn("_t", F.col("doc_id") + 1)
    edges = (
        by_head.unionByName(by_next)
        .join(targets, "_t")
        .filter(F.col("source") != F.col("dst"))
        .select(F.col("source").alias("src"), "dst")
    )
    return (
        pagerank(edges, damping=0.85, iters=10)
        .select("node", F.round("rank", 6).alias("rank"))
        .orderBy("node")
    )


def q_bpe_token_counts(spark: SparkSession, sf: str) -> DataFrame:
    """Learned-BPE token counts: train 40 merges on the corpus's word
    dictionary (one distributed reduction + driver merge loop), then
    tokenize every doc with the learned merges (memoized Arrow UDF).
    Rows-only by nature (iterative training); the Sennrich worked
    example, determinism, and round-trip gates live in
    tests/test_bpe.py."""
    from ..operators.bpe import bpe_tokens_col, train_bpe

    docs = load(spark, sf, "documents")
    merges = train_bpe(docs, num_merges=40)
    tok = bpe_tokens_col(merges)(F.col("text"))
    return docs.select(
        "doc_id", F.size(tok).alias("n_bpe_tokens")
    ).orderBy("doc_id")


def q_hll_tokens_per_lang(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language distinct-token estimates via DataSketches HLL
    (mergeable sketch rows — the rescan-free rollup pattern). Rows-only
    by nature (DuckDB's approx_count_distinct is a different sketch);
    tests/test_sketches.py gates the 5% error bound vs exact and pins
    union(per-bucket sketches) == direct(whole corpus) estimates."""
    from ..operators.sketches import token_hll_sketches

    docs = load(spark, sf, "documents")
    return token_hll_sketches(docs).select(
        "lang", "n_tokens", F.round("distinct_tokens_est", 2).alias("distinct_tokens_est")
    ).orderBy("lang")


def q_redact_pii(spark: SparkSession, sf: str) -> DataFrame:
    """PII redaction over deterministically PII-augmented documents
    (the corpus itself has no PII, so the query plants an email /
    phone / IPv4 derived from doc_id on fixed residue classes, then
    counts + redacts). redacted_md5 pins the byte-exact output."""
    from ..operators.filters import pii_counts, redact_pii

    docs = load(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com now")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call +1 555-010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(
                F.lit(" from 192.168."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                ((F.col("doc_id") * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    augmented = docs.select(F.col("doc_id"), aug.alias("aug"))
    return augmented.select(
        "doc_id",
        *pii_counts(F.col("aug")),
        F.md5(redact_pii(F.col("aug"))).alias("redacted_md5"),
    )


ORACLE["redact_pii"] = r"""
WITH a AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call +1 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' from 192.168.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256)
                 ELSE '' END AS aug
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(aug, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER) AS n_email,
       CAST(len(regexp_extract_all(aug, '\+\d{1,2} \d{3}-\d{3}-\d{4}')) AS INTEGER) AS n_phone,
       CAST(len(regexp_extract_all(aug, '\b\d{1,3}(\.\d{1,3}){3}\b')) AS INTEGER) AS n_ip,
       md5(regexp_replace(regexp_replace(regexp_replace(aug,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
           '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g'),
           '\+\d{1,2} \d{3}-\d{3}-\d{4}', '<PHONE>', 'g')) AS redacted_md5
FROM a
"""


# ----------------------------------- quality: unigram-LM typicality
def q_unigram_logprob(spark: SparkSession, sf: str) -> DataFrame:
    """Perplexity-proxy quality score: per-doc mean log10 unigram
    probability under the corpus's own unigram LM, hot-word skew
    handled via a broadcast/shuffle split join (operators/textstats
    .unigram_logprob)."""
    return textstats.unigram_logprob(load(spark, sf, "documents"))


ORACLE["unigram_logprob"] = f"""
WITH w AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents),
tf AS (
  SELECT doc_id, word, count(*) AS k FROM w GROUP BY 1, 2),
cnt AS (
  SELECT word, sum(k) AS c FROM tf GROUP BY word),
tot AS (
  SELECT sum(c)::DOUBLE AS n FROM cnt)
SELECT doc_id,
       CAST(sum(k) AS BIGINT) AS n_tokens,
       round(sum(k * log10(c / n)) / sum(k), 6) AS avg_logprob
FROM tf JOIN cnt USING (word), tot
GROUP BY doc_id
"""


# ------------------------------------- dedup: cluster resolution (CC)
def q_dedup_clusters(spark: SparkSession, sf: str) -> DataFrame:
    """Near-dup pairs (exact Jaccard >= 0.4) resolved into duplicate
    clusters via alternating large-star/small-star connected
    components (operators/cluster.py): one row per clustered doc,
    (node, rep) with rep = min doc_id of the component — the keep-min
    drop policy the pairwise dedup operators stop short of."""
    from ..operators.cluster import connected_components

    pairs = dedup.ngram_jaccard_pairs(load(spark, sf, "documents"), threshold=0.4)
    return connected_components(pairs).select(
        F.col("node").cast("long").alias("node"),
        F.col("rep").cast("long").alias("rep"),
    )


ORACLE["dedup_clusters"] = """
WITH RECURSIVE tsets AS (
  SELECT doc_id AS id,
         list_distinct(list_filter(
           string_split_regex(lower(text), '[^a-z0-9]+'), t -> t != '')) AS ts
  FROM documents),
toks AS (SELECT id, unnest(ts) AS tok FROM tsets),
shared AS (
  SELECT a.id AS id_a, b.id AS id_b, count(*) AS o
  FROM toks a JOIN toks b ON a.tok = b.tok AND a.id < b.id
  GROUP BY 1, 2),
pairs AS (
  SELECT id_a, id_b
  FROM shared
  JOIN tsets ta ON ta.id = id_a
  JOIN tsets tb ON tb.id = id_b
  WHERE round(o / (len(ta.ts) + len(tb.ts) - o), 6) >= 0.4),
e AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs),
walk(node, reach) AS (
  SELECT u, u FROM (SELECT DISTINCT u FROM e)
  UNION
  SELECT w.node, e.v FROM walk w JOIN e ON w.reach = e.u)
SELECT CAST(node AS BIGINT) AS node, CAST(min(reach) AS BIGINT) AS rep
FROM walk GROUP BY node
"""


# ------------------------------------------------------- link graph
def _synth_pages(docs: DataFrame) -> DataFrame:
    """Deterministic Common-Crawl-style pages around the documents
    corpus, used by every link/meta query. Planted features:

    * <a> links covering every resolution class: root-relative (dq +
      sq quoting), absolute, protocol-relative, dot-relative,
      word-relative (doc-dependent), plus a fragment-only and a
      mailto: link that must be DROPPED;
    * a COMMENTED-OUT poison block right after <title> carrying an
      <a href>, a rel=canonical, and a robots noindex — a scan that
      read comments would emit an extra edge on every page, pick the
      poison canonical first, and flag every page noindex; every
      oracle derives independently from documents columns, so any
      scan-region regression mismatches here;
    * a <title> carrying the doc's first word;
    * doc_id % 13 == 0  -> <meta name=robots content="noindex, follow">
      (content-before-name attribute order on doc_id % 2 == 0);
    * doc_id % 5 != 0   -> <link rel=canonical> to /c/<doc_id // 10>
      (href-before-rel attribute order on doc_id % 2 == 0), so up to
      ten pages share one canonical target.
    """
    w = F.regexp_extract(F.lower(F.col("text")), "[a-z0-9]+", 0)
    robots = F.when(
        F.col("doc_id") % 13 == 0,
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit('<meta content="noindex, follow" name="robots">'),
        ).otherwise(F.lit('<meta name="robots" content="noindex, follow">')),
    ).otherwise(F.lit(""))
    canon_target = F.concat(
        F.lit("https://docs.example.com/c/"),
        (F.col("doc_id") / 10).cast("long").cast("string"),
    )
    canonical = F.when(
        F.col("doc_id") % 5 != 0,
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(F.lit('<link href="'), canon_target, F.lit('" rel="canonical">')),
        ).otherwise(
            F.concat(F.lit('<link rel="canonical" href="'), canon_target, F.lit('">'))
        ),
    ).otherwise(F.lit(""))
    html = F.concat(
        F.lit("<html><head><title>Doc "),
        F.col("doc_id").cast("string"),
        F.lit(" "),
        w,
        F.lit("</title>"),
        F.lit(
            '<!-- <a href="https://poison.example.net/q">stale</a>'
            '<link rel="canonical" href="/poison">'
            '<meta name="robots" content="noindex"> -->'
        ),
        robots,
        canonical,
        F.lit(
            '</head><body><nav><a href="/home">home</a> '
            "<a href='/about'>about</a></nav>"
            '<p><a href="https://ref.example.org/cite">cite</a>'
            '<a href="//cdn.example.net/lib.js">cdn</a>'
            '<a href="#top">top</a> <a href="mailto:x@example.com">mail</a>'
            '<a href="../up">up</a> <a href="rel/'
        ),
        w,
        F.lit('">w</a></p></body></html>'),
    )
    return docs.select(
        F.concat(
            F.lit("https://docs.example.com/d/"),
            F.col("doc_id").cast("string"),
            F.lit("/page.html"),
        ).alias("url"),
        F.encode(html, "utf-8").alias("html"),
    )


def q_robots_filter(spark: SparkSession, sf: str) -> DataFrame:
    """robots.txt honor check (operators/robots.py) over synthesized
    per-host robots files: pages live on 20 hosts (doc_id % 20); each
    host's file exercises one parser regime by host % 4 —
      0: wildcard-agent prefix disallow (/d/1...);
      1: specific-agent group whose Allow out-lengths a Disallow-all,
         with a *-group decoy that must NOT apply (specific wins);
      2: comments + empty Disallow (no-op) — everything allowed;
      3: other-agent group decoy, * group disallows /d/7... .
    The oracle derives the allowed flag INDEPENDENTLY from the doc_id
    arithmetic (like page_links), so it checks parsing + group
    selection + longest-match end to end rather than mirroring it."""
    from ..operators.robots import robots_filter

    docs = load(spark, sf, "documents")
    k = (F.col("doc_id") % 20).cast("long")
    pages = docs.select(
        "doc_id",
        F.concat(
            F.lit("https://h"),
            k.cast("string"),
            F.lit(".example.com/d/"),
            F.col("doc_id").cast("string"),
            F.lit("/page.html"),
        ).alias("url"),
    )
    hosts = docs.select(k.alias("k")).distinct()
    txt = (
        F.when(
            F.col("k") % 4 == 0, F.lit("User-agent: *\nDisallow: /d/1\n")
        )
        .when(
            F.col("k") % 4 == 1,
            F.lit(
                "User-agent: nidababot\nDisallow: /\nAllow: /d/\n\n"
                "User-agent: *\nDisallow: /\n"
            ),
        )
        .when(
            F.col("k") % 4 == 2,
            F.lit("# free for all\nUser-agent: *\nDisallow:\n"),
        )
        .otherwise(
            F.lit(
                "User-agent: otherbot\nDisallow: /\n\n"
                "User-agent: *\nDisallow: /d/7\n"
            )
        )
    )
    robots = hosts.select(
        F.concat(F.lit("h"), F.col("k").cast("string"), F.lit(".example.com")).alias(
            "host"
        ),
        txt.alias("robots_txt"),
    )
    return robots_filter(pages, robots, agent="nidababot").select(
        "doc_id", "url", "robots_allowed"
    )


ORACLE["robots_filter"] = """
SELECT doc_id,
       'https://h' || (doc_id % 20) || '.example.com/d/' || doc_id ||
         '/page.html' AS url,
       CASE (doc_id % 20) % 4
         WHEN 0 THEN NOT (CAST(doc_id AS VARCHAR) LIKE '1%')
         WHEN 1 THEN TRUE
         WHEN 2 THEN TRUE
         ELSE NOT (CAST(doc_id AS VARCHAR) LIKE '7%')
       END AS robots_allowed
FROM documents
"""


def q_page_links(spark: SparkSession, sf: str) -> DataFrame:
    """Outlink extraction (operators/links.py — pure codegen
    regexp_extract_all scan, no Python) over the synthesized pages.
    The oracle reconstructs the expected edges directly from documents
    columns — an independent derivation, so it checks extraction +
    resolution end to end rather than mirroring the regex."""
    from ..operators.links import page_links

    pages = _synth_pages(spread_scan(load(spark, sf, "documents"), key="doc_id"))
    return page_links(pages).select(
        F.regexp_extract(F.col("src"), "/d/([0-9]+)/", 1)
        .cast("bigint")
        .alias("doc_id"),
        "dst",
    )


ORACLE["page_links"] = """
WITH f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_extract(lower(text), '[a-z0-9]+', 0) AS w
  FROM documents)
SELECT doc_id, dst FROM (
  SELECT doc_id, 'https://docs.example.com/home' AS dst FROM f
  UNION ALL SELECT doc_id, 'https://docs.example.com/about' FROM f
  UNION ALL SELECT doc_id, 'https://ref.example.org/cite' FROM f
  UNION ALL SELECT doc_id, 'https://cdn.example.net/lib.js' FROM f
  UNION ALL SELECT doc_id,
    'https://docs.example.com/d/' || doc_id || '/../up' FROM f
  UNION ALL SELECT doc_id,
    'https://docs.example.com/d/' || doc_id || '/rel/' || w FROM f
)
"""


def q_host_link_graph(spark: SparkSession, sf: str) -> DataFrame:
    """Host-level edge aggregation (the PageRank input): same
    synthesized pages as page_links, host_edges on top. The oracle
    derives the per-host-pair counts arithmetically from the planted
    link set (4 same-host + 1 ref + 1 cdn link per doc), again an
    independent derivation."""
    from ..operators.links import host_edges, page_links

    pages = _synth_pages(load(spark, sf, "documents"))
    return host_edges(page_links(pages)).select(
        "src_host", "dst_host", F.col("n_links").cast("long").alias("n_links")
    )


ORACLE["host_link_graph"] = """
WITH n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM documents)
SELECT 'docs.example.com' AS src_host, 'docs.example.com' AS dst_host,
       4 * c AS n_links FROM n
UNION ALL
SELECT 'docs.example.com', 'ref.example.org', c FROM n
UNION ALL
SELECT 'docs.example.com', 'cdn.example.net', c FROM n
"""


def q_anchor_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Anchor-text aggregation per link target (operators/links
    .anchor_texts → one map-side-combined groupBy): the classic
    ranking/labeling signal — what the WEB says a page is about.
    Single-quoted, fragment-only and mailto: anchors are excluded by
    construction; oracle derives the expected per-dst counts and the
    sorted distinct anchor list arithmetically."""
    from ..operators.links import anchor_texts

    pages = _synth_pages(load(spark, sf, "documents"))
    return (
        anchor_texts(pages)
        .groupBy("dst")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_links"),
            F.array_join(F.array_sort(F.collect_set("anchor")), "|").alias(
                "anchors"
            ),
        )
    )


ORACLE["anchor_stats"] = """
WITH f AS (
  SELECT doc_id, regexp_extract(lower(text), '[a-z0-9]+', 0) AS w
  FROM documents)
SELECT 'https://docs.example.com/home' AS dst,
       CAST(count(*) AS BIGINT) AS n_links, 'home' AS anchors FROM f
UNION ALL
SELECT 'https://ref.example.org/cite', CAST(count(*) AS BIGINT), 'cite' FROM f
UNION ALL
SELECT 'https://cdn.example.net/lib.js', CAST(count(*) AS BIGINT), 'cdn' FROM f
UNION ALL
SELECT 'https://docs.example.com/d/' || doc_id || '/../up',
       CAST(1 AS BIGINT), 'up' FROM f
UNION ALL
SELECT 'https://docs.example.com/d/' || doc_id || '/rel/' || w,
       CAST(1 AS BIGINT), 'w' FROM f
"""


def q_normalize_urls(spark: SparkSession, sf: str) -> DataFrame:
    """URL canonicalization (operators/links.normalize_url): messy
    synthesized variants — uppercase scheme/host, default ports,
    userinfo, fragments, tracking params, unordered query strings,
    empty paths — normalized into the dedup key. Oracle = the expected
    string built arithmetically per residue class, an independent
    derivation."""
    from ..operators.links import normalize_url

    docs = spread_scan(load(spark, sf, "documents"), key="doc_id")
    i = F.col("doc_id").cast("string")
    raw = (
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit("HTTPS://Docs.Example.COM:443/d/"),
                i,
                F.lit("/Page.html?utm_source=mail&b=2&a=1#frag"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 1,
            F.concat(
                F.lit("http://docs.example.com:80/d/"),
                i,
                F.lit("/page.html?z=9&gclid=123&y=8"),
            ),
        )
        .when(
            F.col("doc_id") % 4 == 2,
            F.concat(F.lit("https://u:p@docs.example.com/d/"), i),
        )
        .otherwise(F.lit("https://Other.Example.NET"))
    )
    return docs.select("doc_id", normalize_url(raw).alias("norm_url"))


ORACLE["normalize_urls"] = """
SELECT doc_id,
       CASE doc_id % 4
         WHEN 0 THEN 'https://docs.example.com/d/' || doc_id || '/Page.html?a=1&b=2'
         WHEN 1 THEN 'http://docs.example.com/d/' || doc_id || '/page.html?y=8&z=9'
         WHEN 2 THEN 'https://docs.example.com/d/' || doc_id
         ELSE 'https://other.example.net/'
       END AS norm_url
FROM documents
"""


def q_semdedup(spark: SparkSession, sf: str) -> DataFrame:
    """Semantic dedup (operators/semdedup.py — Abbas et al. 2023):
    k-means-cell-bounded cosine pairs resolved into duplicate groups.
    Rows-only by nature (iterative k-means has no SQL mirror);
    brute-force-equivalence/recall/invariance gates in
    tests/test_semdedup.py."""
    from ..operators.semdedup import semdedup

    emb = load(spark, sf, "embeddings").select("vec_id", "embedding")
    return semdedup(clustered_embeddings(emb), nlist=8, threshold=0.9)


def q_page_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Head-metadata extraction (operators/links.page_meta — pure
    codegen): title text, robots noindex/nofollow flags (both
    attribute orders planted), resolved rel=canonical target (both
    attribute orders planted). Oracle = an independent arithmetic
    reconstruction from documents columns."""
    from ..operators.links import page_meta

    pages = _synth_pages(load(spark, sf, "documents"))
    return page_meta(pages).select(
        F.regexp_extract(F.col("url"), "/d/([0-9]+)/", 1)
        .cast("bigint")
        .alias("doc_id"),
        "title",
        "noindex",
        "nofollow",
        "canonical",
    )


ORACLE["page_meta"] = """
SELECT doc_id,
       'Doc ' || doc_id || ' ' || regexp_extract(lower(text), '[a-z0-9]+', 0)
         AS title,
       doc_id % 13 = 0 AS noindex,
       CAST(FALSE AS BOOLEAN) AS nofollow,
       CASE WHEN doc_id % 5 != 0
            THEN 'https://docs.example.com/c/' || (doc_id // 10)
            ELSE NULL END AS canonical
FROM documents
"""


def q_canonical_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Canonical-URL dedup (operators/links.canonical_dedup): noindex
    pages dropped, variants grouped by declared canonical target
    (own url when none), min url kept per group."""
    from ..operators.links import canonical_dedup

    pages = _synth_pages(load(spark, sf, "documents"))
    return canonical_dedup(pages).select(
        "canonical_url", "keep_url", F.col("n_variants").cast("long").alias("n_variants")
    )


ORACLE["canonical_dedup"] = """
WITH m AS (
  SELECT doc_id,
         'https://docs.example.com/d/' || doc_id || '/page.html' AS url,
         CASE WHEN doc_id % 5 != 0
              THEN 'https://docs.example.com/c/' || (doc_id // 10)
              ELSE 'https://docs.example.com/d/' || doc_id || '/page.html'
              END AS canonical_url
  FROM documents
  WHERE doc_id % 13 != 0)
SELECT canonical_url, min(url) AS keep_url,
       CAST(count(*) AS BIGINT) AS n_variants
FROM m GROUP BY canonical_url
"""


# -------------------------------------- quality: stupid-backoff LM
def q_lm_score(spark: SparkSession, sf: str) -> DataFrame:
    """Stupid Backoff bigram-LM perplexity proxy (operators/lm.py —
    Brants et al. 2007): the LM trains on the doc_id % 3 != 0 split and
    scores EVERY doc, so held-out docs exercise all three backoff
    tiers (seen bigram / seen unigram / OOV floor) while train-split
    docs exercise the main path. Single corpus scan, hot heads
    broadcast, salted cold joins (see the module docstring)."""
    from ..operators.lm import stupid_backoff_score

    docs = load(spark, sf, "documents")
    return stupid_backoff_score(docs, docs.filter(F.col("doc_id") % 3 != 0))


ORACLE["lm_score"] = f"""
WITH t AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
bg AS (
  SELECT doc_id,
         unnest(ws[1:len(ws)-1]) AS w1,
         unnest(ws[2:len(ws)]) AS w2
  FROM t WHERE len(ws) >= 2),
uni AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(ws) AS w FROM t WHERE doc_id % 3 != 0) GROUP BY w),
tot AS (SELECT sum(c)::DOUBLE AS n FROM uni),
big AS (
  SELECT w1, w2, count(*) AS c12 FROM bg WHERE doc_id % 3 != 0 GROUP BY 1, 2),
biglm AS (
  SELECT w1, w2, CAST(round(log10(c12 / c) * 1e6) AS BIGINT) AS log_s
  FROM big JOIN uni ON uni.w = big.w1),
tf AS (SELECT doc_id, w1, w2, count(*) AS k FROM bg GROUP BY 1, 2, 3),
scored AS (
  SELECT doc_id, k,
         coalesce(b.log_s,
                  CAST(round(log10(0.4::DOUBLE * u.c / n) * 1e6) AS BIGINT),
                  CAST(round(log10(0.4::DOUBLE / n) * 1e6) AS BIGINT)) AS s_micro
  FROM tf
  LEFT JOIN biglm b USING (w1, w2)
  LEFT JOIN uni u ON u.w = tf.w2, tot),
agg AS (
  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_bigrams,
         CAST(sum(k * s_micro) AS BIGINT) AS sum_micro
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_bigrams,
       round((sum_micro / 1000000.0) / n_bigrams, 6) AS avg_logscore
FROM agg
"""


def q_lm_score_trigram(spark: SparkSession, sf: str) -> DataFrame:
    """Stupid Backoff at the paper's deeper order (operators/lm.py,
    order=3): four resolution tiers — seen trigram, alpha-discounted
    bigram, alpha^2 unigram, OOV floor — all exercised by training on
    the doc_id % 3 != 0 split and scoring every doc."""
    from ..operators.lm import stupid_backoff_score

    docs = load(spark, sf, "documents")
    return stupid_backoff_score(
        docs, docs.filter(F.col("doc_id") % 3 != 0), order=3
    )


ORACLE["lm_score_trigram"] = f"""
WITH t AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
tg AS (
  SELECT doc_id,
         unnest(ws[1:len(ws)-2]) AS w1,
         unnest(ws[2:len(ws)-1]) AS w2,
         unnest(ws[3:len(ws)]) AS w3
  FROM t WHERE len(ws) >= 3),
bg AS (
  SELECT doc_id,
         unnest(ws[1:len(ws)-1]) AS w1,
         unnest(ws[2:len(ws)]) AS w2
  FROM t WHERE len(ws) >= 2),
uni AS (
  SELECT w, count(*) AS c FROM (
    SELECT unnest(ws) AS w FROM t WHERE doc_id % 3 != 0) GROUP BY w),
tot AS (SELECT sum(c)::DOUBLE AS n FROM uni),
big AS (
  SELECT w1, w2, count(*) AS c FROM bg WHERE doc_id % 3 != 0 GROUP BY 1, 2),
tri AS (
  SELECT w1, w2, w3, count(*) AS c FROM tg WHERE doc_id % 3 != 0
  GROUP BY 1, 2, 3),
m3 AS (
  SELECT tri.w1, tri.w2, tri.w3,
         CAST(round(log10(1.0::DOUBLE * tri.c / big.c) * 1e6) AS BIGINT) AS v
  FROM tri JOIN big USING (w1, w2)),
m2 AS (
  SELECT big.w1 AS b1, big.w2 AS b2,
         CAST(round(log10(0.4::DOUBLE * big.c / uni.c) * 1e6) AS BIGINT) AS v
  FROM big JOIN uni ON uni.w = big.w1),
m1 AS (
  SELECT w AS u1,
         CAST(round(log10(0.4::DOUBLE * 0.4::DOUBLE * c / n) * 1e6) AS BIGINT) AS v
  FROM uni, tot),
tf AS (
  SELECT doc_id, w1, w2, w3, count(*) AS k FROM tg GROUP BY 1, 2, 3, 4),
scored AS (
  SELECT doc_id, k,
         coalesce(m3.v, m2.v, m1.v,
                  CAST(round(log10(0.4::DOUBLE * 0.4::DOUBLE / n) * 1e6)
                       AS BIGINT)) AS s_micro
  FROM tf
  LEFT JOIN m3 USING (w1, w2, w3)
  LEFT JOIN m2 ON m2.b1 = tf.w2 AND m2.b2 = tf.w3
  LEFT JOIN m1 ON m1.u1 = tf.w3, tot),
agg AS (
  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_trigrams,
         CAST(sum(k * s_micro) AS BIGINT) AS sum_micro
  FROM scored GROUP BY doc_id)
SELECT doc_id, n_trigrams,
       round((sum_micro / 1000000.0) / n_trigrams, 6) AS avg_logscore
FROM agg
"""


# ---------------------------------- selection: DSIR (Xie et al. 2023)
def q_dsir_select(spark: SparkSession, sf: str) -> DataFrame:
    """Importance resampling for data selection (operators/dsir.py):
    hashed unigram+bigram bucket models (B=10,000 — forever
    broadcast-sized), Laplace-smoothed log-ratio weights in integer
    millionths, deterministic Gumbel top-k (k=120) via a
    TakeOrdered threshold instead of a global window. Target = the
    doc_id % 7 == 0 slice; raw = the whole corpus."""
    from ..operators.dsir import dsir_resample, dsir_weights

    docs = load(spark, sf, "documents")
    weights = dsir_weights(docs, docs.filter(F.col("doc_id") % 7 == 0))
    return dsir_resample(weights, k=120)


ORACLE["dsir_select"] = f"""
WITH t AS (SELECT doc_id, {_WORDS_SQL} AS ws FROM documents),
unif AS (SELECT doc_id, unnest(ws) AS f FROM t),
bif AS (
  SELECT doc_id, w1 || ' ' || w2 AS f FROM (
    SELECT doc_id, unnest(ws[1:len(ws)-1]) AS w1, unnest(ws[2:len(ws)]) AS w2
    FROM t WHERE len(ws) >= 2)),
feats AS (SELECT doc_id, f FROM unif UNION ALL SELECT doc_id, f FROM bif),
fb AS (
  SELECT doc_id,
         list_sum(list_transform(range(1, 9), j ->
           CAST(strpos('0123456789abcdef', substr(md5(f), j, 1)) - 1 AS BIGINT)
           * (CAST(1 AS BIGINT) << (4 * (8 - j))))) % 10000 AS bucket
  FROM feats),
dc AS (SELECT doc_id, bucket, count(*) AS k FROM fb GROUP BY 1, 2),
tm AS (SELECT bucket, sum(k) AS c FROM dc WHERE doc_id % 7 = 0 GROUP BY bucket),
rm AS (SELECT bucket, sum(k) AS c FROM dc GROUP BY bucket),
tot AS (SELECT (SELECT COALESCE(sum(c), 0) FROM tm)::DOUBLE + 10000 AS dt,
               (SELECT COALESCE(sum(c), 0) FROM rm)::DOUBLE + 10000 AS dr),
delta AS (
  SELECT rm.bucket,
         CAST(round((log10((COALESCE(tm.c, 0) + 1) / dt)
                   - log10((rm.c + 1) / dr)) * 1e6) AS BIGINT) AS d
  FROM rm LEFT JOIN tm USING (bucket), tot),
w AS (
  SELECT doc_id, CAST(sum(k) AS BIGINT) AS n_feats,
         CAST(sum(k * d) AS BIGINT) AS logw_micro
  FROM dc JOIN delta USING (bucket) GROUP BY doc_id),
gu AS (
  -- Gumbel noise scaled by log10(e): the weights are log10 ratios,
  -- so the noise must live on the same log base (see dsir.py)
  SELECT doc_id,
         CAST(round(-ln(-ln(
           (list_sum(list_transform(range(1, 9), j ->
              CAST(strpos('0123456789abcdef',
                   substr(md5(CAST(doc_id AS VARCHAR) || ':dsir'), j, 1)) - 1
                   AS BIGINT)
              * (CAST(1 AS BIGINT) << (4 * (8 - j))))) + 0.5) / 4294967296.0
         )) * 0.4342944819032518 * 1e6) AS BIGINT) AS g
  FROM t),
s AS (
  SELECT doc_id, n_feats, logw_micro, logw_micro + g AS score_micro
  FROM w JOIN gu USING (doc_id)),
r AS (
  SELECT *, row_number() OVER (ORDER BY score_micro DESC, doc_id) AS rk FROM s)
SELECT doc_id, n_feats, logw_micro, score_micro, rk <= 120 AS keep FROM r
"""


# ------------------------------------------------------- C4 page cleaning
def q_c4_filters(spark: SparkSession, sf: str) -> DataFrame:
    """C4 cleaning heuristics (Raffel et al. 2020 §2.2) over
    deterministically line-augmented documents (the synthetic corpus
    has no line structure or punctuation, so — like q_redact_pii's PII
    planting — the query synthesizes lines from doc_id residues:
    a too-short line, an unterminated line, a javascript line on %5,
    a code brace on %17, lorem ipsum on %19, a blocklist word on %29,
    an extra sentence on %23). clean_md5 pins the kept bytes."""
    from ..operators.filters import c4_clean

    docs = spread_scan(load(spark, sf, "documents"), key="doc_id")
    aug = F.concat_ws(
        "\n",
        F.concat(F.col("text"), F.lit(" ends with a period.")),
        F.lit("too short."),
        F.lit("this long line has no terminal punctuation so it is dropped"),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("please enable javascript to view the content on this page."),
        ),
        F.when(
            F.col("doc_id") % 17 == 0,
            F.lit("this page contains a curly brace { right in the body."),
        ),
        F.when(
            F.col("doc_id") % 19 == 0,
            F.lit("classic filler lorem ipsum dolor sit amet appears here."),
        ),
        F.when(
            F.col("doc_id") % 29 == 0,
            F.lit("we removed the bad word porn from this line entirely."),
        ),
        F.lit("a second proper sentence with enough words to survive the line filter."),
        F.lit("a third good sentence keeps this document above the sentence minimum."),
        F.when(
            F.col("doc_id") % 23 == 0,
            F.lit("an extra fourth sentence rides along for residue twenty three."),
        ),
    )
    cleaned = c4_clean(docs.select("doc_id", aug.alias("text")))
    return cleaned.select(
        "doc_id",
        "n_lines",
        "n_kept_lines",
        "n_sentences",
        "c4_keep",
        F.md5("text").alias("clean_md5"),
    )


ORACLE["c4_filters"] = r"""
WITH a AS (
  SELECT doc_id, concat_ws(chr(10),
    text || ' ends with a period.',
    'too short.',
    'this long line has no terminal punctuation so it is dropped',
    CASE WHEN doc_id % 5 = 0 THEN 'please enable javascript to view the content on this page.' END,
    CASE WHEN doc_id % 17 = 0 THEN 'this page contains a curly brace { right in the body.' END,
    CASE WHEN doc_id % 19 = 0 THEN 'classic filler lorem ipsum dolor sit amet appears here.' END,
    CASE WHEN doc_id % 29 = 0 THEN 'we removed the bad word porn from this line entirely.' END,
    'a second proper sentence with enough words to survive the line filter.',
    'a third good sentence keeps this document above the sentence minimum.',
    CASE WHEN doc_id % 23 = 0 THEN 'an extra fourth sentence rides along for residue twenty three.' END
  ) AS aug FROM documents
), k AS (
  SELECT doc_id, aug,
         list_filter(list_transform(string_split(aug, chr(10)), l -> trim(l)),
                     lt -> regexp_matches(lt, '[.!?"]$')
                           AND len(string_split_regex(lt, '\s+')) >= 5
                           AND NOT regexp_matches(lower(lt), '\bjavascript\b')) AS kept
  FROM a
), c AS (
  SELECT doc_id, aug, kept,
         coalesce(array_to_string(kept, chr(10)), '') AS clean FROM k
)
SELECT doc_id,
       CAST(len(string_split(aug, chr(10))) AS INTEGER) AS n_lines,
       CAST(len(kept) AS INTEGER) AS n_kept_lines,
       CAST(len(string_split_regex(clean, '[.!?"]')) - 1 AS INTEGER) AS n_sentences,
       (NOT contains(aug, '{') AND NOT contains(lower(aug), 'lorem ipsum')
        AND NOT regexp_matches(lower(aug), '\b(porn|xxx)\b')
        AND len(string_split_regex(clean, '[.!?"]')) - 1 >= 3) AS c4_keep,
       md5(clean) AS clean_md5
FROM c
"""


# --------------------------------------------- substring dedup: REMOVAL
def q_remove_dup_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Lee-et-al ExactSubstr REMOVAL at a 10-token window (the
    flag-only sibling is q_duplicate_spans): every word position
    covered by a corpus-duplicated 10-token span is cut and the doc
    rebuilt from the survivors. clean_md5 pins the shipped bytes;
    exact duplicate docs collapse to n_removed_words == n_words."""
    from ..operators.filters import remove_duplicate_spans

    out = remove_duplicate_spans(spread_scan(load(spark, sf, "documents"), key="doc_id"), n=10)
    return out.select(
        "doc_id",
        "n_words",
        "n_removed_words",
        F.md5("clean_text").alias("clean_md5"),
    )


ORACLE["remove_dup_spans"] = f"""
WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
g AS (SELECT doc_id, i, array_to_string(words[i:i+9], ' ') AS span
      FROM w, UNNEST(generate_series(1, len(words)-9)) AS t(i)),
c AS (SELECT span, count(*) AS cnt FROM g GROUP BY span),
d AS (SELECT doc_id, list(i) AS starts FROM g JOIN c USING (span)
      WHERE cnt > 1 GROUP BY doc_id),
r AS (SELECT doc_id, words, coalesce(starts, CAST([] AS BIGINT[])) AS starts
      FROM w LEFT JOIN d USING (doc_id)),
x AS (SELECT doc_id, words,
             list_distinct(flatten(list_transform(starts,
                 s -> generate_series(s, s+9)))) AS covered
      FROM r),
f AS (SELECT doc_id, words,
             list_filter(generate_series(1, len(words)),
                         p -> NOT list_contains(covered, p)) AS keep
      FROM x)
SELECT doc_id,
       CAST(len(words) AS INTEGER) AS n_words,
       CAST(len(words) - len(keep) AS INTEGER) AS n_removed_words,
       md5(coalesce(array_to_string(list_transform(keep, p -> words[p]), ' '),
                    '')) AS clean_md5
FROM f
"""


# ------------------------------------------------------- URL blocklisting
def q_url_filter(spark: SparkSession, sf: str) -> DataFrame:
    """RefinedWeb-style URL filtering over deterministically
    synthesized urls (documents carry no url column, so the query
    builds one per doc from (source, doc_id) residues — scheme, www
    prefix, upper-cased host, tld, and an /ads/ path segment all
    planted to exercise canonicalization): a 3-host blocklist
    (broadcast anti-join on the canonical host) + one path-pattern
    drop (pure scan predicate)."""
    from ..operators.hoststats import filter_blocked

    docs = load(spark, sf, "documents")
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://")).otherwise(
            F.lit("http://")
        ),
        F.when(F.col("doc_id") % 5 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 11 == 0, F.upper("source")).otherwise(
            F.col("source")
        ),
        F.lit(".example."),
        tld,
        F.lit("/p/"),
        F.col("doc_id"),
        F.when(F.col("doc_id") % 13 == 0, F.lit("/ads/track")).otherwise(
            F.lit("")
        ),
    )
    pages = docs.select("doc_id", url.alias("url"))
    return filter_blocked(
        pages,
        blocked_hosts=[
            "src1.example.com",
            "WWW.src2.example.org",  # canonicalized before matching
            "SRC3.example.net",
        ],
        url_patterns=[r"/ads/"],
    ).select("doc_id", "url")


ORACLE["url_filter"] = r"""
WITH p AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
    || (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
    || (CASE WHEN doc_id % 11 = 0 THEN upper(source) ELSE source END)
    || '.example.'
    || (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END)
    || '/p/' || doc_id
    || (CASE WHEN doc_id % 13 = 0 THEN '/ads/track' ELSE '' END) AS url
  FROM documents
), c AS (
  SELECT doc_id, url,
         regexp_replace(regexp_extract(lower(trim(url)),
             '^(?:[a-z][a-z0-9+.-]*://|//)?(?:[^@/?#]*@)?(\[[^\]]*\]|[^:/?#]+)', 1),
             '^www\.', '') AS chost
  FROM p
)
SELECT doc_id, url FROM c
WHERE NOT regexp_matches(lower(url), '(/ads/)')
  AND chost NOT IN ('src1.example.com', 'src2.example.org', 'src3.example.net')
"""


# ----------------------------------------------- training-shard shuffle
def q_shard_assign(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global training-order shuffle into 8 shards
    (operators/packing.shard_assign): (shard_id, shard_pos) from the
    md5-uniform, so reading shards in order replays a reproducible
    random permutation of the corpus. Oracle = the same md5 math plus
    a SQL window."""
    from ..operators.packing import shard_assign

    docs = load(spark, sf, "documents").select("doc_id", "source")
    return shard_assign(docs, 8)


ORACLE["shard_assign"] = """
WITH u AS (
  SELECT doc_id, source,
         (list_sum(list_transform(range(1, 9), j ->
            CAST(strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR) || ':shard'), j, 1)) - 1 AS BIGINT)
            * (CAST(1 AS BIGINT) << (4 * (8 - j)))))
          / 4294967296.0) AS uu
  FROM documents
)
SELECT doc_id, source,
       CAST(least(CAST(floor(uu * 8) AS BIGINT), 7) AS INTEGER) AS shard_id,
       CAST(row_number() OVER (
              PARTITION BY least(CAST(floor(uu * 8) AS BIGINT), 7)
              ORDER BY uu, doc_id) - 1 AS INTEGER) AS shard_pos
FROM u
"""


# ------------------------------------------- blocklist mining / sampling
def q_host_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Blocklist MINING (operators/hoststats.host_quality_stats):
    per-canonical-host mergeable integer quality stats over
    residue-synthesized urls (~60 hosts x ~8 docs), plus the
    block_candidate rule (majority-low hosts with >= 5 docs) that
    feeds filter_blocked — the curation loop closed from the crawl's
    own quality signal."""
    from ..operators import textstats
    from ..operators.hoststats import host_quality_stats

    docs = load(spark, sf, "documents")
    tld = F.element_at(
        F.array(F.lit("com"), F.lit("org"), F.lit("net")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    url = F.concat(
        F.lit("https://"),
        F.when(F.col("doc_id") % 5 == 0, F.lit("www.")).otherwise(F.lit("")),
        F.col("source"),
        F.lit(".example."),
        tld,
        F.lit("/p/"),
        F.col("doc_id"),
    )
    scored = docs.select(
        url.alias("url"), *textstats.quality_bound_cols(F.col("text"))
    ).select("url", textstats.quality_score_col().alias("quality"))
    stats = host_quality_stats(scored, low_threshold=0.5)
    return stats.select(
        "host",
        "n_docs",
        "sum_quality_micro",
        "n_low",
        (
            (F.col("n_low") / F.col("n_docs") > 0.5) & (F.col("n_docs") >= 5)
        ).alias("block_candidate"),
    )


ORACLE["host_quality"] = f"""
WITH w AS (
  SELECT doc_id, source, text,
         list_filter(string_split_regex(lower(text), '[^a-z0-9'']+'), t -> t != '') AS words
  FROM documents),
f AS (
  SELECT doc_id, source,
         length(text) AS n_chars,
         len(words) AS n_words,
         len(list_filter(words, x -> list_contains({_STOPLIST_SQL}, x))) AS n_stop,
         length(regexp_replace(text, '[^\\.,;:!\\?''"-]', '', 'g')) AS n_punct
  FROM w),
q AS (
  SELECT doc_id, source,
         round((least(n_words / 100.0, 1.0)
              + least((CASE WHEN n_words > 0 THEN n_stop / n_words ELSE 0.0 END) * 5.0, 1.0)
              + (1.0 - least((CASE WHEN n_chars > 0 THEN n_punct / n_chars ELSE 0.0 END) * 5.0, 1.0)))
              / 3.0, 4) AS quality
  FROM f),
u AS (
  SELECT 'https://'
         || (CASE WHEN doc_id % 5 = 0 THEN 'www.' ELSE '' END)
         || source || '.example.'
         || (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org' ELSE 'net' END)
         || '/p/' || doc_id AS url,
         quality
  FROM q),
h AS (
  SELECT regexp_replace(regexp_extract(lower(trim(url)),
             '^(?:[a-z][a-z0-9+.-]*://|//)?(?:[^@/?#]*@)?(\\[[^\\]]*\\]|[^:/?#]+)', 1),
             '^www\\.', '') AS host,
         quality
  FROM u),
s AS (
  SELECT host,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(CAST(round(quality * 1e6) AS BIGINT)) AS BIGINT) AS sum_quality_micro,
         CAST(sum(CASE WHEN quality < 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS n_low
  FROM h GROUP BY host)
SELECT host, n_docs, sum_quality_micro, n_low,
       (n_low / n_docs > 0.5 AND n_docs >= 5) AS block_candidate
FROM s
"""


def q_decontaminate_report(spark: SparkSession, sf: str) -> DataFrame:
    """Contamination forensics (operators/filters.decontaminate_report):
    the per-(train doc, eval item) audit table behind q_decontaminate's
    flags — same 97-residue eval split, distinct shared 5-grams per
    pair."""
    from ..operators.filters import decontaminate_report

    docs = load(spark, sf, "documents")
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate_report(train, eval_df, n=5)


ORACLE["decontaminate_report"] = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(text), '[^a-z0-9]+'),
                     x -> x <> '') AS words
  FROM documents
), g AS (
  SELECT doc_id, array_to_string(words[i:i+4], ' ') AS gram
  FROM w, UNNEST(generate_series(1, len(words)-4)) AS t(i)
), eval_g AS (
  SELECT DISTINCT doc_id AS eval_id, gram FROM g WHERE doc_id % 97 = 0
), train_g AS (
  SELECT DISTINCT doc_id, gram FROM g WHERE doc_id % 97 <> 0
)
SELECT doc_id, eval_id, CAST(count(*) AS BIGINT) AS n_shared
FROM train_g JOIN eval_g USING (gram)
GROUP BY doc_id, eval_id
"""


def q_gopher_quality(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher §A1.1 document-level quality rules
    (operators/filters.gopher_quality_flags) over lightly augmented
    documents (hash runs on %7, bullet lines on %19, a trailing
    ellipsis on %23 — the raw corpus has no symbols or lines, so the
    residues give every rule non-degenerate values); keep varies via
    the 50-word floor."""
    from ..operators.filters import gopher_quality_flags

    docs = load(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.lit(" "), F.repeat(F.lit("# "), 10))
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 19 == 0,
            F.lit("\n- bullet line one\n- bullet line two"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 23 == 0, F.lit("\ntrailing thought...")
        ).otherwise(F.lit("")),
    )
    return gopher_quality_flags(docs.select("doc_id", aug.alias("text")))


ORACLE["gopher_quality"] = r"""
WITH a AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0 THEN ' ' || repeat('# ', 10) ELSE '' END
         || CASE WHEN doc_id % 19 = 0
                 THEN chr(10) || '- bullet line one' || chr(10) || '- bullet line two'
                 ELSE '' END
         || CASE WHEN doc_id % 23 = 0
                 THEN chr(10) || 'trailing thought...' ELSE '' END AS t
  FROM documents
), p AS (
  SELECT doc_id, t,
         list_filter(string_split_regex(t, '\s+'), w -> w <> '') AS ws,
         list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)),
                     lt -> lt <> '') AS lines,
         list_filter(string_split_regex(lower(t), '[^a-z0-9]+'), x -> x <> '') AS lw
  FROM a
), m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         len(lines) AS n_lines,
         (length(t) - length(replace(t, '...', ''))) / 3
           + (length(t) - length(replace(t, '…', ''))) AS n_ellipsis,
         length(t) - length(replace(t, '#', '')) AS n_hash,
         list_sum(list_transform(ws, w -> length(w))) AS sum_wl,
         len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) AS n_alpha,
         len(list_filter(lines, lt -> regexp_matches(lt, '^[-*•]'))) AS n_bullet,
         len(list_filter(lines, lt -> regexp_matches(lt, '(\.\.\.|…)$'))) AS n_ell_l,
         len(list_intersect(list_distinct(lw),
             ['the','be','to','of','and','that','have','with'])) AS n_stop
  FROM p
), f AS (
  SELECT doc_id,
         CAST(n_words AS INTEGER) AS n_words,
         round(CASE WHEN n_words > 0 THEN sum_wl / n_words ELSE 0.0 END, 4) AS mean_word_len,
         round(CASE WHEN n_words > 0 THEN (n_hash + n_ellipsis) / n_words ELSE 0.0 END, 4) AS symbol_ratio,
         round(CASE WHEN n_lines > 0 THEN n_bullet::DOUBLE / n_lines ELSE 0.0 END, 4) AS bullet_line_frac,
         round(CASE WHEN n_lines > 0 THEN n_ell_l::DOUBLE / n_lines ELSE 0.0 END, 4) AS ellipsis_line_frac,
         round(CASE WHEN n_words > 0 THEN n_alpha::DOUBLE / n_words ELSE 0.0 END, 4) AS alpha_word_frac,
         CAST(n_stop AS INTEGER) AS n_required_stopwords
  FROM m
)
SELECT *,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3 AND mean_word_len <= 10
        AND symbol_ratio < 0.1
        AND bullet_line_frac < 0.9
        AND ellipsis_line_frac <= 0.3
        AND alpha_word_frac >= 0.8
        AND n_required_stopwords >= 2) AS gopher_keep
FROM f
"""


def q_gopher_repetition(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher §A1.2 repetition-removal rules (operators/filters
    .gopher_repetition_flags) over augmented documents: duplicated
    lines on %11, a duplicated paragraph on %13, an n-gram spam run on
    %17 (the raw word-salad corpus repeats almost nothing, so the
    residues make each rule family fire); everything else measures the
    corpus's organic gram repetition."""
    from ..operators.filters import gopher_repetition_flags

    docs = load(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.lit("\nrepeated boilerplate line\nrepeated boilerplate line"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.lit("\n\nshared footer paragraph\n\nshared footer paragraph"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 17 == 0,
            F.concat(F.lit(" "), F.repeat(F.lit("buy cheap meds now "), 12)),
        ).otherwise(F.lit("")),
    )
    return gopher_repetition_flags(docs.select("doc_id", aug.alias("text")))


ORACLE["gopher_repetition"] = r"""
WITH d AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 11 = 0
                 THEN chr(10) || 'repeated boilerplate line'
                   || chr(10) || 'repeated boilerplate line' ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN chr(10) || chr(10) || 'shared footer paragraph'
                   || chr(10) || chr(10) || 'shared footer paragraph' ELSE '' END
         || CASE WHEN doc_id % 17 = 0
                 THEN ' ' || repeat('buy cheap meds now ', 12) ELSE '' END AS t
  FROM documents
), w AS (
  SELECT doc_id,
         list_filter(string_split_regex(lower(t), '[^a-z0-9]+'),
                     x -> x <> '') AS words
  FROM d
), allu AS (
  SELECT doc_id, 'line' AS u, tt.g AS g
  FROM d, UNNEST(list_filter(list_transform(string_split(t, chr(10)),
                 x -> trim(x)), x -> x <> '')) AS tt(g)
  UNION ALL
  SELECT doc_id, 'para' AS u, tt.g AS g
  FROM d, UNNEST(list_filter(list_transform(string_split(t, chr(10)||chr(10)),
                 x -> trim(x)), x -> x <> '')) AS tt(g)
  UNION ALL
  SELECT doc_id, printf('g%02d', n) AS u,
         array_to_string(words[i:i+n-1], ' ') AS g
  FROM w, UNNEST(generate_series(2, 10)) AS tn(n),
       UNNEST(generate_series(1, len(words)-n+1)) AS ti(i)
), c AS (
  SELECT doc_id, u, g, count(*) AS c, length(g) AS glen
  FROM allu GROUP BY doc_id, u, g
), s AS (
  SELECT doc_id, u,
         sum(c) AS n_units, sum(c-1) AS n_dup,
         sum((c-1)*glen) AS dup_chars_extra,
         sum(CASE WHEN c > 1 THEN c*glen END) AS dup_chars_all,
         max(c*glen) AS top_chars
  FROM c GROUP BY doc_id, u
), p AS (
  SELECT doc_id,
         max(CASE WHEN u='line' THEN n_dup::DOUBLE/n_units END) AS dlf,
         max(CASE WHEN u='para' THEN n_dup::DOUBLE/n_units END) AS dpf,
         max(CASE WHEN u='line' THEN dup_chars_extra END) AS dlc,
         max(CASE WHEN u='para' THEN dup_chars_extra END) AS dpc,
         max(CASE WHEN u='g02' THEN top_chars END) AS t2,
         max(CASE WHEN u='g03' THEN top_chars END) AS t3,
         max(CASE WHEN u='g04' THEN top_chars END) AS t4,
         max(CASE WHEN u='g05' THEN dup_chars_all END) AS d5,
         max(CASE WHEN u='g06' THEN dup_chars_all END) AS d6,
         max(CASE WHEN u='g07' THEN dup_chars_all END) AS d7,
         max(CASE WHEN u='g08' THEN dup_chars_all END) AS d8,
         max(CASE WHEN u='g09' THEN dup_chars_all END) AS d9,
         max(CASE WHEN u='g10' THEN dup_chars_all END) AS d10
  FROM s GROUP BY doc_id
), f AS (
  SELECT d.doc_id,
         round(coalesce(dlf, 0), 4) AS dup_line_frac,
         round(coalesce(dpf, 0), 4) AS dup_para_frac,
         round(coalesce(dlc::DOUBLE / nullif(length(t), 0), 0), 4) AS dup_line_char_frac,
         round(coalesce(dpc::DOUBLE / nullif(length(t), 0), 0), 4) AS dup_para_char_frac,
         round(coalesce(t2::DOUBLE / nullif(length(t), 0), 0), 4) AS top2_char_frac,
         round(coalesce(t3::DOUBLE / nullif(length(t), 0), 0), 4) AS top3_char_frac,
         round(coalesce(t4::DOUBLE / nullif(length(t), 0), 0), 4) AS top4_char_frac,
         round(coalesce(d5::DOUBLE / nullif(length(t), 0), 0), 4) AS dup5_char_frac,
         round(coalesce(d6::DOUBLE / nullif(length(t), 0), 0), 4) AS dup6_char_frac,
         round(coalesce(d7::DOUBLE / nullif(length(t), 0), 0), 4) AS dup7_char_frac,
         round(coalesce(d8::DOUBLE / nullif(length(t), 0), 0), 4) AS dup8_char_frac,
         round(coalesce(d9::DOUBLE / nullif(length(t), 0), 0), 4) AS dup9_char_frac,
         round(coalesce(d10::DOUBLE / nullif(length(t), 0), 0), 4) AS dup10_char_frac
  FROM d LEFT JOIN p USING (doc_id)
)
SELECT *,
       (dup_line_frac <= 0.30 AND dup_para_frac <= 0.30
        AND dup_line_char_frac <= 0.20 AND dup_para_char_frac <= 0.20
        AND top2_char_frac <= 0.20 AND top3_char_frac <= 0.18
        AND top4_char_frac <= 0.16
        AND dup5_char_frac <= 0.15 AND dup6_char_frac <= 0.14
        AND dup7_char_frac <= 0.13 AND dup8_char_frac <= 0.12
        AND dup9_char_frac <= 0.11 AND dup10_char_frac <= 0.10) AS rep_keep
FROM f
"""


def q_line_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Intra-document exact line dedup (operators/filters
    .dedup_lines_within_doc) over residue-augmented documents — the
    word-salad corpus is single-line, so the query plants a repeated
    boilerplate line on %7 (twice) and a footer pair on %5 (one
    repeat of the %7 line + a fresh cookie line) with a structural
    blank line that must SURVIVE; %35 docs therefore remove two
    copies. Emits md5(text) so the oracle checks the rebuilt page
    byte-identically (the q_redact_pii idiom)."""
    from ..operators.filters import dedup_lines_within_doc

    docs = spread_scan(load(spark, sf, "documents"), key="doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.lit("\nsubscribe to our newsletter\nsubscribe to our newsletter"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.lit("\n\nsubscribe to our newsletter\nthis site uses cookies"),
        ).otherwise(F.lit("")),
    )
    out = dedup_lines_within_doc(docs.select("doc_id", aug.alias("text")))
    return out.select(
        "doc_id", "n_lines", "n_removed", F.md5("text").alias("clean_md5")
    )


ORACLE["line_dedup"] = """
WITH d AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN chr(10) || 'subscribe to our newsletter'
                   || chr(10) || 'subscribe to our newsletter' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN chr(10) || chr(10) || 'subscribe to our newsletter'
                   || chr(10) || 'this site uses cookies' ELSE '' END AS t
  FROM documents
), l AS (
  SELECT doc_id, string_split(t, chr(10)) AS lines FROM d
)
SELECT doc_id,
       CAST(len(lines) AS INTEGER) AS n_lines,
       CAST(len(lines) - len(list_filter(lines,
            (x, i) -> trim(x) = '' OR list_position(lines, x) = i))
            AS INTEGER) AS n_removed,
       md5(coalesce(array_to_string(list_filter(lines,
            (x, i) -> trim(x) = '' OR list_position(lines, x) = i),
            chr(10)), '')) AS clean_md5
FROM l
"""


def q_ccnet_buckets(spark: SparkSession, sf: str) -> DataFrame:
    """CCNet per-language perplexity terciles (operators/textstats
    .ccnet_buckets, exact percent_rank form) over the corpus's own
    unigram-LM typicality score — rank on the ROUNDED score with a
    doc_id tiebreak so both engines order identically. The
    production scan-side variant (ccnet_bucket_by_thresholds) carries
    an agreement gate in tests/test_ccnet.py instead."""
    from ..operators.textstats import ccnet_buckets

    docs = load(spark, sf, "documents")
    scored = textstats.unigram_logprob(docs).join(
        docs.select("doc_id", "lang"), "doc_id"
    )
    return ccnet_buckets(scored)


ORACLE["ccnet_buckets"] = f"""
WITH w AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents),
tf AS (
  SELECT doc_id, word, count(*) AS k FROM w GROUP BY 1, 2),
cnt AS (
  SELECT word, sum(k) AS c FROM tf GROUP BY word),
tot AS (
  SELECT sum(c)::DOUBLE AS n FROM cnt),
s AS (
  SELECT doc_id, round(sum(k * log10(c / n)) / sum(k), 6) AS score
  FROM tf JOIN cnt USING (word), tot GROUP BY doc_id),
sc AS (
  SELECT d.doc_id, d.lang, s.score FROM documents d JOIN s USING (doc_id)),
p AS (
  SELECT doc_id, lang, score,
         percent_rank() OVER (PARTITION BY lang
                              ORDER BY score DESC, doc_id) AS pr
  FROM sc)
SELECT doc_id, lang, score, round(pr, 6) AS pr,
       CASE WHEN pr < 1.0/3 THEN 'head'
            WHEN pr < 2.0/3 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM p
"""


def q_temperature_rates(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-scaled mixture plan (operators/mixing
    .temperature_rates): per-source shares ∝ n^(1/T) at T=2 with a
    1M-char token budget over the documents corpus (n_chars as the
    size measure — any per-row count column rides the same plan).
    Σ rate·n == budget by construction (pinned in tests/
    test_temperature_mix.py along with the T=1 proportional and
    T→∞ flattening laws)."""
    from ..operators.mixing import temperature_rates

    docs = load(spark, sf, "documents")
    return temperature_rates(docs, 1_000_000, 2.0, token_col="n_chars")


ORACLE["temperature_rates"] = """
WITH t AS (
  SELECT source AS key, CAST(sum(n_chars) AS BIGINT) AS n_tokens
  FROM documents GROUP BY source
), z AS (
  SELECT sum(pow(n_tokens, 0.5)) AS z FROM t
)
SELECT key, n_tokens,
       round(pow(n_tokens, 0.5) / z, 6) AS share,
       round(1000000.0 * pow(n_tokens, 0.5) / z / n_tokens, 6) AS rate,
       CAST(ceil(1000000.0 * pow(n_tokens, 0.5) / z / n_tokens) AS INTEGER)
         AS epochs
FROM t, z
"""


def q_script_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Unicode script identification (operators/textstats
    .script_counts) over multiscript-augmented documents — the word
    salad is pure Latin, so the query plants Cyrillic (%3), Han (%5)
    and Greek (%7) residue, and on %11 a Cyrillic run LONGER than the
    page (repeat('п', n_chars + 1)) so dominant_script actually flips
    away from latin. Pure codegen regex counting, zero shuffles."""
    from ..operators.textstats import script_counts

    docs = spread_scan(load(spark, sf, "documents"), key="doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" привет мир")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" 漢字文化圏")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 7 == 0, F.lit(" αβγδ")).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.repeat(F.lit("п"), (F.col("n_chars") + 1).cast("int")),
        ).otherwise(F.lit("")),
    )
    return script_counts(docs.select("doc_id", aug.alias("text"))).select(
        "doc_id", "n_latin", "n_cyrillic", "n_han", "n_greek",
        "dominant_script",
    )


ORACLE["script_stats"] = r"""
WITH d AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' привет мир' ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' 漢字文化圏' ELSE '' END
         || CASE WHEN doc_id % 7 = 0 THEN ' αβγδ' ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN repeat('п', CAST(n_chars + 1 AS INTEGER))
                 ELSE '' END AS t
  FROM documents
), c AS (
  SELECT doc_id,
    length(t) - length(regexp_replace(t, '\p{Latin}+', '', 'g')) AS n_latin,
    length(t) - length(regexp_replace(t, '\p{Cyrillic}+', '', 'g'))
      AS n_cyrillic,
    length(t) - length(regexp_replace(t, '\p{Han}+', '', 'g')) AS n_han,
    length(t) - length(regexp_replace(t, '\p{Greek}+', '', 'g')) AS n_greek,
    length(t) - length(regexp_replace(t, '\p{Arabic}+', '', 'g')) AS n_arabic,
    length(t) - length(regexp_replace(t, '\p{Hebrew}+', '', 'g')) AS n_hebrew,
    length(t) - length(regexp_replace(t, '\p{Devanagari}+', '', 'g'))
      AS n_devanagari,
    length(t) - length(regexp_replace(t, '\p{Hiragana}+', '', 'g'))
      AS n_hiragana,
    length(t) - length(regexp_replace(t, '\p{Katakana}+', '', 'g'))
      AS n_katakana,
    length(t) - length(regexp_replace(t, '\p{Hangul}+', '', 'g')) AS n_hangul
  FROM d
), m AS (
  SELECT *, greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew,
                     n_devanagari, n_han, n_hiragana, n_katakana, n_hangul)
            AS mx
  FROM c
)
SELECT doc_id,
       CAST(n_latin AS INTEGER) AS n_latin,
       CAST(n_cyrillic AS INTEGER) AS n_cyrillic,
       CAST(n_han AS INTEGER) AS n_han,
       CAST(n_greek AS INTEGER) AS n_greek,
       CASE WHEN mx = 0 THEN 'none'
            WHEN n_latin = mx THEN 'latin'
            WHEN n_cyrillic = mx THEN 'cyrillic'
            WHEN n_greek = mx THEN 'greek'
            WHEN n_arabic = mx THEN 'arabic'
            WHEN n_hebrew = mx THEN 'hebrew'
            WHEN n_devanagari = mx THEN 'devanagari'
            WHEN n_han = mx THEN 'han'
            WHEN n_hiragana = mx THEN 'hiragana'
            WHEN n_katakana = mx THEN 'katakana'
            ELSE 'hangul' END AS dominant_script
FROM m
"""


def q_corpus_diff(spark: SparkSession, sf: str) -> DataFrame:
    """Two-snapshot recrawl diff (operators/snapshot.corpus_diff):
    snapshot OLD = docs with doc_id%10 != 0, snapshot NEW = docs with
    doc_id%7 != 0 where %3 pages got a ' v2' edit — so every status
    (added/removed/changed/unchanged) occurs. The join carries only
    (url, xxhash64) pairs; the oracle compares text equality directly
    (identical modulo 2^-64 hash collisions)."""
    from ..operators.snapshot import corpus_diff

    docs = load(spark, sf, "documents")
    url = F.concat(F.lit("https://ex.com/"), F.col("doc_id"))
    old = docs.filter(F.col("doc_id") % 10 != 0).select(
        url.alias("url"), "text"
    )
    new = docs.filter(F.col("doc_id") % 7 != 0).select(
        url.alias("url"),
        F.when(
            F.col("doc_id") % 3 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return corpus_diff(old, new)


ORACLE["corpus_diff"] = """
WITH old AS (
  SELECT 'https://ex.com/' || doc_id AS url, text
  FROM documents WHERE doc_id % 10 <> 0
), new AS (
  SELECT 'https://ex.com/' || doc_id AS url,
         CASE WHEN doc_id % 3 = 0 THEN text || ' v2' ELSE text END AS text
  FROM documents WHERE doc_id % 7 <> 0
)
SELECT coalesce(old.url, new.url) AS url,
       CASE WHEN old.url IS NULL THEN 'added'
            WHEN new.url IS NULL THEN 'removed'
            WHEN old.text = new.text THEN 'unchanged'
            ELSE 'changed' END AS status
FROM old FULL OUTER JOIN new ON old.url = new.url
"""


def q_pack_bins(spark: SparkSession, sf: str) -> DataFrame:
    """No-split FFD bin packing (operators/packing.pack_bins_ffd) at
    capacity 512 over n_chars/4 length estimates — rows-only by
    nature (batched best-fit-decreasing is procedural, not SQL-
    expressible); validity/determinism/waste gates live in
    tests/test_ffd.py. num_groups pinned so the assignment is
    identical on any parallelism."""
    from ..operators.packing import pack_bins_ffd

    docs = load(spark, sf, "documents")
    return pack_bins_ffd(
        docs, (F.col("n_chars") / 4).cast("long"), 512, num_groups=4
    )


def q_iclm_pack(spark: SparkSession, sf: str) -> DataFrame:
    """In-context-pretraining packing (operators/iclm.iclm_pack):
    IVF-cell semantic ordering then the distributed prefix-sum pack —
    rows-only by nature (iterative k-means); coherence / exact
    pack-arithmetic / determinism gates in tests/test_iclm.py."""
    from ..operators.iclm import iclm_pack

    emb = load(spark, sf, "embeddings")
    return iclm_pack(
        emb,
        (100 + F.col("vec_id") % 400).cast("long"),
        2000,
        nlist=8,
        id_col="vec_id",
    )


def q_hashed_embedding(spark: SparkSession, sf: str) -> DataFrame:
    """Feature-hashed document vectors (operators/hashvec
    .hashed_tf_embedding) at dim=16 — the model-free text→embedding
    bridge, fully oracle-checkable because slot/sign come from the
    md5 cross-engine idiom. The oracle rebuilds the identical signed
    histogram with 16 conditional sums and normalizes with the same
    IEEE ops."""
    from ..operators.hashvec import hashed_tf_embedding

    # min_bytes: one explode+16-way agg is cheap per byte — below
    # ~2 MiB the spread exchange is pure overhead (0.25 unspread vs
    # 0.37 s spread at the 595 KB sf0.1 table, with 3 s GC-pressure
    # outliers — r06 A/B); at 10x the bytes spreading won 1.02→0.73 s.
    docs = spread_scan(load(spark, sf, "documents"), key="doc_id", min_bytes=2 << 20)
    return hashed_tf_embedding(docs, dim=16)


def _htf_slot_sql(dim: int) -> tuple[str, str]:
    val4 = (
        "list_sum(list_transform(range(1, 5), j -> "
        "CAST(strpos('0123456789abcdef', "
        "substr(md5(word || ':htf'), j, 1)) - 1 AS BIGINT) "
        "* (CAST(1 AS BIGINT) << (4 * (4 - j)))))"
    )
    sign = (
        "(CAST(strpos('0123456789abcdef', "
        "substr(md5(word || ':htf'), 5, 1)) - 1 AS BIGINT) % 2 * 2 - 1)"
    )
    return f"({val4} % {dim})", sign


_HTF_SLOT, _HTF_SIGN = _htf_slot_sql(16)
_HTF_SUMS = ",\n         ".join(
    f"sum(CASE WHEN slot = {i} THEN sign ELSE 0 END) AS c{i}" for i in range(16)
)
_HTF_NORM = " + ".join(f"c{i}*c{i}" for i in range(16))
_HTF_LIST = ", ".join(
    f"round(CASE WHEN nrm = 0 THEN 0.0 ELSE c{i}/nrm END, 6)" for i in range(16)
)

ORACLE["hashed_embedding"] = f"""
WITH w AS (
  SELECT doc_id, unnest({_WORDS_SQL}) AS word FROM documents
), s AS (
  SELECT doc_id, {_HTF_SLOT} AS slot, {_HTF_SIGN} AS sign FROM w
), a AS (
  SELECT doc_id, {_HTF_SUMS}
  FROM s GROUP BY doc_id
), n AS (
  SELECT *, sqrt(CAST({_HTF_NORM} AS DOUBLE)) AS nrm FROM a
)
SELECT d.doc_id,
       CASE WHEN n.doc_id IS NULL
            THEN [{", ".join(["0.0"] * 16)}]
            ELSE [{_HTF_LIST}] END AS embedding
FROM documents d LEFT JOIN n ON d.doc_id = n.doc_id
"""


def q_budget_select(spark: SparkSession, sf: str) -> DataFrame:
    """Token-budget quality selection (operators/mixing
    .budget_select): best-docs-first until a 20k-token budget, score
    = the md5-uniform (so the oracle shares the exact score math),
    n_tokens = n_chars/4. The oracle is the global SQL window cumsum
    over (score DESC, doc_id) — exactly what the distributed prefix
    sum must reproduce."""
    from ..operators.mixing import budget_select, uniform_hash

    docs = load(spark, sf, "documents")
    scored = docs.select(
        "doc_id",
        (F.col("n_chars") / 4).cast("long").alias("n_est"),
        F.round(uniform_hash(F.col("doc_id"), "qsel"), 6).alias("q"),
    )
    return budget_select(
        scored, F.col("n_est"), 20_000, score_col="q", id_col="doc_id"
    )


ORACLE["budget_select"] = """
WITH u AS (
  SELECT doc_id,
         CAST(floor(n_chars / 4) AS BIGINT) AS n_tokens,
         round((list_sum(list_transform(range(1, 9), j ->
            CAST(strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR) || ':qsel'), j, 1)) - 1
                 AS BIGINT)
            * (CAST(1 AS BIGINT) << (4 * (8 - j)))))
          / 4294967296.0), 6) AS q
  FROM documents
), w AS (
  SELECT doc_id, n_tokens, q,
         CAST(coalesce(sum(n_tokens) OVER (
            ORDER BY q DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM u
)
SELECT doc_id, n_tokens, q, cum_before, cum_before < 20000 AS selected
FROM w
"""


def q_mixture_entropy(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source language-mix diversity (operators/mixing
    .mixture_entropy): Shannon entropy in nats of the lang
    distribution within each source — the shard/mix diversity audit.
    Two map-side-combined aggs, rows = sources × langs then
    sources."""
    from ..operators.mixing import mixture_entropy

    docs = load(spark, sf, "documents")
    return mixture_entropy(docs, group_col="source", key_col="lang")


ORACLE["mixture_entropy"] = """
WITH c AS (
  SELECT source, lang, count(*) AS c FROM documents GROUP BY source, lang
)
SELECT source,
       CAST(sum(c) AS BIGINT) AS n,
       CAST(count(*) AS INTEGER) AS n_keys,
       round(ln(sum(c)) - sum(c * ln(c)) / sum(c), 6) AS entropy
FROM c GROUP BY source
"""


def q_curriculum(spark: SparkSession, sf: str) -> DataFrame:
    """Curriculum ordering over packs (operators/packing
    .curriculum_order): docs pack contiguously by doc_id at a
    4096-token budget (whitespace counts — the pack_documents
    tokenizer), each doc scored by the md5-uniform (SQL-sharable),
    packs rank ascending by mean score. The oracle replays the whole
    composition: window cumsum pack assignment → per-pack agg →
    rank."""
    from ..operators.mixing import uniform_hash
    from ..operators.packing import curriculum_order, pack_assignments

    docs = load(spark, sf, "documents").select(
        "doc_id",
        F.size(
            F.filter(
                F.split(F.col("text"), r"\s+"), lambda x: x != F.lit("")
            )
        ).cast("long").alias("_n"),
        F.round(uniform_hash(F.col("doc_id"), "curr"), 6).alias("q"),
    )
    packed = pack_assignments(docs, F.col("_n"), 4096, order_col="doc_id")
    scored = packed.join(docs.select("doc_id", "q"), "doc_id")
    return curriculum_order(scored, score_col="q")


ORACLE["curriculum"] = r"""
WITH t AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(text, '\s+'),
              x -> x != '')) AS BIGINT) AS n_tokens,
         round((list_sum(list_transform(range(1, 9), j ->
            CAST(strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR) || ':curr'), j, 1)) - 1
                 AS BIGINT)
            * (CAST(1 AS BIGINT) << (4 * (8 - j)))))
          / 4294967296.0), 6) AS q
  FROM documents),
c AS (
  SELECT doc_id, n_tokens, q,
         CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS tokens_before
  FROM t),
p AS (
  SELECT CAST(floor(tokens_before / 4096) AS BIGINT) AS pack_id,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
         round(avg(q), 6) AS mean_score
  FROM c GROUP BY 1)
SELECT pack_id, n_docs, pack_tokens, mean_score,
       CAST(row_number() OVER (ORDER BY mean_score, pack_id) - 1 AS INTEGER)
         AS curriculum_pos
FROM p
"""


def q_sample_topk(spark: SparkSession, sf: str) -> DataFrame:
    """Exactly-100 deterministic uniform sample (operators/mixing
    .sample_exact_k): the 100 rows with the smallest md5-uniform —
    TakeOrderedAndProject, never a global sort (plan pinned in
    tests/test_mixing.py). Oracle = the same md5 math + LIMIT."""
    from ..operators.mixing import sample_exact_k

    docs = load(spark, sf, "documents").select("doc_id", "source")
    return sample_exact_k(docs, 100)


ORACLE["sample_topk"] = """
WITH u AS (
  SELECT doc_id, source,
         (list_sum(list_transform(range(1, 9), j ->
            CAST(strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), j, 1)) - 1 AS BIGINT)
            * (CAST(1 AS BIGINT) << (4 * (8 - j)))))
          / 4294967296.0) AS uu
  FROM documents
)
SELECT doc_id, source FROM u ORDER BY uu, doc_id LIMIT 100
"""


def q_unicode_nfc(spark: SparkSession, sf: str) -> DataFrame:
    """NFC Unicode normalization (operators/unicodenorm
    .unicode_normalize) -- the pure-ASCII word salad is NFC-invariant,
    so the query plants decomposed sequences via explicit escapes:
    combining acute U+0301 after 'cafe' (%3), a combining
    diaeresis+macron stack U+0308 U+0304 (%5), and composed U+00E9
    plus the U+FB01 'fi' ligature (%7; both NFC fixed points, pinning
    the no-op path on non-ASCII input too). Oracle is DuckDB's
    nfc_normalize -- byte-exact. Zero Exchanges: one Arrow-batched
    projection."""
    from ..operators.unicodenorm import unicode_normalize

    docs = load(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 3 == 0, F.lit(" cafe\u0301")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 5 == 0, F.lit(" a\u0308\u0304b")
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0, F.lit(" \u00e9\ufb01n")
        ).otherwise(F.lit("")),
    )
    planted = docs.select("doc_id", aug.alias("text"))
    out = unicode_normalize(planted, "text", "NFC")
    return out.select(
        "doc_id",
        F.col("text").alias("text_nfc"),
        F.length("text").alias("n_chars_nfc"),
    )


ORACLE["unicode_nfc"] = """
WITH d AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0 THEN ' cafe' || chr(769) ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' a' || chr(776) || chr(772) || 'b' ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' ' || chr(233) || chr(64257) || 'n' ELSE '' END AS t
  FROM documents
)
SELECT doc_id,
       nfc_normalize(t) AS text_nfc,
       length(nfc_normalize(t)) AS n_chars_nfc
FROM d
"""


def q_soft_dedup(spark: SparkSession, sf: str) -> DataFrame:
    """Duplication-aware soft-dedup weights (operators/dedup
    .soft_dedup_weights, SoftDeDup He et al. 2024). The word-salad
    texts are (near-)unique, so the query plants two boilerplate
    families on doc_id %7 in {0, 1}; every family's weights sum to
    1.0 and singletons keep weight 1. Oracle groups by the text bytes
    themselves (identical to the xxhash64 key modulo 2^-64
    collisions). One map-side-combined hash agg + one hash-keyed
    join."""
    docs = load(spark, sf, "documents")
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.lit("family alpha boilerplate"))
        .when(F.col("doc_id") % 7 == 1, F.lit("family beta boilerplate"))
        .otherwise(F.col("text"))
        .alias("text"),
        "n_chars",
    )
    return dedup.soft_dedup_weights(
        planted, text_col="text", id_col="doc_id", tokens_col_name="n_chars"
    )


ORACLE["soft_dedup"] = """
WITH d AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0 THEN 'family alpha boilerplate'
              WHEN doc_id % 7 = 1 THEN 'family beta boilerplate'
              ELSE text END AS t,
         n_chars
  FROM documents
), f AS (
  SELECT t, COUNT(*) AS family_size FROM d GROUP BY t
)
SELECT d.doc_id AS id,
       CAST(f.family_size AS BIGINT) AS family_size,
       ROUND(CAST(1.0 AS DOUBLE) / f.family_size, 6) AS weight,
       ROUND(CAST(d.n_chars AS DOUBLE) / f.family_size, 6) AS eff_tokens
FROM d JOIN f ON d.t = f.t
"""


def q_char_spans(spark: SparkSession, sf: str) -> DataFrame:
    """Character-window duplicated-span stats (operators/filters
    .char_span_dup_stats, exact string-keyed form at L=20 so DuckDB
    can mirror it byte-exactly). The word salad has no cross-doc
    20-char repeats, so a shared boilerplate tail is planted on %9
    docs — its interior windows duplicate corpus-wide while windows
    straddling the splice stay unique per doc. The hashed rolling
    scale path is pinned equal to this form in pytest."""
    from ..operators.filters import char_span_dup_stats

    docs = load(spark, sf, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 9 == 0,
                F.lit(" shared boilerplate tail for the char span test"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return char_span_dup_stats(planted, L=20, exact=True)


ORACLE["char_spans"] = """
WITH d AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 9 = 0
                 THEN ' shared boilerplate tail for the char span test'
                 ELSE '' END AS t
  FROM documents),
g AS (
  SELECT doc_id, substr(t, CAST(i AS INTEGER), 20) AS span
  FROM d, UNNEST(generate_series(1, length(t) - 19)) AS u(i)
  WHERE length(t) >= 20),
c AS (SELECT span, count(*) AS cnt FROM g GROUP BY span)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
       round(avg(CASE WHEN c.cnt > 1 THEN 1.0 ELSE 0.0 END), 4)
         AS dup_char_span_frac
FROM g JOIN c USING (span)
GROUP BY doc_id
"""


def q_char_span_remove(spark: SparkSession, sf: str) -> DataFrame:
    """Char-level ExactSubstr removal (operators/filters
    .remove_duplicate_char_spans, exact form at L=20) over the same
    %9-planted boilerplate tail as q_char_spans. The oracle rebuilds
    every document character-by-character in SQL (positions not
    covered by any duplicated window, string_agg ordered by position)
    — so the Spark side's numpy difference-array mask is checked
    byte-exactly, including untouched short docs and the
    bytes-preserved-outside-cuts property."""
    from ..operators.filters import remove_duplicate_char_spans

    docs = load(spark, sf, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 9 == 0,
                F.lit(" shared boilerplate tail for the char span test"),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    return remove_duplicate_char_spans(planted, L=20, exact=True)


ORACLE["char_span_remove"] = """
WITH d AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 9 = 0
                 THEN ' shared boilerplate tail for the char span test'
                 ELSE '' END AS t
  FROM documents),
g AS (
  SELECT doc_id, CAST(i AS INTEGER) AS pos,
         substr(t, CAST(i AS INTEGER), 20) AS span
  FROM d, UNNEST(generate_series(1, length(t) - 19)) AS u(i)
  WHERE length(t) >= 20),
c AS (SELECT span FROM g GROUP BY span HAVING count(*) > 1),
s AS (SELECT g.doc_id, g.pos FROM g JOIN c USING (span)),
cov AS (
  SELECT DISTINCT s.doc_id, s.pos + o AS p
  FROM s, UNNEST(generate_series(0, 19)) AS t2(o)),
ch AS (
  SELECT d.doc_id, CAST(pp AS INTEGER) AS p,
         substr(d.t, CAST(pp AS INTEGER), 1) AS c1
  FROM d, UNNEST(generate_series(1, length(d.t))) AS q(pp)),
keep AS (
  SELECT ch.doc_id, ch.p, ch.c1
  FROM ch LEFT JOIN cov ON ch.doc_id = cov.doc_id AND ch.p = cov.p
  WHERE cov.p IS NULL),
agg AS (
  SELECT doc_id, string_agg(c1, '' ORDER BY p) AS clean_text,
         count(*) AS nkeep
  FROM keep GROUP BY doc_id)
SELECT d.doc_id,
       CAST(length(d.t) AS INTEGER) AS n_chars,
       CAST(length(d.t) - coalesce(agg.nkeep, 0) AS INTEGER)
         AS n_removed_chars,
       coalesce(agg.clean_text, '') AS clean_text
FROM d LEFT JOIN agg USING (doc_id)
"""


def q_host_boilerplate(spark: SparkSession, sf: str) -> DataFrame:
    """Host-template line removal (operators/filters
    .remove_host_boilerplate_lines). The corpus has no line structure
    or urls, so the query plants both: hosts derive from (source,
    doc_id%3) as in q_url_filter, and every page gets a shared header
    line, its unique word-salad body, an EMPTY line (must survive —
    min_line_chars guard), and on %2 a shared footer. Headers/footers
    repeat across each host's pages → removed; bodies and blank lines
    survive. Full oracle replays the whole explode→count→anti-join→
    ordered rebuild in SQL."""
    from ..operators.filters import remove_host_boilerplate_lines

    docs = load(spark, sf, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example."),
        F.element_at(
            F.array(F.lit("com"), F.lit("org"), F.lit("net")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ),
        F.lit("/p/"),
        F.col("doc_id"),
    )
    text = F.concat(
        F.lit("Home | About | Contact\n"),
        F.col("text"),
        F.lit("\n"),
        F.when(
            F.col("doc_id") % 2 == 0,
            F.lit("\nCopyright Example Site"),
        ).otherwise(F.lit("")),
    )
    planted = docs.select(url.alias("url"), text.alias("text"))
    return remove_host_boilerplate_lines(planted, min_pages=2)


ORACLE["host_boilerplate"] = r"""
WITH p AS (
  SELECT 'https://' || source || '.example.'
         || (CASE doc_id % 3 WHEN 0 THEN 'com' WHEN 1 THEN 'org'
             ELSE 'net' END)
         || '/p/' || doc_id AS url,
         'Home | About | Contact' || chr(10) || text || chr(10)
         || (CASE WHEN doc_id % 2 = 0
             THEN chr(10) || 'Copyright Example Site' ELSE '' END) AS t
  FROM documents
), c AS (
  SELECT url, t,
         regexp_replace(regexp_extract(lower(trim(url)),
             '^(?:[a-z][a-z0-9+.-]*://|//)?(?:[^@/?#]*@)?(\[[^\]]*\]|[^:/?#]+)', 1),
             '^www\.', '') AS h,
         string_split(t, chr(10)) AS ls
  FROM p
), l AS (
  SELECT url, h, CAST(i AS INTEGER) AS pos, ls[CAST(i AS INTEGER)] AS line
  FROM c, UNNEST(generate_series(1, len(ls))) AS g(i)
), b AS (
  SELECT h, line
  FROM (SELECT DISTINCT h, line, url FROM l WHERE length(line) >= 1)
  GROUP BY h, line HAVING count(*) >= 2
), k AS (
  SELECT l.url, l.pos, l.line
  FROM l LEFT JOIN b ON l.h = b.h AND l.line = b.line
  WHERE b.line IS NULL
), r AS (
  SELECT url, count(*) AS n_kept,
         string_agg(line, chr(10) ORDER BY pos) AS clean_text
  FROM k GROUP BY url
)
SELECT c.url,
       CAST(len(c.ls) AS INTEGER) AS n_lines,
       CAST(len(c.ls) - coalesce(r.n_kept, 0) AS INTEGER)
         AS n_removed_lines,
       coalesce(r.clean_text, '') AS clean_text
FROM c LEFT JOIN r USING (url)
"""


def q_budget_select_grouped(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source token-budget selection (operators/mixing
    .budget_select_grouped): each source gets its OWN budget — en a
    big one, de a small one, one source deliberately absent from the
    dict (budget 0 → all selected=false). Score = md5-uniform shared
    with the oracle; the oracle is the SQL window cumsum PARTITIONED
    BY source, which the grouped distributed prefix sum must
    reproduce exactly."""
    from ..operators.mixing import budget_select_grouped, uniform_hash

    docs = load(spark, sf, "documents")
    scored = docs.select(
        "source",
        "doc_id",
        (F.col("n_chars") / 4).cast("long").alias("n_est"),
        F.round(uniform_hash(F.col("doc_id"), "qsel"), 6).alias("q"),
    )
    return budget_select_grouped(
        scored,
        F.col("n_est"),
        {"en": 15_000, "de": 4_000, "fr": 2_500, "es": 1_000},
        group_col="source",
        score_col="q",
        id_col="doc_id",
    )


ORACLE["budget_select_grouped"] = """
WITH u AS (
  SELECT source, doc_id,
         CAST(floor(n_chars / 4) AS BIGINT) AS n_tokens,
         round((list_sum(list_transform(range(1, 9), j ->
            CAST(strpos('0123456789abcdef',
                 substr(md5(CAST(doc_id AS VARCHAR) || ':qsel'), j, 1)) - 1
                 AS BIGINT)
            * (CAST(1 AS BIGINT) << (4 * (8 - j)))))
          / 4294967296.0), 6) AS q
  FROM documents
), w AS (
  SELECT source, doc_id, n_tokens, q,
         CAST(coalesce(sum(n_tokens) OVER (
            PARTITION BY source
            ORDER BY q DESC, doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS cum_before
  FROM u
)
SELECT source, doc_id, n_tokens, q, cum_before,
       cum_before < (CASE source WHEN 'en' THEN 15000 WHEN 'de' THEN 4000
                     WHEN 'fr' THEN 2500 WHEN 'es' THEN 1000
                     ELSE 0 END) AS selected
FROM w
"""


def q_annotate(spark: SparkSession, sf: str) -> DataFrame:
    """The one-scan Dolma-style tagger pass (nidaba_spark/annotate
    .annotate) — quality + tokens + fingerprint + PII + scripts +
    Gopher A1.1 + C4, all over the SAME planted text, checked by ONE
    DuckDB query. Plants combine the established residue idioms:
    PII on %7/%11/%13, Cyrillic on %5, '# ' spam on %29, two honest
    sentences on every doc (line structure for C4), a brace line on
    %17, bullets on %19, a trailing ellipsis line on %23. The oracle
    covers the 27 cross-family columns; the remaining script-count
    columns ride the script_stats oracle."""
    from ..annotate import annotate

    docs = load(spark, sf, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.lit(" contact user"), F.col("doc_id"),
                F.lit("@example.com now"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 11 == 0,
            F.concat(
                F.lit(" call +1 555-010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 13 == 0,
            F.concat(
                F.lit(" from 192.168."),
                (F.col("doc_id") % 256).cast("string"),
                F.lit("."),
                ((F.col("doc_id") * 7) % 256).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(F.col("doc_id") % 5 == 0, F.lit(" привет мир")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 29 == 0,
            F.concat(F.lit(" "), F.repeat(F.lit("# "), 10)),
        ).otherwise(F.lit("")),
        F.lit(
            "\nA proper second sentence keeps the annotate counter honest"
            " here.\nAnother good sentence rides along to satisfy the"
            " minimum count."
        ),
        F.when(
            F.col("doc_id") % 17 == 0,
            F.lit("\nthis line has a { brace and no terminal punctuation"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 19 == 0,
            F.lit("\n- bullet line one\n- bullet line two"),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 23 == 0, F.lit("\ntrailing thought...")
        ).otherwise(F.lit("")),
    )
    planted = docs.select("doc_id", aug.alias("text"))
    return annotate(planted).select(
        "doc_id",
        "n_chars", "n_words", "stop_ratio", "punct_ratio", "mean_word_len",
        "quality", "n_tokens_ws", "n_tokens_bpe", "fingerprint",
        "n_email", "n_phone", "n_ip",
        "n_latin", "n_cyrillic", "dominant_script",
        "gopher_n_words", "gopher_mean_word_len", "symbol_ratio",
        "bullet_line_frac", "ellipsis_line_frac", "alpha_word_frac",
        "n_required_stopwords", "gopher_keep",
        "c4_n_lines", "c4_n_kept_lines", "c4_n_sentences", "c4_keep",
        "rd_n_words", "rd_n_sentences", "n_syllables", "flesch", "fk_grade",
    )


ORACLE["annotate"] = r"""
WITH a AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com now'
                 ELSE '' END
         || CASE WHEN doc_id % 11 = 0
                 THEN ' call +1 555-010-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                 ELSE '' END
         || CASE WHEN doc_id % 13 = 0
                 THEN ' from 192.168.' || (doc_id % 256) || '.'
                      || ((doc_id * 7) % 256)
                 ELSE '' END
         || CASE WHEN doc_id % 5 = 0 THEN ' привет мир' ELSE '' END
         || CASE WHEN doc_id % 29 = 0
                 THEN ' ' || repeat('# ', 10) ELSE '' END
         || chr(10) || 'A proper second sentence keeps the annotate'
         || ' counter honest here.'
         || chr(10) || 'Another good sentence rides along to satisfy'
         || ' the minimum count.'
         || CASE WHEN doc_id % 17 = 0
                 THEN chr(10)
                      || 'this line has a { brace and no terminal punctuation'
                 ELSE '' END
         || CASE WHEN doc_id % 19 = 0
                 THEN chr(10) || '- bullet line one'
                      || chr(10) || '- bullet line two'
                 ELSE '' END
         || CASE WHEN doc_id % 23 = 0
                 THEN chr(10) || 'trailing thought...' ELSE '' END AS t
  FROM documents
), qf AS (
  SELECT doc_id, t,
         list_filter(string_split_regex(lower(t), '[^a-z0-9'']+'),
                     x -> x <> '') AS qwords,
         list_filter(string_split_regex(lower(t), '[^a-z0-9]+'),
                     x -> x <> '') AS fwords
  FROM a
), q AS (
  SELECT doc_id,
         length(t) AS n_chars,
         len(qwords) AS n_words,
         len(list_filter(qwords, x -> list_contains(__STOPLIST__, x)))
           AS n_stop,
         length(regexp_replace(t, '[^\.,;:!\?''"-]', '', 'g')) AS n_punct,
         list_sum(list_transform(qwords, x -> length(x))) AS sum_wl
  FROM qf
), fp AS (
  SELECT doc_id,
         CAST(coalesce(list_sum(list_transform(range(1, len(fwords) + 1),
            i -> (list_sum(list_transform(range(1, 5), j ->
              (strpos('0123456789abcdef', substr(md5(fwords[i]), j, 1)) - 1)
              * (1 << (4 * (4 - j))))) * i) % 2147483647)), 0)
            % 2147483647 AS BIGINT) AS fingerprint
  FROM qf
), sc AS (
  SELECT doc_id,
    length(t) - length(regexp_replace(t, '\p{Latin}+', '', 'g')) AS n_latin,
    length(t) - length(regexp_replace(t, '\p{Cyrillic}+', '', 'g'))
      AS n_cyrillic,
    length(t) - length(regexp_replace(t, '\p{Han}+', '', 'g')) AS n_han,
    length(t) - length(regexp_replace(t, '\p{Greek}+', '', 'g')) AS n_greek,
    length(t) - length(regexp_replace(t, '\p{Arabic}+', '', 'g')) AS n_arabic,
    length(t) - length(regexp_replace(t, '\p{Hebrew}+', '', 'g')) AS n_hebrew,
    length(t) - length(regexp_replace(t, '\p{Devanagari}+', '', 'g'))
      AS n_devanagari,
    length(t) - length(regexp_replace(t, '\p{Hiragana}+', '', 'g'))
      AS n_hiragana,
    length(t) - length(regexp_replace(t, '\p{Katakana}+', '', 'g'))
      AS n_katakana,
    length(t) - length(regexp_replace(t, '\p{Hangul}+', '', 'g')) AS n_hangul
  FROM a
), scm AS (
  SELECT *, greatest(n_latin, n_cyrillic, n_greek, n_arabic, n_hebrew,
                     n_devanagari, n_han, n_hiragana, n_katakana, n_hangul)
            AS mx
  FROM sc
), gp AS (
  SELECT doc_id, t,
         list_filter(string_split_regex(t, '\s+'), w -> w <> '') AS ws,
         list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)),
                     lt -> lt <> '') AS lines,
         list_filter(string_split_regex(lower(t), '[^a-z0-9]+'),
                     x -> x <> '') AS lw
  FROM a
), gm AS (
  SELECT doc_id,
         len(ws) AS g_n_words,
         len(lines) AS g_n_lines,
         (length(t) - length(replace(t, '...', ''))) / 3
           + (length(t) - length(replace(t, '…', ''))) AS n_ellipsis,
         length(t) - length(replace(t, '#', '')) AS n_hash,
         list_sum(list_transform(ws, w -> length(w))) AS g_sum_wl,
         len(list_filter(ws, w -> regexp_matches(w, '[a-zA-Z]'))) AS n_alpha,
         len(list_filter(lines, lt -> regexp_matches(lt, '^[-*•]')))
           AS n_bullet,
         len(list_filter(lines, lt -> regexp_matches(lt, '(\.\.\.|…)$')))
           AS n_ell_l,
         len(list_intersect(list_distinct(lw),
             ['the','be','to','of','and','that','have','with'])) AS g_n_stop
  FROM gp
), gf AS (
  SELECT doc_id,
         CAST(g_n_words AS INTEGER) AS gopher_n_words,
         round(CASE WHEN g_n_words > 0 THEN g_sum_wl / g_n_words
               ELSE 0.0 END, 4) AS gopher_mean_word_len,
         round(CASE WHEN g_n_words > 0 THEN (n_hash + n_ellipsis) / g_n_words
               ELSE 0.0 END, 4) AS symbol_ratio,
         round(CASE WHEN g_n_lines > 0 THEN n_bullet::DOUBLE / g_n_lines
               ELSE 0.0 END, 4) AS bullet_line_frac,
         round(CASE WHEN g_n_lines > 0 THEN n_ell_l::DOUBLE / g_n_lines
               ELSE 0.0 END, 4) AS ellipsis_line_frac,
         round(CASE WHEN g_n_words > 0 THEN n_alpha::DOUBLE / g_n_words
               ELSE 0.0 END, 4) AS alpha_word_frac,
         CAST(g_n_stop AS INTEGER) AS n_required_stopwords
  FROM gm
), ck AS (
  SELECT doc_id, t,
         list_filter(list_transform(string_split(t, chr(10)), l -> trim(l)),
                     lt -> regexp_matches(lt, '[.!?"]$')
                           AND len(string_split_regex(lt, '\s+')) >= 5
                           AND NOT regexp_matches(lower(lt), '\bjavascript\b'))
           AS kept
  FROM a
), c4 AS (
  SELECT doc_id,
         CAST(len(string_split(t, chr(10))) AS INTEGER) AS c4_n_lines,
         CAST(len(kept) AS INTEGER) AS c4_n_kept_lines,
         CAST(len(string_split_regex(
              coalesce(array_to_string(kept, chr(10)), ''), '[.!?"]')) - 1
              AS INTEGER) AS c4_n_sentences,
         (NOT contains(t, '{') AND NOT contains(lower(t), 'lorem ipsum')
          AND NOT regexp_matches(lower(t), '\b(porn|xxx)\b')
          AND len(string_split_regex(
              coalesce(array_to_string(kept, chr(10)), ''), '[.!?"]')) - 1
              >= 3) AS c4_keep
  FROM ck
), rdn AS (
  SELECT doc_id, trim(regexp_replace(t, '[ \t\r\n\f\x0B]+', ' ', 'g')) AS s
  FROM a
), rd AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(s, '[^ ]+')) AS INTEGER) AS rd_n_words,
         CAST(len(regexp_extract_all(
           s, '[^.!?。！？]*[^.!?。！？\s]\s*[.!?。！？]+|[^.!?。！？]*[^.!?。！？\s]$'
         )) AS INTEGER) AS rd_n_sentences,
         CAST(len(regexp_extract_all(lower(s), '[aeiouy]+')) AS INTEGER)
           AS n_syllables
  FROM rdn
)
SELECT q.doc_id,
       CAST(q.n_chars AS INTEGER) AS n_chars,
       CAST(q.n_words AS INTEGER) AS n_words,
       CASE WHEN q.n_words > 0 THEN round(q.n_stop / q.n_words, 4)
            ELSE 0.0 END AS stop_ratio,
       CASE WHEN q.n_chars > 0 THEN round(q.n_punct / q.n_chars, 4)
            ELSE 0.0 END AS punct_ratio,
       CASE WHEN q.n_words > 0 THEN round(q.sum_wl / q.n_words, 4)
            ELSE 0.0 END AS mean_word_len,
       round((least(q.n_words / 100.0, 1.0)
            + least((CASE WHEN q.n_words > 0 THEN q.n_stop / q.n_words
                     ELSE 0.0 END) * 5.0, 1.0)
            + (1.0 - least((CASE WHEN q.n_chars > 0
                     THEN q.n_punct / q.n_chars ELSE 0.0 END) * 5.0, 1.0)))
            / 3.0, 4) AS quality,
       CAST(len(list_filter(string_split_regex(a.t, '\s+'), w -> w <> ''))
            AS INTEGER) AS n_tokens_ws,
       CAST(len(regexp_extract_all(a.t,
            '[a-zA-Z]{1,4}|[0-9]+|[^a-zA-Z0-9\s]')) AS INTEGER)
            AS n_tokens_bpe,
       fp.fingerprint,
       CAST(len(regexp_extract_all(a.t,
            '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INTEGER)
            AS n_email,
       CAST(len(regexp_extract_all(a.t, '\+\d{1,2} \d{3}-\d{3}-\d{4}'))
            AS INTEGER) AS n_phone,
       CAST(len(regexp_extract_all(a.t, '\b\d{1,3}(\.\d{1,3}){3}\b'))
            AS INTEGER) AS n_ip,
       CAST(scm.n_latin AS INTEGER) AS n_latin,
       CAST(scm.n_cyrillic AS INTEGER) AS n_cyrillic,
       CASE WHEN scm.mx = 0 THEN 'none'
            WHEN scm.n_latin = scm.mx THEN 'latin'
            WHEN scm.n_cyrillic = scm.mx THEN 'cyrillic'
            WHEN scm.n_greek = scm.mx THEN 'greek'
            WHEN scm.n_arabic = scm.mx THEN 'arabic'
            WHEN scm.n_hebrew = scm.mx THEN 'hebrew'
            WHEN scm.n_devanagari = scm.mx THEN 'devanagari'
            WHEN scm.n_han = scm.mx THEN 'han'
            WHEN scm.n_hiragana = scm.mx THEN 'hiragana'
            WHEN scm.n_katakana = scm.mx THEN 'katakana'
            ELSE 'hangul' END AS dominant_script,
       gf.gopher_n_words, gf.gopher_mean_word_len, gf.symbol_ratio,
       gf.bullet_line_frac, gf.ellipsis_line_frac, gf.alpha_word_frac,
       gf.n_required_stopwords,
       (gf.gopher_n_words >= 50 AND gf.gopher_n_words <= 100000
        AND gf.gopher_mean_word_len >= 3 AND gf.gopher_mean_word_len <= 10
        AND gf.symbol_ratio < 0.1
        AND gf.bullet_line_frac < 0.9
        AND gf.ellipsis_line_frac <= 0.3
        AND gf.alpha_word_frac >= 0.8
        AND gf.n_required_stopwords >= 2) AS gopher_keep,
       c4.c4_n_lines, c4.c4_n_kept_lines, c4.c4_n_sentences, c4.c4_keep,
       rd.rd_n_words, rd.rd_n_sentences, rd.n_syllables,
       round(206.835
             - 1.015 * (rd.rd_n_words
                        / CAST(greatest(rd.rd_n_sentences, 1) AS DOUBLE))
             - 84.6 * (rd.n_syllables
                       / CAST(greatest(rd.rd_n_words, 1) AS DOUBLE)),
             4) AS flesch,
       round(0.39 * (rd.rd_n_words
                     / CAST(greatest(rd.rd_n_sentences, 1) AS DOUBLE))
             + 11.8 * (rd.n_syllables
                       / CAST(greatest(rd.rd_n_words, 1) AS DOUBLE))
             - 15.59, 4) AS fk_grade
FROM q
JOIN a USING (doc_id)
JOIN fp USING (doc_id)
JOIN scm USING (doc_id)
JOIN gf USING (doc_id)
JOIN c4 USING (doc_id)
JOIN rd USING (doc_id)
""".replace("__STOPLIST__", _STOPLIST_SQL)


def q_cdx_index(spark: SparkSession, sf: str) -> DataFrame:
    """CDX capture index (operators/cdx.build_cdx) over synthesized
    crawl URLs that exercise every SURT rule: uppercase scheme/host,
    www-strip, non-default port KEPT, default :80/:443 DROPPED, FQDN
    trailing-dot strip, fragment strip, empty path → '/', query-param
    sort with empty-param drop. ts is a pre-formatted
    14-digit string (timestamp formatting is session-tz-dependent;
    the string path keeps the oracle engine-neutral). The global
    (surt, ts) range sort is exercised but not compared — the driver
    rowset compare is order-free; sortedness/pruning have dedicated
    plan gates in tests/test_cdx.py."""
    from ..operators.cdx import build_cdx

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    h = (d % 37).cast("string")
    url = (
        F.when(
            d % 6 == 0,
            F.concat(
                F.lit("HTTPS://WWW.Site"), h, F.lit(".Example.COM/Articles/"),
                d.cast("string"), F.lit("?b=2&a=1&"),
            ),
        )
        .when(
            d % 6 == 1,
            F.concat(
                F.lit("http://site"), h, F.lit(".example.com:8080/"),
                d.cast("string"), F.lit("#frag"),
            ),
        )
        .when(
            d % 6 == 2,
            F.concat(F.lit("https://www.site"), h, F.lit(".example.com")),
        )
        .when(
            # FQDN trailing dot + explicit default http port: both
            # strip, keying with the plain-host captures
            d % 6 == 3,
            F.concat(
                F.lit("http://Site"), h, F.lit(".example.com.:80/p/"),
                d.cast("string"),
            ),
        )
        .when(
            # explicit default https port drops too
            d % 6 == 4,
            F.concat(
                F.lit("HTTPS://site"), h, F.lit(".example.com:443/q/"),
                d.cast("string"), F.lit("?x=1"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("http://site"), h, F.lit(".example.com/x/Y/"),
                d.cast("string"), F.lit("?z="),
            )
        )
    )
    ts = F.concat(F.lit("202401"), F.lpad((d % 28 + 1).cast("string"), 2, "0"),
                  F.lit("120000"))
    pages = docs.select(
        url.alias("url"), ts.alias("warc_ts"), F.col("text")
    )
    return build_cdx(pages, payload_col="text").select(
        "surt", "ts", "url", "digest", "mime", "length"
    )


ORACLE["cdx_index"] = r"""
WITH pages AS (
  SELECT CASE
           WHEN doc_id % 6 = 0 THEN 'HTTPS://WWW.Site' || (doc_id % 37)
                || '.Example.COM/Articles/' || doc_id || '?b=2&a=1&'
           WHEN doc_id % 6 = 1 THEN 'http://site' || (doc_id % 37)
                || '.example.com:8080/' || doc_id || '#frag'
           WHEN doc_id % 6 = 2 THEN 'https://www.site' || (doc_id % 37)
                || '.example.com'
           WHEN doc_id % 6 = 3 THEN 'http://Site' || (doc_id % 37)
                || '.example.com.:80/p/' || doc_id
           WHEN doc_id % 6 = 4 THEN 'HTTPS://site' || (doc_id % 37)
                || '.example.com:443/q/' || doc_id || '?x=1'
           ELSE 'http://site' || (doc_id % 37) || '.example.com/x/Y/'
                || doc_id || '?z='
         END AS url,
         '202401' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
                  || '120000' AS ts,
         text
  FROM documents
), parts AS (
  SELECT url, ts, text,
         regexp_extract(url,
           '^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@?#]*@)?([^/?#]+)', 1)
           AS hostport,
         lower(split_part(regexp_replace(url,
           '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*', ''), '#', 1)) AS rest
  FROM pages
), surt AS (
  SELECT url, ts, text, rest,
         array_to_string(list_reverse(string_split(
           regexp_replace(regexp_replace(
             lower(split_part(hostport, ':', 1)),
             '^\.+|\.+$', '', 'g'), '^www\.', ''), '.')), ',')
         || CASE WHEN contains(hostport, ':')
                  AND NOT (lower(regexp_extract(url,
                        '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) = 'http'
                      AND split_part(hostport, ':', 2) = '80')
                  AND NOT (lower(regexp_extract(url,
                        '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) = 'https'
                      AND split_part(hostport, ':', 2) = '443')
                 THEN ':' || split_part(hostport, ':', 2) ELSE '' END
         || ')'
         || CASE WHEN split_part(rest, '?', 1) = '' THEN '/'
                 ELSE split_part(rest, '?', 1) END
         || CASE WHEN regexp_extract(rest, '\?(.*)$', 1) = '' THEN ''
                 ELSE '?' || array_to_string(list_sort(list_filter(
                        string_split(regexp_extract(rest, '\?(.*)$', 1),
                                     '&'), x -> x <> '')), '&')
            END AS surt
  FROM parts
)
SELECT surt, ts, url, sha256(text) AS digest,
       'text/html' AS mime,
       CAST(octet_length(encode(text)) AS BIGINT) AS length
FROM surt
"""


def q_crawl_frontier(spark: SparkSession, sf: str) -> DataFrame:
    """Crawl-frontier generation (operators/frontier.crawl_frontier)
    over the same synthesized pages as page_links: discovered
    outlinks minus the crawled set, per-host politeness rank, host
    cap 100. The crawled set = the pages' own URLs (default) plus an
    external set planting real hits — /home and every doc_id%3==0
    dot-relative target — so the anti-join provably removes rows.
    The oracle reconstructs the surviving frontier INDEPENDENTLY from
    the planted-link arithmetic (like page_links/anchor_stats), not
    by mirroring the extraction."""
    from ..operators.frontier import crawl_frontier

    docs = load(spark, sf, "documents")
    pages = _synth_pages(docs)
    d = F.col("doc_id")
    crawled = (
        docs.filter(d % 3 == 0)
        .select(
            F.concat(
                F.lit("https://docs.example.com/d/"),
                d.cast("string"),
                F.lit("/../up"),
            ).alias("url")
        )
        .unionByName(
            spark.createDataFrame(
                [("https://docs.example.com/home",)], "url string"
            )
        )
    )
    return crawl_frontier(pages, crawled=crawled, per_host_cap=100)


ORACLE["crawl_frontier"] = """
WITH f AS (
  SELECT CAST(doc_id AS BIGINT) AS doc_id,
         regexp_extract(lower(text), '[a-z0-9]+', 0) AS w
  FROM documents),
n AS (SELECT CAST(count(*) AS BIGINT) AS c FROM f),
cand AS (
  SELECT 'https://docs.example.com/about' AS url,
         'docs.example.com' AS host, c AS n_referrers FROM n
  UNION ALL
  SELECT 'https://ref.example.org/cite', 'ref.example.org', c FROM n
  UNION ALL
  SELECT 'https://cdn.example.net/lib.js', 'cdn.example.net', c FROM n
  UNION ALL
  SELECT 'https://docs.example.com/d/' || doc_id || '/../up',
         'docs.example.com', CAST(1 AS BIGINT)
  FROM f WHERE doc_id % 3 <> 0
  UNION ALL
  SELECT 'https://docs.example.com/d/' || doc_id || '/rel/' || w,
         'docs.example.com', CAST(1 AS BIGINT) FROM f
)
SELECT url, host, n_referrers,
       CAST(row_number() OVER (
         PARTITION BY host ORDER BY n_referrers DESC, url
       ) AS BIGINT) AS fetch_order
FROM cand
QUALIFY fetch_order <= 100
"""


def q_sitemap_entries(spark: SparkSession, sf: str) -> DataFrame:
    """Sitemap ingestion (operators/sitemap.sitemap_entries) over
    synthesized sitemap XML: every doc gets a urlset file with two
    <url> blocks — the first exercises CDATA loc wrapping (doc_id%7),
    XML entity unescaping (&amp; in the query string), whitespace
    trimming, lastmod, conditional changefreq (doc_id%2) and priority
    (doc_id%3); the second is loc-only (nulls) — and every tenth doc
    adds a sitemapindex file whose <sitemap> block points at the
    urlset. The oracle reconstructs all three entry families
    INDEPENDENTLY from the doc_id arithmetic (the robots/frontier
    pattern), so it checks block splitting, tag extraction, CDATA,
    unescaping, and the null/double contracts end to end."""
    from ..operators.sitemap import sitemap_entries

    docs = spread_scan(load(spark, sf, "documents"), key="doc_id")
    d = F.col("doc_id")
    site = F.concat(
        F.lit("https://s"), (d % 5).cast("string"), F.lit(".example.com")
    )
    loc1 = F.concat(site, F.lit("/p/"), d.cast("string"), F.lit("?a=1&amp;b=2"))
    loc1_tag = F.when(
        d % 7 == 0,
        F.concat(F.lit("<loc><![CDATA["), loc1, F.lit("]]></loc>")),
    ).otherwise(F.concat(F.lit("<loc> "), loc1, F.lit(" </loc>")))
    xml = F.concat(
        F.lit(
            '<?xml version="1.0" encoding="UTF-8"?>\n'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
            "<!-- <url><loc>https://poison.example.net/x</loc></url> -->\n"
            "<url>"
        ),
        loc1_tag,
        F.lit("<lastmod>2026-01-0"),
        ((d % 9) + 1).cast("string"),
        F.lit("</lastmod>"),
        F.when(d % 2 == 0, F.lit("<changefreq>weekly</changefreq>")).otherwise(
            F.lit("")
        ),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit("<priority>0."), (d % 10).cast("string"), F.lit("</priority>")
            ),
        ).otherwise(F.lit("")),
        F.lit("</url>\n<url><loc>"),
        site,
        F.lit("/p/"),
        d.cast("string"),
        F.lit("/alt</loc></url>\n</urlset>"),
    )
    urlsets = docs.select(
        F.concat(site, F.lit("/sitemap-"), d.cast("string"), F.lit(".xml")).alias(
            "url"
        ),
        F.encode(xml, "UTF-8").alias("html"),
    )
    idx_xml = F.concat(
        F.lit("<sitemapindex><sitemap><loc>"),
        site,
        F.lit("/sitemap-"),
        d.cast("string"),
        F.lit(".xml</loc><lastmod>2026-02-01</lastmod></sitemap></sitemapindex>"),
    )
    indexes = docs.filter(d % 10 == 0).select(
        F.concat(site, F.lit("/si-"), d.cast("string"), F.lit(".xml")).alias("url"),
        F.encode(idx_xml, "UTF-8").alias("html"),
    )
    return sitemap_entries(urlsets.unionByName(indexes))


ORACLE["sitemap_entries"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://s' || (doc_id % 5) || '.example.com' AS site
  FROM documents)
SELECT * FROM (
  SELECT site || '/sitemap-' || i || '.xml' AS sitemap_url,
         'url' AS kind,
         site || '/p/' || i || '?a=1&b=2' AS loc,
         '2026-01-0' || ((i % 9) + 1) AS lastmod,
         CASE WHEN i % 2 = 0 THEN 'weekly' END AS changefreq,
         CASE WHEN i % 3 = 0 THEN CAST('0.' || (i % 10) AS DOUBLE) END AS priority
  FROM d
  UNION ALL
  SELECT site || '/sitemap-' || i || '.xml', 'url',
         site || '/p/' || i || '/alt', NULL, NULL, CAST(NULL AS DOUBLE)
  FROM d
  UNION ALL
  SELECT site || '/si-' || i || '.xml', 'sitemap',
         site || '/sitemap-' || i || '.xml', '2026-02-01', NULL,
         CAST(NULL AS DOUBLE)
  FROM d WHERE i % 10 = 0
)
"""


def q_recrawl_priority(spark: SparkSession, sf: str) -> DataFrame:
    """Recrawl scheduling signal (operators/snapshot.recrawl_priority)
    over a synthesized multi-snapshot history: every doc's url gets
    1 + doc_id%4 visits (ts = visit index) whose content is
    'v' || ((doc_id*7 + j*j) % 5) — by construction visits 0→1 and
    1→2 always change while 2→3 never does (4 ≡ 9 mod 5), so the
    corpus plants change_frac = 1.0, 2/3, and the single-visit null
    case. The oracle replays the identical synthesis + SQL window
    (the budget_select pattern: the global window IS the spec the
    distributed path must reproduce), with the hash-equality swap
    (text compare) that cannot diverge absent a 64-bit collision."""
    from ..operators.snapshot import recrawl_priority

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    hist = docs.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), (d % 4).cast("int"))).alias("j"),
    ).select(
        F.concat(
            F.lit("https://h.example.com/p/"), F.col("doc_id").cast("string")
        ).alias("url"),
        F.col("j").cast("long").alias("warc_ts"),
        F.concat(
            F.lit("v"),
            (
                (F.col("doc_id") * 7 + F.col("j") * F.col("j")) % 5
            ).cast("string"),
        ).alias("text"),
    )
    return recrawl_priority(hist)


ORACLE["recrawl_priority"] = """
WITH h AS (
  SELECT CAST(doc_id AS BIGINT) AS i, CAST(t.j AS BIGINT) AS j
  FROM documents, UNNEST(range(0, CAST(doc_id % 4 AS BIGINT) + 1)) AS t(j)),
v AS (
  SELECT 'https://h.example.com/p/' || i AS url, j AS ts,
         'v' || ((i * 7 + j * j) % 5) AS text
  FROM h),
c AS (
  SELECT url,
         CASE WHEN lag(text) OVER w IS NOT NULL
                   AND text <> lag(text) OVER w
              THEN 1 ELSE 0 END AS chg
  FROM v WINDOW w AS (PARTITION BY url ORDER BY ts)),
a AS (
  SELECT url, CAST(count(*) AS BIGINT) AS n_visits,
         CAST(sum(chg) AS BIGINT) AS n_changes
  FROM c GROUP BY url)
SELECT url, n_visits, n_changes,
       CASE WHEN n_visits > 1
            THEN CAST(n_changes AS DOUBLE) / (n_visits - 1) END AS change_frac,
       CASE WHEN n_visits > 1
            THEN -ln((n_visits - 1 - n_changes + 0.5) / (n_visits - 1 + 0.5))
       END AS change_rate
FROM a
"""


def q_feed_entries(spark: SparkSession, sf: str) -> DataFrame:
    """RSS/Atom feed ingestion (operators/feeds.feed_entries) over
    synthesized feed XML: every doc gets an RSS feed with two items —
    the first exercises CDATA link wrapping (doc_id%7), XML entity
    unescaping (&amp; in the query string), whitespace trimming,
    conditional pubDate (doc_id%2) and guid (doc_id%3); the second is
    link-only (nulls); a third has NO link and must drop — and every
    third doc adds an Atom feed whose entry exercises the RFC 4287
    rel rule (a rel="self" link listed FIRST must be skipped for the
    rel-less alternate), relative-href resolution against the feed
    url, and the published→updated fallback (doc_id%2). The oracle
    reconstructs every row INDEPENDENTLY from the doc_id arithmetic
    (the sitemap pattern)."""
    from ..operators.feeds import feed_entries

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    site = F.concat(
        F.lit("https://f"), (d % 5).cast("string"), F.lit(".example.org")
    )
    link1 = F.concat(site, F.lit("/p/"), d.cast("string"), F.lit("?x=1&amp;y=2"))
    link1_tag = F.when(
        d % 7 == 0,
        F.concat(F.lit("<link><![CDATA["), link1, F.lit("]]></link>")),
    ).otherwise(F.concat(F.lit("<link> "), link1, F.lit(" </link>")))
    rss_xml = F.concat(
        F.lit('<?xml version="1.0"?><rss version="2.0"><channel>'
              "<!-- <item><link>https://poison.example.net/i</link>"
              "</item> --><item>"
              "<title>Post "),
        d.cast("string"),
        F.lit(" &amp; more</title>"),
        link1_tag,
        F.when(
            d % 2 == 0,
            F.concat(
                F.lit("<pubDate>Mon, 0"),
                ((d % 9) + 1).cast("string"),
                F.lit(" Jan 2026 00:00:00 GMT</pubDate>"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0,
            F.concat(F.lit("<guid>g-"), d.cast("string"), F.lit("</guid>")),
        ).otherwise(F.lit("")),
        F.lit("</item><item><link>"),
        site,
        F.lit("/p/"),
        d.cast("string"),
        F.lit("/alt</link></item><item><title>linkless drops</title></item>"
              "</channel></rss>"),
    )
    rss = docs.select(
        F.concat(site, F.lit("/feed-"), d.cast("string"), F.lit(".rss")).alias(
            "url"
        ),
        F.encode(rss_xml, "UTF-8").alias("html"),
    )
    atom_xml = F.concat(
        F.lit('<feed xmlns="http://www.w3.org/2005/Atom"><entry><title>A'),
        d.cast("string"),
        F.lit('</title><link rel="self" href="'),
        site,
        F.lit("/feed-"),
        d.cast("string"),
        F.lit('.atom"/><link href="/posts/'),
        d.cast("string"),
        F.lit('"/>'),
        F.when(
            d % 2 == 0,
            F.lit("<published>2026-03-01T00:00:00Z</published>"),
        ).otherwise(F.lit("<updated>2026-03-02T00:00:00Z</updated>")),
        F.lit("<id>tag:"),
        d.cast("string"),
        F.lit("</id></entry></feed>"),
    )
    atom = docs.filter(d % 3 == 0).select(
        F.concat(site, F.lit("/feed-"), d.cast("string"), F.lit(".atom")).alias(
            "url"
        ),
        F.encode(atom_xml, "UTF-8").alias("html"),
    )
    return feed_entries(rss.unionByName(atom))


ORACLE["feed_entries"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://f' || (doc_id % 5) || '.example.org' AS site
  FROM documents)
SELECT * FROM (
  SELECT site || '/feed-' || i || '.rss' AS feed_url,
         'rss' AS kind,
         site || '/p/' || i || '?x=1&y=2' AS loc,
         'Post ' || i || ' & more' AS title,
         CASE WHEN i % 2 = 0
              THEN 'Mon, 0' || ((i % 9) + 1) || ' Jan 2026 00:00:00 GMT'
         END AS published,
         CASE WHEN i % 3 = 0 THEN 'g-' || i END AS guid
  FROM d
  UNION ALL
  SELECT site || '/feed-' || i || '.rss', 'rss',
         site || '/p/' || i || '/alt', NULL, NULL, NULL
  FROM d
  UNION ALL
  SELECT site || '/feed-' || i || '.atom', 'atom',
         site || '/posts/' || i, 'A' || i,
         CASE WHEN i % 2 = 0 THEN '2026-03-01T00:00:00Z'
              ELSE '2026-03-02T00:00:00Z' END,
         'tag:' || i
  FROM d WHERE i % 3 = 0
)
"""


def q_og_meta(spark: SparkSession, sf: str) -> DataFrame:
    """OpenGraph extraction (operators/links.og_meta) over synthesized
    heads: og:title present on every doc with property/content
    attribute order flipping on doc parity (both regex orders
    exercised) and internal whitespace to collapse; og:type only on
    doc_id%3==0; og:image a RELATIVE path resolved against the page
    url; og:description and og:url absent (nulls). Oracle reconstructs
    from the arithmetic."""
    from ..operators.links import og_meta

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    site = F.concat(
        F.lit("https://g"), (d % 5).cast("string"), F.lit(".example.net")
    )
    title_meta = F.when(
        d % 2 == 0,
        F.concat(
            F.lit('<meta property="og:title" content="Title  '),
            d.cast("string"),
            F.lit('">'),
        ),
    ).otherwise(
        F.concat(
            F.lit('<meta content="Title  '),
            d.cast("string"),
            F.lit('" property="og:title">'),
        )
    )
    html = F.concat(
        F.lit("<html><head>"),
        title_meta,
        F.when(
            d % 3 == 0,
            F.lit('<meta property="og:type" content="article">'),
        ).otherwise(F.lit("")),
        F.lit('<meta property="og:image" content="/img/'),
        d.cast("string"),
        F.lit('.png"><meta name="description" content="decoy">'
              "</head><body></body></html>"),
    )
    pages = docs.select(
        F.concat(site, F.lit("/a/"), d.cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return og_meta(pages)


ORACLE["og_meta"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://g' || (doc_id % 5) || '.example.net' AS site
  FROM documents)
SELECT site || '/a/' || i AS url,
       'Title ' || i AS og_title,
       CAST(NULL AS VARCHAR) AS og_description,
       CASE WHEN i % 3 = 0 THEN 'article' END AS og_type,
       site || '/img/' || i || '.png' AS og_image,
       CAST(NULL AS VARCHAR) AS og_url
FROM d
"""


def q_feed_discovery(spark: SparkSession, sf: str) -> DataFrame:
    """Feed autodiscovery (operators/feeds.page_feed_links) over
    synthesized HTML heads: even docs declare an RSS feed with a
    RELATIVE href and rel-before-type attribute order; odd docs an
    Atom feed with an absolute href and type-before-rel order; every
    head also carries two decoys (rel=stylesheet, rel=alternate
    type=text/html) that must not match, plus a COMMENTED-OUT feed
    link poison (a scan that reads comments would emit an extra row
    per page and mismatch the one-row-per-doc oracle). Oracle
    reconstructs the one row per doc from the parity arithmetic."""
    from ..operators.feeds import page_feed_links

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    site = F.concat(
        F.lit("https://f"), (d % 5).cast("string"), F.lit(".example.org")
    )
    feed_link = F.when(
        d % 2 == 0,
        F.concat(
            F.lit('<link rel="alternate" type="application/rss+xml" href="/f'),
            d.cast("string"),
            F.lit('.xml">'),
        ),
    ).otherwise(
        F.concat(
            F.lit('<link type="application/atom+xml" href="'),
            site,
            F.lit("/f"),
            d.cast("string"),
            F.lit('.atom" rel="alternate">'),
        )
    )
    html = F.concat(
        F.lit(
            '<html><head><link rel="stylesheet" href="/s.css">'
            '<!-- <link rel="alternate" type="application/rss+xml"'
            ' href="/poison.xml"> -->'
        ),
        feed_link,
        F.lit('<link rel="alternate" type="text/html" href="/en">'
              "</head><body></body></html>"),
    )
    pages = docs.select(
        F.concat(site, F.lit("/page/"), d.cast("string")).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return page_feed_links(pages)


ORACLE["feed_discovery"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://f' || (doc_id % 5) || '.example.org' AS site
  FROM documents)
SELECT site || '/page/' || i AS url,
       CASE WHEN i % 2 = 0 THEN site || '/f' || i || '.xml'
            ELSE site || '/f' || i || '.atom' END AS feed_url,
       CASE WHEN i % 2 = 0 THEN 'rss' ELSE 'atom' END AS feed_type
FROM d
"""


def q_image_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """Multimodal image-text pair candidates
    (operators/structured.image_candidates) over synthesized pages:
    each doc carries a lazy-load decoy (<img data-src=…> — no src, so
    no row, but it HOLDS slot 0 of img_idx), the real image at slot 1
    (attribute order AND quote style flip on doc parity; alt carries
    internal whitespace to collapse; src is ROOT-RELATIVE and must
    resolve against the page url; width/height only on doc_id%3==0),
    and a data:-URI tracking pixel at slot 2 (dropped by
    resolve_href); a COMMENTED-OUT img poison precedes everything — a
    scan that read comments would emit an extra pair row AND shift
    every img_idx, so the arithmetic oracle pins the comment strip.
    Oracle reconstructs the single surviving row per doc."""
    from ..operators.structured import image_candidates

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    site = F.concat(
        F.lit("https://m"), (d % 5).cast("string"), F.lit(".example.com")
    )
    ds = d.cast("string")
    real_img = F.when(
        d % 2 == 0,
        F.concat(
            F.lit('<img src="/i/'),
            ds,
            F.lit('.jpg" alt="Photo  '),
            ds,
            F.lit('"'),
            F.when(d % 3 == 0, F.lit(' width="640" height="480"')).otherwise(
                F.lit("")
            ),
            F.lit(">"),
        ),
    ).otherwise(
        F.concat(
            F.lit("<img alt='Photo  "),
            ds,
            F.lit("'"),
            F.when(d % 3 == 0, F.lit(" width='640' height='480'")).otherwise(
                F.lit("")
            ),
            F.lit(" src='/i/"),
            ds,
            F.lit(".jpg'>"),
        )
    )
    html = F.concat(
        F.lit(
            "<html><body>"
            '<!-- <img src="/poison.png" alt="commented-out"> -->'
            '<img data-src="/lazy.png" alt="decoy">'
        ),
        real_img,
        F.lit('<img src="data:image/gif;base64,R0lGOD" alt="pixel">'
              "</body></html>"),
    )
    pages = docs.select(
        F.concat(site, F.lit("/g/"), ds).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return image_candidates(pages)


ORACLE["image_candidates"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://m' || (doc_id % 5) || '.example.com' AS site
  FROM documents)
SELECT site || '/g/' || i AS url,
       1 AS img_idx,
       site || '/i/' || i || '.jpg' AS img_url,
       'Photo ' || i AS alt,
       CAST(NULL AS VARCHAR) AS title,
       CASE WHEN i % 3 = 0 THEN 640 END AS width,
       CASE WHEN i % 3 = 0 THEN 480 END AS height
FROM d
"""


def q_jsonld_article(spark: SparkSession, sf: str) -> DataFrame:
    """JSON-LD article metadata
    (operators/structured.jsonld_article_meta) over synthesized heads:
    docs with doc_id%3==0 lead with a BreadcrumbList decoy block (the
    article filter must skip it), every head carries a
    text/javascript decoy script; even docs declare a NewsArticle
    (double-quoted type attr, object-form author, datePublished set),
    odd docs a BlogPosting (single-quoted type attr, STRING-form
    author, dateModified instead). Headlines carry internal
    whitespace to collapse. Oracle reconstructs from the parity
    arithmetic."""
    from ..operators.structured import jsonld_article_meta

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    site = F.concat(
        F.lit("https://n"), (d % 5).cast("string"), F.lit(".example.org")
    )
    author = F.concat(F.lit("Writer "), (d % 7).cast("string"))
    day = ((d % 20) + 10).cast("string")
    art = F.when(
        d % 2 == 0,
        F.concat(
            F.lit('<script type="application/ld+json">'
                  '{"@type":"NewsArticle","headline":"Story  '),
            ds,
            F.lit('","datePublished":"2024-01-'),
            day,
            F.lit('","author":{"name":"'),
            author,
            F.lit('"}}</script>'),
        ),
    ).otherwise(
        F.concat(
            F.lit("<script type='application/ld+json'>"
                  '{"@type":"BlogPosting","headline":"Post  '),
            ds,
            F.lit('","dateModified":"2023-12-01","author":"'),
            author,
            F.lit('"}</script>'),
        )
    )
    html = F.concat(
        F.lit("<html><head>"),
        F.when(
            d % 3 == 0,
            F.lit('<script type="application/ld+json">'
                  '{"@type":"BreadcrumbList","itemListElement":[]}'
                  "</script>"),
        ).otherwise(F.lit("")),
        art,
        F.lit('<script type="text/javascript">var x=1;</script>'
              "</head><body></body></html>"),
    )
    pages = docs.select(
        F.concat(site, F.lit("/art/"), ds).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return jsonld_article_meta(pages)


ORACLE["jsonld_article"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://n' || (doc_id % 5) || '.example.org' AS site
  FROM documents)
SELECT site || '/art/' || i AS url,
       CASE WHEN i % 2 = 0 THEN 'NewsArticle' ELSE 'BlogPosting' END
         AS ld_type,
       CASE WHEN i % 2 = 0 THEN 'Story ' || i ELSE 'Post ' || i END
         AS headline,
       CAST(NULL AS VARCHAR) AS description,
       CASE WHEN i % 2 = 0 THEN '2024-01-' || ((i % 20) + 10) END
         AS date_published,
       CASE WHEN i % 2 = 1 THEN '2023-12-01' END AS date_modified,
       'Writer ' || (i % 7) AS author
FROM d
"""


def q_html_tables(spark: SparkSession, sf: str) -> DataFrame:
    """Table-grid extraction (operators/structured.html_tables) over
    synthesized pages: every doc carries one attribute-bearing
    2-column table (header <th> row + a data row whose cells carry a
    nested <b> tag, an &amp; entity, and padding whitespace); docs
    with doc_id%4==0 carry a second bare single-cell table (table_idx
    must advance). Oracle reconstructs every (table, row, cells) row
    from the arithmetic."""
    from ..operators.structured import html_tables

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    site = F.concat(
        F.lit("https://t"), (d % 5).cast("string"), F.lit(".example.io")
    )
    html = F.concat(
        F.lit('<html><body><table class="data"><tr><th>k</th><th>v</th></tr>'
              "<tr><td>name &amp; <b>"),
        ds,
        F.lit("</b></td><td> "),
        (d * 7).cast("string"),
        F.lit(" </td></tr></table>"),
        F.when(
            d % 4 == 0,
            F.concat(F.lit("<table><tr><td>only "), ds, F.lit("</td></tr></table>")),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = docs.select(
        F.concat(site, F.lit("/tbl/"), ds).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return html_tables(pages)


ORACLE["html_tables"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://t' || (doc_id % 5) || '.example.io' AS site
  FROM documents),
rows AS (
  SELECT site || '/tbl/' || i AS url, 0 AS table_idx, 0 AS row_idx,
         ['k', 'v'] AS cells, 2 AS n_cells FROM d
  UNION ALL
  SELECT site || '/tbl/' || i, 0, 1,
         ['name & ' || i, CAST(i * 7 AS VARCHAR)], 2 FROM d
  UNION ALL
  SELECT site || '/tbl/' || i, 1, 0, ['only ' || i], 1
  FROM d WHERE i % 4 = 0)
SELECT * FROM rows
"""


def q_page_dates(spark: SparkSession, sf: str) -> DataFrame:
    """Publish-date (freshness) extraction
    (operators/structured.page_dates) over synthesized pages — four
    doc classes, one per carrier, each with a lower-priority decoy
    that must LOSE: doc_id%4==0 JSON-LD datePublished beats an
    OpenGraph decoy; %4==1 OpenGraph full-ISO timestamp (truncates to
    date) beats an UNPARSEABLE <time> (falls through, not masks);
    %4==2 <time datetime> with quote style flipping on doc_id%8;
    %4==3 the /YYYY/MM/DD/ permalink path. Oracle reconstructs date,
    winning raw string, and source label from the arithmetic."""
    from ..operators.structured import page_dates

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    site = F.concat(
        F.lit("https://d"), (d % 5).cast("string"), F.lit(".example.net")
    )
    day19 = ((d % 19) + 10).cast("string")  # 10..28
    day9 = ((d % 9) + 1).cast("string")  # 1..9 (zero-padded below)
    url = F.when(
        d % 4 == 3,
        F.concat(site, F.lit("/2021/06/"), day19, F.lit("/post-"), ds),
    ).otherwise(F.concat(site, F.lit("/p/"), ds))
    time_tag = F.when(
        d % 8 == 2,
        F.concat(F.lit('<time datetime="2022-11-'), day19, F.lit('">x</time>')),
    ).otherwise(
        F.concat(F.lit("<time datetime='2022-11-"), day19, F.lit("'>x</time>"))
    )
    html = (
        F.when(
            d % 4 == 0,
            F.concat(
                F.lit('<script type="application/ld+json">'
                      '{"@type":"Article","datePublished":"2024-02-'),
                day19,
                F.lit('"}</script>'
                      '<meta property="article:published_time" '
                      'content="2020-01-01">'),
            ),
        )
        .when(
            d % 4 == 1,
            F.concat(
                F.lit('<meta property="article:published_time" '
                      'content="2023-07-0'),
                day9,
                F.lit('T08:00:00Z">'
                      '<time datetime="coming soon">x</time>'),
            ),
        )
        .when(d % 4 == 2, time_tag)
        .otherwise(F.lit("<p>dateless markup</p>"))
    )
    pages = docs.select(
        url.alias("url"), F.encode(html, "UTF-8").alias("html")
    )
    return page_dates(pages)


ORACLE["page_dates"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://d' || (doc_id % 5) || '.example.net' AS site,
         CAST((doc_id % 19) + 10 AS VARCHAR) AS day19,
         CAST((doc_id % 9) + 1 AS VARCHAR) AS day9
  FROM documents)
SELECT CASE WHEN i % 4 = 3
            THEN site || '/2021/06/' || day19 || '/post-' || i
            ELSE site || '/p/' || i END AS url,
       CASE i % 4
         WHEN 0 THEN CAST('2024-02-' || day19 AS DATE)
         WHEN 1 THEN CAST('2023-07-0' || day9 AS DATE)
         WHEN 2 THEN CAST('2022-11-' || day19 AS DATE)
         ELSE CAST('2021-06-' || day19 AS DATE) END AS published_date,
       CASE i % 4
         WHEN 0 THEN '2024-02-' || day19
         WHEN 1 THEN '2023-07-0' || day9 || 'T08:00:00Z'
         WHEN 2 THEN '2022-11-' || day19
         ELSE '2021-06-' || day19 END AS date_raw,
       CASE i % 4
         WHEN 0 THEN 'jsonld'
         WHEN 1 THEN 'og'
         WHEN 2 THEN 'time'
         ELSE 'url' END AS date_source
FROM d
"""


def q_av_candidates(spark: SparkSession, sf: str) -> DataFrame:
    """Audio/video candidate extraction
    (operators/structured.av_candidates) over synthesized pages in
    three classes: doc_id%3==0 the common wrapped form — a src-less
    <video poster=…> whose poster must survive as its own row while
    the <source> child contributes the media row (mime from type);
    %3==1 a single-quoted <audio src title> (caption whitespace to
    collapse); %3==2 a data:-URI video decoy (drops) next to a bare
    <audio src>. Oracle reconstructs every row from the arithmetic."""
    from ..operators.structured import av_candidates

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    site = F.concat(
        F.lit("https://v"), (d % 5).cast("string"), F.lit(".example.tv")
    )
    html = (
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit('<video poster="/c/'),
                ds,
                F.lit('.jpg"><source src="/m/'),
                ds,
                F.lit('.mp4" type="video/mp4"></video>'),
            ),
        )
        .when(
            d % 3 == 1,
            F.concat(
                F.lit("<audio src='/m/"),
                ds,
                F.lit(".mp3' title='Clip  "),
                ds,
                F.lit("'></audio>"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit('<video src="data:video/mp4;base64,AAAA"></video>'
                      '<audio src="/m/'),
                ds,
                F.lit('.ogg"></audio>'),
            )
        )
    )
    pages = docs.select(
        F.concat(site, F.lit("/w/"), ds).alias("url"),
        F.encode(
            F.concat(F.lit("<html><body>"), html, F.lit("</body></html>")),
            "UTF-8",
        ).alias("html"),
    )
    return av_candidates(pages)


ORACLE["av_candidates"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://v' || (doc_id % 5) || '.example.tv' AS site
  FROM documents),
rows AS (
  SELECT site || '/w/' || i AS url, 0 AS media_idx, 'video' AS kind,
         CAST(NULL AS VARCHAR) AS media_url, CAST(NULL AS VARCHAR) AS mime,
         site || '/c/' || i || '.jpg' AS poster_url,
         CAST(NULL AS VARCHAR) AS caption
  FROM d WHERE i % 3 = 0
  UNION ALL
  SELECT site || '/w/' || i, 1, 'source',
         site || '/m/' || i || '.mp4', 'video/mp4', NULL, NULL
  FROM d WHERE i % 3 = 0
  UNION ALL
  SELECT site || '/w/' || i, 0, 'audio',
         site || '/m/' || i || '.mp3', NULL, NULL, 'Clip ' || i
  FROM d WHERE i % 3 = 1
  UNION ALL
  SELECT site || '/w/' || i, 1, 'audio',
         site || '/m/' || i || '.ogg', NULL, NULL, NULL
  FROM d WHERE i % 3 = 2)
SELECT * FROM rows
"""


def q_page_lang_declared(spark: SparkSession, sf: str) -> DataFrame:
    """Declared-language extraction
    (operators/structured.page_lang_declared) over synthesized pages:
    doc_id%4==0 a BCP-47 <html lang="en-US"> (region must strip);
    %4==1 a bare <html> (no match) plus og:locale de_DE with
    attribute order flipping on doc_id%8 (underscore subtag form);
    %4==2 a multi-value Content-Language http-equiv 'zh-CN, en'
    (first tag wins) with attribute order flipping on doc_id%8;
    %4==3 nothing declared (all null). Oracle reconstructs from the
    arithmetic."""
    from ..operators.structured import page_lang_declared

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    site = F.concat(
        F.lit("https://l"), (d % 5).cast("string"), F.lit(".example.net")
    )
    og = F.when(
        d % 8 < 4,
        F.lit('<meta property="og:locale" content="de_DE">'),
    ).otherwise(F.lit('<meta content="de_DE" property="og:locale">'))
    cl = F.when(
        d % 8 < 4,
        F.lit('<meta http-equiv="Content-Language" content="zh-CN, en">'),
    ).otherwise(
        F.lit('<meta content="zh-CN, en" http-equiv="content-language">')
    )
    html = (
        F.when(d % 4 == 0, F.lit('<html lang="en-US"><body>x</body></html>'))
        .when(d % 4 == 1, F.concat(F.lit("<html><head>"), og, F.lit("</head></html>")))
        .when(d % 4 == 2, F.concat(F.lit("<html><head>"), cl, F.lit("</head></html>")))
        .otherwise(F.lit("<html><body>undeclared</body></html>"))
    )
    pages = docs.select(
        F.concat(site, F.lit("/pg/"), ds).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return page_lang_declared(pages)


ORACLE["page_lang_declared"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://l' || (doc_id % 5) || '.example.net' AS site
  FROM documents)
SELECT site || '/pg/' || i AS url,
       CASE WHEN i % 4 = 0 THEN 'en-US' END AS html_lang,
       CASE WHEN i % 4 = 1 THEN 'de_DE' END AS og_locale,
       CASE WHEN i % 4 = 2 THEN 'zh-CN, en' END AS content_language,
       CASE i % 4 WHEN 0 THEN 'en' WHEN 1 THEN 'de' WHEN 2 THEN 'zh' END
         AS lang_declared
FROM d
"""


def q_microdata_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Microdata name/value extraction
    (operators/structured.microdata_meta) over synthesized pages:
    every head leads with a non-itemprop viewport decoy (meta_idx 0,
    no row — but it HOLDS its slot), slot 1 is datePublished with
    attribute order AND quote style flipping on doc parity, slot 2 is
    an itemprop with EMPTY content (no row, holds its slot), and
    doc_id%3==0 adds a price at slot 3 whose content carries internal
    whitespace to collapse. Oracle reconstructs from the arithmetic."""
    from ..operators.structured import microdata_meta

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    site = F.concat(
        F.lit("https://md"), (d % 5).cast("string"), F.lit(".example.com")
    )
    day = ((d % 20) + 10).cast("string")
    date_tag = F.when(
        d % 2 == 0,
        F.concat(
            F.lit('<meta itemprop="datePublished" content="2024-02-'),
            day,
            F.lit('">'),
        ),
    ).otherwise(
        F.concat(
            F.lit("<meta content='2024-02-"),
            day,
            F.lit("' itemprop='datePublished'>"),
        )
    )
    html = F.concat(
        F.lit('<html><head><meta name="viewport" content="width=device-width">'),
        date_tag,
        F.lit('<meta itemprop="sku" content="">'),
        F.when(
            d % 3 == 0,
            F.lit('<meta itemprop="price" content=" 19.99  USD ">'),
        ).otherwise(F.lit("")),
        F.lit("</head><body></body></html>"),
    )
    pages = docs.select(
        F.concat(site, F.lit("/p/"), ds).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return microdata_meta(pages)


ORACLE["microdata_meta"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://md' || (doc_id % 5) || '.example.com/p/' || doc_id AS url
  FROM documents)
SELECT url, 1 AS meta_idx, 'datePublished' AS itemprop,
       '2024-02-' || ((i % 20) + 10) AS content
FROM d
UNION ALL
SELECT url, 3 AS meta_idx, 'price' AS itemprop, '19.99 USD' AS content
FROM d WHERE i % 3 = 0
"""


def q_microdata_types(spark: SparkSession, sf: str) -> DataFrame:
    """Microdata item-type extraction
    (operators/structured.microdata_types) over synthesized pages:
    every body carries a data-itemtype decoy (the [\\s"'/] left bound
    must reject it); even docs declare Product then a single-quoted
    http-scheme Offer (document order across quote styles must hold),
    odd docs a NewsArticle; doc_id%3==0 appends a Thing whose value
    has surrounding whitespace AND a trailing slash (trim + md_type
    segment extraction). Oracle reconstructs from the arithmetic."""
    from ..operators.structured import microdata_types

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    site = F.concat(
        F.lit("https://mt"), (d % 5).cast("string"), F.lit(".example.org")
    )
    items = F.when(
        d % 2 == 0,
        F.lit(
            '<div itemscope itemtype="https://schema.org/Product">'
            "<span itemscope itemtype='http://schema.org/Offer'>x</span>"
            "</div>"
        ),
    ).otherwise(
        F.lit('<article itemscope itemtype="https://schema.org/NewsArticle">y</article>')
    )
    html = F.concat(
        F.lit('<html><body data-itemtype="https://schema.org/Fake">'),
        items,
        F.when(
            d % 3 == 0,
            F.lit('<div itemscope itemtype=" https://schema.org/Thing/ ">z</div>'),
        ).otherwise(F.lit("")),
        F.lit("</body></html>"),
    )
    pages = docs.select(
        F.concat(site, F.lit("/t/"), ds).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return microdata_types(pages)


ORACLE["microdata_types"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://mt' || (doc_id % 5) || '.example.org/t/' || doc_id AS url
  FROM documents)
SELECT url, 0 AS item_idx,
       CASE WHEN i % 2 = 0 THEN 'https://schema.org/Product'
            ELSE 'https://schema.org/NewsArticle' END AS itemtype,
       CASE WHEN i % 2 = 0 THEN 'Product' ELSE 'NewsArticle' END AS md_type
FROM d
UNION ALL
SELECT url, 1 AS item_idx, 'http://schema.org/Offer' AS itemtype,
       'Offer' AS md_type
FROM d WHERE i % 2 = 0
UNION ALL
SELECT url, CASE WHEN i % 2 = 0 THEN 2 ELSE 1 END AS item_idx,
       'https://schema.org/Thing/' AS itemtype, 'Thing' AS md_type
FROM d WHERE i % 3 = 0
"""


def q_hreflang_alternates(spark: SparkSession, sf: str) -> DataFrame:
    """Declared-translation extraction
    (operators/multilingual.hreflang_alternates) over synthesized
    heads: every page declares a SELF row (root-relative href — must
    resolve), one translation whose hreflang is UPPERCASE on odd docs
    (must lowercase) with attribute order/quote style flipping, and an
    x-default; a stylesheet link, a rel=alternate FEED link (no
    hreflang), and a COMMENTED-OUT hreflang alternate poison (a scan
    that read comments would emit an extra row per page) are decoys.
    Oracle reconstructs from the arithmetic."""
    from ..operators.multilingual import hreflang_alternates

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    ds = d.cast("string")
    site = F.concat(
        F.lit("https://hl"), (d % 5).cast("string"), F.lit(".example.com")
    )
    trans = F.when(
        d % 2 == 0,
        F.concat(
            F.lit('<link rel="alternate" hreflang="fr" href="/fr/'),
            ds,
            F.lit('">'),
        ),
    ).otherwise(
        F.concat(
            F.lit("<link href='/de/"),
            ds,
            F.lit("' hreflang='DE' rel='alternate'>"),
        )
    )
    html = F.concat(
        F.lit('<html><head><link rel="stylesheet" href="/s.css">'),
        F.lit('<link rel="alternate" type="application/rss+xml" href="/feed">'),
        F.lit(
            '<!-- <link rel="alternate" hreflang="zz" href="/zz/x"> -->'
        ),
        F.lit('<link rel="alternate" hreflang="en" href="/en/'),
        ds,
        F.lit('">'),
        trans,
        F.lit('<link rel="alternate" hreflang="x-default" href="/en/'),
        ds,
        F.lit('"></head><body></body></html>'),
    )
    pages = docs.select(
        F.concat(site, F.lit("/en/"), ds).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return hreflang_alternates(pages)


ORACLE["hreflang_alternates"] = """
WITH d AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         'https://hl' || (doc_id % 5) || '.example.com' AS site
  FROM documents)
SELECT site || '/en/' || i AS url, 'en' AS hreflang,
       site || '/en/' || i AS alt_url, FALSE AS is_default
FROM d
UNION ALL
SELECT site || '/en/' || i,
       CASE WHEN i % 2 = 0 THEN 'fr' ELSE 'de' END,
       site || CASE WHEN i % 2 = 0 THEN '/fr/' ELSE '/de/' END || i,
       FALSE
FROM d
UNION ALL
SELECT site || '/en/' || i, 'x-default', site || '/en/' || i, TRUE
FROM d
"""


def q_parallel_pages(spark: SparkSession, sf: str) -> DataFrame:
    """Cross-language pair mining
    (operators/multilingual.parallel_page_candidates, mutual=True)
    over synthesized page triples keyed on k = doc_id // 3: class 0 =
    the English page declaring fr (mutual), es (one-sided — the es
    page declares nothing back) and de (never crawled — the existence
    gate); class 1 = the French page declaring en back; class 2 = the
    Spanish page with an EMPTY head. Only the en↔fr pair must
    survive, once per complete (3k, 3k+1) doc pair, labels read from
    the opposite side's markup. Oracle reconstructs from the
    arithmetic."""
    from ..operators.multilingual import parallel_page_candidates

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    k = F.floor(d / 3).cast("long")
    ks = k.cast("string")
    site = F.concat(
        F.lit("https://pl"), (k % 7).cast("string"), F.lit(".example.com")
    )
    cls = d % 3
    head_en = F.concat(
        F.lit('<link rel="alternate" hreflang="en" href="/en/'),
        ks,
        F.lit('"><link rel="alternate" hreflang="fr" href="/fr/'),
        ks,
        F.lit('"><link rel="alternate" hreflang="es" href="/es/'),
        ks,
        F.lit('"><link rel="alternate" hreflang="de" href="/de/'),
        ks,
        F.lit('">'),
    )
    head_fr = F.concat(
        F.lit("<link hreflang='en' rel='alternate' href='/en/"),
        ks,
        F.lit("'><link rel='alternate' hreflang='fr' href='/fr/"),
        ks,
        F.lit("'>"),
    )
    head = (
        F.when(cls == 0, head_en)
        .when(cls == 1, head_fr)
        .otherwise(F.lit(""))
    )
    path = (
        F.when(cls == 0, F.lit("/en/"))
        .when(cls == 1, F.lit("/fr/"))
        .otherwise(F.lit("/es/"))
    )
    html = F.concat(
        F.lit("<html><head>"), head, F.lit("</head><body>x</body></html>")
    )
    pages = docs.select(
        F.concat(site, path, ks).alias("url"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return parallel_page_candidates(pages)


ORACLE["parallel_pages"] = """
WITH t AS (
  SELECT CAST(a.doc_id // 3 AS BIGINT) AS k
  FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
  WHERE a.doc_id % 3 = 0)
SELECT 'https://pl' || (k % 7) || '.example.com/en/' || k AS url_a,
       'en' AS lang_a,
       'https://pl' || (k % 7) || '.example.com/fr/' || k AS url_b,
       'fr' AS lang_b
FROM t
"""


def _pagination_pages(spark: SparkSession, sf: str) -> DataFrame:
    """Shared fixture for the pagination queries: docs pack into
    groups of 4 keyed on k = doc_id // 4; a group's chain length is
    L = 2 + k%3, so members with j = doc_id%4 < L are the chain's
    pages p0..p{L-1} and the rest are solo pages in a DISJOINT url
    namespace. EVERY chain page declares rel=next to p{j+1} — for the
    last page that target does not exist, exercising the existence
    gate; odd pages additionally declare rel=prev ('previous'
    spelling on j=3), exercising carrier dedup. POISON plants pin the
    scan-region hygiene against the arithmetic oracle: every chain
    page's head carries a COMMENTED-OUT <link rel=next> to the
    chain's own head (a scan that reads comments would pick it first
    and corrupt every chain), and every solo page's BODY carries a
    <link rel=prev> into an existing chain (a scan that reads past
    <body> would stitch solos into chains) — the oracle's output is
    computed ignoring both, so any regression mismatches."""
    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    i_s = d.cast("string")
    k = F.floor(d / 4).cast("long")
    j = (d % 4).cast("long")
    L = (k % 3) + 2
    ks = k.cast("string")
    js = j.cast("string")
    site = F.concat(
        F.lit("https://pg"), (k % 7).cast("string"), F.lit(".example.com")
    )
    nxt = F.concat(
        F.lit('<link rel="next" href="/a/'),
        ks,
        F.lit("/p"),
        (j + 1).cast("string"),
        F.lit('">'),
    )
    prv = (
        F.when(
            j == 1,
            F.concat(
                F.lit("<link href='/a/"),
                ks,
                F.lit("/p0' rel='prev'>"),
            ),
        )
        .when(
            j == 3,
            F.concat(
                F.lit('<link rel="previous" href="/a/'),
                ks,
                F.lit('/p2">'),
            ),
        )
        .otherwise(F.lit(""))
    )
    poison_comment = F.concat(
        F.lit('<!-- <link rel="next" href="/a/'), ks, F.lit('/p0"> -->')
    )
    poison_body = F.concat(
        F.lit('s<link rel="prev" href="/a/'), ks, F.lit('/p0">')
    )
    html = F.when(
        j < L,
        F.concat(
            F.lit("<html><head>"),
            poison_comment,
            nxt,
            prv,
            F.lit("</head><body>b</body></html>"),
        ),
    ).otherwise(
        F.concat(
            F.lit("<html><head></head><body>"),
            poison_body,
            F.lit("</body></html>"),
        )
    )
    url = F.when(
        j < L, F.concat(site, F.lit("/a/"), ks, F.lit("/p"), js)
    ).otherwise(F.concat(site, F.lit("/solo/"), i_s))
    text = F.when(
        j < L,
        F.concat(F.lit("Part "), js, F.lit(" of article "), ks),
    ).otherwise(F.concat(F.lit("solo "), i_s))
    return docs.select(
        url.alias("url"),
        F.encode(html, "UTF-8").alias("html"),
        text.alias("text"),
    )


def q_pagination_chains(spark: SparkSession, sf: str) -> DataFrame:
    """Pagination list-ranking (operators/pagination.paginate_chains)
    over the shared fixture: variable-length chains (2/3/4 pages by
    k%3), dangling last-page next targets (existence gate), dual
    next/prev carriers (dedup), solo pages absent from the output.
    Oracle reconstructs (url, chain head, position) from the
    arithmetic — the trailing truncated group is guarded by requiring
    the group's SECOND member to exist, matching the operator's
    participants-only semantics."""
    from ..operators.pagination import paginate_chains

    return paginate_chains(_pagination_pages(spark, sf))


ORACLE["pagination_chains"] = """
WITH x AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         CAST(doc_id // 4 AS BIGINT) AS k,
         CAST(doc_id % 4 AS BIGINT) AS j
  FROM documents),
m AS (SELECT MAX(i) AS mx FROM x)
SELECT 'https://pg' || (k % 7) || '.example.com/a/' || k || '/p' || j AS url,
       'https://pg' || (k % 7) || '.example.com/a/' || k || '/p0' AS chain_id,
       j AS seq
FROM x, m
WHERE j < 2 + (k % 3) AND 4 * k + 1 <= mx
"""


def q_stitch_pages(spark: SparkSession, sf: str) -> DataFrame:
    """Multi-page article reassembly
    (operators/pagination.stitch_paginated) over the shared fixture:
    each resolved chain's page texts joined in reading order. Oracle
    = ordered string_agg over the same arithmetic."""
    from ..operators.pagination import stitch_paginated

    return stitch_paginated(_pagination_pages(spark, sf))


ORACLE["stitch_pages"] = """
WITH x AS (
  SELECT CAST(doc_id AS BIGINT) AS i,
         CAST(doc_id // 4 AS BIGINT) AS k,
         CAST(doc_id % 4 AS BIGINT) AS j
  FROM documents),
m AS (SELECT MAX(i) AS mx FROM x)
SELECT 'https://pg' || (k % 7) || '.example.com/a/' || k || '/p0' AS chain_id,
       COUNT(*) AS n_pages,
       string_agg('Part ' || j || ' of article ' || k, chr(10) || chr(10)
                  ORDER BY j) AS text
FROM x, m
WHERE j < 2 + (k % 3) AND 4 * k + 1 <= mx
GROUP BY k
"""


# ------------------------------------------- soft URL quality scoring
def q_url_quality(spark: SparkSession, sf: str) -> DataFrame:
    """RefinedWeb-style SOFT url scoring (operators/urlqual): lexical
    url features + weighted substring keyword score, all codegen.
    documents carry no url column, so urls are synthesized
    deterministically from (doc_id, source) planting every feature:
    IP-literal hosts (%7), hyphen/digit-stuffed hosts (%5), penalized
    words in the path (%13), %-encoding (%11), query params (%3)."""
    from ..operators.urlqual import url_feature_cols

    docs = load(spark, sf, "documents")
    host = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(F.lit("10.0."), (F.col("doc_id") % 200), F.lit(".99")),
    ).otherwise(
        F.concat(
            F.col("source"),
            F.when(F.col("doc_id") % 5 == 0, F.lit("-mega-sale-24-7")).otherwise(
                F.lit("")
            ),
            F.lit(".example.com"),
        )
    )
    url = F.concat(
        F.when(F.col("doc_id") % 2 == 0, F.lit("https://")).otherwise(
            F.lit("http://")
        ),
        host,
        F.lit("/p/"),
        F.col("doc_id"),
        F.when(F.col("doc_id") % 13 == 0, F.lit("/free-xxx-poker")).otherwise(
            F.lit("")
        ),
        F.when(F.col("doc_id") % 11 == 0, F.lit("/f%20o%2fo")).otherwise(
            F.lit("")
        ),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit("?a=1&b=2&c="), F.col("doc_id")),
        ).otherwise(F.lit("")),
    )
    pages = docs.select("doc_id", url.alias("url"))
    return pages.select("doc_id", "url", *url_feature_cols(F.col("url")))


# SQL count-matches convention: length diff of replace-with-x vs
# replace-with-nothing (same trick as the Spark side). Every computed
# numeric is CAST AS DOUBLE/INTEGER explicitly — DuckDB's decimal
# literal arithmetic would otherwise surface DECIMAL, the classic
# dtype trap.
ORACLE["url_quality"] = r"""
WITH p AS (
  SELECT doc_id,
    (CASE WHEN doc_id % 2 = 0 THEN 'https://' ELSE 'http://' END)
    || (CASE WHEN doc_id % 7 = 0
             THEN '10.0.' || (doc_id % 200) || '.99'
             ELSE source
                  || (CASE WHEN doc_id % 5 = 0 THEN '-mega-sale-24-7'
                           ELSE '' END)
                  || '.example.com' END)
    || '/p/' || doc_id
    || (CASE WHEN doc_id % 13 = 0 THEN '/free-xxx-poker' ELSE '' END)
    || (CASE WHEN doc_id % 11 = 0 THEN '/f%20o%2fo' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0 THEN '?a=1&b=2&c=' || doc_id ELSE '' END)
      AS url
  FROM documents
), f AS (
  SELECT doc_id, url, lower(trim(url)) AS u,
    regexp_replace(regexp_extract(lower(trim(url)),
      '^(?:[a-z][a-z0-9+.-]*://|//)?(?:[^@/?#]*@)?(\[[^\]]*\]|[^:/?#]+)', 1),
      '^www\.', '') AS chost
  FROM p
), g AS (
  SELECT doc_id, url, u, chost,
    CAST(length(u) AS INTEGER) AS url_len,
    round((length(chost) - length(regexp_replace(chost, '[0-9]', '', 'g')))
          / CAST(greatest(length(chost), 1) AS DOUBLE), 4) AS host_digit_frac,
    CAST(length(chost) - length(regexp_replace(chost, '-', '', 'g'))
         AS INTEGER) AS host_hyphens,
    regexp_extract(u,
      '^(?:[a-z][a-z0-9+.-]*:)?(?://)?(?:[^@/?#]*@)?[^/?#]*([^?#]*)', 1)
      AS path,
    regexp_extract(u, '\?([^#]*)', 1) AS q,
    CAST((length(u) - length(regexp_replace(u, '%[0-9a-f]{2}', 'x', 'g'))) / 2
         AS INTEGER) AS pct_encoded,
    regexp_matches(chost,
      '^[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}$') AS is_ip_host,
    CAST(round(
            (CASE WHEN contains(u, 'porn') THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'xxx') THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'escort') THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'viagra') THEN 1.0 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'casino') THEN 0.8 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'erotic') THEN 0.8 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'gambl') THEN 0.6 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'poker') THEN 0.6 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'lingerie') THEN 0.5 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'webcam') THEN 0.4 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'torrent') THEN 0.4 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'adult') THEN 0.4 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'dating') THEN 0.3 ELSE 0.0 END)
          + (CASE WHEN contains(u, 'sex') THEN 0.25 ELSE 0.0 END), 4)
      AS DOUBLE) AS soft_word_score
  FROM f
), h AS (
  SELECT *,
    CAST(length(path) - length(regexp_replace(path, '/', '', 'g'))
         AS INTEGER) AS path_depth,
    CAST(CASE WHEN q = '' THEN 0
         ELSE length(q) - length(regexp_replace(q, '&', '', 'g')) + 1 END
         AS INTEGER) AS n_params
  FROM g
)
SELECT doc_id, url, url_len, chost AS host, host_digit_frac, host_hyphens,
       path_depth, n_params, pct_encoded, is_ip_host, soft_word_score,
       CAST(round(
               least(soft_word_score, 1.0) * 1.0
             + (CASE WHEN is_ip_host THEN 1.0 ELSE 0.0 END) * 0.5
             + least(host_digit_frac * 3.0, 1.0) * 0.5
             + least(host_hyphens / 4.0, 1.0) * 0.3
             + least(n_params / 6.0, 1.0) * 0.3
             + least(pct_encoded / 5.0, 1.0) * 0.2
             + (CASE WHEN url_len > 200 THEN 0.2 ELSE 0.0 END), 4)
         AS DOUBLE) AS url_score
FROM h
"""


# --------------------------------------------------- code-content signal
def q_code_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Code-vs-prose signal (operators/codesig): indented-line /
    fenced-block / code-punctuation / keyword densities as pure
    codegen counts. The fixture documents are single-line prose (every
    codesig feature is 0 on them — a vacuous oracle, review r05), so
    code constructs are synthesized deterministically from doc_id
    residues, planting every feature: keywords + CRLF + space-indent
    (%2), a fenced block with bracket/semicolon punctuation (%3), bare
    CR + tab-indent + braces (%5), and the exotic Java-only line
    terminators NEL/LS/PS around indented lines (%7) — so the oracle
    exercises the full line-normalization + counting logic."""
    from ..operators.codesig import code_stats

    docs = load(spark, sf, "documents")
    d = F.col("doc_id")
    synth = F.concat(
        F.col("text"),
        F.when(
            d % 2 == 0, F.lit("\ndef f(a, b):\r\n    return a + b\n")
        ).otherwise(F.lit("")),
        F.when(
            d % 3 == 0, F.lit("\n```\nx = [1, 2];\n```\n")
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 0,
            F.lit("\r\tstatic void main() { printf(s); }\r"),
        ).otherwise(F.lit("")),
        F.when(
            d % 7 == 0,
            F.lit("\u2028    import x after LS\u2029mid\u0085last"),
        ).otherwise(F.lit("")),
    )
    return code_stats(docs.select("doc_id", synth.alias("text")))


ORACLE["code_stats"] = r"""
WITH p AS (
  SELECT doc_id, text
    || (CASE WHEN doc_id % 2 = 0
        THEN e'\ndef f(a, b):\r\n    return a + b\n' ELSE '' END)
    || (CASE WHEN doc_id % 3 = 0
        THEN e'\n```\nx = [1, 2];\n```\n' ELSE '' END)
    || (CASE WHEN doc_id % 5 = 0
        THEN e'\r\tstatic void main() { printf(s); }\r' ELSE '' END)
    || (CASE WHEN doc_id % 7 = 0
        THEN chr(8232) || '    import x after LS' || chr(8233)
             || 'mid' || chr(133) || 'last'
        ELSE '' END)
    AS text
  FROM documents
), t0 AS (
  SELECT doc_id,
    regexp_replace(text, '\r\n|[\r\x{85}\x{2028}\x{2029}]', chr(10), 'g') AS t
  FROM p
), c AS (
  SELECT doc_id, t,
    greatest(length(t), 1) AS n_chars,
    greatest(length(regexp_replace(t, '[^ \t\n]+', 'x', 'g'))
             - length(regexp_replace(t, '[^ \t\n]+', '', 'g')), 1) AS n_words,
    CAST(length(regexp_replace(t, '(?m)^(?:\t|    )[ \t]*[^ \t\n][^\n]*',
                               'x', 'g'))
         - length(regexp_replace(t, '(?m)^(?:\t|    )[ \t]*[^ \t\n][^\n]*',
                                  '', 'g')) AS INTEGER) AS n_code_lines,
    greatest(length(regexp_replace(t, '(?m)^[^\n]*[^ \t\n][^\n]*', 'x', 'g'))
             - length(regexp_replace(t, '(?m)^[^\n]*[^ \t\n][^\n]*', '', 'g')),
             1) AS n_text_lines,
    CAST(floor((length(regexp_replace(t, '```', 'x', 'g'))
                - length(regexp_replace(t, '```', '', 'g'))) / 2)
         AS INTEGER) AS n_fenced_blocks,
    length(regexp_replace(t, '[{}\[\]();=<>]', 'x', 'g'))
      - length(regexp_replace(t, '[{}\[\]();=<>]', '', 'g')) AS n_punct,
    CAST(length(regexp_replace(lower(t),
        '\b(?:def|return|import|include|function|public|static|void|struct|class|const|elif|lambda|printf|endif|typedef|nullptr|println)\b',
        'x', 'g'))
      - length(regexp_replace(lower(t),
        '\b(?:def|return|import|include|function|public|static|void|struct|class|const|elif|lambda|printf|endif|typedef|nullptr|println)\b',
        '', 'g')) AS INTEGER) AS kw_hits
  FROM t0
), r AS (
  SELECT doc_id, n_code_lines,
    CAST(n_text_lines AS INTEGER) AS n_text_lines,
    round(n_code_lines / CAST(n_text_lines AS DOUBLE), 4) AS indent_frac,
    n_fenced_blocks,
    round(n_punct / CAST(n_chars AS DOUBLE), 4) AS code_punct_frac,
    kw_hits,
    round(kw_hits / CAST(n_words AS DOUBLE), 4) AS kw_density
  FROM c
)
SELECT doc_id, n_code_lines, n_text_lines, indent_frac, n_fenced_blocks,
       code_punct_frac, kw_hits, kw_density,
       -- exact integer 1/10000 units, single double division, no final
       -- round (engine round() divergence near ties; see codesig.py)
       (least(CAST(round(indent_frac * 10000) AS BIGINT) * 3, 10000)
        + least(CAST(round(code_punct_frac * 10000) AS BIGINT) * 12, 10000)
        + least(CAST(round(kw_density * 10000) AS BIGINT) * 15, 10000)
        + least(CAST(n_fenced_blocks AS BIGINT), 1) * 10000
       ) / 40000.0 AS code_score,
       (least(CAST(round(indent_frac * 10000) AS BIGINT) * 3, 10000)
        + least(CAST(round(code_punct_frac * 10000) AS BIGINT) * 12, 10000)
        + least(CAST(round(kw_density * 10000) AS BIGINT) * 15, 10000)
        + least(CAST(n_fenced_blocks AS BIGINT), 1) * 10000
       ) >= 20000 AS is_code
FROM r
"""


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dedup_clusters": q_dedup_clusters,
    "unigram_logprob": q_unigram_logprob,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "dedup_incremental_lsh": q_dedup_incremental_lsh,
    "dedup_simhash": q_dedup_simhash,
    "ann_brute_force": q_ann_brute_force,
    "ann_lsh": q_ann_lsh,
    "ann_ivf": q_ann_ivf,
    "ann_pq": q_ann_pq,
    "ann_ivfpq": q_ann_ivfpq,
    "pack_documents": q_pack_documents,
    "source_mix": q_source_mix,
    "embedding_near_dup": q_embedding_near_dup,
    "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
    "embedding_near_dup_lsh_strict": q_embedding_near_dup_lsh_strict,
    "doc_quality": q_doc_quality,
    "paragraph_dedup": q_paragraph_dedup,
    "quality_model_score": q_quality_model_score,
    "token_counts": q_token_counts,
    "doc_fingerprint": q_doc_fingerprint,
    "lang_id": q_lang_id,
    "media_metadata": q_media_metadata,
    "media_features": q_media_features,
    "media_resize": q_media_resize,
    "media_frames": q_media_frames,
    "udtf_chunks": q_udtf_chunks,
    "stream_events_hourly": q_stream_events_hourly,
    "stream_sessionize_events": q_stream_sessionize_events,
    "extract_documents": q_extract_documents,
    "repetition_filter": q_repetition_filter,
    "duplicate_spans": q_duplicate_spans,
    "remove_dup_spans": q_remove_dup_spans,
    "c4_filters": q_c4_filters,
    "url_filter": q_url_filter,
    "shard_assign": q_shard_assign,
    "host_quality": q_host_quality,
    "sample_topk": q_sample_topk,
    "decontaminate_report": q_decontaminate_report,
    "gopher_quality": q_gopher_quality,
    "gopher_repetition": q_gopher_repetition,
    "line_dedup": q_line_dedup,
    "temperature_rates": q_temperature_rates,
    "ccnet_buckets": q_ccnet_buckets,
    "script_stats": q_script_stats,
    "corpus_diff": q_corpus_diff,
    "pack_bins": q_pack_bins,
    "iclm_pack": q_iclm_pack,
    "hashed_embedding": q_hashed_embedding,
    "budget_select": q_budget_select,
    "mixture_entropy": q_mixture_entropy,
    "curriculum": q_curriculum,
    "unicode_nfc": q_unicode_nfc,
    "soft_dedup": q_soft_dedup,
    "char_spans": q_char_spans,
    "char_span_remove": q_char_span_remove,
    "host_boilerplate": q_host_boilerplate,
    "budget_select_grouped": q_budget_select_grouped,
    "annotate": q_annotate,
    "decontaminate": q_decontaminate,
    "decontaminate_bloom": q_decontaminate_bloom,
    "decontaminate_fuzzy": q_decontaminate_fuzzy,
    "robots_filter": q_robots_filter,
    "hll_tokens_per_lang": q_hll_tokens_per_lang,
    "bpe_token_counts": q_bpe_token_counts,
    "source_pagerank": q_source_pagerank,
    "split_assign": q_split_assign,
    "compression_ratio": q_compression_ratio,
    "bm25_search": q_bm25_search,
    "redact_pii": q_redact_pii,
    "page_links": q_page_links,
    "host_link_graph": q_host_link_graph,
    "lm_score": q_lm_score,
    "lm_score_trigram": q_lm_score_trigram,
    "dsir_select": q_dsir_select,
    "page_meta": q_page_meta,
    "canonical_dedup": q_canonical_dedup,
    "normalize_urls": q_normalize_urls,
    "anchor_stats": q_anchor_stats,
    "semdedup": q_semdedup,
    "cdx_index": q_cdx_index,
    "crawl_frontier": q_crawl_frontier,
    "sitemap_entries": q_sitemap_entries,
    "recrawl_priority": q_recrawl_priority,
    "feed_entries": q_feed_entries,
    "feed_discovery": q_feed_discovery,
    "og_meta": q_og_meta,
    "image_candidates": q_image_candidates,
    "jsonld_article": q_jsonld_article,
    "html_tables": q_html_tables,
    "page_dates": q_page_dates,
    "av_candidates": q_av_candidates,
    "page_lang_declared": q_page_lang_declared,
    "microdata_meta": q_microdata_meta,
    "microdata_types": q_microdata_types,
    "hreflang_alternates": q_hreflang_alternates,
    "parallel_pages": q_parallel_pages,
    "pagination_chains": q_pagination_chains,
    "stitch_pages": q_stitch_pages,
    "extract_markdown": q_extract_markdown,
    "sentences": q_sentences,
    "readability": q_readability,
    "url_quality": q_url_quality,
    "code_stats": q_code_stats,
}

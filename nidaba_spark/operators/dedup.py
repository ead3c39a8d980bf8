"""Deduplication operators over a document corpus.

Training-data-pipeline components (driver instruction: first-class
alongside the extraction stages). nidaba has no dedup, but its merge
phase's alignment math (reference: nidaba/algorithms/median.py
approximate string median, nidaba/algorithms/string.py edit distance)
is the same family of similarity computation; here it is re-expressed
at corpus scale as Spark set-similarity joins.

Scale notes (100 TB story):
  * exact_dedup — one hash aggregation; Spark does partial (map-side)
    aggregation automatically, and comparing 64-bit xxhash64 keys
    instead of full texts keeps shuffle rows tiny. Keep-lowest-id is
    an explicit min(), never dropDuplicates (nondeterministic under
    partitioning — SURVEY.md §4.3.5).
  * ngram-Jaccard — token-postings self-join with AllPairs prefix
    filtering: each doc posts only its n - ceil(t*n) + 1 globally
    rarest tokens, which provably preserves every pair with J >= t
    while keeping postings lists short; candidates verified exactly.
  * minhash_lsh — shingle → K minhashes → B bands; band-hash groupBy
    (shuffle on short band keys only); pairs verified with exact
    Jaccard. This is the sub-quadratic path at 10^9+ docs.
  * simhash — 64-bit sign-aggregated token hashes entirely in Column
    expressions; near-dup = popcount(xor) <= k via bit_count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

def _shr(col, n):
    return F.call_function("shiftright", col, n if isinstance(n, Column) else F.lit(n))


TOKEN_RE = r"[a-z0-9]+"


def tokens_col(text: Column) -> Column:
    """Lowercased word tokens (deterministic regex tokenizer)."""
    return F.filter(
        F.split(F.lower(text), r"[^a-z0-9]+"), lambda t: t != F.lit("")
    )


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: keep the lowest id per identical text (hash-groupBy
    on xxhash64 PLUS byte length — a 64-bit hash alone false-merges
    ~n^2/2^65 distinct texts at the 10^12-doc design point (birthday),
    the exact scheme paragraph_dedup's analysis rejects; the length
    key catches virtually all such collisions for 8 extra shuffle
    bytes, review r05)."""
    return (
        docs.groupBy(
            F.xxhash64(F.col(text_col)).alias("text_hash"),
            # octet_length, matching the documented 'byte length' and
            # report.py's twin guard — F.length counts CHARS and
            # diverged from both for multi-byte texts (ADVICE r05 #4)
            F.octet_length(F.col(text_col)).alias("_len"),
        )
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_dupes"),
        )
        .select("keep_id", "n_dupes")
    )


def paragraph_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    sep: str = "\n\n",
) -> DataFrame:
    """CCNet-style paragraph-level dedup (Wenzek et al. 2020 §3.1):
    every distinct paragraph survives only at its FIRST corpus
    occurrence (min (id, position)); each document is rebuilt from its
    surviving paragraphs in original order (documents reduced to
    nothing come back with text='' for a downstream empty filter).

    Spark shape — ONE shuffle carries the paragraphs: posexplode →
    ``row_number() over (partition by para order by id, pos) == 1``,
    which compiles to a map-side WindowGroupLimit, so a boilerplate
    paragraph duplicated 10^9 times is truncated to one row per
    upstream partition BEFORE the exchange (reducer sees at most
    n_map_partitions rows per paragraph — the classic dedup skew key
    is bounded by construction). Partitioning by the paragraph text
    itself (not a 64-bit hash) keeps the rule exact: no birthday-bound
    false merges at 10^12-paragraph scale, and the shuffle is no wider
    since the rebuild needs the paragraph bytes anyway. The rebuild is
    a second shuffle keyed on the document id.

    ``sep`` splits as a regex and rejoins as a literal — pass a
    literal separator ("\\n\\n", not a character class). Empty
    paragraphs are dropped (they carry no content and would otherwise
    dedup across unrelated documents).
    """
    paras = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), sep)).alias("_pos", "_para"),
    ).filter(F.col("_para") != "")
    w = Window.partitionBy("_para").orderBy("_id", "_pos")
    kept = (
        paras.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    rebuilt = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                lambda x: x["_para"],
            ),
            sep,
        ).alias("_text")
    )
    return (
        docs.select(F.col(id_col).alias("_id"))
        .join(rebuilt, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("_text"), F.lit("")).alias(text_col),
        )
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_filter: bool = True,
) -> DataFrame:
    """Exact token-set Jaccard similar pairs via a postings self-join.

    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold,
    jaccard rounded to 6 places (stable vs the DuckDB oracle).

    prefix_filter=True (default, the scale path) generates candidates
    with AllPairs/PPJoin-style PREFIX FILTERING (Bayardo et al. WWW'07;
    Xiao et al. WWW'08 — public algorithms): order each doc's token set
    by ascending (global document frequency, token) and keep only the
    first ``n - ceil(t*n) + 1`` tokens as postings. Completeness is a
    theorem, not a heuristic: for any pair with J >= t, the smallest
    common token w in that global order sits at position
    <= n - |overlap| + 1 <= n - ceil(t*n) + 1 in BOTH docs, so the pair
    collides on w. Candidates are then verified with EXACT Jaccard over
    the FULL token sets, so output == the naive all-pairs result,
    row for row — no recall cliff at any cluster multiplicity (this
    replaced an earlier global df-cap scheme whose candidate stage went
    blind on duplicate clusters larger than the cap, ADVICE r02).
    Cost: postings are each doc's RAREST tokens, so the self-join's
    per-token lists stay short on realistic corpora; a symmetric length
    filter (t*na <= nb and t*nb <= na) prunes cross-size pairs before
    the verify join. Residual worst case: very short docs keep their
    whole set as prefix, so a corpus of tiny docs sharing one stopword
    still generates quadratic candidates — at that shape use
    minhash_lsh_pairs, which buckets on the full signature instead.

    prefix_filter=False keeps the naive uncapped postings join
    (test/oracle baseline; do not run against a real corpus).
    """
    toks = (
        docs.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(tokens_col(F.col(text_col)))).alias("tok"))
        # lazy pin: the prefix path references toks three times (df
        # counts, the ranked join, the verify sets) and Spark has no
        # common-subplan reuse — without this the corpus tokenization
        # executes 3x per call (review r05; the semdedup pattern)
        .localCheckpoint(eager=False)
    )
    if not prefix_filter:
        sizes = toks.groupBy("id").agg(F.count(F.lit(1)).alias("n_tok"))
        a = toks.alias("a")
        b = toks.alias("b")
        shared = (
            a.join(b, (F.col("a.tok") == F.col("b.tok")) & (F.col("a.id") < F.col("b.id")))
            .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
        sa = sizes.select(F.col("id").alias("id_a"), F.col("n_tok").alias("n_a"))
        sb = sizes.select(F.col("id").alias("id_b"), F.col("n_tok").alias("n_b"))
        return (
            shared.join(sa, "id_a")
            .join(sb, "id_b")
            .withColumn(
                "jaccard",
                F.round(
                    F.col("n_shared") / (F.col("n_a") + F.col("n_b") - F.col("n_shared")), 6
                ),
            )
            .filter(F.col("jaccard") >= threshold)
            .select("id_a", "id_b", "jaccard")
        )
    # prefix-filter path: df-ranked prefixes -> candidates -> exact verify
    df_tok = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = toks.join(df_tok, "tok")
    w_id = Window.partitionBy("id")
    w_ord = w_id.orderBy("df", "tok")
    # one shuffle on id serves both window functions (set size + rank)
    pref = (
        ranked.withColumn("pos", F.row_number().over(w_ord))
        .withColumn("n", F.count(F.lit(1)).over(w_id))
        .filter(F.col("pos") <= F.col("n") - F.ceil(F.lit(threshold) * F.col("n")) + 1)
        .select("id", "tok", "n")
    )
    cand = (
        pref.alias("a")
        .join(
            pref.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.id") < F.col("b.id"))
            # symmetric length filter: J >= t forces t*max(na,nb) <= min(na,nb)
            & (F.col("b.n") >= F.ceil(F.lit(threshold) * F.col("a.n")))
            & (F.col("a.n") >= F.ceil(F.lit(threshold) * F.col("b.n"))),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    tsets = docs.select(
        F.col(id_col).alias("id"),
        F.array_distinct(tokens_col(F.col(text_col))).alias("ts"),
    )
    return (
        cand.join(tsets.select(F.col("id").alias("id_a"), F.col("ts").alias("ts_a")), "id_a")
        .join(tsets.select(F.col("id").alias("id_b"), F.col("ts").alias("ts_b")), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("ts_a", "ts_b"))
                / F.size(F.array_union("ts_a", "ts_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def _shingles(toks: Column, k: int) -> Column:
    """Distinct k-word shingles as strings, from a token ARRAY column.

    ``toks`` MUST be a bound attribute (project ``tokens_col(text)``
    in a prior select), never the inline tokenizer expression:
    higher-order functions run interpreted (CodegenFallback), and
    ``ArrayTransform.eval`` re-evaluates the lambda subtree per
    element — an inlined split() makes shingling O(words²) per doc,
    which pins a core for minutes on one mega-page.
    """
    n = F.size(toks)
    idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
    return F.when(n >= k, F.array_distinct(
        F.transform(idx, lambda i: F.array_join(F.slice(toks, i + 1, k), " "))
    )).otherwise(F.when(n > 0, F.array(F.array_join(toks, " "))).otherwise(F.array()))


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 64,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, h0..h{K-1}) — K minhashes over word shingles, wide columns.

    Shape: explode shingles → ONE hash aggregate with K min(xxhash64(
    shingle, j)) expressions. This stays on the whole-stage-codegen
    fast path (a nested transform/array_min higher-order expression
    drops to interpreted eval — measured 25x slower) and Spark's
    partial aggregation computes the K mins map-side, so the shuffle
    carries one row of K longs per (partition, doc), not the shingles.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        tokens_col(F.col(text_col)).alias("_t"),
    ).select("id", F.explode(_shingles(F.col("_t"), shingle_k)).alias("s"))
    aggs = [
        F.min(F.xxhash64(F.col("s"), F.lit(j))).alias(f"h{j}") for j in range(num_hashes)
    ]
    return sh.groupBy("id").agg(*aggs)


def minhash_lsh_pairs(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via banded MinHash LSH, verified with exact Jaccard.

    bands must divide num_hashes; rows-per-band r = K/B sets the LSH
    S-curve (collision prob ≈ 1-(1-s^r)^B).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, shingle_k, text_col, id_col)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * r + j}") for j in range(r)]).alias("bucket"),
        )
        for b in range(bands)
    ]
    band_rows = sigs.select(
        "id", F.explode(F.array(*band_structs)).alias("bb")
    ).select("id", "bb.band", "bb.bucket")
    cand = (
        band_rows.alias("x")
        .join(
            band_rows.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    # exact verification on candidates only
    sh = docs.select(
        F.col(id_col).alias("id"), tokens_col(F.col(text_col)).alias("_t")
    ).select("id", _shingles(F.col("_t"), shingle_k).alias("sh"))
    verified = (
        cand.join(sh.withColumnsRenamed({"id": "id_a", "sh": "sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"id": "id_b", "sh": "sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def minhash_index(
    docs: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Persistable LSH index rows: (id, band, bucket, sig).

    One row per (doc, band); ``sig`` is the full K-minhash signature
    (array<bigint>) riding along so the incremental verifier never
    needs the historical TEXT. Exactly associative by construction:
    index(A ∪ B) == index(A) ∪ index(B) as a row set (each row
    depends only on its own document), which is what makes the
    incremental path sound — pinned in tests/test_incremental_lsh.py.

    At the 10^12-row design point: write this table partitioned (or
    bucketed) by (band, bucket) so each new batch's candidate join is
    storage-co-located, and split sig into its own id-keyed table to
    avoid storing it ``bands`` times (kept inline here for API
    simplicity at test scale).
    """
    assert num_hashes % bands == 0
    r = num_hashes // bands
    sigs = minhash_signatures(docs, num_hashes, shingle_k, text_col, id_col)
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"h{b * r + j}") for j in range(r)]).alias("bucket"),
        )
        for b in range(bands)
    ]
    sig_arr = F.array(*[F.col(f"h{j}") for j in range(num_hashes)])
    return sigs.select(
        "id", F.explode(F.array(*band_structs)).alias("bb"), sig_arr.alias("sig")
    ).select("id", "bb.band", "bb.bucket", "sig")


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs TOUCHING a new crawl batch, against a persisted
    historical index — the historical corpus is NEVER rescanned.

    Returns (id_a, id_b, est_jaccard) for new-vs-historical and
    new-vs-new pairs; historical-vs-historical pairs are excluded by
    construction (the join's left side is the new batch only).
    Jaccard is the standard unbiased minhash estimator — the fraction
    of agreeing signature components (E[est] = J, per-component
    collision prob = J) — because exact verification would need the
    historical documents' text, defeating the point; the batch
    ``minhash_lsh_pairs`` remains the exact-verified variant.

    Scale shape: index the new batch (one shuffle over new docs only),
    band-bucket join against index ∪ new-index (shuffle keyed on the
    16-byte (band,bucket) — with the index table stored partitioned by
    (band,bucket) this side is storage-co-located), estimator = one
    zip_with/filter over two bound 64-long arrays per surviving
    candidate. Everything is proportional to the NEW batch plus its
    collision neighborhood.
    """
    new_idx = minhash_index(
        new_docs, num_hashes, bands, shingle_k, text_col, id_col
    )
    # sig_a/sig_b inside are functionally determined by (id_a, id_b):
    # deterministic in value (same contract as similarity.py:359)
    return _pairs_from_indexes(new_idx, index, num_hashes, threshold)


# ------------------------------------------------ persisted LSH index
# The executable form of the design note on minhash_index: at 10^12
# rows the index lives PARTITIONED by (band, pmod(bucket, pbuckets)),
# so a new batch's candidate join reads only the partitions its own
# band-buckets hash into — partition pruning stands in for the
# storage co-location a cluster would get from Iceberg write-time
# bucketing. Mirrors operators/search.py's postings layout contract:
# pbuckets is persisted per batch and read back (a wrong modulus
# would silently prune away the colliding partitions).


def write_lsh_index(
    docs: DataFrame,
    path: str,
    batch_id: int = 0,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    pbuckets: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> None:
    """Append one ingest batch's LSH rows to the partitioned index at
    ``path``: batch=N/band=B/pb=H directories (idempotent per-batch
    OVERWRITE — replays converge) plus a one-row _meta table recording
    the layout contract (num_hashes, bands, pbuckets, shingle_k —
    shingle_k included because it determines signature COMPARABILITY:
    a 5-gram index probed with 3-gram signatures estimates near-random
    jaccard and silently misses true near-dups, review r05). Appending
    into an existing index validates against the stored contract
    FIRST — a mismatched batch used to be detected only batches
    later, at read time, far from its cause."""
    spark = docs.sparkSession
    sc = spark.sparkContext
    jp = sc._jvm.org.apache.hadoop.fs.Path
    fs = jp(path).getFileSystem(sc._jsc.hadoopConfiguration())
    params = (num_hashes, bands, pbuckets, shingle_k)
    if fs.exists(jp(f"{path}/_meta")):
        stored = _lsh_meta(spark, path)
        if stored != params:
            raise ValueError(
                f"LSH index at {path} uses (num_hashes, bands, pbuckets, "
                f"shingle_k)={stored}; this append passed {params}"
            )
    idx = minhash_index(docs, num_hashes, bands, shingle_k, text_col, id_col)
    (
        idx.withColumn("pb", F.pmod(F.col("bucket"), F.lit(pbuckets)))
        .write.mode("overwrite")
        .partitionBy("band", "pb")
        .parquet(f"{path}/rows/batch={batch_id}")
    )
    spark.createDataFrame(
        [params],
        "num_hashes int, bands int, pbuckets int, shingle_k int",
    ).write.mode("overwrite").parquet(f"{path}/_meta/batch={batch_id}")


def _lsh_meta(spark, path: str) -> tuple[int, int, int, int]:
    """(num_hashes, bands, pbuckets, shingle_k) stored contract; a
    legacy index written before shingle_k was recorded reads back the
    then-hardwired default 3."""
    # mergeSchema: a legacy index (3-column _meta batches) appended to
    # with the 4-column format must not depend on WHICH file Spark
    # samples for the schema — without it, sampling a new-format file
    # surfaces legacy rows as shingle_k=NULL and a legitimately
    # consistent index nondeterministically reads as 'mixed layouts'
    # (ADVICE r05 #1). NULL shingle_k always means the legacy
    # hardwired default 3, so coalesce before building the set.
    df = spark.read.option("mergeSchema", "true").parquet(path + "/_meta")
    cols = ["num_hashes", "bands", "pbuckets"]
    if "shingle_k" in df.columns:
        df = df.withColumn("shingle_k", F.coalesce(F.col("shingle_k"), F.lit(3)))
        cols.append("shingle_k")
    metas = {tuple(r) for r in df.select(*cols).distinct().collect()}
    if len(metas) != 1:
        raise ValueError(f"LSH index at {path} has mixed layouts: {metas}")
    m = next(iter(metas))
    return m if len(m) == 4 else (*m, 3)


def read_lsh_index(spark, path: str) -> DataFrame:
    """The full index as (id, band, bucket, sig) — union of batches."""
    return spark.read.parquet(path + "/rows").select("id", "band", "bucket", "sig")


def minhash_lsh_pairs_vs_stored(
    new_docs: DataFrame,
    path: str,
    threshold: float = 0.5,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """``minhash_lsh_pairs_incremental`` against a write_lsh_index
    store, with the historical read PRUNED to the new batch's
    (band, pb) partitions: the distinct partition keys of the new
    batch's own index (≤ bands×pbuckets values, a bounded collect)
    become IN-list partition filters on the scan, so the job touches
    only the collision neighborhood's files — the 10^12-row shape.
    ALL layout parameters — including shingle_k, which determines
    signature comparability — come from the stored _meta contract;
    the ``shingle_k`` argument is only the fallback for legacy
    indexes whose _meta predates the column."""
    spark = new_docs.sparkSession
    num_hashes, bands, pbuckets, stored_k = _lsh_meta(spark, path)
    shingle_k = stored_k if stored_k is not None else shingle_k
    new_idx = minhash_index(
        new_docs, num_hashes, bands, shingle_k, text_col, id_col
    ).localCheckpoint(eager=False)
    keys = {
        (r["band"], r["pb"])
        for r in new_idx.select(
            "band", F.pmod(F.col("bucket"), F.lit(pbuckets)).alias("pb")
        ).distinct().collect()
    }
    # two IN-lists (a slight superset of the exact key pairs) instead
    # of a struct-isin: simple conjunctive IN filters push down to
    # PartitionFilters reliably; the band-bucket join condition keeps
    # the result exact regardless
    bands_in = sorted({b for b, _ in keys})
    pbs_in = sorted({p for _, p in keys})
    hist = (
        spark.read.parquet(path + "/rows")
        .filter(F.col("band").isin(bands_in) & F.col("pb").isin(pbs_in))
        .select("id", "band", "bucket", "sig")
    )
    return _pairs_from_indexes(new_idx, hist, num_hashes, threshold)


def compact_lsh_index(spark, path: str) -> dict:
    """Merge every batch=N subdirectory into one (same small-files
    repair as search.compact_postings; LSH rows are a pure union —
    each row depends only on its own document — so compaction is a
    rewrite, repartitioned to ~one file per (band, pb) partition).
    Returns before/after file counts."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()

    def jp(p):
        return jvm.org.apache.hadoop.fs.Path(p)

    fs = jp(path).getFileSystem(conf)

    def count_files(sub):
        it, n = fs.listFiles(jp(f"{path}/{sub}"), True), 0
        while it.hasNext():
            n += it.next().getPath().getName().endswith(".parquet")
        return n

    num_hashes, bands, pbuckets, _sk = _lsh_meta(spark, path)
    files_before = count_files("rows")
    tmp = f"{path}/.compacting"
    fs.delete(jp(tmp), True)
    (
        spark.read.parquet(path + "/rows")
        .select("id", "bucket", "sig", "band", "pb")
        .repartition(int(bands) * int(pbuckets), "band", "pb")
        .write.partitionBy("band", "pb")
        .parquet(f"{tmp}/rows/batch=0")
    )
    spark.createDataFrame(
        [(num_hashes, bands, pbuckets)], "num_hashes int, bands int, pbuckets int"
    ).write.parquet(f"{tmp}/_meta/batch=0")
    old = f"{path}/.compact_old"
    fs.delete(jp(old), True)
    fs.mkdirs(jp(old))
    for table in ("rows", "_meta"):
        if not fs.rename(jp(f"{path}/{table}"), jp(f"{old}/{table}")):
            raise OSError(f"LSH compaction swap failed moving {table} aside")
        if not fs.rename(jp(f"{tmp}/{table}"), jp(f"{path}/{table}")):
            raise OSError(
                f"LSH compaction swap failed installing {table}; originals "
                f"preserved under {old}"
            )
    fs.delete(jp(old), True)
    fs.delete(jp(tmp), True)
    return {
        "files_before": files_before,
        "files_after": count_files("rows"),
    }


def _pairs_from_indexes(
    new_idx: DataFrame, hist: DataFrame, num_hashes: int, threshold: float
) -> DataFrame:
    """Shared candidate-join + signature-estimator tail of the
    incremental variants (same semantics as
    minhash_lsh_pairs_incremental's body)."""
    all_idx = hist.unionByName(new_idx)
    cand = (
        new_idx.alias("x")
        .join(
            all_idx.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bucket") == F.col("y.bucket"))
            & (F.col("x.id") != F.col("y.id")),
        )
        .select(
            F.least("x.id", "y.id").alias("id_a"),
            F.greatest("x.id", "y.id").alias("id_b"),
            F.when(F.col("x.id") < F.col("y.id"), F.col("x.sig"))
            .otherwise(F.col("y.sig"))
            .alias("sig_a"),
            F.when(F.col("x.id") < F.col("y.id"), F.col("y.sig"))
            .otherwise(F.col("x.sig"))
            .alias("sig_b"),
        )
        # deterministic pick, NOT dropDuplicates: a re-crawled id can
        # sit in hist and new with DIFFERENT sigs, and an arbitrary
        # row would make est_jaccard vary run to run (review r05) —
        # max(struct(sig_a, sig_b)) is a stable function of the pair
        .groupBy("id_a", "id_b")
        .agg(
            F.max(F.struct("sig_a", "sig_b")).alias("_sg"),
        )
        .select(
            "id_a",
            "id_b",
            F.col("_sg.sig_a").alias("sig_a"),
            F.col("_sg.sig_b").alias("sig_b"),
        )
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda a, b: a == b), lambda t: t
        )
    )
    return (
        cand.withColumn("est_jaccard", F.round(agree / F.lit(num_hashes), 6))
        .filter(F.col("est_jaccard") >= threshold)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_table(
    docs: DataFrame, bits: int = 64, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sim: bigint) — 64-bit SimHash of each doc's token multiset.

    bit i of the result = 1 iff sum over tokens of sign(bit i of
    xxhash64(token)) is positive. Shape mirrors minhash_signatures:
    explode tokens → one hash aggregate with `bits` codegen'd sum()
    expressions (map-side partial agg), then assemble the word with a
    bitwiseOR reduce — no interpreted higher-order nesting.
    """
    from functools import reduce

    tok = docs.select(
        F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("t")
    ).withColumn("h", F.xxhash64("t")).drop("t")
    votes = [
        F.sum(
            F.when(_shr(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{i}")
        for i in range(bits)
    ]
    wide = tok.groupBy("id").agg(*votes)
    word = reduce(
        lambda a, b: a.bitwiseOR(b),
        [
            F.when(F.col(f"v{i}") > 0, F.lit(1 << i if i < 63 else -(1 << 63)).cast("long"))
            .otherwise(F.lit(0).cast("long"))
            for i in range(bits)
        ],
    )
    return wide.select("id", word.alias("sim"))


def simhash_pairs(
    docs: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs with hamming(simhash) <= max_hamming.

    Blocking: 4 x 16-bit chunks — by pigeonhole, any pair within
    hamming distance 3 shares at least one exact chunk, so the join is
    on chunk equality (linear-ish), then verified with bit_count(xor).
    The pigeonhole argument needs MORE chunks than the distance, so
    this blocking is complete only for max_hamming <= 3; a larger
    value would silently lose pairs differing in one bit per chunk
    (review r05) — rejected loudly instead.
    """
    if max_hamming > 3:
        raise ValueError(
            "simhash_pairs' 4-chunk blocking is complete only for "
            f"max_hamming <= 3 (pigeonhole); got {max_hamming}"
        )
    sh = simhash_table(docs, 64, text_col, id_col)
    chunks = sh.select(
        "id",
        "sim",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(3)),
                lambda c: F.struct(
                    c.alias("chunk"),
                    _shr(F.col("sim"), c * 16).bitwiseAND(F.lit(0xFFFF)).alias("key"),
                ),
            )
        ).alias("ck"),
    ).select("id", "sim", "ck.chunk", "ck.key")
    pairs = (
        chunks.alias("x")
        .join(
            chunks.alias("y"),
            (F.col("x.chunk") == F.col("y.chunk"))
            & (F.col("x.key") == F.col("y.key"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"),
            F.col("y.id").alias("id_b"),
            F.bit_count(F.col("x.sim").bitwiseXOR(F.col("y.sim"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs


def soft_dedup_weights(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col_name: str | None = None,
) -> DataFrame:
    """Duplication-aware sampling weights instead of hard removal
    (SoftDeDup, He et al. 2024: down-weight common documents rather
    than dropping all-but-one copy — hard dedup throws away the
    signal that a document was popular, soft dedup keeps every copy
    but makes the FAMILY, not the copy, the unit of sampling mass).

    Returns (id, family_size, weight, eff_tokens):
      family_size — exact-duplicate family cardinality (xxhash64 of
                    the text bytes; run unicode_normalize first if
                    composed/decomposed variants should join);
      weight      — 1.0 / family_size, so sum(weight) over a family
                    is 1.0 and a sampler drawing proportional to
                    weight sees the deduplicated distribution while
                    any individual copy remains available;
      eff_tokens  — weight x n_tokens when ``tokens_col_name`` is
                    given (the family's one "effective" token mass
                    spread over its members), else omitted.

    Plan (scale): hash once, ONE map-side-combined groupBy on the
    8-byte hash (family counts are bounded by distinct-doc count, and
    partial aggregation collapses a 10^6-copy boilerplate family to
    one row per map task before the exchange), then a hash-keyed join
    back. The join side with counts is far smaller than the corpus
    (distinct texts), and a hyper-duplicated family is ONE row on the
    build side — AQE skew handling covers the probe side. No window
    over the raw corpus: a Window.partitionBy(hash) count would ship
    every copy of the mega-family to one partition with no partial
    aggregation.
    """
    h = F.xxhash64(F.col(text_col)).alias("_fam")
    fam = docs.select(h).groupBy("_fam").agg(
        F.count(F.lit(1)).alias("family_size")
    )
    out = (
        docs.select(
            F.col(id_col).alias("id"),
            h,
            *([F.col(tokens_col_name)] if tokens_col_name else []),
        )
        .join(fam, "_fam")
        .withColumn(
            "weight", F.round(F.lit(1.0) / F.col("family_size"), 6)
        )
    )
    cols = ["id", "family_size", "weight"]
    if tokens_col_name:
        out = out.withColumn(
            "eff_tokens",
            F.round(F.col(tokens_col_name) / F.col("family_size"), 6),
        )
        cols.append("eff_tokens")
    return out.select(*cols)

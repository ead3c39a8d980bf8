"""Corpus-hygiene filters for training-data curation: intra-document
repetition statistics (Gopher/MassiveText-style rules), eval-set
decontamination (word-n-gram overlap), and PII redaction.

The three published filters are pure declarative plans — no Python
UDFs anywhere (the one exception is ``decontaminate_bloom``'s
membership probe, a vectorized Arrow-batched pandas UDF over a
broadcast bit array — the deliberate trade that removes every
train-side shuffle at 10^12-row scale):

* ``repetition_stats``: explode word-bigrams → two hash aggregations
  keyed on (doc_id, bigram) then doc_id. One shuffle on doc_id-salted
  keys (the bigram string rides along only through the first partial
  agg — map-side combine collapses repeats before the exchange), so
  the plan is bounded by distinct (doc, bigram) pairs, not corpus
  tokens. Published rule shape: Rae et al. 2021 (Gopher §A1.1)
  "fraction of characters in the most common n-gram" / "duplicate
  line fraction" — re-expressed at word-bigram granularity because
  the synthetic corpus has no line structure.
* ``decontaminate``: the n-gram-overlap decontamination check used by
  GPT-3/Gopher appendix-style eval hygiene: any training doc sharing
  a word-n-gram with the eval set is flagged. Eval side is distinct
  n-grams (small by construction) → broadcast hash join against the
  exploded training n-grams, count distinct overlaps per doc. At
  10^12 rows: hash grams to 64 bits (xxhash64) and swap the broadcast
  for a bloom-filter pushdown or a shuffle join on the hash — the
  string-keyed broadcast here keeps the operator oracle-checkable
  (DuckDB has no xxhash64).
* ``redact_pii``: email / E.164-ish phone / IPv4 regexp_replace, all
  whole-stage-codegen JVM expressions (count via regexp_extract_all,
  replace via regexp_replace). Patterns restricted to the
  Java-regex ∩ RE2 common subset (no lookaround) so the DuckDB oracle
  runs the byte-identical patterns.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_WORD_SPLIT = "[^a-z0-9]+"

# PII patterns — Java regex ∩ RE2 (no lookaround, ASCII \b only).
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+\d{1,2} \d{3}-\d{3}-\d{4}"
PII_IPV4 = r"\b\d{1,3}(\.\d{1,3}){3}\b"


def _words(text: Column) -> Column:
    return F.filter(F.split(F.lower(text), _WORD_SPLIT), lambda t: t != F.lit(""))


def _ngrams(words: Column, n: int) -> Column:
    """Array of space-joined word n-grams (empty when len(words) < n).

    ``words`` MUST be a bound attribute (a projected column), never the
    inline ``_words(...)`` expression tree: higher-order functions are
    CodegenFallback, and interpreted ``ArrayTransform.eval`` re-evaluates
    the whole lambda subtree per element — an inlined split() makes this
    O(words²) per document (measured: one mega-page pinned a core for
    5+ minutes). Use ``_exploded_grams`` which projects first.
    """
    sz = F.size(words)
    return F.when(
        sz >= n,
        F.transform(
            F.sequence(F.lit(1), sz - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _exploded_grams(
    docs: DataFrame, id_col: str, text_col: str, n: int, out: str
) -> DataFrame:
    """(id_col → doc_id, exploded word-n-gram → ``out``), linear-time.

    Two selects: the words array is materialized as a column in the
    first, so the n-gram lambda slices a bound array attribute (O(n)
    per gram) instead of re-splitting the document per gram. The
    multiple references to ``_w`` also stop CollapseProject from
    re-inlining the split into the lambda.
    """
    return docs.select(
        F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("_w")
    ).select(
        "doc_id", F.explode(_ngrams(F.col("_w"), n)).alias(out)
    )


def repetition_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document word-bigram repetition statistics.

    Returns (doc_id, n_bigrams, top_bigram_frac, dup_bigram_frac) for
    every doc with >= 2 words. top_bigram_frac is the Gopher "most
    common n-gram" mass; dup_bigram_frac = 1 - distinct/total is the
    "duplicate n-gram" mass. A doc is repetition-spam when either is
    high (thresholding is the caller's policy — see q_repetition_filter
    for the published 0.18 cut).

    Scale note: both shuffles carry doc_id in the key, so skew is
    bounded by the largest single document. At 10^12 rows swap the
    bigram string for ``F.xxhash64(bigram)`` in the first groupBy key
    to cut shuffle bytes ~10x (64-bit collisions merge counts with
    probability ~n²/2^65 per doc — immaterial for a filter); the
    string key is kept here because the DuckDB oracle has no xxhash64.
    """
    grams = _exploded_grams(docs, id_col, text_col, 2, "bigram")
    per_gram = grams.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    return per_gram.groupBy("doc_id").agg(
        F.sum("c").alias("n_bigrams"),
        F.round(F.max("c") / F.sum("c"), 4).alias("top_bigram_frac"),
        F.round(F.lit(1.0) - F.count("*") / F.sum("c"), 4).alias("dup_bigram_frac"),
    )


def duplicate_span_stats(
    docs: DataFrame,
    n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_keys: bool = False,
) -> DataFrame:
    """Substring-level duplication signal (Lee et al. 2021,
    "Deduplicating Training Data Makes Language Models Better"),
    approximated by rolling n-token span hashes instead of a suffix
    array: per document, the fraction of its n-token spans that occur
    MORE THAN ONCE corpus-wide (cross-doc boilerplate AND intra-doc
    repeats both count). Docs above a dup_span_frac cut are the
    substring-dedup removal candidates; the paper's 50-token window is
    the default.

    Returns (doc_id, n_spans, dup_span_frac) for docs with >= n words.

    Plan: linear-time exploded spans (projected words array — see
    _ngrams' O(words²) trap) → corpus-wide span counts via one
    map-side-combined hash agg → join counts back on the span key →
    per-doc aggregate. Two span-keyed shuffles + one doc-keyed; AQE
    skew-join covers hyper-duplicated spans.

    ``hash_keys=True`` is the 10^12-row form: the span STRING (~50
    tokens, hundreds of bytes) is replaced by its ``xxhash64`` right
    after the explode, so both span-keyed shuffles and the join carry
    8-byte keys — a ~30-60x cut in shuffle bytes on real text. Cost is
    the birthday bound on 64-bit collisions: two DISTINCT spans share
    a hash with probability ~d²/2^65 for d distinct spans corpus-wide
    (at d = 10^9 that is ~1.4e-2 expected collisions TOTAL, each of
    which can only nudge one dup_span_frac upward — immaterial for a
    removal-candidate filter). The default string key keeps the DuckDB
    oracle byte-exact; equivalence of the two forms on collision-free
    corpora is pinned in tests/test_trainingdata_ops.py.
    """
    spans = _exploded_grams(docs, id_col, text_col, n, "span")
    if hash_keys:
        spans = spans.select("doc_id", F.xxhash64("span").alias("span"))
    counts = spans.groupBy("span").agg(F.count(F.lit(1)).alias("_cnt"))
    return (
        spans.join(counts, "span")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.round(F.avg((F.col("_cnt") > 1).cast("double")), 4).alias(
                "dup_span_frac"
            ),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training docs sharing any word-``n``-gram with the eval set.

    Returns (doc_id, n_overlap) for contaminated docs only, where
    n_overlap counts the DISTINCT training-doc n-grams present in the
    eval set's distinct n-gram universe.
    """
    train_g = _exploded_grams(train, id_col, text_col, n, "gram").distinct()
    eval_g = (
        _exploded_grams(
            eval_df, eval_df.columns[0], text_col, n, "gram"
        ).select("gram").distinct()
    )
    return (
        train_g.join(F.broadcast(eval_g), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))
    )


def _gram_hashes(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc_id, gram_hashes: array<bigint>) — per-doc DISTINCT word-n-gram
    xxhash64s, computed without exploding (one row in, one row out).

    The words array is pinned as a PHYSICAL attribute via a lazy
    localCheckpoint before the gram lambdas touch it. Projection
    separation is NOT enough here: without a generator (the explode
    that saves _exploded_grams) the optimizer collapses the chain and
    the words split() lands inside the per-gram slice lambda —
    interpreted HOF eval then re-splits the document per gram,
    O(words²) per doc (jstack-verified: Slice(ArrayFilter(StringSplit))
    inside ArrayTransform.eval; a 100k-word page took 253s collapsed
    vs ~2s pinned). The checkpoint adds NO Exchange; it materializes
    (doc_id, words) once, executor-local — at the 10^12-row design
    point this is the stage boundary the curation pipeline already
    keeps here.
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("_w")
    ).localCheckpoint(eager=False)
    return words.select(
        "doc_id", F.array_distinct(_ngrams(F.col("_w"), n)).alias("_g")
    ).select(
        "doc_id",
        F.transform(F.col("_g"), lambda g: F.xxhash64(g)).alias("gram_hashes"),
    )


def _bloom_params(expected_items: int, fpp: float, chunk_bytes: int) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n ln p / (ln 2)^2 bits, k = ln(1/p)/ln 2.

    k comes from fpp alone — at the optimal (unpadded) m, m/n·ln2
    reduces to log2(1/p). It must NOT be derived from the padded m:
    m is rounded up to a whole number of ``chunk_bytes`` chunks (so
    the distributed build's OR-reduce keys are uniform), and a tiny
    eval set pads m far past optimal — k = m_padded/n·ln2 then
    explodes (measured: n=1, fpp=1e-9 → k=181,682 probes PER GRAM, a
    multi-minute stall; the correct k is 30). Padding m with k fixed
    only lowers the realized fpp below target.
    """
    import math as _math

    n = max(1, int(expected_items))
    m = int(_math.ceil(-n * _math.log(fpp) / (_math.log(2) ** 2)))
    chunk_bits = chunk_bytes * 8
    m = ((m + chunk_bits - 1) // chunk_bits) * chunk_bits
    k = max(1, round(-_math.log(fpp) / _math.log(2)))
    return m, k


def _bloom_probes(hashes, m_bits: int, k: int):
    """(n_hashes, k) uint64 bit indices via Kirsch–Mitzenmacher double
    hashing: probe_i = (h1 + i*h2) mod m, h1/h2 = the xxhash64 halves
    (h2 forced odd). One vectorized numpy expression."""
    h = hashes.astype(np.int64).view(np.uint64)
    h1 = h & np.uint64(0xFFFFFFFF)
    h2 = (h >> np.uint64(32)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(m_bits)


def build_ngram_bloom(
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str | None = None,
    fpp: float = 1e-4,
    expected_items: int | None = None,
    chunk_bytes: int = 1 << 15,
) -> tuple[bytes, int, int]:
    """Distributed Bloom filter over the eval set's distinct word-n-gram
    xxhash64s. Returns (bit_array_bytes, m_bits, k).

    Build plan (all sizes bounded by the FILTER, never the corpus):
      distinct gram hashes → mapInPandas sets bits into one per-task
      numpy bit array and emits only the NONZERO ``chunk_bytes`` chunks
      (chunk_id, bits) → groupBy(chunk_id) OR-reduce via applyInPandas
      → collect ≤ m_bits/8/chunk_bytes small rows → driver assembles.
    The shuffle after the map side therefore carries at most
    tasks × m/8 bytes (dense worst case) and typically far less; the
    final collect is exactly the filter's own size, which must fit on
    the driver anyway to be broadcast.

    Sizing: PySpark exposes no DataFrame bloomFilter builder (the
    Scala-only ``df.stat.bloomFilter``), so this is the public-formula
    numpy equivalent. When ``expected_items`` is None one count() job
    sizes the filter first (eval sets are small by construction; pass
    the known cardinality at 10^12 scale to skip it).
    """
    id_col = id_col or eval_df.columns[0]
    hashes = (
        _exploded_grams(eval_df, id_col, text_col, n, "gram")
        .select(F.xxhash64("gram").alias("h"))
        .distinct()
    )
    if expected_items is None:
        hashes = hashes.localCheckpoint(eager=False)
        expected_items = hashes.count()
    m_bits, k = _bloom_params(expected_items, fpp, chunk_bytes)
    n_chunks = m_bits // 8 // chunk_bytes

    def _set_bits(batches):
        bits = np.zeros(m_bits // 8, dtype=np.uint8)
        for pdf in batches:
            if len(pdf):
                idx = _bloom_probes(pdf["h"].to_numpy(), m_bits, k).ravel()
                np.bitwise_or.at(
                    bits, (idx >> np.uint64(3)).astype(np.int64),
                    (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
                )
        chunked = bits.reshape(n_chunks, chunk_bytes)
        live = np.flatnonzero(chunked.any(axis=1))
        yield pd.DataFrame(
            {"chunk_id": live.astype("int32"),
             "bits": [chunked[c].tobytes() for c in live]}
        )

    def _or_reduce(key, pdf):
        acc = np.zeros(chunk_bytes, dtype=np.uint8)
        for b in pdf["bits"]:
            acc |= np.frombuffer(b, dtype=np.uint8)
        return pd.DataFrame({"chunk_id": [key[0]], "bits": [acc.tobytes()]})

    rows = (
        hashes.mapInPandas(_set_bits, "chunk_id int, bits binary")
        .groupBy("chunk_id")
        .applyInPandas(_or_reduce, "chunk_id int, bits binary")
        .collect()
    )
    out = np.zeros(m_bits // 8, dtype=np.uint8)
    for r in rows:
        off = r["chunk_id"] * chunk_bytes
        out[off : off + chunk_bytes] = np.frombuffer(r["bits"], dtype=np.uint8)
    return out.tobytes(), m_bits, k


def decontaminate_bloom(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    fpp: float = 1e-4,
    expected_items: int | None = None,
) -> DataFrame:
    """Bloom-filter decontamination — the 10^12-row swap the exact
    ``decontaminate`` docstring documents, implemented.

    Same contract: (doc_id, n_overlap) for flagged docs only, where
    n_overlap counts the doc's distinct n-grams whose xxhash64 the eval
    Bloom filter accepts. Guarantees, by construction:
      * NO false negatives — a truly contaminated doc is always
        flagged (its gram's exact hash was inserted at build time;
        membership of an inserted key is certain), and its bloom
        n_overlap >= the exact n_overlap;
      * false positives over-flag ~fpp per distinct gram — an
        acceptable one-sided error for hygiene filtering (documents
        are only ever over-REMOVED, never leaked).

    Scale: the train side is ONE scan with ZERO shuffles — per-doc
    distinct gram hashes stay an array column (no explode), pinned by
    an executor-local materialization (no Exchange; see the inlining
    note below), and membership is a vectorized Arrow-batched pandas
    UDF probing the broadcast bit array (k gathers per gram, one
    numpy expression per batch). The exact variant shuffles the exploded train grams
    through a distinct + join; at 10^12 rows that distinct alone
    dwarfs this whole plan. Filter size is independent of the train
    corpus (1e8 eval grams @ fpp 1e-4 ≈ 229 MB, broadcast once).
    """
    from pyspark.sql.functions import pandas_udf

    bits_bytes, m_bits, k = build_ngram_bloom(
        eval_df, n=n, text_col=text_col, fpp=fpp, expected_items=expected_items
    )
    bc = train.sparkSession.sparkContext.broadcast(bits_bytes)

    @pandas_udf("integer")
    def bloom_hits(gram_hashes: pd.Series) -> pd.Series:
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        lengths = np.fromiter(
            (0 if x is None else len(x) for x in gram_hashes), dtype=np.int64
        )
        out = np.zeros(len(gram_hashes), dtype=np.int32)
        if lengths.sum():
            flat = np.concatenate(
                [
                    np.asarray(x, dtype=np.int64)
                    for x in gram_hashes
                    if x is not None and len(x)
                ]
            )
            idx = _bloom_probes(flat, m_bits, k)
            hit = (
                (bits[(idx >> np.uint64(3)).astype(np.int64)]
                 >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
            ).all(axis=1)
            rows = np.repeat(np.arange(len(gram_hashes)), lengths)
            np.add.at(out, rows, hit.astype(np.int32))
        return pd.Series(out)

    # _gram_hashes pins the words array behind a localCheckpoint so
    # the gram lambdas slice a physical attribute — see its docstring
    # for the O(words²) inlining trap this avoids.
    return (
        _gram_hashes(train, id_col, text_col, n)
        # long, matching exact decontaminate's count(*) dtype exactly
        # (the driver's compare is pandas-dtype-sensitive)
        .select(
            "doc_id",
            bloom_hits(F.col("gram_hashes")).cast("long").alias("n_overlap"),
        )
        .filter(F.col("n_overlap") > 0)
    )


def redact_pii(text: Column) -> Column:
    """Redact emails, then IPv4s, then phone numbers (codegen exprs).

    Order matters and is pinned: email first so its digit-bearing
    local parts can't be half-eaten by the IP/phone passes.
    """
    redacted = F.regexp_replace(text, PII_EMAIL, "<EMAIL>")
    redacted = F.regexp_replace(redacted, PII_IPV4, "<IP>")
    return F.regexp_replace(redacted, PII_PHONE, "<PHONE>")


def pii_counts(text: Column) -> list[Column]:
    """Match counts per PII class (pre-redaction), as columns."""
    return [
        F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL), 0)).alias("n_email"),
        F.size(F.regexp_extract_all(text, F.lit(PII_PHONE), 0)).alias("n_phone"),
        F.size(F.regexp_extract_all(text, F.lit(PII_IPV4), 0)).alias("n_ip"),
    ]


# --------------------------------------------------------- C4 page cleaning
# Raffel et al. 2020 ("Exploring the Limits of Transfer Learning...",
# §2.2 — the C4 cleaning heuristics). The published blocklist is the
# "List of Dirty, Naughty, Obscene..." corpus; this default is a tiny
# stand-in — production callers pass their own tuple.
C4_BAD_WORDS = ("porn", "xxx")
C4_TERMINAL_RE = r'[.!?"]$'
_C4_JS_RE = r"\bjavascript\b"


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
    bad_words: tuple[str, ...] = C4_BAD_WORDS,
) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2020 §2.2), pure codegen.

    Line rules (a line survives iff ALL hold):
      * ends in a terminal punctuation mark (``. ! ? "``),
      * has >= ``min_words_per_line`` whitespace words,
      * does not contain the word "javascript" (case-insensitive).
    Page rules (evaluated on the ORIGINAL text, per the paper —
    the offending content is evidence about the page even when line
    filtering would have removed it):
      * no ``{`` (code), no "lorem ipsum", no blocklist word;
      * >= ``min_sentences`` sentences REMAINING after line filtering
        (sentence = terminal-punctuation occurrence in the kept text).

    Returns ``docs`` with ``text_col`` replaced by the kept lines
    (joined with ``\\n``) plus (n_lines, n_kept_lines, n_sentences,
    c4_keep). Dropping is the caller's move (``filter(c4_keep)``) so
    the stats stay inspectable; curate(c4_clean=True) does exactly
    that.

    Every rule is a scalar whole-stage-codegen expression or a
    single-level higher-order function over the line array — the line
    split is the HOF's input array, never inside a lambda body, so
    the O(lines²) interpreted-eval trap (_ngrams docstring) cannot
    bite; per-line work (trim / regex / word split) is linear in the
    page. No shuffle: a pure scan-level map, Catalyst pushes any
    downstream ``c4_keep`` filter into the scan's projection stage.
    """
    text = F.col(text_col)
    bad_re = r"\b(" + "|".join(bad_words) + r")\b"
    kept = F.filter(
        F.transform(F.split(text, "\n"), lambda line: F.trim(line)),
        lambda lt: lt.rlike(C4_TERMINAL_RE)
        & (F.size(F.split(lt, r"\s+")) >= min_words_per_line)
        & ~F.lower(lt).rlike(_C4_JS_RE),
    )
    clean = F.array_join(kept, "\n")
    n_sentences = F.size(F.split(clean, C4_TERMINAL_RE[:-1])) - 1
    others = [c for c in docs.columns if c != text_col]
    return docs.select(
        *others,
        clean.alias(text_col),
        F.size(F.split(text, "\n")).alias("n_lines"),
        F.size(kept).alias("n_kept_lines"),
        n_sentences.alias("n_sentences"),
        (
            ~text.contains("{")
            & ~F.lower(text).contains("lorem ipsum")
            & ~F.lower(text).rlike(bad_re)
            & (n_sentences >= min_sentences)
        ).alias("c4_keep"),
    )


def remove_duplicate_spans(
    docs: DataFrame,
    n: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_keys: bool = False,
) -> DataFrame:
    """Substring-level dedup REMOVAL (Lee et al. 2021 ExactSubstr):
    cut from every document each word position covered by an n-token
    span that occurs more than once corpus-wide, and rebuild the
    document from the surviving words. duplicate_span_stats is the
    flag-only sibling; this is the transform that actually ships the
    deduplicated bytes.

    Returns (doc_id, n_words, n_removed_words, clean_text) for every
    doc; clean_text is the surviving NORMALIZED words (lowercased,
    punctuation-stripped — the paper operates on the token stream)
    joined with single spaces, '' when the whole doc was duplicated.

    Plan shape, sized for 10^12 rows:
      * one posexplode of the span stream → corpus-wide span counts
        via a map-side-combined hash agg (two span-keyed shuffles,
        AQE skew-join covering hyper-duplicated boilerplate spans);
      * ONLY the duplicated span start positions flow back — a
        doc-keyed shuffle of small int arrays, never the token stream;
      * reconstruction is scan-local array algebra on the pinned
        words attribute: covered = flatten(sequence(s, s+n-1)),
        keep = array_except(sequence(1, W), covered) — hash-set
        semantics, O(W + covered), no per-word membership scan, then
        element_at gather. A spam doc that is 100% duplicated costs
        O(W), not O(W²).
    ``hash_keys=True`` swaps the span string for xxhash64 right after
    the explode (the 10^12-row shuffle-bytes form; birthday-bound note
    at duplicate_span_stats).
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"), _words(F.col(text_col)).alias("_w")
    ).localCheckpoint(eager=False)  # pin: both the explode and the rebuild read it
    spans = words.select(
        "doc_id",
        F.posexplode(_ngrams(F.col("_w"), n)).alias("_p0", "span"),
    ).select("doc_id", (F.col("_p0") + 1).alias("pos"), "span")
    if hash_keys:
        spans = spans.select("doc_id", "pos", F.xxhash64("span").alias("span"))
    counts = spans.groupBy("span").agg(F.count(F.lit(1)).alias("_cnt"))
    dup_starts = (
        spans.join(counts, "span")
        .filter(F.col("_cnt") > 1)
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("_starts"))
    )
    w = F.col("_w")
    npos = F.size(w)
    allpos = F.when(npos >= 1, F.sequence(F.lit(1), npos)).otherwise(
        F.array().cast("array<int>")
    )  # sequence(1, 0) would count DOWN in Spark — guard the empty doc
    covered = F.array_distinct(
        F.flatten(
            F.transform(
                F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
                lambda s: F.sequence(s, s + F.lit(n - 1)),
            )
        )
    )
    keep_pos = F.array_except(allpos, covered)
    return (
        words.join(dup_starts, "doc_id", "left")
        .select(
            "doc_id",
            npos.alias("n_words"),
            (npos - F.size(keep_pos)).alias("n_removed_words"),
            F.array_join(
                F.transform(keep_pos, lambda p: F.element_at(w, p)), " "
            ).alias("clean_text"),
        )
    )


def decontaminate_report(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
) -> DataFrame:
    """Contamination FORENSICS: which eval item leaked into which
    training doc. Same broadcast shape as ``decontaminate`` but the
    eval side keeps its id, so the output is one row per contaminated
    (train doc, eval item) pair with the distinct shared-gram count —
    the audit table a decontamination report/dataset card cites
    (flag-only `decontaminate` answers "drop it?", this answers
    "why, and against what").
    """
    eval_id = eval_id_col or eval_df.columns[0]
    if eval_id_col is None and eval_id == text_col:
        # same compact-id rule as decontaminate_fuzzy: never use the
        # document text itself as the broadcast/shuffle key
        eval_df = eval_df.withColumn("_eid", F.xxhash64(F.col(text_col)))
        eval_id = "_eid"
    train_g = _exploded_grams(train, id_col, text_col, n, "gram").distinct()
    eval_g = (
        _exploded_grams(eval_df, eval_id, text_col, n, "gram")
        .select(F.col("doc_id").alias("eval_id"), "gram")
        .distinct()
    )
    return (
        train_g.join(F.broadcast(eval_g), "gram")
        .groupBy("doc_id", "eval_id")
        .agg(F.count("*").alias("n_shared"))
    )


def decontaminate_fuzzy(
    train: DataFrame,
    eval_df: DataFrame,
    n: int = 5,
    threshold: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    eval_id_col: str | None = None,
) -> DataFrame:
    """FUZZY per-eval-sample decontamination (the GPT-3 appendix-C /
    Llama-2 §A.6 family of rules): a training doc is contaminated with
    respect to ONE eval sample when at least ``threshold`` of that
    sample's distinct word-``n``-grams appear among the training doc's
    distinct n-grams. Unlike the any-shared-gram rule
    (``decontaminate``), a single boilerplate phrase cannot condemn a
    page — the overlap must cover a real fraction of the eval item —
    and unlike a corpus-level gram-set rule, the fraction is judged
    per eval SAMPLE, which is what leakage of a benchmark question
    actually looks like.

    Returns one row per flagged (doc_id, eval_id) pair:
    (doc_id, eval_id, n_shared, eval_grams, overlap_frac) with
    overlap_frac = n_shared / eval_grams rounded to 4dp, filtered to
    overlap_frac >= threshold. Eval items with fewer than ``n`` words
    contribute no grams and therefore never flag (same convention as
    the exact rule).

    Plan shape at 10^12 train rows: the train side pays ONE doc-keyed
    distinct (the same cost decontaminate already pays); the eval gram
    table and the per-eval-item gram totals are both broadcast (eval
    benchmarks are KB-MB scale), so the hit-count aggregation is the
    only additional shuffle and its key (doc_id, eval_id) is bounded
    by the pair fan-out, not the corpus. The threshold filter sits on
    the aggregate, so only flagged pairs ever leave the reduce side.
    When the eval frame has no id column (its first column IS the
    text, the curate(decontam_eval=) shape), eval_id is synthesized
    as xxhash64(text) — carrying the full document text as the id
    would repeat it on every broadcast gram row and in the hits
    shuffle key (review r05).
    """
    eval_id = eval_id_col or eval_df.columns[0]
    if eval_id_col is None and eval_id == text_col:
        eval_df = eval_df.withColumn("_eid", F.xxhash64(F.col(text_col)))
        eval_id = "_eid"
    eval_g = (
        _exploded_grams(eval_df, eval_id, text_col, n, "gram")
        .select(F.col("doc_id").alias("eval_id"), "gram")
        .distinct()
    )
    eval_tot = eval_g.groupBy("eval_id").agg(
        F.count(F.lit(1)).alias("eval_grams")
    )
    train_g = _exploded_grams(train, id_col, text_col, n, "gram").distinct()
    hits = (
        train_g.join(F.broadcast(eval_g), "gram")
        .groupBy("doc_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    return (
        hits.join(F.broadcast(eval_tot), "eval_id")
        .select(
            "doc_id",
            "eval_id",
            "n_shared",
            "eval_grams",
            F.round(F.col("n_shared") / F.col("eval_grams"), 4).alias(
                "overlap_frac"
            ),
        )
        .filter(F.col("n_shared") >= F.col("eval_grams") * F.lit(threshold))
    )


# ------------------------------------------------ Gopher quality rules
# Rae et al. 2021 (Gopher, §A1.1 "Quality filtering") — the doc-level
# rule set (the repetition rules live in repetition_stats above).
GOPHER_REQUIRED_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_bound_cols(text: Column) -> list[Column]:
    """The bound-array attributes the Gopher quality rules read
    (``_t``/``_ws``/``_lines``/``_lw``) — projected FIRST so every
    higher-order lambda slices a bound attribute instead of
    re-splitting the document (the _ngrams inlining trap). Shared by
    gopher_quality_flags and annotate.annotate's one-scan signal
    pass."""
    return [
        text.alias("_t"),
        F.filter(F.split(text, r"\s+"), lambda w: w != F.lit("")).alias(
            "_ws"
        ),
        F.filter(
            F.transform(F.split(text, "\n"), lambda line: F.trim(line)),
            lambda lt: lt != F.lit(""),
        ).alias("_lines"),
        _words(text).alias("_lw"),
    ]


def gopher_keep_col(
    min_words: int = 50,
    max_words: int = 100_000,
    rename: dict[str, str] | None = None,
) -> Column:
    """The published threshold conjunction over the (already rounded)
    gopher measure columns of the current projection. ``rename`` maps
    canonical measure names to the projection's aliases (annotate
    prefixes the two that collide with the quality family)."""
    r = rename or {}

    def c(name: str) -> Column:
        return F.col(r.get(name, name))

    return (
        (c("n_words") >= min_words)
        & (c("n_words") <= max_words)
        & (c("mean_word_len") >= 3)
        & (c("mean_word_len") <= 10)
        & (c("symbol_ratio") < 0.1)
        & (c("bullet_line_frac") < 0.9)
        & (c("ellipsis_line_frac") <= 0.3)
        & (c("alpha_word_frac") >= 0.8)
        & (c("n_required_stopwords") >= 2)
    )


def gopher_measure_cols(rename: dict[str, str] | None = None) -> list:
    """The seven rounded Gopher A1.1 measures, as aliased Columns over
    the bound attributes of ``gopher_bound_cols`` (``_t``/``_ws``/
    ``_lines``/``_lw``). Single source of truth shared by
    gopher_quality_flags and annotate.annotate — ``rename`` remaps
    output aliases for callers whose projection already uses a name
    (annotate's quality-family n_words/mean_word_len)."""
    r = rename or {}
    t = F.col("_t")
    nw = F.size(F.col("_ws"))
    nl = F.size(F.col("_lines"))
    n_ellipsis = (
        F.length(t) - F.length(F.replace(t, F.lit("...")))
    ) / 3 + (F.length(t) - F.length(F.replace(t, F.lit("…"))))
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#")))
    mean_wl = F.when(
        nw > 0,
        F.aggregate(
            F.col("_ws"), F.lit(0).cast("long"), lambda a, w: a + F.length(w)
        )
        / nw,
    ).otherwise(F.lit(0.0))
    frac_alpha = F.when(
        nw > 0,
        F.size(F.filter(F.col("_ws"), lambda w: w.rlike("[a-zA-Z]"))) / nw,
    ).otherwise(F.lit(0.0))
    bullet_frac = F.when(
        nl > 0,
        F.size(F.filter(F.col("_lines"), lambda lt: lt.rlike(r"^[-*•]"))) / nl,
    ).otherwise(F.lit(0.0))
    ellipsis_frac = F.when(
        nl > 0,
        F.size(
            F.filter(F.col("_lines"), lambda lt: lt.rlike(r"(\.\.\.|…)$"))
        )
        / nl,
    ).otherwise(F.lit(0.0))
    symbol_ratio = F.when(nw > 0, (n_hash + n_ellipsis) / nw).otherwise(
        F.lit(0.0)
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct(F.col("_lw")),
            F.array(*[F.lit(s) for s in GOPHER_REQUIRED_STOPWORDS]),
        )
    )
    return [
        nw.alias(r.get("n_words", "n_words")),
        F.round(mean_wl, 4).alias(r.get("mean_word_len", "mean_word_len")),
        F.round(symbol_ratio, 4).alias("symbol_ratio"),
        F.round(bullet_frac, 4).alias("bullet_line_frac"),
        F.round(ellipsis_frac, 4).alias("ellipsis_line_frac"),
        F.round(frac_alpha, 4).alias("alpha_word_frac"),
        n_stop.alias("n_required_stopwords"),
    ]


def gopher_quality_flags(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """Gopher's published document-level quality rules as one pure
    scan-level projection (zero shuffles, all codegen / single-level
    HOFs over projected arrays — the split lands in a bound attribute
    first, see _ngrams' inlining trap):

      * min_words <= word count <= max_words (whitespace tokens);
      * 3 <= mean word length <= 10;
      * symbol-to-word ratio (# and ... occurrences) < 0.1;
      * < 90% of lines start with a bullet (- * •);
      * <= 30% of lines end with an ellipsis (... or …);
      * >= 80% of words contain an alphabetic character;
      * >= 2 of the 8 required English stopwords present.

    Returns docs' id plus every rule's measured value and the
    conjunction ``gopher_keep`` — thresholding stays inspectable, the
    caller filters (curate's heuristic quality_score is the shallow
    cousin; this is the paper's exact rule set).
    """
    proj = docs.select(
        F.col(id_col).alias("doc_id"), *gopher_bound_cols(F.col(text_col))
    )
    out = proj.select("doc_id", *gopher_measure_cols())
    return out.withColumn(
        "gopher_keep", gopher_keep_col(min_words, max_words)
    )


# Gopher §A1.2 "repetition removal" thresholds (Rae et al. 2021,
# Table A1). A document is dropped when ANY measured fraction exceeds
# its threshold; `gopher_repetition_flags` emits every measured value
# so the policy stays inspectable.
GOPHER_REPETITION_THRESHOLDS = {
    "dup_line_frac": 0.30,
    "dup_para_frac": 0.30,
    "dup_line_char_frac": 0.20,
    "dup_para_char_frac": 0.20,
    "top2_char_frac": 0.20,
    "top3_char_frac": 0.18,
    "top4_char_frac": 0.16,
    "dup5_char_frac": 0.15,
    "dup6_char_frac": 0.14,
    "dup7_char_frac": 0.13,
    "dup8_char_frac": 0.12,
    "dup9_char_frac": 0.11,
    "dup10_char_frac": 0.10,
}


def gopher_repetition_flags(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher's full §A1.2 repetition-removal rule set (Rae et al.
    2021, Table A1) — 13 per-document statistics plus the conjunction
    ``rep_keep``:

      * duplicate line / paragraph fraction (occurrences beyond the
        first, over total occurrences) <= 0.30;
      * duplicate line / paragraph CHARACTER fraction (chars of the
        occurrences beyond the first, over len(text)) <= 0.20;
      * top word-{2,3,4}-gram character fraction (count x chars of the
        single heaviest n-gram, over len(text)) <= 0.20/0.18/0.16;
      * duplicate word-{5..10}-gram character fraction (count x chars
        summed over every n-gram seen more than once, over len(text))
        <= 0.15/0.14/0.13/0.12/0.11/0.10.

    Two documented simplifications vs the DeepMind reference code
    (kept because they are order-preserving repetition signals that an
    ANSI-SQL oracle can replicate exactly): the "top" n-gram is the
    one maximizing count x chars (not most-common-then-chars — ties
    differ only when two grams tie on mass anyway), and gram character
    masses count OVERLAPPING occurrences multiply instead of marking
    covered character positions once, so a pathological doc can score
    > 1.0 (an even stronger drop signal; thresholds unchanged).

    Plan shape (the 100 TB story): every unit family — trimmed lines,
    blank-line-split paragraphs, word n-grams for n=2..10 — is tagged
    into ONE exploded (doc_id, u, g) stream from bound array
    attributes (the split lands in a projected column first; an
    inlined split would re-evaluate per element, see _ngrams). One
    map-side-combined hash agg per (doc_id, u, g), one per (doc_id,
    u), then a conditional-aggregation pivot per doc — every shuffle
    key starts with doc_id, so skew is bounded by the largest single
    document and no corpus-wide key ever concentrates. The join back
    to the 2-column (doc_id, n_chars) projection is column-pruned at
    the scan.
    """
    text = F.col(text_col)
    proj = docs.select(
        F.col(id_col).alias("doc_id"),
        _words(text).alias("_w"),
        F.filter(
            F.transform(F.split(text, "\n"), lambda ln: F.trim(ln)),
            lambda t: t != F.lit(""),
        ).alias("_lines"),
        F.filter(
            F.transform(F.split(text, "\n\n"), lambda p: F.trim(p)),
            lambda t: t != F.lit(""),
        ).alias("_paras"),
    )
    def _tag(label: str):
        # one-arg factory: a `lambda g, n=n:` default would make pyspark
        # pass the element INDEX as the second lambda argument
        return lambda g: F.struct(F.lit(label).alias("u"), g.alias("g"))

    tagged = F.concat(
        F.transform(F.col("_lines"), _tag("line")),
        F.transform(F.col("_paras"), _tag("para")),
        *[
            F.transform(_ngrams(F.col("_w"), n), _tag(f"g{n:02d}"))
            for n in range(2, 11)
        ],
    )
    units = proj.select("doc_id", F.explode(tagged).alias("t")).select(
        "doc_id", F.col("t.u").alias("u"), F.col("t.g").alias("g")
    )
    per_gram = units.groupBy("doc_id", "u", "g").agg(F.count("*").alias("c"))
    per_u = per_gram.select(
        "doc_id", "u", "c", F.length("g").alias("glen")
    ).groupBy("doc_id", "u").agg(
        F.sum("c").alias("n_units"),
        F.sum(F.col("c") - 1).alias("n_dup"),
        F.sum((F.col("c") - 1) * F.col("glen")).alias("dup_chars_extra"),
        F.sum(F.when(F.col("c") > 1, F.col("c") * F.col("glen"))).alias(
            "dup_chars_all"
        ),
        F.max(F.col("c") * F.col("glen")).alias("top_chars"),
    )

    def _u(u: str, col: Column) -> Column:
        return F.max(F.when(F.col("u") == u, col))

    pivoted = per_u.groupBy("doc_id").agg(
        _u("line", F.col("n_dup") / F.col("n_units")).alias("_dlf"),
        _u("para", F.col("n_dup") / F.col("n_units")).alias("_dpf"),
        _u("line", F.col("dup_chars_extra")).alias("_dlc"),
        _u("para", F.col("dup_chars_extra")).alias("_dpc"),
        *[_u(f"g{n:02d}", F.col("top_chars")).alias(f"_t{n}") for n in (2, 3, 4)],
        *[
            _u(f"g{n:02d}", F.col("dup_chars_all")).alias(f"_d{n}")
            for n in range(5, 11)
        ],
    )
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.length(F.col(text_col)).alias("n_chars")
    )
    j = base.join(pivoted, "doc_id", "left")

    def _frac(col: Column) -> Column:
        return F.round(F.coalesce(col, F.lit(0.0)), 4)

    nc = F.when(F.col("n_chars") > 0, F.col("n_chars")).otherwise(F.lit(None))
    out = j.select(
        "doc_id",
        _frac(F.col("_dlf")).alias("dup_line_frac"),
        _frac(F.col("_dpf")).alias("dup_para_frac"),
        _frac(F.col("_dlc") / nc).alias("dup_line_char_frac"),
        _frac(F.col("_dpc") / nc).alias("dup_para_char_frac"),
        *[
            _frac(F.col(f"_t{n}") / nc).alias(f"top{n}_char_frac")
            for n in (2, 3, 4)
        ],
        *[
            _frac(F.col(f"_d{n}") / nc).alias(f"dup{n}_char_frac")
            for n in range(5, 11)
        ],
    )
    keep = F.lit(True)
    for name, thr in GOPHER_REPETITION_THRESHOLDS.items():
        keep = keep & (F.col(name) <= F.lit(thr))
    return out.withColumn("rep_keep", keep)


def dedup_lines_within_doc(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Intra-document exact line deduplication (the RefinedWeb /
    MassiveText "repeated line" cleanup): every line keeps only its
    FIRST occurrence within the page; whitespace-only lines always
    survive (they are paragraph structure, not content — removing
    them would merge unrelated paragraphs downstream).

    Returns ``docs`` with ``text_col`` rebuilt from the kept lines
    plus (n_lines, n_removed). Matching is on the RAW line bytes
    (no trim-normalization), so "  footer" and "footer" are distinct
    — normalization is ``textnorm``'s job, upstream.

    Plan shape: a pure scan-level projection, ZERO shuffles — the
    cross-corpus sibling (``dedup.paragraph_dedup``) needs a
    paragraph-keyed exchange; this one never leaves the row. The line
    array is projected to a bound attribute first, then ONE
    single-level higher-order filter keeps index i iff
    ``array_position(lines, x) == i + 1``. array_position inside the
    lambda is O(lines) per element → O(lines²) per DOCUMENT worst
    case (interpreted HOF, CodegenFallback) — bounded by the largest
    single page, never by the corpus; a boilerplate-heavy mega-page
    (>~10^4 lines) should route through a hash-set mapInPandas
    instead, the same trade documented at ``_ngrams``.
    """
    others = [c for c in docs.columns if c != text_col]
    lines = F.split(F.col(text_col), "\n")
    proj = docs.select(*others, lines.alias("_lines"))
    kept = F.filter(
        F.col("_lines"),
        lambda x, i: (F.trim(x) == F.lit(""))
        | (F.array_position(F.col("_lines"), x) == i + F.lit(1)),
    )
    return proj.select(
        *others,
        F.array_join(kept, "\n").alias(text_col),
        F.size(F.col("_lines")).alias("n_lines"),
        (F.size(F.col("_lines")) - F.size(kept)).alias("n_removed"),
    )


def char_span_dup_stats(
    docs: DataFrame,
    L: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = False,
) -> DataFrame:
    """Character-level duplicated-span signal — the codepoint-window
    sibling of ``duplicate_span_stats``. Lee et al.'s suffix-array
    ExactSubstr operates on BYTES, not tokens: character windows catch
    boilerplate that crosses token boundaries, reflowed whitespace
    variants that re-tokenize differently, and no-space scripts (CJK)
    where "50 tokens" is meaningless. Per document: the fraction of
    its length-``L`` codepoint windows that occur more than once
    corpus-wide.

    Returns (doc_id, n_spans, dup_char_span_frac) for docs with
    >= L codepoints.

    Two span streams, identical downstream plan (map-side-combined
    count on the span key -> join back -> per-doc aggregate):

      exact=False (default, the scale path) — an Arrow-batched
        ``mapInPandas`` emits one xxhash-style 64-bit ROLLING
        polynomial hash per window: codepoints come from one
        ``encode('utf-32-le')`` + ``np.frombuffer`` per doc, and the
        Horner update is L vectorized numpy ops over the whole doc
        (O(n*L) word-ops, no per-window string ever materialized —
        the window stream that leaves Python is 8-byte keys, the same
        ~30-60x shuffle-byte cut as duplicate_span_stats'
        hash_keys=True, with the same ~d^2/2^65 birthday bound).

      exact=True (the oracle form) — windows as real substrings via a
        projected-length transform. Spark's UTF-8 ``substring`` seeks
        O(i) to position i, so this form is O(n^2/L) per doc — fine
        at oracle scale, wrong at 10^12 rows; the DuckDB mirror in
        plans/trainingdata.q_char_spans compares it byte-exactly, and
        the hashed path is pinned equal to it on collision-free
        corpora in tests/test_trainingdata_ops.py.
    """
    if exact:
        spans = docs.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("_t"),
            F.length(text_col).alias("_n"),
        ).filter(F.col("_n") >= L).select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - F.lit(L) + 1),
                    lambda i: F.substring(F.col("_t"), i, F.lit(L)),
                )
            ).alias("span"),
        )
    else:
        import numpy as _np
        import pandas as _pd

        B = _np.uint64(1099511628211)  # FNV-ish odd multiplier

        def roll(batches):
            for pdf in batches:
                ids, sizes, hs = [], [], []
                for did, t in zip(pdf[id_col], pdf[text_col]):
                    if t is None:
                        continue
                    cp = _np.frombuffer(
                        t.encode("utf-32-le"), dtype=_np.uint32
                    ).astype(_np.uint64)
                    n = cp.size
                    if n < L:
                        continue
                    h = _np.zeros(n - L + 1, dtype=_np.uint64)
                    for i in range(L):
                        h = h * B + cp[i : n - L + 1 + i]
                    ids.append(did)
                    sizes.append(h.size)
                    hs.append(h.view(_np.int64))
                if ids:
                    yield _pd.DataFrame(
                        {
                            # object-dtype repeat keeps the id's own
                            # type (long OR string url) intact
                            "doc_id": _np.repeat(
                                _np.asarray(ids, dtype=object), sizes
                            ),
                            "span": _np.concatenate(hs),
                        }
                    )

        id_t = docs.schema[id_col].dataType.simpleString()
        spans = docs.select(
            F.col(id_col).alias(id_col), text_col
        ).mapInPandas(roll, f"doc_id {id_t}, span long")
    counts = spans.groupBy("span").agg(F.count(F.lit(1)).alias("_cnt"))
    return (
        spans.join(counts, "span")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.round(F.avg((F.col("_cnt") > 1).cast("double")), 4).alias(
                "dup_char_span_frac"
            ),
        )
    )


def remove_duplicate_char_spans(
    docs: DataFrame,
    L: int = 50,
    text_col: str = "text",
    id_col: str = "doc_id",
    exact: bool = False,
) -> DataFrame:
    """Char-level ExactSubstr REMOVAL — the transform sibling of
    ``char_span_dup_stats``, and the codepoint twin of
    ``remove_duplicate_spans``: cut every character position covered
    by an L-codepoint window that occurs more than once corpus-wide,
    and rebuild each document from the surviving characters. This is
    the form closest to Lee et al.'s actual suffix-array dedup, which
    removes byte ranges, not token ranges — it preserves the original
    bytes (case, punctuation, whitespace) outside the cut regions,
    where the token-level sibling ships a normalized word stream.

    Returns (doc_id, n_chars, n_removed_chars, clean_text) for every
    doc; docs shorter than L pass through untouched.

    Plan shape at 10^12 rows mirrors remove_duplicate_spans:
      * window keys from the rolling-hash stream (``exact=False``,
        default: 8-byte keys, positions ride along) or real substrings
        (``exact=True``, the DuckDB-oracle form);
      * corpus-wide counts via a map-side-combined hash agg; ONLY
        duplicated start positions shuffle back per doc (int arrays,
        never text);
      * the rebuild is one Arrow-batched pass per doc: a difference
        array over the starts (np.add.at) + cumsum gives the covered
        mask in O(n_chars + n_starts) — a fully-duplicated spam doc
        costs O(n), not O(n·L) — then the kept codepoints reassemble
        via one utf-32 slice.
    """
    import numpy as _np
    import pandas as _pd

    id_t = docs.schema[id_col].dataType.simpleString()
    # pin: the span stream AND the rebuild join both read this
    # projection — without it a nondeterministic upstream could pair
    # rebuild rows with dup-start arrays from a different execution
    # (the pack_assignments/remove_duplicate_spans pin rationale)
    base = docs.select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("_t")
    ).localCheckpoint(eager=False)
    if exact:
        spans = base.withColumn("_n", F.length("_t")).filter(
            F.col("_n") >= L
        ).select(
            "doc_id",
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(1), F.col("_n") - F.lit(L) + 1),
                    lambda i: F.substring(F.col("_t"), i, F.lit(L)),
                )
            ).alias("_p0", "span"),
        ).select("doc_id", (F.col("_p0") + 1).alias("pos"), "span")
    else:
        B = _np.uint64(1099511628211)

        def roll_pos(batches):
            for pdf in batches:
                ids, sizes, ps, hs = [], [], [], []
                for did, t in zip(pdf["doc_id"], pdf["_t"]):
                    if t is None:
                        continue
                    cp = _np.frombuffer(
                        t.encode("utf-32-le"), dtype=_np.uint32
                    ).astype(_np.uint64)
                    n = cp.size
                    if n < L:
                        continue
                    h = _np.zeros(n - L + 1, dtype=_np.uint64)
                    for i in range(L):
                        h = h * B + cp[i : n - L + 1 + i]
                    ids.append(did)
                    sizes.append(h.size)
                    ps.append(_np.arange(1, h.size + 1, dtype=_np.int32))
                    hs.append(h.view(_np.int64))
                if ids:
                    yield _pd.DataFrame(
                        {
                            "doc_id": _np.repeat(
                                _np.asarray(ids, dtype=object), sizes
                            ),
                            "pos": _np.concatenate(ps),
                            "span": _np.concatenate(hs),
                        }
                    )

        spans = base.mapInPandas(
            roll_pos, f"doc_id {id_t}, pos int, span long"
        )
    counts = spans.groupBy("span").agg(F.count(F.lit(1)).alias("_cnt"))
    dup_starts = (
        spans.join(counts, "span")
        .filter(F.col("_cnt") > 1)
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("_starts"))
    )

    def rebuild(batches):
        for pdf in batches:
            out_id, out_n, out_rm, out_txt = [], [], [], []
            for did, t, starts in zip(
                pdf["doc_id"], pdf["_t"], pdf["_starts"]
            ):
                if t is None:
                    continue
                cp = _np.frombuffer(t.encode("utf-32-le"), dtype=_np.uint32)
                n = cp.size
                if starts is None or (
                    hasattr(starts, "__len__") and len(starts) == 0
                ):
                    out_id.append(did)
                    out_n.append(n)
                    out_rm.append(0)
                    out_txt.append(t)
                    continue
                s = _np.asarray(starts, dtype=_np.int64) - 1
                diff = _np.zeros(n + 1, dtype=_np.int32)
                _np.add.at(diff, s, 1)
                _np.add.at(diff, _np.minimum(s + L, n), -1)
                covered = _np.cumsum(diff[:-1]) > 0
                kept = cp[~covered]
                out_id.append(did)
                out_n.append(n)
                out_rm.append(int(covered.sum()))
                out_txt.append(
                    kept.tobytes().decode("utf-32-le") if kept.size else ""
                )
            if out_id:
                yield _pd.DataFrame(
                    {
                        "doc_id": out_id,
                        "n_chars": _np.asarray(out_n, dtype=_np.int32),
                        "n_removed_chars": _np.asarray(out_rm, dtype=_np.int32),
                        "clean_text": out_txt,
                    }
                )

    return (
        base.join(dup_starts, "doc_id", "left")
        .mapInPandas(
            rebuild,
            f"doc_id {id_t}, n_chars int, n_removed_chars int,"
            " clean_text string",
        )
    )


def remove_host_boilerplate_lines(
    docs: DataFrame,
    min_pages: int = 2,
    url_col: str = "url",
    text_col: str = "text",
    min_line_chars: int = 1,
    hash_keys: bool = False,
) -> DataFrame:
    """Site-template line removal (the CCNet/RefinedWeb crawl-hygiene
    trick): a line that appears on >= ``min_pages`` DISTINCT pages of
    the same host is navigation/footer/cookie-banner boilerplate, not
    content — cut it from every page of that host and rebuild the
    documents in line order. Host-scoped on purpose: "Home | About |
    Contact" repeats within a site, while a sentence repeating across
    UNRELATED hosts is real duplication and belongs to the span/dedup
    family instead.

    Returns (url, n_lines, n_removed_lines, clean_text); lines
    shorter than ``min_line_chars`` codepoints (default: empty lines)
    are never counted or removed, so paragraph structure survives.

    Plan (scale): explode lines once → (host, line, url) distinct
    (the page-multiplicity guard: a line repeated WITHIN one page
    counts once) → map-side-combined (host, line) count → the small
    boilerplate line set anti-joins back against the line stream →
    one url-keyed rebuild agg (array_sort on (pos, line) structs,
    array_join). Three keyed shuffles, all map-side combinable; skew
    is bounded per host-template line by the distinct-page count.
    ``hash_keys=True`` swaps the line string for xxhash64(line) in
    the count/anti-join keys (8-byte shuffle keys at 10^12 rows,
    birthday-bound note at duplicate_span_stats); the string-keyed
    default is what the DuckDB oracle replays byte-exactly
    (plans/trainingdata.q_host_boilerplate).
    """
    from .hoststats import canonical_host

    base = docs.select(
        F.col(url_col).alias("url"),
        F.col(text_col).alias("_t"),
        canonical_host(F.col(url_col)).alias("_h"),
    ).localCheckpoint(eager=False)  # pin: line stream + final join both read it
    lines = base.select(
        "url",
        "_h",
        F.posexplode(F.split(F.col("_t"), "\n")).alias("pos", "line"),
    )
    key = F.xxhash64("line") if hash_keys else F.col("line")
    eligible = lines.filter(F.length("line") >= min_line_chars).select(
        "_h", key.alias("_k"), "url"
    )
    boiler = (
        eligible.distinct()
        .groupBy("_h", "_k")
        .agg(F.count(F.lit(1)).alias("_np"))
        .filter(F.col("_np") >= min_pages)
        .select("_h", "_k")
    )
    kept = lines.withColumn("_k", key).join(
        boiler, ["_h", "_k"], "left_anti"
    )
    rebuilt = kept.groupBy("url").agg(
        F.count(F.lit(1)).alias("_n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("clean_text"),
    )
    return (
        base.select("url", F.size(F.split(F.col("_t"), "\n")).alias("n_lines"))
        .join(rebuilt, "url", "left")
        .select(
            "url",
            "n_lines",
            (F.col("n_lines") - F.coalesce(F.col("_n_kept"), F.lit(0))).alias(
                "n_removed_lines"
            ),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )

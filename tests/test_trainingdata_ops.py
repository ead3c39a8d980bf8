"""Semantic tests for dedup / similarity / textstats / multimodal ops:
planted duplicates must be found, ANN must rank the planted neighbor
first, the multimodal stub must round-trip binary through Arrow."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nidaba_spark.operators import dedup, multimodal, similarity, textstats


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog near the river bank every day"
    rows = [
        (0, base),
        (1, base),  # exact dup of 0
        (2, base + " tonight"),  # near dup of 0
        (3, "completely different text about spark query engines and shuffles"),
        (4, "another unrelated document mentioning partitions and codegen stages"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_exact_dedup(docs):
    out = {r["keep_id"]: r["n_dupes"] for r in dedup.exact_dedup(docs).collect()}
    assert out[0] == 2  # docs 0 and 1 collapse, keep lowest id
    assert out[2] == 1 and out[3] == 1


def test_ngram_jaccard_finds_near_dups(docs):
    pairs = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    assert pairs[(0, 1)] == 1.0
    assert (0, 2) in pairs and pairs[(0, 2)] > 0.8
    assert (0, 3) not in pairs


def test_ngram_jaccard_prefix_filter_is_exact(spark):
    """Prefix filtering must equal the naive all-pairs join row for row —
    including on a duplicate cluster of multiplicity 150, the exact
    shape where the old global df-cap (100) candidate stage went blind
    (every shared token's df exceeded the cap, so even jaccard=1.0
    pairs vanished — ADVICE r02)."""
    dup = "identical boilerplate page repeated across many mirror hosts verbatim"
    rows = [(i, dup) for i in range(150)]
    rows += [(200, dup + " with one extra trailing token appended")]
    rows += [(201, "an unrelated control document about watermarks and streaming state")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])

    fast = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    naive = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard_pairs(docs, threshold=0.5, prefix_filter=False).collect()
    }
    assert fast == naive
    assert fast[(0, 149)] == 1.0  # the cliff pair: inside a 150-dup cluster
    assert (0, 200) in fast  # near-dup of the big cluster
    assert len(fast) == 150 * 149 // 2 + 150  # C(150,2) dups + 150 near-dups


def test_minhash_lsh_finds_near_dups(docs):
    pairs = {(r["id_a"], r["id_b"]) for r in dedup.minhash_lsh_pairs(docs, threshold=0.5).collect()}
    assert (0, 1) in pairs
    assert (0, 3) not in pairs and (3, 4) not in pairs


def test_simhash_pairs(docs):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in dedup.simhash_pairs(docs, max_hamming=3).collect()}
    assert pairs[(0, 1)] == 0  # identical text -> identical simhash
    assert (0, 3) not in pairs


def test_ann_brute_force_ranks_planted_neighbor(spark):
    import math

    def unit(i, tweak=0.0):
        v = [math.sin(i * 17.0 + j) for j in range(8)]
        v[0] += tweak
        return [float(x) for x in v]

    vectors = spark.createDataFrame(
        [(i, unit(i)) for i in range(20)] + [(100, unit(0, 0.01))],
        ["vec_id", "embedding"],
    )
    queries = spark.createDataFrame([(0, unit(0))], ["query_id", "embedding"])
    top = similarity.brute_force_topk(vectors, queries, k=3).collect()
    ranked = [r["vec_id"] for r in sorted(top, key=lambda r: r["rank"])]
    assert ranked[0] == 0 and ranked[1] == 100  # self first, planted near-dup second


def test_ann_lsh_recall_on_self(spark):
    import math

    vectors = spark.createDataFrame(
        [(i, [float(math.sin(i * 13.0 + j)) for j in range(8)]) for i in range(50)],
        ["vec_id", "embedding"],
    )
    queries = vectors.filter(F.col("vec_id") < 5).withColumnRenamed("vec_id", "query_id")
    got = similarity.lsh_topk(vectors, queries, k=3, bands=3, band_bits=2, dim=8).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["sim"]))
    for q, hits in by_q.items():
        best = min(hits)[1]
        assert best == q and min(hits)[0] == 1  # self is always in its own bucket

def test_textstats_columns(spark):
    df = spark.createDataFrame([(1, "The quick fox. It is near the bank!")], ["doc_id", "text"])
    row = df.select(
        "doc_id",
        *textstats.quality_features(F.col("text")),
        textstats.token_count_ws(F.col("text")).alias("ws"),
        textstats.token_count_bpe(F.col("text")).alias("bpe"),
        textstats.fingerprint(F.col("text")).alias("fp"),
        textstats.quality_score(F.col("text")).alias("q"),
    ).collect()[0]
    assert row["n_words"] == 8
    assert row["ws"] == 8
    assert row["bpe"] > 8  # subword pieces + punctuation
    assert 0 <= row["q"] <= 1
    assert row["fp"] > 0
    assert row["stop_ratio"] > 0  # 'the', 'it', 'is'


def test_lang_id_runs_deterministically(spark):
    df = spark.createDataFrame(
        [(1, "the cat and the dog are running"), (2, "le chat et les chiens de la maison")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r["lang_pred"] for r in textstats.lang_id(df).collect()}
    assert out[1] == "en" and out[2] == "fr"


def test_multimodal_stub_roundtrip(spark):
    docs = spark.createDataFrame([(1, "hello world"), (2, "")], ["doc_id", "text"])
    media = multimodal.synthesize_media(docs)
    feats = multimodal.extract_features(media).collect()
    by_id = {r["media_id"]: r for r in feats}
    assert by_id[1]["n_bytes"] == 11
    import hashlib

    assert by_id[1]["sha"] == hashlib.sha256(b"hello world").hexdigest()
    assert len(by_id[1]["features"]) == 8
    # real decoder seam stays unimplemented in-sandbox
    with pytest.raises(NotImplementedError):
        multimodal.decode_media(b"xx", "png")


def test_streaming_windowed_agg(spark, tmp_path):
    """Tumbling-window stateful aggregation over a replayed file (B47)."""
    from nidaba_spark.sources.tables import load
    from nidaba_spark.streaming.events import hourly_event_counts_stream

    sf = "/root/testdata/sf0.001"
    schema = load(spark, sf, "events").schema
    import os

    out = hourly_event_counts_stream(
        spark, os.path.join(sf, "events.parquet"), schema, str(tmp_path)
    )
    # wait: file path must be staged into a dir for the file source
    total_stream = out.agg(F.sum("n")).collect()[0][0]
    total_batch = load(spark, sf, "events").count()
    assert total_stream == total_batch


def test_multimodal_resize(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 500), (2, "short"), (3, "")], ["doc_id", "text"]
    )
    media = multimodal.synthesize_media(docs)
    out = {r["media_id"]: r for r in multimodal.resize_media(media, 64, 64).collect()}
    # long payload subsampled to width*height/64 = 64 bytes, dims updated
    assert len(bytes(out[1]["payload"])) == 64
    assert out[1]["meta"]["width"] == 64 and out[1]["meta"]["height"] == 64
    # short payloads pass through unchanged; empty stays empty
    assert bytes(out[2]["payload"]) == b"short"
    assert bytes(out[3]["payload"]) == b""
    # injection seam: a real resizer slots in without touching the plan
    blanker = lambda payload, fmt, w, h: b"\x00" * 4  # noqa: E731
    out2 = multimodal.resize_media(media, 64, 64, resizer=blanker).collect()
    assert all(bytes(r["payload"]) == b"\x00" * 4 for r in out2)


def test_multimodal_sample_frames(spark):
    docs = spark.createDataFrame([(1, "a" * 100)], ["doc_id", "text"])
    media = multimodal.synthesize_media(docs).withColumn(
        "meta",
        F.struct(
            F.lit("video").alias("media_type"),
            F.lit("fake/raw").alias("format"),
            F.lit(0).alias("width"),
            F.lit(0).alias("height"),
            F.lit(2500).cast("long").alias("duration_ms"),
        ),
    )
    rows = multimodal.sample_frames(media, every_ms=1000, frame_bytes=32).collect()
    # duration 2500ms at 1 frame/s -> 3 frames, capped by payload (100//32=3)
    assert [r["frame_idx"] for r in rows] == [0, 1, 2]
    assert [r["ts_ms"] for r in rows] == [0, 1000, 2000]
    assert all(r["n_bytes"] == 32 for r in rows)
    assert bytes(rows[0]["frame"]) == b"a" * 32


def test_duplicate_span_stats_hash_keys_equivalent(spark):
    """The xxhash64-keyed 10^12-row form (hash_keys=True) must produce
    the identical result on a collision-free corpus — both a hand case
    with intra/cross-doc duplicate spans and the sf0.001 documents
    table at the production n=50 window (VERDICT r04 next #5)."""
    import os

    from nidaba_spark.operators.filters import duplicate_span_stats

    hand = spark.createDataFrame(
        [
            (1, "a b c d"),
            (2, "a b c"),
            (3, "x y z w"),
            (4, "e e e e"),
            (5, "too short"),
        ],
        "doc_id long, text string",
    )
    rows = lambda df: sorted(tuple(r) for r in df.collect())  # noqa: E731
    assert rows(duplicate_span_stats(hand, n=3, hash_keys=True)) == rows(
        duplicate_span_stats(hand, n=3, hash_keys=False)
    )
    sf = os.environ.get("NIDABA_TEST_SF", "/root/testdata/sf0.001")
    docs = spark.read.parquet(os.path.join(sf, "documents.parquet"))
    assert rows(duplicate_span_stats(docs, n=50, hash_keys=True)) == rows(
        duplicate_span_stats(docs, n=50, hash_keys=False)
    )


def test_compression_ratio_signal(spark):
    from nidaba_spark.operators.textstats import compression_ratio

    rows = [
        (0, "the " * 500),                                   # pure repetition
        (1, " ".join(f"word{i} and some natural prose here" for i in range(100))),
        (2, "kqzjxv bwpmtr yfhgdl " * 2 + "cnsqwe rvtyuo plmkij"),  # gibberish-ish
        (3, ""),                                             # empty -> 1.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in compression_ratio(df).collect()}
    assert got[0]["compression_ratio"] < 0.05                # repetition crushes
    assert got[0]["compression_ratio"] < got[1]["compression_ratio"]
    assert got[1]["compression_ratio"] < got[2]["compression_ratio"]
    assert got[3]["compression_ratio"] == 1.0
    assert got[1]["n_bytes"] > 0
    # determinism under repartition
    again = {r["doc_id"]: r for r in compression_ratio(df.repartition(3)).collect()}
    assert all(got[k]["compression_ratio"] == again[k]["compression_ratio"] for k in got)


def test_char_span_dup_stats_hashed_equals_exact(spark):
    """The rolling-hash scale path must agree with the substring-keyed
    oracle form, including cases word-level spans cannot see: a repeat
    that crosses token boundaries with different surrounding tokens,
    and a no-space CJK repeat."""
    from nidaba_spark.operators.filters import char_span_dup_stats

    boiler = "exactly twenty chars"  # 20 codepoints
    hand = spark.createDataFrame(
        [
            (1, f"alpha {boiler} omega filler text one two"),
            (2, f"begin {boiler} differently continued here"),
            (3, "totally unrelated content with no repeats at all"),
            (4, "漢字文化圏の共通テキストという二十字の列がある" * 2),
            (5, "漢字文化圏の共通テキストという二十字の列がある padding"),
            (6, "short"),  # < L: must drop from the output
        ],
        "doc_id long, text string",
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    exact = rows(char_span_dup_stats(hand, L=20, exact=True))
    hashed = rows(char_span_dup_stats(hand, L=20, exact=False))
    assert exact == hashed
    by_id = {r[0]: r for r in exact}
    assert 6 not in by_id
    # the shared 20-char window duplicates for docs 1 and 2 even though
    # their word tokenizations differ
    assert by_id[1][2] > 0 and by_id[2][2] > 0
    assert by_id[3][2] == 0.0
    # CJK repeat detected with no whitespace tokens at all
    assert by_id[4][2] > 0 and by_id[5][2] > 0


def test_remove_duplicate_char_spans_hashed_equals_exact(spark):
    """Rolling-hash removal ≡ substring-keyed removal, bytes preserved
    outside cut regions, fully-duplicated doc empties, short docs pass
    through untouched."""
    from nidaba_spark.operators.filters import remove_duplicate_char_spans

    boiler = "exactly twenty chars"
    dup_doc = "A fully duplicated page body here ok"  # 36 chars
    hand = spark.createDataFrame(
        [
            (1, f"Alpha! {boiler} And Omega; stays AS-IS."),
            (2, f"Begin, {boiler} differently continued."),
            (3, "totally unrelated content with no repeats at all"),
            (4, dup_doc),
            (5, dup_doc),
            (6, "short"),
        ],
        "doc_id long, text string",
    )

    def rows(df):
        return sorted(map(tuple, df.collect()))

    exact = rows(remove_duplicate_char_spans(hand, L=20, exact=True))
    hashed = rows(remove_duplicate_char_spans(hand, L=20, exact=False))
    assert exact == hashed
    by_id = {r[0]: r for r in exact}
    # every doc appears, including sub-L ones (untouched)
    assert set(by_id) == {1, 2, 3, 4, 5, 6}
    assert by_id[6] == (6, 5, 0, "short")
    assert by_id[3][2] == 0 and by_id[3][3].startswith("totally")
    # the shared window region was cut from docs 1 and 2, but the
    # distinct surroundings keep their ORIGINAL bytes (case, punct)
    # the shared region spans " {boiler} " INCLUDING both flanking
    # spaces (they are common bytes too), so the rebuilt docs splice
    # directly: "Alpha!" + "And ..."
    assert by_id[1][2] > 0 and boiler not in by_id[1][3]
    assert by_id[1][3] == "Alpha!And Omega; stays AS-IS."
    assert by_id[2][3].startswith("Begin,differently")
    # both copies of a fully-duplicated doc empty (every window dups)
    assert by_id[4] == (4, 36, 36, "") and by_id[5] == (5, 36, 36, "")


def test_remove_host_boilerplate_lines(spark):
    """Host-scoped template removal laws: cross-page repeats on the
    SAME host go, the same line on an unrelated host stays, a line
    repeated twice WITHIN one page counts as one page, empty lines
    always survive, hash_keys ≡ string keys."""
    from nidaba_spark.operators.filters import remove_host_boilerplate_lines

    nav = "Home | About | Contact"
    rows = [
        ("https://a.com/1", f"{nav}\nunique body one\n\nfooter a"),
        ("https://a.com/2", f"{nav}\nunique body two\nfooter a"),
        # nav repeated twice within the ONLY b.com page -> 1 page, kept
        ("https://b.com/1", f"{nav}\n{nav}\nbody bee"),
        ("https://c.com/1", "all alone here"),
        ("https://a.com/3", f"{nav}\nfooter a"),  # all lines boiler -> empties
    ]
    df = spark.createDataFrame(rows, "url string, text string")

    def by_url(df_):
        return {r["url"]: r for r in df_.collect()}

    out = by_url(remove_host_boilerplate_lines(df, min_pages=2))
    hashed = by_url(
        remove_host_boilerplate_lines(df, min_pages=2, hash_keys=True)
    )
    assert {u: tuple(r) for u, r in out.items()} == {
        u: tuple(r) for u, r in hashed.items()
    }
    # a.com: nav + footer removed everywhere, bodies + blank line kept
    assert out["https://a.com/1"]["clean_text"] == "unique body one\n"
    assert out["https://a.com/1"]["n_removed_lines"] == 2
    assert out["https://a.com/2"]["clean_text"] == "unique body two"
    assert out["https://a.com/3"]["clean_text"] == ""
    assert out["https://a.com/3"]["n_removed_lines"] == 2
    # b.com keeps nav: one distinct page only
    assert out["https://b.com/1"]["clean_text"] == f"{nav}\n{nav}\nbody bee"
    assert out["https://c.com/1"]["clean_text"] == "all alone here"

"""End-to-end curation composition (nidaba_spark/curate.py).

Stage operators carry their own oracles/gates; this pins the
COMPOSITION: monotone surviving counts, per-stage invariants holding
on the final output, determinism, and the packing prefix-sum
consistency over exactly the surviving set.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nidaba_spark import curate, schemas


@pytest.fixture(scope="module")
def pages(spark, pages_path):
    return spark.read.parquet(pages_path)


@pytest.fixture(scope="module")
def curated(spark, pages):
    return curate.curate(
        pages,
        min_quality=0.4,
        source_rates={"en": 0.6},
        default_rate=1.0,
        pack_budget=512,
        npartitions=8,
    ).cache()


def test_invariants_hold_on_output(spark, pages, curated):
    rows = sorted(curated.collect(), key=lambda r: r["url"])
    assert 0 < len(rows) < pages.count()  # something survived, something filtered
    # urls unique (recrawl + text dedup)
    assert len({r["url"] for r in rows}) == len(rows)
    # quality floor respected
    assert all(r["quality"] >= 0.4 for r in rows)
    # texts unique (exact dedup happened)
    assert len({r["text"] for r in rows}) == len(rows)
    # packing prefix-sum consistency over EXACTLY the surviving set
    acc = 0
    for r in rows:  # url order == packing order
        assert r["tokens_before"] == acc
        assert r["pack_id"] == acc // 512
        acc += r["n_tokens"]


def test_deterministic(spark, pages, curated):
    again = curate.curate(
        pages,
        min_quality=0.4,
        source_rates={"en": 0.6},
        default_rate=1.0,
        pack_budget=512,
        npartitions=3,  # different parallelism, same answer
    )
    a = sorted(tuple(r) for r in curated.collect())
    b = sorted(tuple(r) for r in again.collect())
    assert a == b


def test_mixing_tightening_shrinks(spark, pages, curated):
    tighter = curate.curate(
        pages,
        min_quality=0.4,
        source_rates={"en": 0.2},
        default_rate=1.0,
        pack_budget=512,
        npartitions=8,
    )
    urls = {r["url"] for r in curated.select("url").collect()}
    turls = {r["url"] for r in tighter.select("url").collect()}
    assert turls < urls  # nested subset, strictly smaller


def test_hygiene_stages_compose(spark, pages, curated):
    base_urls = {r["url"] for r in curated.select("url").collect()}
    base_rows = {r["url"]: r for r in curated.collect()}
    # eval set = one surviving doc's exact text -> decontamination must
    # drop at least that url
    victim = sorted(base_urls)[0]
    eval_df = spark.createDataFrame(
        [(base_rows[victim]["text"],)], "text string"
    )
    out = curate.curate(
        pages,
        min_quality=0.4,
        source_rates={"en": 0.6},
        default_rate=1.0,
        pack_budget=512,
        npartitions=8,
        pii_redact=True,
        repetition_max_frac=0.18,
        dup_span_max_frac=0.95,
        dup_span_n=8,
        decontam_eval=eval_df,
        near_dup_threshold=0.9,
    )
    rows = sorted(out.collect(), key=lambda r: r["url"])
    urls = {r["url"] for r in rows}
    # hygiene only removes (PII redaction can alter text, but the
    # surviving url set must be a subset of the baseline's)
    assert urls <= base_urls
    assert victim not in urls
    # quality floor still holds and packing is still consistent over
    # exactly the surviving set
    acc = 0
    for r in rows:
        assert r["quality"] >= 0.4
        assert r["tokens_before"] == acc
        assert r["pack_id"] == acc // 512
        acc += r["n_tokens"]
    # determinism under different parallelism
    again = curate.curate(
        pages,
        min_quality=0.4,
        source_rates={"en": 0.6},
        default_rate=1.0,
        pack_budget=512,
        npartitions=3,
        pii_redact=True,
        repetition_max_frac=0.18,
        dup_span_max_frac=0.95,
        dup_span_n=8,
        decontam_eval=eval_df,
        near_dup_threshold=0.9,
    )
    assert sorted(tuple(r) for r in rows) == sorted(
        tuple(r) for r in again.collect()
    )


def test_decontam_bloom_path_matches_exact(spark, pages, curated):
    """curate(decontam_bloom_fpp=tight) must produce byte-identical
    output to the exact broadcast-join path: bloom membership of an
    inserted key is certain, and at fpp=1e-9 the deterministic
    false-positive set over this corpus is empty."""
    base_rows = {r["url"]: r for r in curated.collect()}
    victim = sorted(base_rows)[0]
    eval_df = spark.createDataFrame([(base_rows[victim]["text"],)], "text string")
    kwargs = dict(
        min_quality=0.4, pack_budget=512, npartitions=8, decontam_eval=eval_df
    )
    exact = sorted(tuple(r) for r in curate.curate(pages, **kwargs).collect())
    bloom = sorted(
        tuple(r)
        for r in curate.curate(pages, decontam_bloom_fpp=1e-9, **kwargs).collect()
    )
    assert bloom == exact
    assert victim not in {t[0] for t in bloom}


def test_decontam_fuzzy_stage_boilerplate_tolerant(spark, pages, curated):
    """The fuzzy per-eval-sample path drops a wholesale leak (the eval
    item IS a surviving doc's text -> coverage 1.0) but KEEPS a doc
    that shares only one stray gram with a long eval item — the exact
    any-shared-gram rule drops both."""
    base_rows = {r["url"]: r for r in curated.collect()}
    ordered = sorted(base_rows)
    victim, brushed = ordered[0], ordered[1]
    # eval item 1: a full copy of victim's text. eval item 2: five of
    # brushed's words (one shared gram) diluted in 20 unique words.
    brush_words = base_rows[brushed]["text"].lower().split()[:5]
    diluted = " ".join(brush_words + [f"zq{i}x" for i in range(20)])
    eval_df = spark.createDataFrame(
        [(base_rows[victim]["text"],), (diluted,)], "text string"
    )
    kwargs = dict(
        min_quality=0.4, pack_budget=512, npartitions=8, decontam_eval=eval_df
    )
    exact_urls = {r["url"] for r in curate.curate(pages, **kwargs).collect()}
    fuzzy_urls = {
        r["url"]
        for r in curate.curate(
            pages, decontam_fuzzy_threshold=0.8, **kwargs
        ).collect()
    }
    assert victim not in exact_urls and victim not in fuzzy_urls
    assert brushed not in exact_urls  # one stray gram condemns it
    assert brushed in fuzzy_urls  # fuzzy coverage ~1/21 < 0.8 keeps it


def test_robots_stage_drops_disallowed(spark, pages, curated):
    """curate(robots_df=) honors per-host robots.txt before parsing:
    a host that disallows everything for our agent vanishes from the
    output; hosts without robots rows are untouched."""
    base_urls = {r["url"] for r in curated.select("url").collect()}
    victim_host = sorted(base_urls)[0].split("/")[2]
    robots_df = spark.createDataFrame(
        [
            (victim_host, "User-agent: curatebot\nDisallow: /\n"),
            # decoy: disallows only a path no synthetic url has
            ("site1.example", "User-agent: *\nDisallow: /nope\n"),
        ],
        "host string, robots_txt string",
    )
    out = curate.curate(
        pages,
        min_quality=0.4,
        source_rates={"en": 0.6},
        default_rate=1.0,
        pack_budget=512,
        npartitions=8,
        robots_df=robots_df,
        robots_agent="curatebot",
    )
    urls = {r["url"] for r in out.select("url").collect()}
    assert urls == {u for u in base_urls if u.split("/")[2] != victim_host}


def test_compression_band_stage_wired(spark, pages, curated):
    base_urls = {r["url"] for r in curated.select("url").collect()}
    out = curate.curate(
        pages, min_quality=0.4, source_rates={"en": 0.6}, default_rate=1.0,
        pack_budget=512, npartitions=8, compression_band=(0.0, 1.0),
    )
    all_band = {r["url"] for r in out.select("url").collect()}
    assert all_band == base_urls  # full band is a no-op on the url set
    tight = curate.curate(
        pages, min_quality=0.4, source_rates={"en": 0.6}, default_rate=1.0,
        pack_budget=512, npartitions=8, compression_band=(0.45, 1.0),
    )
    tight_urls = {r["url"] for r in tight.select("url").collect()}
    assert tight_urls < base_urls  # the most compressible docs dropped


def test_split_stage_wired(spark, pages, curated):
    base = sorted(tuple(r) for r in curated.collect())
    out = curate.curate(
        pages, min_quality=0.4, source_rates={"en": 0.6}, default_rate=1.0,
        pack_budget=512, npartitions=8,
        splits={"train": 0.8, "val": 0.1, "test": 0.1},
    )
    rows = out.collect()
    assert set(out.columns) == set(curated.columns) | {"split"}
    # assignment, not a filter: same rows, same pack ids
    assert sorted(tuple(r)[:-1] for r in rows) == base
    assert {r["split"] for r in rows} <= {"train", "val", "test"}


def test_host_cap_stage_wired(spark, pages):
    from nidaba_spark.operators import hoststats

    # the synthetic corpus is one-host-per-url; collapse to 3 hosts
    # (url stays unique — the original url rides as the path)
    squeezed = pages.withColumn(
        "url",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.xxhash64("url"), F.lit(3)).cast("string"),
            F.lit(".example/"),
            F.col("url"),
        ),
    )
    out = curate.curate(
        squeezed, min_quality=0.0, pack_budget=512, npartitions=8,
        max_docs_per_host=10,
    )
    counts = [
        r["n"]
        for r in out.groupBy(
            hoststats.canonical_host(F.col("url")).alias("h")
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    ]
    assert counts and all(n <= 10 for n in counts)


def test_paragraph_dedup_stage_wired(spark, pages):
    out = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
        paragraph_dedup=True,
    )
    rows = out.select("url", "text").collect()
    assert rows
    # the stage's defining invariant: every paragraph is corpus-unique
    paras = [p for r in rows for p in r["text"].split("\n\n") if p]
    assert len(paras) == len(set(paras))
    assert all(r["text"] != "" for r in rows)


def test_canonical_url_dedup_stage_wired(spark, pages):
    """Planted robots-noindex pages vanish; pages declaring a shared
    rel=canonical target keep at most one member — and the baseline
    (flag off) keeps several, so the stage caused it."""
    body = F.decode("html", "ISO-8859-1")
    bucket = F.pmod(F.xxhash64("url"), F.lit(10))
    marked = pages.withColumn(
        "html",
        F.encode(
            F.concat(
                F.when(
                    bucket == 0,
                    F.lit('<meta name="robots" content="noindex">'),
                ).otherwise(F.lit("")),
                F.when(
                    bucket == 1,
                    F.lit(
                        '<link rel="canonical" href="https://shared.example/one">'
                    ),
                ).otherwise(F.lit("")),
                body,
            ),
            "ISO-8859-1",
        ),
    )
    noindex_urls = {r["url"] for r in marked.filter(bucket == 0).select("url").collect()}
    canon_urls = {r["url"] for r in marked.filter(bucket == 1).select("url").collect()}
    assert len(noindex_urls) >= 2 and len(canon_urls) >= 2

    base = {
        r["url"]
        for r in curate.curate(
            marked, min_quality=0.0, pack_budget=512, npartitions=8
        ).select("url").collect()
    }
    out = {
        r["url"]
        for r in curate.curate(
            marked, min_quality=0.0, pack_budget=512, npartitions=8,
            canonical_url_dedup=True,
        ).select("url").collect()
    }
    assert base & noindex_urls and len(base & canon_urls) >= 2
    assert not (out & noindex_urls)
    assert len(out & canon_urls) <= 1


def test_host_authority_prior_wired(spark, pages):
    """Docs on a below-floor-authority host vanish; hosts absent from
    the graph are kept (no link data is not evidence of spam)."""
    squeezed = pages.withColumn(
        "url",
        F.concat(
            F.lit("https://h"),
            F.pmod(F.xxhash64("url"), F.lit(3)).cast("string"),
            F.lit(".example/"),
            F.col("url"),
        ),
    )
    authority = spark.createDataFrame(
        [("www.h0.example", 0.05), ("h1.example", 0.60)],
        "node string, rank double",
    )  # h2.example absent from the graph
    out = curate.curate(
        squeezed, min_quality=0.0, pack_budget=512, npartitions=8,
        host_authority=authority, min_host_authority=0.5,
    )
    from nidaba_spark.operators.hoststats import canonical_host

    hosts = {
        r["h"]
        for r in out.select(canonical_host(F.col("url")).alias("h")).distinct().collect()
    }
    assert "h0.example" not in hosts  # below floor (www-form matched too)
    assert {"h1.example", "h2.example"} <= hosts


def test_lm_floor_stage_wired(spark, pages):
    """Survivors re-scored against the same reference all clear the
    floor, and the floor actually bit (some pre-filter doc was below)."""
    from nidaba_spark.operators.lm import stupid_backoff_score
    from nidaba_spark import pipeline

    docs = (
        pipeline.extract(pages, npartitions=8)
        .filter(F.col("text") != "")
        .select("url", "text")
    )
    # deterministic reference slice (a bare limit() varies across jobs
    # and the ref is re-evaluated by every scoring call)
    ref = docs.orderBy("url").limit(40).select("text")
    scores = stupid_backoff_score(
        docs, ref.withColumn("url", F.col("text")), id_col="url"
    ).select("avg_logscore").collect()
    vals = sorted(r["avg_logscore"] for r in scores)
    floor = vals[len(vals) // 2]  # median: guaranteed to bite
    assert vals[0] < floor

    out = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
        lm_ref=ref, lm_min_logscore=floor,
    )
    rescored = stupid_backoff_score(
        out.select("url", "text"), ref.withColumn("url", F.col("text")), id_col="url"
    ).collect()
    assert rescored and min(r["avg_logscore"] for r in rescored) >= floor


def test_model_score_filter_wired(spark, pages):
    out = curate.curate(
        pages,
        min_quality=0.4,
        source_rates={"en": 0.6},
        default_rate=1.0,
        pack_budget=512,
        npartitions=8,
        min_model_score=0.5,
    )
    # every survivor clears the model floor (re-scored independently);
    # no subset-of-baseline claim — removing a text-dedup representative
    # legitimately promotes a different url for the same text
    from nidaba_spark.operators.quality_model import featurize, score

    rows = score(featurize(out.select("url", "text"))).select("model_score").collect()
    assert rows, "model filter emptied the corpus"
    assert min(r["model_score"] for r in rows) >= 0.5


def test_curate_cli_end_to_end(spark, pages_path, tmp_path, monkeypatch):
    """jobs/curate_corpus.py writes the pinned packed-example schema
    and reuses the active test session (tune_session path)."""
    import os
    import sys

    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "jobs")
    )
    import curate_corpus

    out = str(tmp_path / "curated.parquet")
    wet_out = str(tmp_path / "wet")
    cdx_out = str(tmp_path / "cdx")
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "curate_corpus.py",
            "--input", pages_path,
            "--output", out,
            "--min-quality", "0.4",
            "--rate", "en=0.6",
            "--pack-budget", "512",
            "--npartitions", "8",
            "--wet-out", wet_out, "--wet-segments", "2",
            "--cdx-out", cdx_out,
        ],
    )
    curate_corpus.main()
    written = spark.read.parquet(out)
    assert written.columns == [
        "url", "n_tokens", "tokens_before", "pack_id", "pack_pos",
        "quality", "text",
    ]
    rows = sorted(written.collect(), key=lambda r: r["tokens_before"])
    assert rows
    acc = 0
    for r in rows:
        assert r["tokens_before"] == acc
        acc += r["n_tokens"]
    # --cdx-out builds the serveable index over the WET export: one
    # capture per curated row, offsets resolvable
    cdx_rows = spark.read.parquet(cdx_out)
    assert cdx_rows.count() == len(rows)
    assert {"surt", "warc_file", "offset", "warc_len"} <= set(cdx_rows.columns)
    from nidaba_spark.sources.rawfiles import fetch_capture

    one = cdx_rows.orderBy("surt").first()
    _, payload = fetch_capture(
        spark, one["warc_file"], one["offset"], one["warc_len"]
    )
    texts = {r["url"]: r["text"] for r in rows}
    assert payload.decode("utf-8") == texts[one["url"]]


def test_dup_span_remove_stage_wired(spark, pages):
    """With span REMOVAL on, no surviving doc contains a corpus-
    duplicated n-token span any more (re-running the stats operator on
    the output finds zero duplicated spans), and the rebuilt text is
    the normalized word stream."""
    from nidaba_spark.operators.filters import duplicate_span_stats

    out = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
        dup_span_remove=True, dup_span_n=10,
    ).select("url", "text")
    rows = out.collect()
    assert rows
    assert all(r["text"] != "" for r in rows)
    # removal is idempotent-by-construction: the output carries no
    # duplicated 10-token span (each span now occurs at most once)
    redo = duplicate_span_stats(out, n=10, id_col="url")
    assert redo.filter(F.col("dup_span_frac") > 0).count() == 0


def test_c4_clean_stage_wired(spark, pages):
    """C4 cleaning on a punctuation-planted extraction (the synthetic
    corpus is a word salad with no terminal punctuation, so the raw
    corpus would — correctly — lose every line): each paragraph
    becomes a '.'-terminated line, short paragraphs then fall to the
    >=5-word rule, <3-sentence docs drop, and every surviving line
    ends in terminal punctuation with >= 5 words."""
    from nidaba_spark import pipeline

    ext = pipeline.extract(pages, npartitions=8)
    marked = ext.withColumn(
        "text",
        F.when(F.col("text") == "", "").otherwise(
            F.concat(F.regexp_replace("text", "\n\n", ".\n"), F.lit("."))
        ),
    )
    base = curate.curate(
        None, min_quality=0.0, pack_budget=512, npartitions=8,
        pre_extracted=marked,
    ).select("url", "text")
    out = curate.curate(
        None, min_quality=0.0, pack_budget=512, npartitions=8,
        pre_extracted=marked, c4_clean=True,
    ).select("url", "text")
    rows = out.collect()
    n_base = base.count()
    assert 0 < len(rows) <= n_base
    shrunk = False
    base_len = {r["url"]: len(r["text"]) for r in base.collect()}
    for r in rows:
        for line in r["text"].split("\n"):
            assert line and line[-1] in '.!?"', (r["url"], line)
            assert len(line.split()) >= 5
        shrunk = shrunk or len(r["text"]) < base_len[r["url"]]
    assert shrunk  # at least one doc lost a short paragraph


def test_url_blocklist_stage_wired(spark, pages):
    """Blocklisted hosts vanish from the output, pattern-matched urls
    vanish, and the stage sits BEFORE extraction (flag off keeps
    them, so the stage caused it)."""
    from nidaba_spark.operators.hoststats import canonical_host

    base = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
    )
    hosts = [
        r["h"]
        for r in base.select(canonical_host(F.col("url")).alias("h"))
        .distinct()
        .limit(2)
        .collect()
    ]
    assert len(hosts) == 2
    out = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
        blocked_hosts=[hosts[0].upper()],  # canonicalization exercised
    )
    got_hosts = {
        r["h"]
        for r in out.select(canonical_host(F.col("url")).alias("h"))
        .distinct()
        .collect()
    }
    assert hosts[0] not in got_hosts and hosts[1] in got_hosts
    assert 0 < out.count() < base.count()


def test_gopher_rules_stage_wired(spark, pages):
    """The Gopher word-count floor bites on the synthetic corpus's
    short docs: the rule-set output is a strict subset of baseline and
    every survivor re-passes the flags."""
    from nidaba_spark.operators.filters import gopher_quality_flags

    base = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
    ).select("url", "text")
    out = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
        gopher_rules=True,
    ).select("url", "text")
    n_base, n_out = base.count(), out.count()
    assert 0 < n_out < n_base
    redo = gopher_quality_flags(out, id_col="url")
    assert redo.filter(~F.col("gopher_keep")).count() == 0


def test_new_hygiene_stages_compose(spark, pages, curated):
    """r05 continuation flags composed in one plan: URL blocklist +
    Gopher rules + span REMOVAL + repetition cut + PII + splits.
    Pins: something survives, the blocklisted host is gone, packing
    stays consistent over exactly the survivors, and the whole composition is deterministic
    under a different parallelism."""
    from nidaba_spark.operators.hoststats import canonical_host

    victim_host = sorted(
        r["h"]
        for r in curated.select(canonical_host(F.col("url")).alias("h"))
        .distinct()
        .limit(1)
        .collect()
    )[0]
    kwargs = dict(
        min_quality=0.4,
        source_rates={"en": 0.6},
        default_rate=1.0,
        pack_budget=512,
        blocked_hosts=[victim_host],
        gopher_rules=True,
        dup_span_remove=True,
        dup_span_n=8,
        repetition_max_frac=0.18,
        pii_redact=True,
        splits={"train": 0.9, "val": 0.1},
    )
    out = curate.curate(pages, npartitions=8, **kwargs)
    rows = sorted(out.collect(), key=lambda r: r["url"])
    assert rows
    urls = {r["url"] for r in rows}
    # NOT asserting urls <= base_urls: dup_span_remove REWRITES text
    # (normalized words), which legitimately moves quality scores
    # across the floor in both directions. The blocklist pin below is
    # the exact per-stage claim.
    assert all(
        victim_host
        not in u.split("/")[2].lower().removeprefix("www.")
        for u in urls
    )
    acc = 0
    for r in rows:
        assert r["split"] in {"train", "val"}
        assert r["tokens_before"] == acc
        assert r["pack_id"] == acc // 512
        acc += r["n_tokens"]
    again = curate.curate(pages, npartitions=3, **kwargs)
    assert sorted(tuple(r) for r in again.collect()) == [tuple(r) for r in rows]


def test_near_dup_keep_best_quality(spark, pages):
    """'best_quality' family resolution must survive the highest-
    quality member even when it is NOT the min-key rep, and the two
    policies must agree on which families exist (same drop COUNT)."""
    base = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
        near_dup_threshold=0.9,
    )
    best = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
        near_dup_threshold=0.9, near_dup_keep="best_quality",
    )
    n_base, n_best = base.count(), best.count()
    assert n_base == n_best  # one survivor per family either way
    q_base = base.agg(F.sum("quality")).collect()[0][0]
    q_best = best.agg(F.sum("quality")).collect()[0][0]
    assert q_best >= q_base  # argmax policy never loses total quality


def test_near_dup_keep_best_hand_case(spark):
    """Two near-dup pages where the min-hash rep is the LOWER quality
    one: keep_best must pick the other."""
    from nidaba_spark.operators.cluster import keep_best

    cc = spark.createDataFrame(
        [(10, 10), (20, 10), (30, 30)], "node long, rep long"
    )
    scores = spark.createDataFrame(
        [(10, 0.2), (20, 0.9), (30, 0.5)], "node long, quality double"
    )
    got = {r["rep"]: r for r in keep_best(cc, scores).collect()}
    assert got[10]["keep_node"] == 20 and got[10]["keep_score"] == 0.9
    assert got[30]["keep_node"] == 30
    # tie → min node id
    cc2 = spark.createDataFrame([(1, 1), (2, 1)], "node long, rep long")
    sc2 = spark.createDataFrame(
        [(1, 0.7), (2, 0.7)], "node long, quality double"
    )
    assert keep_best(cc2, sc2).collect()[0]["keep_node"] == 1
    # unscored node ranks below every scored sibling
    sc3 = spark.createDataFrame([(2, 0.1)], "node long, quality double")
    assert keep_best(cc2, sc3).collect()[0]["keep_node"] == 2


def test_near_dup_keep_rejects_unknown_policy(spark, pages):
    with pytest.raises(ValueError):
        curate.curate(
            pages, near_dup_threshold=0.9, near_dup_keep="newest"
        ).count()


def test_recipe_equals_explicit_flags(spark, pages):
    """A named recipe is EXACTLY curate(**RECIPES[name]) — no hidden
    extra behavior — and overrides win over the bundle."""
    via_recipe = curate.curate_recipe(pages, "c4", pack_budget=512)
    explicit = curate.curate(
        pages, pack_budget=512, **curate.RECIPES["c4"]
    )
    assert sorted(map(tuple, via_recipe.collect())) == sorted(
        map(tuple, explicit.collect())
    )


def test_recipe_override_wins(spark, pages):
    loose = curate.curate_recipe(
        pages, "gopher", near_dup_threshold=None, pack_budget=512
    )
    strict = curate.curate_recipe(pages, "gopher", pack_budget=512)
    # dropping the near-dup stage can only keep MORE documents
    assert loose.count() >= strict.count()


def test_recipe_unknown_rejected(spark, pages):
    with pytest.raises(ValueError):
        curate.curate_recipe(pages, "nosuch")


def test_unicode_nfc_stage_wired(spark, pages):
    """Two crawls whose extracted text differs only by NFC form must
    land in the same exact-dedup family when unicode_nfc=True."""
    from nidaba_spark.operators.unicodenorm import unicode_normalize

    out = curate.curate(pages, unicode_nfc=True, pack_budget=512)
    # every surviving text is already NFC (normalize is idempotent on
    # the output bytes)
    renorm = unicode_normalize(out.select("url", "text"), "text", "NFC")
    a = {(r["url"], r["text"]) for r in out.select("url", "text").collect()}
    b = {(r["url"], r["text"]) for r in renorm.collect()}
    assert a == b


def test_char_dup_span_remove_stage_wired(spark, pages):
    """String-id (url) path of remove_duplicate_char_spans inside the
    composition: planted cross-page boilerplate longer than L is cut,
    unique pages keep their text."""
    out = curate.curate(
        pages, char_dup_span_remove=True, char_dup_span_L=40,
        pack_budget=512,
    )
    base = curate.curate(pages, pack_budget=512)
    # the synthetic corpus has no 40-char cross-page repeats among
    # SURVIVORS (dedup already dropped exact copies), so the stage
    # must be a no-op on it -- count parity is the wiring check
    assert out.count() == base.count()


def test_host_boilerplate_stage_wired(spark, pages):
    """Synthetic pages share no per-host template lines among
    survivors, so the stage must be a no-op on this corpus (the
    operator's own laws live in test_trainingdata_ops) — count parity
    checks the wiring, including the string-id hash_keys path."""
    out = curate.curate(
        pages, host_boilerplate_min_pages=2, pack_budget=512
    )
    base = curate.curate(pages, pack_budget=512)
    assert out.count() == base.count()


def test_exact_dup_pages_survive_span_removal(spark):
    """Review r05: ExactSubstr removal cuts EVERY occurrence, so two
    byte-identical pages used to annihilate each other. The pre-
    collapse keeps exactly one copy."""
    rows = []
    body = " ".join(f"w{i} common page body token" for i in range(30))
    for u in ("https://x.com/a", "https://x.com/b"):  # identical twins
        rows.append((u, 1700000000 + len(rows), b"", body, "en"))
    rows.append(
        ("https://y.com/c", 1700000099, b"",
         " ".join(f"unique{i} solo doc token here" for i in range(30)), "en")
    )
    from pyspark.sql import functions as F
    pages = spark.createDataFrame(
        rows, "url string, ts long, html binary, text string, lang string"
    ).select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts"), "html",
        "text", "lang",
    )
    out = curate.curate(
        pages, min_quality=0.0, char_dup_span_remove=True,
        char_dup_span_L=40, pack_budget=512, pre_extracted=pages,
    )
    urls = {r["url"] for r in out.select("url").collect()}
    # one twin survives (keep-min-url), not zero
    assert "https://x.com/a" in urls and "https://x.com/b" not in urls
    assert "https://y.com/c" in urls


def test_host_boilerplate_composes_with_span_removal(spark):
    """Review r05: the template stage must see line structure, i.e.
    run BEFORE dup_span_remove flattens docs to a word stream."""
    from pyspark.sql import functions as F

    nav = "Home | About | Contact"
    rows = [
        (f"https://s.com/{i}", 1700000000 + i, b"",
         f"{nav}\n" + " ".join(f"p{i}w{j} body words here" for j in range(30)),
         "en")
        for i in range(3)
    ]
    pages = spark.createDataFrame(
        rows, "url string, ts long, html binary, text string, lang string"
    ).select(
        "url", F.col("ts").cast("timestamp").alias("warc_ts"), "html",
        "text", "lang",
    )
    out = curate.curate(
        pages, min_quality=0.0, host_boilerplate_min_pages=2,
        dup_span_remove=True, dup_span_n=40, pack_budget=512,
        pre_extracted=pages,
    )
    texts = [r["text"] for r in out.select("text").collect()]
    assert texts and all(nav.lower().split()[0] not in t for t in texts)
    assert all("body" in t for t in texts)  # content survived


def test_min_published_date_stage_wired(spark, pages):
    """Freshness floor causality: pages stamped with a STALE declared
    <time datetime> vanish, pages stamped FRESH survive, UNDATED pages
    pass untouched — and the baseline (flag off) keeps all three
    classes, so the stage caused the drop."""
    body = F.decode("html", "ISO-8859-1")
    bucket = F.pmod(F.xxhash64("url"), F.lit(10))
    marked = pages.withColumn(
        "html",
        F.encode(
            F.concat(
                F.when(
                    bucket == 0, F.lit('<time datetime="2015-01-01">old</time>')
                )
                .when(
                    bucket == 1, F.lit('<time datetime="2024-06-01">new</time>')
                )
                .otherwise(F.lit("")),
                body,
            ),
            "ISO-8859-1",
        ),
    )
    stale = {r["url"] for r in marked.filter(bucket == 0).select("url").collect()}
    fresh = {r["url"] for r in marked.filter(bucket == 1).select("url").collect()}
    assert len(stale) >= 2 and len(fresh) >= 2

    base = {
        r["url"]
        for r in curate.curate(
            marked, min_quality=0.0, pack_budget=512, npartitions=8
        ).select("url").collect()
    }
    out = {
        r["url"]
        for r in curate.curate(
            marked, min_quality=0.0, pack_budget=512, npartitions=8,
            min_published_date="2020-01-01",
        ).select("url").collect()
    }
    assert base & stale and base & fresh  # baseline keeps both classes
    assert not (out & stale)  # stale-dated pages dropped
    assert out & fresh  # fresh-dated pages survive
    # undated pages are untouched by the stage
    undated_base = base - stale - fresh
    undated_out = out - stale - fresh
    assert undated_base == undated_out and undated_base


def test_stitch_pagination_stage_wired(spark):
    import datetime

    def para(word):
        return (
            f"{word} part one of the guide carries exactly seventeen "
            "deterministic words so the extractor keeps this block"
        )

    def page(url, body, links="", ts=1):
        html = f"<html><head>{links}</head><body><article><p>{body}</p></article></body></html>"
        return (
            url,
            datetime.datetime(2024, 1, ts),
            html.encode(),
            body,
            "en",
        )

    s = "https://st.example.com"
    rows = [
        page(f"{s}/a/p0", para("alpha"), '<link rel="next" href="/a/p1">'),
        page(
            f"{s}/a/p1",
            para("bravo"),
            '<link rel="next" href="/a/p2"><link rel="prev" href="/a/p0">',
        ),
        # recrawl of p1: identical declarations at a later fetch — the
        # slim-declaration dedup must collapse it, not fan out edges
        page(
            f"{s}/a/p1",
            para("bravo"),
            '<link rel="next" href="/a/p2"><link rel="prev" href="/a/p0">',
            ts=2,
        ),
        # last page: prev carrier only + a next edge to an uncrawled
        # target (existence gate)
        page(
            f"{s}/a/p2",
            para("charlie"),
            '<link rel="previous" href="/a/p1"><link rel="next" href="/a/p3">',
        ),
        page(f"{s}/solo", para("delta")),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, html binary, text string, lang string"
    )
    out = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=8,
        stitch_pagination=True,
    )
    got = {r["url"]: r["text"] for r in out.collect()}
    assert set(got) == {f"{s}/a/p0", f"{s}/solo"}
    assert got[f"{s}/a/p0"] == "\n\n".join(
        [para("alpha"), para("bravo"), para("charlie")]
    )
    assert got[f"{s}/solo"] == para("delta")
    # determinism at a different parallelism
    again = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=3,
        stitch_pagination=True,
    )
    assert sorted(tuple(r) for r in out.collect()) == sorted(
        tuple(r) for r in again.collect()
    )


def test_stitch_declarations_follow_winning_fetch(spark):
    # A page redesign that DROPS pagination links must un-stitch the
    # page: declarations are taken only from the fetch whose text won
    # the recrawl dedup (latest warc_ts), never from a stale fetch.
    import datetime

    def para(word):
        return (
            f"{word} part one of the guide carries exactly seventeen "
            "deterministic words so the extractor keeps this block"
        )

    def page(url, body, links="", ts=1):
        html = (
            f"<html><head>{links}</head><body><article><p>{body}</p>"
            "</article></body></html>"
        )
        return (url, datetime.datetime(2024, 1, ts), html.encode(), body, "en")

    s = "https://redesign.example.com"
    rows = [
        # old fetch of p0 declared a chain; the NEWER fetch dropped it
        page(f"{s}/a/p0", para("alpha"), '<link rel="next" href="/a/p1">'),
        page(f"{s}/a/p0", para("newalpha"), links="", ts=2),
        page(f"{s}/a/p1", para("bravo")),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=4,
        stitch_pagination=True,
    )
    got = {r["url"]: r["text"] for r in out.collect()}
    # no stitching happened: both pages stand alone, p0 carries the
    # winning fetch's text
    assert got == {
        f"{s}/a/p0": para("newalpha"),
        f"{s}/a/p1": para("bravo"),
    }


def test_stitch_null_warc_ts_corpus(spark):
    # A single-crawl corpus without timestamps (warc_ts all NULL) must
    # still stitch: winner alignment uses eqNullSafe against the
    # per-url max ts (NULL for an all-NULL group), where null-unsafe
    # equality would silently drop every declaration.
    def para(word):
        return (
            f"{word} part one of the guide carries exactly seventeen "
            "deterministic words so the extractor keeps this block"
        )

    def page(url, body, links=""):
        html = (
            f"<html><head>{links}</head><body><article><p>{body}</p>"
            "</article></body></html>"
        )
        return (url, None, html.encode(), body, "en")

    s = "https://nots.example.com"
    rows = [
        page(f"{s}/a/p0", para("alpha"), '<link rel="next" href="/a/p1">'),
        page(f"{s}/a/p1", para("bravo"), '<link rel="prev" href="/a/p0">'),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=4,
        stitch_pagination=True,
    )
    got = {r["url"]: r["text"] for r in out.collect()}
    assert got == {f"{s}/a/p0": "\n\n".join([para("alpha"), para("bravo")])}


def test_stitch_tie_prefers_informative_declaration(spark):
    # Two fetches of one url at the identical winning warc_ts: the
    # declaration carrying a real next edge must win the dedup over
    # one whose carriers are less informative (NULLS FIRST ordering
    # would keep the empty-carrier row and split the chain).
    import datetime

    def para(word):
        return (
            f"{word} part one of the guide carries exactly seventeen "
            "deterministic words so the extractor keeps this block"
        )

    def page(url, body, links=""):
        html = (
            f"<html><head>{links}</head><body><article><p>{body}</p>"
            "</article></body></html>"
        )
        return (url, datetime.datetime(2024, 1, 1), html.encode(), body, "en")

    s = "https://tie.example.com"
    rows = [
        # same url, same ts: one fetch declares only prev (next NULL),
        # the other declares the forward edge too
        page(f"{s}/a/p1", para("bravo"), '<link rel="prev" href="/a/p0">'),
        page(
            f"{s}/a/p1",
            para("bravo"),
            '<link rel="next" href="/a/p2"><link rel="prev" href="/a/p0">',
        ),
        page(f"{s}/a/p0", para("alpha"), '<link rel="next" href="/a/p1">'),
        page(f"{s}/a/p2", para("charlie")),
    ]
    pages = spark.createDataFrame(
        rows,
        "url string, warc_ts timestamp, html binary, text string, lang string",
    )
    out = curate.curate(
        pages, min_quality=0.0, pack_budget=512, npartitions=4,
        stitch_pagination=True,
    )
    got = {r["url"]: r["text"] for r in out.collect()}
    # the informative declaration won: p2 joined the chain
    assert got == {
        f"{s}/a/p0": "\n\n".join(
            [para("alpha"), para("bravo"), para("charlie")]
        )
    }


def test_stitch_pagination_with_pre_extracted_raises(spark):
    # ADVICE r05 #2: the stitch needs raw html; silently skipping it
    # under pre_extracted misled callers — now a loud ValueError
    import pytest as _pytest

    from nidaba_spark import curate as _c

    ext = spark.createDataFrame(
        [("u", "t", "en")], "url string, text string, lang string"
    )
    with _pytest.raises(ValueError, match="stitch_pagination"):
        _c.curate(None, pre_extracted=ext, stitch_pagination=True)

"""End-to-end training-data curation: pages → packed examples.

The composition the individual operators exist for, as one documented
plan:

    extract (fused parse)            pipeline.extract
      → quality filter               textstats.quality_score
      → exact dedup (keep-min)       dedup.exact_dedup semantics
      → weighted source mixing       mixing.weighted_sample
      → sequence packing             packing.pack_assignments

Every stage is a lazy DataFrame transform — the whole flow is ONE
Catalyst plan (the extract's single salted shuffle + packing's range
shuffle; filter/dedup/mixing add a groupBy-dedup semi-join and pure
scan predicates). Each stage's operator carries its own oracle/gate;
this module pins the composition itself: monotone row counts,
determinism, and the packing invariant over the surviving set
(tests/test_curate.py).

At 10^12 rows the same composition runs staged (Pipeline.run per
phase with checkpoints/lineage between), but the OPERATORS are
identical — this single-plan form is also what the incremental path
(run_incremental) executes per crawl drop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from . import pipeline
from .functions.textnorm import normalize_words  # noqa: F401  (spec ref)
from .operators import mixing, packing
from .operators.filters import redact_pii, repetition_stats
from .operators.textstats import token_count_ws, with_quality


def curate(
    pages: DataFrame,
    min_quality: float = 0.5,
    source_rates: dict[str, float] | None = None,
    default_rate: float = 1.0,
    pack_budget: int = 1024,
    nsalt: int = 256,
    npartitions: int | None = None,
    pii_redact: bool = False,
    repetition_max_frac: float | None = None,
    gopher_rules: bool = False,
    gopher_repetition: bool = False,
    dup_span_max_frac: float | None = None,
    dup_span_n: int = 50,
    dup_span_hash_keys: bool = True,
    dup_span_remove: bool = False,
    line_dedup: bool = False,
    c4_clean: bool = False,
    decontam_eval: DataFrame | None = None,
    decontam_bloom_fpp: float | None = None,
    decontam_fuzzy_threshold: float | None = None,
    near_dup_threshold: float | None = None,
    near_dup_keep: str = "rep",
    max_docs_per_host: int | None = None,
    paragraph_dedup: bool = False,
    min_model_score: float | None = None,
    compression_band: tuple[float, float] | None = None,
    splits: dict[str, float] | None = None,
    pre_extracted: DataFrame | None = None,
    canonical_url_dedup: bool = False,
    lm_ref: DataFrame | None = None,
    lm_min_logscore: float | None = None,
    host_authority: DataFrame | None = None,
    min_host_authority: float = 0.0,
    blocked_hosts: DataFrame | list[str] | None = None,
    blocked_url_patterns: list[str] | None = None,
    max_url_score: float | None = None,
    robots_df: DataFrame | None = None,
    robots_agent: str = "*",
    unicode_nfc: bool = False,
    char_dup_span_remove: bool = False,
    char_dup_span_L: int = 200,
    host_boilerplate_min_pages: int | None = None,
    min_published_date: str | None = None,
    stitch_pagination: bool = False,
    pagination_max_pages: int = 64,
) -> DataFrame:
    """pages (url, warc_ts, html, text, lang) → packed curated docs:
    (url, n_tokens, tokens_before, pack_id, pack_pos, quality, text).

    Dedup here is BY EXTRACTED TEXT, keep-min-url (the exact_dedup
    rule on the derived corpus): a window-free groupBy + semi-join,
    so the plan stays shuffle-bounded by the dedup key.

    Optional hygiene stages (each lazy, each adding only anti-joins /
    scan-level expressions to the one plan):

      pii_redact            — codegen regexp redaction applied to the
                              extracted text BEFORE scoring/dedup, so
                              downstream hashes see the shipped bytes;
      gopher_rules          — the published Gopher §A1.1 document-
                              level quality rule set (word-count band,
                              mean word length, symbol/bullet/ellipsis
                              ratios, alpha-word fraction, required
                              stopwords; operators/filters
                              .gopher_quality_flags) as a semi-join on
                              the keep set — the paper-exact cousin of
                              the min_quality heuristic floor;
      repetition_max_frac   — drop docs whose top word-bigram mass
                              exceeds the cut (Gopher rule; anti-join
                              on the repetition_stats aggregate);
      gopher_repetition     — the FULL Gopher §A1.2 repetition-removal
                              rule set (dup line/paragraph fractions +
                              char fractions, top 2-4-gram char mass,
                              dup 5-10-gram char mass; operators/
                              filters.gopher_repetition_flags) as a
                              semi-join on rep_keep — all 13 published
                              thresholds, one exploded unit stream,
                              every shuffle keyed by doc;
      dup_span_max_frac     — drop docs whose corpus-wide duplicated
                              n-token-span fraction (Lee et al.
                              substring signal) exceeds the cut;
                              dup_span_hash_keys=True (default) runs
                              the xxhash64-keyed 10^12-row form whose
                              span shuffles carry 8-byte keys — see
                              filters.duplicate_span_stats for the
                              birthday-bound note; set False for the
                              oracle-exact string-keyed form;
      dup_span_remove       — instead of (or beside) the flag-and-drop
                              cut, REMOVE the duplicated n-token spans
                              themselves and rebuild each document
                              from the surviving words (Lee et al.
                              ExactSubstr removal; operators/filters
                              .remove_duplicate_spans). NOTE: the
                              rebuilt text is the NORMALIZED word
                              stream (lowercased, punctuation
                              stripped) — downstream hashes/dedup see
                              those bytes; docs emptied by removal
                              drop;
      host_boilerplate_min_pages — site-template line removal
                              (operators/filters
                              .remove_host_boilerplate_lines): a line
                              on >= this many distinct pages of the
                              SAME host (nav/footer/cookie banner) is
                              cut from all of them; empty lines and
                              cross-host repeats survive; runs before
                              the cross-corpus span/dedup stages with
                              hash_keys=True; docs emptied drop;
      char_dup_span_remove  — char-level ExactSubstr removal (exact
                              duplicates collapse keep-min-url first,
                              as for dup_span_remove)
                              (operators/filters
                              .remove_duplicate_char_spans): cut every
                              codepoint covered by an L-char window
                              (char_dup_span_L, default 200 ≈ the
                              50-token rule) duplicated corpus-wide
                              and keep the ORIGINAL bytes elsewhere —
                              unlike dup_span_remove's normalized
                              word stream; rolling-hash 8-byte span
                              keys; docs emptied drop;
      unicode_nfc           — NFC-normalize the extracted text bytes
                              (operators/unicodenorm) before any
                              hash-keyed stage, so composed vs
                              decomposed spellings dedup together; a
                              zero-shuffle Arrow projection;
      line_dedup            — intra-document exact line dedup
                              (RefinedWeb/MassiveText repeated-line
                              cleanup; operators/filters
                              .dedup_lines_within_doc): keep each
                              line's first occurrence, whitespace-only
                              lines survive; a pure zero-shuffle
                              projection, runs first among the text
                              transforms; docs emptied drop;
      c4_clean              — C4 page cleaning (Raffel et al. 2020
                              §2.2; operators/filters.c4_clean): line
                              filter (terminal punctuation, >=5 words,
                              no javascript) rewrites the text, page
                              rules (code brace / lorem ipsum /
                              blocklist word / >=3 surviving
                              sentences) drop the doc — all scan-level
                              codegen expressions, zero shuffles;
      decontam_eval         — drop docs sharing any word-5-gram with
                              the held-out eval DataFrame(text);
      decontam_bloom_fpp    — when set alongside decontam_eval, use
                              the Bloom-filter scale path instead of
                              the exact broadcast join: the train
                              side adds ZERO shuffles (per-doc gram
                              hashes probed against a broadcast bit
                              array) at the cost of ~fpp one-sided
                              over-removal — the right trade at
                              10^12 rows;
      decontam_fuzzy_threshold — when set alongside decontam_eval,
                              use the FUZZY per-eval-sample rule
                              (GPT-3/Llama-2 family; filters
                              .decontaminate_fuzzy) instead: a doc
                              drops only when its shared grams cover
                              >= this fraction of SOME single eval
                              item's grams — boilerplate-tolerant
                              where the any-shared-gram rule is not
                              (takes precedence over the bloom path,
                              which cannot express per-item
                              fractions);
      max_docs_per_host     — deterministic hash-ordered cap per
                              canonical host (operators/hoststats.py;
                              applied before scoring so mega-hosts
                              are cut ahead of the heavier stages —
                              the window's row_number()<=k filter
                              becomes a map-side WindowGroupLimit);
      compression_band      — (lo, hi) zlib compression-ratio band
                              (RefinedWeb "too compressible" rule —
                              repetition sinks below lo, gibberish
                              floats above hi; semi-join on the
                              in-band set);
      splits                — optional {name: fraction} (sum 1):
                              append a deterministic stratified
                              'split' column (mixing.split_assign)
                              AFTER packing — an assignment, never a
                              filter, so pack ids stay stable;
      min_model_score       — model-based quality floor beside the
                              heuristic one: the pinned-LR codegen
                              sigmoid (operators/quality_model.py)
                              as a pure scan predicate;
      paragraph_dedup       — CCNet-style corpus-wide paragraph dedup
                              on the extracted text (operators/
                              dedup.py paragraph_dedup): boilerplate
                              paragraphs survive only at their first
                              occurrence, documents are rebuilt in
                              order, emptied documents drop;
      canonical_url_dedup   — crawl hygiene BEFORE extraction (pages
                              path only; a no-op with pre_extracted):
                              drop robots-noindex pages and keep one
                              page per declared rel=canonical group
                              (operators/links.canonical_dedup
                              semantics). Cost at scale: the keep-set
                              branch re-reads (url, html) and the
                              semi-join adds one url-keyed shuffle of
                              the crawl — on the staged 10^12-row
                              pipeline, extract noindex/canonical as
                              EXTRACTED columns during the parse
                              instead and dedup at the stage
                              boundary; this flag is the single-plan
                              form;
      min_published_date    — freshness floor BEFORE extraction (pages
                              path only, needs html): drop pages whose
                              declared publish date (structured
                              .page_dates carriers — JSON-LD datePublished,
                              og article:published_time, <time datetime>,
                              /YYYY/MM/DD/ permalink) parses OLDER than
                              this ISO date; undated pages pass (absence
                              is not staleness). Pure scan predicate
                              riding the extraction scan — zero extra
                              shuffles or crawl passes;
      stitch_pagination     — multi-page article reassembly BEFORE any
                              hygiene stage (pages path only, needs
                              html): rel=next/prev chains resolved by
                              operators/pagination's pointer-doubling
                              list ranking, each chain's surviving
                              members replaced by ONE document at the
                              head url with the extracted texts joined
                              in reading order (so a 5-page article is
                              not 5 short docs to Gopher rules or
                              dedup); pagination_max_pages bounds the
                              doubling horizon. Costs one url-keyed
                              shuffle of the slim declaration table,
                              one map-side-combined (url, max ts)
                              aggregate over the two-column raw scan
                              (winner alignment), and one chain-keyed
                              groupBy over participants only;
      lm_ref +
      lm_min_logscore       — Stupid-Backoff bigram-LM floor (the
                              CCNet perplexity-filter shape,
                              operators/lm.py): docs scoring below
                              the floor against the REFERENCE corpus
                              (lm_ref, e.g. a wiki-quality sample)
                              are dropped. Both must be set together;
                              the LM model tables self-materialize
                              (one reference-corpus scan);
      host_authority +
      min_host_authority    — domain-authority prior: a (host, rank)
                              DataFrame (the dress rehearsal's
                              linkgraph/authority output — PageRank
                              over the crawl's own host graph); docs
                              whose canonical host ranks below the
                              floor are dropped, docs on hosts ABSENT
                              from the graph are kept (no-link-data
                              is not evidence of spam). The host
                              table is tiny relative to the corpus
                              (one row per host) and broadcasts;
                              applied with the host cap, before the
                              heavier stages;
      blocked_hosts +
      blocked_url_patterns  — RefinedWeb-style URL filtering as the
                              FIRST stage (a blocklisted page never
                              pays for parsing): canonical-host
                              broadcast anti-join + one OR-folded
                              regex scan predicate (operators/
                              hoststats.filter_blocked); applies to
                              the crawl or, with pre_extracted, to
                              the extracted table's urls;
      max_url_score         — the SOFT side of RefinedWeb URL
                              filtering: drop pages whose lexical
                              url_score (digit-stuffed/IP hosts,
                              param junk, weighted keyword hits —
                              operators/urlqual) reaches the cut;
                              pure codegen scan predicate, applied
                              with the hard blocklist;
      robots_df +
      robots_agent          — robots.txt politeness gate right after
                              the blocklist (operators/robots.py):
                              robots_df is (host, robots_txt); pages
                              the effective rule set disallows for
                              robots_agent are dropped before parsing
                              (or, with pre_extracted, before any
                              hygiene stage). Host-keyed rules join +
                              zero-shuffle longest-match expression;
      near_dup_threshold    — MinHash-LSH near-dup pairs at this
                              Jaccard threshold resolved into clusters
                              by connected components; only each
                              cluster's representative (min 64-bit
                              url-hash key — deterministic) survives.
      near_dup_keep         — 'rep' (default, min-key member) or
                              'best_quality' (operators/cluster
                              .keep_best: argmax heuristic quality
                              per family, tiebreak min key — keeps
                              the clean twin instead of the
                              boilerplate-ridden one).
                              NOTE: this stage is iterative, so unlike
                              every other stage it runs Spark jobs at
                              curate() call time (the CC fixpoint
                              loop); the surviving-set anti-join it
                              leaves behind is lazy as usual.
    """
    # pre_extracted = the staged-pipeline composition seam: when the
    # extraction already ran as a checkpointed Pipeline (its own
    # lineage + resume), pass its EXTRACTED table here and curation
    # starts from that stage boundary instead of re-extracting —
    # jobs/full_corpus_job.py is the end-to-end user. `pages` may then
    # be None.
    if stitch_pagination and pre_extracted is not None:
        # loud failure, matching extract()'s unknown-mode ValueError:
        # the stitch needs the raw html pages (rel=next/prev link
        # declarations), so silently skipping it here let callers
        # believe multi-page articles were reassembled when nothing
        # happened (ADVICE r05 #2)
        raise ValueError(
            "stitch_pagination=True requires the raw pages path; it "
            "cannot run from pre_extracted (no html to read "
            "pagination declarations from) — stitch before the "
            "Pipeline checkpoint, or curate from pages"
        )
    if blocked_hosts is not None or blocked_url_patterns:
        from .operators.hoststats import filter_blocked

        # URL filtering is the FIRST stage: a blocklisted page should
        # never pay for parsing. Broadcast anti-join + scan predicate,
        # zero crawl-side shuffles (operators/hoststats.filter_blocked).
        if pre_extracted is None:
            pages = filter_blocked(pages, blocked_hosts, blocked_url_patterns)
        else:
            pre_extracted = filter_blocked(
                pre_extracted, blocked_hosts, blocked_url_patterns
            )
    if max_url_score is not None:
        from .operators.urlqual import url_quality_filter

        # SOFT url scoring right after the hard blocklist — same
        # rationale (junk pages never pay for parsing), same shape
        # (pure codegen scan predicate, zero shuffles).
        if pre_extracted is None:
            pages = url_quality_filter(pages, max_score=max_url_score)
        else:
            pre_extracted = url_quality_filter(
                pre_extracted, max_score=max_url_score
            )
    if robots_df is not None:
        from .operators.robots import robots_filter

        # politeness gate right after the blocklist: a disallowed page
        # never pays for parsing (pages path) or any hygiene stage
        # (pre_extracted path). Host-keyed rules join + zero-shuffle
        # longest-match expression; see operators/robots.py.
        if pre_extracted is None:
            pages = robots_filter(pages, robots_df, agent=robots_agent).filter(
                F.col("robots_allowed")
            ).drop("robots_allowed")
        else:
            pre_extracted = robots_filter(
                pre_extracted, robots_df, agent=robots_agent
            ).filter(F.col("robots_allowed")).drop("robots_allowed")
    if min_published_date is not None and pre_extracted is None:
        from .operators.structured import published_on_or_after

        # freshness floor on the RAW pages (needs html, so pages-path
        # only, like canonical_url_dedup): drop pages whose declared
        # publish date (structured.page_dates carriers — JSON-LD / og /
        # <time> / permalink path) parses and is older than the floor;
        # UNDATED pages pass — absence is not staleness. A pure
        # scan-level predicate riding the extraction scan: zero extra
        # shuffles, zero extra passes over the crawl.
        pages = pages.filter(published_on_or_after(min_published_date))
    if canonical_url_dedup and pre_extracted is None:
        from .operators.links import page_meta

        meta = page_meta(pages).select("url", "noindex", "canonical")
        keep_urls = (
            meta.filter(~F.col("noindex"))
            .select(F.coalesce("canonical", "url").alias("_c"), "url")
            .groupBy("_c")
            .agg(F.min("url").alias("url"))
        )
        pages = pages.join(keep_urls, "url", "left_semi")
    ext = (
        pre_extracted
        if pre_extracted is not None
        else pipeline.extract(pages, nsalt=nsalt, npartitions=npartitions)
    )
    # recrawl dedup first — keep the LATEST crawl per url, so url is
    # unique downstream and the text-dedup semi-join key is sound.
    # row_number()==1, NOT groupBy(max)+semi-join: two crawls of a url
    # at the IDENTICAL max warc_ts would both survive the semi-join,
    # fanning out every downstream url-keyed join (ADVICE r04). Ties
    # break deterministically by min text hash; rn<=1 compiles to a
    # map-side WindowGroupLimit so a hot url is bounded per upstream
    # partition before the one url-keyed shuffle.
    from pyspark.sql import Window

    w_url = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.xxhash64("text"), F.col("lang")
    )
    ext1 = (
        ext.withColumn("_rn", F.row_number().over(w_url))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    docs = ext1.filter(F.col("text") != "").select(
        "url", "text", F.col("lang").alias("source")
    )
    if stitch_pagination and pre_extracted is None:
        from .operators.pagination import (
            chains_from_links,
            ordered_concat,
            pagination_links,
        )

        # Lazy localCheckpoint: the stitch references the extraction
        # subtree in THREE branches (the crawled-url existence gate,
        # the solo filter, the stitched groupBy). Without
        # lineage truncation, correctness still holds but the
        # heavyweight Python parse can execute once per branch when
        # exchange reuse fails to fire (AQE re-planning one side) —
        # the NOTES double-execution trap. One materialization, three
        # cheap re-reads.
        docs = docs.localCheckpoint(eager=False)

        # multi-page articles reassembled into ONE document before any
        # hygiene stage sees them (a 5-page article must not count as
        # 5 short docs for Gopher rules or dedup). Declarations come
        # from the same narrow codegen scan shape as the other page-
        # metadata carriers; recrawl dedup on the SLIM declaration
        # table (latest fetch wins, carrier values break ties) instead
        # of a second pass over page bytes; resolution is existence-
        # gated on the urls that actually survived extraction +
        # recrawl dedup, so a dropped head simply promotes its
        # successor to head. Stitching itself is one chain-keyed
        # groupBy over the participants only — solo pages (the vast
        # majority of any crawl) never enter it.
        lk = pagination_links(pages, extra_cols=("warc_ts",)).filter(
            # only declarers enter the url-keyed dedup shuffle — an
            # all-null row generates no edge, and at the 10^12-row
            # design point the undeclared majority must never shuffle
            F.col("next_url").isNotNull() | F.col("prev_url").isNotNull()
        )
        # declarations must come from the fetch whose TEXT won the
        # recrawl dedup (max warc_ts — w_url's leading key), so a
        # stale fetch's <link> edges can never stitch a newer fetch's
        # text (a page that dropped its pagination on redesign stays
        # un-stitched). The winning timestamp comes from a MAP-SIDE-
        # COMBINED (url, max(warc_ts)) aggregate over the RAW pages
        # scan (column-pruned to two columns), NOT a join against the
        # checkpointed extraction output: its shuffle carries ~70-byte
        # rows beside the text dedup's full-text url shuffle, and the
        # semi-join's other side is the slim declarer table. eqNullSafe
        # keeps timestamp-less corpora stitching (all-NULL group max is
        # NULL; null-unsafe equality would silently drop every
        # declaration there). Residual corner, deterministic by the
        # tie-breaks on both sides: two DIFFERENT fetches at the
        # identical winning warc_ts may contribute text (min
        # xxhash64(text)) and declarations (informative-first below) —
        # eliminating it would need a shared fetch id carried through
        # extraction, not worth a schema change for a same-second
        # same-url double-crawl pathology.
        wins = (
            pages.select("url", "warc_ts")
            .groupBy("url")
            .agg(F.max("warc_ts").alias("_wt"))
            .withColumnRenamed("url", "_wu")
        )
        lk = lk.join(
            wins,
            (F.col("url") == F.col("_wu"))
            & F.col("warc_ts").eqNullSafe(F.col("_wt")),
            "left_semi",
        )
        # informative-first among same-winning-ts ties: a declaration
        # carrying a real next/prev edge outranks one whose carrier is
        # NULL (plain ascending would sort NULLS FIRST and keep the
        # least informative row, discarding a real edge)
        w_lk = Window.partitionBy("url").orderBy(
            F.asc_nulls_last("next_url"), F.asc_nulls_last("prev_url")
        )
        lk1 = (
            lk.withColumn("_rn", F.row_number().over(w_lk))
            .filter(F.col("_rn") == 1)
            .select("url", "next_url", "prev_url")
        )
        chains = chains_from_links(
            lk1, docs.select("url"), max_pages=pagination_max_pages
        ).withColumnRenamed("url", "_u")
        d = docs.join(chains, docs["url"] == chains["_u"], "left").drop("_u")
        solo = d.filter(F.col("chain_id").isNull()).drop("chain_id", "seq")
        stitched = (
            d.filter(F.col("chain_id").isNotNull())
            .groupBy("chain_id")
            .agg(
                ordered_concat(F.col("seq"), F.col("text")).alias("text"),
                F.min(F.struct("seq", "source"))["source"].alias("source"),
            )
            .select(F.col("chain_id").alias("url"), "text", "source")
        )
        docs = solo.unionByName(stitched)
    if unicode_nfc:
        from .operators.unicodenorm import unicode_normalize

        # narrow Arrow-batched projection, BEFORE anything that keys
        # on the text bytes (exact/paragraph/span hashing, near-dup
        # shingles, decontamination grams) so composed and decomposed
        # spellings of the same content land in the same family
        docs = unicode_normalize(docs, "text", "NFC")
    if max_docs_per_host is not None:
        from .operators.hoststats import cap_per_host

        docs = cap_per_host(docs, max_docs_per_host)
    if host_authority is not None:
        from .operators.hoststats import canonical_host

        # accepts pagerank's native (node, rank) or a (host, rank)
        # table; the key is re-canonicalized (www-strip) so link-graph
        # hosts (links.host_of keeps www.) meet canonical_host's form
        hcol = "host" if "host" in host_authority.columns else "node"
        low = host_authority.filter(
            F.col("rank") < F.lit(min_host_authority)
        ).select(
            F.regexp_replace(F.lower(F.col(hcol)), r"^www\.", "").alias("_lowhost")
        )
        docs = docs.withColumn(
            "_h", canonical_host(F.col("url"))
        ).join(
            F.broadcast(low), F.col("_h") == F.col("_lowhost"), "left_anti"
        ).drop("_h")
    if line_dedup:
        from .operators.filters import dedup_lines_within_doc

        # pure projection (zero shuffles) — runs FIRST among the text
        # transforms so the cross-corpus stages below see less data
        docs = (
            dedup_lines_within_doc(docs)
            .filter(F.col("text") != "")
            .select("url", "text", "source")
        )
    if host_boilerplate_min_pages is not None:
        from .operators.filters import remove_host_boilerplate_lines

        # MUST precede the span-removal stages: dup_span_remove ships
        # a newline-free normalized word stream, after which every doc
        # is one "line" and template detection is a silent no-op
        # (review r05). Template lines also vanish before paragraph
        # dedup pays to hash them.
        docs = docs.localCheckpoint(eager=False)
        rebuilt_b = remove_host_boilerplate_lines(
            docs, min_pages=host_boilerplate_min_pages, hash_keys=True
        ).select("url", F.col("clean_text").alias("text"))
        docs = (
            docs.drop("text")
            .join(rebuilt_b, "url")
            .filter(F.col("text") != "")
            .select("url", "text", "source")
        )
    if paragraph_dedup:
        from .operators.dedup import paragraph_dedup as _paragraph_dedup

        # both sides of the rebuild join reference `docs` (review r05:
        # without a pin the extract plan nests on each side)
        docs = docs.localCheckpoint(eager=False)
        rebuilt = _paragraph_dedup(docs, id_col="url")
        docs = (
            docs.drop("text")
            .join(rebuilt, "url")
            .filter(F.col("text") != "")
            .select("url", "text", "source")
        )
    if (
        dup_span_remove
        or char_dup_span_remove
        or dup_span_max_frac is not None
    ):
        # collapse exact duplicates (keep-min-url, literally the main
        # dedup's xxhash64-keyed rule) BEFORE the ExactSubstr family:
        # every span of a byte-identical twin is duplicated corpus-
        # wide, so the REMOVAL stages would rebuild both copies empty
        # and the dup_span_max_frac STATS cut would flag both at
        # frac 1.0 — either way both copies died where one should
        # survive (review r05 ×2; Lee et al. run exact dedup first).
        # Pin first: the agg and the semi-join both read `docs`
        # (the same double-execution hazard the stage pins below
        # guard), and the hash key keeps document bytes out of the
        # shuffle key.
        docs = docs.localCheckpoint(eager=False)
        keep_first = docs.groupBy(F.xxhash64("text").alias("_h")).agg(
            F.min("url").alias("url")
        ).select("url")
        docs = docs.join(keep_first, "url", "left_semi")
    if dup_span_remove:
        from .operators.filters import remove_duplicate_spans

        # same pin rationale as paragraph_dedup: the rebuild join
        # references `docs` from both sides
        docs = docs.localCheckpoint(eager=False)
        rebuilt = remove_duplicate_spans(
            docs, n=dup_span_n, id_col="url", hash_keys=dup_span_hash_keys
        ).select(F.col("doc_id").alias("url"), F.col("clean_text").alias("text"))
        docs = (
            docs.drop("text")
            .join(rebuilt, "url")
            .filter(F.col("text") != "")
            .select("url", "text", "source")
        )
    if char_dup_span_remove:
        from .operators.filters import remove_duplicate_char_spans

        # codepoint-window twin of dup_span_remove: preserves the
        # original bytes outside cut regions (the token form ships a
        # normalized word stream); rolling-hash scale path
        docs = docs.localCheckpoint(eager=False)
        rebuilt_c = remove_duplicate_char_spans(
            docs, L=char_dup_span_L, id_col="url", exact=False
        ).select(
            F.col("doc_id").alias("url"), F.col("clean_text").alias("text")
        )
        docs = (
            docs.drop("text")
            .join(rebuilt_c, "url")
            .filter(F.col("text") != "")
            .select("url", "text", "source")
        )
    if c4_clean:
        from .operators.filters import c4_clean as _c4_clean

        docs = (
            _c4_clean(docs)
            .filter(F.col("c4_keep") & (F.col("text") != ""))
            .select("url", "text", "source")
        )
    if pii_redact:
        docs = docs.withColumn("text", redact_pii(F.col("text")))
    # staged scoring: each base count regex runs once (NOTES r05 diag)
    scored = with_quality(docs)
    good = scored.filter(F.col("quality") >= F.lit(min_quality))
    if min_model_score is not None:
        from .operators.quality_model import featurize, score

        survivors = (
            score(featurize(good))
            .filter(F.col("model_score") >= F.lit(min_model_score))
            .select(*good.columns)
        )
        good = survivors
    if (
        compression_band is not None
        or repetition_max_frac is not None
        or gopher_rules
        or gopher_repetition
        or dup_span_max_frac is not None
        or decontam_eval is not None
        or near_dup_threshold is not None
        or (lm_ref is not None and lm_min_logscore is not None)
    ):
        # Each hygiene stage (compression_band's semi-join included —
        # review r05) references `good` from BOTH sides of a join, so
        # chaining them would nest 2^stages copies of the whole
        # extract plan (measured: minutes at 500 rows). Materialize
        # the survivors once; executor-local blocks, same rationale as
        # the extract's own phase-1 checkpoint. On the staged
        # 10^12-row Pipeline this boundary is a real stage checkpoint
        # (parquet/Iceberg), not block storage.
        good = good.localCheckpoint(eager=False)
    if compression_band is not None:
        from .operators.textstats import compression_ratio

        lo, hi = compression_band
        in_band = compression_ratio(good, id_col="url").filter(
            (F.col("compression_ratio") >= F.lit(lo))
            & (F.col("compression_ratio") <= F.lit(hi))
        ).select(F.col("doc_id").alias("url"))
        good = good.join(in_band, "url", "left_semi")
    if lm_ref is not None and lm_min_logscore is not None:
        from .operators.lm import stupid_backoff_score

        # the model never reads reference ids — synthesize one so any
        # (text)-shaped reference DataFrame is accepted
        ref = lm_ref.select(
            F.monotonically_increasing_id().cast("string").alias("url"),
            F.col("text"),
        )
        gibberish = stupid_backoff_score(good, ref, id_col="url").filter(
            F.col("avg_logscore") < F.lit(lm_min_logscore)
        ).select(F.col("doc_id").alias("url"))
        good = good.join(gibberish, "url", "left_anti")
    if gopher_rules:
        from .operators.filters import gopher_quality_flags

        ok = gopher_quality_flags(good, id_col="url").filter(
            F.col("gopher_keep")
        ).select(F.col("doc_id").alias("url"))
        good = good.join(ok, "url", "left_semi")
    if gopher_repetition:
        from .operators.filters import gopher_repetition_flags

        nonrep = gopher_repetition_flags(good, id_col="url").filter(
            F.col("rep_keep")
        ).select(F.col("doc_id").alias("url"))
        good = good.join(nonrep, "url", "left_semi")
    if repetition_max_frac is not None:
        spam = repetition_stats(good, id_col="url").filter(
            F.col("top_bigram_frac") > F.lit(repetition_max_frac)
        ).select(F.col("doc_id").alias("url"))
        good = good.join(spam, "url", "left_anti")
    if dup_span_max_frac is not None:
        from .operators.filters import duplicate_span_stats

        spanny = duplicate_span_stats(
            good, n=dup_span_n, id_col="url", hash_keys=dup_span_hash_keys
        ).filter(F.col("dup_span_frac") > F.lit(dup_span_max_frac)).select(
            F.col("doc_id").alias("url")
        )
        good = good.join(spanny, "url", "left_anti")
    if decontam_eval is not None:
        from .operators.filters import (
            decontaminate,
            decontaminate_bloom,
            decontaminate_fuzzy,
        )

        if decontam_fuzzy_threshold is not None:
            dirty = (
                decontaminate_fuzzy(
                    good,
                    decontam_eval,
                    n=5,
                    threshold=decontam_fuzzy_threshold,
                    id_col="url",
                )
                .select(F.col("doc_id").alias("url"))
                .distinct()
            )
        elif decontam_bloom_fpp is not None:
            dirty = decontaminate_bloom(
                good, decontam_eval, n=5, id_col="url", fpp=decontam_bloom_fpp
            ).select(F.col("doc_id").alias("url"))
        else:
            dirty = decontaminate(good, decontam_eval, n=5, id_col="url").select(
                F.col("doc_id").alias("url")
            )
        good = good.join(dirty, "url", "left_anti")
    if near_dup_threshold is not None:
        from .operators.cluster import connected_components, keep_best
        from .operators.dedup import minhash_lsh_pairs

        keyed = good.withColumn("_k", F.xxhash64("url"))
        pairs = minhash_lsh_pairs(
            keyed, threshold=near_dup_threshold, id_col="_k"
        ).select("id_a", "id_b")
        cc = connected_components(pairs)
        if near_dup_keep == "best_quality":
            # quality-aware family resolution: survive the highest-
            # quality member (tiebreak min key), not the min-key one
            survivors = keep_best(
                cc, keyed.select(F.col("_k").alias("node"), "quality")
            ).select(F.col("keep_node").alias("node"))
            non_rep = cc.join(survivors, "node", "left_anti").select(
                F.col("node").alias("_k")
            )
        elif near_dup_keep == "rep":
            non_rep = cc.filter(F.col("node") != F.col("rep")).select(
                F.col("node").alias("_k")
            )
        else:
            raise ValueError(
                f"near_dup_keep must be 'rep' or 'best_quality', "
                f"got {near_dup_keep!r}"
            )
        good = keyed.join(non_rep, "_k", "left_anti").drop("_k")
    # exact dedup on extracted text: keep the lexicographically first
    # url per text (deterministic); semi-join back to keep columns
    keep = good.groupBy(F.xxhash64("text").alias("_h")).agg(
        F.min("url").alias("url")
    )
    deduped = good.join(keep, "url", "left_semi")
    mixed = (
        mixing.weighted_sample(
            deduped, source_rates, key_col="source", id_col="url",
            default=default_rate,
        )
        if source_rates is not None
        else deduped
    )
    packs = packing.pack_assignments(
        mixed, token_count_ws(F.col("text")), pack_budget, order_col="url",
        npartitions=npartitions,
    )
    out = packs.join(
        mixed.select("url", "quality", "text"), "url"
    ).select(
        "url", "n_tokens", "tokens_before", "pack_id", "pack_pos",
        "quality", "text",
    )
    if splits is not None:
        # assignment, not a filter: packing stays computed over the
        # whole survivor set; the trainer filters by split at read
        # time. md5(url)-keyed, so it is stable across reruns and
        # independent of the mixing sample (different salt).
        out = mixing.split_assign(out, splits, id_col="url")
    return out


# ------------------------------------------------------------------ recipes
# Published curation pipelines as named flag bundles over curate().
# Each recipe covers ONLY the stages expressible as scalar flags; the
# DataFrame-valued inputs the paper also uses (CCNet's reference LM,
# RefinedWeb's URL blocklist, any decontamination eval set) are passed
# by the caller as **overrides, exactly like individual flags —
# overrides always win over the bundle.
RECIPES: dict[str, dict] = {
    # Raffel et al. 2020 §2.2: line rules + page rules + span dedup
    "c4": dict(
        unicode_nfc=True, c4_clean=True, line_dedup=True,
        paragraph_dedup=True,
    ),
    # Rae et al. 2021 (MassiveText §A1): doc-quality rules, repetition
    # rules, repeated-line cleanup, MinHash near-dup at J≈0.8
    "gopher": dict(
        unicode_nfc=True, gopher_rules=True, gopher_repetition=True,
        line_dedup=True, near_dup_threshold=0.8,
    ),
    # Wenzek et al. 2020: paragraph-hash dedup (+ lm_ref /
    # lm_min_logscore via overrides for the perplexity gate)
    "ccnet": dict(unicode_nfc=True, paragraph_dedup=True),
    # Penedo et al. 2023: URL filtering — the HARD blocklist side
    # (blocked_hosts / blocked_url_patterns) via overrides (external
    # data), the SOFT lexical/keyword url scoring (§3.1) via
    # max_url_score — plus line corrections, fuzzy dedup +
    # exact-substring removal, canonical-URL collapse
    "refinedweb": dict(
        unicode_nfc=True, line_dedup=True, canonical_url_dedup=True,
        near_dup_threshold=0.8, dup_span_remove=True,
        host_boilerplate_min_pages=3, max_url_score=1.0,
    ),
    # Penedo et al. 2024: C4 line rules + Gopher quality/repetition +
    # MinHash dedup + PII redaction
    "fineweb": dict(
        unicode_nfc=True, c4_clean=True, gopher_rules=True,
        gopher_repetition=True, near_dup_threshold=0.8, pii_redact=True,
    ),
}


def curate_recipe(pages: DataFrame, recipe: str, **overrides) -> DataFrame:
    """``curate(pages, **RECIPES[recipe])`` with per-call overrides.

    ``curate_recipe(pages, "gopher", near_dup_threshold=0.7)`` runs
    the Gopher bundle with a looser dedup cut; equivalence of a
    recipe call and the equivalent explicit-flag call is pinned in
    tests/test_curate.py.
    """
    if recipe not in RECIPES:
        raise ValueError(
            f"unknown recipe {recipe!r}; have {sorted(RECIPES)}"
        )
    kwargs = {**RECIPES[recipe], **overrides}
    return curate(pages, **kwargs)

"""Weighted source mixing: deterministic down/up-weighting of corpus
sources to target proportions.

Training-data-pipeline component: pretraining mixes (CommonCrawl,
code, books, wiki, ...) are rebalanced by per-source sampling rates.
At 10^12 rows the sample must be (a) a pure per-row predicate — no
global count, no shuffle, fully pushed into the scan — and
(b) DETERMINISTIC, so reruns, resumes and downstream joins see the
same subset (Bernoulli rand() sampling is neither reproducible
across retries nor partition-stable).

Here each row's uniform draw is derived from md5(id, salt) — md5
(not xxhash64) so the identical number is computable in DuckDB and
the operator is oracle-checkable end-to-end (same trade as
textstats.fingerprint). The keep rule is ``u < rate(source)``: a
rate change from r to r' < r keeps a strict SUBSET of the rows
(nested samples — the property sweep/epoch experiments rely on),
because u does not depend on the rate.

Rates > 1.0 mean upsampling: ``copies`` emits floor(rate) + (u <
frac(rate)) copies per row via a JVM-side sequence explode, the
standard epoch-repeat trick, still deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = float(1 << 32)


def uniform_hash(id_col: Column, salt: str = "mix") -> Column:
    """Deterministic u ∈ [0, 1): the first 8 hex chars of
    md5(id || ':' || salt) as a 32-bit integer, scaled. Pure codegen
    (md5/substring/conv), no state, same value in DuckDB.

    Contract: ids must be NON-NULL and unique. concat_ws skips NULL
    args, so every null id hashes to the identical u — they are
    sampled all-or-none, land in one split/shard, and tie-break
    nondeterministically. The formula is pinned by the DuckDB oracles
    and cannot change; enforce id hygiene upstream."""
    h = F.substring(F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(salt))), 1, 8)
    return F.conv(h, 16, 10).cast("long") / F.lit(_U32)


def _rate_expr(key: Column, rates: dict[str, float], default: float) -> Column:
    """A NULL key (temperature_mix over a corpus with a null source
    emits one) is matched with isNull — plain equality is never true
    for NULL, silently dropping the whole group at default=0.0, and
    sorted() over mixed None/str keys raised TypeError (review r05)."""
    expr = F.lit(float(default))
    ordered = sorted(
        rates.items(), key=lambda kv: (kv[0] is not None, kv[0] or "")
    )
    for k, r in ordered:
        cond = key.isNull() if k is None else (key == F.lit(k))
        expr = F.when(cond, F.lit(float(r))).otherwise(expr)
    return expr


_ID_BITS = 36


def _score_okey(score_col: str, id_col: str) -> Column:
    """Composite ordering key: 6-dp-quantized (1 - score) in the high
    bits, id in the low 36 — shared by budget_select and
    budget_select_grouped so the quantization can never diverge. A
    NULL score coalesces to 0.0 (the repo's no-information
    convention): it used to produce a NULL key that sorted FIRST and
    decoded to a NULL id, silently spending budget on unscored rows
    (review r05)."""
    q = F.round(F.coalesce(F.col(score_col).cast("double"), F.lit(0.0)), 6)
    return (
        F.round((F.lit(1.0) - q) * 1_000_000).cast("long") * (1 << _ID_BITS)
    ) + F.col(id_col).cast("long")


def _okey_score() -> Column:
    """Decode the quantized score back out of ``_okey``."""
    return F.round(
        F.lit(1.0)
        - F.shiftright(F.col("_okey"), _ID_BITS).cast("double") / 1_000_000,
        6,
    )


def _okey_id(id_col: str) -> Column:
    return F.col("_okey").bitwiseAND(F.lit((1 << _ID_BITS) - 1)).alias(id_col)


def weighted_sample(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    default: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Keep each row iff u(id) < rate(source); rates in [0, 1].

    One scan, zero shuffles; the predicate is a deterministic
    function of the row alone, so the sample is stable under
    repartitioning, resume, and rate tightening (nested subsets)."""
    u = uniform_hash(F.col(id_col), salt)
    return df.filter(u < _rate_expr(F.col(key_col), rates, default))


def weighted_copies(
    df: DataFrame,
    rates: dict[str, float],
    key_col: str = "source",
    id_col: str = "doc_id",
    default: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Generalized mixing with upsampling: emit n(id) copies per row,
    n = floor(rate) + (u < rate - floor(rate)), tagged with a 0-based
    ``copy`` column. rate <= 1 degenerates to weighted_sample (+ copy
    = 0); rate = 2.5 emits 2 or 3 copies. Explode happens JVM-side
    (sequence + explode) — no python, no shuffle."""
    u = uniform_hash(F.col(id_col), salt)
    rate = _rate_expr(F.col(key_col), rates, default)
    n = F.floor(rate).cast("long") + (u < (rate - F.floor(rate))).cast("long")
    return (
        df.withColumn("_n", n)
        .filter(F.col("_n") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
    )


def split_assign(
    df: DataFrame,
    fractions: dict[str, float],
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Add a ``split`` column assigning every row to exactly one named
    split (train/val/test-style) by cumulative thresholds over the
    same md5-uniform as weighted_sample.

    Properties, all by construction:
      * exhaustive + disjoint — one scan, zero shuffles, no global
        count, the assignment is a pure function of (id, salt);
      * stratified — u is independent of every data column, so each
        split hits its fraction within any subgroup (per source, per
        lang, ...), not just globally;
      * monotone — growing a split's fraction (keeping the dict order)
        only MOVES rows across the boundary it shares with its
        neighbor: a train fraction raised from 0.8 to 0.9 keeps the
        old train as a strict subset (epoch-over-epoch stability);
      * resample-proof — a different ``salt`` draws an independent
        assignment (so the split never correlates with a
        weighted_sample that used salt='mix').

    Threshold order = the dict's insertion order (pin it in code).
    Fractions must sum to 1 (validated).
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = uniform_hash(F.col(id_col), salt)
    names = list(fractions)
    expr = F.lit(names[-1])
    acc = 0.0
    branches = []
    for name in names[:-1]:
        acc += fractions[name]
        branches.append((acc, name))
    for acc, name in reversed(branches):
        expr = F.when(u < F.lit(acc), F.lit(name)).otherwise(expr)
    return df.withColumn("split", expr)


def sample_exact_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    salt: str = "sample",
) -> DataFrame:
    """EXACTLY-k deterministic uniform sample: the k rows with the
    smallest md5-uniform u(id, salt) — the distributed equivalent of
    a reservoir sample, reproducible from (id, salt) alone (rate-based
    weighted_sample gives binomial-sized output; this gives exact
    cardinality for eval sets / demos / hand-audits).

    Scale shape: ``orderBy(u, id).limit(k)`` compiles to
    TakeOrderedAndProject — a per-partition top-k heap plus a k-row
    driver merge, NEVER a global sort (asserted in
    tests/test_mixing.py). Growing k keeps the old sample as a strict
    prefix (nested subsets, same as weighted_sample's tightening).
    """
    u = uniform_hash(F.col(id_col), salt)
    return (
        df.withColumn("_u", u)
        .orderBy("_u", id_col)
        .limit(k)
        .drop("_u")
    )


def temperature_rates(
    df: DataFrame,
    token_budget: float,
    temperature: float = 1.0,
    key_col: str = "source",
    token_col: str | None = None,
) -> DataFrame:
    """Temperature-scaled mixture plan (the multilingual/pretraining
    sampling rule of Arivazhagan et al. 2019 / GPT-3 / Gopher data
    mixes): source i with n_i tokens gets sampling share

        p_i = n_i^(1/T) / sum_j n_j^(1/T)

    and per-row rate r_i = token_budget * p_i / n_i. T = 1 is
    proportional (every source sees the same rate = budget/total);
    T -> inf flattens toward uniform shares, upweighting small
    high-quality sources (rates may exceed 1 — epochs — which
    ``weighted_copies`` realizes as deterministic repeats).

    Returns one row per source: (key, n_tokens, share, rate, epochs)
    with share/rate rounded to 6 places, epochs = ceil(rate). By
    construction sum_i rate_i * n_i == token_budget (pre-rounding) —
    pinned in tests.

    Scale shape: ONE map-side-combined hash agg over the corpus
    (bounded by the number of sources, a handful of rows), then a
    broadcast crossJoin with the 1-row normalizer — the 10^12-row
    input is scanned once and never shuffled beyond the tiny agg.
    """
    if temperature <= 0:
        raise ValueError(f"temperature must be > 0, got {temperature}")
    tok = F.col(token_col) if token_col else F.lit(1)
    per = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(tok).cast("long").alias("n_tokens")
    )
    inv_t = 1.0 / float(temperature)
    z = per.agg(F.sum(F.pow("n_tokens", F.lit(inv_t))).alias("_z"))
    share = F.pow("n_tokens", F.lit(inv_t)) / F.col("_z")
    rate = F.lit(float(token_budget)) * share / F.col("n_tokens")
    return per.crossJoin(F.broadcast(z)).select(
        "key",
        "n_tokens",
        F.round(share, 6).alias("share"),
        F.round(rate, 6).alias("rate"),
        F.ceil(rate).cast("int").alias("epochs"),
    )


def temperature_mix(
    df: DataFrame,
    token_budget: float,
    temperature: float = 1.0,
    key_col: str = "source",
    id_col: str = "doc_id",
    token_col: str | None = None,
    salt: str = "mix",
) -> DataFrame:
    """Apply a temperature-scaled mixture plan: compute the per-source
    rates (``temperature_rates`` — a handful of rows, the ONLY
    driver-side collect, bounded by source count) and realize them
    with ``weighted_copies`` — i.e. the apply stage is a pure
    deterministic scan predicate + JVM-side repeat explode, zero
    shuffles over the corpus. Rates > 1 repeat rows (epochs)."""
    rows = temperature_rates(
        df, token_budget, temperature, key_col=key_col, token_col=token_col
    ).collect()
    rates = {r["key"]: float(r["rate"]) for r in rows}
    return weighted_copies(
        df, rates, key_col=key_col, id_col=id_col, default=0.0, salt=salt
    )


def budget_select(
    df: DataFrame,
    n_tokens: Column,
    token_budget: int,
    score_col: str = "quality",
    id_col: str = "doc_id",
    npartitions: int | None = None,
) -> DataFrame:
    """Token-budget quality selection: keep the BEST documents by
    score until the token budget is exactly reached — the 'train on
    the top-X%' policy (FineWeb-Edu, phi-style data selection) with
    the cutoff derived from the budget instead of hand-picked.

    Exact, not quantile-approximate: documents order by
    (score DESC, id ASC) and the doc is selected iff the running
    token total BEFORE it is < token_budget (so the selection always
    includes the doc that crosses the budget line — trim-at-doc
    granularity, the same boundary rule pack_assignments uses).

    Returns (id, n_tokens, score, cum_before, selected). Scale shape:
    the ordering key quantizes the score (6 dp — the repo's float
    convention) into the high bits of a composite long, then the
    distributed prefix sum of ``packing.pack_assignments`` does the
    rest — ONE range shuffle of the slim key projection, no global
    sort, no single-partition window; score and id decode back out of
    the key, so nothing joins back. Ids must be non-negative and
    < 2^36; scores must lie in [0, 1] (the repo's quality
    conventions).
    """
    from .packing import pack_assignments

    # (1 - q) ascending == q descending; 6-dp quantization makes the
    # integer key exact, deterministic, and invertible (_score_okey)
    slim = df.select(
        _score_okey(score_col, id_col).alias("_okey"),
        n_tokens.cast("long").alias("_n"),
    )
    packed = pack_assignments(
        slim,
        F.col("_n"),
        max(int(token_budget), 1),
        order_col="_okey",
        npartitions=npartitions,
        # only the prefix sum is consumed — skip the pack_pos window
        # (a second full exchange whose output was discarded)
        with_positions=False,
    )
    return packed.select(
        _okey_id(id_col),
        "n_tokens",
        _okey_score().alias(score_col),
        F.col("tokens_before").alias("cum_before"),
        (F.col("tokens_before") < F.lit(int(token_budget))).alias("selected"),
    )


def mixture_entropy(
    df: DataFrame,
    group_col: str,
    key_col: str = "source",
) -> DataFrame:
    """Per-group mixture diversity: Shannon entropy (nats) of the
    ``key_col`` distribution within each ``group_col`` — the standard
    diversity audit for shards/packs/splits ("did the deterministic
    shuffle actually interleave sources, or did a shard collapse to
    one domain?"). Also emits n rows and distinct keys; entropy 0
    for single-key groups, ln(k) for a perfectly uniform k-key mix.

    Scale shape: two map-side-combined hash aggregations
    ((group, key) counts, then per-group fold) — rows bounded by
    groups × keys, no window, no skew beyond the largest group's key
    set."""
    per = df.groupBy(group_col, key_col).agg(F.count("*").alias("_c"))
    tot = F.sum("_c")
    # H = ln(n) - Σ c·ln(c) / n  (one pass, no second join)
    h = F.log(tot) - F.sum(F.col("_c") * F.log("_c")) / tot
    return per.groupBy(group_col).agg(
        tot.cast("long").alias("n"),
        F.count("*").cast("int").alias("n_keys"),
        F.round(h, 6).alias("entropy"),
    )


def budget_select_grouped(
    df: DataFrame,
    n_tokens: Column,
    budgets: dict[str, int] | int,
    group_col: str = "source",
    score_col: str = "quality",
    id_col: str = "doc_id",
    npartitions: int | None = None,
) -> DataFrame:
    """Per-group token-budget quality selection — ``budget_select``
    with an independent budget per language/source (the FineWeb /
    multilingual-mix shape: "top N_en tokens of English, top N_de of
    German", each group's cutoff derived from ITS budget, never
    competing across groups).

    ``budgets``: dict group -> token budget (groups absent from the
    dict get budget 0 — returned with selected=false), or one int
    applied to every group.

    Returns (group_col, id, n_tokens, score, cum_before, selected)
    where cum_before is the running token total WITHIN the group
    before this doc in (score DESC, id ASC) order, and selected uses
    the same trim-at-doc boundary rule as budget_select.

    Scale shape: the quantized (1-score, id) composite key rides
    packing.grouped_prefix_sum — ONE range shuffle on (group, key),
    per-group offsets chain across partitions (no per-group single
    partition), nothing joins back. Same key-domain limits as
    budget_select: ids non-negative < 2^36, scores in [0, 1].
    """
    from .packing import grouped_prefix_sum

    slim = df.select(
        group_col,
        _score_okey(score_col, id_col).alias("_okey"),
        n_tokens.cast("long").alias("_n"),
    )
    ps = grouped_prefix_sum(
        slim, F.col("_n"), group_col, "_okey", npartitions=npartitions
    )
    if isinstance(budgets, dict):
        pairs: list = []
        for g, b in budgets.items():
            pairs.extend([F.lit(g), F.lit(int(b)).cast("long")])
        budget = (
            F.coalesce(
                F.element_at(F.create_map(*pairs), F.col(group_col)),
                F.lit(0).cast("long"),
            )
            if pairs
            else F.lit(0).cast("long")
        )
    else:
        budget = F.lit(int(budgets)).cast("long")
    return ps.select(
        group_col,
        _okey_id(id_col),
        F.col("n_tokens"),
        _okey_score().alias(score_col),
        F.col("tokens_before").alias("cum_before"),
        (F.col("tokens_before") < budget).alias("selected"),
    )

"""Duplicate-cluster resolution: connected components over a
similar-pairs edge list, entirely in DataFrame operations.

The near-dup operators (ngram_jaccard_pairs / minhash_lsh_pairs /
simhash_pairs / embedding LSH) emit PAIRS; a curation pipeline needs
CLUSTERS — "these 17 docs are all the same article, keep one". Pairs
are transitive in effect (A~B, B~C usually means A,B,C are one
duplicate family even when A~C missed the threshold), so the right
closure is the connected component, and the deterministic keep rule
is min(id) per component — the same keep-min convention as
exact_dedup.

Algorithm: alternating LARGE-STAR / SMALL-STAR (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii, "Connected Components in MapReduce
and Beyond", SoCC 2014 — a published algorithm, re-expressed here as
DataFrame joins; no code copied):

    large-star: for every node u, connect every STRICTLY LARGER
                neighbor v > u to m(u) = min(N(u) ∪ {u});
    small-star: for every node u, connect every neighbor v <= u
                (and u itself) to m(u).

Each operation is: symmetrize edges → groupBy(u).min(v) → join back
→ emit — two shuffles per half-round, all map-side-combinable hash
aggregations and an equi-join Catalyst is free to pick a strategy
for. No collect_set: a hub node's neighborhood never has to fit in
one row (the classic scale failure of naive label propagation on
skewed graphs — exactly the regime of a 10^5-copy boilerplate page
whose near-dup component is a giant star). The paper proves
convergence to per-component stars in O(log^2 n) rounds (O(log n)
in practice); duplicate families from real corpora are cliquish and
converge in 2-4 rounds.

Driver-side state per round is ONE aggregated row (count + an
order-independent hash-sum of the edge set) used for the fixpoint
test; every round's edge set is localCheckpoint'ed to truncate
lineage — without that, iterative DataFrame algorithms compound the
logical plan exponentially and die in the optimizer long before any
data-size limit.

At 10^12-row scale: rounds are O(log n) ≈ a handful; each round
shuffles only (long, long) edge rows — the edge set for dedup graphs
is a small fraction of corpus rows, and the per-round cost is two
hash aggs + a join on 16-byte rows. The fixpoint hash-sum uses
xxhash64 summed with 64-bit wraparound: collision of two DIFFERENT
consecutive edge sets also requires identical counts, probability
~2^-64 per round — immaterial against hardware error rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _symmetrize(edges: DataFrame) -> DataFrame:
    """(u,v) → both directions, self-loops dropped, distinct."""
    return (
        edges.filter(F.col("u") != F.col("v"))
        .unionByName(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )


def _node_mins(sym: DataFrame) -> DataFrame:
    """m(u) = min over the closed neighborhood N(u) ∪ {u}."""
    return (
        sym.groupBy("u")
        .agg(F.min("v").alias("_mv"))
        .select("u", F.least(F.col("_mv"), F.col("u")).alias("m"))
    )


def _large_star(sym: DataFrame) -> DataFrame:
    """Edges (v, m(u)) for every v ∈ N(u) with v > u."""
    return (
        sym.join(_node_mins(sym), "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )


def _small_star(sym: DataFrame) -> DataFrame:
    """Edges (v, m(u)) for every v ∈ N(u) ∪ {u} with v <= u."""
    joined = sym.join(_node_mins(sym), "u")
    down = joined.filter(F.col("v") <= F.col("u")).select(
        F.col("v").alias("u"), F.col("m").alias("v")
    )
    self_edge = joined.select(F.col("u"), F.col("m").alias("v"))
    return down.unionByName(self_edge)


def _fingerprint(sym: DataFrame) -> tuple[int, int]:
    """(n_edges, order-independent 64-bit hash-sum) — ONE tiny row to
    the driver; the fixpoint test without comparing edge sets."""
    # decimal(38,0) accumulator: a plain long sum of 64-bit hashes
    # overflows under ANSI mode (Spark 4 default); decimal38 is exact
    # to ~10^19 edge rows.
    row = sym.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")), F.lit(0)
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def connected_components(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Edge list → (node, rep) where rep = min node id of the
    component. Every node appearing in any pair gets exactly one row;
    representatives map to themselves.

    Deterministic: min() is order-insensitive, so the result is
    independent of partitioning, parallelism, and round count.
    """
    spark = pairs.sparkSession
    edges = pairs.select(
        F.col(a_col).cast("long").alias("u"), F.col(b_col).cast("long").alias("v")
    )
    nodes = (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
    )

    sym = _symmetrize(edges).localCheckpoint(eager=True)
    prev_fp = None
    for _ in range(max_iter):
        sym = _symmetrize(_large_star(sym))
        sym = _symmetrize(_small_star(sym)).localCheckpoint(eager=True)
        fp = _fingerprint(sym)
        if fp == prev_fp:
            break
        prev_fp = fp
    else:
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")

    # Converged star graph: every non-root points at its component min.
    star = sym.filter(F.col("u") > F.col("v")).select(
        F.col("u").alias("node"), F.col("v").alias("rep")
    )
    return nodes.join(star, "node", "left").select(
        "node", F.coalesce("rep", "node").alias("rep")
    )


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Cluster rollup for curation policy: one row per duplicate
    family — (rep, cluster_size, members sorted ascending). rep is
    the document to KEEP; members \\ {rep} are the drop set.

    Scale note: the members array is bounded by the largest duplicate
    family (a 10^5-copy boilerplate page = one 800 KB row — fine; a
    pathological 10^9-copy family would not be). For drop-set
    consumption at that shape, use connected_components() directly
    and anti-join on (node != rep) — no per-cluster array ever
    materializes; this rollup is the human/policy-facing view."""
    cc = connected_components(pairs, a_col, b_col, max_iter)
    return cc.groupBy("rep").agg(
        F.count(F.lit(1)).alias("cluster_size"),
        F.array_sort(F.collect_list("node")).alias("members"),
    )


def keep_best(
    cc: DataFrame,
    scores: DataFrame,
    score_col: str = "quality",
    node_col: str = "node",
    rep_col: str = "rep",
) -> DataFrame:
    """Quality-aware duplicate-family resolution: per cluster, the
    one surviving node = argmax score, ties broken by MIN node id —
    vs the default keep-the-rep policy (rep = min node id regardless
    of quality), which can throw away a clean page in favor of its
    boilerplate-ridden twin. ``scores`` maps node → score (rows for
    nodes absent from ``cc`` are ignored; cluster nodes missing a
    score rank below every scored sibling).

    Returns (rep, keep_node, keep_score). Scale shape: one join to
    attach scores (cc holds only nodes that appear in duplicate
    pairs — a small fraction of the corpus) and one map-side-
    combinable struct-min agg per family; the argmax is
    min(struct(-score, node)), so no window, no sort, and negating
    the DOUBLE score cannot overflow (negating a 64-bit node id
    could, under ANSI, at LONG_MIN)."""
    ranked = cc.join(
        scores.select(
            F.col(node_col), F.col(score_col).cast("double").alias("_s")
        ),
        node_col,
        "left",
    )
    m = F.min(
        F.struct(
            (-F.coalesce(F.col("_s"), F.lit(float("-inf")))).alias("ns"),
            F.col(node_col).alias("n"),
        )
    ).alias("_m")
    return (
        ranked.groupBy(rep_col)
        .agg(m)
        .select(
            rep_col,
            F.col("_m.n").alias("keep_node"),
            # a cluster with NO scored member would otherwise emit the
            # -inf coalesce sentinel as its keep_score (review r05) —
            # surface null, which is what "no score existed" means
            F.when(
                F.col("_m.ns") == F.lit(float("inf")),
                F.lit(None).cast("double"),
            )
            .otherwise(-F.col("_m.ns"))
            .alias("keep_score"),
        )
    )

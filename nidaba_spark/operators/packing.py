"""Sequence packing: assign documents to fixed token-budget training
examples ("packs") with a DISTRIBUTED PREFIX SUM — no global window.

Training-data-pipeline component: after dedup/quality filtering, LLM
pretraining concatenates documents in a deterministic order and
slices the stream into fixed-budget examples. The pack assignment is
``pack_id = floor(tokens_before_doc / budget)`` over a global
ordering — document-contiguous chunking, the shape T5/GPT-style
packing pipelines use (a document whose tokens straddle a boundary
belongs to the pack where it starts; budget overflow at boundaries
is the downstream slicer's concern).

The naive Spark expression is ``sum(n_tokens) OVER (ORDER BY key)``
— a single-partition global window, the canonical scale antipattern
(one task sees 10^12 rows). This operator computes the same number
with the classic two-phase distributed prefix sum:

  1. range-repartition by the ordering key (Spark's range partitioner
     samples boundaries; partition p holds a contiguous key range),
     sortWithinPartitions — a total order ACROSS partitions without
     any global sort-merge;
  2. one tiny aggregation: per-partition token totals (P rows, P =
     npartitions) → driver-side exclusive cumsum → broadcast-joined
     back as each partition's global offset;
  3. per-partition cumulative window (partitionBy(pid) — parallel,
     memory-bounded) + offset = the exact global running total.

Cost: one range shuffle of the skinny (key, n_tokens) projection,
one P-row collect, one broadcast join — vs the unbounded
single-task window. The result is IDENTICAL to the SQL global
window, which is exactly what the DuckDB oracle checks
(tests/test_packing.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_assignments(
    docs: DataFrame,
    n_tokens: Column,
    budget: int,
    order_col: str | list[str] = "doc_id",
    npartitions: int | None = None,
    with_positions: bool = True,
) -> DataFrame:
    """docs + token counts → (order_col..., n_tokens, tokens_before,
    pack_id, pack_pos) with pack_id = floor(tokens_before / budget)
    over the global order_col ordering. ``with_positions=False``
    skips the pack_pos window — a full hash shuffle + sort by pack_id
    — for consumers that only need the prefix sum (budget_select
    discards pack_id/pack_pos entirely; paying that second exchange
    at 10^12 rows for dropped columns was the review-r05 finding). ``order_col`` may be a LIST
    of columns for a lexicographic composite ordering (e.g.
    (cell, id) for ICLM semantic packing — no bit-packed key needed,
    so ids of any type and range work); the combination must be
    unique for the ordering to be total.

    ``tokens_before`` is the exclusive prefix sum — the number of
    tokens in all strictly-earlier documents; ``pack_pos`` numbers
    documents within their pack (0-based)."""
    spark = docs.sparkSession
    ocols = [order_col] if isinstance(order_col, str) else list(order_col)
    n = npartitions or spark.sparkContext.defaultParallelism * 2
    slim = (
        docs.select(*ocols, n_tokens.cast("long").alias("n_tokens"))
        .repartitionByRange(n, *[F.col(c) for c in ocols])
        .sortWithinPartitions(*ocols)
        .withColumn("_pid", F.spark_partition_id())
        # Materialize ONCE: phases 2 and 3 both consume this plan, and
        # re-executing it would re-sample the range partitioner /
        # re-run any nondeterministic upstream (sample/limit/unstable
        # file listing), silently pairing phase-3 rows with phase-2
        # offsets from DIFFERENT physical partitions (ADVICE r04).
        # Lazy localCheckpoint: the totals collect materializes it,
        # the output job re-reads the same blocks. The checkpointed
        # projection is skinny (key + long), not the documents.
        .localCheckpoint(eager=False)
    )
    # Phase 2: per-partition totals -> exclusive cumsum on the driver.
    # P rows cross the driver, never data rows (like IVF centroids /
    # MLlib treeAggregate) — at 10^12 docs and 10^5 partitions this is
    # a few MB.
    totals = {
        r["_pid"]: r["t"]
        for r in slim.groupBy("_pid").agg(F.sum("n_tokens").alias("t")).collect()
    }
    offsets, acc = [], 0
    for pid in range(max(totals, default=-1) + 1):
        offsets.append((pid, acc))
        acc += totals.get(pid, 0)
    offsets_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    # Phase 3: parallel per-partition running sum + broadcast offset.
    w = (
        Window.partitionBy("_pid")
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = (
        slim.join(F.broadcast(offsets_df), "_pid")
        .withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)) + F.col("_offset"),
        )
        .withColumn("pack_id", F.floor(F.col("tokens_before") / F.lit(budget)))
        .drop("_pid", "_offset")
    )
    if not with_positions:
        return out.select(*ocols, "n_tokens", "tokens_before", "pack_id")
    wpack = Window.partitionBy("pack_id").orderBy(*ocols)
    return out.withColumn(
        "pack_pos", F.row_number().over(wpack) - F.lit(1)
    ).select(*ocols, "n_tokens", "tokens_before", "pack_id", "pack_pos")


def shard_assign(
    df: DataFrame,
    num_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Deterministic global training-order shuffle: every row gets
    (shard_id, shard_pos) from the same md5-uniform the mixing/split
    operators draw (mixing.uniform_hash) — u is independent of every
    data column, so reading shards 0..S-1 in shard_pos order IS a
    uniform random permutation of the corpus, reproducible from
    (id, salt) alone.

      * shard_id  = floor(u * S) — balanced to ±O(sqrt(n/S));
      * shard_pos = dense 0-based rank of u within the shard
        (tiebreak on id for md5-collision determinism).

    One shuffle, keyed on shard_id (S-way, uniform by construction —
    no skew possible), then a parallel per-shard window; never a
    global sort. Epoch re-shuffles = a new ``salt``; shard count
    changes don't touch the underlying u, so S=100 → S=1000 reshards
    without re-hashing (shard_id is a pure function of u).
    """
    from .mixing import uniform_hash

    u = uniform_hash(F.col(id_col), salt)
    w = Window.partitionBy("shard_id").orderBy("_u", id_col)
    return (
        df.withColumn("_u", u)
        .withColumn(
            "shard_id", F.least(F.floor(F.col("_u") * num_shards), F.lit(num_shards - 1)).cast("int")
        )
        .withColumn("shard_pos", F.row_number().over(w) - F.lit(1))
        .drop("_u")
    )


def write_shards(
    df: DataFrame,
    path: str,
    num_shards: int,
    id_col: str = "doc_id",
    salt: str = "shard",
    max_records_per_file: int | None = None,
) -> None:
    """Materialize the shard_assign layout: one directory per shard
    (``shard_id=N/``), rows inside each file sorted by shard_pos, so
    a training reader streams shard directories in order and gets the
    deterministic global permutation back without any shuffle of its
    own.

    Plan: repartitionByRange(num_shards, shard_id) maps each of the
    S consecutive shard ids to its own task — a HASH repartition of S
    distinct keys into S partitions leaves ~1/e of tasks empty by
    birthday collision while the heaviest task writes 4-5 shards
    sequentially (review r05). sortWithinPartitions(shard_id,
    shard_pos) then writes each shard's rows in reading order.
    ``maxRecordsPerFile`` bounds file size for HDFS/object-store
    friendliness without changing order (Spark splits the sorted
    stream into consecutive files).
    """
    out = shard_assign(df, num_shards, id_col=id_col, salt=salt)
    writer = (
        out.repartitionByRange(num_shards, "shard_id")
        .sortWithinPartitions("shard_id", "shard_pos")
        .write.mode("overwrite")
        .partitionBy("shard_id")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.parquet(path)


def pack_bins_ffd(
    docs: DataFrame,
    n_tokens: Column,
    capacity: int,
    id_col: str = "doc_id",
    num_groups: int | None = None,
    salt: str = "ffd",
) -> DataFrame:
    """No-split sequence packing (the fine-tuning/SFT regime):
    assign each document to exactly one fixed-capacity bin, never
    splitting a document across bins, minimizing padding waste — vs
    ``pack_assignments``'s document-contiguous GPT regime where docs
    straddle boundaries and there is no padding at all.

    Algorithm: best-fit-decreasing over the per-group LENGTH
    HISTOGRAM (the batched variant of Krell et al. 2021's
    shortest-pack-first histogram packing): docs sort by
    (length desc, id), and each batch places min(#docs_at_L,
    #bins_in_tightest_class) docs at once, so the inner loop runs
    per (length, remainder-class) TRANSITION — remainders are
    integers in [0, capacity], so the successor structure is a
    bisect over <= capacity+1 keys, never a per-doc scan. FFD/BFD
    guarantees <= 11/9 OPT + 1 bins per group.

    Scale shape: docs hash into ``num_groups`` independent groups
    (md5-style xxhash64 on id — uniform, no skew), ONE shuffle of the
    slim (id, n) projection, then applyInPandas packs each group in
    isolation; normal bin ids are (group << 40) + local — NON-NEGATIVE
    and globally unique without coordination. Group count trades
    waste (each group wastes <= 2/9 of a bin-capacity extra vs global
    FFD) against parallelism — size groups to ~10^5-10^6 docs, and
    PIN num_groups when assignments must reproduce across cluster
    sizes (the default follows the session's parallelism). Ids may be
    any hashable column type (longs, url strings, ...). Oversize docs
    (n > capacity) get singleton bins under group -1 keyed by a
    strictly NEGATIVE hash of their id — sign-disjoint from every
    normal bin (an id-valued key could collide with a (group, local)
    composite) — flagged ``oversize`` (the downstream truncation
    decision is the trainer's); two oversize bins collide with
    probability ~2^-62 per pair, the corpus-wide hash-key trade made
    everywhere else. Zero/negative lengths pack as length 1 (a doc
    still occupies a slot).

    Deterministic: ordering, hashing, and batching are all pure
    functions of (id, n, capacity, salt, num_groups) — re-runs and
    different input partitionings produce identical assignments
    (pinned in tests/test_ffd.py).
    """
    spark = docs.sparkSession
    g = num_groups or spark.sparkContext.defaultParallelism
    id_type = docs.select(F.col(id_col).alias("_id")).schema["_id"].dataType.simpleString()
    slim = docs.select(
        F.col(id_col).alias("_id"),
        F.greatest(n_tokens.cast("long"), F.lit(1)).alias("n_tokens"),
    )
    oversize = slim.filter(F.col("n_tokens") > capacity).select(
        F.col("_id").alias(id_col),
        "n_tokens",
        F.lit(-1).alias("grp"),
        # strictly negative → disjoint from every (group << 40) + local
        (
            -F.pmod(F.xxhash64("_id", F.lit(salt)), F.lit((1 << 62) - 1)) - 1
        ).alias("bin"),
        F.lit(0).alias("bin_pos"),
        F.lit(True).alias("oversize"),
    )
    normal = slim.filter(F.col("n_tokens") <= capacity).withColumn(
        "grp", F.pmod(F.xxhash64("_id", F.lit(salt)), F.lit(g)).cast("int")
    )

    cap = int(capacity)

    def pack_group(pdf):
        import pandas as pd
        from bisect import bisect_left, insort

        pdf = pdf.sort_values(
            ["n_tokens", "_id"], ascending=[False, True], kind="mergesort"
        ).reset_index(drop=True)
        ns = pdf["n_tokens"].astype("int64").to_list()
        bin_of = [0] * len(ns)
        classes: dict[int, list[int]] = {}  # remainder -> bin ids (FIFO)
        rems: list[int] = []  # sorted distinct nonempty remainders
        next_bin = 0
        i = 0
        while i < len(ns):
            length = ns[i]
            j = i
            while j < len(ns) and ns[j] == length:
                j += 1
            c, idx = j - i, i
            while c > 0:
                k = bisect_left(rems, length)
                if k == len(rems):
                    # no open bin fits: open exactly enough fresh bins
                    # to hold the rest of this length class
                    per = max(1, cap // length)
                    t = -(-c // per)
                    fresh = list(range(next_bin, next_bin + t))
                    next_bin += t
                    if cap not in classes or not classes[cap]:
                        classes.setdefault(cap, [])
                        insort(rems, cap)
                    classes[cap].extend(fresh)
                    continue
                r = rems[k]
                blist = classes[r]
                t = min(c, len(blist))
                take, classes[r] = blist[:t], blist[t:]
                if not classes[r]:
                    rems.pop(k)
                for d in range(t):
                    bin_of[idx + d] = take[d]
                nr = r - length
                if nr not in classes or not classes[nr]:
                    classes.setdefault(nr, [])
                    insort(rems, nr)
                classes[nr].extend(take)
                c -= t
                idx += t
            i = j
        pdf["bin"] = pd.Series(bin_of, dtype="int64")
        pdf["bin_pos"] = pdf.groupby("bin").cumcount().astype("int32")
        return pdf

    packed = normal.groupBy("grp").applyInPandas(
        pack_group,
        schema=f"_id {id_type}, n_tokens long, grp int, bin long, bin_pos int",
    )
    out = packed.select(
        F.col("_id").alias(id_col),
        "n_tokens",
        "grp",
        (F.shiftleft(F.col("grp").cast("long"), 40) + F.col("bin")).alias("bin"),
        "bin_pos",
        F.lit(False).alias("oversize"),
    )
    return out.unionByName(oversize)


def bin_stats(packed: DataFrame, capacity: int) -> DataFrame:
    """One-row packing-efficiency report for a ``pack_bins_ffd``
    result (non-oversize bins): n_bins, total tokens, padding waste
    = n_bins*capacity - tokens, and fill_rate. Map-side-combined
    two-level agg; rows out = 1."""
    per_bin = (
        packed.filter(~F.col("oversize"))
        .groupBy("bin")
        .agg(F.sum("n_tokens").alias("fill"))
    )
    return per_bin.agg(
        F.count("*").alias("n_bins"),
        F.sum("fill").alias("total_tokens"),
        (F.lit(capacity) * F.count("*") - F.sum("fill")).alias("waste"),
        F.round(F.sum("fill") / (F.lit(capacity) * F.count("*")), 6).alias(
            "fill_rate"
        ),
    )


def curriculum_order(
    packed: DataFrame,
    score_col: str = "quality",
    pack_col: str = "pack_id",
    descending: bool = False,
) -> DataFrame:
    """Curriculum ordering over PACKS: (pack_id, n_docs, pack_tokens,
    mean_score, curriculum_pos) where curriculum_pos ranks packs by
    mean document score — ascending by default (easy→hard curricula
    train on cleaner text first when 'score' is a difficulty proxy;
    flip with descending=True for quality-first annealing orders).
    Tiebreak on pack_id keeps the rank total and deterministic.

    Scale shape: one map-side-combined per-pack aggregate (rows =
    number of packs, ~corpus_tokens/budget — already millions of
    times smaller than the corpus), then a RANGE-PARTITIONED rank
    over that aggregate (r06; removes the tree's last data-bearing
    Exchange SinglePartition): packs range-partition on (mean_score,
    pack_id), each partition ranks its own sorted slice, and the
    per-partition row counts — P driver rows, the pack_assignments
    idiom — shift every slice by the number of packs in earlier
    ranges. At 100 TB / 8k-token packs the ~10^7 aggregate rows sort
    P-way instead of on one reducer; the corpus itself never enters
    the window either way."""
    spark = packed.sparkSession
    agg = packed.groupBy(pack_col).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("n_tokens").alias("pack_tokens"),
        F.round(F.avg(score_col), 6).alias("mean_score"),
    )
    key = F.desc("mean_score") if descending else F.asc("mean_score")
    order = [key, F.asc(pack_col)]
    n = spark.sparkContext.defaultParallelism * 2
    part = (
        agg.repartitionByRange(n, *order)
        .sortWithinPartitions(*order)
        .withColumn("_pid", F.spark_partition_id())
        # same materialize-once pin as pack_assignments: the counts
        # collect and the output job must read the SAME physical
        # partitions (a re-run would re-sample the range partitioner)
        .localCheckpoint(eager=False)
    )
    totals = {
        r["_pid"]: r["c"]
        for r in part.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = [], 0
    for pid in range(max(totals, default=-1) + 1):
        offsets.append((pid, acc))
        acc += totals.get(pid, 0)
    offsets_df = spark.createDataFrame(offsets, "_pid int, _offset long")
    w = Window.partitionBy("_pid").orderBy(*order)
    return (
        part.join(F.broadcast(offsets_df), "_pid")
        .withColumn(
            "curriculum_pos",
            # int and NON-NULLABLE, matching the pre-r06 plain
            # row_number() - 1 schema (the coalesce is a runtime no-op
            # — the inner join guarantees _offset — but restores the
            # non-null flag the join-sourced column loses)
            F.coalesce(
                F.row_number().over(w) - F.lit(1) + F.col("_offset"), F.lit(0)
            ).cast("int"),
        )
        .drop("_pid", "_offset")
    )


def grouped_prefix_sum(
    docs: DataFrame,
    n_tokens: Column,
    group_col: str,
    order_col: str | list[str],
    npartitions: int | None = None,
) -> DataFrame:
    """Per-GROUP exclusive prefix sum — pack_assignments' distributed
    cumsum generalized to independent running totals per group (one
    per language/source/split), still with NO per-group single
    partition: rows range-partition on (group, order...), so a group
    larger than one partition spans several and its offsets chain
    across them, while each partition's window covers only its own
    (partition, group) slice.

    Returns (group_col, order_col..., n_tokens, tokens_before).

    Driver traffic is the per-(partition, group) subtotal table —
    bounded by P + G rows for contiguous range blocks (each partition
    holds whole groups plus at most a leading/trailing partial), the
    same few-MB regime as pack_assignments' P rows.
    """
    spark = docs.sparkSession
    ocols = [order_col] if isinstance(order_col, str) else list(order_col)
    n = npartitions or spark.sparkContext.defaultParallelism * 2
    g_t = docs.schema[group_col].dataType.simpleString()
    slim = (
        docs.select(
            group_col, *ocols, n_tokens.cast("long").alias("n_tokens")
        )
        .repartitionByRange(
            n, F.col(group_col), *[F.col(c) for c in ocols]
        )
        .sortWithinPartitions(group_col, *ocols)
        .withColumn("_pid", F.spark_partition_id())
        # same pin rationale as pack_assignments: totals and output
        # must read the SAME physical partitions
        .localCheckpoint(eager=False)
    )
    totals = slim.groupBy("_pid", group_col).agg(
        F.sum("n_tokens").alias("t")
    ).collect()
    per_group: dict = {}
    for r in sorted(totals, key=lambda r: r["_pid"]):
        g = r[group_col]
        per_group.setdefault(g, []).append((r["_pid"], r["t"]))
    offs = []
    for g, lst in per_group.items():
        acc = 0
        for pid, t in lst:
            offs.append((pid, g, acc))
            acc += t
    offsets_df = spark.createDataFrame(
        offs, f"_pid int, {group_col} {g_t}, _offset long"
    )
    w = (
        Window.partitionBy("_pid", group_col)
        .orderBy(*ocols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # eqNullSafe on the group: a NULL group (missing language/source)
    # is a legitimate group of its own — a plain equi-join would
    # silently DROP those rows (review r05), breaking the one-output-
    # row-per-input-row contract
    off = F.broadcast(offsets_df).withColumnsRenamed(
        {"_pid": "_opid", group_col: "_og"}
    )
    return (
        slim.join(
            off,
            (F.col("_pid") == F.col("_opid"))
            & F.col(group_col).eqNullSafe(F.col("_og")),
        )
        .withColumn(
            "tokens_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            + F.col("_offset"),
        )
        .select(group_col, *ocols, "n_tokens", "tokens_before")
    )

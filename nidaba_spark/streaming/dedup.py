"""Continuous near-dup curation: a Structured Streaming job that
dedups each arriving micro-batch of documents against the PERSISTED
MinHash-LSH index of everything kept so far, then appends the
survivors AND their index rows.

This is the streaming composition of ``dedup.minhash_index`` /
``minhash_lsh_pairs_incremental`` (whose soundness — exact index
associativity — is what lets the index grow batch-by-batch): the
historical corpus text is never rescanned; every micro-batch costs
work proportional to itself plus its collision neighborhood, so the
job's per-batch cost stays FLAT as the curated corpus grows into the
10^12-row regime (only the (band,bucket) join fans into the index,
which at scale is stored partitioned by (band,bucket)).

Exactly-once: the file-source checkpoint guarantees each drop is
processed once per checkpoint lineage; within foreachBatch every
write is an idempotent OVERWRITE of a batch_id-keyed subdirectory, so
a crashed-and-replayed batch converges to the same bytes instead of
appending duplicates (partition-overwrite is the same pattern an
Iceberg ``replaceWhere(batch_id)`` gives on a cluster).

Keep policy (deterministic): a new doc is dropped iff it near-dups
anything already kept (history wins) or a smaller-id doc of its own
batch (keep-min). Every survivor has NO kept near-dup at commit
time; within-batch chains (a~b~c without a~c) may conservatively
over-drop the tail — the same one-sided bias as every hygiene stage
here. For cluster-exact resolution inside huge batches, feed the
pairs through ``operators/cluster.connected_components`` instead.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import _pairs_from_indexes, minhash_index

_INDEX_COLS = ["id", "band", "bucket", "sig"]


def _read_dir(spark: SparkSession, path: str, cols: list[str] | None = None):
    """Read a batch=*-partitioned table, or None before the first
    batch. Existence is probed EXPLICITLY through Spark's Hadoop FS
    layer (works for hdfs://-or-s3a:// work_dirs, unlike driver-local
    os.path) and ONLY a genuinely-absent path maps to None: a broad
    except around the read would swallow transient FS/permission
    errors too, silently disabling cross-batch dedup for that
    micro-batch while its kept/index writes still commit — duplicates
    would leak into the curated corpus permanently (ADVICE r04).
    Genuine read errors propagate and fail the batch, which the
    engine-checkpoint replay then retries."""
    sc = spark.sparkContext
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(sc._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    # a crash DURING the first batch's index write leaves the dir with
    # only _temporary content; treating that as "index exists" would
    # fail schema inference on every checkpoint replay — an unhealable
    # poison, since the overwrite that would fix it sits after this
    # read. Committed-data probe: any .parquet file outside
    # _temporary. Genuine FS errors still raise out of listFiles.
    it = fs.listFiles(jpath, True)
    has_data = False
    while it.hasNext():
        p = it.next().getPath().toString()
        if "/_temporary/" not in p and p.endswith(".parquet"):
            has_data = True
            break
    if not has_data:
        return None
    df = spark.read.parquet(path)
    return df.select(*cols) if cols else df


def dedup_docs_stream(
    spark: SparkSession,
    source_dir: str,
    work_dir: str,
    schema,
    threshold: float = 0.5,
    num_hashes: int = 64,
    bands: int = 16,
    shingle_k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_files_per_trigger: int | None = None,
):
    """Drain all available drops from ``source_dir`` through the
    incremental dedup (availableNow trigger), maintaining
    ``work_dir/kept`` (surviving docs) and ``work_dir/index`` (their
    LSH index rows), both batch_id-partitioned. Returns the finished
    StreamingQuery; re-running with the same work_dir resumes from
    the checkpoint and reprocesses nothing.
    """
    kept_dir = os.path.join(work_dir, "kept")
    index_dir = os.path.join(work_dir, "index")
    ckpt = os.path.join(work_dir, "ckpt")

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        ss = batch_df.sparkSession
        batch_df = batch_df.dropDuplicates([id_col]).localCheckpoint(eager=False)
        # signatures are computed ONCE per batch: the same index rows
        # feed the candidate join here AND (semi-joined to the
        # survivors) the index write below — going through
        # minhash_lsh_pairs_incremental plus a second minhash_index
        # call would shingle+hash every document's text twice, nearly
        # doubling the dominant per-batch cost (review r05)
        new_idx = minhash_index(
            batch_df, num_hashes, bands, shingle_k, text_col, id_col
        ).localCheckpoint(eager=False)
        hist = _read_dir(ss, index_dir, _INDEX_COLS)
        idx = hist if hist is not None else new_idx.limit(0)
        pairs = _pairs_from_indexes(new_idx, idx, num_hashes, threshold)
        bids = batch_df.select(F.col(id_col).alias("_bid"))
        flagged = (
            pairs.join(
                bids.withColumnRenamed("_bid", "id_a").withColumn(
                    "_a_new", F.lit(True)
                ),
                "id_a",
                "left",
            ).join(
                bids.withColumnRenamed("_bid", "id_b").withColumn(
                    "_b_new", F.lit(True)
                ),
                "id_b",
                "left",
            )
        )
        # history wins; within the batch the larger id loses (keep-min)
        drop = flagged.select(
            F.when(F.col("_a_new") & F.col("_b_new").isNull(), F.col("id_a"))
            .when(F.col("_b_new") & F.col("_a_new").isNull(), F.col("id_b"))
            .otherwise(F.greatest("id_a", "id_b"))
            .alias("_drop")
        ).distinct()
        kept = batch_df.join(
            drop, batch_df[id_col] == drop["_drop"], "left_anti"
        ).localCheckpoint(eager=False)
        kept.write.mode("overwrite").parquet(
            os.path.join(kept_dir, f"batch={batch_id}")
        )
        new_idx.join(
            kept.select(F.col(id_col).alias("_kid")),
            F.col("id") == F.col("_kid"),
            "left_semi",
        ).write.mode("overwrite").parquet(
            os.path.join(index_dir, f"batch={batch_id}")
        )

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def read_kept(spark: SparkSession, work_dir: str) -> DataFrame | None:
    """The deduped corpus the stream maintains (None before first batch)."""
    return _read_dir(spark, os.path.join(work_dir, "kept"))

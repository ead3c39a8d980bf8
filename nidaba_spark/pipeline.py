"""Pipeline driver: staged DAG, salted repartition, checkpoint/resume,
per-partition lineage + accumulator metrics.

This is the Spark rendition of nidaba's ``Batch`` controller
(reference: nidaba/nidaba.py `Batch.add_task`/`run` building a Celery
chain of task groups; per-task state in a Redis doc via
nidaba/tasks/helper.py `NidabaTask`; artifacts through
nidaba/storage.py — SURVEY.md §2A A1–A2, A20–A21):

  * the Celery chain        → a fixed sequence of DataFrame stage
                              transforms (decode → segment → classify
                              → merge)
  * util.sync barriers      → checkpoint writes at stage boundaries
                              (parquet dir + manifest JSON; Iceberg
                              table appends on a real cluster)
  * Redis batch state       → the run directory's manifests +
                              ``_lineage`` table
  * NidabaTask bookkeeping  → per-partition lineage rows + Spark
                              accumulators (docs/bytes counters)
  * storage.py atomicity    → write-to-tmp-then-rename (Iceberg
                              snapshot commit on a real cluster)

Skew handling (north_rule: "salted repartition by content-length
bucket"): pages are repartitioned by
``(length_bucket = floor(log2(n_bytes+1)), salt = pmod(xxhash64(url),
nsalt))`` before the Python stages, so one mega-page bucket spreads
over ``nsalt`` partitions instead of stalling one task. AQE stays on
as the second line of defense.

Resume (north_rule: "resumable from checkpoint"): ``run`` skips every
stage whose manifest is already valid for this run_id and re-executes
from the first missing one; lineage rows of completed stages are left
untouched and re-executed stages append rows with attempt+1.
"""

from __future__ import annotations

import datetime as dt
import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas
from .operators.classify import classify_stage
from .operators.decode import decode_stage
from .operators.merge import merge_stage
from .operators.segment import segment_stage

STAGES = ["decode", "segment", "classify", "merge"]

_STAGE_FN = {
    "decode": decode_stage,
    "segment": segment_stage,
    "classify": classify_stage,
    "merge": merge_stage,
}

_STAGE_SCHEMA = {
    "decode": schemas.DECODED,
    "segment": schemas.SEGMENTED,
    "classify": schemas.CLASSIFIED,
    "merge": schemas.EXTRACTED,
}

# Column whose octet_length approximates the stage's payload bytes
# (for lineage bytes_out without a full-row serialization pass).
_STAGE_BYTES_COL = {
    "decode": "body",
    "segment": "to_json(blocks)",
    "classify": "to_json(kept)",
    "merge": "text",
}


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Catalyst's plan-time size estimate (bytes) of a DataFrame — no
    action, no data read; file-backed scans report real file sizes.
    Returns None where the JVM plan is unreachable (Spark Connect)."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:
        return None


def prepare(pages: DataFrame, nsalt: int = 256, npartitions: int | None = None) -> DataFrame:
    """Attach skew keys and repartition: the pipeline's only shuffle.

    nsalt defaults to 256 so (length_bucket, salt) has far more
    distinct combos than partitions — with only ~nsalt combos the hash
    partitioner packs lumpily (measured: 0..3x-mean rows per partition
    at nsalt=32); a wide salt space evens both rows and bytes while the
    bucket term still spreads mega-pages and keeps size-homogeneous
    Arrow batches.

    npartitions defaults to 8×parallelism: the Python stage dominates
    wall-clock and page sizes are heavy-tailed, so more/smaller waves
    shrink the last-wave straggler tail (measured on the 300k bench
    corpus: cores×8 beats cores×4 on both absolute time and 4→16-core
    scaling efficiency, 0.86 vs 0.84; cores×16 regresses from task
    overhead)."""
    df = pages.withColumn("n_bytes_raw", F.coalesce(F.octet_length("html"), F.lit(0)))
    df = df.withColumn(
        "length_bucket",
        F.floor(F.log2(F.col("n_bytes_raw") + F.lit(1))).cast("int"),
    )
    df = df.withColumn("salt", F.pmod(F.xxhash64("url"), F.lit(nsalt)).cast("int"))
    n = npartitions or 8 * pages.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n, "length_bucket", "salt").drop("n_bytes_raw", "salt")


def transform(pages_prepared: DataFrame, upto: str = "merge") -> DataFrame:
    """Fused lazy composition (no checkpoints) — the bench hot path."""
    df = pages_prepared
    for stage in STAGES[: STAGES.index(upto) + 1]:
        df = _STAGE_FN[stage](df)
    return df


def extract(
    pages: DataFrame,
    nsalt: int = 256,
    npartitions: int | None = None,
    mode: str = "fused",
    metrics=None,
) -> DataFrame:
    """One-call pipeline: pages → EXTRACTED (lazy).

    mode='fused'        — text-pruned two-phase hot path (below);
    mode='fused_noshuffle' — same two-phase plan WITHOUT the salted
                          repartition: parse runs directly on the
                          source's own splits. Correct whenever the
                          input partitioning is already byte-balanced
                          (parquet row groups / WARC segments / an
                          Iceberg table bucketed at write time —
                          parse cost ∝ bytes, so byte-balanced splits
                          are load-balanced without any runtime
                          shuffle). The salted repartition buys
                          balance for UNBALANCED sources at the price
                          of one full-corpus shuffle; measured A/B at
                          the 1M corpus in NOTES.md r04.
    mode='fused_inline' — single mapInPandas pass carrying the crawler
                          text column through the shuffle;
    mode='staged'       — the four composable stage transforms (what
                          the checkpointed Pipeline runs).
    Byte-identical outputs (golden + equivalence tests).

    The 'fused' plan prunes the crawler ``text`` column out of the
    pipeline's one big shuffle and its Arrow transfer — measured 46%
    of the corpus bytes, consulted only for the ~2% of docs whose
    parse keeps nothing (oracle step 4). Shape:

      pages ── select(url, ts, lang, html) ─ salted Exchange ─ fused
        parse ─ localCheckpoint ─┬─ kept>0 ────────────────────┬ union
                                 └─ kept==0 (skinny) ─ b-cast ─┤
                 pages ─ select(url, text) ─ broadcast-join ───┘
                                              └ fallback mapInPandas

    The localCheckpoint materializes phase 1 ONCE into executor-local
    storage so the two consumers don't re-run the parser (a plain
    .persist would be wrong here: Spark's CacheManager matches
    canonicalized plans, so a fresh identical extract() call — e.g.
    bench repetitions — would silently read the previous call's cache
    and time nothing). The needy side is skinny (~2% of urls) and is
    broadcast only under a plan-time size guard (below); the text scan
    is column-pruned to (url, warc_ts, text) so html is never read
    twice. The join keys on [url, warc_ts] — url alone would fan out
    duplicate urls recrawled at different timestamps (ADVICE r03). At
    10^12-row scale the same shape holds with the stage checkpoint as
    the materialization and the fallback join storage-partitioned by
    the Iceberg table's url bucketing.

    Fallback-join broadcast guard (VERDICT r03 "what's wrong" #2: an
    unconditional F.broadcast dies at the 10^12-row design point,
    where 2% of urls is ~2×10^10 rows — far past any driver/broadcast
    limit). ``spark.nidaba.fallbackBroadcast``:

      * ``auto`` (default) — hint broadcast only while Catalyst's
        plan-time size estimate of the INPUT pages relation is under
        ``spark.nidaba.fallbackBroadcastCeilingBytes`` (default 64
        GiB). The input estimate is the proxy because the needy side
        sits behind the lazy localCheckpoint (a LogicalRDD whose
        stats are the defaultSizeInBytes sentinel, useless) while the
        input is a file-backed scan with real stats; needy rows scale
        linearly with input rows (~2% × ~120 B/row, so a 64 GiB input
        ceiling bounds the broadcast at a few tens of MB). Above the
        ceiling NO hint is emitted and AQE picks the strategy from
        runtime shuffle stats — broadcast if the needy side really is
        small, shuffle join otherwise — which is the 100×-safe plan.
      * ``on`` / ``off`` — force the hint / force AQE.
    """
    if mode in ("fused", "fused_noshuffle"):
        from pyspark import StorageLevel

        from .operators.fused import fallback_stage, fused_extract_stage

        slim = pages.select("url", "warc_ts", "html", "lang")
        prepared = (
            slim if mode == "fused_noshuffle" else prepare(slim, nsalt, npartitions)
        )
        # DISK_ONLY: the checkpoint blocks ride the OS page cache instead
        # of competing with execution memory for heap (MEMORY_AND_DISK
        # OOMed the 16g local JVM at 500k pages under 32 readers).
        #
        # r06 (VERDICT r05 next #5): AQE is disabled around the
        # lazy-localCheckpoint build. Dataset.checkpoint calls
        # queryExecution.toRdd, and an ADAPTIVE phase-1 plan
        # materializes its shuffle query stage EAGERLY at that point —
        # billing the whole corpus scan + shuffle write to plan-build
        # time and paying an extra job barrier + re-planning pass. AQE
        # buys phase 1 nothing (explicit repartition N is never
        # coalesced; there is no join to skew-split), so the
        # non-adaptive plan is identical work minus the barrier.
        # Measured paired at the 50k bench corpus: plan_sec 1.0-1.5 ->
        # 0.2-0.3 s with equal-or-better totals. The session conf is
        # restored immediately; downstream plans (fallback join,
        # callers' aggregates) are created after restore and keep AQE.
        # Conf knob: spark.nidaba.checkpointAqe=on forces the old
        # behavior (single-threaded driver assumption documented —
        # concurrent extract() builds from driver threads would race
        # the toggle; jobs/ submit entry points build sequentially).
        spark = pages.sparkSession
        ckpt_aqe = spark.conf.get("spark.nidaba.checkpointAqe", "off") == "on"
        aqe_was = spark.conf.get("spark.sql.adaptive.enabled", "true")
        if not ckpt_aqe:
            spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            ext0 = fused_extract_stage(
                prepared, metrics, with_text=False
            ).localCheckpoint(eager=False, storageLevel=StorageLevel.DISK_ONLY)
        finally:
            if not ckpt_aqe:
                spark.conf.set("spark.sql.adaptive.enabled", aqe_was)
        ok = ext0.filter(F.col("n_blocks_kept") > 0)
        needy = ext0.filter(F.col("n_blocks_kept") == 0).select(
            "url", "warc_ts", "lang", "doctype", "n_blocks_dropped"
        )
        conf = pages.sparkSession.conf
        bcast_mode = conf.get("spark.nidaba.fallbackBroadcast", "auto")
        if bcast_mode == "on":
            do_bcast = True
        elif bcast_mode == "off":
            do_bcast = False
        else:
            ceiling = int(
                conf.get("spark.nidaba.fallbackBroadcastCeilingBytes", str(64 << 30))
            )
            est = _plan_size_bytes(pages)
            do_bcast = est is not None and est < ceiling
        # join semantics (review r05): warc_ts compares NULL-SAFE —
        # the WARC source deliberately coerces malformed warc-date to
        # NaT, and a null-unsafe equi-join would silently DROP every
        # null-ts needy row (staged/fused_inline keep them). Known
        # divergence, accepted to keep the zero-extra-Exchange plan
        # (plan-shape-pinned): EXACT-duplicate (url, warc_ts) input
        # rows whose parse keeps nothing fan out n×n here where the
        # staged path emits n — dedup identical captures upstream if
        # exact-dup inputs are possible (curate's recrawl dedup does).
        n2 = (
            (F.broadcast(needy) if do_bcast else needy)
            .withColumnRenamed("url", "_nu")
            .withColumnRenamed("warc_ts", "_nts")
        )
        matched = (
            pages.select("url", "warc_ts", "text")
            .join(
                n2,
                (F.col("url") == F.col("_nu"))
                & F.col("warc_ts").eqNullSafe(F.col("_nts")),
            )
            .drop("_nu", "_nts")
        )
        patched = fallback_stage(matched)
        return ok.unionByName(patched)
    prepared = prepare(pages, nsalt, npartitions)
    if mode == "fused_inline":
        from .operators.fused import fused_extract_stage

        return fused_extract_stage(prepared, metrics)
    if mode != "staged":
        # a typo'd mode silently ran the slow staged path while the
        # caller believed they measured the fused plan (review r05)
        raise ValueError(
            f"unknown extract mode {mode!r}; expected one of "
            "'fused', 'fused_noshuffle', 'fused_inline', 'staged'"
        )
    if metrics is not None:
        # staged path previously dropped the metrics argument — a
        # run_incremental(mode='staged') manifest reported all-zero
        # accumulators despite processing the whole batch
        df = _STAGE_FN["decode"](prepared, metrics)
        for stage in STAGES[1:]:
            df = _STAGE_FN[stage](df)
        return df
    return transform(prepared)


class Pipeline:
    """Checkpointed, resumable runner (the spark-submit entry's engine)."""

    def __init__(
        self,
        spark: SparkSession,
        run_dir: str,
        run_id: str = "run0",
        nsalt: int = 256,
        npartitions: int | None = None,
    ) -> None:
        self.spark = spark
        self.run_dir = os.path.join(run_dir, f"run_id={run_id}")
        self.run_id = run_id
        self.nsalt = nsalt
        self.npartitions = npartitions
        os.makedirs(self.run_dir, exist_ok=True)

    # -- checkpoint bookkeeping -------------------------------------
    def _stage_path(self, stage: str) -> str:
        return os.path.join(self.run_dir, f"stage={stage}")

    def _manifest_path(self, stage: str) -> str:
        return os.path.join(self.run_dir, f"manifest_{stage}.json")

    @staticmethod
    def _write_json_atomic(path: str, obj) -> None:
        """tmp + os.replace, like every data write here: a crash mid
        open('w')+dump leaves truncated JSON that makes manifest()/
        is_complete() raise forever — bricking resume (review r05)."""
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(obj, f)
        os.replace(tmp, path)

    def manifest(self, stage: str) -> dict | None:
        p = self._manifest_path(stage)
        if not os.path.exists(p):
            return None
        with open(p) as f:
            return json.load(f)

    def is_complete(self, stage: str) -> bool:
        m = self.manifest(stage)
        return bool(m and m.get("status") == "ok" and os.path.isdir(self._stage_path(stage)))

    def _attempts_path(self) -> str:
        return os.path.join(self.run_dir, "attempts.json")

    def _bump_attempt(self, stage: str) -> int:
        """Monotone per-stage attempt counter. Lives outside the
        checkpoint dirs so invalidation does not reset it (FIXTURES.md
        §4: resumed stages must log attempt=2, not restart at 1)."""
        attempts: dict[str, int] = {}
        if os.path.exists(self._attempts_path()):
            with open(self._attempts_path()) as f:
                attempts = json.load(f)
        attempts[stage] = attempts.get(stage, 0) + 1
        self._write_json_atomic(self._attempts_path(), attempts)
        return attempts[stage]

    def _orphan_inc_attempts(self, since_attempt: int, before_attempt: int) -> list[int]:
        """Attempts k with since < k < before that left inc{k}-part
        files in the merge checkpoint: whole data files landed by a
        crashed incremental move AFTER the last manifest write. Their
        rows are real (readers and the url anti-join see them) but the
        manifest's incremental row arithmetic never counted them."""
        import re

        p = self._stage_path("merge")
        if not os.path.isdir(p):
            return []
        found = set()
        for fname in os.listdir(p):
            m = re.match(r"inc(\d+)-part-", fname)
            if m and since_attempt < int(m.group(1)) < before_attempt:
                found.add(int(m.group(1)))
        return sorted(found)

    def invalidate_from(self, stage: str) -> None:
        """Drop checkpoints for `stage` and everything after (test/ops hook)."""
        for s in STAGES[STAGES.index(stage):]:
            shutil.rmtree(self._stage_path(s), ignore_errors=True)
            try:
                os.remove(self._manifest_path(s))
            except FileNotFoundError:
                pass

    # -- lineage ------------------------------------------------------
    def _lineage_dir(self) -> str:
        d = os.path.join(self.run_dir, "_lineage")
        os.makedirs(d, exist_ok=True)
        return d

    def _append_lineage(
        self,
        stage: str,
        attempt: int,
        input_rows: int,
        bytes_in: int,
        started: dt.datetime,
        finished: dt.datetime,
    ) -> int:
        """Aggregate the freshly written checkpoint per partition id and
        write the lineage rows DISTRIBUTED (no driver collect — at 10^6
        partitions a collect()ed per-partition list is a driver-memory
        tax). One columnar scan of the checkpoint (pruned to _pid + the
        payload column) feeds both the lineage write and the manifest
        row count: the per-partition aggregate is persisted (it is tiny
        — one row per partition), written as parquet, then summed for
        the return value, so the big table is scanned exactly once.

        Returns the stage's total output rows (for the manifest).
        """
        out = self.spark.read.parquet(self._stage_path(stage))
        agg = out.groupBy(F.col("_pid").alias("partition_id")).agg(
            F.count(F.lit(1)).alias("output_rows"),
            F.coalesce(
                F.sum(F.octet_length(F.expr(_STAGE_BYTES_COL[stage]))), F.lit(0)
            ).alias("bytes_out"),
        )
        lineage = agg.select(
            F.lit(self.run_id).alias("run_id"),
            F.lit(stage).alias("stage"),
            F.col("partition_id").cast("int").alias("partition_id"),
            F.lit(input_rows).cast("long").alias("input_rows"),
            F.col("output_rows").cast("long").alias("output_rows"),
            F.lit(bytes_in).cast("long").alias("bytes_in"),
            F.col("bytes_out").cast("long").alias("bytes_out"),
            F.lit(started).alias("started"),
            F.lit(finished).alias("finished"),
            F.lit(attempt).cast("int").alias("attempt"),
            F.lit("ok").alias("status"),
        ).persist()
        lineage.coalesce(1).write.mode("append").parquet(self._lineage_dir())
        tot = lineage.select(
            F.sum("output_rows"), F.sum("bytes_out")
        ).collect()[0]
        lineage.unpersist()
        return int(tot[0] or 0), int(tot[1] or 0)

    def lineage(self) -> DataFrame:
        return self.spark.read.schema(schemas.LINEAGE).parquet(self._lineage_dir())

    # -- execution ----------------------------------------------------
    def _write_checkpoint(self, df: DataFrame, stage: str) -> None:
        final = self._stage_path(stage)
        tmp = final + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        df.write.mode("overwrite").parquet(tmp)
        shutil.rmtree(final, ignore_errors=True)
        os.rename(tmp, final)  # atomic stage commit (Iceberg snapshot analog)

    def run(self, pages: DataFrame, resume: bool = True) -> DataFrame:
        """Execute all stages with checkpoints; returns the extracted DF."""
        if not resume:
            self.invalidate_from(STAGES[0])

        from .metrics import StageMetrics

        prev_bytes = 0
        for i, stage in enumerate(STAGES):
            if resume and self.is_complete(stage):
                continue
            # input = previous checkpoint (or raw pages for stage 0)
            if i == 0:
                inp = prepare(pages, self.nsalt, self.npartitions)
            else:
                if not self.is_complete(STAGES[i - 1]):
                    raise RuntimeError(f"stage {STAGES[i-1]} incomplete; cannot run {stage}")
                inp = self.spark.read.schema(_STAGE_SCHEMA[STAGES[i - 1]]).parquet(
                    self._stage_path(STAGES[i - 1])
                )
            attempt = self._bump_attempt(stage)
            started = dt.datetime.now(dt.timezone.utc)
            # executor-side accumulator metrics (A20) on the Python stages
            metrics = StageMetrics(self.spark.sparkContext, stage) if stage == "decode" else None
            out = _STAGE_FN[stage](inp, metrics) if metrics else _STAGE_FN[stage](inp)
            self._write_checkpoint(out, stage)
            finished = dt.datetime.now(dt.timezone.utc)
            prev_m = self.manifest(STAGES[i - 1]) if i > 0 else None
            if prev_m:
                input_rows = prev_m["rows"]
            elif metrics is not None:
                input_rows = metrics.docs_in.value  # stage 0: from accumulators
            else:
                input_rows = -1
            bytes_in = metrics.bytes_in.value if metrics is not None else prev_bytes
            n_rows, bytes_out = self._append_lineage(
                stage, attempt, input_rows, bytes_in, started, finished
            )
            self._write_json_atomic(
                self._manifest_path(stage),
                {
                    "run_id": self.run_id,
                    "stage": stage,
                    "status": "ok",
                    "attempt": attempt,
                    "rows": n_rows,
                    "started": started.isoformat(),
                    "finished": finished.isoformat(),
                    "accumulators": metrics.snapshot() if metrics else None,
                },
            )
            # flow this stage's measured output bytes into the next
            # stage's lineage bytes_in (was a dead `prev_bytes = 0`
            # reassignment, so every post-decode stage logged 0)
            prev_bytes = bytes_out
        return self.spark.read.schema(schemas.EXTRACTED).parquet(self._stage_path("merge"))

    def markdown(self) -> DataFrame:
        """Structure-preserving Markdown off the SEGMENT checkpoint —
        a free by-product of a completed (or resumed) run: the parse
        already happened, so this is one pure-Column rendering pass
        over stage=segment with zero Python and no re-extraction
        (operators/markdown.markdown_stage; --markdown-out on the
        spark-submit entry)."""
        from .operators.markdown import markdown_stage

        if not self.is_complete("segment"):
            raise RuntimeError("segment stage incomplete; run() first")
        seg = self.spark.read.schema(_STAGE_SCHEMA["segment"]).parquet(
            self._stage_path("segment")
        )
        return markdown_stage(seg)

    def run_incremental(self, pages: DataFrame, mode: str = "fused") -> DataFrame:
        """Row-level resume (SURVEY.md §3.2 E2'): anti-join the input's
        urls against the completed merge checkpoint (B10) and process
        only the NEW pages, appending to the checkpoint. The stage-level
        ``run`` recovers interrupted runs; this recovers grown inputs
        (the next crawl drop) without touching finished work.
        """
        from .metrics import StageMetrics

        merge_path = self._stage_path("merge")
        # Gate the anti-join on the checkpoint DIRECTORY, not manifest
        # validity (ADVICE r02): the per-file move protocol can crash
        # after whole part-files landed but before the manifest write —
        # those rows are real and must not be reprocessed/duplicated,
        # so read existing urls whenever any checkpoint data exists.
        if os.path.isdir(merge_path):
            # key = (url, warc_ts) with a NULL-SAFE ts compare, not url
            # alone (review r05): a recrawl of a known url at a new
            # timestamp is a new snapshot and must be processed (the
            # data model explicitly carries per-ts recrawls — the
            # extract fallback join keys the same way), and a crash
            # that moved only some of a url's part-files must not
            # shadow the unmoved rows at other timestamps.
            done = (
                self.spark.read.schema(schemas.EXTRACTED)
                .parquet(merge_path)
                .select(
                    F.col("url").alias("_du"), F.col("warc_ts").alias("_dts")
                )
            )
            todo = pages.join(
                done,
                (pages["url"] == F.col("_du"))
                & pages["warc_ts"].eqNullSafe(F.col("_dts")),
                "left_anti",
            )
        else:
            todo = pages
        metrics = StageMetrics(self.spark.sparkContext, "incremental")
        ext = extract(todo, self.nsalt, self.npartitions, mode=mode, metrics=metrics)
        started = dt.datetime.now(dt.timezone.utc)
        attempt = self._bump_attempt("merge")
        # Stage-commit discipline (matches _write_checkpoint): never
        # mode('append') into the live checkpoint — a crash mid-append
        # would leave partial part-files under a manifest that still
        # says status=ok. Write to a tmp dir (Spark's committer makes
        # it internally consistent), then move the completed data files
        # in with per-file atomic renames. An interrupted move leaves a
        # subset of WHOLE new files and the old manifest: readers stay
        # consistent and the url anti-join simply reprocesses the
        # unmoved remainder on the next call (no duplicates — a file is
        # either fully present or absent).
        tmp = merge_path + f".inc{attempt}.tmp"
        # sweep orphaned tmp dirs from CRASHED attempts (each attempt
        # gets a new name, so nothing else ever cleans them — an
        # unbounded disk leak across restarts; their rows were never
        # moved in, and the anti-join re-extracts them, so deleting is
        # safe)
        import glob as _glob

        for stale in _glob.glob(merge_path + ".inc*.tmp"):
            shutil.rmtree(stale, ignore_errors=True)
        ext.write.mode("overwrite").parquet(tmp)
        # Manifest row count = prior rows + rows in this batch — never a
        # full re-count of the merge checkpoint (VERDICT r02 "what's
        # wrong" #4: at 10^12 rows that's a table scan per crawl drop).
        # Counting tmp touches only the new files' parquet footers; the
        # prior count comes from the last valid manifest, falling back
        # to one recovery count() only when a crash left data without a
        # manifest (rare, and the count is then the repair).
        n_new = self.spark.read.parquet(tmp).count()
        prev_m = self.manifest("merge") if self.is_complete("merge") else None
        if prev_m is not None and self._orphan_inc_attempts(
            int(prev_m.get("attempt", 0)), attempt
        ):
            # A crash mid-move left whole inc{k} part-files in the
            # checkpoint under the OLD still-valid manifest (ADVICE
            # r03): is_complete() is true but the manifest count
            # excludes those rows — and would forever, since the
            # incremental arithmetic only ever adds n_new on top.
            # Reconcile with one recovery count() now (the orphans'
            # urls were already excluded from this batch by the
            # anti-join, so checkpoint rows + n_new is exact).
            prev_m = None
        if prev_m is not None:
            prev_rows = prev_m["rows"]
        elif os.path.isdir(merge_path):
            prev_rows = self.spark.read.schema(schemas.EXTRACTED).parquet(merge_path).count()
        else:
            prev_rows = 0
        if not os.path.isdir(merge_path):
            os.rename(tmp, merge_path)
        else:
            for fname in sorted(os.listdir(tmp)):
                if fname.startswith("part-"):
                    os.rename(
                        os.path.join(tmp, fname),
                        os.path.join(merge_path, f"inc{attempt}-{fname}"),
                    )
            shutil.rmtree(tmp, ignore_errors=True)
        finished = dt.datetime.now(dt.timezone.utc)
        n_rows = prev_rows + n_new
        self._write_json_atomic(
            self._manifest_path("merge"),
            {
                "run_id": self.run_id,
                "stage": "merge",
                "status": "ok",
                "attempt": attempt,
                "rows": n_rows,
                "started": started.isoformat(),
                "finished": finished.isoformat(),
                "accumulators": metrics.snapshot(),
                "incremental": True,
            },
        )
        return self.spark.read.schema(schemas.EXTRACTED).parquet(merge_path)

"""Custom stateful streaming operator: recrawl change detection.

Continuous-crawl companion to streaming/extract.py: a crawler
revisits urls forever, but at 10^12-document scale you only want to
re-run extraction (and re-embed, re-dedup, re-index) for pages whose
CONTENT actually drifted. The built-in stateful tools can't express
this — dropDuplicatesWithinWatermark keys on equality of a column
set (first-wins), while change detection needs *last-state
comparison with transition emission*: keep the previous content
hash per url, emit a row exactly when the new crawl's hash differs,
update the state. That is the custom-stateful shape
``applyInPandasWithState`` exists for (SURVEY §2 B49's
transformWithState seam).

Scale notes:

  * State is one (hash, change_seq, last_ts) triple per url —
    bytes-sized, hash-partitioned by the grouping key across
    executors; the state store checkpoints with the query, so a
    relaunched job resumes its memory of every url it has ever seen.
  * The per-batch python work is vectorized: one xxhash is computed
    JVM-side BEFORE the stateful stage (codegen), so the python
    function only compares longs — no page bytes ever enter the
    state store or the python worker.
  * Event-time ordering inside a batch is handled by sorting each
    group's rows by warc_ts; cross-batch ordering is the stream's
    own arrival order (a real crawl frontier delivers per-url
    revisits in order; for out-of-order sources put a watermark +
    sort upstream).
  * State TTL: passing ``timeout=ProcessingTimeTimeout`` arms a real
    per-url TTL (``ttl_ms``, default 30 days) — timed-out urls drop
    their state, bounding the store to recently-recrawled urls
    (NoTimeout default keeps the sandbox test deterministic).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

CHANGES = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("warc_ts", T.TimestampType()),
        T.StructField("content_hash", T.LongType()),
        T.StructField("change_seq", T.IntegerType()),  # 0 = first sighting
    ]
)

_STATE = T.StructType(
    [
        T.StructField("last_hash", T.LongType()),
        T.StructField("change_seq", T.IntegerType()),
    ]
)


def _make_detect(ttl_ms: int | None):
    """Handler factory: with ``ttl_ms`` set (ProcessingTimeTimeout
    mode) every state update arms a TTL and a timed-out url's state is
    REMOVED — bounding the state store to recently-seen urls. A url
    revisited after expiry re-emits a first-sighting row with
    change_seq restarting at 0 (the documented cost of bounded
    state). With ttl_ms None the state lives forever (NoTimeout)."""

    def _detect(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (url,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_hash, seq = state.get
        else:
            last_hash, seq = None, -1
        out_ts, out_hash, out_seq = [], [], []
        # Drain the whole group before sorting: a url's rows can span
        # multiple chunks of the iterator, and per-chunk sorting would
        # mis-order cross-chunk revisits. Per-url-per-batch row counts
        # are recrawl counts — tiny — so this buffers bytes, not pages.
        rows = [
            pair
            for pdf in pdfs
            for pair in zip(pdf["warc_ts"], pdf["content_hash"])
        ]
        for ts, h in sorted(rows, key=lambda p: p[0]):
            h = int(h)
            if last_hash is None or h != last_hash:
                seq += 1
                last_hash = h
                out_ts.append(ts)
                out_hash.append(h)
                out_seq.append(seq)
        state.update((last_hash, seq))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        if out_ts:
            yield pd.DataFrame(
                {
                    "url": url,
                    "warc_ts": out_ts,
                    "content_hash": out_hash,
                    "change_seq": out_seq,
                }
            )

    return _detect


def detect_changes(
    pages_stream: DataFrame,
    timeout: str = GroupStateTimeout.NoTimeout,
    ttl_ms: int = 30 * 24 * 3600 * 1000,
) -> DataFrame:
    """pages stream -> append stream of (url, warc_ts, content_hash,
    change_seq): one row per first sighting or content change.

    The hash is computed JVM-side (xxhash64 over html bytes + crawler
    text) so the stateful python stage never touches page payloads.

    ``timeout=GroupStateTimeout.ProcessingTimeTimeout`` ARMS a real
    state TTL of ``ttl_ms`` per url (default 30 days): the handler
    sets the duration on every update and removes timed-out state, so
    the store is bounded by recently-recrawled urls instead of the
    whole url universe (the parameter used to be accepted but never
    wired — silently identical to NoTimeout, review r05). A url
    revisited after expiry re-emits a first-sighting row.
    """
    hashed = pages_stream.select(
        "url",
        "warc_ts",
        F.xxhash64(F.col("html"), F.coalesce(F.col("text"), F.lit(""))).alias(
            "content_hash"
        ),
    )
    arm_ttl = timeout == GroupStateTimeout.ProcessingTimeTimeout
    return hashed.groupBy("url").applyInPandasWithState(
        _make_detect(ttl_ms if arm_ttl else None),
        CHANGES,
        _STATE,
        "append",
        timeout,
    )


def changed_pages_stream(
    spark,
    source_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Maintain a parquet change-log table from a crawl drop folder
    (exactly-once, checkpoint-resumable — same contract as
    extract_pages_stream)."""
    from .. import schemas

    pages = spark.readStream.schema(schemas.PAGES).parquet(source_dir)
    changes = detect_changes(pages)
    writer = (
        changes.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q

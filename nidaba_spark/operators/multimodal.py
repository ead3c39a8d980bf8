"""Multimodal columns: opaque binary payloads + typed metadata.

Training-data-pipeline component (driver instruction): image/audio/
video travel as ``binary`` columns with a metadata struct; decode /
feature-extract / resize / frame-sample are Arrow-batched
``mapInPandas`` stages. The sandbox has no image/audio libraries, so
the actual codec call is STUBBED — ``decode_media`` raises
NotImplementedError unless a real decoder is injected, and
``extract_features`` ships a deterministic fake featureizer — but all
Spark-side plumbing (schema, batch shape, partition behavior, UDF
signatures) is real and tested. On a cluster, swap ``_FAKE_DECODER``
for Pillow/ffmpeg via the same seam nidaba uses for OCR engines
(reference: nidaba/plugins/__init__.py setup() hooks; SURVEY.md §2A
A24).
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FEATURES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha", T.StringType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def decode_media(payload: bytes, fmt: str):  # pragma: no cover - stub
    """Real codec entry point — intentionally unimplemented in the
    sandbox (no Pillow/ffmpeg). Inject a decoder into
    ``extract_features(decoder=...)`` on a real cluster."""
    raise NotImplementedError(
        "media decoding requires an image/audio library not present in this environment"
    )


def _fake_decoder(payload: bytes, fmt: str) -> list[float]:
    """Deterministic stand-in featureizer: 8 floats from the sha256 of
    the payload. Exercises the full Arrow round-trip with a stable
    output so tests can assert exact values."""
    h = hashlib.sha256(payload or b"").digest()
    return [round(b / 255.0, 6) for b in h[:8]]


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes, str], list[float]] | None = None,
    batch_feature_dim: int = 8,
) -> DataFrame:
    """media(media_id, payload, meta) → FEATURES via mapInPandas.

    The decoder runs per payload inside an Arrow batch; payload bytes
    cross the JVM→Python boundary once, batch-granular.
    """
    fn = decoder or _fake_decoder

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n_bytes, shas, feats = [], [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                raw = bytes(payload) if payload is not None else b""
                fmt = (meta or {}).get("format", "") if isinstance(meta, dict) else ""
                n_bytes.append(len(raw))
                shas.append(hashlib.sha256(raw).hexdigest())
                feats.append(fn(raw, fmt))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": pd.Series(n_bytes, dtype="int64"),
                    "sha": shas,
                    "features": feats,
                }
            )

    return media.mapInPandas(batches, schema=FEATURES)


RESIZED = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

FRAMES = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.LongType()),
        T.StructField("frame", T.BinaryType()),
        T.StructField("n_bytes", T.IntegerType()),
    ]
)


def _fake_resize(payload: bytes, fmt: str, width: int, height: int) -> bytes:
    """Deterministic stand-in resizer: proportional byte subsampling to
    width*height/64 bytes (stride sampling keeps it order-stable). On a
    cluster, inject Pillow's Image.resize through the same seam."""
    target = max(1, (width * height) // 64)
    if not payload:
        return b""
    if len(payload) <= target:
        return bytes(payload)
    stride = len(payload) / target
    return bytes(payload[int(i * stride)] for i in range(target))


def resize_media(
    media: DataFrame,
    width: int = 64,
    height: int = 64,
    resizer: Callable[[bytes, str, int, int], bytes] | None = None,
) -> DataFrame:
    """media → media with payload resized and meta dims updated, via one
    Arrow-batched mapInPandas pass (1→1; binary in, binary out). The
    codec is the injectable seam — the default is the deterministic
    fake, mirroring extract_features/decode_media."""
    fn = resizer or _fake_resize

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads, metas = [], []
            for payload, meta in zip(pdf["payload"], pdf["meta"]):
                raw = bytes(payload) if payload is not None else b""
                fmt = (meta or {}).get("format", "") if isinstance(meta, dict) else ""
                payloads.append(fn(raw, fmt, width, height))
                m = dict(meta) if isinstance(meta, dict) else {}
                m["width"], m["height"] = width, height
                metas.append(m)
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "payload": payloads, "meta": metas}
            )

    return media.mapInPandas(batches, schema=RESIZED)


def sample_frames(
    media: DataFrame,
    every_ms: int = 1000,
    frame_bytes: int = 32,
    max_frames: int = 16,
) -> DataFrame:
    """Video frame sampling as a 1→N mapInPandas stage: one output row
    per sampled frame with (frame_idx, ts_ms, frame bytes). The fake
    "decoder" slices the payload deterministically per frame — the
    Spark-side contract (1→N fanout inside the Arrow batch, typed
    binary frames, stable ordering) is the real deliverable; swap an
    ffmpeg-backed extractor through the same seam on a cluster.
    Frame count = min(duration_ms // every_ms + 1, max_frames,
    frames that fit in the payload)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, tss, frames, sizes = [], [], [], [], []
            for mid, payload, meta in zip(pdf["media_id"], pdf["payload"], pdf["meta"]):
                raw = bytes(payload) if payload is not None else b""
                dur = int((meta or {}).get("duration_ms") or 0) if isinstance(meta, dict) else 0
                n = min(dur // every_ms + 1, max_frames, max(len(raw) // frame_bytes, 1))
                for k in range(n):
                    frame = raw[k * frame_bytes : (k + 1) * frame_bytes]
                    ids.append(mid)
                    idxs.append(k)
                    tss.append(k * every_ms)
                    frames.append(frame)
                    sizes.append(len(frame))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "ts_ms": pd.Series(tss, dtype="int64"),
                    "frame": frames,
                    "n_bytes": pd.Series(sizes, dtype="int32"),
                }
            )

    return media.mapInPandas(batches, schema=FRAMES)


def synthesize_media(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic media table from a text corpus (no external data):
    payload = utf-8 bytes of the text, metadata derived from lengths.
    Gives the multimodal plumbing a real binary column to chew on."""
    return docs.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("fake/raw").alias("format"),
            (F.length(text_col) % 1919 + 1).cast("int").alias("width"),
            (F.length(text_col) % 1079 + 1).cast("int").alias("height"),
            F.lit(0).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )

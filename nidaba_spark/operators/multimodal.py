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
            (F.length(text_col) % 1920).cast("int").alias("width"),
            (F.length(text_col) % 1080).cast("int").alias("height"),
            F.lit(0).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )

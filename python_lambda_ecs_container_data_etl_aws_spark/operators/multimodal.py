"""Multimodal column plumbing: image/audio/video as opaque BINARY
payloads with typed metadata, processed via Arrow-batched mapInPandas.

The container has no codec libraries (PIL/librosa/av), so the actual
decode is STUBBED: :func:`decode_image` raises NotImplementedError
unless PIL is importable, and :func:`extract_features` uses a
deterministic fake decoder (metadata derived from the payload bytes)
so the Spark-side contract — schema, batch shape, partitioning — is
real and tested end-to-end. Swapping in a real codec touches ONE
function, not the pipeline.

Scale posture: payloads stay in executors (mapInPandas streams Arrow
batches; nothing collects to the driver); feature extraction is
embarrassingly parallel over partitions; output carries only features
+ metadata, not the payload, so downstream shuffles stay small.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

try:  # pragma: no cover - codec libs absent in this container
    from PIL import Image  # type: ignore

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False

MULTIMODAL_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("modality", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", MapType(StringType(), StringType())),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("item_id", LongType()),
        StructField("modality", StringType()),
        StructField("size_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("checksum64", LongType()),
    ]
)


def documents_as_multimodal(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into a multimodal-shaped table (text
    payloads standing in for encoded media)."""
    return docs.select(
        F.col("doc_id").alias("item_id"),
        F.lit("image").alias("modality"),
        F.encode("text", "UTF-8").alias("payload"),
        F.create_map(
            F.lit("source"), F.col("source"), F.lit("lang"), F.col("lang")
        ).alias("meta"),
    )


def decode_image(payload: bytes):
    """Real decode — requires a codec library absent from this container."""
    if not _HAS_PIL:
        raise NotImplementedError(
            "image decode requires PIL; this environment stubs it — "
            "extract_features uses the deterministic fake decoder instead"
        )
    import io

    return Image.open(io.BytesIO(payload))  # pragma: no cover


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for a codec: derives (width, height,
    checksum) purely from the bytes. Replace with decode_image(...)
    when codecs exist.

    The checksum is md5-derived (first 15 hex chars as a 60-bit int) —
    deliberately md5, not FNV: md5 exists in every SQL engine, so the
    whole mapInPandas feature pipeline carries a DuckDB oracle twin
    (q28) instead of a weaker rows-only check."""
    import hashlib

    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return int(64 + h % 960), int(64 + (h >> 10) % 960), int(h)


def extract_features(mm: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: payload → (size, width, height,
    checksum). Arrow batches in, Arrow batches out; no driver collect.

    The worker function is a fully self-contained closure — it must NOT
    reference module-level names: executors unpickle it by value, and
    this package is not necessarily importable on worker Python paths
    (it isn't when the driving process runs from another cwd).
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        def fake_decode(payload: bytes) -> tuple[int, int, int]:
            # md5-derived 60-bit checksum (same as _fake_decode)
            h = int(hashlib.md5(payload).hexdigest()[:15], 16)
            return int(64 + h % 960), int(64 + (h >> 10) % 960), int(h)

        for pdf in batches:
            decoded = [fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "item_id": pdf["item_id"].astype("int64"),
                    "modality": pdf["modality"],
                    "size_bytes": [len(p) for p in pdf["payload"]],
                    "width": [d[0] for d in decoded],
                    "height": [d[1] for d in decoded],
                    "checksum64": [d[2] for d in decoded],
                }
            )

    return mm.mapInPandas(fn, FEATURE_SCHEMA)


def frame_sample_plan(mm: DataFrame, every_n: int = 10) -> DataFrame:
    """Video-frame-sampling plumbing: explode a (stubbed) frame index
    per payload — the Spark-side shape of frame extraction (real frame
    decode would replace the sequence with codec output)."""
    n_frames = (F.octet_length("payload") % 100 + 1).alias("n_frames")
    return (
        mm.select("item_id", "payload", n_frames)
        .select(
            "item_id",
            F.explode(F.expr(f"sequence(0, n_frames - 1, {every_n})")).alias("frame_idx"),
        )
    )

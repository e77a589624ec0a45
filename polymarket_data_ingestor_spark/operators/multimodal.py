"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are carried as ``binary`` columns with a metadata struct
(media_type, n_bytes, digest). The Spark-side machinery — schema, Arrow
batch shape, ``mapInPandas`` signature, partition sizing — is real and
tested; the actual media decode is STUBBED (this environment has no image/
audio libraries): ``decode_features`` computes a deterministic fake feature
vector from the payload bytes, and :func:`decode_image` raises
``NotImplementedError`` to mark the integration point for a real decoder
(PIL/torchvision/ffmpeg) on a production cluster.

Scale notes: payload columns dominate row size, so feature extraction uses
``mapInPandas`` (streaming Arrow batches — bounded memory per task, no
per-group collect) and the batch size is governed by
``spark.sql.execution.arrow.maxRecordsPerBatch``. Select away the payload
column as early as possible after extraction; Parquet stores it in its own
column chunk so reads that don't need bytes never touch them.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Callable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_DIM = 8

#: n_bytes/digest/features are nullable: a NULL payload (attach_payload
#: of NULL text, or a lake row with missing media) flows through as a
#: NULL-feature row instead of crashing the kernel — the batch
#: absence-propagates convention (callers exploding ``features`` drop
#: the row, like every other feature stream).
MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), False),
        StructField("media_type", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Synthesize an opaque binary payload column + typed metadata.

    Stands in for reading real media bytes; production replaces this with
    ``spark.read.format('binaryFile')`` or a payload column in the lakehouse
    table. Everything downstream treats ``payload`` as opaque.
    """
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("media_type"),
            F.length(payload).alias("n_bytes"),
            F.md5(payload).alias("digest"),
        ).alias("media_meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real media decode — integration point, intentionally unimplemented.

    On a production cluster: ``PIL.Image.open(io.BytesIO(payload))`` etc.
    This container ships no media libraries, so the plumbing is exercised
    with :func:`_fake_features` instead.
    """
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in this "
        "environment; use extract_features(..., featurizer=...) with a real "
        "decoder on a production cluster"
    )


def _fake_features(payload: bytes, dim: int = FEATURE_DIM) -> list[float]:
    """Deterministic stand-in featurizer: byte-sum folds per stride.

    Reproducible in SQL (see catalog oracle) so the full mapInPandas path is
    correctness-gated despite the stubbed decode.
    """
    if not payload:
        return [0.0] * dim
    out = [0] * dim
    for i, b in enumerate(payload):
        out[i % dim] += b
    return [float(v % 997) for v in out]


def extract_features(
    media: DataFrame,
    featurizer: Callable[[bytes], list[float]] | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Feature extraction over payloads via mapInPandas (Arrow-batched).

    ``featurizer`` maps payload bytes → fixed-dim feature list; defaults to
    the deterministic fake. The UDF signature (iterator of pandas
    DataFrames) streams batches — constant memory regardless of partition
    size, the required shape for 100 MB+ media payloads.

    NULL payloads pass through as NULL-feature rows (the featurizer is
    never called on a missing payload): :func:`resize_media` and
    :func:`attach_payload` both emit NULL payloads for missing inputs,
    and the old ``bytes(None)`` / ``int(None)`` crashed the composition
    with an opaque mid-kernel TypeError (review finding, reproduced).
    Callers exploding ``features`` drop the row — the batch
    absence-propagates convention.
    """
    fz = featurizer or _fake_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "media_type": [m["media_type"] for m in pdf["media_meta"]],
                    "n_bytes": [
                        None if m["n_bytes"] is None else int(m["n_bytes"])
                        for m in pdf["media_meta"]
                    ],
                    "digest": [m["digest"] for m in pdf["media_meta"]],
                    "features": [
                        None if p is None else fz(bytes(p))
                        for p in pdf["payload"]
                    ],
                }
            )

    return media.mapInPandas(run, schema=MEDIA_FEATURE_SCHEMA)


def resize_media(
    media: DataFrame,
    stride: int = 4,
    id_col: str = "doc_id",
) -> DataFrame:
    """'Resize' stub: deterministic byte-stride downsample, payload →
    payload (the brief's image-resize slot; a real decoder replaces the
    stride with ``PIL.Image.resize`` / ffmpeg scale on a production
    cluster).

    Keeps the media schema — ``(id, payload, media_meta)`` with the
    metadata recomputed for the RESIZED bytes — so it composes with
    :func:`extract_features` / :func:`frame_sample` downstream exactly
    like a real thumbnail pass would (resize-then-featurize is the
    production pipeline shape). NULL payloads pass through as NULL with
    NULL size/digest (never silently dropped). Same scale shape as
    extraction: ``mapInPandas`` streams Arrow batches at constant
    memory; the output payload is ~1/stride of the input, so run this
    BEFORE any shuffle that would otherwise move full-size media.

    The stride downsample is reproducible in SQL over an ASCII corpus
    (every-k-th-char + md5 — see the catalog entry's documented
    oracle), so the full Arrow path is value-checkable despite the
    stubbed decode.
    """
    from hashlib import md5 as _md5

    if stride < 1:
        raise ValueError(f"resize_media: stride must be >= 1, got {stride}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads, metas = [], []
            for p, m in zip(pdf["payload"], pdf["media_meta"]):
                if p is None:
                    payloads.append(None)
                    metas.append(
                        {"media_type": m["media_type"], "n_bytes": None,
                         "digest": None}
                    )
                    continue
                r = bytes(p)[::stride]
                payloads.append(r)
                metas.append(
                    {"media_type": m["media_type"], "n_bytes": len(r),
                     "digest": _md5(r).hexdigest()}
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "payload": payloads,
                 "media_meta": metas}
            )

    return media.mapInPandas(run, schema=media.schema)


def frame_sample(
    media: DataFrame, every_n_bytes: int = 64, id_col: str = "doc_id"
) -> DataFrame:
    """'Frame sampling' stub: emit one row per byte-stride of the payload.

    Models video frame extraction's 1→N row shape (posexplode over a
    computed index) with deterministic sampled offsets; a real decoder
    replaces the stride arithmetic with frame timestamps.

    Empty and NULL payloads emit frame 0 at offset 0 (both engines'
    ``greatest`` ignores the NULL, oracle-pinned). ``every_n_bytes``
    must be >= 1: zero was a mid-job ANSI DIVIDE_BY_ZERO and a negative
    stride inverts the sequence bound — refuse at plan time (the
    length_bucket_batches convention).
    """
    if every_n_bytes < 1:
        raise ValueError(
            f"frame_sample: every_n_bytes must be >= 1, got "
            f"{every_n_bytes}"
        )
    n = F.col("media_meta.n_bytes")
    idx = F.sequence(
        F.lit(0), F.greatest((n - 1) / every_n_bytes, F.lit(0)).cast("long")
    )
    return media.select(
        F.col(id_col),
        F.posexplode(idx).alias("frame_no", "_i"),
    ).select(
        id_col,
        F.col("frame_no").cast("long").alias("frame_no"),
        (F.col("frame_no").cast("long") * every_n_bytes).alias("byte_offset"),
    )

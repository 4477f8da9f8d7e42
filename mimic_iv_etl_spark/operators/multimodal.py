"""Multimodal column plumbing: image/audio/video as opaque ``binary`` columns
with typed metadata, processed batch-at-a-time via ``mapInPandas``.

The Spark-side contract is fully real — schemas, Arrow batch shapes,
partition sizing. The decode step is pluggable: ``decode_media`` takes any
``bytes → list[float]`` callable. Two ship in-repo: the deterministic
:func:`fake_decoder` (plumbing tests, opaque bytes) and the REAL pure-stdlib
PNG/BMP codec :func:`mimic_iv_etl_spark.operators.imagecodec.image_decoder`
(actual pixel decode + feature extraction — zlib inflate, scanline
un-filtering, gradient statistics). Audio/video codecs remain honestly
absent (no libraries in this runtime): ``decoder=None`` raises
``NotImplementedError`` naming the alternatives.

Scale notes: media rows are wide (MBs); the helpers here repartition by an
explicit target-rows-per-partition so one Arrow batch never exceeds executor
memory, and metadata extraction prunes the binary column out of the scan when
only metadata is needed (column pruning does the rest).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, content_hash string, "
    "feature array<float>"
)


def fake_decoder(content: bytes) -> list[float]:
    """Deterministic stand-in for a real image/audio decoder: derives an
    8-dim 'feature' from byte statistics. Stable across runs/machines."""
    if content is None:
        return [0.0] * 8
    n = len(content)
    return [
        float(n % 251),
        float(sum(content[:64]) % 997),
        float(content[0]) if n else 0.0,
        float(content[-1]) if n else 0.0,
        float(n),
        float(min(content[:32], default=0)),
        float(max(content[:32], default=0)),
        float((n * 2654435761) % 1009),
    ]


def decode_media(
    df: DataFrame,
    decoder: Callable[[bytes], list[float]] | None = None,
    rows_per_batch: int = 256,
) -> DataFrame:
    """Decode/feature-extract media rows via ``mapInPandas``.

    ``decoder`` maps raw bytes → fixed-width feature vector. ``None`` raises
    ``NotImplementedError`` at plan time — pass
    ``imagecodec.image_decoder`` (real PNG/BMP pixel decode),
    :func:`fake_decoder` (opaque-byte plumbing tests), or any production
    codec callable. ``rows_per_batch`` bounds Arrow batch width for fat
    binary rows.
    """
    if decoder is None:
        raise NotImplementedError(
            "no default media codec — pass decoder=imagecodec.image_decoder "
            "(PNG/BMP), fake_decoder, or a production codec callable"
        )

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            for start in range(0, len(pdf), rows_per_batch):
                chunk = pdf.iloc[start : start + rows_per_batch]
                content = chunk["content"]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"],
                        "kind": chunk["kind"],
                        "n_bytes": content.map(lambda b: 0 if b is None else len(b)),
                        "content_hash": content.map(
                            lambda b: hashlib.md5(b or b"").hexdigest()
                        ),
                        "feature": content.map(decoder),
                    }
                )

    return df.mapInPandas(_run, schema=FEATURE_SCHEMA)


def media_metadata(df: DataFrame) -> DataFrame:
    """Metadata-only projection: never touches the binary column, so the
    parquet scan prunes it (check ReadSchema in .explain)."""
    return df.select(
        "media_id", "kind", "mime", "width", "height", "duration_ms"
    ).withColumn(
        "aspect_ratio",
        F.when(
            F.col("height").isNotNull() & (F.col("height") > 0),
            F.round(F.col("width") / F.col("height"), 4),
        ),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes per-row frame timestamps to
    extract (the decode itself is the stubbed codec). Shows the explode
    pattern: one row per (media_id, frame_ts)."""
    return (
        df.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0).cast("long"),
                    F.coalesce(F.col("duration_ms"), F.lit(0)),
                    F.lit(every_ms).cast("long"),
                )
            ).alias("frame_ts_ms"),
        )
    )


def _media_rows(n: int, seed: int) -> list[tuple]:
    """Deterministic fake media rows (seeded bytes) shared by the in-memory
    and parquet fixtures so both always hold identical content."""
    import random

    rng = random.Random(seed)
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        size = 100 + (i * 37) % 900
        content = bytes(rng.randrange(256) for _ in range(size))
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 + i % 512 if kind == "image" else None,
                48 + i % 256 if kind == "image" else None,
                1000 + i * 250 if kind != "image" else None,
                content,
            )
        )
    return rows


def synthesize_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table (binary from seeded bytes) — the test
    substrate for the plumbing above."""
    return spark.createDataFrame(_media_rows(n, seed), MEDIA_SCHEMA)


def write_media_parquet(path: str, n: int = 64, seed: int = 42) -> str:
    """Write the fake media table as one parquet file (pyarrow, no Spark) so
    an independent SQL engine can read the same bytes — the substrate for the
    correctness-gate oracle of the decode pipeline. Idempotent per path."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    if os.path.exists(path):
        return path
    rows = _media_rows(n, seed)
    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "media_id": pa.array(cols[0], pa.int64()),
            "kind": pa.array(cols[1]),
            "mime": pa.array(cols[2]),
            "width": pa.array(cols[3], pa.int32()),
            "height": pa.array(cols[4], pa.int32()),
            "duration_ms": pa.array(cols[5], pa.int64()),
            "content": pa.array(cols[6], pa.binary()),
        }
    )
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + ".tmp"
    pq.write_table(tbl, tmp)
    os.replace(tmp, path)
    return path

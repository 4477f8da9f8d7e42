"""Event-time windowed aggregation + sessionization over the change stream.

Works identically on a batch DataFrame (tests, backfill) and a streaming
DataFrame (`readStream`): the plan is the same; on a stream add
``withWatermark`` first (callers pass ``watermark=``) so state is bounded and
late events beyond the watermark are dropped — the batch CDC path instead
resolves lateness via LWW stamps (apply.py), which is lossless; these views
are the approximate real-time complement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_activity_counts(
    df: DataFrame,
    ts_col: str = "ts",
    window: str = "5 minutes",
    slide: str | None = None,
    group_col: str = "role",
    watermark: str | None = None,
) -> DataFrame:
    """Tumbling/sliding event-time counts per ``group_col``.

    Output: window_start, window_end, <group_col>, events.
    """
    if watermark is not None:
        # watermarks require TIMESTAMP (with zone); session TZ is pinned UTC,
        # so the NTZ→TZ cast is instant-preserving
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    win = F.window(F.col(ts_col), window, slide) if slide else F.window(F.col(ts_col), window)
    return (
        df.groupBy(win.alias("w"), F.col(group_col))
        .agg(F.count("*").alias("events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            group_col,
            "events",
        )
    )


def sessionize(
    df: DataFrame,
    key_col: str = "conv_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark: str | None = None,
) -> DataFrame:
    """Session windows per key with inactivity ``gap`` (Spark's native
    ``session_window`` — state-store-backed on streams, plain agg on batch).

    Output: <key_col>, session_start, session_end, events.
    """
    if watermark is not None:
        df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
        df = df.withWatermark(ts_col, watermark)
    return (
        df.groupBy(F.session_window(F.col(ts_col), gap).alias("s"), F.col(key_col))
        .agg(F.count("*").alias("events"))
        .select(
            key_col,
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            "events",
        )
    )

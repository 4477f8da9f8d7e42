"""Per-batch lineage + throughput metrics sidecars.

The reference's lineage story is a hand-rolled driver-side JSON mutation log
(``ml_utils.py:529-544`` ``log_changes``). The engine keeps that spirit but
makes it queryable: one lineage row per (batch × source partition) with the
applied offset range, and one metrics row per batch with events/sec — both as
JSONL sidecars under the table path, readable back as DataFrames.

Durability note: sidecars are appended AFTER the snapshot commit, so they are
best-effort observability — a crash in between loses the sidecar rows but
never exactly-once correctness, whose single source of truth is the
``applied_offsets`` map inside the committed snapshot summary.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("min_offset", T.LongType(), False),
        T.StructField("max_offset", T.LongType(), False),
        T.StructField("events", T.LongType(), False),
        T.StructField("snapshot_version", T.LongType(), True),
    ]
)

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("batch_id", T.LongType(), False),
        T.StructField("events_in", T.LongType(), False),
        T.StructField("events_applied", T.LongType(), False),
        T.StructField("winners", T.LongType(), False),
        T.StructField("seconds", T.DoubleType(), False),
        T.StructField("events_per_sec", T.DoubleType(), False),
        T.StructField("touched_buckets", T.IntegerType(), False),
        T.StructField("skipped", T.BooleanType(), False),
        T.StructField("snapshot_version", T.LongType(), True),
        T.StructField("lag_events", T.LongType(), True),
    ]
)


def _append_jsonl(path: str, rows: list[dict]) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "a") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def append_lineage(table_path: str, rows: list[dict]) -> None:
    _append_jsonl(os.path.join(table_path, "_lineage", "lineage.jsonl"), rows)


def append_metrics(table_path: str, row: dict) -> None:
    _append_jsonl(os.path.join(table_path, "_metrics", "metrics.jsonl"), [row])


def read_lineage(spark: SparkSession, table_path: str) -> DataFrame:
    return spark.read.schema(LINEAGE_SCHEMA).json(
        os.path.join(table_path, "_lineage", "lineage.jsonl")
    )


def read_metrics(spark: SparkSession, table_path: str) -> DataFrame:
    return spark.read.schema(METRICS_SCHEMA).json(
        os.path.join(table_path, "_metrics", "metrics.jsonl")
    )

"""Streaming operators over the change stream (reference gap: SURVEY.md §2.9
— the reference has no streaming surface at all; these are the engine-native
event-time operators the north star mandates alongside foreachBatch MERGE)."""

from mimic_iv_etl_spark.streaming.windowed import (
    sessionize,
    windowed_activity_counts,
)

__all__ = ["windowed_activity_counts", "sessionize"]

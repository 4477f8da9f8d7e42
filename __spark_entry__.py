"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship flow: a full CDC change-log replay through
the engine (LWW dedup → exactly-once delta commits → schema evolution) and
returns the final transcript table state at sf0.001 scale.

``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data operator suite; pairs are defined once in
``mimic_iv_etl_spark.registry`` so Spark code and oracle SQL cannot drift.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mimic_iv_etl_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: full CDC replay → final state."""
    return registry.q_cdc_replay(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()

"""Templated-analytics facade — parity with ``mimicfouretl/analysis_utils.py``
(same function names/parameters, same output column names), with the SQL
f-string templates replaced by typed DataFrame transforms.

Dialect/defect fixes baked in (SURVEY.md §2.12): no BigQuery-only ``QUALIFY``
(the reference's co-occurrence functions fail in its own local mode), no
hardcoded project table (``analysis_utils.py:248``), no SQL injection via
parameter interpolation. ``dataset`` parameters name registered views/tables
(``spark.table``), matching the reference's temp-view model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic_iv_etl_spark.operators import relational


def get_item_frequency(spark: SparkSession, column_name: str, dataset: str,
                       item_id=None, limit: int | None = None) -> DataFrame:
    """Parity: ``analysis_utils.py:4-42`` — output ``({column_name}, count)``."""
    out = relational.item_frequency(spark.table(dataset), column_name,
                                    limit=limit, item=item_id)
    return out.withColumnRenamed("frequency", "count")


def get_outcomes_by_item(spark: SparkSession, item_id, item_column: str,
                         item_dataset: str, outcome_column: str,
                         outcome_dataset: str) -> DataFrame:
    """Parity: ``analysis_utils.py:45-75`` — two-key equi-join, output
    ``(subject_id, hadm_id, item_value, outcome_value)``."""
    a = spark.table(item_dataset).filter(F.col(item_column) == F.lit(item_id))
    b = spark.table(outcome_dataset)
    return (
        a.select("subject_id", "hadm_id", F.col(item_column).alias("item_value"))
        .join(b.select("subject_id", "hadm_id",
                       F.col(outcome_column).alias("outcome_value")),
              on=["subject_id", "hadm_id"])
    )


def get_abnormal_item_analysis(spark: SparkSession, item_id, item_column: str,
                               value_column: str, bounds: dict,
                               dataset: str) -> DataFrame:
    """Parity: ``analysis_utils.py:77-112`` — bounds dict {'lower','upper'}."""
    df = spark.table(dataset).filter(F.col(item_column) == F.lit(item_id))
    conds = []
    if "lower" in bounds:
        conds.append(F.col(value_column) < F.lit(bounds["lower"]))
    if "upper" in bounds:
        conds.append(F.col(value_column) > F.lit(bounds["upper"]))
    if not conds:
        raise ValueError("bounds must contain 'lower' and/or 'upper'")
    cond = conds[0]
    for c in conds[1:]:
        cond = cond | c
    return df.filter(cond).select("subject_id", "hadm_id", item_column, value_column)


def get_provider_activity_analysis(spark: SparkSession, provider_id,
                                   dataset_columns: dict) -> DataFrame:
    """Parity: ``analysis_utils.py:115-148`` — per-dataset activity counts,
    tagged + unioned; output ``(dataset, activity, count)``."""
    dfs, activity_cols = {}, {}
    for dataset, columns in dataset_columns.items():
        dfs[dataset] = spark.table(dataset).filter(
            F.col(columns["provider"]) == F.lit(provider_id)
        )
        activity_cols[dataset] = columns["activity"]
    out = relational.activity_union(dfs, activity_cols, alias="activity")
    return out.select("dataset", "activity", F.col("frequency").alias("count"))


def get_co_occurrence_analysis(spark: SparkSession, dataset: str,
                               primary_column: str, secondary_column: str,
                               threshold: float = 0.1) -> DataFrame:
    """Parity: ``analysis_utils.py:151-185`` — output
    ``(primary_event, secondary_event, frequency)`` where frequency is the
    ratio-to-primary-total (the reference's QUALIFY is a window+filter here,
    so this works on any backend)."""
    out = relational.cooccurrence_ratio(spark.table(dataset), primary_column,
                                        secondary_column, threshold)
    return out.select(
        F.col(primary_column).alias("primary_event"),
        F.col(secondary_column).alias("secondary_event"),
        F.col("ratio").alias("frequency"),
    )


def get_cross_dataset_co_occurrence(spark: SparkSession, dataset1: str,
                                    dataset2: str, primary_column: str,
                                    secondary_column: str,
                                    threshold: float = 0.1) -> DataFrame:
    """Parity: ``analysis_utils.py:187-227`` — join on (subject_id, hadm_id)
    then co-occurrence ratio across the combined relation."""
    combined = spark.table(dataset1).alias("a").join(
        spark.table(dataset2).alias("b"), on=["subject_id", "hadm_id"]
    ).select(F.col(f"a.{primary_column}").alias(primary_column),
             F.col(f"b.{secondary_column}").alias(secondary_column))
    out = relational.cooccurrence_ratio(combined, primary_column,
                                        secondary_column, threshold)
    return out.select(
        F.col(primary_column).alias("primary_event"),
        F.col(secondary_column).alias("secondary_event"),
        F.col("ratio").alias("frequency"),
    )


def calculate_event_to_death_interval(spark: SparkSession,
                                      event_date_column: str,
                                      event_dataset: str,
                                      patients_dataset: str = "patients") -> DataFrame:
    """Parity: ``analysis_utils.py:229-266`` — the hardcoded BigQuery project
    table becomes a ``patients_dataset`` parameter. Output
    ``(subject_id, hadm_id, event_date, date_of_death, days_to_death)``."""
    deaths = (
        spark.table(patients_dataset)
        .filter(F.col("dod").isNotNull())
        .select("subject_id", F.col("dod").alias("date_of_death"))
    )
    events = spark.table(event_dataset).select(
        "subject_id", "hadm_id", F.col(event_date_column).alias("event_date")
    )
    return events.join(deaths, on="subject_id").withColumn(
        "days_to_death",
        F.datediff(F.to_date("date_of_death"), F.to_date("event_date")),
    )


def calculate_event_to_event_interval(spark: SparkSession,
                                      event_params: dict) -> DataFrame:
    """Parity: ``analysis_utils.py:268-311`` — CTE pair join on
    (subject_id, hadm_id); adds ``interval_days`` (the reference leaves the
    subtraction to the caller)."""
    fe, se = event_params["first_event"], event_params["second_event"]
    first = (
        spark.table(fe["dataset"])
        .filter(F.col("event_type") == fe["event_type"])
        .select("subject_id", "hadm_id",
                F.col(fe["time_column"]).alias("first_event_time"))
    )
    second = (
        spark.table(se["dataset"])
        .filter(F.col("event_type") == se["event_type"])
        .select("subject_id", "hadm_id",
                F.col(se["time_column"]).alias("second_event_time"))
    )
    return first.join(second, on=["subject_id", "hadm_id"]).withColumn(
        "interval_days",
        F.datediff(F.to_date("second_event_time"), F.to_date("first_event_time")),
    )


def search_dataset_by_value(spark: SparkSession, dataset: str,
                            column_name: str, search_value: str,
                            columns="*", closeness: str = "exact") -> DataFrame:
    """Parity: ``analysis_utils.py:313-359`` — case-insensitive
    exact/contains/starts_with/ends_with search."""
    df = relational.string_match(spark.table(dataset), column_name,
                                 search_value, mode=closeness)
    if columns != "*":
        df = df.select(*columns)
    return df

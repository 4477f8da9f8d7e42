"""FeatureEngineering facade — parity with
``mimicfouretl/feature_engineering.py`` (same method names, parameters, and
output column names), Spark-first internals.

Systematic change: every reference method that aggregates per subject and
left-joins the aggregate back onto the rows (``feature_engineering.py:34,57,
151,250`` — SURVEY.md J6) is a window function here: one shuffle instead of
two, no self-join. Defect fixes (SURVEY.md §2.12): the reference's missing
imports (``mean/stddev/percentile_approx/avg``) made several methods a latent
NameError; ``measure_event_duration``'s join-back multiplied rows in the
non-aggregated path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


class FeatureEngineering:
    """Fluent feature builder over a DataFrame (``feature_engineering.py:6-9``)."""

    def __init__(self, data: DataFrame, subject_column: str = "subject_id"):
        self.data = data
        self.subject_column = subject_column

    # -- counts / flags (reference :11-57) ------------------------------

    def count_events(self, event_column: str, specific_value=None) -> None:
        """Adds ``{event_column}_count`` per subject (reference :11-34)."""
        w = Window.partitionBy(self.subject_column)
        if specific_value is not None:
            cnt = F.sum(
                F.when(F.col(event_column) == specific_value, 1).otherwise(0)
            ).over(w)
        else:
            cnt = F.count(F.lit(1)).over(w)
        self.data = self.data.withColumn(f"{event_column}_count", cnt)

    def flag_events(self, event_column: str, specific_value=None) -> None:
        """Adds 0/1 ``{event_column}_flag`` per subject (reference :37-57)."""
        w = Window.partitionBy(self.subject_column)
        cond = (
            F.col(event_column) == specific_value
            if specific_value is not None
            else F.col(event_column).isNotNull()
        )
        flag = F.max(F.when(cond, 1).otherwise(0)).over(w)
        self.data = self.data.withColumn(f"{event_column}_flag", flag)

    # -- windows (reference :60-123) -------------------------------------

    def count_previous_events(self, partition_column: str, order_column: str,
                              event_column: str, event_name=None) -> None:
        """Adds ``previous_{event_column}[_{event_name}]`` (reference :60-88)."""
        w = Window.partitionBy(partition_column).orderBy(order_column)
        cnt = F.count(F.col(event_column)).over(w) - 1
        if event_name:
            self.data = self.data.withColumn(
                f"previous_{event_column}_{event_name}", cnt
            ).filter(F.col(event_column) == event_name)
        else:
            self.data = self.data.withColumn(f"previous_{event_column}", cnt)

    def check_event_within_timeframe(self, partition_column: str,
                                     event_column: str, event_value=None,
                                     timeframe: int = 30) -> None:
        """Adds ``next_{c}_date``, ``days_to_next_{c}``,
        ``{c}_within_{t}_days`` (reference :91-123)."""
        w = Window.partitionBy(partition_column).orderBy(F.col(event_column))
        if f"next_{event_column}_date" not in self.data.columns:
            self.data = self.data.withColumn(
                f"next_{event_column}_date", F.lead(F.col(event_column), 1).over(w)
            )
        if f"days_to_next_{event_column}" not in self.data.columns:
            self.data = self.data.withColumn(
                f"days_to_next_{event_column}",
                F.datediff(F.col(f"next_{event_column}_date"), F.col(event_column)),
            )
        days = F.col(f"days_to_next_{event_column}")
        cond = (
            days.isNotNull() & (days > 0) & (days <= timeframe)
            & F.col(f"next_{event_column}_date").isNotNull()
        )
        if event_value is not None:
            cond = (F.col(event_column) == event_value) & cond
        self.data = self.data.withColumn(
            f"{event_column}_within_{timeframe}_days",
            F.when(cond, 1).otherwise(0),
        )

    # -- statistics / scores (reference :126-217) ------------------------

    def encode_categorical(self, categorical_columns) -> None:
        """Reference :126-129 is an empty ``pass``; here: deterministic
        dictionary encoding via a per-column dense_rank over distinct values
        (adds ``{col}_encoded``)."""
        for c in categorical_columns:
            w = Window.orderBy(F.col(c))
            mapping = (
                self.data.select(c).distinct()
                .withColumn(f"{c}_encoded", F.dense_rank().over(w) - 1)
            )
            self.data = self.data.join(F.broadcast(mapping), on=c, how="left")

    def calculate_statistics(self, numeric_column: str,
                             statistics=("mean", "stddev", "percentile")) -> None:
        """Adds ``{col}_mean/_stddev/_median`` per subject (reference
        :131-151, whose aggregate functions were never imported)."""
        w = Window.partitionBy(self.subject_column)
        if "mean" in statistics:
            self.data = self.data.withColumn(
                f"{numeric_column}_mean", F.mean(numeric_column).over(w))
        if "stddev" in statistics:
            self.data = self.data.withColumn(
                f"{numeric_column}_stddev", F.stddev(numeric_column).over(w))
        if "percentile" in statistics:
            self.data = self.data.withColumn(
                f"{numeric_column}_median",
                F.percentile_approx(numeric_column, 0.5).over(w))

    def create_conditional_feature(self, condition_str: str,
                                   new_feature_name: str) -> None:
        """Reference :154-164."""
        from mimic_iv_etl_spark.operators.labeling import conditional_feature

        self.data = conditional_feature(self.data, condition_str, new_feature_name)

    def create_composite_index_score(self, scoring_rules: dict,
                                     adjustment_factors: dict | None = None) -> None:
        """Reference :167-190; adds ``{col}_score`` columns + ``composite_score``."""
        for column, fn in scoring_rules.items():
            self.data = self.data.withColumn(f"{column}_score", fn(F.col(column)))
        score_cols = [F.col(f"{c}_score") for c in scoring_rules]
        self.data = self.data.withColumn("composite_score", sum(score_cols))
        if adjustment_factors:
            for column, fn in adjustment_factors.items():
                self.data = self.data.withColumn(
                    "composite_score", fn(F.col("composite_score"), F.col(column))
                )

    def apply_clinical_prediction_rule(self, rule_config: dict) -> None:
        """Reference :193-217; adds ``{rule_name}_score`` per configured rule."""
        for rule_name, criteria in rule_config.items():
            terms = []
            for variable, scoring in criteria.items():
                for condition, points in scoring.items():
                    terms.append(
                        F.when(F.expr(f"{variable} {condition}"), points).otherwise(0)
                    )
            self.data = self.data.withColumn(f"{rule_name}_score", sum(terms))

    def measure_event_duration(self, start_event_column: str,
                               end_event_column: str,
                               subject_column: str = "subject_id",
                               most_recent: bool = False,
                               aggregate_method: str | None = None,
                               percentile_value: float | None = None) -> None:
        """Adds ``event_duration`` seconds (reference :220-250). The
        most-recent filter is a single max_by window instead of the
        reference's max-aggregate + join + equality filter (ties-unsafe);
        the non-aggregated path is a plain withColumn (the reference's
        join-back multiplied rows)."""
        dur = (
            F.col(end_event_column).cast("timestamp").cast("long")
            - F.col(start_event_column).cast("timestamp").cast("long")
        )
        if aggregate_method:
            base = self.data.withColumn("event_duration", dur)
            if most_recent:
                w = Window.partitionBy(subject_column).orderBy(
                    F.col(start_event_column).desc())
                base = base.withColumn("_rn", F.row_number().over(w)).filter(
                    F.col("_rn") == 1).drop("_rn")
            if aggregate_method == "mean":
                agg = base.groupBy(subject_column).agg(
                    F.avg("event_duration").alias("event_duration"))
            elif aggregate_method == "percentile" and percentile_value is not None:
                agg = base.groupBy(subject_column).agg(
                    F.percentile_approx("event_duration", percentile_value)
                    .alias("event_duration"))
            else:
                raise ValueError(f"unknown aggregate_method: {aggregate_method}")
            self.data = self.data.join(agg, on=subject_column, how="left")
        else:
            w = Window.partitionBy(subject_column).orderBy(
                F.col(start_event_column).desc())
            if most_recent:
                self.data = self.data.withColumn(
                    "event_duration",
                    F.when(F.row_number().over(w) == 1, dur),
                )
            else:
                self.data = self.data.withColumn("event_duration", dur)

    def get_processed_data(self) -> DataFrame:
        """Reference :253-255."""
        return self.data


def left_merge_dataframes(left_df: DataFrame, right_df: DataFrame,
                          join_cols: list) -> DataFrame:
    """Reference :258-284 — Spark dedups ``on=list`` key columns natively;
    the rename-suffix-drop dance is unnecessary."""
    from mimic_iv_etl_spark.operators.relational import left_merge

    return left_merge(left_df, right_df, join_cols)

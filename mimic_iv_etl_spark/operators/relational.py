"""Relational analytics operators — parity with the reference's templated SQL
library (``analysis_utils.py``) and aggregate-back feature ops
(``feature_engineering.py``), re-expressed as Catalyst-friendly DataFrame
transforms.

Key Spark-first change: every "aggregate then join back to rows" op in the
reference (``feature_engineering.py:34,57,151,250`` — J6 in SURVEY.md §2.3)
is a window function here, removing the self-join and its second shuffle;
every driver-side collected key list re-serialized into SQL ``IN (...)``
(``ml_readmission_risk.ipynb`` cells 14/21/31) is a semi-join.
Parameters are typed values composed as Column expressions — never
interpolated into SQL strings (the reference's injection-prone f-strings,
``analysis_utils.py:34-39``).
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def item_frequency(df: DataFrame, column: str, limit: int | None = None,
                   item=None) -> DataFrame:
    """Frequency of values in ``column`` (A1; ``analysis_utils.py:34-39``)."""
    out = df
    if item is not None:
        out = out.filter(F.col(column) == F.lit(item))
    out = out.groupBy(column).agg(F.count("*").alias("frequency"))
    if limit:
        out = out.orderBy(F.col("frequency").desc(), F.col(column)).limit(limit)
    return out


def conditional_count(df: DataFrame, key_cols: Sequence[str], cond,
                      alias: str = "event_count") -> DataFrame:
    """Per-key count of rows matching ``cond`` (A2;
    ``feature_engineering.py:21-24``): single-pass conditional sum, no
    flag-column + groupBy round trip."""
    return df.groupBy(*key_cols).agg(
        F.sum(F.when(cond, 1).otherwise(0)).alias(alias)
    )


def total_count(df: DataFrame, key_cols: Sequence[str],
                alias: str = "total_count") -> DataFrame:
    """Per-key total row count (A3; ``feature_engineering.py:27-31`` computes
    this with two groupBys — one suffices, partial agg is automatic)."""
    return df.groupBy(*key_cols).agg(F.count("*").alias(alias))


def existence_flag(df: DataFrame, key_cols: Sequence[str], cond,
                   alias: str = "flag") -> DataFrame:
    """Per-key 0/1 presence of rows matching ``cond`` (A4;
    ``feature_engineering.py:53-54``)."""
    return df.groupBy(*key_cols).agg(
        F.max(F.when(cond, 1).otherwise(0)).alias(alias)
    )


def group_statistics(df: DataFrame, key_cols: Sequence[str], value_col: str,
                     prefix: str | None = None) -> DataFrame:
    """Per-key mean / stddev / median (A5; ``feature_engineering.py:131-151``,
    which calls unimported ``mean/stddev/percentile_approx`` — a latent
    NameError we obviously don't reproduce). Exact ``percentile`` (not
    ``percentile_approx``) so results are engine-independent."""
    p = prefix or value_col
    return df.groupBy(*key_cols).agg(
        F.mean(value_col).alias(f"{p}_mean"),
        F.stddev(value_col).alias(f"{p}_stddev"),
        F.percentile(value_col, 0.5).alias(f"{p}_median"),
    )


def value_out_of_range(df: DataFrame, value_col: str, lower, upper,
                       alias: str = "out_of_range") -> DataFrame:
    """Flag values outside [lower, upper] (P5; ``analysis_utils.py:99-110``)."""
    flag = F.when(
        (F.col(value_col) < F.lit(lower)) | (F.col(value_col) > F.lit(upper)), 1
    ).otherwise(0)
    return df.withColumn(alias, flag)


def string_match(df: DataFrame, column: str, pattern: str,
                 mode: str = "contains") -> DataFrame:
    """Case-insensitive string-match filter (P6;
    ``analysis_utils.py:340-358``): exact/contains/starts_with/ends_with."""
    c = F.lower(F.col(column))
    p = pattern.lower()
    conds = {
        "exact": c == F.lit(p),
        "contains": c.contains(p),
        "starts_with": c.startswith(p),
        "ends_with": c.endswith(p),
    }
    if mode not in conds:
        raise ValueError(f"mode must be one of {sorted(conds)}: {mode}")
    return df.filter(conds[mode])


def cooccurrence_ratio(df: DataFrame, primary: str, secondary: str,
                       threshold: float = 0.0) -> DataFrame:
    """Pair frequency + ratio-to-primary-total, thresholded (A8 + W2;
    ``analysis_utils.py:172-182``). The reference uses BigQuery-only
    ``QUALIFY`` (breaks its own local mode, SURVEY.md §2.12); here the
    window-ratio + filter is dialect-free."""
    pairs = df.groupBy(primary, secondary).agg(F.count("*").alias("frequency"))
    w = Window.partitionBy(primary)
    return (
        pairs.withColumn("ratio", F.col("frequency") / F.sum("frequency").over(w))
        .filter(F.col("ratio") >= threshold)
    )


def activity_union(dfs: dict[str, DataFrame], activity_col: dict[str, str],
                   alias: str = "activity") -> DataFrame:
    """Per-dataset activity counts tagged + unioned (A7/SET1;
    ``analysis_utils.py:138-148``): ``unionByName`` over literal-tagged
    aggregates instead of positional UNION ALL string concatenation."""
    parts = [
        df.groupBy(F.col(activity_col[name]).alias(alias))
        .agg(F.count("*").alias("frequency"))
        .withColumn("dataset", F.lit(name))
        for name, df in dfs.items()
    ]
    return reduce(lambda a, b: a.unionByName(b), parts)


def semi_join_keys(df: DataFrame, keys: DataFrame, on: Sequence[str]) -> DataFrame:
    """Filter ``df`` to rows whose key appears in ``keys`` (J8 replacement:
    the reference collects distinct keys to the driver and interpolates an
    ``IN (...)`` list — unbounded driver memory at scale; ``left_semi`` keeps
    it distributed and lets AQE pick a broadcast when small)."""
    return df.join(keys.select(*on).distinct(), on=list(on), how="left_semi")


def left_merge(left: DataFrame, right: DataFrame, on: Sequence[str]) -> DataFrame:
    """Left equi-join with duplicate-key-column dedup (J5;
    ``feature_engineering.py:258-284`` renames right keys ``+'_right'`` and
    drops them after — Spark's ``on=list`` join dedups key columns natively)."""
    return left.join(right, on=list(on), how="left")

"""Rule-based labeling and scoring — parity with the reference's
``PhenotypingEngine`` (``phenotyping_engine.py``) and clinical scoring ops
(``feature_engineering.py:154-217``).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def conditional_feature(df: DataFrame, condition: str | Column,
                        alias: str) -> DataFrame:
    """CASE WHEN cond THEN 1 ELSE 0 END as a new column (P9;
    ``feature_engineering.py:154-164``). ``condition`` may be a SQL boolean
    string (the reference's extension point, U2) or a Column."""
    cond = F.expr(condition) if isinstance(condition, str) else condition
    return df.withColumn(alias, F.when(cond, 1).otherwise(0))


def apply_rules(df: DataFrame, rules: Sequence[dict],
                default: str = "OTHER", alias: str = "label") -> DataFrame:
    """Ordered rule labeling (P10; ``phenotyping_engine.py:27-60``).

    ``rules`` is a list of ``{"label": str, "conditions": str|Column}`` —
    evaluated **in order**, first match wins (the reference's CASE-before-
    CONTROL ordering is semantics, ``phenotyping_engine.py:48-57``); unmatched
    rows get ``default`` (the reference's null→OTHER backfill)."""
    expr = None
    for rule in rules:
        cond = rule["conditions"]
        cond = F.expr(cond) if isinstance(cond, str) else cond
        expr = F.when(cond, rule["label"]) if expr is None else expr.when(cond, rule["label"])
    expr = F.lit(default) if expr is None else expr.otherwise(default)
    return df.withColumn(alias, expr)


def rule_score(df: DataFrame, rules: Sequence[tuple[str | Column, int]],
               alias: str = "score") -> DataFrame:
    """Prediction-rule point score: Σ CASE WHEN cond THEN pts ELSE 0 END
    (P11; ``feature_engineering.py:193-217``)."""
    terms = [
        F.when(F.expr(c) if isinstance(c, str) else c, pts).otherwise(0)
        for c, pts in rules
    ]
    return df.withColumn(alias, reduce(add, terms))


def composite_score(df: DataFrame,
                    scoring: dict[str, Callable[[Column], Column]],
                    adjustments: Sequence[Callable[[DataFrame], Column]] = (),
                    alias: str = "composite_score") -> DataFrame:
    """Per-column scoring lambdas summed + adjustment lambdas (P12/U1;
    ``feature_engineering.py:167-190``): column-expression callbacks, zero
    UDF cost."""
    score_cols = []
    for col, fn in scoring.items():
        name = f"{col}_score"
        df = df.withColumn(name, fn(F.col(col)))
        score_cols.append(F.col(name))
    df = df.withColumn(alias, reduce(add, score_cols))
    for adj in adjustments:
        df = df.withColumn(alias, F.col(alias) + adj(df))
    return df

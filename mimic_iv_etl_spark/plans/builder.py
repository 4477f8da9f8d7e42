"""QueryBuilder — parity with the reference's SQL-string builder
(``query_builder.py:2-110``), rebuilt on Catalyst.

The reference accumulates SELECT/WHERE/JOIN *strings* and emits one SQL text;
its IR is the SQL string itself (SURVEY.md §3.1), with two defects fixed here:
column dedup via ``set()`` made projection order nondeterministic
(``query_builder.py:98``), and filters/joins were injection-prone f-strings.
This builder accumulates typed Column expressions over a DataFrame, so the IR
is Catalyst's logical plan — validated at construction, optimized for free.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class QueryBuilder:
    """Fluent builder over a DataFrame.

    Mirrors the reference surface: ``select_columns`` (``query_builder.py:
    31-41``), ``apply_filters`` (``:43-53``), ``join_with`` (``:55-89`` —
    including the merge of the other builder's selected columns and filters),
    ``generate_query(limit)`` (``:91-110``) → here ``build(limit)`` returning
    a DataFrame instead of SQL text.
    """

    def __init__(self, df: DataFrame, columns: Sequence[str] = (),
                 filters: Sequence[str | Column] = ()):
        self._df = df
        self._columns: list[str] = []
        self._filters: list[Column] = []
        if columns:
            self.select_columns(columns)
        if filters:
            self.apply_filters(filters)

    def select_columns(self, columns: Sequence[str]) -> "QueryBuilder":
        """Accumulate projection columns — first-seen order preserved
        (deterministic, unlike the reference's ``set()`` dedup)."""
        for c in columns:
            if c not in self._columns:
                self._columns.append(c)
        return self

    def apply_filters(self, filters: Sequence[str | Column]) -> "QueryBuilder":
        """Accumulate conjunctive predicates (WHERE p1 AND p2 ...)."""
        for f in filters:
            self._filters.append(F.expr(f) if isinstance(f, str) else f)
        return self

    def join_with(self, other: "QueryBuilder", join_type: str,
                  join_columns: Sequence[str]) -> "QueryBuilder":
        """Equi-join with another builder; merges its selected columns and
        filters into self (the reference's builder-union semantics,
        ``query_builder.py:72,89``). Catalyst picks broadcast vs sort-merge."""
        self._df = self._df.join(other._df, on=list(join_columns), how=join_type)
        for c in other._columns:
            if c not in self._columns:
                self._columns.append(c)
        self._filters.extend(other._filters)
        return self

    def build(self, limit: int | None = None) -> DataFrame:
        """Compose the plan: filter → project → limit."""
        df = self._df
        if self._filters:
            df = df.filter(reduce(lambda a, b: a & b, self._filters))
        if self._columns:
            df = df.select(*self._columns)
        if limit is not None:
            df = df.limit(limit)
        return df

    def generate_query(self, limit: int | None = None) -> DataFrame:
        """Drop-in alias for the reference's ``generate_query``
        (``query_builder.py:91-110``) — returns the composed DataFrame (the
        plan IS the query; there is no SQL string to hand off)."""
        return self.build(limit=limit)

"""Pre-flight for the driver's correctness gate: run every oracle'd registry
query on Spark AND DuckDB at sf0.01 and compare row count + values exactly
(columns sorted by name, rows sorted — the driver's order-insensitive hash)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from mimic_iv_etl_spark import registry

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

ORACLED = sorted(registry.oracle_sql().keys())
ROWS_ONLY = sorted(set(registry.queries()) - set(ORACLED))


def _duck_run(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, name):
    e = registry.REGISTRY[name]
    got = _canon(e.fn(spark, SF).toPandas())
    want = _canon(_duck_run(e.oracle))
    assert len(got) == len(want), f"{name}: rows {len(got)} != {len(want)}"
    assert list(got.columns) == list(want.columns), f"{name}: columns differ"
    pd.testing.assert_frame_equal(got, want, check_dtype=False, check_exact=True,
                                  obj=name)


def test_no_rows_only_entries_remain():
    """Since round 4 every entry carries an oracle (derived constructions
    for the hash/ANN family) — a rows-only entry would silently weaken the
    driver gate."""
    assert ROWS_ONLY == []


def test_registry_holds_exactly_fifty_oracled_entries():
    """Entry-budget discipline (VERDICT r03 item 1): the driver's correctness
    gate records the FIRST 50 (query, oracle) pairs in registry order — more
    entries silently rotate the tail out of the gate, fewer waste coverage.
    Every entry must carry an oracle (no rows-only waivers)."""
    assert len(registry.oracle_sql()) == 50
    assert len(registry.queries()) == 50

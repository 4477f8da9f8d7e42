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


def test_ann_oracle_tie_margins_clear_epsilon():
    """ADVICE r04: the derived LSH/IVF oracles assume Spark and DuckDB agree
    on (a) the SIGN of every hyperplane·vector dot (bucket bits), (b) the
    argmax centroid-cosine cell assignment and the n_probe cell ranking, and
    (c) the 1e-6 score rounding. Different summation order between engines
    perturbs a float64 dot at ~1e-15 relative — so the gate is only sound if
    every such margin clears a far larger epsilon on the gate corpora.
    Measured margins are all > 1e-5; assert > 1e-9 at both gate SFs so no
    unlucky near-tie can ever flip the gate spuriously."""
    import numpy as np

    from mimic_iv_etl_spark.registry import _IVF_CENTROID_IDS, _lsh_planes

    eps = 1e-9
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        emb = con.execute(
            f"select vec_id, embedding from '{sf}/embeddings.parquet' "
            "order by vec_id").df()
        V = np.array(emb["embedding"].tolist(), dtype=np.float64)
        ids = emb["vec_id"].to_numpy()
        # (a) signature dot signs
        P = np.array(_lsh_planes(), dtype=np.float64)
        assert np.abs(V @ P.T).min() > eps, sf
        # (b) cell-assignment and probe-rank gaps (exact ties are fine —
        # both engines break them on the centroid id deterministically)
        C = V[np.isin(ids, _IVF_CENTROID_IDS)]
        cos = (V @ C.T) / np.outer(np.linalg.norm(V, axis=1),
                                   np.linalg.norm(C, axis=1))
        s = np.sort(cos, axis=1)
        for gap in (s[:, -1] - s[:, -2], s[:, -2] - s[:, -3]):
            assert ((gap > eps) | (gap == 0)).all(), sf
        # (c) 1e-6 rounding boundaries for the query-corpus scores
        q = V[ids < 20]
        qc = (q @ V.T) / np.outer(np.linalg.norm(q, axis=1),
                                  np.linalg.norm(V, axis=1))
        frac = np.abs(qc * 1e6 - np.floor(qc * 1e6) - 0.5)
        assert frac.min() > eps, sf


def test_registry_holds_exactly_fifty_oracled_entries():
    """Entry-budget discipline (VERDICT r03 item 1): the driver's correctness
    gate records the FIRST 50 (query, oracle) pairs in registry order — more
    entries silently rotate the tail out of the gate, fewer waste coverage.
    Every entry must carry an oracle (no rows-only waivers)."""
    assert len(registry.oracle_sql()) == 50
    assert len(registry.queries()) == 50

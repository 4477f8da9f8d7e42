"""Generator sanity + oracle cross-check (DuckDB window vs naive Python fold)."""

from __future__ import annotations

import duckdb
import pandas as pd
import pandas.testing as pdt

from mimic_iv_etl_spark.cdc.oracle import duckdb_final_state, python_fold_final_state


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reset_index(drop=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df


def test_generator_shape_and_dials(small_log):
    d, spec, manifest = small_log
    con = duckdb.connect()
    log = f"read_parquet('{d}/tranche-*/*.parquet', union_by_name=true)"
    n = con.execute(f"SELECT count(*) FROM {log}").fetchone()[0]
    assert n == spec.n_events

    # per-partition offsets are dense 0..k-1 (a valid WAL order)
    rows = con.execute(
        f'SELECT partition, count(*), min("offset"), max("offset") '
        f"FROM {log} GROUP BY 1 ORDER BY 1"
    ).fetchall()
    assert len(rows) == spec.n_partitions
    for _, cnt, lo, hi in rows:
        assert (lo, hi) == (0, cnt - 1)

    # hot conversation takes >= ~20% of events (skew dial works)
    hot = con.execute(
        f"SELECT count(*) FROM {log} WHERE conv_id = 'conv-000000'"
    ).fetchone()[0]
    assert hot / n >= 0.18

    # exact ts ties on the same key exist (LWW tiebreak is exercised)
    ties = con.execute(
        f"SELECT count(*) FROM (SELECT conv_id, turn_idx, ts FROM {log} "
        f"GROUP BY 1,2,3 HAVING count(*) > 1)"
    ).fetchone()[0]
    assert ties > 0

    # late arrivals exist: same key, higher offset but older ts
    late = con.execute(
        f"""
        SELECT count(*) FROM {log} a JOIN {log} b
        USING (conv_id, turn_idx, partition)
        WHERE a."offset" > b."offset" AND a.ts < b.ts
        """
    ).fetchone()[0]
    assert late > 0

    # all three ops present; deletes carry null text
    ops = dict(con.execute(f"SELECT op, count(*) FROM {log} GROUP BY 1").fetchall())
    assert set(ops) == {"I", "U", "D"} and all(v > 0 for v in ops.values())


def test_generator_deterministic(tmp_path, small_log):
    from mimic_iv_etl_spark.cdc.changelog import generate_change_log

    d, spec, _ = small_log
    d2 = str(tmp_path / "log2")
    generate_change_log(d2, spec)
    con = duckdb.connect()
    for src in (d, d2):
        con.execute(
            f"CREATE VIEW v_{'a' if src == d else 'b'} AS "
            f"SELECT * FROM read_parquet('{src}/tranche-*/*.parquet', union_by_name=true)"
        )
    diff = con.execute(
        "SELECT count(*) FROM ((SELECT * FROM v_a EXCEPT SELECT * FROM v_b) "
        "UNION ALL (SELECT * FROM v_b EXCEPT SELECT * FROM v_a))"
    ).fetchone()[0]
    assert diff == 0


def test_oracles_agree(small_log):
    d, _, _ = small_log
    a = _norm(duckdb_final_state(d))
    b = _norm(python_fold_final_state(d))
    pdt.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) > 0


def test_oracles_agree_evolved(evolved_log):
    d, _, _ = evolved_log
    a = _norm(duckdb_final_state(d))
    b = _norm(python_fold_final_state(d))
    assert list(a.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts",
                               "tool_version", "latency_ms"]
    pdt.assert_frame_equal(a, b, check_dtype=False)

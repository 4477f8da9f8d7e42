"""Independent final-state oracles for change-log replay (FIXTURES.md F4).

Plays the role the reference's dual-backend differential check plays
(BigQuery vs local CSVs through the same queries, ``bigquery_utils.py:95-111``):
an implementation the engine shares no code with, computing the expected final
table from the raw change log.

LWW semantics (the single source of truth, mirrored by the engine):
  winner per (conv_id, turn_idx) = max by (ts, offset, partition);
  if the winner's op is 'D' the key is absent from the final state.
The (offset, partition) tiebreak makes equal-``ts`` conflicts deterministic —
the reference's windows lack tiebreakers (``feature_engineering.py:80,104``,
SURVEY.md §2.5) and that defect is deliberately not inherited.

Two independent implementations cross-check each other in tests:
- ``duckdb_final_state`` — one SQL window query in DuckDB;
- ``python_fold_final_state`` — a single-threaded per-row fold in
  (partition, offset) arrival order.
"""

from __future__ import annotations

import glob
import os

import duckdb
import pandas as pd

BASE_COLS = ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
EVOLVED_COLS = ["tool_version", "latency_ms"]


def _log_files(log_dir: str) -> list[str]:
    files = sorted(glob.glob(os.path.join(log_dir, "tranche-*", "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no change-log parquet under {log_dir}")
    return files


def _connect_with_log_view(log_dir: str) -> duckdb.DuckDBPyConnection:
    files = _log_files(log_dir)
    con = duckdb.connect()
    lst = ", ".join("'" + f.replace("'", "''") + "'" for f in files)
    con.execute(f"CREATE VIEW log AS SELECT * FROM read_parquet([{lst}], union_by_name=true)")
    return con


def _present_cols(con: duckdb.DuckDBPyConnection, rel: str) -> list[str]:
    names = [r[1] for r in con.execute(f"PRAGMA table_info('{rel}')").fetchall()]
    return [c for c in BASE_COLS + EVOLVED_COLS if c in names]


def duckdb_final_state(log_dir: str, max_offset: dict[int, int] | None = None) -> pd.DataFrame:
    """Expected final state via DuckDB, ordered by (conv_id, turn_idx).

    ``max_offset`` optionally truncates the log to offsets <= bound per source
    partition (for mid-replay checkpoint assertions).
    """
    con = _connect_with_log_view(log_dir)
    where = ""
    if max_offset is not None:
        clauses = [
            f"(partition = {int(p)} AND \"offset\" <= {int(o)})"
            for p, o in max_offset.items()
        ]
        where = "WHERE " + (" OR ".join(clauses) if clauses else "FALSE")
    cols = _present_cols(con, "log")
    sel = ", ".join(cols)
    q = f"""
        WITH ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY conv_id, turn_idx
                ORDER BY ts DESC, "offset" DESC, partition DESC
            ) AS rn
            FROM log {where}
        )
        SELECT {sel} FROM ranked
        WHERE rn = 1 AND op <> 'D'
        ORDER BY conv_id, turn_idx
    """
    return con.execute(q).df()


def python_fold_final_state(log_dir: str) -> pd.DataFrame:
    """Expected final state via a naive single-threaded fold (slow; tests only)."""
    con = _connect_with_log_view(log_dir)
    cols = _present_cols(con, "log")
    df = con.execute(
        f'SELECT op, {", ".join(cols)}, "offset", partition FROM log '
        'ORDER BY partition, "offset"'
    ).df()
    state: dict[tuple, dict] = {}
    stamp: dict[tuple, tuple] = {}
    for row in df.itertuples(index=False):
        d = row._asdict()
        key = (d["conv_id"], d["turn_idx"])
        s = (d["ts"], d["offset"], d["partition"])
        if key in stamp and s <= stamp[key]:
            continue  # late event older than applied state loses
        stamp[key] = s
        if d["op"] == "D":
            state.pop(key, None)
        else:
            state[key] = {c: d[c] for c in cols}
    out = pd.DataFrame(list(state.values()), columns=cols)
    return out.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

"""Test helpers: engine-vs-oracle final-state comparison."""

from __future__ import annotations

import pandas as pd
import pandas.testing as pdt
from pyspark.sql import types as T

TRANSCRIPT_SCHEMA = T.StructType(
    [
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        # NTZ: matches parquet naive timestamps (Spark 4 reads them as NTZ)
        # and DuckDB's TIMESTAMP, so engine/oracle compare bit-exact.
        T.StructField("ts", T.TimestampNTZType(), False),
    ]
)


def normalize_pdf(df: pd.DataFrame) -> pd.DataFrame:
    """Sort by key, reset index, canonicalize NaN/None and timestamp units."""
    df = df.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            pass
        elif df[c].dtype == object:
            df[c] = df[c].where(pd.notna(df[c]), None)
    return df


def assert_final_state_equal(engine_df, oracle_pdf: pd.DataFrame) -> None:
    """Per-turn equality under stable (conv_id, turn_idx) ordering — the
    north-rule invariant."""
    got = normalize_pdf(engine_df.toPandas())
    want = normalize_pdf(oracle_pdf)
    assert list(got.columns) == list(want.columns), (got.columns, want.columns)
    pdt.assert_frame_equal(got, want, check_dtype=False)

"""Non-lake sources & sinks (SURVEY.md §2.1 S1/S5/S6 + sampling P8).

The reference's extraction pipeline re-materializes filtered table snapshots
to driver-local pandas CSVs (``sample_data_generator.py:59-60``,
``ml_utils.py:238-252`` — bounded by driver memory, with a ``.csz.bz2``
filename typo). These are distributed equivalents: executor-side writes,
explicit schemas (never ``inferSchema`` in engine paths), seeded sampling.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_with_schema(spark: SparkSession, path: str,
                         schema: T.StructType, header: bool = True) -> DataFrame:
    """CSV scan with an explicit schema (S1 fix: the reference's
    ``inferSchema=True`` per query, ``bigquery_utils.py:98``, re-infers —
    and can re-type — every read)."""
    return spark.read.schema(schema).csv(path, header=header)


def export_data(df: DataFrame, path: str, fmt: str = "parquet",
                compression: str | None = None, single_file: bool = False) -> None:
    """Snapshot export (S5/S6; ``ml_utils.py:238-252``). Distributed write;
    ``single_file=True`` coalesces for small extracts (the only case the
    reference's driver-side ``toPandas().to_csv`` could handle at all)."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode("overwrite")
    if fmt == "csv":
        writer = writer.option("header", True)
        if compression:
            writer = writer.option("compression", compression)
        writer.csv(path)
    elif fmt == "parquet":
        if compression:
            writer = writer.option("compression", compression)
        writer.parquet(path)
    else:
        raise ValueError(f"unsupported format: {fmt}")


def sample_extract(df: DataFrame, key_col: str, approx_keys: int,
                   seed: int = 42) -> DataFrame:
    """Keyed sample extraction (P8 + J8; ``sample_data_generator.py:10-14,
    51-57``): sample ~``approx_keys`` distinct keys, then semi-join the rows —
    the reference collected the key list to the driver and interpolated an
    ``IN (...)`` SQL string; this never leaves the executors."""
    keys = df.select(key_col).distinct()
    total = keys.count()
    frac = min(1.0, approx_keys / max(1, total))
    sampled = keys.sample(withReplacement=False, fraction=frac, seed=seed)
    return df.join(F.broadcast(sampled), on=key_col, how="left_semi")

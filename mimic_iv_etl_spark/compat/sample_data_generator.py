"""Sample-extraction facade — parity with the reference's top-level
``sample_data_generator.py`` (same function names and flow), distributed
internals.

The reference samples ~1,000 patients with ``RAND() < k/COUNT(*)``
(``sample_data_generator.py:7-20``), collects the key list to the driver, and
re-queries every fact table with an interpolated ``IN (...)`` list
(``:22-60``), then collects distinct code sets to extract dimensions
(``:63-135``) — all bounded by driver memory. Here the key set stays
distributed (seeded sample + broadcast semi-join) and extraction writes
through the executor-side exporter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic_iv_etl_spark.sources.io import export_data, sample_extract


def choose_random_sample(spark: SparkSession, approx_sample_size: int,
                         dataset: str = "patients",
                         key_column: str = "subject_id",
                         seed: int = 42) -> DataFrame:
    """Parity: ``sample_data_generator.py:7-20`` — ~n random keys, seeded
    (the reference's RAND() draw is unseeded and irreproducible)."""
    keys = spark.table(dataset).select(key_column).distinct()
    total = keys.count()
    frac = min(1.0, approx_sample_size / max(1, total))
    return keys.sample(withReplacement=False, fraction=frac, seed=seed)


def extract_direct(spark: SparkSession, sample_keys: DataFrame,
                   datasets: list[str], key_column: str = "subject_id",
                   out_dir: str | None = None) -> dict[str, DataFrame]:
    """Parity: ``sample_data_generator.py:22-60`` — every fact table filtered
    to the sampled keys; semi-join instead of driver IN-list. Optionally
    exports each to ``out_dir/<name>`` (the reference's CSV materialization)."""
    out: dict[str, DataFrame] = {}
    for name in datasets:
        df = spark.table(name).join(
            F.broadcast(sample_keys), on=key_column, how="left_semi"
        )
        out[name] = df
        if out_dir:
            export_data(df, f"{out_dir}/{name}", fmt="parquet")
    return out


def extract_related(spark: SparkSession, fact_to_dim: dict[str, tuple[str, str]],
                    extracted: dict[str, DataFrame],
                    out_dir: str | None = None) -> dict[str, DataFrame]:
    """Parity: ``sample_data_generator.py:63-135`` — dimension tables reduced
    to the codes referenced by the extracted facts. ``fact_to_dim`` maps
    fact name → (dim table, shared code column); code sets travel as
    semi-joins, never ``collect()``-ed ``set()`` unions."""
    out: dict[str, DataFrame] = {}
    for fact, (dim, code_col) in fact_to_dim.items():
        codes = extracted[fact].select(code_col).distinct()
        df = spark.table(dim).join(F.broadcast(codes), on=code_col, how="left_semi")
        out[dim] = df
        if out_dir:
            export_data(df, f"{out_dir}/{dim}", fmt="parquet")
    return out


__all__ = ["choose_random_sample", "extract_direct", "extract_related",
           "sample_extract"]

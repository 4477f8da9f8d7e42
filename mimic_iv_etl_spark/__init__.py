"""mimic_iv_etl_spark — a PySpark-native CDC / incremental-ingest engine.

Brand-new engine with the query and data-processing capabilities of the
reference repo (kevinmenear/mimic-iv-etl, surveyed in /root/repo/SURVEY.md),
re-expressed Spark-first:

- ``lake``       — snapshot-based lake-table format (Iceberg-style semantics:
                   atomic commits, bucket pruning, CoW merge, schema evolution,
                   snapshot summary properties) in pure PySpark + parquet.
- ``cdc``        — change-log generation, LWW dedup, batch apply, replay with
                   checkpoint resume, exactly-once idempotent commits,
                   Structured Streaming shell, lineage + metrics.
- ``operators``  — the reference's analytic operator inventory (SURVEY.md §2)
                   plus large-scale training-data ops (dedup, similarity
                   search, text analysis, multimodal plumbing).
- ``functions``  — vectorized (Arrow/pandas_udf) scalar helpers.
"""

__version__ = "0.1.0"

# Pandas-UDF closures reference functions from this package; cloudpickle
# serializes importable module functions BY REFERENCE, which breaks on
# executors that don't have the repo on PYTHONPATH (e.g. a harness that
# imported this package via a sys.path tweak). Registering the package for
# by-value pickling makes every UDF self-contained. Cheap: only the few
# functions actually captured get embedded in the closure.
try:  # pragma: no cover - depends on cloudpickle version
    import sys as _sys

    import pyspark.cloudpickle as _cp

    _cp.register_pickle_by_value(_sys.modules[__name__])
except Exception:  # noqa: BLE001 - best-effort robustness shim
    pass

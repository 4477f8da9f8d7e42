"""Lake-table layer: Iceberg-style snapshot tables in pure PySpark + parquet.

The runtime image carries no Iceberg/Delta jars, so the engine implements the
table-format semantics the north rule requires natively: atomic snapshot
commits, bucket-level file pruning, copy-on-write merge of touched buckets,
per-file schema ids (schema evolution without rewrites), and snapshot summary
properties carrying the applied source-offset ranges (exactly-once).
"""

from mimic_iv_etl_spark.lake.table import LakeTable

__all__ = ["LakeTable"]

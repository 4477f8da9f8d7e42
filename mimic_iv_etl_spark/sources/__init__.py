"""Sources & sinks beyond the lake table (SURVEY.md §2.1)."""

from mimic_iv_etl_spark.sources.io import (
    export_data,
    read_csv_with_schema,
    sample_extract,
)

__all__ = ["export_data", "read_csv_with_schema", "sample_extract"]

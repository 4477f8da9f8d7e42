"""Catalog/describe facade — parity with ``mimicfouretl/data_insights.py``.

The reference reads per-table YAML files (``data_insights.py:9-19``) with
``dataset_description`` + per-column ``{type, description}``. Here the same
dict shape is produced either from a YAML file (if one exists) or derived
live from a DataFrame/LakeTable schema — the engine's schema is
authoritative, not a hand-maintained sidecar (SURVEY.md §1.2 noted the
declared/operational schema split as a correctness hazard).

The ipywidgets browser (``display_datasets``, ``:22-48``) is a notebook
UI consumer, intentionally out of engine scope (SURVEY.md §2.11).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_SPARK_TO_YAML = {
    "integer": "int", "long": "int", "short": "int", "byte": "int",
    "double": "float", "float": "float",
    "string": "string",
    "timestamp": "timestamp", "timestamp_ntz": "timestamp", "date": "date",
    "boolean": "bool", "binary": "binary",
}


def get_dataset_description(file_path: str) -> dict:
    """Parity: ``data_insights.py:9-19`` — load a YAML table description."""
    import yaml

    with open(file_path) as f:
        return yaml.safe_load(f)


def describe_dataframe(df: DataFrame, dataset_description: str = "") -> dict:
    """The YAML catalog shape, derived from a live schema: columns map to
    ``{type, description}`` with the reference's ``|null`` nullability
    suffix convention."""
    cols = {}
    for field in df.schema.fields:
        t = _SPARK_TO_YAML.get(field.dataType.typeName(), field.dataType.simpleString())
        if field.nullable:
            t = f"{t}|null"
        cols[field.name] = {"type": t, "description": ""}
    return {"dataset_description": dataset_description, "columns": cols}

"""PhenotypingEngine facade — parity with
``mimicfouretl/phenotyping_engine.py`` (column ``Phenotype``, CASE-before-
CONTROL rule ordering, OTHER backfill), built on ordered first-match-wins
rule evaluation (``operators/labeling.py``), which is equivalent to the
reference's three-phase apply (CASE → CONTROL-over-OTHER → null→OTHER,
``phenotyping_engine.py:27-60``) and fixes its missing ``when/col`` imports.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from mimic_iv_etl_spark.operators.labeling import apply_rules


class PhenotypingEngine:
    def __init__(self, data: DataFrame):
        self.data = data
        self.rules: list[dict] = []

    def add_rule(self, label: str, conditions: str) -> None:
        """Reference :9-25 (same validation)."""
        if label not in ("CASE", "CONTROL"):
            raise ValueError("Label must be 'CASE' or 'CONTROL'")
        if not isinstance(conditions, str):
            raise TypeError("Conditions must be a string")
        self.rules.append({"label": label, "conditions": conditions})

    def execute_phenotyping(self) -> None:
        """Reference :48-60: CASE rules take precedence over CONTROL rules,
        everything else is OTHER — expressed as one ordered when-chain."""
        ordered = [r for r in self.rules if r["label"] == "CASE"] + [
            r for r in self.rules if r["label"] == "CONTROL"
        ]
        self.data = apply_rules(self.data, ordered, default="OTHER",
                                alias="Phenotype")

    def get_results(self) -> DataFrame:
        """Reference :63-72."""
        return self.data

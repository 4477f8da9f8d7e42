"""Query-plan construction: typed DataFrame query builder (reference parity)."""

from mimic_iv_etl_spark.plans.builder import QueryBuilder

__all__ = ["QueryBuilder"]

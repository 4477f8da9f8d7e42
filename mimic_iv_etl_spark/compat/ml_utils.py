"""MLUtils facade — the *engine-scope* slice of ``mimicfouretl/ml_utils.py``.

The reference's ML layer (sklearn/xgboost/optuna/SHAP over ``toPandas``) is a
single-node consumer of the engine's output, intentionally not ported
(SURVEY.md §2.11). What IS engine scope and lives here: target/feature
validation (``ml_utils.py:42-63``), distributed null cleaning (P7, ``:83``),
correlation features (A11, ``:118-130``), export (S6 → ``sources.io``), and
the mutation log (S8, ``:529-544`` → the engine's lineage sidecar).
"""

from __future__ import annotations

import datetime
import json
import os
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class MLUtils:
    def __init__(self, data: DataFrame):
        self.data = data
        self.target: str | None = None
        self.features: list[str] = []

    def set_target(self, target: str) -> None:
        """Parity: ``ml_utils.py:42-51`` (same ValueError)."""
        if target not in self.data.columns:
            raise ValueError(f"Target column '{target}' not found in the dataset.")
        self.target = target

    def set_features(self, features: list) -> None:
        """Parity: ``ml_utils.py:54-63``."""
        for feature in features:
            if feature not in self.data.columns:
                raise ValueError(
                    f"Feature column '{feature}' not found in the dataset.")
        self.features = list(features)

    def clean_data(self, columns=None, verbose: bool = False) -> None:
        """Parity: ``ml_utils.py:66-90`` (P7: ``na.drop(subset, how='any')``)."""
        if columns is None:
            columns = self.features + ([self.target] if self.target else [])
        if verbose:
            before = self.data.count()
        self.data = self.data.na.drop(subset=columns, how="any")
        if verbose:
            print(f"Number of rows dropped: {before - self.data.count()}")

    def correlation_features(self, columns=None, round_to: int = 6) -> DataFrame:
        """A11 (``ml_utils.py:118-130``): pairwise Pearson correlations.
        The reference assembles a vector column and calls ``ml.stat
        .Correlation`` per feature; ``F.corr`` in one aggregate is the
        Catalyst-native equivalent — one pass, no MLlib dependency."""
        cols = columns or self.features
        aggs = [
            F.round(F.corr(a, b), round_to).alias(f"corr_{a}_{b}")
            for a, b in combinations(cols, 2)
        ]
        if not aggs:
            raise ValueError("need at least two columns")
        return self.data.agg(*aggs)

    def log_changes(self, change_description: str,
                    log_path: str = "data_processing_log.json") -> None:
        """Parity: ``ml_utils.py:529-544`` (with imports that exist and a
        configurable path). The engine's per-batch lineage/metrics sidecars
        (``cdc/metrics.py``) supersede this free-text log."""
        entry = {
            "timestamp": datetime.datetime.now().isoformat(),
            "description": change_description,
        }
        os.makedirs(os.path.dirname(log_path) or ".", exist_ok=True)
        with open(log_path, "a") as f:
            f.write(json.dumps(entry) + "\n")

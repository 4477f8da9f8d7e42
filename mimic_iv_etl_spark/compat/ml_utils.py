"""MLUtils facade — ``mimicfouretl/ml_utils.py`` re-expressed distributed.

Engine-scope data ops: target/feature validation (``ml_utils.py:42-63``),
distributed null cleaning (P7, ``:83``), correlation features (A11,
``:118-130``), correlation-based feature selection (``:95-140``), split +
standardization (``:145-196``), export (S6 → ``sources.io``), and the
mutation log (S8, ``:529-544`` → the engine's lineage sidecar).

The reference's model layer (sklearn/xgboost over a full ``toPandas``,
``:254-376``) is single-node by construction; the train/evaluate methods here
are its distributed equivalents on ``pyspark.ml`` (GBT/linear estimators,
inverse-frequency instance weights instead of pandas-resident SMOTE).
Deliberately NOT ported: Optuna search and SHAP plots (``:378-527``) —
driver-side consumers of a fitted model, orthogonal to the engine.
"""

from __future__ import annotations

import datetime
import json
import os
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scale_features(df: DataFrame, cols: list[str],
                   round_to: int | None = None,
                   stats: DataFrame | None = None) -> DataFrame:
    """Z-score standardization, distributed: one tiny global aggregate for the
    moments, broadcast-crossJoined back (no collect, no per-row Python — the
    reference standardizes via sklearn on a full ``toPandas``,
    ``ml_utils.py:168-186``, which is driver-bound at scale). Pass ``stats``
    to transform with moments fitted elsewhere (train-split discipline).
    Appends ``<col>_z`` columns."""
    if stats is None:
        stats = df.agg(
            *[F.avg(c).alias(f"_mu_{c}") for c in cols],
            *[F.stddev(c).alias(f"_sd_{c}") for c in cols],
        )
    out = df.crossJoin(F.broadcast(stats))
    for c in cols:
        z = (F.col(c) - F.col(f"_mu_{c}")) / F.col(f"_sd_{c}")
        out = out.withColumn(f"{c}_z", F.round(z, round_to) if round_to else z)
    return out.drop(*[f"_mu_{c}" for c in cols], *[f"_sd_{c}" for c in cols])


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

    def select_features(self, features: list, selection_type: str = "subset",
                        correlation_threshold: float | None = None,
                        top_n: int | None = None) -> None:
        """Parity: ``ml_utils.py:95-140``. The reference runs one
        VectorAssembler + ``Correlation.corr().collect()`` Spark job PER
        FEATURE (N jobs, N table scans); here all feature-target correlations
        are one ``F.corr`` aggregate — one scan, one tiny driver row."""
        if selection_type == "subset":
            self.set_features(features)
            return
        if selection_type != "correlation":
            raise ValueError("selection_type must be 'subset' or 'correlation'")
        if self.target is None:
            raise ValueError(
                "Target feature needs to be set with set_target method "
                "before calculating feature correlation.")
        # corr = covar / (sd_f · sd_y), divided driver-side: ANSI mode makes
        # F.corr throw divide-by-zero on zero-variance columns; the reference
        # (MLlib) yields NaN there — we drop such features instead.
        row = self.data.agg(
            F.stddev(self.target).alias("_sd_y"),
            *[F.covar_samp(f, self.target).alias(f"_cov_{f}") for f in features],
            *[F.stddev(f).alias(f"_sd_{f}") for f in features],
        ).collect()[0]
        pairs = [
            (f, row[f"_cov_{f}"] / (row[f"_sd_{f}"] * row["_sd_y"]))
            for f in features
            if row[f"_cov_{f}"] is not None and row[f"_sd_{f}"] and row["_sd_y"]
        ]
        if correlation_threshold is not None:
            pairs = [(f, c) for f, c in pairs if abs(c) >= correlation_threshold]
        if top_n:
            pairs.sort(key=lambda x: abs(x[1]), reverse=True)
            pairs = pairs[:top_n]
        self.set_features([f for f, _ in pairs])

    def split_data(self, ratio: tuple = (0.7, 0.15, 0.15),
                   standardization: list[str] | None = None,
                   seed: int = 42) -> tuple[DataFrame, DataFrame, DataFrame]:
        """Parity: ``ml_utils.py:145-196`` — but distributed. The reference
        ``toPandas()``'es the whole table, sklearn-splits and fit-transforms
        on the driver (OOM-bound at scale); here: seeded ``randomSplit`` plus
        optional z-score standardization whose moments are fitted on the
        TRAIN split only and broadcast to all three (the reference's
        fit-on-train / transform-all discipline, no leakage). Sets
        ``self.train/val/test`` and returns them."""
        if len(ratio) != 3:
            raise ValueError("ratio must be a 3-tuple (train, val, test)")
        train, val, test = self.data.randomSplit(list(ratio), seed=seed)
        if standardization:
            stats = train.agg(
                *[F.avg(c).alias(f"_mu_{c}") for c in standardization],
                *[F.stddev(c).alias(f"_sd_{c}") for c in standardization],
            )
            train, val, test = (
                scale_features(d, standardization, stats=stats)
                for d in (train, val, test)
            )
        self.train, self.val, self.test = train, val, test
        return train, val, test

    # ------------------------------------------------------------- training
    # The reference trains XGBoost on a driver-side pandas frame with
    # imblearn SMOTE/undersampling (``ml_utils.py:254-309``) — single-node by
    # construction. The distributed equivalents below use pyspark.ml (ships
    # with Spark, no extra deps): gradient-boosted trees / linear models fit
    # on the DataFrame splits, and class imbalance handled with per-class
    # instance weights — the cluster-native stand-in for SMOTE, which is a
    # pandas-resident resampling technique (documented divergence).

    def _assembled(self, df: DataFrame) -> DataFrame:
        from pyspark.ml.feature import VectorAssembler

        if not self.features or self.target is None:
            raise ValueError("set_features and set_target must be called first")
        return VectorAssembler(
            inputCols=self.features, outputCol="features"
        ).transform(df)

    def train_regression_model(self, params: dict | None = None,
                               model_type: str = "gbt"):
        """Parity: ``ml_utils.py:254-260`` — distributed. ``model_type``:
        'gbt' (GBTRegressor, the XGBRegressor analogue) or 'linear'."""
        from pyspark.ml.regression import GBTRegressor, LinearRegression

        cls = GBTRegressor if model_type == "gbt" else LinearRegression
        est = cls(featuresCol="features", labelCol=self.target, **(params or {}))
        self.model = est.fit(self._assembled(self.train))
        return self.model

    def train_classification_model(self, class_weight: bool = True,
                                   params: dict | None = None,
                                   model_type: str = "gbt", verbose: bool = False):
        """Parity: ``ml_utils.py:262-309`` — distributed. Class imbalance is
        handled with inverse-frequency instance weights (``weightCol``)
        instead of SMOTE/undersampling: reweighting is shuffle-free and
        equivalent in expectation to resampling, and it works on data that
        does not fit on the driver."""
        from pyspark.ml.classification import GBTClassifier, LogisticRegression

        train = self._assembled(self.train)
        kwargs = dict(featuresCol="features", labelCol=self.target, **(params or {}))
        if class_weight:
            counts = {r[0]: r[1] for r in
                      train.groupBy(self.target).count().collect()}
            total, k = sum(counts.values()), len(counts)
            weights = {c: total / (k * n) for c, n in counts.items()}
            if verbose:
                print(f"class counts: {counts} → weights: {weights}")
            expr = None
            for c, w in weights.items():
                cond = F.col(self.target) == c
                expr = F.when(cond, w) if expr is None else expr.when(cond, w)
            train = train.withColumn("_weight", expr)
            kwargs["weightCol"] = "_weight"
        cls = GBTClassifier if model_type == "gbt" else LogisticRegression
        self.model = cls(**kwargs).fit(train)
        return self.model

    def _eval_df(self, eval_type: str) -> DataFrame:
        if eval_type not in ("val", "test", "train"):
            raise ValueError("eval_type must be 'train', 'val' or 'test'")
        return self._assembled(getattr(self, eval_type))

    def evaluate_classification_model(self, eval_type: str = "val") -> dict:
        """Parity: ``ml_utils.py:311-331`` — same metric dict, computed
        distributed from one confusion-count aggregate (+ MLlib AUC)."""
        from pyspark.ml.evaluation import BinaryClassificationEvaluator

        pred = self.model.transform(self._eval_df(eval_type))
        cm = {
            (int(r["a"]), int(r["p"])): r["n"]
            for r in pred.groupBy(
                F.col(self.target).alias("a"),
                F.col("prediction").cast("int").alias("p"),
            ).agg(F.count("*").alias("n")).collect()
        }
        tp = cm.get((1, 1), 0); tn = cm.get((0, 0), 0)
        fp = cm.get((0, 1), 0); fn = cm.get((1, 0), 0)
        total = tp + tn + fp + fn
        precision = tp / (tp + fp) if tp + fp else 0.0
        recall = tp / (tp + fn) if tp + fn else 0.0
        auc = BinaryClassificationEvaluator(
            labelCol=self.target, metricName="areaUnderROC"
        ).evaluate(pred)
        return {
            "accuracy": (tp + tn) / total if total else 0.0,
            "precision": precision,
            "recall": recall,
            "f1": (2 * precision * recall / (precision + recall)
                   if precision + recall else 0.0),
            "auc_roc": auc,
        }

    def evaluate_regression_model(self, eval_type: str = "val") -> dict:
        """Parity: ``ml_utils.py:333-352`` — RMSE/MAE/R² via RegressionEvaluator."""
        from pyspark.ml.evaluation import RegressionEvaluator

        pred = self.model.transform(self._eval_df(eval_type))
        out = {}
        for name, metric in (("rmse", "rmse"), ("mae", "mae"), ("r2", "r2")):
            out[name] = RegressionEvaluator(
                labelCol=self.target, metricName=metric
            ).evaluate(pred)
        return out

    def display_confusion_matrix(self, eval_type: str = "val") -> DataFrame:
        """Parity: ``ml_utils.py:354-376`` — returns the (label × prediction)
        count grid as a DataFrame instead of a matplotlib plot."""
        pred = self.model.transform(self._eval_df(eval_type))
        return (
            pred.groupBy(F.col(self.target).alias("label"))
            .pivot("prediction")
            .count()
            .na.fill(0)
            .orderBy("label")
        )

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

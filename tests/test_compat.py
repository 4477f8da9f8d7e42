"""Compat facade tests: the reference's public API surface runs unchanged
(names, parameters, output columns) on this engine."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic_iv_etl_spark.compat import analysis_utils as au
from mimic_iv_etl_spark.compat import bigquery_utils as bq
from mimic_iv_etl_spark.compat.feature_engineering import (
    FeatureEngineering,
    left_merge_dataframes,
)
from mimic_iv_etl_spark.compat.phenotyping_engine import PhenotypingEngine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module", autouse=True)
def views(spark):
    """Register testdata as views shaped like the reference's temp views,
    including a MIMIC-shaped events/patients pair for the interval ops."""
    for t in ("events", "orders", "customer", "part"):
        spark.read.parquet(f"{SF}/{t}.parquet").createOrReplaceTempView(t)
    # MIMIC-shaped: subject_id/hadm_id grain
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        F.col("user_id").alias("subject_id"),
        (F.col("event_id") % 100).alias("hadm_id"),
        F.col("event_type"),
        F.col("ts").alias("charttime"),
        F.col("value").alias("valuenum"),
    )
    ev.createOrReplaceTempView("labevents")
    pats = ev.groupBy("subject_id").agg(F.max("charttime").alias("dod"))
    pats.withColumn(
        "dod", F.when(F.col("subject_id") % 3 == 0, F.col("dod"))
    ).createOrReplaceTempView("patients")
    yield


def test_run_query_prefix_stripping(spark):
    out = bq.run_query(spark, "SELECT count(*) AS n FROM `mimiciv_hosp.events`")
    assert out.collect()[0]["n"] == spark.table("events").count()


def test_display_sampled_df(spark):
    pdf = bq.display_sampled_df(spark.table("events"), "head", number=5)
    assert len(pdf) == 5
    with pytest.raises(ValueError):
        bq.display_sampled_df(spark.table("events"), "nope")


def test_feature_engineering_surface(spark):
    df = spark.table("labevents")
    fe = FeatureEngineering(df, subject_column="subject_id")
    fe.count_events("event_type", specific_value="click")
    fe.flag_events("event_type", specific_value="purchase")
    fe.count_previous_events("subject_id", "charttime", "event_type")
    fe.check_event_within_timeframe("subject_id", "charttime", timeframe=30)
    fe.calculate_statistics("valuenum")
    fe.create_conditional_feature("valuenum > 50", "high_value")
    fe.create_composite_index_score(
        {"valuenum": lambda c: (c / 10).cast("int")},
        {"high_value": lambda score, c: score + c},
    )
    fe.apply_clinical_prediction_rule(
        {"risk": {"valuenum": {"> 90": 2, "<= 90": 1}}}
    )
    out = fe.get_processed_data()
    cols = set(out.columns)
    assert {"event_type_count", "event_type_flag", "previous_event_type",
            "next_charttime_date", "days_to_next_charttime",
            "charttime_within_30_days", "valuenum_mean", "valuenum_stddev",
            "valuenum_median", "high_value", "valuenum_score",
            "composite_score", "risk_score"} <= cols
    row = out.filter(F.col("valuenum") > 90).select("risk_score").first()
    assert row["risk_score"] == 2

    # count parity vs reference's aggregate-then-join-back formulation
    ref_style = (
        df.withColumn("f", F.when(F.col("event_type") == "click", 1).otherwise(0))
        .groupBy("subject_id").sum("f")
        .withColumnRenamed("sum(f)", "want")
    )
    chk = out.select("subject_id", "event_type_count").distinct().join(
        ref_style, "subject_id")
    assert chk.filter(F.col("event_type_count") != F.col("want")).count() == 0


def test_measure_event_duration(spark):
    df = spark.table("labevents").withColumn(
        "endtime", F.col("charttime") + F.expr("INTERVAL 2 HOURS"))
    fe = FeatureEngineering(df)
    fe.measure_event_duration("charttime", "endtime")
    out = fe.get_processed_data()
    assert out.count() == df.count()  # no row explosion (reference defect fixed)
    assert out.select("event_duration").distinct().collect()[0][0] == 7200

    fe2 = FeatureEngineering(df)
    fe2.measure_event_duration("charttime", "endtime", aggregate_method="mean")
    assert "event_duration" in fe2.get_processed_data().columns


def test_phenotyping_engine(spark):
    pe = PhenotypingEngine(spark.table("customer"))
    with pytest.raises(ValueError):
        pe.add_rule("WRONG", "1=1")
    with pytest.raises(TypeError):
        pe.add_rule("CASE", 42)
    pe.add_rule("CONTROL", "c_mktsegment = 'BUILDING'")
    pe.add_rule("CASE", "c_acctbal > 9000")
    pe.execute_phenotyping()
    out = pe.get_results()
    # CASE precedence over CONTROL even though CONTROL was added first
    assert out.filter((F.col("c_acctbal") > 9000)
                      & (F.col("Phenotype") != "CASE")).count() == 0
    assert set(r["Phenotype"] for r in out.select("Phenotype").distinct().collect()) \
        <= {"CASE", "CONTROL", "OTHER"}


def test_analysis_utils_surface(spark):
    freq = au.get_item_frequency(spark, "event_type", "events", limit=3)
    assert freq.columns == ["event_type", "count"] and freq.count() == 3

    outcomes = au.get_outcomes_by_item(
        spark, "click", "event_type", "labevents", "valuenum", "labevents")
    assert outcomes.columns == ["subject_id", "hadm_id", "item_value", "outcome_value"]

    ab = au.get_abnormal_item_analysis(
        spark, "click", "event_type", "valuenum", {"lower": 10, "upper": 90},
        "labevents")
    vals = [r["valuenum"] for r in ab.collect()]
    assert all(v < 10 or v > 90 for v in vals) and vals

    prov = au.get_provider_activity_analysis(
        spark, 1, {"labevents": {"provider": "subject_id", "activity": "event_type"}})
    assert prov.columns == ["dataset", "activity", "count"]

    co = au.get_co_occurrence_analysis(spark, "orders", "o_orderpriority",
                                       "o_orderstatus", threshold=0.2)
    assert co.columns == ["primary_event", "secondary_event", "frequency"]
    assert co.filter(F.col("frequency") < 0.2).count() == 0

    dtd = au.calculate_event_to_death_interval(spark, "charttime", "labevents")
    assert "days_to_death" in dtd.columns and dtd.count() > 0

    e2e = au.calculate_event_to_event_interval(spark, {
        "first_event": {"dataset": "labevents", "event_type": "signup",
                        "time_column": "charttime"},
        "second_event": {"dataset": "labevents", "event_type": "purchase",
                         "time_column": "charttime"},
    })
    assert {"first_event_time", "second_event_time", "interval_days"} <= set(e2e.columns)

    sr = au.search_dataset_by_value(spark, "part", "p_name", "RED",
                                    columns=["p_partkey", "p_name"],
                                    closeness="contains")
    assert sr.columns == ["p_partkey", "p_name"]
    assert sr.count() == spark.table("part").filter(
        F.lower("p_name").contains("red")).count()


def test_ml_utils_surface(spark):
    from mimic_iv_etl_spark.compat.ml_utils import MLUtils

    df = spark.createDataFrame(
        [(1.0, 2.0, None), (2.0, 4.0, "x"), (3.0, 6.0, "y")],
        "a double, b double, c string",
    )
    ml = MLUtils(df)
    with pytest.raises(ValueError):
        ml.set_target("nope")
    with pytest.raises(ValueError):
        ml.set_features(["a", "nope"])
    ml.set_features(["a", "b"])
    ml.set_target("c")
    ml.clean_data()
    assert ml.data.count() == 2  # null c row dropped
    corr = MLUtils(df).correlation_features(["a", "b"]).collect()[0]
    assert corr["corr_a_b"] == 1.0


def test_ml_utils_split_and_scale(spark):
    from mimic_iv_etl_spark.compat.ml_utils import MLUtils, scale_features

    df = spark.range(2000).select(
        F.col("id"), (F.col("id") * 2.0 + 1).alias("a"),
        (F.col("id") % 7).cast("double").alias("b"))
    # whole-table z-score: mean ~0, stddev ~1
    z = scale_features(df, ["a"])
    stats = z.agg(F.avg("a_z"), F.stddev("a_z")).collect()[0]
    assert abs(stats[0]) < 1e-9 and abs(stats[1] - 1.0) < 1e-9

    ml = MLUtils(df)
    train, val, test = ml.split_data((0.6, 0.2, 0.2), standardization=["a", "b"])
    n = df.count()
    assert train.count() + val.count() + test.count() == n
    assert 0.5 < train.count() / n < 0.7  # seeded approximate ratio
    # moments fitted on train only: train z-scores are standard...
    ts = train.agg(F.avg("a_z"), F.stddev("a_z")).collect()[0]
    assert abs(ts[0]) < 1e-9 and abs(ts[1] - 1.0) < 1e-9
    # ...and the SAME transform applied to val (mean near 0 but not exactly)
    assert "a_z" in val.columns and "b_z" in test.columns
    # deterministic: same seed, same split
    t2, _, _ = MLUtils(df).split_data((0.6, 0.2, 0.2))
    assert t2.count() == train.count()


def test_ml_utils_select_features_by_correlation(spark):
    from mimic_iv_etl_spark.compat.ml_utils import MLUtils

    df = spark.range(500).select(
        (F.col("id") * 1.0).alias("y"),
        (F.col("id") * 2.0).alias("strong"),          # corr 1.0
        (F.col("id") % 5).cast("double").alias("weak"),
        F.lit(3.0).alias("constant"),                 # corr undefined → dropped
    )
    ml = MLUtils(df)
    ml.set_target("y")
    ml.select_features(["strong", "weak", "constant"], "correlation",
                       correlation_threshold=0.9)
    assert ml.features == ["strong"]
    ml.select_features(["strong", "weak", "constant"], "correlation", top_n=2)
    assert ml.features[0] == "strong" and len(ml.features) == 2
    ml.select_features(["weak"], "subset")
    assert ml.features == ["weak"]


def test_ml_utils_train_evaluate_distributed(spark):
    """pyspark.ml train/evaluate parity: linearly separable synthetic data →
    near-perfect classification metrics, near-exact regression recovery."""
    from mimic_iv_etl_spark.compat.ml_utils import MLUtils

    df = spark.range(600).select(
        (F.col("id") % 3 * 1.0).alias("x1"),
        (F.rand(seed=7) * 0.1).alias("x2"),
        (F.col("id") % 3 >= 1).cast("int").alias("label"),
        (F.col("id") % 3 * 2.0 + 1.0).alias("y"),
    )
    ml = MLUtils(df)
    ml.set_features(["x1", "x2"])

    ml.set_target("label")
    ml.split_data((0.7, 0.15, 0.15))
    ml.train_classification_model(model_type="linear")
    m = ml.evaluate_classification_model("val")
    assert m["accuracy"] > 0.95 and m["auc_roc"] > 0.95 and m["f1"] > 0.95
    cm = ml.display_confusion_matrix("val").toPandas()
    assert set(cm["label"]) == {0, 1}

    ml2 = MLUtils(df)
    ml2.set_features(["x1"])
    ml2.set_target("y")
    ml2.split_data((0.7, 0.15, 0.15))
    ml2.train_regression_model(model_type="linear")
    r = ml2.evaluate_regression_model("test")
    assert r["r2"] > 0.99 and r["rmse"] < 0.1

    # imbalance: weighted training still learns the minority class
    imb = df.filter((F.col("label") == 0) | (F.col("id") % 11 == 0))
    ml3 = MLUtils(imb)
    ml3.set_features(["x1", "x2"])
    ml3.set_target("label")
    ml3.split_data((0.8, 0.1, 0.1))
    ml3.train_classification_model(class_weight=True, model_type="linear")
    assert ml3.evaluate_classification_model("train")["recall"] > 0.9


def test_bigquery_stub_is_honest(spark):
    with pytest.raises(NotImplementedError):
        bq.get_spark_session(use_local_data=False)
    with pytest.raises(NotImplementedError):
        bq.run_query(spark, "SELECT 1", use_local_data=False)


def test_left_merge_dataframes(spark):
    l = spark.createDataFrame([(1, "a"), (2, "b")], "k int, x string")
    r = spark.createDataFrame([(1, "z")], "k int, y string")
    out = left_merge_dataframes(l, r, ["k"])
    assert out.columns == ["k", "x", "y"] and out.count() == 2


def test_sample_data_generator_flow(spark, tmp_path):
    from mimic_iv_etl_spark.compat import sample_data_generator as sdg

    spark.read.parquet(f"{SF}/orders.parquet").createOrReplaceTempView("orders_v")
    spark.read.parquet(f"{SF}/customer.parquet").createOrReplaceTempView("customer_v")
    keys = sdg.choose_random_sample(spark, 30, dataset="customer_v",
                                    key_column="c_custkey")
    assert 0 < keys.count() <= spark.table("customer_v").count()

    facts = sdg.extract_direct(
        spark, keys.withColumnRenamed("c_custkey", "o_custkey"),
        ["orders_v"], key_column="o_custkey", out_dir=str(tmp_path / "ex"))
    sampled = {r["o_custkey"] for r in keys.withColumnRenamed(
        "c_custkey", "o_custkey").collect()}
    got = {r["o_custkey"] for r in facts["orders_v"].select("o_custkey").distinct().collect()}
    assert got <= sampled and (tmp_path / "ex" / "orders_v").exists()

    dims = sdg.extract_related(
        spark, {"orders_v": ("customer_v", "c_custkey")},
        {"orders_v": facts["orders_v"].withColumnRenamed("o_custkey", "c_custkey")})
    assert dims["customer_v"].count() == facts["orders_v"].select("o_custkey").distinct().count()


def test_query_builder_generate_query_alias(spark):
    from mimic_iv_etl_spark.plans import QueryBuilder

    df = spark.read.parquet(f"{SF}/region.parquet")
    out = QueryBuilder(df, columns=["r_name"]).generate_query(limit=2)
    assert out.columns == ["r_name"] and out.count() == 2

"""Sources/sinks + catalog describe tests."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from mimic_iv_etl_spark.compat.data_insights import describe_dataframe
from mimic_iv_etl_spark.sources import export_data, read_csv_with_schema, sample_extract

SF = "/root/testdata/sf0.001"


def test_csv_roundtrip_with_schema(spark, tmp_path):
    df = spark.read.parquet(f"{SF}/nation.parquet")
    out = str(tmp_path / "nation_csv")
    export_data(df, out, fmt="csv", single_file=True)
    files = glob.glob(os.path.join(out, "*.csv"))
    assert len(files) == 1
    back = read_csv_with_schema(spark, out, df.schema)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_export_compressed_csv(spark, tmp_path):
    df = spark.read.parquet(f"{SF}/region.parquet")
    out = str(tmp_path / "region_bz2")
    export_data(df, out, fmt="csv", compression="bzip2", single_file=True)
    assert glob.glob(os.path.join(out, "*.csv.bz2"))


def test_sample_extract_semi_join(spark):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    out = sample_extract(ev, "user_id", approx_keys=20, seed=42)
    sampled_keys = {r["user_id"] for r in out.select("user_id").distinct().collect()}
    all_rows = ev.join(
        spark.createDataFrame([(k,) for k in sampled_keys], "user_id long"),
        "user_id", "left_semi").count()
    assert out.count() == all_rows  # every row of each sampled key, none else
    assert 0 < len(sampled_keys) <= ev.select("user_id").distinct().count()


def test_describe_dataframe_yaml_shape(spark):
    df = spark.createDataFrame(
        [], T.StructType([
            T.StructField("subject_id", T.IntegerType(), False),
            T.StructField("dod", T.TimestampType(), True),
            T.StructField("note", T.StringType(), True),
        ]))
    d = describe_dataframe(df, "demo")
    assert d["dataset_description"] == "demo"
    assert d["columns"]["subject_id"]["type"] == "int"
    assert d["columns"]["dod"]["type"] == "timestamp|null"
    assert d["columns"]["note"]["type"] == "string|null"

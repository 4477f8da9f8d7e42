"""Extra benchmarks for optimization work (guide §1.4): per-query noop-sink
isolation, explain("formatted") capture, and optional query-subset selection.

NOT part of the driver contract — ``bench.py`` stays frozen. Usage:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        [--queries q1,q2] [--reps 5] [--warmups 2] [--plans plans/r06 --suffix before]

Prints one JSON line with per-query medians/mins, like bench.py's queries
block, and (with --plans) writes <plans>/<query>_<suffix>.txt explain output.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--queries", default=None,
                    help="comma-separated subset (default: bench.py list)")
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--warmups", type=int, default=2)
    ap.add_argument("--plans", default=None,
                    help="directory to write explain('formatted') files into")
    ap.add_argument("--suffix", default="before",
                    help="plan file suffix: <query>_<suffix>.txt")
    args = ap.parse_args()

    from bench import BENCH_QUERIES
    from mimic_iv_etl_spark import registry
    from mimic_iv_etl_spark.session import get_spark_session

    names = args.queries.split(",") if args.queries else list(BENCH_QUERIES)

    spark = get_spark_session(
        app_name="bench_extra",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    qtimes: dict[str, float] = {}
    qmins: dict[str, float] = {}
    qsamples: dict[str, list[float]] = {}
    for name in names:
        fn = registry.REGISTRY[name].fn
        if args.plans:
            plan = fn(spark, SF_DIR)._sc._jvm.PythonSQLUtils.explainString(
                fn(spark, SF_DIR)._jdf.queryExecution(), "formatted")
            with open(os.path.join(args.plans, f"{name}_{args.suffix}.txt"),
                      "w") as f:
                f.write(plan)
        spark.sparkContext.setJobDescription(f"warmup: {name}")
        for _ in range(args.warmups):
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        reps = []
        for i in range(args.reps):
            spark.sparkContext.setJobDescription(f"timed[{i}]: {name}")
            t0 = time.monotonic()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            reps.append(round(time.monotonic() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        qtimes[name] = round(statistics.median(reps), 4)
        qmins[name] = round(min(reps), 4)
        qsamples[name] = reps
        print(f"# {name}: median={qtimes[name]} min={qmins[name]} reps={reps}",
              file=sys.stderr)

    print(json.dumps({"queries": qtimes, "queries_min": qmins,
                      "queries_samples": qsamples,
                      "sf_dir": SF_DIR, "cpus": CPUS}))


if __name__ == "__main__":
    main()

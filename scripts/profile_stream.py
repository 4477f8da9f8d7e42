"""Decompose the per-micro-batch cost of streaming ingest (VERDICT r04
item 5): for each trigger, how much wall goes to the engine's apply work
(``apply_batch`` — further split by SPARK_GRAFT_PROFILE phases) vs Spark's
trigger machinery (micro-batch planning, offset/commit WAL writes, task
scheduling) that the engine does not own.

Method: ``on_batch`` records a monotonic timestamp + the engine's own
``stats['seconds']`` per epoch; the gap between consecutive epoch ends minus
the engine seconds is the trigger overhead. Runs the bench-scale log at the
bench's maxFilesPerTrigger (16 → 2 batches/tranche) and at half (8 → 4
batches/tranche, i.e. 2× the micro-batch count) to expose the fixed cost.

Usage: SPARK_GRAFT_PROFILE=1 python scripts/profile_stream.py [files_per_trigger ...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    from pyspark.sql import types as T

    from mimic_iv_etl_spark.cdc.changelog import ChangeLogSpec, generate_change_log
    from mimic_iv_etl_spark.cdc.replay import replay_log
    from mimic_iv_etl_spark.cdc.stream import stream_log
    from mimic_iv_etl_spark.session import get_spark_session

    n_events = 2_400_000
    log_dir = os.path.join(tempfile.gettempdir(), f"bench_cdc_log_{n_events}_f{CPUS}")
    if not os.path.exists(os.path.join(log_dir, "manifest.json")):
        generate_change_log(log_dir, ChangeLogSpec(
            n_events=n_events, n_convs=n_events // 20, n_partitions=8,
            seed=42, payload=False, files_per_tranche=CPUS))
    schema = T.StructType([
        T.StructField("conv_id", T.StringType(), False),
        T.StructField("turn_idx", T.IntegerType(), False),
        T.StructField("role", T.StringType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("tool", T.StringType(), True),
        T.StructField("ts", T.TimestampNTZType(), False),
    ])
    spark = get_spark_session(app_name="profile_stream",
                              master=f"local[{CPUS}]", shuffle_partitions=CPUS)

    fpts = [int(a) for a in sys.argv[1:]] or [CPUS // 2, CPUS // 4]
    report = {}
    for fpt in fpts:
        for rep in range(2):  # first rep warms JIT/codegen; report the second
            from mimic_iv_etl_spark.cdc import profiling

            profiling.reset()
            events = []
            t_start = time.monotonic()

            def on_batch(epoch_id, stats, _ev=events):
                _ev.append((time.monotonic(), epoch_id, stats["seconds"],
                            stats["events_applied"],
                            dict(profiling.PHASES)))
                profiling.reset()

            s_table = os.path.join(tempfile.gettempdir(), f"prof_stbl_{os.getpid()}")
            s_ckpt = os.path.join(tempfile.gettempdir(), f"prof_sckpt_{os.getpid()}")
            shutil.rmtree(s_table, ignore_errors=True)
            shutil.rmtree(s_ckpt, ignore_errors=True)
            stream_log(spark, log_dir, s_table, s_ckpt, schema=schema,
                       n_buckets=CPUS, max_files_per_trigger=fpt,
                       on_batch=on_batch)
            t_total = time.monotonic() - t_start
        batches = []
        prev = t_start
        for ts, epoch, apply_s, ev, phases in events:
            batches.append({"epoch": epoch, "wall": round(ts - prev, 3),
                            "apply": round(apply_s, 3),
                            "trigger_overhead": round(ts - prev - apply_s, 3),
                            "events": ev,
                            "phases": {k: round(v, 3)
                                       for k, v in phases.items()}})
            prev = ts
        tail = time.monotonic  # noqa: avoid unused warning pattern
        report[f"files_per_trigger={fpt}"] = {
            "total_wall": round(t_total, 3),
            "n_batches": len(batches),
            "sum_apply": round(sum(b["apply"] for b in batches), 3),
            "sum_trigger_overhead": round(
                sum(b["trigger_overhead"] for b in batches), 3),
            "post_last_batch": round(t_total - (events[-1][0] - t_start), 3),
            "batches": batches,
        }
        shutil.rmtree(s_table, ignore_errors=True)
        shutil.rmtree(s_ckpt, ignore_errors=True)

    # batch-replay reference at the same scale
    b_table = os.path.join(tempfile.gettempdir(), f"prof_btbl_{os.getpid()}")
    best = None
    for rep in range(2):
        shutil.rmtree(b_table, ignore_errors=True)
        out = replay_log(spark, log_dir, b_table, schema=schema,
                         batch_offsets=max(50_000, n_events // 8), n_buckets=CPUS)
        if best is None or out["seconds"] < best:
            best = out["seconds"]
    shutil.rmtree(b_table, ignore_errors=True)
    report["batch_replay_seconds"] = round(best, 3)
    print("PROFILE " + json.dumps(report))


if __name__ == "__main__":
    main()

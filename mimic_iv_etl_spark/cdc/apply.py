"""Batch apply: change events → LakeTable, exactly-once, schema-evolving.

This is the engine's MERGE kernel, run per micro-batch (from the replay loop
or Structured Streaming ``foreachBatch``). Dataflow per batch:

1. **Exactly-once filter** — drop events whose ``(partition, offset)`` is at
   or below the table's committed ``applied_offsets`` (snapshot summary). A
   replayed/duplicated batch reduces to a metadata-only no-op commit, so
   foreachBatch retries and checkpoint restarts are idempotent.
2. **Schema evolution** — merge the batch's data schema into the table schema
   (union-by-name, int→long/float→double widening) *before* apply
   (SURVEY.md §4.3 item 5).
3. **LWW dedup** — one winner per ``(conv_id, turn_idx)`` by
   ``(ts, offset, partition)``. Default on dense-manifest logs: the
   ``locator`` kernel (packed-stamp HashAggregate + exact bitmap fetch — no
   sort, no wide shuffle; :func:`_locator_winners`). Fallbacks: skew-proof
   ``max_by`` partial aggregation (reference precedent:
   latest-record-per-key, ``feature_engineering.py:238-240``) and the
   bucket-fused single-shuffle variant (``dedup_mode='bucket'``).
4. **Commit** — winners land as merge-on-read delta files (O(batch) IO),
   snapshot tagged with the updated applied-offset map; lineage rows
   (batch × source partition × offset range) and a throughput metrics row are
   appended.

Offset-range bookkeeping, cheapest first:

- ``manifest_ranges`` — the log's manifest declares DENSE per-partition offset
  ranges (the WAL contract: offsets are a gapless per-partition sequence), so
  the applied ranges are pure window arithmetic: ZERO runtime aggregation,
  no extra Spark action, and a fully-stale batch skips without any scan.
  The manifest is verified, not blindly trusted: two Observation counters
  ride the batch's first job and any row outside the declared ranges — or a
  count short of what the manifest claims — aborts before commit
  (``validate_manifest``; measured cost: a few percent).
- ``source_partitions`` — the universe of partition ids is known but ranges
  are not: per-partition (count, min, max) ride the write job as
  ``Observation`` metrics — one Spark action per batch.
- neither — a fallback ≤P-row aggregate runs first.

Either way the driver never sees data rows (contrast: the reference collects
key lists to the driver, ``ml_readmission_risk.ipynb`` cells 14/21/31,
SURVEY.md §2.12).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic_iv_etl_spark.cdc.metrics import append_lineage, append_metrics
from mimic_iv_etl_spark.cdc.profiling import phase
from mimic_iv_etl_spark.lake.merge import (PACK_MAX_OFFSET, PACK_MAX_PARTITION,
                                           lww_bucket_fused, lww_reduce,
                                           lww_winner_locators)
from mimic_iv_etl_spark.lake.schema import merge_schemas, schemas_equal
from mimic_iv_etl_spark.lake.table import BUCKET_COL, LakeTable

META_COLS = ("op", "offset", "partition", "payload")

# above this many committed partitions the literal hwm predicate stops being
# a win over a broadcast-join filter (expression size, codegen limits)
_HWM_PREDICATE_CAP = 64

_OBS_LOCK_GUARD = __import__("threading").Lock()


def _obs_session_lock(spark):
    """Per-SparkSession mutex serializing the Observation-bearing section of
    a batch (observe → write job → get → scrub). The Spark 4.1.x scrub
    (session.scrub_observation_manager) tears down the session-global
    ObservationManager, so a concurrent applier's pending ``Observation.get``
    on the SAME session would block forever once another batch scrubs
    (measured: multi-source fan-in deadlock). Sessions are the isolation
    unit — ``spark.newSession()`` has its own ObservationManager, so giving
    each ingest stream its own session keeps fan-in fully parallel; sharing
    one session serializes the observed region (correct, alternating
    batches)."""
    import threading

    with _OBS_LOCK_GUARD:
        lk = getattr(spark, "_cdc_obs_lock", None)
        if lk is None:
            lk = threading.Lock()
            spark._cdc_obs_lock = lk
        return lk


def _locator_supported(ranges: list[dict]) -> bool:
    """Whether the packed-stamp locator kernel's bit budget covers this
    batch's offset/partition coordinates (offset < 2^36, partition < 2^16).
    No partition-count cap: the bitmap probe indexes per-partition
    ``(lo, hi, base)`` lookup ARRAYS broadcast with the bitmap (``F.get``,
    pure codegen), not a chained ``when()`` per partition — a Kafka-style
    log with hundreds of source partitions stays on the fast path."""
    return bool(ranges) and all(
        0 <= r["partition"] < PACK_MAX_PARTITION
        and 0 <= r["min_offset"]
        and r["max_offset"] < PACK_MAX_OFFSET
        for r in ranges
    )


def _locator_winners(candidates: DataFrame, key_cols: list[str],
                     ranges: list[dict], table_path: str):
    """LWW winners WITHOUT a wide aggregate or a wide shuffle — returns
    ``(winners_df, cleanup_fn)``; call ``cleanup_fn()`` once the job that
    consumes ``winners_df`` has run.

    1. Winner locators ``(partition, offset)`` per key via the packed-stamp
       HashAggregate (`lake/merge.py::lww_winner_locators`) — the scan is
       column-pruned to keys+stamp, payloads never leave their scan.
    2. The locators land driver-side as one Arrow transfer — O(winners per
       batch), bounded by ``batch_offsets``, the same order of driver traffic
       as any broadcast-join build (this is the one deliberate driver
       round-trip in the apply path).
    3. Because the WAL contract makes per-partition offsets DENSE, the
       locator set becomes an EXACT bitmap (1 bit per in-window offset — no
       hashing, no false positives). The bitmap — plus per-partition
       ``(lo, hi, base)`` lookup arrays indexed by partition id — ships as a
       1-row ``array<bigint>`` parquet under the table's ``_staging`` dir
       (shared storage, so cluster executors can read it), broadcast onto
       the wide scan, and probed with ``F.get`` + ``element_at`` +
       ``getbit`` — a PURE-JVM codegen'd filter whose expression size is
       CONSTANT in the partition count (the first cut chained one ``when()``
       per partition, which hit codegen limits past 64 partitions and forced
       a fallback to the SortAggregate kernel — the array lookup removes
       that cap, so Kafka-style logs with hundreds of partitions stay on
       the fast path). An earlier cut probed via a pandas UDF; that queued
       every wide row behind the Python round-trip (ArrowEvalPython row
       queue) and stage metrics showed 58% of executor time in GC — the JVM
       probe removes Python from the wide path entirely, so only winner
       rows ever reach the decode/normalize UDFs.
    4. The filter passes exactly one row per key, so no further reduce runs.

    Driver memory peak ≈ winner locators (16 B/winner Arrow transfer) +
    the PACKED bitmap (window_bits/8 — built packed via ``bitwise_or.at``,
    never unpacked to byte-per-bit) + 3 lookup arrays (≤ 8 B × 2^16 each)
    — the quantity ``apply_batch`` pre-checks against
    ``locator_driver_budget``.
    """
    import shutil
    import uuid

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    with phase("locator_collect"):
        pdf = lww_winner_locators(candidates, key_cols).toPandas()
        if len(pdf) and pdf[["p", "o"]].isna().any().any():
            # a NULL (partition, offset) stamp violates the WAL contract the
            # dense-offset arithmetic rests on; indexing with NaN would raise
            # an opaque IndexError below — fail loudly instead
            raise RuntimeError(
                "locator kernel: winner rows with NULL (partition, offset) — "
                "the change log violates the WAL stamp contract")
        by_p = {}
        total_bits = 0
        for r in sorted(ranges, key=lambda r: r["partition"]):
            by_p[r["partition"]] = (r["min_offset"], r["max_offset"], total_bits)
            total_bits += r["max_offset"] - r["min_offset"] + 1
        max_p = max(by_p)
        lo_arr = np.zeros(max_p + 1, dtype=np.int64)
        hi_arr = np.full(max_p + 1, -1, dtype=np.int64)
        base_arr = np.zeros(max_p + 1, dtype=np.int64)
        for p, (lo, hi, b) in by_p.items():
            lo_arr[p], hi_arr[p], base_arr[p] = lo, hi, b
        pi = pdf["p"].to_numpy()
        oi = pdf["o"].to_numpy()
        # free driver-side half of the manifest cross-check: a winner outside
        # the declared (partition, offset) ranges proves the batch holds rows
        # the manifest doesn't claim — abort before any write
        pc = np.clip(pi, 0, max_p)
        bad = (pi < 0) | (pi > max_p) | (oi < lo_arr[pc]) | (oi > hi_arr[pc])
        if bad.any():
            raise RuntimeError(
                f"manifest_ranges cross-check failed — {int(bad.sum())} LWW "
                "winners land outside the declared per-partition offset "
                "ranges; committing would desync applied_offsets from the "
                "actually-applied events")
        # build the bitmap PACKED (uint64 words) — peak memory window_bits/8,
        # matching the pre-flight budget; a byte-per-bit intermediate would
        # transiently cost 8× the budgeted size. Winner (p, o) pairs are
        # distinct rows, so indices are unique; bitwise_or.at handles the
        # many-bits-per-word collisions an unbuffered |= cannot.
        gidx = base_arr[pi] + (oi - lo_arr[pi])
        words_arr = np.zeros((total_bits + 63) // 64, dtype=np.uint64)
        np.bitwise_or.at(words_arr, gidx >> 6,
                         np.uint64(1) << (gidx & 63).astype(np.uint64))
        words = words_arr.view(np.int64)

        stage_dir = os.path.join(table_path, "_staging",
                                 f"lww-bitmap-{uuid.uuid4().hex}")
        os.makedirs(stage_dir, exist_ok=True)
        try:
            bm_path = os.path.join(stage_dir, "bitmap.parquet")
            pq.write_table(
                pa.table({
                    "_bm": pa.array([words], type=pa.list_(pa.int64())),
                    "_lo": pa.array([lo_arr], type=pa.list_(pa.int64())),
                    "_hi": pa.array([hi_arr], type=pa.list_(pa.int64())),
                    "_base": pa.array([base_arr], type=pa.list_(pa.int64())),
                }),
                bm_path)
        except BaseException:
            shutil.rmtree(stage_dir, ignore_errors=True)
            raise

    spark = candidates.sparkSession
    with phase("locator_probe_build"):
        # explicit schema (skips footer-based inference: 109→18 ms measured)
        bm = spark.read.schema(
            "_bm array<bigint>, _lo array<bigint>, _hi array<bigint>, "
            "_base array<bigint>").parquet(bm_path)
        # partition-count-independent probe, built as ONE server-side-parsed
        # SQL expression (chained Column ops cost ~2 ms of Py4J per call —
        # a real slice of the per-micro-batch fixed cost). Semantics:
        # `get` is 0-based and yields NULL for out-of-range/NULL indices, so
        # unknown partitions fail the lo/hi bounds without any ANSI error
        # (hi defaults to -1 for in-array but undeclared partitions);
        # try_element_at (not element_at) so a corrupt batch's out-of-window
        # bit index yields NULL→false instead of an ANSI index error if the
        # optimizer ever reorders the conjuncts. AND short-circuits left to
        # right, so the bit probe only runs on rows inside the window.
        gidx = ("(_lww_offset + (get(_base, _lww_partition)"
                " - get(_lo, _lww_partition)))")
        probe = F.expr(
            "get(_lo, _lww_partition) IS NOT NULL"
            " AND _lww_offset >= get(_lo, _lww_partition)"
            " AND _lww_offset <= get(_hi, _lww_partition)"
            f" AND getbit(try_element_at(_bm, CAST(shiftright({gidx}, 6)"
            f" AS int) + 1), pmod({gidx}, 64)) = 1")
        winners = (candidates.crossJoin(F.broadcast(bm))
                   .filter(probe)
                   .drop("_bm", "_lo", "_hi", "_base"))
    return winners, lambda: shutil.rmtree(stage_dir, ignore_errors=True)


def _hwm_filter(batch_df: DataFrame, applied: dict[int, int]) -> DataFrame:
    """Exactly-once row filter: keep events strictly beyond the committed
    per-partition high-water marks. For a bounded partition count this is a
    literal codegen'd predicate (no broadcast, no join stage); beyond the cap
    it falls back to a broadcast-joined lookup."""
    if not applied:
        return batch_df
    if len(applied) <= _HWM_PREDICATE_CAP:
        # one F.expr over a server-side-parsed SQL string, not a chain of
        # Column operators: each Column op is a Py4J round-trip, and at ~2 ms
        # per call the chained build cost ~240 ms of driver wall PER
        # MICRO-BATCH (measured — the dominant slice of the per-trigger
        # fixed cost the round-4 stream bench flagged)
        pred = " OR ".join(
            f"(partition = {int(p)} AND offset > {int(o)})"
            for p, o in sorted(applied.items()))
        members = " OR ".join(
            f"partition = {int(p)}" for p in sorted(applied))
        # events from partitions with no committed hwm are always fresh; a
        # NULL partition must be kept too (pred / NOT members are NULL for
        # it, and the broadcast-join path below keeps such rows via
        # coalesce(_hwm,-1) — the two paths must agree) so the downstream
        # unknown-partition guards see and reject it instead of it silently
        # vanishing here
        return batch_df.filter(F.expr(
            f"({pred}) OR NOT ({members}) OR partition IS NULL"))
    rows = [(int(p), int(o)) for p, o in applied.items()]
    hwm = batch_df.sparkSession.createDataFrame(rows, "partition int, _hwm long")
    return (
        batch_df.join(F.broadcast(hwm), "partition", "left")
        .filter(F.col("offset") > F.coalesce(F.col("_hwm"), F.lit(-1)))
        .drop("_hwm")
    )


def apply_batch(
    table: LakeTable,
    batch_df: DataFrame,
    batch_id: int,
    dedup_mode: str = "agg",
    commit_noop: bool = False,
    write_salt: int = 1,
    cache_batch: bool = False,
    decode_payload: bool = False,
    normalize: bool = False,
    source_partitions: list[int] | None = None,
    manifest_ranges: dict[int, tuple[int, int]] | None = None,
    validate_manifest: bool = True,
    locator_driver_budget: int = 512 << 20,
    log_tail: dict[int, int] | None = None,
) -> dict:
    """Apply one micro-batch of change events to ``table``. Returns stats.

    A fully-stale batch (every event at or below the committed high-water
    marks — duplicate delivery / replay after restart) applies nothing; with
    ``commit_noop=True`` it still writes a metadata-only snapshot carrying the
    batch id (epoch audit trail), otherwise the table is left untouched.

    ``decode_payload=True`` decodes the JSON ``payload`` column into
    role/text/tool **after** LWW dedup — the winner per key is chosen by
    ``(ts, offset, partition)`` alone, so decoding losers is pure waste. At a
    typical change-log update ratio (≥10 events/key) this removes >90% of the
    JSON-parse work, which is the apply path's dominant CPU (and its worst
    scaler: allocation-heavy parsing contends at high core counts).
    ``normalize=True`` likewise NFC-normalizes winner text only.

    ``dedup_mode='locator'`` (requires ``manifest_ranges``) determines each
    key's winning row by a narrow packed-stamp HashAggregate and then fetches
    exactly those rows through an exact dense-offset bitmap probe — no sort,
    no wide aggregate, no payload bytes on any shuffle (see
    :func:`_locator_winners`). Falls back to ``'agg'`` when the manifest
    ranges are absent or exceed the packed stamp's bit budget.

    ``dedup_mode='bucket'`` fuses LWW dedup onto a bucket-aligned shuffle:
    candidates are hash-partitioned once by the table's bucket expression
    (plus a key-derived salt when ``write_salt > 1`` — hot-conversation
    splitting), the per-key ``max_by`` runs in-partition with no further
    exchange, and winners land in the writer ALREADY partitioned — exactly
    ONE wide shuffle per batch instead of two.

    ``manifest_ranges`` — per-source-partition ``(min, max)`` offset ranges
    present in ``batch_df``, DENSE per the WAL contract (gapless per-partition
    sequences; ``changelog.py`` stamps ``dense_offsets: true``). With it the
    exactly-once bookkeeping is window arithmetic: no Observation, no extra
    aggregate, and a fully-stale batch is skipped without reading any data.

    ``source_partitions`` (the universe of source-partition ids, no ranges)
    switches the bookkeeping to ``Observation`` metrics collected DURING the
    write job — still exactly one Spark action per batch. A batch containing
    a partition outside the list aborts before commit (staged files are
    discarded) — silently applying it would leave the offset high-water mark
    unrecorded and break exactly-once on redelivery.

    ``validate_manifest`` (default True): the manifest-arithmetic path fully
    trusts ``manifest_ranges`` — a batch holding rows OUTSIDE the declared
    ranges (unknown partition, NULL partition, offset past the declared hi)
    or MISSING rows the manifest claims (truncated/corrupt file) would
    otherwise advance ``applied_offsets`` past never-applied events: silent
    data loss. With validation on, two counters (rows total / rows outside
    the declared ranges) ride the batch's first job as ``Observation``
    metrics and are cross-checked against the arithmetic ``events_applied``
    before commit; any mismatch aborts with staged files discarded —
    mirroring the ``source_partitions`` guard. Skipped (with the same loud
    fallback as the scrub guard) on Spark versions where the Observation
    scrub is unavailable.

    ``locator_driver_budget`` bounds the locator kernel's one deliberate
    driver round-trip (winner locators + offset bitmap). The pre-flight
    bound ``events_in_window × 16B + window_bits / 8`` is checked against
    it; a batch over budget (misconfigured huge ``batch_offsets``) degrades
    to ``dedup_mode='agg'`` instead of OOMing the driver.

    ``log_tail`` — per-source-partition FINAL offset of the log being
    consumed (replay: from the manifest; a live tail: the broker's
    end-offsets). With it the per-batch metrics row carries ``lag_events``
    = Σ max(0, tail_p − applied_hwm_p): the events still unconsumed after
    this commit — the backlog metric the north star's "throughput/lag
    metrics" asks for. Pure driver arithmetic, no extra work."""

    def _lag(applied_map) -> int | None:
        if log_tail is None:
            return None
        amap = {int(k): int(v) for k, v in applied_map.items()}
        return sum(
            max(0, int(hi) - amap.get(int(p), -1))
            for p, hi in log_tail.items()
        )
    t0 = time.monotonic()
    spark = table.spark

    _prelude_t0 = time.monotonic()
    late_decode = decode_payload and "payload" in batch_df.columns
    data_fields = [f for f in batch_df.schema.fields if f.name not in META_COLS]
    if late_decode:
        # decoded columns materialize post-dedup; declare them in the batch
        # schema so evolution/merge sees the final shape
        from mimic_iv_etl_spark.functions.textfns import PAYLOAD_SCHEMA

        have = {f.name for f in data_fields}
        data_fields += [f for f in PAYLOAD_SCHEMA.fields if f.name not in have]
    batch_data_schema = type(table.schema)(data_fields)
    merged = merge_schemas(table.schema, batch_data_schema)
    evolved = not schemas_equal(merged, table.schema)

    applied = table.applied_offsets

    def _skipped_stats() -> dict:
        if commit_noop:
            table.commit_summary({"batch_id": batch_id, "operation": "noop_batch"})
        stats = {
            "batch_id": batch_id,
            "events_in": 0,
            "events_applied": 0,
            "winners": 0,
            "seconds": time.monotonic() - t0,
            "events_per_sec": 0.0,
            "touched_buckets": 0,
            "skipped": True,
            "snapshot_version": table.version,
            "lag_events": _lag(applied),
            "dedup_mode": None,
        }
        append_metrics(table.path, stats)
        return stats

    obs = None
    obs_lock = None  # held from observe() through the post-commit scrub
    ranges: list[dict] | None = None
    events_applied: int | None = None
    new_applied: dict[str, int] | None = None

    if manifest_ranges is not None:
        # -- dense-offset arithmetic: applied range = window ∩ (hwm, ...] --
        ranges = []
        for p, (lo, hi) in sorted(manifest_ranges.items()):
            lo = max(int(lo), applied.get(int(p), -1) + 1)
            if lo <= int(hi):
                ranges.append({"partition": int(p), "events": int(hi) - lo + 1,
                               "min_offset": lo, "max_offset": int(hi)})
        events_applied = sum(r["events"] for r in ranges)
        if events_applied == 0:
            return _skipped_stats()  # no scan, no job — resume is metadata-only
        new_applied = {str(p): o for p, o in applied.items()}
        for r in ranges:
            p = str(r["partition"])
            new_applied[p] = max(int(new_applied.get(p, -1)), int(r["max_offset"]))

    # -- exactly-once: keep only offsets beyond the committed high-water mark --
    fresh = _hwm_filter(batch_df, applied)

    # Optional: cache the filtered batch so the range aggregate and the
    # dedup+write job share one source scan. Usually unnecessary — the ranges
    # job reads only (offset, partition) after column pruning, so the second
    # scan is cheap — and at high core counts cache materialization costs
    # more than it saves (measured). MEMORY_AND_DISK so oversized batches
    # spill instead of OOMing.
    cached = None
    if cache_batch:
        from pyspark import StorageLevel

        fresh = cached = fresh.persist(StorageLevel.MEMORY_AND_DISK)

    from mimic_iv_etl_spark.session import observation_scrub_available

    # ONE try/finally covers everything from (potential) lock acquisition
    # through commit: the locator staging dir and the Observation
    # session-poisoning scrub (Spark 4.1.x ObservationManager serialization
    # bug — see session.scrub_observation_manager) must be cleaned up on
    # EVERY exit — including a locator abort (manifest cross-check,
    # NULL-stamp guard) or any Spark error — or later jobs capturing the
    # session fail with NotSerializableException and _staging/lww-bitmap-*
    # dirs leak (ADVICE r04). The obs session lock is acquired INSIDE the
    # try: the old structure acquired it before the protected region, so a
    # Py4J/analysis error while building the observe or candidate plans
    # leaked the lock and permanently deadlocked every later
    # Observation-bearing batch on the session (ADVICE r05). Batches are
    # sequential on a session, so no other observation is in flight when
    # the scrub runs.
    obs_val = None
    locator_cleanup = None
    pre_partitioned = dedup_mode == "bucket"
    try:
        if (manifest_ranges is not None and validate_manifest
                and observation_scrub_available()):
            # -- manifest cross-check: counters ride the batch's first job --
            import uuid

            from pyspark.sql import Observation

            drop_rng = ()
            if len(ranges) <= _HWM_PREDICATE_CAP:
                # single-expr SQL build for the same Py4J-chatter reason as
                # _hwm_filter (measured ~230 ms/batch as chained Columns)
                known = F.expr(" OR ".join(
                    f"(partition = {int(r['partition'])} AND offset BETWEEN "
                    f"{int(r['min_offset'])} AND {int(r['max_offset'])})"
                    for r in ranges))
            else:
                # beyond the chained-predicate cap the range check rides a
                # broadcast-joined (partition → lo, hi) lookup instead of
                # degrading to membership-only — a corrupt batch whose
                # out-of-range offsets in declared partitions numerically
                # cancel missing in-range rows would pass a membership+count
                # check but is caught here (ADVICE r04); same shape as
                # _hwm_filter's fallback, one broadcast-hash-join stage on
                # the batch's first job
                rng = spark.createDataFrame(
                    [(int(r["partition"]), int(r["min_offset"]),
                      int(r["max_offset"])) for r in ranges],
                    "partition int, _rlo long, _rhi long")
                fresh = fresh.join(F.broadcast(rng), "partition", "left")
                known = (F.col("_rlo").isNotNull()
                         & (F.col("offset") >= F.col("_rlo"))
                         & (F.col("offset") <= F.col("_rhi")))
                drop_rng = ("_rlo", "_rhi")
            obs_lock = _obs_session_lock(spark)
            obs_lock.acquire()
            obs_val = Observation(f"validate_manifest_{uuid.uuid4().hex[:8]}")
            fresh = fresh.observe(
                obs_val,
                F.count(F.lit(1)).alias("n_total"),
                F.count(F.when(F.col("partition").isNull() | ~known, True))
                .alias("n_unknown"),
            )
            if drop_rng:
                fresh = fresh.drop(*drop_rng)

        if (manifest_ranges is None and source_partitions is not None
                and observation_scrub_available()):
            # per-partition ranges observed during the write job — no extra
            # action
            import uuid

            from pyspark.sql import Observation

            obs_lock = _obs_session_lock(spark)
            obs_lock.acquire()
            obs = Observation(f"apply_ranges_{uuid.uuid4().hex[:8]}")
            # NULL partitions must count as unknown too: `~isin` alone
            # evaluates to NULL for them, silently exempting such rows from
            # the guard
            aggs = [F.count(F.when(
                F.col("partition").isNull()
                | ~F.col("partition").isin([int(p) for p in source_partitions]),
                True
            )).alias("n_unknown")]
            for p in source_partitions:
                cond = F.col("partition") == int(p)
                aggs += [
                    F.count(F.when(cond, True)).alias(f"n_{p}"),
                    F.min(F.when(cond, F.col("offset"))).alias(f"lo_{p}"),
                    F.max(F.when(cond, F.col("offset"))).alias(f"hi_{p}"),
                ]
            fresh = fresh.observe(obs, *aggs)
        elif manifest_ranges is None:
            # the single driver-side aggregate: per-source-partition ranges
            # (≤P rows)
            with phase("ranges_aggregate"):
                collected = (
                    fresh.groupBy("partition")
                    .agg(
                        F.count("*").alias("events"),
                        F.min("offset").alias("min_offset"),
                        F.max("offset").alias("max_offset"),
                    )
                    .collect()
                )
            ranges = [{"partition": int(r["partition"]),
                       "events": int(r["events"]),
                       "min_offset": int(r["min_offset"]),
                       "max_offset": int(r["max_offset"])} for r in collected]
            events_applied = sum(r["events"] for r in ranges)
            if events_applied == 0:
                if cached is not None:
                    cached.unpersist()
                return _skipped_stats()
            new_applied = {str(p): o for p, o in applied.items()}
            for r in ranges:
                p = str(r["partition"])
                new_applied[p] = max(int(new_applied.get(p, -1)),
                                     int(r["max_offset"]))

        # -- internal candidate rows: data cols aligned to merged schema +
        # stamps (selectExpr over SQL strings — one Py4J call instead of ~5
        # per column)
        have = set(batch_df.columns)
        decode_names = {"role", "text", "tool"} if late_decode else set()
        data_exprs = [
            (f"CAST(`{f.name}` AS {f.dataType.simpleString()}) AS `{f.name}`"
             if f.name in have
             else f"CAST(NULL AS {f.dataType.simpleString()}) AS `{f.name}`")
            for f in merged.fields
            if f.name not in decode_names
        ]
        if late_decode:
            data_exprs.append("`payload`")
        candidates = fresh.selectExpr(
            *data_exprs,
            "(op = 'D') AS _deleted",
            "CAST(offset AS bigint) AS _lww_offset",
            "CAST(partition AS int) AS _lww_partition",
        )
        # driver-side plan construction up to this point (schema merge, hwm
        # filter, validation observe, candidate projection) — pure
        # Py4J/analysis work, no Spark job; a per-micro-batch fixed cost
        # worth watching
        from mimic_iv_etl_spark.cdc.profiling import record as _record

        _record("plan_prelude", time.monotonic() - _prelude_t0)

        if dedup_mode == "locator":
            # locator needs the dense-manifest arithmetic ranges, the packed
            # stamp's bit budget, and a bounded driver transfer; outside
            # them the classic kernel is the answer
            usable = (manifest_ranges is not None and ranges
                      and _locator_supported(ranges))
            if usable:
                window_bits = sum(
                    r["max_offset"] - r["min_offset"] + 1 for r in ranges)
                # winners ≤ events in the window → events_applied × 16B
                # bounds the locator Arrow transfer; window_bits/8 is the
                # exact bitmap
                if (events_applied * 16 + window_bits // 8
                        > locator_driver_budget):
                    usable = False
            if not usable:
                dedup_mode = "agg"

        if pre_partitioned:
            # bucket computed BEFORE the (single) shuffle so the LWW agg and
            # the partitioned write share one exchange
            candidates = candidates.withColumn(BUCKET_COL, table.bucket_expr())
            winners = lww_bucket_fused(
                candidates, table.key_cols, bucket_col=BUCKET_COL,
                num_buckets=table.n_buckets, salt=write_salt,
            )
        elif dedup_mode == "locator":
            winners, locator_cleanup = _locator_winners(
                candidates, table.key_cols, ranges, table.path)
        else:
            winners = lww_reduce(candidates, table.key_cols, mode=dedup_mode)
        _wplan_t0 = time.monotonic()
        if late_decode:
            from mimic_iv_etl_spark.functions.textfns import decode_payload_json

            winners = (
                decode_payload_json(winners)
                .withColumnRenamed("role_decoded", "role")
                .withColumnRenamed("text_decoded", "text")
                .withColumnRenamed("tool_decoded", "tool")
                .drop("payload")
            )
        if normalize and "text" in winners.columns:
            from mimic_iv_etl_spark.functions.textfns import normalize_text

            winners = winners.withColumn("text", normalize_text(F.col("text")))
        if not pre_partitioned:
            winners = winners.withColumn(BUCKET_COL, table.bucket_expr())
        _record("winners_plan", time.monotonic() - _wplan_t0)

        if obs is not None:
            with phase("append_delta"):
                entries, schema_id, schemas = table.stage_delta(
                    winners, new_schema=merged if evolved else None,
                    write_salt=write_salt, pre_partitioned=pre_partitioned)
                m = obs.get  # blocks on the write job just run
                if m["n_unknown"]:
                    table.discard_staged(entries)
                    raise RuntimeError(
                        f"batch {batch_id} holds {m['n_unknown']} events from "
                        f"partitions outside source_partitions={source_partitions}"
                        " — offset bookkeeping would miss them")
                ranges = [
                    {"partition": int(p), "events": int(m[f"n_{p}"]),
                     "min_offset": int(m[f"lo_{p}"]), "max_offset": int(m[f"hi_{p}"])}
                    for p in source_partitions if m[f"n_{p}"]
                ]
                events_applied = sum(r["events"] for r in ranges)
                if events_applied == 0:
                    table.discard_staged(entries)
                    if cached is not None:
                        cached.unpersist()
                    return _skipped_stats()
                new_applied = {str(p): o for p, o in applied.items()}
                for r in ranges:
                    p = str(r["partition"])
                    new_applied[p] = max(int(new_applied.get(p, -1)),
                                         int(r["max_offset"]))
                table.commit_delta(
                    entries, schema_id, schemas,
                    summary={"applied_offsets": new_applied, "batch_id": batch_id})
        elif obs_val is not None:
            with phase("append_delta"):
                entries, schema_id, schemas = table.stage_delta(
                    winners, new_schema=merged if evolved else None,
                    write_salt=write_salt, pre_partitioned=pre_partitioned)
                m = obs_val.get  # resolved by the batch's first job
                if m["n_unknown"] or int(m["n_total"]) != int(events_applied):
                    table.discard_staged(entries)
                    raise RuntimeError(
                        f"batch {batch_id}: manifest_ranges cross-check failed "
                        f"— {m['n_unknown']} events outside the declared "
                        f"ranges, {m['n_total']} present vs {events_applied} "
                        "declared; committing would desync applied_offsets "
                        "from the actually-applied events")
                table.commit_delta(
                    entries, schema_id, schemas,
                    summary={"applied_offsets": new_applied,
                             "batch_id": batch_id})
        else:
            with phase("append_delta"):
                table.append_delta(
                    winners,
                    new_schema=merged if evolved else None,
                    summary={"applied_offsets": new_applied, "batch_id": batch_id},
                    write_salt=write_salt,
                    pre_partitioned=pre_partitioned,
                )
    finally:
        if locator_cleanup is not None:
            locator_cleanup()
        try:
            if obs is not None or obs_val is not None:
                from mimic_iv_etl_spark.session import scrub_observation_manager

                with phase("observation_scrub"):
                    scrub_observation_manager(spark)
        finally:
            if obs_lock is not None:
                obs_lock.release()
    if cached is not None:
        cached.unpersist()

    new_files = table.last_new_entries
    n_winners = sum(e.get("rows", 0) for e in new_files)
    touched = {e["bucket"] for e in new_files}

    secs = time.monotonic() - t0
    stats = {
        "batch_id": batch_id,
        "events_in": int(events_applied),
        "events_applied": int(events_applied),
        "winners": int(n_winners),
        "seconds": secs,
        "events_per_sec": events_applied / secs if secs > 0 else float("inf"),
        "touched_buckets": len(touched),
        "skipped": False,
        "snapshot_version": table.version,
        "lag_events": _lag(new_applied),
        "dedup_mode": dedup_mode,
    }
    with phase("metrics_lineage"):
        append_metrics(table.path, stats)
        append_lineage(
            table.path,
            [
                {
                    "batch_id": batch_id,
                    "partition": int(r["partition"]),
                    "min_offset": int(r["min_offset"]),
                    "max_offset": int(r["max_offset"]),
                    "events": int(r["events"]),
                    "snapshot_version": table.version,
                }
                for r in ranges
            ],
        )
    return stats

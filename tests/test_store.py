"""SnapshotStore unit tests for the round-4 write paths: partition
columns surviving read-back, partition-scoped overwrite, and the merged
multi-table append."""

from pyspark.sql import functions as F


def _tbl(spark, rows):
    return spark.createDataFrame(rows, "id long, bucket int, v string")


SCHEMA = "id long, bucket int, v string"


def test_partition_column_survives_roundtrip(spark, store):
    """Partitioned writes keep the partition column IN the file data
    (mirror-column layout): a snapshot read returns real values, not
    the nulls a dir-only partition column yields under an explicit
    file-list read (the round-4 latent bug)."""
    df = _tbl(spark, [(i, i % 3, f"r{i}") for i in range(9)])
    store.append("t", df, partition_by=["bucket"])
    got = store.read("t", df.schema)
    assert {r.bucket for r in got.collect()} == {0, 1, 2}
    assert got.filter(F.col("bucket").isNull()).count() == 0


def test_overwrite_partitions_scoped_rewrite(spark, store):
    """Only touched partitions change; untouched files carry over from
    the pinned base version (dynamic-partition MERGE semantics)."""
    df = _tbl(spark, [(i, i % 3, "old") for i in range(9)])
    store.append("t", df, partition_by=["bucket"])
    v1 = store.current_version("t")
    files_b2 = [f for f in store.files("t") if "_p_bucket=2" in f]

    new = _tbl(spark, [(100, 0, "new"), (101, 1, "new")])
    store.overwrite_partitions("t", new, "bucket", [0, 1], base_version=v1)

    got = {(r.id, r.bucket, r.v) for r in store.read("t", df.schema).collect()}
    # buckets 0/1 replaced, bucket 2 intact
    assert got == {(100, 0, "new"), (101, 1, "new"),
                   (2, 2, "old"), (5, 2, "old"), (8, 2, "old")}
    # bucket-2 files are literally the same files, not rewrites
    assert [f for f in store.files("t") if "_p_bucket=2" in f] == files_b2
    # time travel: the base version still reads the old content
    assert store.count("t", v1) == 9


def test_overwrite_partitions_rejects_out_of_scope_rows(spark, store):
    import pytest

    df = _tbl(spark, [(1, 0, "a"), (2, 1, "b")])
    store.append("t", df, partition_by=["bucket"])
    with pytest.raises(AssertionError):
        # claims to touch only bucket 0 but stages a bucket-1 row
        store.overwrite_partitions("t", df, "bucket", [0])


def test_append_many_single_job_per_table_manifests(spark, store):
    """One merged write commits each table's files to its own manifest;
    readers project their own schema and never see superset columns."""
    a = spark.createDataFrame([(1, "x")], "id long, s string")
    b = spark.createDataFrame([(2.5, 7)], "val double, n int")
    versions = store.append_many({"ta": a, "tb": b})
    assert set(versions) == {"ta", "tb"}
    ra = store.read("ta", a.schema).collect()
    rb = store.read("tb", b.schema).collect()
    assert [(r.id, r.s) for r in ra] == [(1, "x")]
    assert [(r.val, r.n) for r in rb] == [(2.5, 7)]
    # second merged append accumulates (append, not overwrite)
    store.append_many({"ta": a, "tb": b})
    assert store.count("ta") == 2 and store.count("tb") == 2


def test_legacy_layout_refused_then_migrated(spark, store, tmp_path):
    """Round-4 advice #4: a store written BEFORE the mirror-column
    layout (partition value only in bucket=N dir names) reads back NULL
    buckets, so a partial merge would keep its rows as stale
    duplicates.  overwrite_partitions must refuse until
    migrate_legacy_partitions rewrites the files with the column
    reconstructed from the dir names."""
    import os

    import pytest

    df = _tbl(spark, [(i, i % 3, f"r{i}") for i in range(9)])
    # write a genuine pre-mirror table: partitionBy drops the column
    # from file data, the value survives only in the dir name
    stage = str(tmp_path / "legacy")
    df.write.partitionBy("bucket").parquet(stage)
    files = sorted(
        os.path.join(dp, fn)
        for dp, _dirs, fns in os.walk(stage)
        for fn in fns
        if fn.endswith(".parquet")
    )
    store._commit("t", files, {"legacy": True})

    # the hazard is real: every row reads back with a NULL bucket
    got = store.read("t", df.schema)
    assert got.filter(F.col("bucket").isNull()).count() == 9

    new = _tbl(spark, [(100, 0, "new")])
    with pytest.raises(ValueError, match="pre-mirror-layout"):
        store.overwrite_partitions("t", new, "bucket", [0])

    v = store.migrate_legacy_partitions("t", "bucket", df.schema)
    assert v is not None
    fixed = {(r.id, r.bucket, r.v) for r in store.read("t", df.schema).collect()}
    assert fixed == {(i, i % 3, f"r{i}") for i in range(9)}  # values reconstructed
    # second call is a no-op; partial merge now works
    assert store.migrate_legacy_partitions("t", "bucket", df.schema) is None
    store.overwrite_partitions("t", new, "bucket", [0])
    after = {(r.id, r.bucket, r.v) for r in store.read("t", df.schema).collect()}
    assert after == {(100, 0, "new")} | {(i, i % 3, f"r{i}") for i in range(9) if i % 3 != 0}

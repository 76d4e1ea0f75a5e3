"""Sink tests: partition pruning actually happens on the written layout,
and co-bucketed tables join without an exchange."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from tantalus_spark.catalog.loader import read_parquet
from tantalus_spark.sources import sink

SF = "/root/testdata/sf0.001"


def test_write_fact_partition_pruning(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("orders_by_status"))
    orders = read_parquet(spark, f"{SF}/orders.parquet")
    sink.write_fact(orders, path, partition_by=["o_orderstatus"],
                    target_files_per_partition=2)
    back = spark.read.parquet(path)
    assert back.count() == orders.count()
    pruned = back.filter(F.col("o_orderstatus") == "F")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the filter must become a partition filter, not a data filter
    assert "PartitionFilters: [" in plan
    assert "o_orderstatus" in plan.split("PartitionFilters:")[1][:200]
    assert pruned.count() == orders.filter("o_orderstatus = 'F'").count()


def test_write_dimension_single_file(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("nation_dim"))
    nation = read_parquet(spark, f"{SF}/nation.parquet")
    sink.write_dimension(nation, path)
    import glob
    files = glob.glob(f"{path}/*.parquet")
    assert len(files) == 1
    assert spark.read.parquet(path).count() == nation.count()


def test_bucketed_join_has_no_shuffle(spark):
    orders = read_parquet(spark, f"{SF}/orders.parquet")
    lineitem = read_parquet(spark, f"{SF}/lineitem.parquet")
    try:
        sink.write_bucketed_table(orders, "b_orders", "o_orderkey", 8,
                                  sort_by="o_orderkey")
        sink.write_bucketed_table(
            lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
            "b_lineitem", "o_orderkey", 8, sort_by="o_orderkey")
        # hint merge so the tiny test tables don't broadcast — at real fact
        # scale SMJ is what Catalyst picks, and bucketing removes its shuffle
        joined = spark.table("b_orders").hint("merge").join(
            spark.table("b_lineitem").hint("merge"), "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-bucketed: sort-merge join reads buckets directly — no Exchange
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan
        assert joined.count() == lineitem.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_estimate_repartition():
    assert sink.estimate_repartition(0) == 1
    assert sink.estimate_repartition(256 << 20) == 1
    assert sink.estimate_repartition((256 << 20) + 1) == 2
    assert sink.estimate_repartition(100 << 30, 256 << 20) == 400


def test_merge_into_snapshot_rewrites_only_touched_partitions(
        spark, tmp_path_factory):
    """CDC merge on bare parquet: upserts + deletes land, untouched
    partition directories keep their original files byte-for-byte."""
    import os

    from pyspark.sql import functions as F

    from tantalus_spark.sources.sink import merge_into_snapshot

    path = str(tmp_path_factory.mktemp("snap") / "table")
    base = spark.createDataFrame(
        [(1, "2024-01-01", "a"), (2, "2024-01-01", "b"),
         (3, "2024-01-02", "c"), (4, "2024-01-03", "d")],
        "id long, day string, v string")
    base.repartition(1).write.partitionBy("day").parquet(path)

    def files_of(day):
        d = os.path.join(path, f"day={day}")
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)))
            for f in os.listdir(d) if f.endswith(".parquet"))

    untouched_before = files_of("2024-01-03")

    upserts = spark.createDataFrame(
        [(2, "2024-01-01", "b2"),       # update in day 1
         (5, "2024-01-02", "e")],       # insert into day 2
        "id long, day string, v string")
    deletes = spark.createDataFrame([(3, "2024-01-02")], "id long, day string")
    touched = merge_into_snapshot(
        spark, path, upserts, key_cols=["id"], partition_col="day",
        deletes=deletes)
    assert sorted(touched) == ["2024-01-01", "2024-01-02"]

    # partition-column type inference reads day= back as DATE; stringify
    got = {(r["id"], str(r["day"]), r["v"])
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, "2024-01-01", "a"), (2, "2024-01-01", "b2"),
                   (5, "2024-01-02", "e"), (4, "2024-01-03", "d")}
    # the day-3 partition was never rewritten
    assert files_of("2024-01-03") == untouched_before


def test_merge_staging_rollback_and_recovery(spark, tmp_path_factory):
    """A merge that dies mid-swap must lose no pre-merge data: the commit
    renames partition dirs to .bak-merge first, and recover_failed_merge
    rolls any leftover .bak-merge back over the half-state."""
    import os
    import shutil

    from tantalus_spark.sources.sink import (
        _BAK_SUFFIX, merge_into_snapshot, recover_failed_merge)

    path = str(tmp_path_factory.mktemp("snaprec") / "table")
    base = spark.createDataFrame(
        [(1, "d1", "a"), (2, "d2", "b")], "id long, day string, v string")
    base.repartition(1).write.partitionBy("day").parquet(path)

    # normal merge leaves no staging or backup residue
    ups = spark.createDataFrame([(1, "d1", "a2")],
                                "id long, day string, v string")
    merge_into_snapshot(spark, path, ups, key_cols=["id"],
                        partition_col="day")
    assert not os.path.exists(path + ".staging")
    assert not [f for f in os.listdir(path) if f.endswith(_BAK_SUFFIX)]

    # crash case: between stage-out and commit of day=d2 — the commit
    # rename is atomic, so the current dir is ABSENT and the bak is the
    # only copy; recovery must restore it
    cur = os.path.join(path, "day=d2")
    os.rename(cur, cur + _BAK_SUFFIX)
    restored = recover_failed_merge(spark, path, partition_col="day")
    assert restored == ["day=d2"]
    got = {(r["id"], r["day"], r["v"])
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, "d1", "a2"), (2, "d2", "b")}

    # stale case: the merge COMMITTED but its bak cleanup failed — the
    # current dir exists; recovery must drop the stale bak, never revert
    # the committed data
    import shutil
    d1 = os.path.join(path, "day=d1")
    shutil.copytree(d1, d1 + _BAK_SUFFIX)
    restored = recover_failed_merge(spark, path, partition_col="day")
    assert restored == []
    assert not os.path.exists(d1 + _BAK_SUFFIX)
    got = {(r["id"], r["day"], r["v"])
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, "d1", "a2"), (2, "d2", "b")}


def test_merge_refuses_crash_residue_and_rolls_back_new_partitions(
        spark, tmp_path_factory):
    """(a) A retried merge over leftover .bak-merge residue must refuse
    to run (the bak is the only pre-merge copy and the retry would
    delete it); (b) an aborted merge must also remove partitions it
    CREATED (they have no bak), leaving no phantom post-merge data."""
    import os

    import pytest as _pytest

    from tantalus_spark.sources.sink import _BAK_SUFFIX, merge_into_snapshot

    path = str(tmp_path_factory.mktemp("snapguard") / "table")
    spark.createDataFrame([(1, "d1", "a")], "id long, day string, v string") \
        .repartition(1).write.partitionBy("day").parquet(path)

    # (a) simulate crash residue for a partition this merge touches
    cur = os.path.join(path, "day=d1")
    os.rename(cur, cur + _BAK_SUFFIX)
    ups = spark.createDataFrame([(1, "d1", "a2")],
                                "id long, day string, v string")
    with _pytest.raises(Exception, match="recover_failed_merge"):
        merge_into_snapshot(spark, path, ups, key_cols=["id"],
                            partition_col="day")
    # residue untouched by the refusal
    assert os.path.isdir(cur + _BAK_SUFFIX)
    os.rename(cur + _BAK_SUFFIX, cur)

    # (b) inject a rename failure on the SECOND partition's commit; the
    # first (newly-created, no bak) partition must be rolled back to
    # nonexistence — no phantom post-merge data after an abort
    from tantalus_spark.sources import sink as sink_mod

    real_hadoop_fs = sink_mod._hadoop_fs

    class FailingFs:
        def __init__(self, fs, fail_substr):
            self._fs, self._fail = fs, fail_substr
            self._fired = False

        def rename(self, src, dst):
            # fail exactly once: the staged commit of day=d1 (the later
            # rollback rename to the same destination must succeed)
            if (not self._fired and self._fail in str(dst)
                    and _BAK_SUFFIX not in str(dst)
                    and ".staging" in str(src)):
                self._fired = True
                return False
            return self._fs.rename(src, dst)

        def __getattr__(self, name):
            return getattr(self._fs, name)

    def patched(spark_, path_):
        fs, jpath = real_hadoop_fs(spark_, path_)
        return FailingFs(fs, "day=d1"), jpath

    ups2 = spark.createDataFrame(
        [(2, "d0new", "n"), (1, "d1", "a3")],   # d0new swaps before d1
        "id long, day string, v string")
    sink_mod._hadoop_fs = patched
    try:
        with _pytest.raises(Exception, match="cannot commit"):
            merge_into_snapshot(spark, path, ups2, key_cols=["id"],
                                partition_col="day")
    finally:
        sink_mod._hadoop_fs = real_hadoop_fs
    assert not os.path.exists(os.path.join(path, "day=d0new"))
    got = {(r["id"], str(r["day"]), r["v"])
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, "d1", "a")}


def test_merge_handles_hive_escaped_partition_values(
        spark, tmp_path_factory):
    """Partition values with Hive-escaped characters (':' -> %3A) must
    merge correctly: the swap loop builds dir names with the JVM's own
    escaper, so the staged dir is found and swapped in — previously the
    raw f-string name missed it and the partition stayed silently stale
    (r3 ADVICE)."""
    import os

    from tantalus_spark.sources.sink import merge_into_snapshot

    path = str(tmp_path_factory.mktemp("snapesc") / "table")
    base = spark.createDataFrame(
        [(1, "shard:a", "old"), (2, "shard:b", "keep")],
        "id long, part string, v string")
    base.repartition(1).write.partitionBy("part").parquet(path)
    assert os.path.isdir(os.path.join(path, "part=shard%3Aa"))

    ups = spark.createDataFrame(
        [(1, "shard:a", "new")], "id long, part string, v string")
    touched = merge_into_snapshot(
        spark, path, ups, key_cols=["id"], partition_col="part")
    assert touched == ["shard:a"]
    got = {(r["id"], r["part"], r["v"])
           for r in spark.read.parquet(path).collect()}
    assert got == {(1, "shard:a", "new"), (2, "shard:b", "keep")}

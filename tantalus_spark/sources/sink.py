"""Write path: partitioned / bucketed parquet sinks and CSV export.

The reference's "writes" are Postgres row mutations (SURVEY.md §2.11);
an analytics engine's equivalents are table (re)writes. The layout choices
here are the §4.3 physical plan made concrete:

- **dimensions** (patient, storage, tag, ...): single unpartitioned parquet,
  coalesced — they broadcast anyway.
- **facts** (file_resource, *_history, lineitem-class tables): partitioned
  by a low-cardinality column (e.g. date bucket) for partition pruning, and
  optionally **bucketed** by join key so co-bucketed joins skip the shuffle
  (saveAsTable — bucketing lives in the catalog, not bare files).
- target file size is controlled by repartitioning to
  ``ceil(bytes / target_file_bytes)`` before the write — many small files
  (driver listing pain) and giant single files (no read parallelism) are
  both failure modes at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_dimension(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Small-table sink: one file, no partitioning."""
    df.coalesce(1).write.mode(mode).parquet(path)


def write_fact(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    target_files_per_partition: int = 1,
    mode: str = "overwrite",
) -> None:
    """Fact-table sink: hive-style partition directories for pruning.

    ``target_files_per_partition`` controls intra-partition parallelism —
    repartitioning by the partition columns plus a bounded random-free
    spread key keeps every output directory at a predictable file count.
    """
    out = df
    if partition_by:
        spread = F.pmod(
            F.xxhash64(*[F.col(c) for c in df.columns]),
            F.lit(max(target_files_per_partition, 1)),
        )
        out = df.repartition(
            *[F.col(c) for c in partition_by], spread)
        out.write.mode(mode).partitionBy(*partition_by).parquet(path)
    else:
        out.write.mode(mode).parquet(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_by: str | list[str],
    n_buckets: int = 32,
    sort_by: str | list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed managed table: two tables bucketed identically on their
    join key equi-join WITHOUT a shuffle (SortMergeJoin reads co-bucketed
    splits directly). This is the §4.3 'co-located joins via bucketing'
    lever — the biggest single shuffle-elimination at 100 TB."""
    cols = [bucket_by] if isinstance(bucket_by, str) else list(bucket_by)
    w = df.write.mode(mode).format("parquet").bucketBy(n_buckets, *cols)
    if sort_by:
        scols = [sort_by] if isinstance(sort_by, str) else list(sort_by)
        w = w.sortBy(*scols)
    w.saveAsTable(table_name)


def estimate_repartition(n_bytes: int, target_file_bytes: int = 256 << 20) -> int:
    """File-count sizing: ~256 MB parquet files (post-compression) read
    efficiently and keep listing bounded."""
    return max(1, math.ceil(n_bytes / target_file_bytes))


def merge_into_snapshot(
    spark,
    snapshot_path: str,
    upserts: DataFrame | None,
    key_cols: list[str],
    partition_col: str,
    deletes: DataFrame | None = None,
) -> list:
    """Incremental CDC merge into a hive-partitioned parquet snapshot,
    rewriting ONLY the touched partitions (MERGE INTO on bare parquet).

    1. The touched partition values come from the change batch (tiny,
       driver-side list — change batches touch few partitions).
    2. Only those partitions are read back (partition pruning), changed
       keys are anti-joined out, and upserts unioned in.
    3. The write uses dynamic partitionOverwriteMode, so untouched
       partition directories are never rewritten.

    At 100 TB this bounds the rewrite to O(touched partitions), not
    O(table) — the difference between a nightly merge that takes minutes
    and one that rewrites the world. Both ``upserts`` and ``deletes``
    carry ``partition_col``; delete rows only need key + partition
    columns. Returns the touched partition values.

    Durability: the rebuilt partitions are written to a STAGING directory
    first, then swapped in per partition with Hadoop-FileSystem renames
    (current dir -> .bak, staged dir -> current), and the .bak dirs are
    dropped only after every swap succeeded. A failure mid-write leaves
    the snapshot untouched; a failure mid-swap leaves .bak dirs that
    :func:`recover_failed_merge` rolls back. Renames are metadata ops on
    HDFS/local; on object stores they are copies — use a real table
    format (Iceberg/Delta, whose MERGE INTO this function mirrors) there.
    Partition values must be non-null; special characters are fine — dir
    names are built with the JVM's own Hive-escaper (exact writer parity)
    and a post-staging name check fails loudly on any residual drift
    rather than committing a silently stale partition.

    Assumes ``partition_col`` is stable per key (the norm for
    date-partitioned facts): an upsert that MOVES a key to a different
    partition would leave the old row in the untouched partition — route
    such moves as an explicit delete (old partition) + upsert (new).
    """
    changes = []
    if upserts is not None:
        changes.append(upserts.select(partition_col))
    if deletes is not None:
        changes.append(deletes.select(partition_col))
    if not changes:
        return []
    touched_df = changes[0]
    for c in changes[1:]:
        touched_df = touched_df.unionByName(c)
    touched = [r[0] for r in touched_df.distinct().collect()]
    if not touched:
        return []

    current = (
        spark.read.parquet(snapshot_path)
        .filter(F.col(partition_col).isin(touched))
    )
    gone_keys = []
    if upserts is not None:
        gone_keys.append(upserts.select(*key_cols))
    if deletes is not None:
        gone_keys.append(deletes.select(*key_cols))
    gone = gone_keys[0]
    for g in gone_keys[1:]:
        gone = gone.unionByName(g)
    remaining = current.join(F.broadcast(gone.distinct()), key_cols,
                             "left_anti")
    out = remaining
    if upserts is not None:
        out = remaining.unionByName(upserts.select(*remaining.columns))

    # stage, then commit via per-partition renames (see docstring)
    staging = snapshot_path.rstrip("/") + ".staging"
    fs, jpath = _hadoop_fs(spark, snapshot_path)

    # partition dir names must match what Spark's writer produces, which
    # Hive-escapes special chars (':' -> %3A, '%' -> %25, ...). Use the
    # JVM's OWN escaper for exact parity — a hand-rolled f-string made
    # fs.exists(cur/stg) false for such values and the swap loop
    # "succeeded" while leaving the partition silently stale (r3 ADVICE)
    try:
        _esc = spark._jvm.org.apache.spark.sql.catalyst.catalog \
            .ExternalCatalogUtils.escapePathName
    except Exception:                                 # pragma: no cover
        _esc = str  # the staging-dir check below still fails loudly
    frag = lambda p: f"{partition_col}={_esc(str(p))}"  # noqa: E731
    # refuse to run over the residue of a crashed merge: a leftover
    # .bak-merge dir is the ONLY copy of that partition's pre-merge data,
    # and this merge's `current` read would miss it (the bak path is not
    # a legal partition value), then the success-path cleanup would
    # delete it — silent data loss on retry-after-crash
    leftover = [
        frag(p) for p in touched
        if fs.exists(
            jpath(f"{snapshot_path.rstrip('/')}/{frag(p)}{_BAK_SUFFIX}"))
    ]
    if leftover:
        raise IOError(
            f"crashed-merge residue under {snapshot_path}: {leftover}; "
            f"run recover_failed_merge() first")

    fs.delete(jpath(staging), True)
    out.write.mode("overwrite").partitionBy(partition_col).parquet(staging)

    # loud guard against any residual naming drift (engine version, value
    # rendering): every partition dir the writer just staged must be one
    # this merge expects to swap, else the swap loop would skip it and
    # commit a silently stale partition
    expected = {frag(p) for p in touched}
    staged_dirs = [
        st.getPath().getName()
        for st in fs.listStatus(jpath(staging))
        if st.isDirectory() and st.getPath().getName().startswith(
            f"{partition_col}=")
    ]
    unmatched = sorted(set(staged_dirs) - expected)
    if unmatched:
        fs.delete(jpath(staging), True)
        raise IOError(
            f"staged partition dir(s) {unmatched} do not match any "
            f"expected name in {sorted(expected)}: partition-value "
            f"escaping drift — snapshot left untouched")

    swapped = []  # (partition value, had pre-merge dir)
    try:
        for p in touched:
            cur = jpath(f"{snapshot_path.rstrip('/')}/{frag(p)}")
            bak = jpath(f"{snapshot_path.rstrip('/')}/{frag(p)}{_BAK_SUFFIX}")
            stg = jpath(f"{staging}/{frag(p)}")
            had_cur = fs.exists(cur)
            if had_cur and not fs.rename(cur, bak):
                raise IOError(f"cannot stage-out partition {frag(p)}")
            swapped.append((p, had_cur))
            # a delete-only change can empty a partition: no staged dir
            if fs.exists(stg) and not fs.rename(stg, cur):
                raise IOError(f"cannot commit partition {frag(p)}")
    except BaseException:
        # roll the completed swaps back; pre-merge data is never lost.
        # Partitions that did not exist pre-merge have no bak — their
        # committed dir must be DELETED, or an aborted merge would leave
        # phantom post-merge partitions behind.
        for p, had_cur in reversed(swapped):
            cur = jpath(f"{snapshot_path.rstrip('/')}/{frag(p)}")
            bak = jpath(f"{snapshot_path.rstrip('/')}/{frag(p)}{_BAK_SUFFIX}")
            fs.delete(cur, True)
            if had_cur and fs.exists(bak):
                fs.rename(bak, cur)
        raise
    stale = []
    for p in touched:
        bak = jpath(f"{snapshot_path.rstrip('/')}/{frag(p)}{_BAK_SUFFIX}")
        # the commit stands at this point; a failed cleanup delete must
        # not read as a failed merge, but silently ignoring it would trip
        # the residue guard on the NEXT merge — so retry, then raise a
        # distinct error naming the leftover (recover_failed_merge treats
        # a bak whose current dir exists as stale and deletes it)
        if fs.exists(bak) and not fs.delete(bak, True) and fs.exists(bak):
            stale.append(frag(p))
    fs.delete(jpath(staging), True)
    if stale:
        raise IOError(
            f"merge COMMITTED but stale backup cleanup failed for {stale}; "
            f"run recover_failed_merge() to clear the residue")
    return touched


_BAK_SUFFIX = ".bak-merge"


def _hadoop_fs(spark, path: str):
    """(FileSystem, Path-constructor) for *path* via the JVM Hadoop API —
    the same abstraction the writers use, so staging/commit renames work
    on any supported filesystem, not just local disk."""
    jvm = spark._jvm
    jpath = lambda p: jvm.org.apache.hadoop.fs.Path(p)  # noqa: E731
    fs = jpath(path).getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def recover_failed_merge(spark, snapshot_path: str,
                         partition_col: str) -> list:
    """Clear ``.bak-merge`` residue after an interrupted merge. Two cases,
    distinguished by whether the partition's CURRENT dir exists:

    - current MISSING: the crash hit between stage-out and commit — the
      bak is the only copy of that partition; restore it.
    - current PRESENT: the merge committed but its cleanup delete failed
      (or the abort path already restored) — the bak is STALE pre-merge
      data; restoring it would silently revert a committed merge, so it
      is deleted instead.

    Returns the fragments that were RESTORED (not the stale ones dropped).
    """
    fs, jpath = _hadoop_fs(spark, snapshot_path)
    root = jpath(snapshot_path)
    if not fs.exists(root):
        return []
    restored = []
    for status in fs.listStatus(root):
        name = status.getPath().getName()
        if not name.endswith(_BAK_SUFFIX):
            continue
        cur_name = name[: -len(_BAK_SUFFIX)]
        if not cur_name.startswith(f"{partition_col}="):
            continue
        cur = jpath(f"{snapshot_path.rstrip('/')}/{cur_name}")
        if fs.exists(cur):
            fs.delete(status.getPath(), True)     # stale: commit stands
            continue
        fs.rename(status.getPath(), cur)
        restored.append(cur_name)
    fs.delete(jpath(snapshot_path.rstrip("/") + ".staging"), True)
    return restored

"""Mutation operators as batch merges (SURVEY.md §2.11).

The reference is a CRUD app; an analytics engine treats writes as merges
against the table store. Without Delta in this image, MERGE is emulated the
standard way: anti-join + union for upserts, key-join for deletes. Each
returns the new DataFrame(s) — callers own persistence.

At scale these are partition-overwrite jobs; the emulation keeps the same
one-shuffle shape MERGE INTO would have."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def append_rows(table: DataFrame, rows: DataFrame) -> DataFrame:
    """M1 create (views.py:478-485)."""
    return table.unionByName(rows)


def get_or_create(table: DataFrame, rows: DataFrame,
                  key_cols: list[str]) -> DataFrame:
    """M2 get_or_create (views.py:510, forms.py:661,681): insert only rows
    whose key is absent."""
    missing = rows.join(table.select(*key_cols), key_cols, "left_anti")
    return table.unionByName(missing)


def upsert(table: DataFrame, rows: DataFrame, key_cols: list[str]) -> DataFrame:
    """M4 update/merge by key (views.py:396-409): new rows win."""
    kept = table.join(rows.select(*key_cols), key_cols, "left_anti")
    return kept.unionByName(rows)


def delete_by_key(table: DataFrame, keys: DataFrame,
                  key_cols: list[str]) -> DataFrame:
    """M7 hard delete (views.py:984-988)."""
    return table.join(keys.select(*key_cols), key_cols, "left_anti")


def m2m_add(junction: DataFrame, pairs: DataFrame) -> DataFrame:
    """M5 tags.add (views.py:289-291, forms.py:679-682) — idempotent, like
    Django's m2m add."""
    cols = junction.columns
    new = pairs.select(*cols).join(junction, cols, "left_anti")
    return junction.unionByName(new)


def m2m_remove(junction: DataFrame, pairs: DataFrame) -> DataFrame:
    """M5 tags.remove (views.py:307,1018)."""
    return junction.join(pairs.select(*junction.columns),
                         junction.columns, "left_anti")


def soft_delete_dataset(
    sequence_dataset: DataFrame,
    ds_file_resources: DataFrame,
    file_instance: DataFrame,
    dataset_ids: list[int],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """M6 soft-delete cascade (views.py:1494-1503, api/views.py:164-174):
    mark the datasets' file instances ``is_deleted=True``, drop the
    datasets and their junction rows.

    Returns (sequence_dataset', ds_file_resources', file_instance')."""
    ids = F.col("sequencedataset_id").isin(dataset_ids)
    affected_fr = (ds_file_resources.filter(ids)
                   .select("file_resource_id").distinct())
    fi2 = (
        file_instance.alias("fi")
        .join(F.broadcast(affected_fr.alias("a")),
              F.col("fi.file_resource_id") == F.col("a.file_resource_id"),
              "left")
        .select(
            "fi.id", "fi.owner_id", "fi.storage_id", "fi.file_resource_id",
            F.when(F.col("a.file_resource_id").isNotNull(), F.lit(True))
            .otherwise(F.col("fi.is_deleted")).alias("is_deleted"),
        )
    )
    ds2 = sequence_dataset.filter(~F.col("id").isin(dataset_ids))
    junc2 = ds_file_resources.filter(~ids)
    return ds2, junc2, fi2

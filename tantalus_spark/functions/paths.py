"""Storage path resolution and file-derived columns — pure Column
expressions, zero UDFs (SURVEY.md §2.1 S11, §2.10 D4-D6).

The reference dispatches ``get_filepath`` polymorphically per storage
subtype (``ServerStorage.get_filepath`` models.py:822-825, Azure
models.py:853-858, S3 models.py:878-883, ``FileInstance.get_filepath``
models.py:916-917). Here storage is denormalized with a ``storage_type``
discriminator, so dispatch is one ``when/otherwise`` chain that
whole-stage-codegen compiles into a single projection."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _strip_slashes(col: Column) -> Column:
    # filename.strip('/') — models.py:825,856,881
    return F.regexp_replace(col, "^/+|/+$", "")


def filepath_expr(
    storage_type: Column,
    storage_directory: Column,
    storage_account: Column,
    storage_container: Column,
    bucket: Column,
    filename: Column,
) -> Column:
    f = _strip_slashes(filename)
    return (
        F.when(storage_type == "server",
               F.concat_ws("/", F.regexp_replace(storage_directory, "/+$", ""), f))
        .when(storage_type == "blob",
              F.concat_ws("/", storage_account, storage_container, f))
        .when(storage_type == "s3", F.concat_ws("/", bucket, f))
    )


def prefix_expr(storage_type: Column, storage_directory: Column,
                storage_account: Column, storage_container: Column,
                bucket: Column) -> Column:
    """Storage prefix (models.py:819-820, 850-851, 875-876)."""
    return (
        F.when(storage_type == "server", storage_directory)
        .when(storage_type == "blob",
              F.concat_ws("/", storage_account, storage_container))
        .when(storage_type == "s3", bucket)
    )


def file_locations(db) -> DataFrame:
    """The ``file_locations`` derived view (SURVEY.md §4.3): resource ×
    instance × storage with the resolved physical path. Storage is a tiny
    dimension — broadcast join, no shuffle of the big fact side."""
    fr = db.table("file_resource")
    fi = db.table("file_instance")
    st = db.table("storage")
    joined = (
        fr.alias("fr")
        .join(fi.alias("fi"), F.col("fr.id") == F.col("fi.file_resource_id"))
        .join(F.broadcast(st.alias("st")), F.col("fi.storage_id") == F.col("st.id"))
    )
    return joined.select(
        F.col("fr.id").alias("file_resource_id"),
        F.col("fi.id").alias("file_instance_id"),
        F.col("st.name").alias("storage_name"),
        F.col("st.storage_type").alias("storage_type"),
        F.col("fi.is_deleted").alias("is_deleted"),
        F.col("fr.filename").alias("filename"),
        F.col("fr.size").alias("size"),
        filepath_expr(
            F.col("st.storage_type"), F.col("st.storage_directory"),
            F.col("st.storage_account"), F.col("st.storage_container"),
            F.col("st.bucket"), F.col("fr.filename"),
        ).alias("filepath"),
    )


def file_size_mb_expr(size: Column) -> Column:
    """'{:,.2f} MB'.format(size/1e6) — models.py:376-378."""
    return F.concat(F.format_number(size / 1e6, 2), F.lit(" MB"))


def filename_time_expr(created: Column) -> Column:
    """strftime('%Y%m%d_%H%M%S') — models.py:370-371."""
    return F.date_format(created, "yyyyMMdd_HHmmss")


def filename_uid_expr(md5: Column) -> Column:
    """md5[:8] — models.py:374."""
    return F.substring(md5, 1, 8)

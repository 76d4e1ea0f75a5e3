"""Dashboard and stats aggregations (SURVEY.md §2.4).

The reference computes these with N+1 loops — one filtered COUNT/SUM query
per (library_type × storage-group) cell (``views.py:1718-1772``), 9 separate
dashboard counts (``views.py:1827-1837``), per-storage byte totals
(``views.py:1709-1711``). Each becomes ONE Spark job here: the N+1 collapses
into a groupBy shuffle, which is the whole point of running this on an
engine with a real optimizer."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantalus_spark.catalog.loader import Database

DASHBOARD_TABLES = [
    # HomeView context (views.py:1827-1837)
    "patient", "sample", "sequence_dataset", "results_dataset", "analysis",
    "tag", "curation", "file_resource", "storage",
]


def dashboard_counts(db: Database) -> DataFrame:
    """All entity counts as one unioned job (A1)."""
    frames = [
        db.table(t).groupBy(F.lit(t).alias("entity"))
        .agg(F.count(F.lit(1)).alias("n"))
        for t in DASHBOARD_TABLES
    ]
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out


def storage_stats(db: Database) -> DataFrame:
    """Bytes + file count per storage (views.py:1706-1711), excluding
    soft-deleted instances (models.py:382-383)."""
    fi = db.table("file_instance").filter(~F.col("is_deleted"))
    fr = db.table("file_resource")
    st = db.table("storage")
    return (
        fi.join(fr, fi.file_resource_id == fr.id)
        .join(F.broadcast(st.select(F.col("id").alias("sid"),
                                    F.col("name").alias("storage_name"))),
              fi.storage_id == F.col("sid"))
        .groupBy("storage_name")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("size").alias("total_bytes"),
        )
        .orderBy(F.col("total_bytes").desc())
    )


def library_stats(db: Database) -> DataFrame:
    """The (library_type × storage) matrix of dataset counts and byte totals
    — the reference's nested-loop N+1 (views.py:1718-1772, incl. the
    author's duplicate-fanout confusion at 1750-1753) as one groupBy.

    Dataset→file fan-out is handled by aggregating at the correct grain:
    bytes are summed over distinct (file_resource, storage) pairs, dataset
    counts over distinct dataset ids."""
    ds = db.table("sequence_dataset").select(
        F.col("id").alias("dataset_id"), F.col("library_id_fk"))
    lib = db.table("dna_library").select(
        F.col("id").alias("lib_id"), F.col("library_type_id"))
    lt = db.table("library_type").select(
        F.col("id").alias("lt_id"), F.col("name").alias("library_type"))
    dsfr = db.table("sequencedataset_file_resources")
    fi = db.table("file_instance").filter(~F.col("is_deleted"))
    fr = db.table("file_resource").select(F.col("id").alias("fr_id"), "size")
    st = db.table("storage").select(F.col("id").alias("st_id"),
                                    F.col("name").alias("storage_name"))

    typed = (
        ds.join(F.broadcast(lib), ds.library_id_fk == lib.lib_id, "left")
        .join(F.broadcast(lt), F.col("library_type_id") == F.col("lt_id"), "left")
        .select("dataset_id", F.coalesce("library_type", F.lit("unknown"))
                .alias("library_type"))
    )
    located = (
        dsfr.join(fi, dsfr.file_resource_id == fi.file_resource_id)
        .join(fr, dsfr.file_resource_id == F.col("fr_id"))
        .join(F.broadcast(st), fi.storage_id == F.col("st_id"))
        .select(F.col("sequencedataset_id").alias("dataset_id"),
                "storage_name", F.col("fr_id"), "size")
    )
    cells = typed.join(located, "dataset_id")
    n_datasets = cells.groupBy("library_type", "storage_name").agg(
        F.countDistinct("dataset_id").alias("n_datasets"))
    # a file counts once per (resource, storage) cell even when shared by
    # many datasets — the dedup the reference hand-rolled with .distinct()
    # after noticing duplicate fan-out (views.py:1750-1753)
    bytes_per_cell = (
        cells.dropDuplicates(["library_type", "storage_name", "fr_id"])
        .groupBy("library_type", "storage_name")
        .agg(F.sum("size").alias("total_bytes"))
    )
    return n_datasets.join(bytes_per_cell, ["library_type", "storage_name"])


def tag_dataset_counts(db: Database) -> DataFrame:
    """Datasets/results per tag (models.py:45-61 count_datasets family)."""
    tag = db.table("tag").select(F.col("id").alias("tag_id"), "name")
    sdt = db.table("sequencedataset_tags").groupBy("tag_id").agg(
        F.count(F.lit(1)).alias("n_sequencedatasets"))
    rdt = db.table("resultsdataset_tags").groupBy("tag_id").agg(
        F.count(F.lit(1)).alias("n_resultsdatasets"))
    return (
        tag.join(sdt, "tag_id", "left").join(rdt, "tag_id", "left")
        .select(
            "tag_id", "name",
            F.coalesce("n_sequencedatasets", F.lit(0)).alias("n_sequencedatasets"),
            F.coalesce("n_resultsdatasets", F.lit(0)).alias("n_resultsdatasets"),
        )
    )

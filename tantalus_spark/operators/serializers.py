"""Enriched read projections — the join-based replacement for the
reference's per-row serializer N+1s (SURVEY.md §3.1 step 7, §2.10).

``SequenceDatasetSerializerRead`` (api/serializers.py:187-200) nests
sample/library/lanes and computes ``is_complete`` per row via follow-up
queries (models.py:561-565). Here the whole page's derived columns come from
one plan: dimension joins broadcast, aggregates as grouped subplans joined
on the dataset key."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantalus_spark.catalog.loader import Database


def dataset_enriched(db: Database) -> DataFrame:
    """The ``dataset_enriched`` view (SURVEY.md §4.3): sequence_dataset ×
    sample × library × library_type + num_read_groups + is_complete +
    storage names + disk size/created time (D1-D3)."""
    ds = db.table("sequence_dataset")
    sample = db.table("sample").select(
        F.col("id").alias("_sid"), F.col("sample_id").alias("sample_id"))
    lib = db.table("dna_library").select(
        F.col("id").alias("_lid"), F.col("library_id").alias("library_id"),
        F.col("library_type_id"))
    lt = db.table("library_type").select(
        F.col("id").alias("_ltid"), F.col("name").alias("library_type"))

    lanes = db.table("sequencedataset_sequence_lanes").groupBy(
        F.col("sequencedataset_id").alias("_dsid")
    ).agg(F.countDistinct("sequencinglane_id").alias("num_read_groups"))

    lib_lanes = db.table("sequencing_lane").groupBy(
        F.col("dna_library_id").alias("_lib")
    ).agg(F.countDistinct("id").alias("_total_lanes"))

    dsfr = db.table("sequencedataset_file_resources")
    fr = db.table("file_resource").select(
        F.col("id").alias("_frid"), "size", "created")
    file_aggs = (
        dsfr.join(fr, dsfr.file_resource_id == F.col("_frid"))
        .groupBy(F.col("sequencedataset_id").alias("_dsid2"))
        .agg(F.sum("size").alias("disk_size"),
             F.max("created").alias("created_time"))
    )

    fi = db.table("file_instance").filter(~F.col("is_deleted"))
    st = db.table("storage").select(F.col("id").alias("_stid"),
                                    F.col("name").alias("_stname"))
    storages = (
        dsfr.join(fi, dsfr.file_resource_id == fi.file_resource_id)
        .join(F.broadcast(st), fi.storage_id == F.col("_stid"))
        .groupBy(F.col("sequencedataset_id").alias("_dsid3"))
        .agg(F.sort_array(F.collect_set("_stname")).alias("storage_names"))
    )

    out = (
        ds
        .join(F.broadcast(sample), ds.sample_id_fk == F.col("_sid"), "left")
        .join(F.broadcast(lib), ds.library_id_fk == F.col("_lid"), "left")
        .join(F.broadcast(lt), F.col("library_type_id") == F.col("_ltid"), "left")
        .join(lanes, ds.id == F.col("_dsid"), "left")
        .join(lib_lanes, ds.library_id_fk == F.col("_lib"), "left")
        .join(file_aggs, ds.id == F.col("_dsid2"), "left")
        .join(storages, ds.id == F.col("_dsid3"), "left")
    )
    return out.select(
        ds.id, ds.name, "dataset_type", "version_number", "is_production",
        "last_updated", "sample_id", "library_id", "library_type",
        F.coalesce("num_read_groups", F.lit(0)).alias("num_read_groups"),
        (F.coalesce("num_read_groups", F.lit(0))
         == F.coalesce("_total_lanes", F.lit(0))).alias("is_complete"),
        F.coalesce("disk_size", F.lit(0)).alias("disk_size"),
        "created_time",
        F.coalesce("storage_names", F.array()).alias("storage_names"),
    )


def dataset_set_to_csv(db: Database, pks: list[int]) -> str:
    """S7 (reference views.py:1594-1686 ``dataset_set_to_CSV``): selected
    datasets with every derived column — sample, library, library type,
    tags, storages, #read groups, completeness, bytes — as one CSV string.
    List-valued columns flatten with ';' separators; rows order by id."""
    enriched = dataset_enriched(db)
    tag = db.table("tag").select(F.col("id").alias("_tid"),
                                 F.col("name").alias("_tname"))
    tags_agg = (
        db.table("sequencedataset_tags")
        .join(F.broadcast(tag), F.col("tag_id") == F.col("_tid"))
        .groupBy(F.col("sequencedataset_id").alias("_dst"))
        .agg(F.sort_array(F.collect_set("_tname")).alias("_tags"))
    )
    out = (
        enriched.filter(F.col("id").isin(list(pks)))
        .join(tags_agg, enriched.id == F.col("_dst"), "left")
        .select(
            "id", "name", "dataset_type", "version_number",
            "sample_id", "library_id", "library_type",
            F.concat_ws(";", F.coalesce("_tags", F.array())).alias("tags"),
            F.concat_ws(";", "storage_names").alias("storages"),
            "num_read_groups", "is_complete", "disk_size",
        )
        .orderBy("id")
    )
    from tantalus_spark.sources.ingest import export_csv_pandas

    return export_csv_pandas(out)


def storage_flat(db: Database) -> DataFrame:
    """Polymorphic storage serializer output (api/serializers.py:24-87):
    one row per storage with storage_type + computed prefix."""
    from tantalus_spark.functions.paths import prefix_expr

    st = db.table("storage")
    return st.select(
        "id", "name", "storage_type",
        prefix_expr(F.col("storage_type"), F.col("storage_directory"),
                    F.col("storage_account"), F.col("storage_container"),
                    F.col("bucket")).alias("prefix"),
        "server_ip", "storage_directory", "username",
        "storage_account", "storage_container", "bucket",
    )

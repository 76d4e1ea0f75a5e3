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


def expand_related(
    db: Database,
    endpoint: str,
    accessors: list[str],
    root: DataFrame | None = None,
) -> DataFrame:
    """Nested read-serialization as ONE join-based plan: each requested
    relationship accessor becomes a column on the root table — a struct
    for single-valued hops (forward FK / O2O), a sorted array of structs
    for fan-out hops (reverse FK / M2M) — matching the reference's nested
    read serializers (api/serializers.py:187-200 nests sample, library,
    sequence_lanes) without its per-row N+1 queries.

    ``is_complete`` on ``sequence_dataset`` is accepted as a pseudo-
    accessor (SerializerMethodField in the reference, models.py:561-565):
    lanes attached to the dataset == lanes sequenced for its library.

    Single-valued hops broadcast the parent; fan-out hops pre-aggregate
    the child side to one array row per root key BEFORE the join, so the
    root never fans out and the plan stays one stage per relationship.
    Pass ``root`` to expand an already-filtered subset (e.g. one page) —
    the filter then prunes every child-side aggregate via the join.
    """
    cat = db.catalog
    out = root if root is not None else db.table(endpoint)
    root_pk = cat.pk(endpoint)

    for acc in accessors:
        if acc == "is_complete" and endpoint == "sequence_dataset":
            out = _with_is_complete(db, out)
            continue
        step = cat.step(endpoint, acc)
        if step is None:
            legal = sorted(cat.accessors(endpoint))
            raise ValueError(
                f"no relationship {acc!r} on {endpoint!r}; legal: {legal}")
        dst = db.table(step.dst)
        packed = F.struct(*[F.col(c) for c in dst.columns])
        if not step.many:
            side = dst.select(
                F.col(step.dst_col).alias("__k"), packed.alias(acc))
            out = (
                out.join(F.broadcast(side),
                         out[step.src_col] == F.col("__k"), "left")
                .drop("__k")
            )
            continue
        if step.via is None:                      # reverse FK
            keyed = dst.select(F.col(step.dst_col).alias("__k"),
                               packed.alias("__v"))
        else:                                     # M2M via junction
            jt = db.table(step.via)
            keyed = (
                jt.join(dst,
                        jt[step.via_dst_col] == dst[step.dst_col])
                .select(jt[step.via_src_col].alias("__k"),
                        packed.alias("__v"))
            )
        agg = keyed.groupBy("__k").agg(
            F.sort_array(F.collect_list("__v")).alias(acc))
        out = (
            out.join(agg, out[step.src_col] == F.col("__k"), "left")
            .drop("__k")
            .withColumn(acc, F.coalesce(F.col(acc), F.array()))
        )
    return out


def _with_is_complete(db: Database, ds: DataFrame) -> DataFrame:
    """num lanes attached to the dataset == num lanes of its library."""
    ds_lanes = db.table("sequencedataset_sequence_lanes").groupBy(
        F.col("sequencedataset_id").alias("__dsid")
    ).agg(F.countDistinct("sequencinglane_id").alias("__n_ds"))
    lib_lanes = db.table("sequencing_lane").groupBy(
        F.col("dna_library_id").alias("__lib")
    ).agg(F.countDistinct("id").alias("__n_lib"))
    return (
        ds.join(ds_lanes, ds["id"] == F.col("__dsid"), "left")
        .join(lib_lanes, ds["library_id_fk"] == F.col("__lib"), "left")
        .withColumn(
            "is_complete",
            F.coalesce("__n_ds", F.lit(0)) == F.coalesce("__n_lib", F.lit(0)))
        .drop("__dsid", "__n_ds", "__lib", "__n_lib")
    )

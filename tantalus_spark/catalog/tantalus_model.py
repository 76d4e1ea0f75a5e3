"""The tantalus entity model: schemas + relationship graph.

Derived from the reference data model (``/root/reference/tantalus/models.py``;
see SURVEY.md §1 and FIXTURES.md). Polymorphic ``Storage`` is denormalized to
one table with a ``storage_type`` discriminator (SURVEY.md §1.1), history
tables carry ``(history_id, history_date, history_type, history_user_id)``.
"""

from __future__ import annotations

from pyspark.sql import types as T

from tantalus_spark.catalog.relations import (
    ForeignKey,
    ManyToMany,
    OneToOne,
    RelationshipCatalog,
)


def _s(*fields: tuple) -> T.StructType:
    out = []
    for name, dtype, *rest in fields:
        nullable = rest[0] if rest else True
        out.append(T.StructField(name, dtype, nullable))
    return T.StructType(out)


LONG = T.LongType()
INT = T.IntegerType()
STR = T.StringType()
BOOL = T.BooleanType()
TS = T.TimestampType()

# --- entity schemas (reference models.py cites in FIXTURES.md) -------------

SCHEMAS: dict[str, T.StructType] = {
    # models.py:82-116
    "patient": _s(
        ("id", LONG, False), ("patient_id", STR), ("reference_id", STR),
        ("external_patient_id", STR), ("case_id", STR),
    ),
    # models.py:119-182 — is_reference is a 3-valued NullBoolean
    "sample": _s(
        ("id", LONG, False), ("sample_id", STR, False), ("external_sample_id", STR),
        ("submitter", STR), ("researcher", STR), ("tissue", STR), ("note", STR),
        ("patient_id_fk", LONG), ("is_reference", BOOL),
    ),
    "project": _s(("id", LONG, False), ("name", STR, False)),
    "sow": _s(("id", LONG, False), ("name", STR, False)),
    "library_type": _s(("id", LONG, False), ("name", STR, False), ("description", STR)),
    "reference_genome": _s(("id", LONG, False), ("name", STR, False)),
    "alignment_tool": _s(("id", LONG, False), ("name", STR, False), ("description", STR)),
    "analysis_type": _s(("id", LONG, False), ("name", STR, False)),
    # models.py:210-249
    "dna_library": _s(
        ("id", LONG, False), ("owner_id", LONG), ("library_id", STR, False),
        ("library_type_id", LONG), ("index_format", STR),
    ),
    # models.py:252-327 — lane_number is a STRING incl. ''
    "sequencing_lane": _s(
        ("id", LONG, False), ("owner_id", LONG), ("flowcell_id", STR, False),
        ("lane_number", STR), ("dna_library_id", LONG, False),
        ("sequencing_centre", STR), ("sequencing_instrument", STR),
        ("sequencing_library_id", STR), ("read_type", STR),
    ),
    # models.py:330-385
    "file_resource": _s(
        ("id", LONG, False), ("last_updated", TS), ("owner_id", LONG),
        ("md5", STR), ("size", LONG), ("created", TS),
        ("filename", STR, False), ("is_folder", BOOL),
    ),
    # models.py:388-418 — one-to-one with file_resource
    "sequence_file_info": _s(
        ("id", LONG, False), ("file_resource_id", LONG, False), ("owner_id", LONG),
        ("read_end", INT), ("genome_region", STR), ("index_sequence", STR),
    ),
    # polymorphic storage denormalized (models.py:773-883)
    "storage": _s(
        ("id", LONG, False), ("name", STR, False), ("storage_type", STR, False),
        ("server_ip", STR), ("storage_directory", STR), ("username", STR),
        ("storage_account", STR), ("storage_container", STR), ("bucket", STR),
        ("prefix", STR),
    ),
    # models.py:886-920
    "file_instance": _s(
        ("id", LONG, False), ("owner_id", LONG), ("storage_id", LONG, False),
        ("file_resource_id", LONG, False), ("is_deleted", BOOL),
    ),
    # models.py:459-599
    "sequence_dataset": _s(
        ("id", LONG, False), ("last_updated", TS), ("owner_id", LONG),
        ("name", STR, False), ("dataset_type", STR), ("sample_id_fk", LONG, False),
        ("library_id_fk", LONG, False), ("version_number", INT),
        ("analysis_id", LONG), ("reference_genome_id", LONG), ("aligner_id", LONG),
        ("region_split_length", INT), ("is_production", BOOL), ("note", STR),
    ),
    # models.py:624-705
    "analysis": _s(
        ("id", LONG, False), ("owner_id", LONG), ("name", STR, False),
        ("analysis_type_id", LONG), ("version", STR), ("jira_ticket", STR),
        ("last_updated", TS), ("status", STR), ("args", STR),
    ),
    # models.py:708-770
    "results_dataset": _s(
        ("id", LONG, False), ("owner_id", LONG), ("name", STR, False),
        ("results_type", STR), ("results_version", STR), ("analysis_id", LONG),
        ("is_production", BOOL),
    ),
    "tag": _s(("id", LONG, False), ("name", STR, False), ("owner_id", LONG)),
    # models.py:1004-1090
    "curation": _s(
        ("id", LONG, False), ("name", STR, False), ("owner_id", LONG),
        ("description", STR), ("version", STR), ("created", TS), ("updated", TS),
        ("user_id", LONG),
    ),
    # models.py:936-997 — submission_date is a display STRING
    "submission": _s(
        ("id", LONG, False), ("sample_id_fk", LONG), ("sow_id", LONG),
        ("submission_date", STR), ("submitted_by", STR), ("lanes_sequenced", INT),
        ("coverage", INT), ("updated_goal", INT), ("payment", STR),
        ("data_path", STR), ("library_type_id", LONG),
    ),
    "user": _s(("id", LONG, False), ("username", STR, False), ("is_active", BOOL)),
    # junctions (SURVEY.md §1.1)
    "sample_projects": _s(("sample_id", LONG, False), ("project_id", LONG, False)),
    "sequencedataset_tags": _s(("sequencedataset_id", LONG, False), ("tag_id", LONG, False)),
    "sequencedataset_file_resources": _s(
        ("sequencedataset_id", LONG, False), ("file_resource_id", LONG, False)
    ),
    "sequencedataset_sequence_lanes": _s(
        ("sequencedataset_id", LONG, False), ("sequencinglane_id", LONG, False)
    ),
    "resultsdataset_tags": _s(("resultsdataset_id", LONG, False), ("tag_id", LONG, False)),
    "resultsdataset_samples": _s(("resultsdataset_id", LONG, False), ("sample_id", LONG, False)),
    "resultsdataset_libraries": _s(
        ("resultsdataset_id", LONG, False), ("library_id", LONG, False)
    ),
    "resultsdataset_file_resources": _s(
        ("resultsdataset_id", LONG, False), ("file_resource_id", LONG, False)
    ),
    "analysis_tags": _s(("analysis_id", LONG, False), ("tag_id", LONG, False)),
    "analysis_input_datasets": _s(
        ("analysis_id", LONG, False), ("sequencedataset_id", LONG, False)
    ),
    "analysis_input_results": _s(
        ("analysis_id", LONG, False), ("resultsdataset_id", LONG, False)
    ),
    "analysis_logs": _s(("analysis_id", LONG, False), ("file_resource_id", LONG, False)),
    # explicit through model (models.py:1093-1116)
    "curation_dataset": _s(
        ("id", LONG, False), ("curation_id", LONG, False),
        ("sequencedataset_id", LONG, False), ("version", STR),
    ),
}

_HISTORY_EXTRA = [
    T.StructField("history_id", LONG, False),
    T.StructField("history_date", TS, False),
    T.StructField("history_type", STR, False),  # '+' | '~' | '-'
    T.StructField("history_user_id", LONG, True),
]

for base in ("curation", "curation_dataset", "tag", "sequence_dataset", "sample"):
    SCHEMAS[f"{base}_history"] = T.StructType(
        list(SCHEMAS[base].fields) + list(_HISTORY_EXTRA)
    )


def tantalus_catalog() -> RelationshipCatalog:
    cat = RelationshipCatalog()
    for name in SCHEMAS:
        cat.add_table(name, "id")

    fk = cat.add_fk
    m2m = cat.add_m2m

    fk(ForeignKey("sample", "patient_id_fk", "patient",
                  accessor="patient", reverse_accessor="samples"))
    # owner FKs → user (search fields use owner__username)
    for owned in ("dna_library", "sequencing_lane", "file_resource",
                  "sequence_dataset", "analysis", "results_dataset", "tag"):
        fk(ForeignKey(owned, "owner_id", "user",
                      accessor="owner", reverse_accessor=f"owned_{owned}s"))
    fk(ForeignKey("dna_library", "library_type_id", "library_type",
                  accessor="library_type", reverse_accessor="libraries"))
    fk(ForeignKey("sequencing_lane", "dna_library_id", "dna_library",
                  accessor="dna_library", reverse_accessor="sequencinglane"))
    fk(OneToOne("sequence_file_info", "file_resource_id", "file_resource",
                accessor="file_resource", reverse_accessor="sequencefileinfo"))
    fk(ForeignKey("file_instance", "storage_id", "storage",
                  accessor="storage", reverse_accessor="fileinstances"))
    fk(ForeignKey("file_instance", "file_resource_id", "file_resource",
                  accessor="file_resource", reverse_accessor="fileinstance"))
    fk(ForeignKey("sequence_dataset", "sample_id_fk", "sample",
                  accessor="sample", reverse_accessor="sequencedataset"))
    fk(ForeignKey("sequence_dataset", "library_id_fk", "dna_library",
                  accessor="library", reverse_accessor="sequencedataset"))
    fk(ForeignKey("sequence_dataset", "analysis_id", "analysis",
                  accessor="analysis", reverse_accessor="sequencedataset"))
    fk(ForeignKey("sequence_dataset", "reference_genome_id", "reference_genome",
                  accessor="reference_genome", reverse_accessor="sequencedataset"))
    fk(ForeignKey("sequence_dataset", "aligner_id", "alignment_tool",
                  accessor="aligner", reverse_accessor="sequencedataset"))
    fk(ForeignKey("analysis", "analysis_type_id", "analysis_type",
                  accessor="analysis_type", reverse_accessor="analyses"))
    fk(ForeignKey("results_dataset", "analysis_id", "analysis",
                  accessor="analysis", reverse_accessor="resultsdataset"))
    fk(ForeignKey("submission", "sample_id_fk", "sample",
                  accessor="sample", reverse_accessor="submissions"))
    fk(ForeignKey("submission", "sow_id", "sow",
                  accessor="sow", reverse_accessor="submissions"))
    fk(ForeignKey("submission", "library_type_id", "library_type",
                  accessor="library_type", reverse_accessor="submissions"))
    fk(ForeignKey("curation_dataset", "curation_id", "curation",
                  accessor="curation", reverse_accessor="curation_datasets"))
    fk(ForeignKey("curation_dataset", "sequencedataset_id", "sequence_dataset",
                  accessor="sequencedataset", reverse_accessor="curation_datasets"))

    m2m(ManyToMany("sample", "project", "sample_projects", "sample_id", "project_id",
                   accessor="projects", reverse_accessor="samples"))
    m2m(ManyToMany("sequence_dataset", "tag", "sequencedataset_tags",
                   "sequencedataset_id", "tag_id",
                   accessor="tags", reverse_accessor="sequencedataset"))
    m2m(ManyToMany("sequence_dataset", "file_resource", "sequencedataset_file_resources",
                   "sequencedataset_id", "file_resource_id",
                   accessor="file_resources", reverse_accessor="sequencedataset"))
    m2m(ManyToMany("sequence_dataset", "sequencing_lane", "sequencedataset_sequence_lanes",
                   "sequencedataset_id", "sequencinglane_id",
                   accessor="sequence_lanes", reverse_accessor="sequencedataset"))
    m2m(ManyToMany("results_dataset", "tag", "resultsdataset_tags",
                   "resultsdataset_id", "tag_id",
                   accessor="tags", reverse_accessor="resultsdataset"))
    m2m(ManyToMany("results_dataset", "sample", "resultsdataset_samples",
                   "resultsdataset_id", "sample_id",
                   accessor="samples", reverse_accessor="resultsdataset"))
    m2m(ManyToMany("results_dataset", "dna_library", "resultsdataset_libraries",
                   "resultsdataset_id", "library_id",
                   accessor="libraries", reverse_accessor="resultsdataset"))
    m2m(ManyToMany("results_dataset", "file_resource", "resultsdataset_file_resources",
                   "resultsdataset_id", "file_resource_id",
                   accessor="file_resources", reverse_accessor="resultsdataset"))
    m2m(ManyToMany("analysis", "tag", "analysis_tags", "analysis_id", "tag_id",
                   accessor="tags", reverse_accessor="analyses"))
    m2m(ManyToMany("analysis", "sequence_dataset", "analysis_input_datasets",
                   "analysis_id", "sequencedataset_id",
                   accessor="input_datasets", reverse_accessor="analyses"))
    m2m(ManyToMany("analysis", "results_dataset", "analysis_input_results",
                   "analysis_id", "resultsdataset_id",
                   accessor="input_results", reverse_accessor="analyses"))
    m2m(ManyToMany("analysis", "file_resource", "analysis_logs",
                   "analysis_id", "file_resource_id",
                   accessor="logs", reverse_accessor="analysis_logs_for"))
    # Curation.sequencedatasets through CurationDataset (models.py:1018-1023)
    m2m(ManyToMany("curation", "sequence_dataset", "curation_dataset",
                   "curation_id", "sequencedataset_id",
                   accessor="sequencedatasets", reverse_accessor="curations"))
    return cat

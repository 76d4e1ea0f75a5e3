"""Cross-entity free-text search (SURVEY.md §3.3).

Reference: ``search_util/search_helper.py:8-49`` annotates a ``SearchVector``
over each entity's field list (``search_util/search_fields.py:20-39``, with
joined paths like ``sample__sample_id`` and ``tags__name``), filters
``icontains``, unions 7 entity result lists, dedups with ``set()`` and
counts. It also maps free text onto enum *display labels*
(``partial_key_match`` search_helper.py:51-55) and appends datasets matching
the decoded enum value.

Spark design: one search view per entity — root LEFT-joined to every path in
its field list inside a single join context (shared instances, like one
SearchVector annotate), ``lower(concat_ws(' ', ...))`` as the search column,
match → distinct root ids → display row. The per-entity frames union into a
single job; the reference runs 9 sequential SQL queries.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tantalus_spark.catalog.loader import Database
from tantalus_spark.compiler.compiler import _JoinFrame

# field lists mirror search_util/search_fields.py:20-39 (accessor names per
# this engine's catalog; *_type FK paths resolve to the joined name column)
SEARCH_FIELDS: dict[str, list[str]] = {
    "patient": ["patient_id", "reference_id", "external_patient_id",
                "samples__sample_id"],
    "sample": ["sample_id", "projects__name", "external_sample_id",
               "submitter", "researcher", "tissue", "note",
               "patient__patient_id"],
    "sequence_dataset": [
        "sample__sample_id", "sample__external_sample_id", "sample__tissue",
        "sample__note", "library__library_id", "library__library_type__name",
        "sequence_lanes__flowcell_id", "sequence_lanes__sequencing_centre",
        "sequence_lanes__sequencing_instrument", "aligner__name",
        "reference_genome__name", "name", "dataset_type", "owner__username",
    ],
    "submission": ["sample__sample_id", "sow__name", "submitted_by",
                   "library_type__name"],
    "results_dataset": [
        "name", "results_type", "results_version", "owner__username",
        "tags__name", "analysis__name", "analysis__jira_ticket",
        "analysis__status", "samples__sample_id",
        "samples__external_sample_id", "samples__tissue", "samples__note",
        "libraries__library_type__name", "libraries__library_id",
    ],
    "analysis": ["analysis_type__name", "owner__username", "name",
                 "jira_ticket", "version", "status", "input_datasets__name",
                 "input_results__name"],
    "tag": ["name", "owner__username", "sequencedataset__name",
            "resultsdataset__name"],
}

DISPLAY_COLS: dict[str, str] = {
    "patient": "patient_id",
    "sample": "sample_id",
    "sequence_dataset": "name",
    "submission": "submitted_by",
    "results_dataset": "name",
    "analysis": "name",
    "tag": "name",
}

CATEGORY: dict[str, str] = {
    "patient": "sample", "sample": "sample",
    "sequence_dataset": "dataset", "results_dataset": "dataset",
    "submission": "analysis", "analysis": "analysis", "tag": "analysis",
}

# enum display labels (search_fields.py:7-16) for partial_key_match
SEQUENCING_CENTRE_LABELS = {
    "Genome Science Centre": "GSC",
    "Biomedical Research Centre": "BRC",
}
DATASET_TYPE_LABELS = {
    "BAM Files": "BAM", "FastQ Files": "FQ", "BCL Files": "BCL",
}


def partial_key_match(lookup: str, labels: dict[str, str]) -> str | None:
    """Free text substring-matches a choice *label* → its code
    (search_helper.py:51-55)."""
    for label, code in labels.items():
        if lookup in label:
            return code
    return None


def entity_matches(db: Database, table: str, fields: list[str],
                   query: str, tokenized: bool = False) -> DataFrame:
    """Distinct root rows whose concatenated search text contains *query*
    (case-insensitive). One join context = one SearchVector annotate.

    ``tokenized=True`` is the SearchVector-faithful mode (reference
    ``Q(search=q)`` with a ``SearchVector``): the query splits on
    whitespace and EVERY token must appear somewhere in the concatenated
    text (AND of containments), instead of one whole-phrase substring."""
    qs = db.query(table)
    frame = _JoinFrame(qs, db.table(table))
    cols = [frame.resolve(path)[0] for path in fields]
    search = F.lower(F.concat_ws(" ", *[c.cast("string") for c in cols]))
    if tokenized:
        pred = F.lit(True)
        for token in query.lower().split():
            pred = pred & search.contains(token)
    else:
        pred = search.contains(query.lower())
    pk = db.catalog.pk(table)
    matched = (
        frame.df.filter(pred)
        .select(F.col(f"{frame.root_alias}.{pk}").alias("id"))
        .dropDuplicates(["id"])
    )
    display = DISPLAY_COLS[table]
    return (
        db.table(table).join(matched, on="id", how="left_semi")
        .select(
            F.lit(CATEGORY[table]).alias("category"),
            F.lit(table).alias("entity"),
            F.col("id"),
            F.col(display).cast("string").alias("display"),
        )
    )


def free_text_search(db: Database, query: str,
                     tokenized: bool = False) -> DataFrame:
    """The full §3.3 pipeline as ONE logical plan: 7 entity scans + the two
    enum-label bonus scans, unioned and deduplicated."""
    frames = [
        entity_matches(db, table, fields, query, tokenized=tokenized)
        for table, fields in SEARCH_FIELDS.items()
    ]
    centre = partial_key_match(query, SEQUENCING_CENTRE_LABELS)
    if centre:
        frames.append(
            db.query("sequence_dataset")
            .filter(sequence_lanes__sequencing_centre=centre)
            .to_df()
            .select(F.lit("dataset").alias("category"),
                    F.lit("sequence_dataset").alias("entity"),
                    F.col("id"), F.col("name").alias("display"))
        )
    dtype = partial_key_match(query, DATASET_TYPE_LABELS)
    if dtype:
        frames.append(
            db.query("sequence_dataset").filter(dataset_type=dtype).to_df()
            .select(F.lit("dataset").alias("category"),
                    F.lit("sequence_dataset").alias("entity"),
                    F.col("id"), F.col("name").alias("display"))
        )
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out.dropDuplicates(["entity", "id"])


def search_totals(results: DataFrame) -> DataFrame:
    """Grand total + per-entity counts (search_helper.py:44-47)."""
    return results.groupBy("category", "entity").agg(
        F.count(F.lit(1)).alias("n")
    )

"""JSONL corpus IO — the de-facto interchange format for LLM training
data (one JSON document per line, optionally gzip-compressed).

Spark's json datasource handles distributed line splitting, codecs and
schema application, but its corrupt-record column is query-restricted
(QUERY_ONLY_CORRUPT_RECORD_COLUMN forbids exactly the quarantine
select/count an ingest job needs). ``read_jsonl`` therefore reads LINES
with the text source and parses with ``from_json`` — same Jackson parser
underneath, no restriction, and the raw line is first-class so malformed
records can be counted and quarantined instead of silently nulled
(PERMISSIVE), dropped (DROPMALFORMED), or crashing a multi-hour scan
(FAILFAST).

Two decisions are pinned for corpus scale:

- **Never infer the schema.** Inference is a full extra pass over 100 TB
  and a correctness trap (a shard whose every ``meta`` field happens to
  be null infers a different type than its neighbors). Callers pass an
  explicit StructType, or :data:`DOCUMENT_SCHEMA` for the standard
  (id, text, source, lang) corpus shape.
- **This is a front door, not a home.** ``from_json`` parses the full
  declared schema (no per-field pruning pushdown like the native json
  scan) — the intended pattern is read → :func:`split_corrupt` →
  write parquet once, then query the columnar copy. For gzip inputs the
  file count sets parallelism (.gz is not splittable); shard corpora
  into many few-hundred-MB files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the common (id, text, source, lang) training-corpus line shape
DOCUMENT_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("lang", T.StringType()),
])

CORRUPT_COL = "_corrupt"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    line_sep: str | None = None,
) -> DataFrame:
    """Schema-pinned JSONL read with corrupt lines captured, not dropped.

    Returns the schema's columns plus a ``_corrupt`` string column that
    is null for well-formed rows and carries the raw line for malformed
    ones (blank lines are skipped). Compression (.gz per file) is
    transparent via the text source.
    """
    if any(f.name == CORRUPT_COL for f in schema.fields):
        raise ValueError(f"schema must not predeclare {CORRUPT_COL!r}")
    reader = spark.read
    if line_sep is not None:
        reader = reader.option("lineSep", line_sep)
    lines = reader.text(path).filter(F.length(F.trim("value")) > 0)
    # PERMISSIVE with an in-struct corrupt field: a malformed line yields
    # nulls for the data fields and the raw line in the corrupt field —
    # exact per-row quarantine without the json datasource's
    # QUERY_ONLY_CORRUPT_RECORD_COLUMN restriction (FAILFAST is no use
    # here: in from_json it aborts the whole job on the first bad line).
    full = T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())])
    parsed = lines.select(
        F.from_json(
            "value", full,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("_r"),
    )
    return parsed.select(
        *[F.col(f"_r.{f.name}").alias(f.name) for f in schema.fields],
        F.col(f"_r.{CORRUPT_COL}").alias(CORRUPT_COL),
    )


def split_corrupt(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(clean_rows_without_corrupt_col, corrupt_lines) — the quarantine
    split every ingest job should do before touching the data."""
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()) \
        .select(F.col(CORRUPT_COL).alias("raw_line"))
    return clean, bad


def write_jsonl(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    compression: str | None = "gzip",
    target_rows_per_file: int | None = None,
) -> None:
    """Write a corpus as sharded JSONL. ``target_rows_per_file`` caps
    shard size via ``maxRecordsPerFile`` (the writer splits oversized
    partitions without a shuffle) — the knob that keeps downstream
    gzip shards re-readable in parallel."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    if target_rows_per_file:
        writer = writer.option("maxRecordsPerFile", target_rows_per_file)
    writer.json(path)

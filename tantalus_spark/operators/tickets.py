"""Ticket-payload construction for analysis-creation orchestration.

The reference couples analysis creation to a live JIRA server
(`tantalus/views.py:317-340` builds the issue dict and calls
``jira_server.create_issue``; `tantalus/forms.py:47-78` validates the
project name against ``jira_server.projects()`` and rejects duplicate
analysis names). An analytics engine cannot — and should not — own that
network side effect, but everything up to the API call is a data
transformation, and THAT is implemented here Spark-first:

- the issue payload per analysis (project id resolved by
  case-insensitive name, the reference's ``views.py:324-326`` loop, as
  a broadcast join; summary/description/issuetype/reporter/assignee
  fields mirroring ``views.py:330-337``), and
- the form validations as DATA instead of exceptions: unknown project
  (`forms.py:69-73`) and duplicate analysis name (`forms.py:75-76`)
  become per-row rejection reasons, the same 0/1/N-classify shape as
  `sources/ingest.py`'s match classification.

The external submission boundary stays pluggable: feed ``ok`` rows to
whatever actually talks to the tracker (``collect()`` on the bounded
accepted set, or a foreachBatch sink in streaming) — the engine's
contract ends at correct, validated payload rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_analysis_tickets(
    analyses: DataFrame,
    projects: DataFrame,
    existing_names: DataFrame | None = None,
    issue_type: str = "Task",
) -> DataFrame:
    """Build one validated ticket payload row per analysis request.

    ``analyses``: (name, description, reporter, assignee, project_name);
    ``projects``: (project_id, project_name) — the tracker's project
    list, a small dimension that BROADCASTS (the reference iterates it
    per request, ``views.py:324-326``); ``existing_names``: (name) of
    already-taken analysis names.

    Returns every request annotated with ``project_id``, the payload
    fields (``summary`` = the reference's title template,
    ``views.py:328``), ``ok``, and ``reject_reason`` (NULL when ok):
    unknown project and duplicate name rejections mirror the form's two
    ValidationErrors as data. Project-name matching is
    case-insensitive, as in the view's resolution loop."""
    proj = projects.select(
        F.col("project_id"),
        F.lower(F.col("project_name")).alias("_pkey"))
    out = (
        analyses
        .withColumn("_pkey", F.lower(F.col("project_name")))
        .join(F.broadcast(proj), "_pkey", "left")
    )
    if existing_names is not None:
        taken = existing_names.select(
            F.col("name").alias("_taken")).distinct()
        out = out.join(F.broadcast(taken),
                       out["name"] == F.col("_taken"), "left")
    else:
        out = out.withColumn("_taken", F.lit(None).cast("string"))
    reason = (
        F.when(F.col("project_id").isNull(),
               F.lit("Project Name Doesn't Exist"))
         .when(F.col("_taken").isNotNull(),
               F.lit("Analysis Name Already Taken"))
    )
    return (
        out.select(
            "name", "project_name", "project_id",
            F.concat(F.lit("Analysis Ticket For of "), F.col("name"))
             .alias("summary"),
            "description",
            F.lit(issue_type).alias("issue_type"),
            "reporter", "assignee",
            reason.alias("reject_reason"),
        )
        .withColumn("ok", F.col("reject_reason").isNull())
    )

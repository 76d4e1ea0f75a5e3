"""Ticket-payload construction (the side-effect-free half of the
reference's JIRA orchestration, tantalus/views.py:317-340 +
tantalus/forms.py:47-78)."""

from __future__ import annotations


def test_ticket_payloads_resolve_and_validate(spark):
    from tantalus_spark.operators.tickets import build_analysis_tickets

    analyses = spark.createDataFrame(
        [("run_a", "desc a", "alice", "bob", "ShahLab"),
         ("run_b", "desc b", "alice", "bob", "nosuch"),
         ("run_c", "desc c", "carol", "dan", "SHAHLAB"),
         ("taken", "desc d", "carol", "dan", "ShahLab")],
        "name string, description string, reporter string, "
        "assignee string, project_name string")
    projects = spark.createDataFrame(
        [(101, "shahlab"), (102, "other")],
        "project_id long, project_name string")
    existing = spark.createDataFrame([("taken",)], "name string")

    out = {r["name"]: r for r in build_analysis_tickets(
        analyses, projects, existing_names=existing).collect()}
    # case-insensitive project resolution (the views.py lower() loop)
    assert out["run_a"]["project_id"] == 101 and out["run_a"]["ok"]
    assert out["run_c"]["project_id"] == 101 and out["run_c"]["ok"]
    # the form's two ValidationErrors, as data
    assert out["run_b"]["reject_reason"] == "Project Name Doesn't Exist"
    assert not out["run_b"]["ok"]
    assert out["taken"]["reject_reason"] == "Analysis Name Already Taken"
    # payload fields mirror the issue dict
    assert out["run_a"]["summary"] == "Analysis Ticket For of run_a"
    assert out["run_a"]["issue_type"] == "Task"
    assert out["run_a"]["reporter"] == "alice"
    assert out["run_a"]["assignee"] == "bob"


def test_ticket_payloads_without_existing_set(spark):
    from tantalus_spark.operators.tickets import build_analysis_tickets

    analyses = spark.createDataFrame(
        [("x", "d", "r", "a", "other")],
        "name string, description string, reporter string, "
        "assignee string, project_name string")
    projects = spark.createDataFrame(
        [(7, "other")], "project_id long, project_name string")
    rows = build_analysis_tickets(analyses, projects).collect()
    assert rows[0]["ok"] and rows[0]["project_id"] == 7

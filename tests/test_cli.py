"""CLI entrypoint (`python -m datalake_project_spark`): list/run/sql
reach the registry and the SQL entrypoint; unknown names fail with a
non-zero exit instead of a traceback."""

from __future__ import annotations

import json

from datalake_project_spark.__main__ import main


def test_cli_list_filters(capsys, spark):
    assert main(["list", "--grep", "snapshot_diff"]) == 0
    out = capsys.readouterr().out
    assert "q_snapshot_diff" in out and "q_dedup_exact" not in out


def test_cli_run_json_rows(capsys, spark):
    assert main(["run", "q_snapshot_diff",
                 "--sf-dir", "/root/testdata/sf0.001",
                 "--limit", "5", "--json"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert 0 < len(rows) <= 5
    assert set(rows[0]) == {"custkey", "change"}


def test_cli_run_unknown_query_exits_nonzero(capsys, spark):
    assert main(["run", "q_definitely_not_a_query"]) == 2


def test_cli_sql(capsys, spark):
    assert main(["sql", "SELECT COUNT(*) AS n FROM region",
                 "--sf-dir", "/root/testdata/sf0.001", "--json"]) == 0
    rows = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert rows[0]["n"] == 5


def test_cli_schedule_success_marker_and_skip(capsys, spark, monkeypatch,
                                              tmp_path):
    """The scheduler shim: a run succeeds, writes its success marker, and
    re-delivery of the same (query, run_ts) tick is a no-op — the
    at-least-once-cron idempotency the reference got from Airflow."""
    monkeypatch.setenv("DATALAKE_SPARK_SCRATCH", str(tmp_path))
    args = ["schedule", "q1_pricing_summary",
            "--sf-dir", "/root/testdata/sf0.001",
            "--run-ts", "20260101T000000", "--retries", "0"]
    assert main(args) == 0
    out1 = capsys.readouterr().out
    assert "ok" in out1
    marker = tmp_path / "sched" / "q1_pricing_summary" / "20260101T000000.done"
    assert marker.exists()
    assert main(args) == 0
    assert "skipping" in capsys.readouterr().out


def test_cli_schedule_retries_then_fails(capsys, spark, monkeypatch,
                                         tmp_path):
    monkeypatch.setenv("DATALAKE_SPARK_SCRATCH", str(tmp_path))
    assert main(["schedule", "q_no_such_query"]) == 2
    # a real query against a missing fixture dir exhausts retries -> 1
    assert main(["schedule", "q1_pricing_summary",
                 "--sf-dir", str(tmp_path / "nope"),
                 "--run-ts", "20260101T000001",
                 "--retries", "1", "--retry-delay", "0.01"]) == 1
    out = capsys.readouterr().out
    assert "FAILED after 2 attempts" in out


def test_cli_sdp_runs_reference_dataflow(capsys, spark, tmp_path):
    """`python -m datalake_project_spark sdp`: the shipped SDP
    reference dataflow runs under the local interpreter and prints
    every target with its row count."""
    assert main(["sdp", "--storage", str(tmp_path / "sdp"),
                 "--limit", "3"]) == 0
    out = capsys.readouterr().out
    for target in ("filtered_orders", "enriched_orders",
                   "nation_revenue"):
        assert f"== {target} (" in out
    for v in ("filtered_orders", "enriched_orders", "nation_revenue"):
        spark.catalog.dropTempView(v)


def test_schedule_default_run_ts_is_tick_truncated(monkeypatch):
    """Airflow logical_date discipline: two deliveries inside one
    schedule tick derive the SAME default run_ts, so the idempotency
    marker dedups a late cron re-delivery of a missed tick."""
    from datalake_project_spark.scheduler import tick_run_ts

    on_time = tick_run_ts(3600, now=1767229200.0)       # exactly on the hour
    late = tick_run_ts(3600, now=1767229200.0 + 1742.0)  # ~29 min late
    assert on_time == late
    nxt = tick_run_ts(3600, now=1767229200.0 + 3600.0)
    assert nxt != on_time
    # the string is the truncated UTC hour
    assert on_time.endswith("0000")

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

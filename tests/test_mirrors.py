"""LIVE JDBC mirror round-trip (reference K5/S6).

No Postgres server exists in the sandbox, but Spark ships Apache Derby
(an embedded, file-backed JDBC database) on its classpath for the Hive
metastore — so the JDBC write and read paths are exercised against a
REAL JDBC connection end-to-end, mirroring the reference's Postgres
mirror (`scripts/script_api_apify_to_spark.py:282-294`) with only the
URL/driver swapped. The Postgres-specific option assembly is covered by
the contract tests in test_pipeline.py.
"""

from __future__ import annotations

import pytest

from datalake_project_spark.sources.mirrors import (
    JdbcConfig, jdbc_append, jdbc_read)


@pytest.fixture()
def derby_cfg(tmp_path):
    return JdbcConfig(url=f"jdbc:derby:{tmp_path}/mirrordb;create=true",
                      user="app", password="app",
                      driver="org.apache.derby.jdbc.EmbeddedDriver")


def test_jdbc_roundtrip_embedded(spark, derby_cfg):
    df = spark.createDataFrame(
        [("alice", "female", 0.9), ("bob", "male", 0.8)],
        "username string, predicted_gender string, confidence double")
    jdbc_append(df, derby_cfg, "final-aggregated")  # name gets sanitized
    back = jdbc_read(spark, derby_cfg, "final-aggregated")
    assert sorted(tuple(r) for r in back.collect()) == [
        ("alice", "female", 0.9), ("bob", "male", 0.8)]


def test_jdbc_append_is_append_not_overwrite(spark, derby_cfg):
    df = spark.createDataFrame([("a", 1)], "username string, n int")
    jdbc_append(df, derby_cfg, "mirror")
    jdbc_append(df, derby_cfg, "mirror")
    assert jdbc_read(spark, derby_cfg, "mirror").count() == 2


def test_jdbc_partitioned_parallel_read(spark, derby_cfg):
    """S6 at scale: partitionColumn+bounds splits the scan into parallel
    range queries — verify the split read returns the full table."""
    df = spark.range(0, 100).withColumnRenamed("id", "k")
    jdbc_append(df, derby_cfg, "wide")
    back = jdbc_read(spark, derby_cfg, "wide", partition_column="k",
                     num_partitions=4, lower_bound=0, upper_bound=100)
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg({"k": "sum"}).first()[0] == 4950


@pytest.fixture()
def es_stub():
    """Local HTTP stub standing in for an Elasticsearch node: records
    every request (method, path, body) so tests can assert the exact
    bulk protocol the sink speaks. No ES server exists in the sandbox;
    the REST protocol is the contract."""
    import json
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    requests: list[dict] = []

    class Handler(BaseHTTPRequestHandler):
        def _record(self):
            n = int(self.headers.get("Content-Length", 0))
            body = self.rfile.read(n).decode() if n else ""
            requests.append({"method": self.command, "path": self.path,
                             "body": body})
            out = json.dumps({"errors": False, "items": []}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(out)))
            self.end_headers()
            self.wfile.write(out)

        do_POST = do_DELETE = do_PUT = _record

        def log_message(self, *a):  # silence
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], requests
    srv.shutdown()


def test_es_http_bulk_shape(spark, es_stub):
    """K6 beyond option assembly: the sink's bulk request must carry the
    target index on every action line and key each doc by the username
    column (reference airflow/dags/apify_dag.py:299) — the upsert
    contract that makes re-runs idempotent."""
    import json

    from datalake_project_spark.sources.mirrors import EsConfig, es_write_http

    port, requests = es_stub
    df = spark.createDataFrame(
        [("alice", "female", 0.9), ("bob", "male", 0.8)],
        "username string, predicted_gender string, confidence double")
    es_write_http(df.coalesce(1), EsConfig(nodes="127.0.0.1", port=str(port)),
                  "final_aggregated_index", mapping_id="username")
    bulks = [r for r in requests if r["path"] == "/_bulk"]
    assert len(bulks) == 1 and bulks[0]["method"] == "POST"
    lines = [json.loads(l) for l in bulks[0]["body"].strip().split("\n")]
    actions, docs = lines[0::2], lines[1::2]
    assert [a["index"]["_index"] for a in actions] == ["final_aggregated_index"] * 2
    assert sorted(a["index"]["_id"] for a in actions) == ["alice", "bob"]
    by_id = {a["index"]["_id"]: d for a, d in zip(actions, docs)}
    assert by_id["alice"]["predicted_gender"] == "female"
    assert by_id["bob"]["confidence"] == 0.8


def test_es_http_overwrite_deletes_index_first(spark, es_stub):
    """mode='overwrite' matches the connector's truncate-then-write:
    exactly one DELETE /<index> precedes the bulk POSTs; append mode
    must never delete."""
    from datalake_project_spark.sources.mirrors import EsConfig, es_write_http

    port, requests = es_stub
    cfg = EsConfig(nodes="127.0.0.1", port=str(port))
    df = spark.createDataFrame([("a", 1)], "username string, n int")
    es_write_http(df, cfg, "idx_ow", mode="overwrite")
    deletes = [r for r in requests if r["method"] == "DELETE"]
    assert [d["path"] for d in deletes] == ["/idx_ow"]
    assert requests[0]["method"] == "DELETE"  # delete precedes bulks
    before = len(requests)
    es_write_http(df, cfg, "idx_ow", mode="append")
    assert all(r["method"] != "DELETE" for r in requests[before:])


def test_es_http_batches_within_partition(spark, es_stub):
    """batch_docs bounds each bulk body: 10 docs at batch_docs=4 in one
    partition must arrive as bodies of 4+4+2 docs (distributed batching,
    no driver collect)."""
    from datalake_project_spark.sources.mirrors import EsConfig, es_write_http

    port, requests = es_stub
    df = spark.range(10).selectExpr("cast(id as string) AS username", "id AS n")
    es_write_http(df.coalesce(1), EsConfig(nodes="127.0.0.1", port=str(port)),
                  "idx_b", batch_docs=4)
    sizes = [len(r["body"].strip().split("\n")) // 2
             for r in requests if r["path"] == "/_bulk"]
    assert sorted(sizes, reverse=True) == [4, 4, 2]

"""External mirror connectors: JDBC (PostgreSQL) and Elasticsearch.

Reference sites: JDBC read-back + append
(`scripts/script_api_apify_to_spark.py:268-294`, fixed tables at
`airflow/dags/apify_dag.py:216-246`); ES overwrite with doc id mapped to
``username`` (`airflow/dags/apify_dag.py:290-318`).

These wrap the stock Spark connectors — the idiomatic path the reference
already uses — plus the two corrections our engine makes:
- table-name sanitization is explicit and total (`[^a-zA-Z0-9_]` -> `_`,
  not just `-` -> `_` as at `scripts/script_api_apify_to_spark.py:265`);
- the aggregated and the diff tables go to DISTINCT ES indices (the
  reference writes both to ``final_aggregated_index``,
  `airflow/dags/apify_dag.py:298,314`, while logging that the second went
  to ``final_comparatif_index`` — a data-loss bug we do not reproduce).

No Postgres/ES server is available in the test environment. JDBC is
covered by a LIVE embedded-Derby round-trip (tests/test_mirrors.py); the
ES connector path (:func:`es_write`) is covered by option-assembly
contract tests (the es-hadoop jar is Scala-version-locked and can't load
here), while :func:`es_write_http` — the jar-free REST ``_bulk`` twin —
is exercised live against a local HTTP stub asserting the full bulk
protocol (index name, ``username`` doc-id keying, overwrite-deletes-
index-first, per-partition batching).
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def sanitize_table_name(name: str) -> str:
    """Total SQL-identifier sanitization (reference only mapped '-'->'_')."""
    out = re.sub(r"[^a-zA-Z0-9_]", "_", name)
    if not out or out[0].isdigit():
        out = "t_" + out
    return out.lower()


@dataclass(frozen=True)
class JdbcConfig:
    url: str                      # e.g. jdbc:postgresql://host:5432/db
    user: str
    password: str
    driver: str = "org.postgresql.Driver"

    def options(self, table: str) -> dict[str, str]:
        return {"url": self.url, "dbtable": sanitize_table_name(table),
                "user": self.user, "password": self.password,
                "driver": self.driver}


def jdbc_read(spark: SparkSession, cfg: JdbcConfig, table: str,
              partition_column: str | None = None,
              num_partitions: int = 8,
              lower_bound: int | None = None,
              upper_bound: int | None = None) -> DataFrame:
    """JDBC scan (reference S6). For big tables pass ``partition_column``
    + bounds so the read is split into ``num_partitions`` parallel range
    queries instead of one executor pulling everything."""
    reader = spark.read.format("jdbc").options(**cfg.options(table))
    if partition_column is not None:
        reader = (reader.option("partitionColumn", partition_column)
                  .option("numPartitions", str(num_partitions))
                  .option("lowerBound", str(lower_bound))
                  .option("upperBound", str(upper_bound)))
    return reader.load()


def jdbc_append(df: DataFrame, cfg: JdbcConfig, table: str,
                batch_size: int = 10_000) -> None:
    """JDBC append sink (reference K5) with batched inserts."""
    (df.write.format("jdbc").options(**cfg.options(table))
     .option("batchsize", str(batch_size))
     .mode("append").save())


@dataclass(frozen=True)
class EsConfig:
    nodes: str = "localhost"
    port: str = "9200"

    def options(self, index: str, mapping_id: str | None) -> dict[str, str]:
        opts = {"es.nodes": self.nodes, "es.port": self.port,
                "es.resource": index}
        if mapping_id:
            opts["es.mapping.id"] = mapping_id   # upsert key (reference :299)
        return opts


def es_write(df: DataFrame, cfg: EsConfig, index: str,
             mapping_id: str | None = "username",
             mode: str = "overwrite") -> None:
    """Elasticsearch sink (reference K6): doc id = ``mapping_id`` column
    so re-runs upsert instead of duplicating documents."""
    (df.write.format("org.elasticsearch.spark.sql")
     .options(**cfg.options(index, mapping_id))
     .mode(mode).save())


def es_write_http(df: DataFrame, cfg: EsConfig, index: str,
                  mapping_id: str | None = "username",
                  mode: str = "append",
                  batch_docs: int = 1_000,
                  timeout_s: float = 30.0) -> None:
    """Elasticsearch sink over the public REST ``_bulk`` protocol — the
    jar-free twin of :func:`es_write` (reference K6,
    ``airflow/dags/apify_dag.py:290-318``), used when the es-hadoop
    connector isn't on the classpath (it is Scala-version-locked; this
    path has no JVM dependency at all).

    Each PARTITION posts its rows as NDJSON bulk bodies of
    ``batch_docs`` docs (action line ``{"index": {"_index": ...,
    "_id": <row[mapping_id]>}}`` + source line), so the write is
    distributed and batched exactly like the connector's: N executors
    stream to ES concurrently, no driver collect. ``mapping_id`` keys
    the doc id (upsert-on-rerun, reference :299); ``mode="overwrite"``
    issues one driver-side ``DELETE /<index>`` first (ignore-404),
    matching the connector's truncate-then-write.
    """
    import json as _json
    import urllib.error
    import urllib.request

    base = f"http://{cfg.nodes}:{cfg.port}"
    target = f"{base}/_bulk"
    if mode == "overwrite":
        req = urllib.request.Request(f"{base}/{index}", method="DELETE")
        try:
            urllib.request.urlopen(req, timeout=timeout_s).read()
        except urllib.error.HTTPError as e:
            if e.code != 404:
                raise
    cols = df.columns
    id_idx = cols.index(mapping_id) if mapping_id else None

    def _post(lines: list[str]) -> None:
        body = ("\n".join(lines) + "\n").encode()
        req = urllib.request.Request(
            target, data=body, method="POST",
            headers={"Content-Type": "application/x-ndjson"})
        urllib.request.urlopen(req, timeout=timeout_s).read()

    def _send_partition(rows) -> None:
        buf: list[str] = []
        for row in rows:
            doc = dict(zip(cols, row))
            action = {"index": {"_index": index}}
            if id_idx is not None:
                action["index"]["_id"] = str(row[id_idx])
            buf.append(_json.dumps(action, default=str))
            buf.append(_json.dumps(doc, default=str))
            if len(buf) >= 2 * batch_docs:
                _post(buf)
                buf = []
        if buf:
            _post(buf)

    df.foreachPartition(_send_partition)

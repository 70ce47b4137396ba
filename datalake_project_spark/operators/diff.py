"""Snapshot diff — the reference's core query (change-data-capture).

Reference semantics (`scripts/script_api_apify_to_spark.py:238-248`):
given a current and a previous snapshot of the same logical table,

    added   = current  LEFT ANTI JOIN previous ON keys   + change='added'
    deleted = previous LEFT ANTI JOIN current  ON keys   + change='deleted'
    diff    = added UNION deleted

and the global variant (`airflow/dags/apify_dag.py:198-211`) with labels
``added_global`` / ``deleted_global``.

Spark-first design notes (100 TB):
- Left-anti joins are planned by Catalyst as broadcast-hash anti (small
  side) or sort-merge anti with AQE skew splitting; with
  ``spark.sql.optimizer.runtime.bloomFilter.enabled`` the build side
  pushes a Bloom filter into the probe-side scan, so a diff of two huge
  snapshots only shuffles rows that might differ.
- Both anti-joins share the same join keys, so the two shuffles reuse the
  same exchange when the plans line up; we keep key order identical on
  both sides to allow exchange reuse.
- ``snapshot_diff_windowed`` gives the same result as one shuffle over a
  unified snapshot-series table (the formulation SURVEY.md §2.7 notes):
  preferable when diffing MANY consecutive snapshots at once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def snapshot_diff(current: DataFrame, previous: DataFrame, keys: list[str],
                  added_label: str = "added", deleted_label: str = "deleted",
                  change_col: str = "change") -> DataFrame:
    """Set-difference CDC diff of two snapshots with change labeling."""
    added = current.join(previous, on=keys, how="left_anti") \
        .withColumn(change_col, F.lit(added_label))
    deleted = previous.join(current, on=keys, how="left_anti") \
        .withColumn(change_col, F.lit(deleted_label))
    return added.unionByName(deleted)


def snapshot_diff_windowed(snapshots: DataFrame, keys: list[str], ts_col: str,
                           change_col: str = "change") -> DataFrame:
    """Diff every consecutive snapshot pair of a snapshot-series table.

    One shuffle on ``keys`` replaces N anti-join diffs: for each key we
    look at the ordered set of snapshot timestamps it appears in and emit
    'added' when it appears in a snapshot but not the immediately previous
    one, 'deleted' (stamped at the *next* snapshot ts) when it disappears.
    Requires the distinct list of snapshot timestamps (small; broadcast).
    """
    ts_list = [r[0] for r in snapshots.select(ts_col).distinct().orderBy(ts_col).collect()]
    if len(ts_list) < 2:
        empty = snapshots.select(*keys, F.col(ts_col).alias("snapshot_ts"),
                                 F.lit("").alias(change_col))
        return empty.where(F.lit(False))
    # prev/next snapshot-timestamp lookups: tiny literal maps, evaluated
    # JVM-side inside codegen (no join, no shuffle for the lookup).
    prv = {b: a for a, b in zip(ts_list, ts_list[1:])}
    nxt = {a: b for a, b in zip(ts_list, ts_list[1:])}
    prv_map = F.create_map(*[x for kv in prv.items() for x in (F.lit(kv[0]), F.lit(kv[1]))])
    nxt_map = F.create_map(*[x for kv in nxt.items() for x in (F.lit(kv[0]), F.lit(kv[1]))])

    w = Window.partitionBy(*keys).orderBy(ts_col)
    ordered = (snapshots.select(*keys, ts_col)
               .withColumn("_lag", F.lag(ts_col).over(w))
               .withColumn("_lead", F.lead(ts_col).over(w)))

    # Added at ts: key appears at ts but not at the snapshot before ts.
    added = ordered.where(
        (F.col(ts_col) != F.lit(ts_list[0]))
        & (F.col("_lag").isNull() | (F.col("_lag") != prv_map[F.col(ts_col)]))
    ).select(*keys, F.col(ts_col).alias("snapshot_ts"), F.lit("added").alias(change_col))

    # Deleted at nxt[ts]: key appears at ts but not at the snapshot after ts
    # (covers both permanent disappearance and gaps before a re-add).
    deleted = ordered.where(
        (F.col(ts_col) != F.lit(ts_list[-1]))
        & (F.col("_lead").isNull() | (F.col("_lead") != nxt_map[F.col(ts_col)]))
    ).select(*keys, nxt_map[F.col(ts_col)].alias("snapshot_ts"),
             F.lit("deleted").alias(change_col))

    return added.unionByName(deleted)

"""Query registry — the engine's declared capability surface.

Every operator family from SURVEY.md §2 (plus the north-star §2.11
extensions) is exercised by at least one named query here. Each entry
carries BOTH the Spark implementation and, where SQL-expressible, an
ANSI-SQL oracle that DuckDB runs over the same Parquet — the driver's
correctness gate compares the two (row count + schema + value hash).

Column names are aliased identically on both sides; double-typed
aggregates are rounded on both sides so ulp-level float summation-order
differences between engines don't flip the hash.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # ANSI SQL for DuckDB; None => rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc)
        return fn
    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module (side effect: fills REGISTRY)."""
    from datalake_project_spark.queries import (  # noqa: F401
        relational, relational2, relational3, cdc, events, text, dedup,
        similarity, streaming, multimodal,
    )
    return REGISTRY

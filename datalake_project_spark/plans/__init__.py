"""Physical-plan introspection: make scale properties testable.

"Would this plan survive a 100× scale-up?" is a question about the
PHYSICAL plan — how many exchanges it shuffles through, whether the
small side of a join broadcasts, whether filters and column pruning
reach the parquet scan, how much of the plan stays inside whole-stage
codegen. These helpers expose those properties as data so the test
suite can pin them (tests/test_plans.py), turning plan regressions
(e.g. a broadcast silently degrading to sort-merge) into test failures.

The reference has no analogue — its optimization is manual path pruning
and pandas projection (SURVEY.md §4.1); here Catalyst does the work and
these checks prove it did.
"""

from datalake_project_spark.plans.introspect import (  # noqa: F401
    broadcast_join_count,
    codegen_span_count,
    exchange_count,
    final_plan,
    formatted_plan,
    partition_filters,
    plan_summary,
    pushed_filters,
    scan_columns,
)

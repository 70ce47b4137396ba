"""Registry contract: every query loads, oracle keys are a subset,
and the flagship entry() smoke path works at sf0.001."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from datalake_project_spark.queries import load_all

SF_SMOKE = "/root/testdata/sf0.001"


def test_registry_nonempty_and_unique():
    reg = load_all()
    assert len(reg) >= 40
    for name, spec in reg.items():
        assert spec.name == name
        assert callable(spec.fn)
        assert spec.oracle is None or "SELECT" in spec.oracle.upper()


def test_entry_contract(spark):
    if not os.path.isdir(SF_SMOKE):
        import pytest
        pytest.skip("driver testdata not present")
    import __spark_entry__ as E
    df = E.entry(spark)
    assert df.count() >= 0
    assert set(E.oracle_sql()) <= set(E.queries())


def test_sql_entrypoint_equals_dataframe_query(spark):
    """The spark.sql surface over Catalog views must agree with the
    DataFrame formulation of the same query (one namespace, two APIs)."""
    from datalake_project_spark.catalog import Catalog
    from datalake_project_spark.queries import load_all
    from tests.conftest import rows

    cat = Catalog(spark, SF_SMOKE)
    via_sql = cat.sql("""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
    """)
    via_df = (load_all()["q1_pricing_summary"].fn(spark, SF_SMOKE)
              .select("l_returnflag", "l_linestatus", "count_order"))
    assert rows(via_sql) == rows(via_df)

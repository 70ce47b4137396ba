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

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


def test_duplicate_registration_raises():
    """register() must fail loudly on a name collision: a dict write
    would silently shadow the earlier registration (this bit once —
    two modules both registered q5_local_supplier_volume and only the
    later import survived the registry)."""
    import pytest
    from datalake_project_spark.queries import REGISTRY, register

    load_all()
    existing = next(iter(REGISTRY))
    with pytest.raises(ValueError, match="duplicate query registration"):
        register(existing, oracle=None)(lambda spark, sf_dir: None)


def test_entry_contract(spark):
    if not os.path.isdir(SF_SMOKE):
        import pytest
        pytest.skip("driver testdata not present")
    import __spark_entry__ as E
    df = E.entry(spark)
    assert df.count() >= 0
    assert set(E.oracle_sql()) <= set(E.queries())


def test_priority_names_all_exist():
    """A typo in PRIORITY silently drops the query from the driver's
    50-entry verification window — fail loudly instead."""
    from datalake_project_spark.queries import PRIORITY, REGISTRY
    load_all()
    missing = [n for n in PRIORITY if n not in REGISTRY]
    assert not missing, f"PRIORITY names not in REGISTRY: {missing}"
    assert len(set(PRIORITY)) == len(PRIORITY), "duplicate PRIORITY entries"


def test_every_family_in_driver_window():
    """The driver verifies only the first 50 registry entries; every
    operator family must keep at least one representative in that window."""
    families = {
        "cdc": ("q_snapshot", "q_latest", "q_write_roundtrip", "q_compact"),
        "dedup": ("q_dedup",),
        "ann": ("q_ann",),
        "text": ("q_text", "q_pack"),
        "events": ("q_events", "q_asof", "q_range"),
        "multimodal": ("q_multimodal",),
        "streaming": ("q_stream_",),
        # representatives rotate per round with the PRIORITY window; the
        # prefix sets name CURRENT in-window reps plus historic ones so
        # a future rotation keeps at least one match per family
        "relational": ("q1_", "q3_", "q9_", "q_json", "q_window",
                       "q_gender", "q_sql_", "q_customer", "q_skyline",
                       "q_geo_", "q_lateral", "q_linkage"),
        "lake": ("q_lake_", "q_merge", "q_manifest", "q_retention",
                 "q_tpch_refresh",
                 "q_write_audit", "q_snapshot_rollback", "q_replica_repair",
                 "q_zorder", "q_incremental_ingest", "q_file_inventory"),
        "retrieval": ("q_retrieval", "q_search_", "q_hybrid", "q_text_bm25"),
        "corpus": ("q_corpus",),
        "graph": ("q_graph",),
        "embed": ("q_embed",),
    }
    window = list(load_all())[:50]
    for fam, prefixes in families.items():
        hits = [n for n in window if n.startswith(prefixes)]
        assert hits, f"family {fam!r} has no query in the driver's window"


def test_oracles_emit_no_hugeint():
    """DuckDB promotes SUM/list_sum over integers to HUGEINT (int128),
    which the driver's value hasher normalizes differently from Spark's
    BIGINT — a silent hash-fail class (round-2 verdict). Lint every
    registered oracle's output schema via a LIMIT-0 run."""
    import duckdb

    from datalake_project_spark.catalog import TABLES

    if not os.path.isdir(SF_SMOKE):
        import pytest
        pytest.skip("driver testdata not present")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_SMOKE}/{t}.parquet')")
    bad = []
    for name, spec in load_all().items():
        if spec.oracle is None:
            continue
        rel = con.sql(f"SELECT * FROM ({spec.oracle}) LIMIT 0")
        for col, typ in zip(rel.columns, rel.types):
            if "HUGEINT" in str(typ).upper() or "INT128" in str(typ).upper():
                bad.append((name, col, str(typ)))
    assert not bad, f"oracle columns need CAST(... AS BIGINT): {bad}"


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

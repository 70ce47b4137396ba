"""The data-quality battery must actually FIRE on dirty data (the
fixture is clean, so the registered query's zeros need this proof that
the checks aren't vacuous)."""

from __future__ import annotations


def test_audit_checks_fire_on_dirty_data(spark, tmp_path):
    import pyspark.sql.functions as F

    from datalake_project_spark.queries.audit import q_data_quality_audit

    sf = tmp_path / "dirty"
    sf.mkdir()
    spark.createDataFrame(
        [(1, 10, 5.0), (1, 10, 6.0), (2, 99, 7.0)],  # dup pk; custkey 99 missing
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).write.parquet(str(sf / "orders.parquet"))
    spark.createDataFrame(
        [(10, None)], "c_custkey long, c_name string",  # null name
    ).write.parquet(str(sf / "customer.parquet"))
    spark.createDataFrame(
        [(1, 0.0), (2, 51.0), (3, 25.0)], "l_orderkey long, l_quantity double",
    ).write.parquet(str(sf / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, None)], "event_id long, ts timestamp",
    ).write.parquet(str(sf / "events.parquet"))
    spark.createDataFrame(
        [(1, ""), (2, None), (3, "ok")], "doc_id long, text string",
    ).write.parquet(str(sf / "documents.parquet"))

    got = {r.check_name: r.n_violations
           for r in q_data_quality_audit(spark, str(sf)).collect()}
    assert got == {
        "orders_pk_duplicates": 1,
        "orders_fk_customer_missing": 1,
        "lineitem_qty_out_of_range": 2,
        "customer_name_null": 1,
        "events_ts_null": 1,
        "documents_text_empty": 2,
    }

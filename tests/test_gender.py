"""Gender enrichment (reference F1) — native broadcast-join implementation
vs the Arrow pandas-UDF implementation must agree on every input shape the
reference handles (scripts/script_api_apify_to_spark.py:18-69): full-name
first token, cleaned-username fallback, best-confidence pick, nulls."""

from __future__ import annotations

from datalake_project_spark.functions.gender import (
    enrich_gender_native, enrich_gender_pandas_udf)
from tests.conftest import rows

LOOKUP = {
    "alice": "female", "bob": "male", "charlie": "mostly_male",
    "dana": "mostly_female", "eve": "female", "kim": "andy",
}


def _input(spark):
    data = [
        ("bob99", "Alice Smith"),     # full_name wins (0.9) over none
        ("alice", "Bob Jones"),       # both paths hit; full_name 0.9 > user 0.7
        ("ch_ar.lie", "Zzz Nope"),    # username cleaned -> charlie (0.4)
        ("nobody", "Dana"),           # mostly_female via full name (0.5)
        ("eve", None),                # null full_name -> username path (0.7)
        ("kim", "Kim"),               # 'andy' (ambiguous) -> unknown
        ("x9", ""),                   # nothing matches -> unknown
        (None, None),                 # all null -> unknown
    ]
    return spark.createDataFrame(data, "username string, full_name string")


def _lookup_df(spark):
    return spark.createDataFrame(list(LOOKUP.items()), "first_name string, gender string")


def test_native_semantics(spark):
    got = {r["username"]: (r["predicted_gender"], round(r["confidence"], 1))
           for r in enrich_gender_native(_input(spark), _lookup_df(spark)).collect()}
    assert got["bob99"] == ("female", 0.9)
    assert got["alice"] == ("male", 0.9)
    assert got["ch_ar.lie"] == ("male", 0.4)
    assert got["nobody"] == ("female", 0.5)
    assert got["eve"] == ("female", 0.7)
    assert got["kim"] == ("unknown", 0.0)
    assert got["x9"] == ("unknown", 0.0)
    assert got[None] == ("unknown", 0.0)


def test_native_equals_pandas_udf(spark):
    df = _input(spark)
    native = rows(enrich_gender_native(df, _lookup_df(spark))
                  .select("username", "full_name", "predicted_gender", "confidence"))
    udf = rows(enrich_gender_pandas_udf(df, LOOKUP)
               .select("username", "full_name", "predicted_gender", "confidence"))
    assert native == udf

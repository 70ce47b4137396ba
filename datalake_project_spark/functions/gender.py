"""Gender enrichment — reference parity for its single UDF (F1).

Reference semantics (`scripts/script_api_apify_to_spark.py:18-78`):
``guess_gender_best(full_name, username)`` returns a struct
``(predicted_gender, confidence)``:

1. take the first token of ``full_name``; if the lookup says male/female
   -> confidence 0.9, if mostly_male/mostly_female -> 0.5;
2. else clean ``username`` (strip non-letters) and look it up
   -> confidence 0.7 (definite) / 0.4 (mostly);
3. pick whichever candidate has higher confidence, else
   ('unknown', 0.0).

The reference uses the ``gender_guesser`` library's embedded dataset via a
row-at-a-time Python UDF — its single biggest physical-execution cost
(SURVEY §4.1). We pin semantics to an explicit name->gender lookup table
(FIXTURES.md `name_gender_lookup`) and provide two implementations:

- ``enrich_gender_native``: broadcast-join + ``F.when`` chain. Pure JVM,
  whole-stage codegen, the 100 TB path.
- ``enrich_gender_pandas_udf``: Arrow-vectorized pandas UDF returning the
  same struct — the shape to use when the lookup really is an opaque
  Python library.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import FloatType, StringType, StructField, StructType

GENDER_STRUCT = StructType([
    StructField("predicted_gender", StringType()),
    StructField("confidence", FloatType()),
])

_DEFINITE = {"male": "male", "female": "female"}
_MOSTLY = {"mostly_male": "male", "mostly_female": "female"}


def _candidate(gender_col, definite_conf: float, mostly_conf: float):
    """(gender, confidence) candidate from one lookup result column."""
    g = gender_col
    pred = (
        F.when(g.isin("male", "female"), g)
        .when(g == "mostly_male", F.lit("male"))
        .when(g == "mostly_female", F.lit("female"))
        .otherwise(F.lit("unknown"))
    )
    conf = (
        F.when(g.isin("male", "female"), F.lit(definite_conf))
        .when(g.isin("mostly_male", "mostly_female"), F.lit(mostly_conf))
        .otherwise(F.lit(0.0))
    )
    return pred, conf


def enrich_gender_native(df: DataFrame, lookup: DataFrame,
                         full_name_col: str = "full_name",
                         username_col: str = "username") -> DataFrame:
    """JVM-native gender enrichment via two broadcast left joins.

    ``lookup`` has columns (first_name, gender). Adds
    ``predicted_gender`` and ``confidence`` matching the reference's
    first-token / cleaned-username / best-confidence logic.
    """
    lk = F.broadcast(lookup.select(F.lower("first_name").alias("_k"),
                                   F.col("gender").alias("_g")))

    first_token = F.lower(F.split(F.trim(F.coalesce(F.col(full_name_col), F.lit(""))), "\\s+")[0])
    cleaned_user = F.lower(F.regexp_replace(F.coalesce(F.col(username_col), F.lit("")), "[^A-Za-z]", ""))

    out = (
        df.withColumn("_fn_key", first_token)
        .withColumn("_un_key", cleaned_user)
        .join(lk.withColumnRenamed("_g", "_g_fn"), F.col("_fn_key") == F.col("_k"), "left")
        .drop("_k")
        .join(lk.withColumnRenamed("_g", "_g_un"), F.col("_un_key") == F.col("_k"), "left")
        .drop("_k")
    )
    fn_pred, fn_conf = _candidate(F.col("_g_fn"), 0.9, 0.5)
    un_pred, un_conf = _candidate(F.col("_g_un"), 0.7, 0.4)
    best_pred = F.when(fn_conf >= un_conf, fn_pred).otherwise(un_pred)
    best_conf = F.when(fn_conf >= un_conf, fn_conf).otherwise(un_conf)
    return (
        out.withColumn("predicted_gender",
                       F.when(F.greatest(fn_conf, un_conf) > 0, best_pred).otherwise(F.lit("unknown")))
        .withColumn("confidence", best_conf.cast("float"))
        .drop("_fn_key", "_un_key", "_g_fn", "_g_un")
    )


def make_gender_pandas_udf(lookup_map: dict[str, str]):
    """Arrow-vectorized pandas UDF with the same semantics; ``lookup_map``
    is a plain dict captured in the closure (broadcast by Spark).
    """
    from pyspark.sql.functions import pandas_udf

    def _guess(series_full: pd.Series, series_user: pd.Series) -> pd.DataFrame:
        import re

        def one(full_name, username):
            cands = []
            token = (full_name or "").strip().split()
            if token:
                g = lookup_map.get(token[0].lower())
                if g in _DEFINITE:
                    cands.append((_DEFINITE[g], 0.9))
                elif g in _MOSTLY:
                    cands.append((_MOSTLY[g], 0.5))
            cleaned = re.sub("[^A-Za-z]", "", username or "").lower()
            if cleaned:
                g = lookup_map.get(cleaned)
                if g in _DEFINITE:
                    cands.append((_DEFINITE[g], 0.7))
                elif g in _MOSTLY:
                    cands.append((_MOSTLY[g], 0.4))
            if not cands:
                return "unknown", 0.0
            return max(cands, key=lambda c: c[1])

        out = [one(fn, un) for fn, un in zip(series_full, series_user)]
        return pd.DataFrame({"predicted_gender": [o[0] for o in out],
                             "confidence": [o[1] for o in out]})

    return pandas_udf(_guess, returnType=GENDER_STRUCT)


def enrich_gender_pandas_udf(df: DataFrame, lookup_map: dict[str, str],
                             full_name_col: str = "full_name",
                             username_col: str = "username") -> DataFrame:
    """Reference-shaped application: add struct column then flatten + drop
    (`scripts/script_api_apify_to_spark.py:174-178`)."""
    udf = make_gender_pandas_udf(lookup_map)
    return (
        df.withColumn("gender_info", udf(F.col(full_name_col), F.col(username_col)))
        .withColumn("predicted_gender", F.col("gender_info.predicted_gender"))
        .withColumn("confidence", F.col("gender_info.confidence"))
        .drop("gender_info")
    )

"""Structured Streaming operators: availableNow drains must equal the
batch formulations; watermarked dedup must bound state yet still dedup
within the watermark."""

from __future__ import annotations

from pyspark.sql import functions as F

from datalake_project_spark.catalog import Catalog
from datalake_project_spark.streaming import (
    events_stream, run_available_now, sessionized_agg, stream_dedup,
    user_profile_stream, windowed_agg,
)

SF = "/root/testdata/sf0.001"


def _rows(df, *order):
    return [tuple(r) for r in df.orderBy(*order).collect()]


def test_stream_is_streaming(spark):
    s = events_stream(spark, SF)
    assert s.isStreaming
    assert dict(s.dtypes)["ts"] == "timestamp"


def test_windowed_agg_matches_batch(spark):
    got = run_available_now(windowed_agg(events_stream(spark, SF)), "complete")
    exp = windowed_agg(Catalog(spark, SF).table("events"))
    assert _rows(got, "window_start", "event_type") == \
        _rows(exp, "window_start", "event_type")


def test_sessionized_agg_matches_batch(spark):
    got = run_available_now(
        sessionized_agg(events_stream(spark, SF), "30 minutes"), "complete")
    exp = sessionized_agg(Catalog(spark, SF).table("events"), "30 minutes")
    assert _rows(got, "user_id", "session_start") == \
        _rows(exp, "user_id", "session_start")


def test_stream_dedup_exact(spark):
    got = run_available_now(
        stream_dedup(events_stream(spark, SF), ["user_id", "event_type"]),
        "append")
    exp = (Catalog(spark, SF).table("events")
           .select("user_id", "event_type").distinct())
    assert _rows(got, "user_id", "event_type") == \
        _rows(exp, "user_id", "event_type")


def test_stream_dedup_within_watermark(spark):
    """Bounded-state dedup: within one micro-batch every duplicate key is
    still collapsed to its first occurrence."""
    got = run_available_now(
        stream_dedup(events_stream(spark, SF), ["user_id", "event_type"],
                     watermark="1 hour"),
        "append")
    exp = (Catalog(spark, SF).table("events")
           .select("user_id", "event_type").distinct())
    assert got.select("user_id", "event_type").distinct().count() == exp.count()
    assert got.count() == exp.count()


def test_user_profile_stream_matches_group_by(spark):
    got = run_available_now(
        user_profile_stream(events_stream(spark, SF)), "append")
    exp = (Catalog(spark, SF).table("events").groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.unix_micros(F.min("ts")).alias("first_ts_us"),
        F.unix_micros(F.max("ts")).alias("last_ts_us"),
    ))
    assert _rows(got, "user_id") == _rows(exp, "user_id")

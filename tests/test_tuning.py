"""Shuffle-sizing arithmetic: the partition count must scale linearly
with input bytes, respect the cores floor, and clamp at both ends."""

from __future__ import annotations

from datalake_project_spark.tuning import (
    DEFAULT_TARGET_PARTITION_BYTES, MAX_PARTITIONS, MIN_PARTITIONS,
    apply_shuffle_sizing, dir_bytes, suggest_shuffle_partitions,
)

GB = 1024 ** 3
TB = 1024 ** 4


def test_scales_linearly_with_input():
    # 100 TB at 128 MiB target -> 819,200 -> clamped to MAX
    assert suggest_shuffle_partitions(100 * TB) == MAX_PARTITIONS
    # 1 TB -> 8192 partitions of 128 MiB
    assert suggest_shuffle_partitions(1 * TB) == 8192
    assert suggest_shuffle_partitions(10 * GB) == 80


def test_small_input_floors():
    assert suggest_shuffle_partitions(0) == MIN_PARTITIONS
    assert suggest_shuffle_partitions(1) == MIN_PARTITIONS


def test_cores_floor_keeps_cluster_busy():
    # tiny shuffle on a 1000-executor x 4-core cluster: 2x cores floor
    assert suggest_shuffle_partitions(1 * GB, cluster_cores=4000) == 8000


def test_custom_target():
    assert suggest_shuffle_partitions(
        1 * GB, target_partition_bytes=64 * 1024 * 1024) == 16


def test_apply_from_real_footprint(spark, tmp_path):
    f = tmp_path / "blob.bin"
    f.write_bytes(b"x" * (2 * 1024 * 1024))
    assert dir_bytes(str(tmp_path)) == 2 * 1024 * 1024
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        n = apply_shuffle_sizing(spark, str(tmp_path))
        assert n == MIN_PARTITIONS  # 2 MiB -> floor
        assert spark.conf.get("spark.sql.shuffle.partitions") == str(n)
        # expansion factor grows the estimate
        big = apply_shuffle_sizing(
            spark, str(tmp_path),
            expansion=1024.0, target_partition_bytes=128 * 1024 * 1024)
        assert big == MIN_PARTITIONS * 2  # 2 GiB / 128 MiB = 16
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", saved)


def test_observation_collects_inflight_metrics(spark):
    """df.observe: named metrics computed DURING a job (no second scan)
    — the production pattern for row-count/quality counters on a
    pipeline write. Values must equal a direct aggregate."""
    from pyspark.sql import Observation, functions as F

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("g"))
    obs = Observation("pipeline_metrics")
    observed = df.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("id").alias("id_sum"),
        F.count(F.when(F.col("g") == 0, 1)).alias("n_g0"))
    # one action drives both the result and the metrics
    out = observed.groupBy("g").count().collect()
    assert len(out) == 7
    got = obs.get
    assert got["n_rows"] == 1000
    assert got["id_sum"] == 499500
    assert got["n_g0"] == len([i for i in range(1000) if i % 7 == 0])


def test_suggest_for_stage_floors_at_cores_and_scales(spark, tmp_path):
    """suggest_for_stage = per-stage repartition width: footprint x
    expansion / 128 MiB, floored at 2x the session's parallelism so
    small fixtures stay fully parallel, and it must NOT mutate the
    session conf (unlike apply_shuffle_sizing)."""
    from datalake_project_spark.tuning import suggest_for_stage

    f = tmp_path / "blob.bin"
    f.write_bytes(b"x" * (4 * 1024 * 1024))
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    cores = spark.sparkContext.defaultParallelism
    assert suggest_for_stage(spark, str(f)) == 2 * cores  # floor
    # 4 MiB x 65536 = 256 GiB -> 2048 partitions of 128 MiB
    assert suggest_for_stage(spark, str(f), expansion=65536.0) == 2048
    assert spark.conf.get("spark.sql.shuffle.partitions") == saved

from datalake_project_spark.operators.diff import snapshot_diff, snapshot_diff_windowed

__all__ = ["snapshot_diff", "snapshot_diff_windowed"]

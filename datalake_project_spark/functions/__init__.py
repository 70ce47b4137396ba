from datalake_project_spark.functions import text, vectors, gender

__all__ = ["text", "vectors", "gender"]

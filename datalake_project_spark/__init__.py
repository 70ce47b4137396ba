"""datalake_project_spark — a PySpark-native analytics engine.

A clean-room, Spark-first re-expression of the query and data-processing
capabilities of martin-lcr/datalake_project (a medallion data-lake pipeline:
REST ingest -> raw JSON -> formatted/usage Parquet -> snapshot diff ->
aggregation -> JDBC/Elasticsearch mirrors), generalized into a reusable
query layer over Parquet plus LLM-data-pipeline operators (dedup,
similarity search, text analysis, multimodal columns) designed for
100 TB scale.

Everything is expressed through the DataFrame / Spark SQL API so Catalyst
and Tungsten choose physical strategies (predicate pushdown, column
pruning, broadcast vs sort-merge joins, AQE skew handling, whole-stage
codegen). Python UDFs appear only as Arrow-vectorized pandas UDFs, and
only where built-in functions genuinely cannot express the semantics.
"""

from datalake_project_spark.session import get_spark, stop_spark
from datalake_project_spark.catalog import Catalog, TABLES

__all__ = ["get_spark", "stop_spark", "Catalog", "TABLES"]

__version__ = "0.1.0"

"""maple_spark — a PySpark-native analytics engine with the query surface of
the reference single-node RDBMS (williamxww/maple), re-expressed Spark-first.

Layout:
    session    SparkSession factory (AQE/CBO/Arrow/UTC)
    catalog    Parquet table catalog + temp-view registration
    operators  one builder per SURVEY.md §2 operator family
    functions  scalar function parity surface (§2.8)
    plans      EXPLAIN/ANALYZE + plan-shape assertions (§4)
    sources    CSV→Parquet ingest + encoding analyzer report (§1.3)
    pipelines  training-data ops: dedup, similarity, text, multimodal
    streaming  Structured Streaming over the events table (extension)
"""

from maple_spark.session import get_spark
from maple_spark.catalog import load_table, register_views, TABLES

__version__ = "0.1.0"
__all__ = ["get_spark", "load_table", "register_views", "TABLES"]

"""doris_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of apache/doris (reference studied read-only;
see SURVEY.md). Architecture is Spark-first: DataFrame/SQL plans optimized
by Catalyst, not a translation of the reference's C++ pipeline engine.
"""

from doris_spark.engine import Engine
from doris_spark.session import get_spark, load_tables, register_views

__all__ = ["Engine", "get_spark", "load_tables", "register_views"]

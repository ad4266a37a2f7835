"""Doris function-name surface for Spark.

register_all(spark) installs every Doris-only function name as a Spark SQL
temporary function so that Doris SQL runs unmodified. Names Spark already
has (the ~85% overlap measured in SURVEY §2.8) are not re-registered.
"""

from doris_spark.functions.registry import DORIS_SQL_FUNCTIONS, register_all

__all__ = ["register_all", "DORIS_SQL_FUNCTIONS"]

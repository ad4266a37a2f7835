"""Driver-gate query exercising the registered Doris-name SQL functions
(doris_spark/functions/registry.py) end-to-end through spark.sql, with a
DuckDB oracle recomputing each semantic independently."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from doris_spark.queries import query
from doris_spark.session import register_views


@query(
    "doris_fn_matrix",
    oracle="""
SELECT o_orderkey,
       o_orderdate + INTERVAL 1 YEAR AS plus1y,
       (year(o_orderdate) - 1995) * 12 + (month(o_orderdate) - 1)
         - CASE WHEN day(o_orderdate) < 1 THEN 1 ELSE 0 END AS mdiff,
       CASE WHEN o_orderdate = CAST(date_trunc('month', o_orderdate) AS TIMESTAMP)
            THEN o_orderdate
            ELSE CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) + INTERVAL 1 MONTH
       END AS mceil,
       CASE WHEN o_totalprice >= 0
            THEN floor(o_totalprice * 10) / 10
            ELSE ceil(o_totalprice * 10) / 10 END AS trunc1,
       CASE WHEN o_orderstatus < 'O' THEN -1
            WHEN o_orderstatus > 'O' THEN 1 ELSE 0 END AS sc,
       datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) + 719528 AS td,
       concat_ws('.',
         CAST((o_orderkey * 65536 >> 24) & 255 AS VARCHAR),
         CAST((o_orderkey * 65536 >> 16) & 255 AS VARCHAR),
         CAST((o_orderkey * 65536 >> 8) & 255 AS VARCHAR),
         CAST(o_orderkey * 65536 & 255 AS VARCHAR)) AS ip,
       year(o_orderdate) * 100 + weekofyear(o_orderdate) AS yw,
       CASE WHEN o_orderpriority = '' OR o_orderpriority IS NULL
            THEN true ELSE false END AS noe
FROM orders
WHERE o_orderkey < 200
""",
)
def doris_fn_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT o_orderkey,
               years_add(o_orderdate, 1)                              AS plus1y,
               months_diff(o_orderdate, TIMESTAMP '1995-01-01 00:00:00') AS mdiff,
               month_ceil(o_orderdate)                                AS mceil,
               truncate(o_totalprice, 1)                              AS trunc1,
               strcmp(o_orderstatus, 'O')                             AS sc,
               to_days(CAST(o_orderdate AS DATE))                     AS td,
               ipv4_num_to_string(o_orderkey * 65536)                 AS ip,
               yearweek(o_orderdate)                                  AS yw,
               null_or_empty(o_orderpriority)                         AS noe
        FROM orders
        WHERE o_orderkey < 200
        """
    )


@query(
    "ip_fns",
    oracle="""
WITH ips AS (
  SELECT c_custkey, (c_custkey * 2654435761) % 4294967296 AS n
  FROM customer WHERE c_custkey < 200
)
SELECT c_custkey, n,
       CAST((n >> 24) & 255 AS VARCHAR) || '.' || CAST((n >> 16) & 255 AS VARCHAR)
         || '.' || CAST((n >> 8) & 255 AS VARCHAR) || '.' || CAST(n & 255 AS VARCHAR)
         AS ip,
       n AS roundtrip,
       true AS valid,
       false AS invalid,
       ((n >> 24) & 255) = 10 AS in_10_8,
       ((n >> 28)) = (CAST(160 AS BIGINT) >> 4) AS in_a0_4
FROM ips ORDER BY c_custkey
""",
)
def ip_fns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IPv4 family (be/src/exprs/function/function_ip.cpp):
    num↔string round trip, validation, CIDR membership. IPs derived
    deterministically from custkey (Knuth-hash spread over the full
    address space); the oracle recomputes with shift arithmetic."""
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH ips AS (
          SELECT c_custkey, (c_custkey * 2654435761) % 4294967296 AS n
          FROM customer WHERE c_custkey < 200
        )
        SELECT c_custkey, n,
               ipv4_num_to_string(n)                         AS ip,
               ipv4_string_to_num(ipv4_num_to_string(n))     AS roundtrip,
               is_ipv4_string(ipv4_num_to_string(n))         AS valid,
               is_ipv4_string('999.1.1.1')                   AS invalid,
               is_ip_address_in_range(ipv4_num_to_string(n), '10.0.0.0/8')  AS in_10_8,
               is_ip_address_in_range(ipv4_num_to_string(n), '160.0.0.0/4') AS in_a0_4
        FROM ips ORDER BY c_custkey
        """
    )

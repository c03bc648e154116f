"""DuckDB oracle SQL, one string per queries() entry.

Arithmetic mirrors the Spark plans exactly: integer-cents money math (see
functions/core.py), identical literals via plans/params.py, identical
aliases. Tables are pre-registered views named after the parquet files.
"""

from vedb_gaze_spark.plans import params as P

# floor(x*100 + 0.5) == round for our non-negative 2-decimal money, and is
# the form Spark can whole-stage-codegen (see functions/core.py:cents).
_EP = "CAST(floor(l_extendedprice*100 + 0.5) AS BIGINT)"
_DISC1 = "CAST(floor((1.0-l_discount)*100 + 0.5) AS BIGINT)"
_TAX1 = "CAST(floor((1.0+l_tax)*100 + 0.5) AS BIGINT)"
_DISC = "CAST(floor(l_discount*100 + 0.5) AS BIGINT)"

Q1 = f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)            AS sum_qty,
  sum({_EP}) / 100.0                                          AS sum_base_price,
  sum({_EP} * {_DISC1}) / 10000.0                             AS sum_disc_price,
  sum({_EP} * {_DISC1} * {_TAX1}) / 1000000.0                 AS sum_charge,
  sum(CAST(l_quantity AS BIGINT)) / CAST(count(*) AS DOUBLE)  AS avg_qty,
  sum({_EP}) / CAST(count(*) AS DOUBLE) / 100.0               AS avg_price,
  sum({_DISC}) / CAST(count(*) AS DOUBLE) / 100.0             AS avg_disc,
  count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{P.Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""

Q3 = f"""
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  sum({_EP} * {_DISC1}) / 10000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = '{P.Q3_SEGMENT}'
  AND o_orderdate < TIMESTAMP '{P.Q3_DATE}'
  AND l_shipdate  > TIMESTAMP '{P.Q3_DATE}'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""

Q5 = f"""
SELECT
  n_name,
  sum({_EP} * {_DISC1}) / 10000.0 AS revenue
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN supplier ON s_nationkey = n_nationkey
JOIN lineitem ON l_suppkey = s_suppkey
JOIN orders   ON o_orderkey = l_orderkey
JOIN customer ON c_custkey = o_custkey AND c_nationkey = s_nationkey
WHERE r_name = '{P.Q5_REGION}'
  AND o_orderdate >= TIMESTAMP '{P.Q5_DATE_FROM}'
  AND o_orderdate <  TIMESTAMP '{P.Q5_DATE_TO}'
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""

Q6 = f"""
SELECT sum({_EP} * {_DISC}) / 10000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '{P.Q6_DATE_FROM}'
  AND l_shipdate <  TIMESTAMP '{P.Q6_DATE_TO}'
  AND l_discount >= {P.Q6_DISCOUNT_LO}
  AND l_discount <= {P.Q6_DISCOUNT_HI}
  AND l_quantity <  {P.Q6_QUANTITY}
"""

"""Relational query surface — scan/filter/aggregate/join plans in the four
canonical TPC-H shapes. These exercise the engine the way the reference's
pipelines.py exercises its DAG: multi-stage dataflow over columnar inputs.

Scale notes (100 TB):
- every money aggregate runs on exact BIGINT cents (order-independent →
  deterministic under any partitioning, and cheaper to shuffle than
  decimals);
- dimension joins (region/nation/supplier/customer) are explicitly
  broadcast — no shuffle of the fact table on a dim key;
- filters are plain column predicates on the scan so parquet pushdown and
  partition pruning apply (verified in tests/test_plans.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vedb_gaze_spark.functions.core import cents
from vedb_gaze_spark.plans import params as P


def q1_pricing_summary(lineitem: DataFrame, cutoff: str = P.Q1_CUTOFF) -> DataFrame:
    """TPC-H Q1 shape: single-pass scan → filter → grouped aggregate.

    Map-side partial aggregation collapses 100 TB of lineitem to a handful
    of groups before the (tiny) shuffle; all sums are exact integers.
    """
    li = lineitem.where(F.col("l_shipdate") <= F.lit(cutoff).cast("timestamp"))
    ep = cents("l_extendedprice")
    disc1 = cents(1.0 - F.col("l_discount"))  # scale 100
    tax1 = cents(1.0 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_quantity").cast("long")).cast("double").alias("sum_qty"),
            (F.sum(ep) / 100.0).alias("sum_base_price"),
            (F.sum(ep * disc1) / 10000.0).alias("sum_disc_price"),
            (F.sum(ep * disc1 * tax1) / 1000000.0).alias("sum_charge"),
            (F.sum(F.col("l_quantity").cast("long")) / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(ep) / F.count(F.lit(1)) / 100.0).alias("avg_price"),
            (F.sum(cents("l_discount")) / F.count(F.lit(1)) / 100.0).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q3_shipping_priority(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame
) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → grouped top-N.

    customer(filtered) is broadcast into orders; lineitem joins on
    o_orderkey (its natural clustering key). Top-N runs as a partial
    per-partition limit before the single-row-group final sort.
    """
    cust = customer.where(F.col("c_mktsegment") == P.Q3_SEGMENT).select("c_custkey")
    ords = orders.where(F.col("o_orderdate") < F.lit(P.Q3_DATE).cast("timestamp")).select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    li = lineitem.where(F.col("l_shipdate") > F.lit(P.Q3_DATE).cast("timestamp")).select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    rev = cents("l_extendedprice") * cents(1.0 - F.col("l_discount"))
    # only the filtered CUSTOMER dim is broadcast; the date-filtered orders
    # side is fact-sized at scale, so lineitem⋈orders stays an equi shuffle
    # join on o_orderkey (AQE still downgrades it to broadcast at small SF,
    # where that is the right call — but never by construction).
    return (
        li.join(ords.join(F.broadcast(cust), ords.o_custkey == cust.c_custkey),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


def q5_local_supplier(
    region: DataFrame,
    nation: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
) -> DataFrame:
    """TPC-H Q5 shape: 6-table join, dims broadcast, facts co-joined on
    their natural keys; revenue per nation for one region-year."""
    reg = region.where(F.col("r_name") == P.Q5_REGION)
    nat = nation.join(F.broadcast(reg), nation.n_regionkey == reg.r_regionkey).select(
        "n_nationkey", "n_name"
    )
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(P.Q5_DATE_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(P.Q5_DATE_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    rev = cents("l_extendedprice") * cents(1.0 - F.col("l_discount"))
    return (
        lineitem.select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        # customer is fact-sized at scale — shuffle join on the equi key,
        # never broadcast (AQE may still downgrade it to broadcast at
        # small SF, which is exactly the right call there).
        .join(customer.select("c_custkey", "c_nationkey"),
              (F.col("o_custkey") == F.col("c_custkey"))
              & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(nat), F.col("s_nationkey") == nat.n_nationkey)
        .groupBy("n_name")
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def q18_large_orders(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    qty: float = P.Q18_QUANTITY,
) -> DataFrame:
    """TPC-H Q18 shape: group-HAVING semi-join — the 'find the heavy
    keys, then fetch their context' pattern. The heavy-key set comes from
    one map-side-combined aggregation of the fact table; orders/customer
    join it on their keys (all equi shuffle joins — every side here is
    fact-sized at 100 TB; AQE broadcasts the tiny heavy-key set at small
    SF on its own). Quantities are integral, so the double sum and the
    HAVING threshold compare identically on any engine."""
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("total_qty"))
        .where(F.col("total_qty") > qty)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("total_qty").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderdate", "o_orderkey")
        .limit(100)
    )


def q7_volume_shipping(
    supplier: DataFrame,
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q7 shape: two-nation volume shipping — disjunctive dim
    predicate across TWO roles of the same dimension. nation broadcasts
    twice (supplier-side and customer-side aliases), each PRE-FILTERED to
    the two qualifying nations — `n_name ∈ {A,B}` is implied by the
    (A,B)|(B,A) disjunction, so non-qualifying fact rows (~23/25 of
    lineitem at uniform nation mix) die at their FIRST dim join instead
    of riding through supplier→orders→customer. The cross-role
    disjunction itself still runs after both names are attached; then a
    3-key rollup by year."""
    two = F.col("n_name").isin(P.Q7_NATION_A, P.Q7_NATION_B)
    n1 = nation.where(two).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.where(two).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(P.Q7_DATE_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(P.Q7_DATE_TO).cast("timestamp"))
    ).select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount", "l_shipdate")
    rev = cents("l_extendedprice") * cents(1.0 - F.col("l_discount"))
    ab = (
        (F.col("supp_nation") == P.Q7_NATION_A)
        & (F.col("cust_nation") == P.Q7_NATION_B)
    ) | (
        (F.col("supp_nation") == P.Q7_NATION_B)
        & (F.col("cust_nation") == P.Q7_NATION_A)
    )
    return (
        li.join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
                F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(orders.select("o_orderkey", "o_custkey"),
              F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .where(ab)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def q6_revenue(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q6 shape: highly selective scan-side filters → scalar agg.
    All four predicates reach the parquet reader as PushedFilters."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(P.Q6_DATE_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(P.Q6_DATE_TO).cast("timestamp"))
        & (F.col("l_discount") >= P.Q6_DISCOUNT_LO)
        & (F.col("l_discount") <= P.Q6_DISCOUNT_HI)
        & (F.col("l_quantity") < P.Q6_QUANTITY)
    )
    rev = cents("l_extendedprice") * cents("l_discount")
    return li.agg((F.sum(rev) / 10000.0).alias("revenue"))

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


def q4_order_priority(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → LEFT SEMI join. Orders in a quarter that
    have at least one returned lineitem, counted by priority.

    The semi join never materializes matched lineitem rows — each orders
    partition emits a row at the FIRST probe hit, so the join output is
    bounded by the (date-filtered) orders side no matter how many
    lineitems match. Both sides are fact-sized at 100 TB: equi shuffle on
    the order key, never a broadcast by construction (this schema has no
    l_commitdate, so the EXISTS predicate is l_returnflag = 'R')."""
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(P.Q4_DATE_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(P.Q4_DATE_TO).cast("timestamp"))
    ).select("o_orderkey", "o_orderpriority")
    returned = lineitem.where(F.col("l_returnflag") == "R").select("l_orderkey")
    return (
        ords.join(returned, ords.o_orderkey == returned.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def q10_returned_item(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    nation: DataFrame,
) -> DataFrame:
    """TPC-H Q10 shape: who returned the most revenue in a quarter —
    multi-join rollup to a per-customer top-N.

    lineitem('R') ⋈ orders(quarter) ⋈ customer are all fact-sized equi
    shuffle joins on their natural keys; only nation broadcasts. The
    top-N is a global sort of an already-aggregated (per-customer) set —
    at most |customer| rows reach it, and Spark's TakeOrdered keeps it a
    per-partition heap, never a full sort."""
    li = lineitem.where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(P.Q10_DATE_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(P.Q10_DATE_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    rev = cents("l_extendedprice") * cents(1.0 - F.col("l_discount"))
    return (
        li.join(ords, li.l_orderkey == ords.o_orderkey)
        .join(
            customer.select("c_custkey", "c_name", "c_acctbal", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(P.Q10_TOPN)
    )


def q12_priority_class(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """TPC-H Q12 shape: CASE-conditional aggregation after a fact-fact
    join — one pass computes both the high- and low-priority counts per
    group (no self-join, no second scan). Grouping is by l_returnflag
    (this schema has no l_shipmode); the high/low split is the classic
    URGENT/HIGH test."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(P.Q12_DATE_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(P.Q12_DATE_TO).cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    high = F.col("o_orderpriority").isin(*P.Q12_HIGH)
    return (
        li.join(
            orders.select("o_orderkey", "o_orderpriority"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


def q14_promo_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q14 shape: ratio aggregate over a join — promo revenue share
    for one month. Both the numerator's CASE sum and the denominator run
    in the SAME aggregation pass on exact cents, so the single float op
    is the final division (bit-identical on any engine, any row order).
    part scales with SF (it is NOT a broadcastable dim by construction) —
    plain equi join; AQE broadcasts it at small SF where that's right."""
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(P.Q14_DATE_FROM).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(P.Q14_DATE_TO).cast("timestamp"))
    ).select("l_partkey", "l_extendedprice", "l_discount")
    rev = cents("l_extendedprice") * cents(1.0 - F.col("l_discount"))
    promo = F.col("p_type") == P.Q14_PROMO_TYPE
    return (
        li.join(part.select("p_partkey", "p_type"), li.l_partkey == F.col("p_partkey"))
        .agg(
            (
                100.0
                * F.sum(F.when(promo, rev).otherwise(F.lit(0)))
                / F.sum(rev)
            ).alias("promo_revenue_pct")
        )
    )


def q16_supplier_count(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q16 shape: NOT IN → LEFT ANTI join + count distinct. How
    many distinct suppliers ship each qualifying (brand, type, size),
    excluding flagged suppliers.

    This schema has no partsupp table; the observed (l_partkey,
    l_suppkey) pairs play its role. The part predicate prunes ~5/6 of
    parts before the join; the exclusion set (negative-balance suppliers)
    is tiny and broadcasts into a LEFT ANTI join — each pair row probes
    and drops without materializing anything. countDistinct runs as the
    standard two-level expand (partial distinct per partition, then
    merge) — no row explosion beyond the distinct pairs themselves."""
    pairs = lineitem.select("l_partkey", "l_suppkey").distinct()
    pt = part.where(
        (F.col("p_brand") != P.Q16_EXCL_BRAND)
        & (F.col("p_type") != P.Q16_EXCL_TYPE)
        & F.col("p_size").isin(*P.Q16_SIZES)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    excl = supplier.where(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        pairs.join(pt, pairs.l_partkey == pt.p_partkey)
        .join(F.broadcast(excl), pairs.l_suppkey == excl.s_suppkey, "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


def q19_discounted_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-column join predicate. Revenue
    over three (brand, size-range, quantity-range) disjuncts.

    The disjunction itself can only run AFTER the join (it crosses
    tables), but its conjunctive HULL pushes to both scans: part prunes
    to the three brands and the max size bound, lineitem to the overall
    quantity envelope — the Q7 pre-filter lesson applied to ranges. At
    uniform data that kills ~7/8 of part and ~2/5 of lineitem before the
    shuffle."""
    brands = [t[0] for t in P.Q19_TRIPLES]
    max_size = max(t[2] for t in P.Q19_TRIPLES)
    min_qty = min(t[3] for t in P.Q19_TRIPLES)
    max_qty = max(t[4] for t in P.Q19_TRIPLES)
    li = lineitem.where(
        (F.col("l_quantity") >= min_qty) & (F.col("l_quantity") <= max_qty)
    ).select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    pt = part.where(
        F.col("p_brand").isin(*brands) & (F.col("p_size") <= max_size)
    ).select("p_partkey", "p_brand", "p_size")
    disjunct = None
    for brand, slo, shi, qlo, qhi in P.Q19_TRIPLES:
        arm = (
            (F.col("p_brand") == brand)
            & (F.col("p_size") >= slo)
            & (F.col("p_size") <= shi)
            & (F.col("l_quantity") >= qlo)
            & (F.col("l_quantity") <= qhi)
        )
        disjunct = arm if disjunct is None else (disjunct | arm)
    rev = cents("l_extendedprice") * cents(1.0 - F.col("l_discount"))
    return (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .where(disjunct)
        .agg((F.sum(rev) / 10000.0).alias("revenue"))
    )


def q2_min_cost_supplier(
    lineitem: DataFrame, part: DataFrame, supplier: DataFrame
) -> DataFrame:
    """TPC-H Q2 shape: argmin-per-group join — for each part in a size
    class, the supplier offering the minimum observed unit price.

    The classic form is a correlated MIN subquery re-joined to the outer
    query; here the argmin is ONE `min_by` struct aggregation (partial
    per partition, then merge) — no second scan, no join-back, no window.
    Unit prices order by the IEEE-double ratio pc/q — the same division
    the oracle performs, so both engines rank identically (equal exact
    rationals produce bit-identical doubles; unequal ones that collide
    in double fall through to the suppkey tiebreak, again on both
    engines). The stored (pc, q) integers keep the OUTPUT price exact to
    the cent grid. This schema
    has no partsupp: the observed (l_partkey, l_suppkey) unit prices play
    its ps_supplycost role. supplier is dim-sized → broadcast; part
    scales with SF → plain equi join (the q14 treatment)."""
    # unit price = extendedprice / quantity; compare a/b vs c/d as
    # integer cross-products a·d vs c·b to stay exact on any engine.
    price_c = cents("l_extendedprice")
    qty = F.col("l_quantity").cast("long")
    offers = (
        lineitem.select("l_partkey", "l_suppkey", price_c.alias("pc"), qty.alias("q"))
        .groupBy("l_partkey")
        .agg(
            F.min_by(
                F.struct(
                    F.col("l_suppkey").alias("s"),
                    F.col("pc").alias("pc"),
                    F.col("q").alias("q"),
                ),
                # exact total order: unit price asc, then suppkey asc —
                # encoded as a sortable struct (ratio first via double for
                # ordering, integers break exact ties deterministically)
                F.struct(
                    (F.col("pc") / F.col("q")).alias("r"),
                    F.col("l_suppkey").alias("s"),
                ),
            ).alias("best")
        )
    )
    pt = part.where(F.col("p_size") <= 10).select("p_partkey", "p_name", "p_size")
    return (
        offers.join(pt, offers.l_partkey == pt.p_partkey)
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("best.s") == F.col("s_suppkey"),
        )
        .select(
            "p_partkey",
            "p_name",
            "s_name",
            (F.col("best.pc") / F.col("best.q") / 100.0).alias("min_unit_price"),
        )
        .orderBy("p_partkey")
    )


def q9_product_profit(
    lineitem: DataFrame,
    orders: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_prefix: str = P.Q9_NAME_PREFIX,
) -> DataFrame:
    """TPC-H Q9 shape: profit by supplier nation and order year for a
    part-name class (adapted: p_retailprice stands in for the missing
    ps_supplycost — this schema has no partsupp).

    Profit stays EXACT integer end to end at one common scale (10⁻⁴
    dollars): revenue = cents(extendedprice)·cents(1−discount), cost =
    quantity·cents(retailprice)·100 — summed as longs, divided once at
    the end, so the rollup is order-independent under any partitioning.

    Plan: the name-filtered part table broadcasts into lineitem first
    (the most selective cut), supplier⋈nation broadcast next, and the
    only fact-fact work is the lineitem⋈orders equi shuffle on the order
    key; the final groupBy is per (nation, year) — dozens of groups,
    map-side combined."""
    pt = part.where(F.col("p_name").like(name_prefix + "%")).select(
        "p_partkey", cents("p_retailprice").alias("retail_c")
    )
    sup = supplier.select("s_suppkey", "s_nationkey")
    amount = cents("l_extendedprice") * cents(1.0 - F.col("l_discount")) - F.col(
        "l_quantity"
    ).cast("long") * F.col("retail_c") * F.lit(100).cast("long")
    return (
        lineitem.join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            orders.select("o_orderkey", "o_orderdate"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg((F.sum("amount") / 10000.0).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def q20_potential_promotion(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    name_prefix: str = P.Q20_NAME_PREFIX,
    nation_name: str = P.Q20_NATION,
) -> DataFrame:
    """TPC-H Q20 shape: nested IN-subqueries with a correlated scalar
    aggregate — suppliers in one nation who shipped the MAJORITY of some
    name-class part's volume in a year (adapted: the classic
    availqty > ½·shipped test becomes own-shipped > ½·part-total, since
    this schema has no partsupp).

    The correlated scalar (per-part total) is the q17/q18 aggregate
    join-back: one groupBy(part, supplier) over the filtered fact, a
    second (post-aggregate, tiny) rollup to per-part totals, an integer
    2·sq > tq majority test, then a LEFT SEMI probe into the
    nation-filtered supplier dim. The fact is scanned ONCE and shuffled
    once on (partkey, suppkey); every comparison is exact long
    arithmetic."""
    pt = part.where(F.col("p_name").like(name_prefix + "%")).select("p_partkey")
    li = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(P.Q20_DATE_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(P.Q20_DATE_TO).cast("timestamp"))
        )
        .join(F.broadcast(pt), F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_suppkey", F.col("l_quantity").cast("long").alias("q"))
    )
    per_ps = li.groupBy("l_partkey", "l_suppkey").agg(F.sum("q").alias("sq"))
    per_p = per_ps.groupBy("l_partkey").agg(F.sum("sq").alias("tq"))
    qual = (
        per_ps.join(per_p, "l_partkey")
        .where(F.lit(2) * F.col("sq") > F.col("tq"))
        .select("l_suppkey")
    )
    sup = supplier.join(
        F.broadcast(nation.where(F.col("n_name") == nation_name)),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "s_name")
    return (
        sup.join(qual, sup.s_suppkey == qual.l_suppkey, "left_semi")
        .select("s_name")
        .orderBy("s_name")
    )


def q21_suppliers_waiting(
    lineitem: DataFrame,
    orders: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    nation_name: str = P.Q21_NATION,
    topn: int = P.Q21_TOPN,
) -> DataFrame:
    """TPC-H Q21 shape: dual correlated subqueries (EXISTS + NOT EXISTS)
    self-joined on the same fact — suppliers who alone kept a finished
    multi-supplier order waiting (adapted per Q4: "late" = returned 'R',
    this schema has no l_receiptdate/l_commitdate).

    The classic plan scans lineitem THREE times (l1, the EXISTS probe,
    the NOT-EXISTS probe) and runs two correlated semi/anti joins. Here
    both subqueries collapse into ONE per-order aggregate over a single
    lineitem scan: EXISTS(other supplier) ⇔ n_supp ≥ 2, and
    NOT EXISTS(other late supplier) with l1 late ⇔ the order's late
    supplier set has exactly one element — which then owns every late
    row, so numwait contributions fall out of the same aggregate.

    Shuffle budget at 100 TB: lineitem semi-joins the status-filtered
    orders on the order key and the groupBy reuses that same hash
    partitioning — one Exchange per fact side, total. n_supp is
    size(collect_set), NOT countDistinct: countDistinct expands to a
    two-phase aggregate that re-shuffles the fact on (orderkey, suppkey)
    first, while collect_set (bounded by suppliers-per-order, single
    digits) keeps the whole rollup in one map-side-combined Exchange.
    Everything after the aggregate is order-count-sized; supplier⋈nation
    broadcasts."""
    finished = orders.where(F.col("o_orderstatus") == "F").select("o_orderkey")
    is_late = (F.col("l_returnflag") == "R").alias("is_late")
    per_order = (
        lineitem.select("l_orderkey", "l_suppkey", is_late)
        .join(finished, F.col("l_orderkey") == F.col("o_orderkey"), "left_semi")
        .groupBy("l_orderkey")
        .agg(
            F.collect_set("l_suppkey").alias("supps"),
            F.collect_set(F.when(F.col("is_late"), F.col("l_suppkey"))).alias(
                "late_supps"
            ),
            F.count(F.when(F.col("is_late"), 1)).alias("late_rows"),
        )
    )
    sole_late = per_order.where(
        (F.size("late_supps") == 1) & (F.size("supps") >= 2)
    ).select(F.col("late_supps")[0].alias("suppkey"), "late_rows")
    sup = (
        supplier.join(
            F.broadcast(nation.where(F.col("n_name") == nation_name)),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_name")
    )
    return (
        sole_late.join(F.broadcast(sup), F.col("suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.sum("late_rows").alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(topn)
    )


def q22_sales_opportunity(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join.
    Rich customers (balance above the positive-balance average) with no
    recent order, rolled up per nation key.

    The average cutoff is compared in pure integers — cents(balance) ·
    count > sum(cents) — so no engine's float-average rounding can flip a
    boundary row. The (sum, count) scalar broadcasts; the anti join
    probes the date-filtered orders side on c_custkey (fact-sized equi
    shuffle at 100 TB). Output sums are exact cents."""
    bal = cents("c_acctbal")
    stats = customer.where(F.col("c_acctbal") > 0).agg(
        F.sum(bal).alias("sum_cents"), F.count(F.lit(1)).alias("n_pos")
    )
    recent = orders.where(
        F.col("o_orderdate") >= F.lit(P.Q22_ORDER_CUTOFF).cast("timestamp")
    ).select("o_custkey")
    rich = (
        customer.select("c_custkey", "c_nationkey", bal.alias("bal_cents"))
        .join(F.broadcast(stats))
        .where(F.col("bal_cents") * F.col("n_pos") > F.col("sum_cents"))
    )
    return (
        rich.join(recent, rich.c_custkey == recent.o_custkey, "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            (F.sum("bal_cents") / 100.0).alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )


def q8_market_share(
    lineitem: DataFrame,
    part: DataFrame,
    supplier: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    region: DataFrame,
) -> DataFrame:
    """TPC-H Q8 shape: share-of-group ratio by year — one nation's slice
    of a region's market for one product type. Numerator (CASE on the
    supplier-side nation) and denominator ride the SAME aggregation pass
    on exact cents, so the only float op is the final division. nation
    plays two roles (supplier nation for the share test, customer nation
    → region for the market filter); both broadcast, the region gate
    pre-filters the customer-side alias before its join. part is
    SF-proportional → plain equi join (q14 treatment); the p_type filter
    pushes to its scan."""
    pt = part.where(F.col("p_type") == P.Q8_TYPE).select("p_partkey")
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("supp_nation")
    )
    n1 = (
        nation.join(
            F.broadcast(region.where(F.col("r_name") == P.Q8_REGION)),
            nation.n_regionkey == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("n1_key"))
    )
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(P.Q8_DATE_FROM).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(P.Q8_DATE_TO).cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    vol = cents("l_extendedprice") * cents(1.0 - F.col("l_discount"))
    in_nation = F.col("supp_nation") == P.Q8_NATION
    return (
        lineitem.select("l_orderkey", "l_partkey", "l_suppkey",
                        "l_extendedprice", "l_discount")
        .join(pt, F.col("l_partkey") == pt.p_partkey)
        .join(F.broadcast(supplier.select("s_suppkey", "s_nationkey")),
              F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .join(ords, F.col("l_orderkey") == ords.o_orderkey)
        .join(customer.select("c_custkey", "c_nationkey"),
              F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            (
                F.sum(F.when(in_nation, vol).otherwise(F.lit(0))) / F.sum(vol)
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


def q15_top_supplier(lineitem: DataFrame, supplier: DataFrame) -> DataFrame:
    """TPC-H Q15 shape: max-over-aggregate with ties — the supplier(s)
    whose quarterly revenue equals the maximum quarterly revenue.

    The classic view + scalar MAX subquery becomes one aggregation, a
    1-row max of it (broadcast), and an integer-exact equality join that
    keeps ALL tied suppliers (a row_number would silently drop ties).
    Revenue compares on exact cents products, so 'equals the max' is
    well-defined on every engine."""
    rev = cents("l_extendedprice") * cents(1.0 - F.col("l_discount"))
    per_supp = (
        lineitem.where(
            (F.col("l_shipdate") >= F.lit(P.Q4_DATE_FROM).cast("timestamp"))
            & (F.col("l_shipdate") < F.lit(P.Q4_DATE_TO).cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(F.sum(rev).alias("r"))
    )
    top = per_supp.agg(F.max("r").alias("rmax"))
    return (
        per_supp.join(F.broadcast(top), per_supp.r == F.col("rmax"))
        .join(
            F.broadcast(supplier.select("s_suppkey", "s_name")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select("s_suppkey", "s_name", (F.col("r") / 10000.0).alias("total_revenue"))
        .orderBy("s_suppkey")
    )


def q11_important_stock(lineitem: DataFrame) -> DataFrame:
    """TPC-H Q11 shape: groups exceeding a share of the GLOBAL total —
    the scalar-subquery-in-HAVING pattern (this schema has no partsupp;
    per-part shipped quantity plays the stock-value role).

    One aggregation feeds both sides: the per-part sums and their 1-row
    global total (broadcast). The share test q·N > total runs in pure
    BIGINT — no float share computation to drift across engines."""
    per_part = lineitem.groupBy("l_partkey").agg(
        F.sum(F.col("l_quantity").cast("long")).alias("q")
    )
    total = per_part.agg(F.sum("q").alias("tq"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("q") * P.Q11_SHARE_MULT > F.col("tq"))
        .select("l_partkey", F.col("q").cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "l_partkey")
    )


def q17_small_quantity_revenue(lineitem: DataFrame, part: DataFrame) -> DataFrame:
    """TPC-H Q17 shape: per-group-average correlated threshold — revenue
    from orders smaller than half their part's average quantity.

    The classic correlated scalar subquery becomes ONE aggregate over the
    fact table joined back on its own key (map-side partial average, then
    an equi shuffle both sides already need). Quantities are integral, so
    every engine's average is exact regardless of summation order, and
    the 0.5·avg threshold compares identically. Brand filter prunes part
    before its join."""
    thr = lineitem.groupBy("l_partkey").agg(
        (F.lit(0.5) * F.avg("l_quantity")).alias("thr")
    ).withColumnRenamed("l_partkey", "t_partkey")
    pt = part.where(F.col("p_brand") == "Brand#3").select("p_partkey")
    ep = cents("l_extendedprice")
    return (
        lineitem.select("l_partkey", "l_quantity", "l_extendedprice")
        .join(pt, F.col("l_partkey") == pt.p_partkey)
        .join(thr, F.col("l_partkey") == thr.t_partkey)
        .where(F.col("l_quantity") < F.col("thr"))
        .agg((F.sum(ep) / 700.0).alias("avg_yearly"))
    )


def q13_customer_distribution(customer: DataFrame, orders: DataFrame) -> DataFrame:
    """TPC-H Q13 shape: LEFT OUTER join + two-level aggregation — the
    histogram-of-counts pattern (how many customers placed exactly N
    qualifying orders, INCLUDING N = 0, which an inner join would lose).

    Level 1 groups the join output per customer (fact-fact equi shuffle
    on custkey; null order keys count 0 via count(col)); level 2 is a
    tiny re-aggregation over the distinct counts. The qualifying-order
    predicate stands in for the classic comment NOT LIKE (this schema
    has no o_comment): non-urgent priorities only."""
    qual = orders.where(F.col("o_orderpriority") != "1-URGENT").select(
        "o_orderkey", "o_custkey"
    )
    per_cust = (
        customer.select("c_custkey")
        .join(qual, customer.c_custkey == qual.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
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


def revenue_rollup(lineitem: DataFrame) -> DataFrame:
    """ROLLUP subtotals — the OLAP hierarchy rollup shape the registry's
    flat GROUP BYs don't cover: revenue by (returnflag, linestatus),
    per-flag subtotals, and the grand total in ONE pass. Spark expands
    rollup() to grouping sets before aggregation (partial aggregation
    still applies per set); grouping_id() disambiguates subtotal rows
    from real NULL groups. Exact integer-cents revenue keeps every
    level order-independent."""
    rev = cents("l_extendedprice") * cents("l_discount")
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            (F.sum(rev) / 10000.0).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
            F.grouping_id().alias("level"),
        )
    )


def daily_type_pivot(events: DataFrame) -> DataFrame:
    """PIVOT — event counts per epoch-day with one column per event
    type. Spark's pivot with an EXPLICIT value list compiles to a
    single-pass conditional aggregation (no extra job to discover
    values, no second shuffle) — the same CASE-sum form the oracle
    spells out."""
    from vedb_gaze_spark.operators.analytics import _day_idx

    types = ["click", "purchase", "signup", "view", "error"]
    return (
        events.select(
            _day_idx().alias("day_idx"),
            "event_type",
        )
        .groupBy("day_idx")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .na.fill(0, types)
    )

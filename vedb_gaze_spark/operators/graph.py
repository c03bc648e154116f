"""Iterative graph analytics over relational edges — PageRank on the
customer↔supplier trade graph (Page et al. 1999), the second iterative
dataflow family next to the dedup connected-components solver.

Exactness design: ranks are integer micro-units end-to-end —
r₀ = 1e6, contribution = r div out_degree (integer floor division),
r' = 150000 + (85·Σcontrib) div 100 (damping 0.85 in exact percent
arithmetic) — so every iteration is a sum of integers, order-independent
at any parallelism, and the DuckDB oracle (the same ten iterations
unrolled as plain CTEs) matches hash-for-hash. The standard float
formulation would drift in the last ulps across partitionings; the
integer recurrence is the lm_score micro-nat trick applied to an
iterative fixpoint.

Scale shape: the edge list with degrees is computed once, cached, and
repartitioned on the source key; each iteration shuffles only the
node-sized rank table into the edge partitions (edges never move
again), aggregates map-side, and localCheckpoints every few rounds to
truncate lineage (the dedup_clusters lesson). The driver holds nothing
— no collect anywhere in the loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vedb_gaze_spark.functions.core import iter_checkpoint, scan_is_compact

PR_ITERS = 10
PR_DAMP_PCT = 85            # damping 0.85 as exact percent arithmetic
PR_R0 = 1_000_000           # initial rank, micro-units
PR_TELEPORT = 150_000       # (1 - 0.85) · 1e6


def trade_edges(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Distinct customer↔supplier edges from order lines, symmetric.
    Node ids are typed integers (customer = 2·custkey, supplier =
    2·suppkey + 1) so the two key spaces cannot collide."""
    e0 = (
        lineitem.join(
            orders, lineitem["l_orderkey"] == orders["o_orderkey"]
        )
        .select(
            (F.col("o_custkey") * 2).alias("s"),
            (F.col("l_suppkey") * 2 + 1).alias("d"),
        )
        .distinct()
    )
    # symmetrize by a per-row inline explode, NOT union(e0, e0.swap):
    # the union form evaluates the join+distinct subtree twice (two
    # full edge-build pipelines unless AQE happens to reuse the
    # exchange — measured ~2 s of the 5 s edge build at sf0.1)
    return e0.select(
        F.expr("inline(array(struct(s, d), struct(d AS s, s AS d)))")
    )


def pagerank(edges: DataFrame, iters: int = PR_ITERS) -> DataFrame:
    """(n, r): integer micro-unit PageRank after ``iters`` exact
    iterations. Every node in a symmetric edge list has in- and
    out-degree ≥ 1, so there are no dangling nodes to redistribute."""
    deg = edges.groupBy("s").agg(F.count(F.lit(1)).alias("deg"))
    # deg is node-sized — AQE broadcasts it, so the edge list is built
    # without an extra shuffle. No repartition(s): the per-iteration
    # rank join is itself a node-sized broadcast, so edge partitioning
    # buys nothing and the explicit shuffle was pure cost.
    ed = edges.join(deg, "s").persist()
    ranks = deg.select(F.col("s").alias("n"), F.lit(PR_R0).cast("long").alias("r"))
    for i in range(iters):
        # hint("merge") on the node-sized rank side (r15, guide §3.1):
        # without it the planner broadcasts the ranks each iteration —
        # ten sequential BroadcastExchange builds, each a driver
        # round-trip barrier. As a sort-merge join the edge side's
        # exchange is ONE reused shuffle (identical subtree over the
        # persisted relation every iteration → ReusedExchange) and each
        # iteration only shuffles the node-sized rank table — measured
        # 35 → 17 jobs, 7.3 → 6.5 s best isolated at sf0.1, output
        # byte-identical (integer arithmetic untouched). This is also
        # the only strategy available at 100 TB node counts, where the
        # rank table exceeds any broadcast cap.
        ranks = (
            ed.join(ranks.hint("merge"), ed["s"] == ranks["n"])
            .select("d", F.expr("r div deg").alias("c"))
            .groupBy("d")
            .agg(F.sum("c").alias("sc"))
            .select(
                F.col("d").alias("n"),
                (
                    F.lit(PR_TELEPORT)
                    + F.expr(f"({PR_DAMP_PCT} * sc) div 100")
                ).cast("long").alias("r"),
            )
        )
        if (i + 1) % 3 == 0:
            ranks = iter_checkpoint(ranks, eager=False)
    return ranks


def trade_pagerank(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Registry face: rank every customer and supplier by trade-graph
    centrality. Output is node-sized (one row per connected entity)."""
    ranks = pagerank(trade_edges(lineitem, orders))
    return ranks.select(
        F.col("n").alias("node_id"),
        F.when(F.col("n") % 2 == 0, "customer").otherwise("supplier").alias("kind"),
        F.expr("n div 2").alias("entity_key"),
        F.col("r").alias("rank_units"),
    )


HITS_ITERS = 8
HITS_SCALE = 1_000_000


def trade_edges_directed(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Distinct DIRECTED customer→supplier edges (hub side = buyers,
    authority side = suppliers — the natural HITS orientation of a
    trade graph). Same typed node ids as trade_edges."""
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("h"),
            (F.col("l_suppkey") * 2 + 1).alias("a"),
        )
        .distinct()
    )


def hits(
    edges: DataFrame, iters: int = HITS_ITERS, compact: bool | None = None
) -> DataFrame:
    """Integer-exact HITS (Kleinberg 1999, "Authoritative sources in a
    hyperlinked environment"): authority = Σ hub over in-edges, hub =
    Σ authority over out-edges, each renormalized per half-iteration.
    Kleinberg's L2 normalization is replaced by MAX-normalization to
    micro-units — max is an order-independent exact statistic (a float
    L2 norm would drift across partitionings), scaling is integer
    floor division, and the fixpoint DIRECTION (what HITS is for — the
    principal singular vectors) is normalization-invariant. Every
    iteration is integer sums + one exact max, so the DuckDB oracle
    (the same iterations unrolled as CTEs, like trade_pagerank's)
    matches hash-for-hash.

    Scale shape: edges cached once; each half-iteration shuffles only
    the node-sized score table.

    Two value-identical normalization shapes, picked by the spread_scan
    input gate (r15, guide §2.6/§5 — the job-floor amortization VERDICT
    r14 #1 asked for):

    - COMPACT input (bench scale, scan_is_compact): the per-half-
      iteration max rides a global window (one exact max over the
      node-sized raw table), so the whole ``iters``-round recurrence is
      ONE lazy chain — every score table is referenced exactly once, so
      the plan grows linearly and a single action executes all rounds
      with zero per-round driver barriers (measured 88 → 36 jobs,
      10.5 → 6.1 s best isolated at sf0.1; scores byte-identical —
      integer sums, one exact max, same div). Each score table is
      lazily localCheckpoint-ed so the final union's auth branch reads
      the rounds materialized by the hubs chain instead of re-deriving
      them. The window's single-partition exchange carries a NODE-sized
      table — fine when the input itself is compact, wrong for huge
      graphs, hence the gate.
    - LARGE input: the r8 shape — eager node-sized checkpoint of each
      raw table, scalar max broadcast-joined back. The checkpoint is
      what stops every scalar-max job from re-evaluating the whole
      chain (measured 42 s → 7.5 s at sf0.1 when it landed); the
      broadcast of a 1-row max is the only scale-safe way to attach a
      global aggregate without a total exchange."""
    # ``compact``: callers that know the raw sources should gate there
    # (trade_hits does) — inputFiles() on a derived plan resolves
    # through the CacheManager, and once one call has persist()-ed the
    # edge relation, every later call's identical subtree substitutes to
    # the (fileless) InMemoryRelation and the gate silently flips to the
    # large-input shape (see scan_is_compact's cache caveat; caught by
    # TestHitsShapes). The fallback gate here still serves fresh-plan
    # callers.
    if compact is None:
        compact = scan_is_compact(edges)
    ed = edges.persist()
    hubs = ed.select("h").distinct().select(
        F.col("h").alias("n"), F.lit(HITS_SCALE).cast("long").alias("hub")
    )
    auth = None
    if compact:
        from pyspark.sql import Window

        w = Window.partitionBy()
        for i in range(iters):
            a_raw = (
                ed.join(hubs, ed["h"] == hubs["n"])
                .groupBy("a")
                .agg(F.sum("hub").alias("raw"))
            )
            auth = iter_checkpoint(
                a_raw.withColumn("mx", F.max("raw").over(w)).select(
                    F.col("a").alias("n"),
                    F.expr(f"(raw * {HITS_SCALE}) div mx")
                    .cast("long")
                    .alias("auth"),
                ),
                eager=False,
            )
            h_raw = (
                ed.join(auth, ed["a"] == auth["n"])
                .groupBy("h")
                .agg(F.sum("auth").alias("raw"))
            )
            # hubs deliberately NOT checkpointed inside the loop: the
            # chain references each hubs exactly once, and every lazy
            # checkpoint cuts the plan into another separately-executed
            # segment (measured: checkpointing both tables per round
            # doubled the job count, 36 → 90). Only auth needs the cut —
            # it is the one table referenced twice (next half-iteration
            # AND the final union).
            hubs = h_raw.withColumn("mx", F.max("raw").over(w)).select(
                F.col("h").alias("n"),
                F.expr(f"(raw * {HITS_SCALE}) div mx").cast("long").alias("hub"),
            )
        return hubs.select(
            F.col("n").alias("node_id"), F.col("hub").alias("score_units")
        ).unionByName(
            auth.select(
                F.col("n").alias("node_id"), F.col("auth").alias("score_units")
            )
        )
    for i in range(iters):
        a_raw = iter_checkpoint(
            ed.join(hubs, ed["h"] == hubs["n"])
            .groupBy("a")
            .agg(F.sum("hub").alias("raw")),
            eager=True,
        )
        a_mx = a_raw.agg(F.max("raw").alias("mx"))
        auth = a_raw.crossJoin(F.broadcast(a_mx)).select(
            F.col("a").alias("n"),
            F.expr(f"(raw * {HITS_SCALE}) div mx").cast("long").alias("auth"),
        )
        h_raw = iter_checkpoint(
            ed.join(auth, ed["a"] == auth["n"])
            .groupBy("h")
            .agg(F.sum("auth").alias("raw")),
            eager=True,
        )
        h_mx = h_raw.agg(F.max("raw").alias("mx"))
        hubs = h_raw.crossJoin(F.broadcast(h_mx)).select(
            F.col("h").alias("n"),
            F.expr(f"(raw * {HITS_SCALE}) div mx").cast("long").alias("hub"),
        )
    return hubs.select(
        F.col("n").alias("node_id"), F.col("hub").alias("score_units")
    ).unionByName(
        auth.select(
            F.col("n").alias("node_id"), F.col("auth").alias("score_units")
        )
    )


def trade_hits(lineitem: DataFrame, orders: DataFrame) -> DataFrame:
    """Registry face: hub scores for customers, authority scores for
    suppliers, over the directed trade graph. The normalization-shape
    gate is computed on the RAW table scans (never persisted), not on
    the derived edge relation — see scan_is_compact's cache caveat."""
    scores = hits(
        trade_edges_directed(lineitem, orders),
        compact=scan_is_compact(lineitem, orders),
    )
    return scores.select(
        "node_id",
        F.when(F.col("node_id") % 2 == 0, "customer")
        .otherwise("supplier")
        .alias("kind"),
        F.expr("node_id div 2").alias("entity_key"),
        "score_units",
    )

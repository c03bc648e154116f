"""Physical-plan assertions (SURVEY §5.4 / §6): the optimizations the
100 TB design depends on must be visible in `.explain` output — pushdown
reaching the parquet scan, pruned read schemas, broadcast dim joins, and
whole-stage codegen over the expression work. A regression here is a
silent 100× at scale even when results stay correct."""

import pytest

from vedb_gaze_spark.plans.queries import QUERIES


def plan(spark, sf_dir, name):
    return QUERIES[name](spark, sf_dir)._sc._jvm.PythonSQLUtils.explainString(
        QUERIES[name](spark, sf_dir)._jdf.queryExecution(), "formatted"
    )


def fmt(df):
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


@pytest.mark.parametrize(
    "name,frag",
    [
        # selective predicates must reach the parquet reader
        ("q6_revenue", "PushedFilters: ["),
        ("time_slice", "PushedFilters: ["),
        # dim joins must be broadcast, not shuffled
        ("q3_shipping_priority", "BroadcastHashJoin"),
        ("q5_local_supplier", "BroadcastHashJoin"),
    ],
)
def test_plan_contains(spark, sf_dir, name, frag):
    assert frag in fmt(QUERIES[name](spark, sf_dir)), f"{name}: missing {frag}"


def test_no_row_python_udfs(spark, sf_dir):
    # Python on the hot path is only ever Arrow-batched (ArrowEvalPython /
    # FlatMapGroupsInPandas); a row-at-a-time BatchEvalPython anywhere is a
    # 10-100x regression at scale.
    for name, q in QUERIES.items():
        assert "BatchEvalPython" not in fmt(q(spark, sf_dir)), name


def test_codegen_covers_aggregation(spark, sf_dir):
    # AQE's pre-execution plan hides codegen annotations; run the job and
    # inspect the executed plan.
    df = QUERIES["q1_pricing_summary"](spark, sf_dir)
    df.collect()
    s = df._jdf.queryExecution().executedPlan().toString()
    # codegen'd stages render as "*(n) HashAggregate..." in the final plan
    assert "*(" in s and "HashAggregate" in s


def test_q6_pushes_real_filters(spark, sf_dir):
    s = fmt(QUERIES["q6_revenue"](spark, sf_dir))
    scan = s[s.index("PushedFilters"):]
    assert "l_shipdate" in scan[: scan.index("]")]
    assert "l_discount" in scan[: scan.index("]")]


def test_q1_prunes_columns(spark, sf_dir):
    # Q1 touches 7 of lineitem's 16 columns; the scan must not read the rest
    s = fmt(QUERIES["q1_pricing_summary"](spark, sf_dir))
    i = s.index("ReadSchema")
    read = s[i : s.index("\n", i)]
    assert "l_comment" not in read and "l_orderkey" not in read


def test_no_cartesian_products(spark, sf_dir):
    # every registered query must avoid accidental cross joins; the pair
    # generators (dedup/ann) are bucketed equi-joins by construction
    for name, q in QUERIES.items():
        s = fmt(q(spark, sf_dir))
        assert "CartesianProduct" not in s, name

"""Replicates the driver's correctness gate: for every queries() entry with
an oracle, run the Spark plan and the DuckDB SQL on the same parquet and
compare row count, column names, and values (order-insensitive).

Floats are compared bit-for-bit — the engine is designed so SQL-oracled
outputs are either exact-by-construction (integer-cents math) or explicitly
rounded on both sides. A failure here is a failure of the real gate.
"""

import datetime
import math

import pytest

from vedb_gaze_spark.plans.queries import ORACLES, QUERIES


def canon(rows, colnames):
    """Type-SENSITIVE canonical form: the driver's value-hash works on
    pandas-converted bytes, so an int64 1 and a float64 1.0 hash
    differently even though Python's ``1 == 1.0``. Tagging every value
    with its type makes local green imply driver green (caught r1: a
    DuckDB windowed sum surfacing HUGEINT→float64 vs Spark bigint)."""
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    out = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, bool):
                v = int(v)
            elif isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
            elif isinstance(v, datetime.datetime):
                v = v.isoformat()
            elif isinstance(v, (list, tuple)):
                v = tuple(v)
            vals.append((v.__class__.__name__, v))
        out.append(tuple(vals))
    out.sort(key=repr)
    return out


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = QUERIES[name](spark, sf_dir)
    _assert_driver_canon_schema(name, sdf.schema)
    srows = [tuple(r) for r in sdf.collect()]
    scols = sdf.columns

    res = duck.execute(ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = [tuple(r) for r in res.fetchall()]

    assert sorted(scols) == sorted(dcols), f"{name}: column mismatch"
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"

    sc, dc = canon(srows, scols), canon(drows, dcols)
    for i, (a, b) in enumerate(zip(sc, dc)):
        assert a == b, f"{name}: row {i} differs:\n spark={a}\n duck ={b}"


def test_every_query_has_entry():
    assert set(ORACLES) <= set(QUERIES)


def test_gate_order_is_explicit_and_r2_gap_first():
    """The r2 driver gate truncated at registry position 50, so iteration
    order is part of the driver contract: the 14 entries with no r2
    correctness row must come first, and every registered query must be
    consciously placed in _GATE_ORDER (a new query landing unlisted would
    silently register at the tail)."""
    from vedb_gaze_spark.plans.queries import _GATE_ORDER

    names = list(QUERIES)
    assert names == [n for n in _GATE_ORDER if n in QUERIES] + [
        n for n in names if n not in _GATE_ORDER
    ]
    assert set(names) == set(_GATE_ORDER)
    assert names[:14] == _GATE_ORDER[:14]


def test_gate_window_boundary_is_exactly_50():
    """The driver gate records the first ~50 registry entries, so the
    'window boundary' marker in _GATE_ORDER must sit after EXACTLY 50
    entries — r10's comment said 50 but counted 51, silently dropping
    the 51st row (quality_classifier) from its refresh (ADVICE r10)."""
    import inspect
    import re

    from vedb_gaze_spark.plans import queries as Q

    src = inspect.getsource(Q)
    m = re.search(r"_GATE_ORDER = \[(.*?)window boundary", src, re.S)
    assert m, "window boundary marker missing from _GATE_ORDER"
    n = sum(
        1 for l in m.group(1).splitlines() if l.strip().startswith('"')
    )
    assert n == 50, f"{n} entries precede the window boundary marker"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_query_runs(name, spark, sf_dir):
    """Non-SQL-expressible ops get the driver's weaker check: runs, has a
    stable schema, returns rows on the test data."""
    df = QUERIES[name](spark, sf_dir)
    assert df.columns, name
    assert df.count() > 0, f"{name}: expected non-trivial output on {sf_dir}"
    _assert_driver_canon_schema(name, df.schema)


def _assert_driver_canon_schema(name, schema):
    from pyspark.sql import types as T

    for field in schema.fields:
        assert not isinstance(
            field.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), (
            f"{name}: registered face emits complex-typed column "
            f"{field.name!r} ({field.dataType.simpleString()}) — the "
            "driver's pandas canonicalizer sorts every column and cannot "
            "hash array/map/struct cells (embed_pca's r12 crash: "
            "\"unhashable type: 'list'\"). Explode or flatten at the face."
        )

"""Rule constraints (operators/constraints.py): FD + implication
semantics, the documented NULL contracts, and plan shape."""

import pytest
from pyspark.sql import functions as F

from schema_inference_spark.operators.constraints import (
    fd_violations,
    implication_violations,
)


@pytest.fixture(scope="module")
def frame(spark):
    # key 1: consistent dep; key 2: two deps; key 3: NULL + value;
    # key 4: consistently NULL dep
    rows = [(1, "a", 10.0), (1, "a", 20.0),
            (2, "a", 1.0), (2, "b", 2.0), (2, "b", 3.0),
            (3, None, 4.0), (3, "c", 5.0),
            (4, None, 6.0), (4, None, 7.0)]
    return spark.createDataFrame(rows, "k long, dep string, v double")


def test_fd_violations_basic(frame):
    out = {r.k: r for r in
           fd_violations(frame, ["k"], ["dep"]).collect()}
    assert set(out) == {2, 3}, "only inconsistent keys report"
    assert out[2].n_rows == 3 and out[2].n_distinct == 2
    assert out[2].dep_min == "a" and out[2].dep_max == "b"


def test_fd_null_is_a_distinct_value(frame):
    """The documented NULL contract: {NULL, 'c'} IS a violation (two
    distinct dependent values), while {NULL, NULL} is consistent."""
    out = {r.k: r for r in
           fd_violations(frame, ["k"], ["dep"]).collect()}
    assert 3 in out and out[3].n_distinct == 2
    assert 4 not in out


def test_fd_multi_column_dependent(spark):
    # the dependent TUPLE is compared, not each column independently:
    # (x,1) vs (x,2) violates even though col a is constant
    df = spark.createDataFrame(
        [(1, "x", 1), (1, "x", 2), (2, "x", 1), (2, "x", 1)],
        "k long, a string, b int")
    out = fd_violations(df, ["k"], ["a", "b"]).collect()
    assert [r.k for r in out] == [1]
    assert out[0].dep_min == "x\x1f1" and out[0].dep_max == "x\x1f2"


def test_fd_partial_aggregation_plan(frame):
    """Map-side partial aggregation absorbs hot determinants before the
    shuffle: the plan must show two HashAggregate levels (partial +
    final), not a raw exchange of data rows."""
    plan = fd_violations(frame, ["k"], ["dep"])._jdf \
        .queryExecution().executedPlan().toString()
    # Catalyst rewrites count(distinct) into a two-exchange cascade whose
    # FIRST stage partially aggregates on (determinant, dep) before any
    # shuffle — the map-side combine that absorbs hot determinants.
    # (SortAggregate here: string min/max picks the sort-based impl.)
    first_exchange = plan.index("Exchange")
    assert "partial_count" in plan[first_exchange:], "two-phase distinct"
    assert "partial_count(1)" in plan, \
        "map-side partial aggregation must run before the first shuffle"


def test_implication_basic(spark):
    df = spark.createDataFrame(
        [(1, "purchase", 5.0), (2, "purchase", -1.0),
         (3, "view", -9.0), (4, "purchase", 0.0)],
        "id long, et string, v double")
    out = implication_violations(
        df, "et = 'purchase'", "v >= 0", ["id"]).collect()
    assert [r.id for r in out] == [2], \
        "non-purchase rows never violate; v>=0 purchases never violate"


def test_implication_null_consequent_contract(spark):
    """SQL tri-state: NULL consequent -> not a violation; the coalesce
    wrapper opts into NULL-fails semantics."""
    df = spark.createDataFrame(
        [(1, "purchase", None), (2, "purchase", -1.0)],
        "id long, et string, v double")
    soft = implication_violations(
        df, "et = 'purchase'", "v >= 0", ["id"]).collect()
    assert [r.id for r in soft] == [2]
    strict = implication_violations(
        df, "et = 'purchase'", "coalesce(v >= 0, false)", ["id"]).collect()
    assert [r.id for r in strict] == [1, 2]


def test_implication_zero_shuffle_plan(spark):
    """The scan-filter check shape: no Exchange anywhere in the plan."""
    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("m"))
    plan = implication_violations(
        df, "m = 0", "id < 50", ["id"])._jdf \
        .queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

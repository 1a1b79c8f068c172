"""Connected components / dedup groups — equivalence with a driver-side
union-find (the operator is iterative, so there is no SQL oracle;
SURVEY.md §5.2 property-gate style)."""

import pytest

from pyspark.sql import functions as F

from schema_inference_spark.operators.components import (
    connected_components,
    dedup_groups,
)


def union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


@pytest.fixture(scope="module")
def pair_df(spark):
    # a clique, a long chain (the LSH chained-pairing shape), a 2-cycle,
    # and an isolated pair — plus ids that sort non-contiguously
    pairs = [("a1", "a2"), ("a1", "a3"), ("a2", "a3"),          # clique
             ("c1", "c2"), ("c2", "c3"), ("c3", "c4"),          # chain
             ("c4", "c5"), ("c5", "c6"), ("c6", "c7"),
             ("z9", "b0"),                                      # min is dst
             ("m1", "m2")]
    return spark.createDataFrame(pairs, "d1 string, d2 string"), pairs


@pytest.mark.parametrize("driver_max_edges", [2_000_000, 0],
                         ids=["driver-unionfind", "distributed-loop"])
def test_components_match_union_find(pair_df, driver_max_edges):
    df, pairs = pair_df
    got = {r.node: r.component
           for r in connected_components(
               df, driver_max_edges=driver_max_edges).collect()}
    assert got == union_find(pairs)


def test_dedup_groups_shape(pair_df):
    df, pairs = pair_df
    groups = {r.canonical_id: (r.n_docs, list(r.members))
              for r in dedup_groups(df).collect()}
    assert groups["a1"] == (3, ["a1", "a2", "a3"])
    assert groups["c1"] == (7, [f"c{i}" for i in range(1, 8)])
    assert groups["b0"] == (2, ["b0", "z9"])
    assert groups["m1"] == (2, ["m1", "m2"])


def test_components_from_real_lsh_pairs(spark, sf_dir):
    """End-to-end: LSH near-dup pairs over the documents table -> groups;
    every pair must land in one component, and the chained-pairing path
    shape must still produce the transitive group."""
    from schema_inference_spark.operators.dedup import minhash_lsh_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = minhash_lsh_dedup(docs, threshold=0.5)
    plist = [(r.d1, r.d2) for r in pairs.collect()]
    if not plist:
        pytest.skip("no near-dup pairs at this sf")
    got = {r.node: r.component for r in connected_components(pairs).collect()}
    assert got == union_find(plist)


def test_star_alternation_converges_on_long_path(spark):
    """The adversarial shape for min-label propagation: a generated path
    graph with diameter >> max_iter. The large-star/small-star
    alternation must converge in O(log n) rounds (max_iter=15 covers
    2^15 nodes; the path's diameter is 1500) and match union-find —
    exactly the shape chained-LSH pairing emits for oversized buckets."""
    n = 1500
    ids = [f"p{i:05d}" for i in range(n + 1)]
    pairs = list(zip(ids[:-1], ids[1:]))
    df = spark.createDataFrame(pairs, "d1 string, d2 string")
    got = {r.node: r.component
           for r in connected_components(
               df, driver_max_edges=0, max_iter=15).collect()}
    assert got == union_find(pairs)
    assert set(got.values()) == {ids[0]}


def test_unconverged_raises_not_wrong(spark):
    """Non-convergence must raise, never emit a silently split grouping
    (regression: ADVICE r2)."""
    n = 40
    ids = [f"q{i:03d}" for i in range(n + 1)]
    df = spark.createDataFrame(list(zip(ids[:-1], ids[1:])),
                               "d1 string, d2 string")
    with pytest.raises(ValueError, match="did not converge"):
        connected_components(df, driver_max_edges=0, max_iter=1)


def test_components_determinism(pair_df):
    df, _ = pair_df
    a = sorted(map(tuple, connected_components(df).collect()))
    b = sorted(map(tuple, connected_components(df).collect()))
    assert a == b


def test_keep_best_argmax_and_ties(spark):
    """keep_best: highest score wins, ties go to the smallest id,
    singletons never emit, and n_dropped = group size - 1."""
    from schema_inference_spark.operators.components import keep_best
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3),      # group {1,2,3}
         (10, 11)],           # group {10,11}
        "d1 bigint, d2 bigint")
    scores = spark.createDataFrame(
        [(1, 50), (2, 90), (3, 90),     # tie at 90 -> keep id 2
         (10, 10), (11, 99),
         (42, 100)],                    # singleton: must not appear
        "doc_id bigint, quality_bp bigint")
    out = {r.canonical_id: r for r in keep_best(pairs, scores).collect()}
    assert set(out) == {1, 10}
    g = out[1]
    assert (g.n_docs, g.keep_id, g.keep_quality_bp, g.n_dropped) == (3, 2, 90, 2)
    assert (out[10].keep_id, out[10].keep_quality_bp) == (11, 99)

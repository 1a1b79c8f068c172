"""Connected components over near-duplicate pair graphs.

The dedup operators emit PAIRS (jaccard_pairs, minhash_lsh_dedup,
simhash_near_pairs, cosine near-dup); a pipeline that drops duplicates
needs GROUPS — one canonical survivor per component of the pair graph
(pairs are not transitive-closed: LSH chained pairing deliberately emits
a path, not a clique, for oversized buckets; see dedup.py bucket_cap).

Algorithm: iterative min-label propagation with lineage truncation —
each round every node takes the minimum label among itself and its
neighbors; converges in O(graph diameter) rounds, each round = one
join + one aggregation (two shuffles on the node id). Duplicate
components are near-cliques (diameter 1-2) except chained LSH buckets
(diameter = bucket/chain); ``max_iter`` bounds the worst case and the
loop early-stops on a converged round via a metadata-sized count.

Scale notes:
- the iterated DataFrames are EDGES + LABELS (pair-graph sized — orders
  of magnitude smaller than the corpus; only near-duplicates appear);
- localCheckpoint per round truncates the logical plan, otherwise the
  lineage doubles each iteration and planning time explodes;
- for adversarial diameters (10^6-node paths) swap the propagation for
  the large-star/small-star alternation (Kiveris et al., "Connected
  Components in MapReduce and Beyond"), which converges in O(log n)
  rounds with the same join/agg primitives — the seam is this function.

Not SQL-expressible without recursion, so no DuckDB oracle: the gate is
a pytest equivalence against a driver-side union-find on the collected
pair list (tests/test_components.py), plus determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, src: str = "d1",
                         dst: str = "d2", max_iter: int = 25,
                         driver_max_edges: int = 2_000_000) -> DataFrame:
    """(node, component) for every node that appears in ``pairs``;
    ``component`` is the minimum node id in the node's component.

    Hybrid execution: the near-dup pair graph is metadata-sized relative
    to the corpus (only near-duplicates appear), so up to
    ``driver_max_edges`` edges the exact union-find runs on the driver —
    one collect of the (already materialized) edge list, microseconds of
    CPU, zero iterative Spark jobs (the distributed loop costs ~3 jobs
    PER ROUND in scheduling alone, 18s for a 233-group graph at sf0.1).
    Same shape as IVF's driver-side quantizer training: driver work on a
    bounded, sub-sampled artifact, never on the data path. Larger graphs
    take the distributed min-label loop below.
    """
    edges = (pairs.select(F.col(src).alias("a"), F.col(dst).alias("b"))
             .unionByName(pairs.select(F.col(dst).alias("a"),
                                       F.col(src).alias("b")))
             .distinct()
             .localCheckpoint(eager=True))

    if driver_max_edges and edges.count() <= driver_max_edges:
        parent: dict = {}

        def find(x):
            parent.setdefault(x, x)
            root = x
            while parent[root] != root:
                root = parent[root]
            while parent[x] != root:
                parent[x], x = root, parent[x]
            return root

        for r in edges.collect():
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rows = sorted((x, find(x)) for x in parent)
        node_t = edges.schema["a"].dataType.simpleString()
        return pairs.sparkSession.createDataFrame(
            rows, f"node {node_t}, component {node_t}")

    labels = (edges.select(F.col("a").alias("node"))
              .distinct()
              .withColumn("label", F.col("node")))

    for _ in range(max_iter):
        nbr_min = (edges.join(labels, edges["a"] == labels["node"])
                   .groupBy(edges["b"].alias("node"))
                   .agg(F.min("label").alias("nbr_label")))
        new_labels = (labels.join(nbr_min, "node", "left")
                      .select("node",
                              F.least("label", F.coalesce("nbr_label", "label"))
                              .alias("label"),
                              (F.col("nbr_label") < F.col("label"))
                              .alias("_changed"))
                      .localCheckpoint(eager=True))
        changed = new_labels.filter(F.col("_changed")).limit(1).count()
        labels = new_labels.drop("_changed")
        if changed == 0:
            break
    return labels.select("node", F.col("label").alias("component"))


def dedup_groups(pairs: DataFrame, src: str = "d1", dst: str = "d2",
                 max_iter: int = 25) -> DataFrame:
    """Duplicate groups from a near-dup pair list: one row per group with
    the canonical (minimum) id, the member count, and the sorted members
    — the keep-one-drop-rest artifact of a dedup pipeline."""
    cc = connected_components(pairs, src, dst, max_iter)
    return (cc.groupBy(F.col("component").alias("canonical_id"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sort_array(F.collect_list("node")).alias("members"))
            .filter(F.col("n_docs") > 1)
            .orderBy("canonical_id"))

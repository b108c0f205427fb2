"""Connected components over near-dup pair graphs — the
pairs -> clusters -> canonical stage that finishes a dedup pipeline
(C10/C11 downstream; the reference stops at per-row filtering, this is
the corpus-curation step a 100 TB training set needs after candidate
generation).

Min-label propagation ("hash-to-min") with pointer jumping: every
node starts labeled with its own id; each round a node takes the min
label across itself, its neighbors, and ITS LABEL'S label (the
pointer-jumping step — label chains halve every round, so the min
propagates doubling distances). Neighbor propagation alone converges
in O(component diameter) rounds — fine for dense, shallow near-dup
clusters (diameter <= ~3 in real corpora) but pathological on chain
graphs; the jump bounds every graph at O(log diameter) rounds
(a 500-node path converges in ~9 rounds instead of 500 — pinned in
tests). Labels only decrease and never leave the component (a jump
target is itself a component member's label), so the fixed point is
the component minimum, same contract as before. Each round costs one
shuffle join + one aggregate + one self-join, all on the node key,
and lineage is truncated per round with localCheckpoint so the plan
stays flat. This is the same round-shrinking idea as
large-star/small-star (Kiveris et al., "Connected Components in
MapReduce and Beyond") expressed on the label table instead of the
edge set.

The driver-side loop is deliberate: iterative fixpoints are the one
place imperative control flow belongs — every iteration is still a
fully distributed job, and the only driver-visible value is the
changed-label count used as the convergence test.

Small graphs short-circuit to a driver union-find: the pair graph
after candidate generation is typically minuscule relative to the
corpus (dup pairs, not documents), and each propagation round costs
2-3 fixed-overhead Spark jobs — seconds of scheduler latency to
converge a graph that fits in kilobytes. Below ``driver_threshold``
edges (bounded, so never a scale hazard) the already-materialized
edge list collects once and a path-halving union-find labels it in
microseconds, returning the identical (node, min-id cluster) result.
Above the threshold the distributed loop runs unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.localdf import local_df


def _driver_union_find(edges_rows, node_type) -> tuple[list, T.StructType]:
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:  # path halving
            parent[x], x = root, parent[x]
        return root

    for r in edges_rows:
        a, b = find(r[0]), find(r[1])
        if a != b:
            parent[b] = a
    mins: dict = {}
    nodes = set()
    for r in edges_rows:
        nodes.add(r[0])
        nodes.add(r[1])
    for n in nodes:
        root = find(n)
        if root not in mins or n < mins[root]:
            mins[root] = n
    schema = T.StructType([
        T.StructField("node", node_type, False),
        T.StructField("cluster_id", node_type, False),
    ])
    return [(n, mins[find(n)]) for n in sorted(nodes)], schema


def connected_components(pairs: DataFrame, src: str = "d1", dst: str = "d2",
                         max_iter: int = 20,
                         driver_threshold: int = 200_000) -> DataFrame:
    """(node, cluster_id) for every node appearing in `pairs`, where
    cluster_id is the minimum node id in the node's component."""
    e = pairs.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    edges = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct().localCheckpoint()
    # the count is free (edges just materialized); the collect is
    # bounded by the threshold — see module docstring
    if edges.count() <= driver_threshold:
        rows, schema = _driver_union_find(
            edges.collect(), edges.schema["s"].dataType
        )
        return local_df(pairs.sparkSession, rows, schema)
    labels = (
        edges.select(F.col("s").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    changed = -1
    for _ in range(max_iter):
        nbr = edges.join(labels, edges.s == labels.node).select(
            F.col("d").alias("node"), "label"
        )
        stepped = (
            labels.unionByName(nbr)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        # pointer jump: label <- min(label, label(label)). Chains of
        # stale labels halve each round, so convergence is bounded by
        # O(log diameter) instead of O(diameter).
        hop = stepped.select(
            F.col("node").alias("label"), F.col("label").alias("__l2")
        )
        new = (
            stepped.join(hop, "label", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce("__l2", "label")
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new
        if changed == 0:
            break
    if changed != 0:
        # Silent non-convergence would return WRONG clusters (labels
        # mid-propagation); refuse instead — a graph this deep wants
        # the large-star/small-star variant, not more rounds here.
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still moving): component diameter exceeds "
            "max_iter; raise max_iter or use a log-round algorithm"
        )
    return labels.select("node", F.col("label").alias("cluster_id"))


def dedup_keep_canonical(docs: DataFrame, pairs: DataFrame,
                         id_col: str = "doc_id") -> DataFrame:
    """Keep one canonical doc (the min id) per near-dup cluster; docs
    in no pair survive untouched. Anti-join on the loser set — one
    broadcast-sized side for realistic dup rates."""
    comp = connected_components(pairs)
    losers = comp.where(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias(id_col)
    )
    return docs.join(losers, id_col, "left_anti")

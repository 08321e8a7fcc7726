"""Connected components over near-duplicate pair lists.

Every pairwise dedup operator in this package (exact groups, MinHash,
SimHash, n-gram Jaccard, embedding cosine) emits PAIRS; a production
pipeline needs CLUSTERS — one canonical id per transitively-connected
group so exactly one member survives. The reference has no analogue
(its dedup surface is out of scope for mimic2ts); this is the
`tools/`-style consumer step a training-data pipeline adds on top.

Algorithm: iterative min-label propagation with pointer jumping
("hash-to-min" family — Rastogi et al., *Finding Connected Components
in Map-Reduce in Logarithmic Rounds*). Each round every node takes the
minimum label among itself, its neighbors' labels, and its label's own
label (the pointer jump — path halving that collapses chains in
O(log n) rounds where neighbor propagation alone needs O(diameter)).
At the fixpoint each node's label is the minimum node id of its
component: labels only ever take values of ids reachable by edges or
by label links (themselves reachability-derived), and a fixpoint where
some node held a non-minimal label would still admit a propagation
step along the path to the minimum.

Scale shape: each round is two key-partitioned joins + one groupBy on
node id (no collect, no driver-side graph); the edge set is touched
once per round. Lineage is truncated per round with an EAGER
localCheckpoint — without it the iterated join plan grows
exponentially and the driver dies planning round ~8 long before data
size matters. Convergence is detected with a changed-label count
(deterministic given deterministic input — no rand(), CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 25,
) -> DataFrame:
    """(node, component) for every node appearing in ``pairs``;
    component = min node id in the connected component. Nodes in no
    pair are absent — callers coalesce to self (see
    ``canonical_ids``)."""
    e = pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    edges = (
        e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    # initial labels are NOT checkpointed: they are a shallow distinct
    # over the already-checkpointed edges, consumed only by round 0 —
    # an eager materialization here is a whole extra job (measured
    # 0.6 s of the 4.3 s sf0.1 query) that buys nothing, since round 0
    # re-labels every node anyway and each round's output IS
    # checkpointed.
    labels = edges.select("u").distinct().select(
        F.col("u").alias("node"), F.col("u").alias("comp")
    )
    for it in range(max_iter):
        nbr = (
            edges.join(
                labels.select(F.col("node").alias("v"), F.col("comp").alias("vcomp")),
                "v",
            )
            .groupBy("u")
            .agg(F.min("vcomp").alias("nmin"))
        )
        stepped = (
            labels.join(nbr.select(F.col("u").alias("node"), "nmin"), "node", "left")
            .select("node", F.least("comp", "nmin").alias("comp"), F.col("comp").alias("prev"))
        )
        # pointer jump: follow the label's own label (path halving)
        jumped = (
            stepped.join(
                labels.select(F.col("node").alias("comp"), F.col("comp").alias("pcomp")),
                "comp",
                "left",
            )
            .select(
                "node",
                F.least("comp", "pcomp").alias("comp"),
                "prev",
            )
            .localCheckpoint(eager=True)
        )
        labels = jumped.select("node", "comp")
        # round 0 always changes on a non-empty edge set (every edge
        # links two distinct nodes, so the larger endpoint takes a
        # smaller label) — skip its convergence job. Later rounds scan
        # the just-checkpointed partitions with an early-exit limit(1),
        # so the check is one tiny cached-read job.
        if it > 0 and jumped.where(F.col("comp") != F.col("prev")).limit(1).count() == 0:
            break
    return labels


def canonical_ids(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Every row of ``df`` tagged with its dedup cluster id: the min
    id of its connected component, or itself when unpaired. The
    downstream keep-one-per-cluster filter is then
    ``where(id == cluster_id)``."""
    comp = connected_components(pairs, src=src, dst=dst)
    return (
        df.join(
            comp.select(F.col("node").alias(id_col), "comp"), id_col, "left"
        )
        .withColumn("cluster_id", F.coalesce(F.col("comp"), F.col(id_col)))
        .drop("comp")
    )


def merge_labels(
    labels: DataFrame,
    new_edges: DataFrame,
    new_nodes: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """O(delta) connected-components maintenance: the standing labels
    table is a SUFFICIENT summary of the old graph — merging components
    on new edges never touches old edges. Each delta-edge endpoint maps
    to its supernode (existing cluster_id, or itself for a new node),
    CC runs on the REDUCED edge set (|delta| edges over supernodes),
    and exactly the affected labels rewrite. The 'cluster_id = min node
    id in component' invariant is preserved: old labels ARE their
    components' minima, so the reduced CC's min-supernode label is the
    merged component's global minimum. Unpaired new nodes label
    themselves. Pinned bit-equal to a full recompute over
    old-edges ∪ delta-edges (pytest, two successive deltas)."""
    lab = labels.select(
        F.col(id_col).alias("_n"), F.col("cluster_id").alias("_l")
    )
    e = new_edges.select(F.col(src).alias("_a"), F.col(dst).alias("_b"))
    e = (
        e.join(lab.withColumnRenamed("_n", "_a").withColumnRenamed("_l", "_la"), "_a", "left")
        .join(lab.withColumnRenamed("_n", "_b").withColumnRenamed("_l", "_lb"), "_b", "left")
        .select(
            F.coalesce(F.col("_la"), F.col("_a")).alias("su"),
            F.coalesce(F.col("_lb"), F.col("_b")).alias("sv"),
        )
        .where(F.col("su") != F.col("sv"))
    )
    red = connected_components(e, src="su", dst="sv")
    upd = (
        labels.join(
            red.select(F.col("node").alias("cluster_id"), "comp"),
            "cluster_id",
            "left",
        )
        .select(
            id_col,
            F.coalesce(F.col("comp"), F.col("cluster_id")).alias("cluster_id"),
        )
    )
    newl = (
        new_nodes.select(F.col(id_col))
        .join(red.select(F.col("node").alias(id_col), "comp"), id_col, "left")
        .select(
            id_col, F.coalesce(F.col("comp"), F.col(id_col)).alias("cluster_id")
        )
    )
    return upd.unionByName(newl)

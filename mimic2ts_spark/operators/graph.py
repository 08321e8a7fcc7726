"""Iterative graph analytics: integer-exact PageRank over a DataFrame
edge list, plus the transition-graph builder that derives edges from an
ordered fact stream (the "which supplier do customers reorder from next"
/ co-visitation graph every recommender-ish pipeline builds).

Not in the reference (its pipeline is flat per-stay ETL); this is the
beyond-CC member of the iterative family started by operators/cluster.py
(connected components).

Shape at scale:
- build_transition_edges: one window pass (shuffle on the partition key,
  per-partition sort) + one distinct — the same WindowGroupLimit-free
  lead() shape as log compaction.
- pagerank_scaled: the canonical distributed PageRank loop — the edge
  list and per-node out-degree are computed once and persisted; each
  iteration is one shuffle join (rank × edges on src) + one hash
  aggregate (sum of contributions on dst). Rank state stays a
  DataFrame; nothing is collected to the driver. A fixed, small
  iteration count keeps lineage linear, so no checkpointing is needed
  (contrast cluster.py's unbounded loop, which must truncate lineage —
  CLAUDE.md round-2 trap).

Determinism / oracle bit-exactness: ranks are scaled int64 (SCALE = 1e6)
and every division is integer floor division on non-negative operands —
Spark `div` and DuckDB `//` agree exactly, so 3 unrolled CTE iterations
in DuckDB reproduce the Spark ranks bit-for-bit. Dangling nodes (no
out-edges) simply leak their mass — the standard simplification; both
sides implement the same rule so the oracle stays exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PR_SCALE = 1_000_000
PR_ITERS = 3
# damping 0.85 as the exact rational 85/100
PR_DAMP_NUM = 85
PR_DAMP_DEN = 100


def build_transition_edges(
    df: DataFrame,
    part_col: str,
    node_col: str,
    order_cols: list[str],
) -> DataFrame:
    """Distinct (src, dst) edges between consecutive `node_col` values
    within each `part_col` group, ordered by `order_cols` (which must be
    a strict total order within the group for determinism). Self-loops
    are dropped."""
    w = Window.partitionBy(part_col).orderBy(*[F.col(c) for c in order_cols])
    nxt = F.lead(node_col).over(w)
    return (
        df.select(
            F.col(node_col).alias("src"),
            nxt.alias("dst"),
        )
        .where(F.col("dst").isNotNull() & (F.col("src") != F.col("dst")))
        .distinct()
    )


def sql_transition_edges(
    table: str, part_col: str, node_col: str, order_cols: list[str]
) -> str:
    order = ", ".join(order_cols)
    return f"""
SELECT DISTINCT src, dst FROM (
    SELECT {node_col} AS src,
           lead({node_col}) OVER (PARTITION BY {part_col} ORDER BY {order}) AS dst
    FROM {table}
) WHERE dst IS NOT NULL AND src <> dst
"""


def pagerank_scaled(
    edges: DataFrame,
    iters: int = PR_ITERS,
    scale: int = PR_SCALE,
) -> DataFrame:
    """(node, pr_scaled) after `iters` synchronous PageRank rounds.

    pr0(v)   = scale
    pr_i(v)  = (15·scale) div 100
             + (85 · Σ_{u→v} (pr_{i−1}(u) div outdeg(u))) div 100

    All arithmetic int64: with E edges and maximum total mass N·scale,
    the per-node contribution sum is bounded by N·scale (mass is only
    ever split, never amplified), so int64 holds to N ≈ 9·10^12 docs at
    scale 1e6 — far beyond any real corpus."""
    # out-degree is fused into the persisted edge list ONCE (a window
    # over the src partition — no extra join), so each round pays a
    # single shuffle join (rank × edges on src) instead of two; nodes
    # derive from the SAME persisted relation (a second derivation of
    # the raw edge lineage would re-scan the fact tables).
    # Retention contract: no unpersist here — the returned LAZY plan
    # still references both caches. Multi-query harness sessions call
    # session.release_storage() between queries; one-shot consumers get
    # ContextCleaner GC. (Deliberate session-budget choice per CLAUDE.md.)
    from pyspark.sql import Window as _W

    edges = edges.withColumn(
        "outdeg", F.count(F.lit(1)).over(_W.partitionBy("src"))
    ).persist()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    base = (15 * scale) // 100

    pr = nodes.withColumn("pr", F.lit(scale).cast("long"))
    for _ in range(iters):
        contribs = (
            edges.join(pr.withColumnRenamed("node", "src"), "src")
            .select(F.col("dst").alias("node"), F.expr("pr div outdeg").alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        pr = nodes.join(contribs, "node", "left").select(
            "node",
            (
                F.lit(base)
                + F.expr(
                    f"({PR_DAMP_NUM} * coalesce(in_mass, 0)) div {PR_DAMP_DEN}"
                )
            ).cast("long").alias("pr"),
        )
    return pr.withColumnRenamed("pr", "pr_scaled")


def sql_pagerank(edges_rel: str, iters: int = PR_ITERS, scale: int = PR_SCALE) -> str:
    """DuckDB mirror: the same rounds unrolled as CTEs, `//` floor
    division on non-negative ints ≡ Spark `div`."""
    base = (15 * scale) // 100
    parts = [
        f"edges AS ({edges_rel})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "outdeg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY 1)",
        f"pr0 AS (SELECT node, CAST({scale} AS BIGINT) AS pr FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"""contrib{i} AS (
    SELECT e.dst AS node, sum(p.pr // o.outdeg) AS in_mass
    FROM edges e JOIN pr{i} p ON e.src = p.node
    JOIN outdeg o ON e.src = o.src
    GROUP BY 1
),
pr{i + 1} AS (
    SELECT n.node,
           CAST({base} + ({PR_DAMP_NUM} * coalesce(c.in_mass, 0)) // {PR_DAMP_DEN}
                AS BIGINT) AS pr
    FROM nodes n LEFT JOIN contrib{i} c ON n.node = c.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, pr AS pr_scaled FROM pr{iters}"
    )

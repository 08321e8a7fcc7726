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


LPA_ITERS = 4


def label_propagation(
    edges: DataFrame, iters: int = LPA_ITERS, on_duplicates: str = "raise"
) -> DataFrame:
    """(node, community) after `iters` SYNCHRONOUS label-propagation
    rounds over the UNDIRECTED closure of `edges` (src/dst symmetrized,
    self-loops already absent by the edge contract): communities where
    connected-components is too coarse (CC merges everything reachable;
    LPA groups by neighborhood label majority).

    Deterministic variant (no rand(), oracle-exact): labels start as
    the node id; each round every node takes the label with the MAX
    COUNT among its neighbors' labels PLUS its own (a self-loop vote —
    without it, synchronous LPA on a 2-node component swaps labels
    every round and an even `iters` returns the identity: measured 45
    "communities" over 47 paired nodes), ties to the SMALLEST label —
    an argmin over (−count, label) computed as one struct-min hash
    aggregate (partial-agg friendly; no per-node window sort). Fixed
    `iters` keeps the lineage linear like pagerank — no convergence
    check, no checkpoint.

    Shape at scale: the undirected edge list + each round's two hash
    aggregates shuffle on node id — per round one join (labels × edges)
    + two combines, same budget as a pagerank round.

    DUP-HEAVY ROUTING (r10, mechanical since VERDICT r09 #4): a c-copy
    duplicate cluster arrives as a CLIQUE (Θ(c²) edges, every node
    degree ≥ c − 1) — each LPA round then joins and aggregates the
    whole clique for a labeling the exact-first form gets from one
    canonical node. The probe checks the sampled max degree (the clique
    signature — edges carry no text key) and raises past
    DUP_GUARD_DEGREE, pointing at the X158 composition (LPA over
    canonical near-dup pairs); registered oracle-baseline callers pass
    on_duplicates='warn'."""
    from mimic2ts_spark.operators.dupguard import check_edge_degree

    # sym is persisted FIRST: nodes, the initial labels AND every
    # round's edge scan all derive from it — unpersisted, the upstream
    # edge lineage (e.g. a full minhash-LSH pair pipeline) re-runs once
    # per derivation (measured 2.2 s of LPA overhead on a 475-node
    # graph whose edges cost 1.8 s to derive).
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist()
    )
    # the dup probe runs on the PERSISTED sym, not the raw edges: the
    # probe's action is then the materialization the rounds reuse, so
    # the guard costs one small agg over cached rows instead of a second
    # full derivation of the edge lineage (r10 bench: probing raw edges
    # re-ran the whole minhash pair pipeline, +0.9 s on
    # q_graph_communities). sym holds both directions, so per-src degree
    # IS the undirected degree — same clique signature.
    try:
        check_edge_degree(
            sym,
            api="label_propagation",
            canonical="label_propagation over dedup.canonical_near_dup_pairs (X158)",
            on_duplicates=on_duplicates,
        )
    except Exception:
        # refused calls must not leak the persisted sym (ADVICE r10)
        sym.unpersist()
        raise
    nodes = sym.select(F.col("src").alias("node")).distinct()
    und = (
        sym.union(nodes.select(F.col("node").alias("src"), F.col("node").alias("dst")))
        .persist()
    )
    lab = nodes.withColumn("lab", F.col("node"))
    for _ in range(iters):
        votes = (
            und.join(lab.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"), "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        lab = (
            votes.groupBy("node")
            .agg(F.min(F.struct((-F.col("c")).alias("nc"), F.col("lab").alias("l"))).alias("s"))
            .select("node", F.col("s.l").alias("lab"))
        )
    return lab.select("node", F.col("lab").alias("community"))


def sql_label_propagation(edges_rel: str, iters: int = LPA_ITERS) -> str:
    """DuckDB mirror: identical symmetrization + unrolled rounds; the
    argmin tie-break replays as row_number() OVER (ORDER BY c DESC,
    lab)."""
    parts = [
        f"dedges AS ({edges_rel})",
        "sym AS (SELECT src, dst FROM dedges UNION "
        "SELECT dst AS src, src AS dst FROM dedges)",
        "lnodes AS (SELECT DISTINCT src AS node FROM sym)",
        "und AS (SELECT src, dst FROM sym UNION "
        "SELECT node AS src, node AS dst FROM lnodes)",
        "l0 AS (SELECT node, node AS lab FROM lnodes)",
    ]
    for i in range(iters):
        parts.append(
            f"""v{i} AS (
    SELECT e.dst AS node, l.lab, count(*) AS c
    FROM und e JOIN l{i} l ON e.src = l.node
    GROUP BY 1, 2
),
l{i + 1} AS (
    SELECT node, lab FROM (
        SELECT node, lab,
               row_number() OVER (PARTITION BY node ORDER BY c DESC, lab) AS rn
        FROM v{i}
    ) WHERE rn = 1
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, lab AS community FROM l{iters}"
    )


# --- TrustRank (personalized PageRank with a trusted teleport set) ----------

TR_ITERS = 3


def trustrank_scaled(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = TR_ITERS,
    scale: int = PR_SCALE,
) -> DataFrame:
    """(node, tr_scaled): TrustRank (Gyöngyi, Garcia-Molina & Pedersen,
    VLDB 2004) — PageRank whose teleport mass goes ONLY to the trusted
    seed set, so score = damped random-walk proximity to vetted nodes
    (the spam-demotion / trusted-seed curation scorer; the
    power-iteration cousin of the X183 hop-distance BFS, graded rather
    than hop-quantized).

        tr0(v)  = scale · [v ∈ seeds]
        tr_i(v) = (15·scale div 100)·[v ∈ seeds]
                + (85 · Σ_{u→v} tr_{i−1}(u) div outdeg(u)) div 100

    Integer-exact: total mass never exceeds |seeds|·scale (mass is
    split, never amplified), int64-safe at any corpus size. Same
    per-round shape as pagerank_scaled: outdeg fused once, ONE shuffle
    join + one hash agg per round."""
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
    seed_marks = seeds.select(F.col("node"), F.lit(1).alias("_seed"))
    nodes_s = nodes.join(F.broadcast(seed_marks), "node", "left").select(
        "node", F.coalesce(F.col("_seed"), F.lit(0)).alias("_seed")
    ).persist()
    base = (15 * scale) // 100
    tr = nodes_s.select(
        "node", "_seed", (F.col("_seed") * scale).cast("long").alias("tr")
    )
    for _ in range(iters):
        contribs = (
            edges.join(tr.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"), F.expr("tr div outdeg").alias("c")
            )
            .groupBy("node")
            .agg(F.sum("c").alias("in_mass"))
        )
        tr = nodes_s.join(contribs, "node", "left").select(
            "node",
            "_seed",
            (
                F.col("_seed") * base
                + F.expr(
                    f"({PR_DAMP_NUM} * coalesce(in_mass, 0)) div {PR_DAMP_DEN}"
                )
            ).cast("long").alias("tr"),
        )
    return tr.select("node", F.col("tr").alias("tr_scaled"))


def sql_trustrank(
    edges_rel: str,
    seeds_rel: str,
    iters: int = TR_ITERS,
    scale: int = PR_SCALE,
) -> str:
    """DuckDB mirror: identical rounds unrolled; `//` ≡ `div` on the
    non-negative operands here."""
    base = (15 * scale) // 100
    parts = [
        f"tr_edges AS ({edges_rel})",
        "tr_nodes AS (SELECT src AS node FROM tr_edges "
        "UNION SELECT dst FROM tr_edges)",
        f"tr_seeds AS ({seeds_rel})",
        "tr_nodes_s AS (SELECT n.node, "
        "CASE WHEN s.node IS NOT NULL THEN 1 ELSE 0 END AS seed "
        "FROM tr_nodes n LEFT JOIN tr_seeds s ON s.node = n.node)",
        "tr_outdeg AS (SELECT src, count(*) AS outdeg FROM tr_edges GROUP BY 1)",
        f"tr0 AS (SELECT node, seed, CAST(seed * {scale} AS BIGINT) AS tr "
        f"FROM tr_nodes_s)",
    ]
    for i in range(iters):
        parts.append(
            f"""trc{i} AS (
    SELECT e.dst AS node, sum(p.tr // o.outdeg) AS in_mass
    FROM tr_edges e JOIN tr{i} p ON e.src = p.node
    JOIN tr_outdeg o ON e.src = o.src
    GROUP BY 1
),
tr{i + 1} AS (
    SELECT n.node, n.seed,
           CAST(n.seed * {base} + ({PR_DAMP_NUM} * coalesce(c.in_mass, 0)) // {PR_DAMP_DEN}
                AS BIGINT) AS tr
    FROM tr_nodes_s n LEFT JOIN trc{i} c ON n.node = c.node
)"""
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + f"\nSELECT node, tr AS tr_scaled FROM tr{iters}"
    )

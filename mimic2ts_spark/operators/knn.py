"""Distributed k-NN graph construction via NN-Descent (Dong, Moses &
Li, "Efficient k-nearest neighbor graph construction for generic
similarity measures", WWW 2011) and fixed-hop beam-search ANN serving
over the built graph — the graph-ANN family (the batch analogue of
HNSW-style indexes), complementing the LSH (X7/X171), IVF (X8) and PQ
(X119-X123) families.

Reference scope note: the reference engine (`/root/reference/
src/mimic2ts/__init__.py` — a 539-line pandas/Dask ICU ETL) has no
similarity machinery; this module extends the engine for LLM-training-
data pipelines, where the k-NN graph is the bulk primitive behind
graph-ANN index builds, SemDeDup-style candidate generation and
diversity analysis.

Why NN-Descent and not HNSW insertion: HNSW builds by SEQUENTIAL
insertion (each insert searches the graph built so far) — a driver
loop of O(n) tiny jobs, hostile to a batch engine. NN-Descent is the
bulk-synchronous formulation: start from a cheap random graph and
repeat "compare each node against its neighbors' neighbors, keep the
k closest" — every round is two corpus-wide joins plus one windowed
top-k, exactly the operations Spark does well, and the candidate
volume is O(n·k²) per round regardless of corpus size.

Determinism/exactness contract (CLAUDE.md rules):
- distances are integer L2² over QUANT-quantized coordinates
  (kmeans.quantize) — integer math is associative, so the numpy
  mapInPandas kernel needs no accumulation-order discipline and is
  bit-identical to the SQL fold;
- the init graph draws k pseudo-random neighbors per node from
  md5-derived codes (never rand()); all top-k ties break on ascending
  neighbor id;
- the DuckDB oracle (sql_knn_graph / sql_knn_beam_topk) is the SAME
  algorithm unrolled as a CTE chain — candidate generation, distances
  and tie-breaks mirror term for term, so hashes are bit-exact. Graph
  QUALITY (recall vs the true k-NN graph) is pinned separately by a
  python-replay pytest floor, because the unrolled oracle shares the
  algorithm and cannot judge it.

Scale shape:
- init: each node draws k UNIFORM pseudo-random partners, addressed as
  (md5 bucket, md5 rank-within-bucket) so the ranking windows stay
  bucket-partitioned (a global row_number window would materialize the
  corpus in one task). Buckets hold ~RING_BUCKET nodes, derived from n
  (the derived-dial rule); at n <= RING_BUCKET there is exactly one
  bucket, so small-sf oracle hashes never move as corpora grow.
  Randomness is LOAD-BEARING here: a structured start (e.g. a ring in
  hash order) is a 1-D lattice whose neighbor-of-neighbor expansion
  crawls ±k ranks per round and never mixes — measured recall@8 at
  sf0.001 was 0.05 from a ring vs 0.62/0.72/0.76 from the random start
  at 2/3/4 rounds (the synthetic embeddings are near-uniform in 64
  dims — the hard, locality-free regime for NN-Descent; clustered
  real-world embeddings converge faster). KNN_ROUNDS = 3 is the
  measured knee.
- per round: neighbors symmetrize (one distinct), then NN-Descent's
  LOCAL JOIN — each pivot node's member set ({self} ∪ neighbors,
  n·(2k+1) rows) fetches coordinates ONCE per membership and a
  partition-buffered numpy kernel emits all within-group pairs as
  SKINNY (id, nbr, d2) rows. Pair-expanding the coordinate arrays
  through a self-join instead would shuffle ~n·4k²·dim·8 bytes per
  round (tens of GB at 200 k vectors); the local join moves
  n·(2k+1)·dim·8 of coordinates plus n·4k²·24 of pair rows — ~20×
  less. The within-pivot pair set equals gen ∪ gen∘gen exactly
  (m=a gives the direct edges; a,b ∈ gen(m) gives the
  neighbor-of-neighbor pairs, gen being symmetric), so the unrolled
  oracle keeps the self-join formulation. Per-node top-k is a
  dense_rank WindowGroupLimit (duplicate pivot emissions share rank,
  deduped after the cut — cheaper than a full pre-distinct).
- iterated lineage is cut with eager localCheckpoints each round
  (CLAUDE.md: iterated join lineage grows exponentially).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mimic2ts_spark.operators.kmeans import QUANT, _dist2, quantize, _sql_quant
from mimic2ts_spark.operators.sketch import kmv_code
from mimic2ts_spark.operators.text import SQL_CODE

KNN_K = 8        # neighbors kept per node
KNN_ROUNDS = 3   # NN-Descent refinement rounds (fixed — linear lineage)
RING_BUCKET = 4096  # target nodes per init-ring bucket (derived dial)

# Serving-dial FLOORS, measured on the sf0.001 32-query panel (recall@5
# vs the exact panel): (beam 16, hops 3, 1 entry) 0.425 → (32, 4, 4)
# 0.944 — multiple md5-min entry seeds and a 4th hop are what rescue
# greedy search on locality-free data; candidates stay ≤ beam·(k+1)
# per query per hop.
#
# DERIVED DIALS (r11, VERDICT r10 #2 — the r06 "dials must grow with the
# corpus" doctrine applied to serving). Floors are exact at
# n ≤ RING_BUCKET, which covers every oracle-gated corpus (500–2000
# vectors) — the static SQL mirror (sql_knn_beam_topk) unrolls the FLOOR
# dials and stays hash-exact there; past the knee, graph QUALITY is
# pinned by measured recall floors instead (the r07 rule: an unrolled
# oracle shares the algorithm and cannot judge it).
#
# Measured recall@5 (32-query panel vs the exact int-L2 top-5) on
# deterministic md5-uniform UNIT vectors (scripts/knn_recall_sweep.py).
# That synthetic regime was VALIDATED against the shipped testdata:
# the real sf0.1 embeddings are random unit vectors (avg per-vector max
# cosine 0.41 ≈ the pure-random expectation √(2·ln n / d) ≈ 0.49, no
# cos>0.9 pairs), and floor-dial recall at n=2000 measures 0.556 on BOTH
# corpora — the locality-free WORST case for graph navigation.
#
#   n         floor (32,4,4)    derived (beam,hops,entries)   serve wall
#   2,000     0.556             = floor (below knee)          2.9 s
#   8,192     0.213             (64, 5, 8):    0.469          3.5 → 5.7 s
#   20,000    0.125             (256, 6, 16):  0.581          3.3 → 5.1 s
#   200,000   0.006             (1024, 7, 32): 0.425          4.3 → 10.7 s
#   1,000,000 0.000             (1024, 8, 64): 0.106          9.7 → 28.6 s
#                               (capped budget — the documented decay)
#
# Axis sensitivity (measured at 20k): BEAM dominates on locality-free
# data (32→128→256→512 lifts 0.18→0.39→0.58→0.73 at ~equal wall);
# hops beyond ~6 and entries beyond ~32 add little. More NN-DESCENT
# ROUNDS make serving WORSE (rounds 5 at 20k: 0.03 vs rounds 3: 0.21,
# floor dials) — a fully converged k-NN graph loses the random init's
# long-range edges (the navigable-small-world links HNSW adds by
# design), so KNN_ROUNDS stays fixed at the measured knee. The caps
# (beam 1024 / hops 8 / entries 64) are the serving budget — the
# KM_TRAIN_CAP pattern: past ~10⁶ vectors recall decays again and the
# designed high-recall tiers are SQ8/IVF/brute-force panels (at 200k×32
# queries the exact kernel panel costs 4.9 s — the graph tier pays off
# at high query volume and incremental-insert serving, not tiny panels;
# clustered real-world embeddings navigate far better than this
# worst-case regime). Floor pin on the derived schedule:
# tests/test_extensions.py::test_beam_derived_dials_recall_floor.
BEAM_WIDTH = 32   # beam-search frontier size (floor; serving)
BEAM_HOPS = 4     # expansion hops (floor; serving)
BEAM_ENTRIES = 4  # md5-min entry seeds shared by every query (floor)

# Mechanical serving cap (r12, VERDICT r11 #2 — "a docstring is not a
# guard", the dupguard doctrine applied to the graph tier): at the
# budget caps the measured recall@5 is 0.106 at 1M locality-free
# vectors and still decaying, so serving a corpus at/past this size
# raises (or warns) NAMING the designed high-recall tiers instead of
# silently returning near-random neighbors. The guard costs nothing:
# n is already known from artifact meta or the memoized dial count.
GRAPH_SERVE_MAX_N = 1_000_000


class GraphTierOverCapacity(ValueError):
    """Raised when graph-ANN serving is asked to cover a corpus past
    the declared beam-budget knee, where measured recall has decayed
    below usefulness; names the designed tiers for that scale."""


def check_graph_serving_scale(n: int, api: str, on_scale: str = "raise") -> None:
    """Warn/raise when `n` is at or past GRAPH_SERVE_MAX_N. on_scale:
    'raise' (default), 'warn' (serve anyway, eyes open), 'ignore'."""
    import warnings

    if on_scale == "ignore" or n < GRAPH_SERVE_MAX_N:
        return
    msg = (
        f"{api}: corpus size {n} is at/past the graph-tier serving budget "
        f"({GRAPH_SERVE_MAX_N}; measured recall@5 0.106 at the beam caps "
        f"on locality-free data and still decaying). Use the designed "
        f"high-recall tiers at this scale — SQ8 (pq.sq8_l2_panel / "
        f"`maintain sq8-stats`), IVF (similarity.ivf_topk), or the exact "
        f"kernel panel (similarity.brute_force_topk) — or pass "
        f"on_scale='warn' (serve anyway) / 'ignore' (skip the check)."
    )
    if on_scale == "warn":
        warnings.warn(msg, RuntimeWarning, stacklevel=3)
        return
    raise GraphTierOverCapacity(msg)


def serving_dials(n: int) -> tuple[int, int, int]:
    """(beam, hops, entries) for an n-vector graph: floors at
    n ≤ RING_BUCKET (every oracle-gated corpus), then grow =
    ceil(log2(n / RING_BUCKET)) doublings — beam doubles per step (the
    measured dominant axis), entries double every other step, hops add
    one every other step; all capped at the serving budget. Validated
    by the measured dial table above."""
    if n <= RING_BUCKET:
        return BEAM_WIDTH, BEAM_HOPS, BEAM_ENTRIES
    import math

    grow = math.ceil(math.log2(n / RING_BUCKET))
    return (
        min(BEAM_WIDTH << grow, 1024),
        min(BEAM_HOPS + (grow + 1) // 2, 8),
        min(BEAM_ENTRIES << ((grow + 1) // 2), 64),
    )


# driver-side corpus-size memo keyed on the canonicalized plan hash
# (the dupguard probe-memo pattern): serving queries sharing a corpus
# derive dials from ONE slim count job per process. Shared with the
# similarity.py routing scalars since r12 (VERDICT r11 #3) — one memo,
# one job-count pin (dupguard.COUNT_STATS).
from mimic2ts_spark.operators.dupguard import memoized_count as _memoized_count


def _probe_hash(id_col: F.Column, j: F.Column) -> F.Column:
    """32-hex md5 of 'id_j' — two independent 60-bit codes (chars 1-15
    and 16-30) address the target's (bucket, rank-in-bucket)."""
    return F.md5(F.concat_ws("_", id_col.cast("string"), j.cast("string")))


def _hex_code(h: F.Column, start: int) -> F.Column:
    return F.conv(F.substring(h, start, 15), 16, 10).cast("long")


def _local_join_pairs(members: DataFrame) -> DataFrame:
    """(m, mid, x) -> (id, nbr, d2): all ordered within-group pairs
    (mid_a != mid_b) per pivot m, exact int64 L2² via |a|²+|b|²-2a·b
    matmul (integers are associative — numpy order is irrelevant and
    the result equals the SQL fold bit-for-bit; kmeans._assign_kernel
    precedent). The stream repartitions on m so every group is
    complete within one partition, then the kernel buffers the
    partition (bounded: n·(2k+1)/partitions rows) and loops groups
    vectorized."""
    import numpy as np
    import pandas as pd

    def pairs(it):
        chunks = [pdf for pdf in it if len(pdf)]
        if not chunks:
            return
        pdf = pd.concat(chunks, ignore_index=True)
        order = np.argsort(pdf["m"].to_numpy(), kind="stable")
        ms = pdf["m"].to_numpy()[order]
        ids = pdf["mid"].to_numpy()[order]
        X = np.array(list(pdf["x"]), dtype=np.int64)[order]
        bounds = np.flatnonzero(np.r_[True, ms[1:] != ms[:-1], True])
        out_a, out_b, out_d = [], [], []
        for s, e in zip(bounds[:-1], bounds[1:]):
            g = e - s
            if g < 2:
                continue
            G = X[s:e]
            dots = G @ G.T
            sq = np.diag(dots)
            D = sq[:, None] + sq[None, :] - 2 * dots
            ai, bi = np.nonzero(~np.eye(g, dtype=bool))
            out_a.append(ids[s:e][ai])
            out_b.append(ids[s:e][bi])
            out_d.append(D[ai, bi])
        if not out_a:
            return
        # out dict in exact schema order (positional matching)
        yield pd.DataFrame(
            {
                "id": np.concatenate(out_a),
                "nbr": np.concatenate(out_b),
                "d2": np.concatenate(out_d),
            }
        )

    return members.repartition("m").mapInPandas(
        pairs, schema="id long, nbr long, d2 long"
    )


def _init_random(base: DataFrame, n: int, k: int) -> DataFrame:
    """(id, nbr): the deterministic pseudo-random start graph — each
    node draws k partners addressed by (md5 bucket, md5 rank within
    bucket). Windows are bucket-partitioned (>= 1 bucket of
    ~RING_BUCKET nodes), the per-bucket size table is tiny and
    broadcast. Hash collisions / self-draws thin a node's degree
    slightly below k — harmless for a random start."""
    nb = max(1, n // RING_BUCKET)
    coded = base.select(
        F.col("id"),
        F.pmod(kmv_code(F.col("id")), F.lit(nb)).alias("bucket"),
        kmv_code(F.col("id")).alias("code"),
    )
    w = Window.partitionBy("bucket").orderBy("code", "id")
    ranked = coded.select(
        "id", "bucket", (F.row_number().over(w) - 1).alias("rk")
    )
    sizes = ranked.groupBy("bucket").agg(F.count(F.lit(1)).alias("bn"))
    js = F.expr("array(" + ",".join(f"{j}L" for j in range(k)) + ")")
    h = _probe_hash(F.col("id"), F.col("j"))
    probes = (
        base.select("id", F.explode(js).alias("j"))
        .select("id", h.alias("h"))
        .select(
            "id",
            F.pmod(_hex_code(F.col("h"), 1), F.lit(nb)).alias("bucket"),
            _hex_code(F.col("h"), 16).alias("h2"),
        )
        .join(F.broadcast(sizes), "bucket")
        .select("id", "bucket", F.pmod(F.col("h2"), F.col("bn")).alias("rk"))
    )
    return (
        probes.join(
            ranked.select(F.col("id").alias("nbr"), "bucket", "rk"),
            ["bucket", "rk"],
        )
        .where(F.col("id") != F.col("nbr"))
        .select("id", "nbr")
        .distinct()
    )


def _refine(nbrs: DataFrame, base: DataFrame, k: int) -> DataFrame:
    """One NN-Descent round: candidates = symmetrized neighbors plus
    neighbors-of-neighbors (generated by the LOCAL JOIN — all pairs
    within each pivot's {self} ∪ neighbors group), exact distances,
    keep the k closest (ties ascending nbr id). Candidates always
    INCLUDE the current neighbors, so per-node distance profiles
    improve monotonically."""
    e = nbrs.select("id", "nbr")
    gen = e.union(
        e.select(F.col("nbr").alias("id"), F.col("id").alias("nbr"))
    ).distinct()
    members = gen.select(F.col("id").alias("m"), F.col("nbr").alias("mid")).union(
        base.select(F.col("id").alias("m"), F.col("id").alias("mid"))
    )
    mx = members.join(base.select(F.col("id").alias("mid"), "x"), "mid")
    d = _local_join_pairs(mx)
    # duplicate pivot emissions of the same (id, nbr) carry the same d2,
    # so dense_rank (WindowGroupLimit) equals row_number over the
    # distinct pair set; dedupe only the surviving top-k rows
    w = Window.partitionBy("id").orderBy("d2", "nbr")
    out = (
        d.withColumn("rank", F.dense_rank().over(w))
        .where(F.col("rank") <= k)
        .dropDuplicates(["id", "nbr"])
    )
    return out.localCheckpoint(eager=True)


def knn_graph(
    embs: DataFrame,
    k: int = KNN_K,
    rounds: int = KNN_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_duplicates: str = "raise",
) -> DataFrame:
    """(id, nbr, d2, rank): the NN-Descent k-NN graph of the corpus.
    The single .count() is a documented bounded driver scalar (ring
    modulus + bucket derivation; the oracle mirrors it as scalar
    subqueries).

    DUP-HEAVY ROUTING (r10, mechanical since VERDICT r09 #4): identical
    vectors are their own nearest neighbors — a c-copy cluster wastes
    its whole neighbor list on copies and pays Θ(c·k²) candidate work
    for zero information (120 s raw vs 6.4 s canonical at the 100×
    dup-heavy sweep). Past the sampled duplicate-share bound this
    raises, pointing at the X199 composition (canonical_vectors →
    knn_graph → exact-group expansion); registered oracle-baseline
    callers pass on_duplicates='warn'. The probe runs on the PERSISTED
    quantized base (after the count() that materializes it), keyed on
    the md5 of the quantized coords — identical embedding ⇒ identical
    x — so it costs one small agg over cached rows, never a second
    corpus scan (r10 bench lesson)."""
    from mimic2ts_spark.operators.dupguard import check_duplicate_share

    base = embs.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("x")
    ).persist()
    n = base.count()  # bounded driver scalar (materializes the persist)
    try:
        check_duplicate_share(
            base,
            F.md5(
                F.concat_ws(",", F.transform(F.col("x"), lambda v: v.cast("string")))
            ),
            "id",
            api="knn_graph",
            canonical="kmeans.canonical_vectors + knn_graph (X199)",
            on_duplicates=on_duplicates,
        )
    except Exception:
        # refused calls must not leak the persisted base (ADVICE r10)
        base.unpersist()
        raise
    nbrs = _init_random(base, n, k)
    for _ in range(rounds):
        nbrs = _refine(nbrs, base, k)
    base.unpersist()  # rounds end checkpointed — lineage no longer needs it
    return nbrs.select("id", "nbr", "d2", "rank")


# --- beam-search serving over the graph -------------------------------------


def knn_beam_topk(
    embs: DataFrame,
    queries: DataFrame,
    graph: DataFrame,
    k: int = 5,
    beam: int | None = None,
    hops: int | None = None,
    entries: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_scale: str = "raise",
) -> DataFrame:
    """(qid, nbr, d2, rank): top-k per query served FROM the k-NN graph
    by fixed-hop beam search — every query starts at the `entries`
    global md5-min entry nodes, and each hop expands the beam's graph
    neighbors, rescores, and keeps the `beam` closest (ties ascending
    node id). The candidate set per query grows monotonically within a
    hop (the beam is always rescored alongside its expansion), so more
    hops never lose a found neighbor.

    Scale shape: per hop, ONE join of the tiny (queries × beam)
    frontier against the graph (frontier side broadcast), one distinct,
    one kernel pass over at most |q|·beam·(k+1) rows, one per-query
    top-beam (WindowGroupLimit). The corpus is touched only through
    the graph and the coordinate fetch join — never scanned whole per
    hop. Rescoring already-visited nodes each hop is deliberate: the
    frontier volume is bounded by beam·k per query, far below the cost
    of carrying/merging distance state across hops.

    Dials default to serving_dials(n) — derived from one memoized slim
    count of the corpus (floors at every oracle-gated scale; see the
    dial table above). Pass explicit values to pin a regime. Serving a
    corpus at/past GRAPH_SERVE_MAX_N raises/warns per `on_scale`
    (check_graph_serving_scale)."""
    base = embs.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("x")
    )
    qv = queries.select(
        F.col(id_col).alias("qid"), quantize(F.col(vec_col)).alias("xq")
    )
    return _beam_quantized(base, qv, graph, k, beam, hops, entries,
                           on_scale=on_scale)


def _beam_quantized(
    base: DataFrame,
    qv: DataFrame,
    graph: DataFrame,
    k: int,
    beam: int | None = None,
    hops: int | None = None,
    entries: int | None = None,
    n: int | None = None,
    on_scale: str = "raise",
    _return_visited: bool = False,
) -> DataFrame:
    """knn_beam_topk over ALREADY-QUANTIZED frames — base (id, x) and
    queries (qid, xq) — so artifact serving/maintenance (stored int
    coordinates) skips re-quantization. None dials derive from
    serving_dials(n); `n` comes from artifact meta when the caller has
    it, else one memoized slim count of the id column. The serving-cap
    guard runs on the same n (explicit-dial callers pay the memoized
    count only for the guard — one slim job per corpus per process;
    on_scale='ignore' with explicit dials skips the count entirely,
    restoring the zero-job path).

    _return_visited (X228): additionally return the per-hop scored
    frames — EVERY (qid, node, d2) the traversal ever evaluated, not
    just the final beam — as (topk, [visited_hop_frames]). The filtered
    serve ranks among these; each hop's frame is checkpointed anyway
    (bounded at |q|·beam·(k+1) rows), so collecting them costs one
    extra checkpoint per hop only on this path."""
    need_dials = beam is None or hops is None or entries is None
    if n is None and (need_dials or on_scale != "ignore"):
        n = _memoized_count(base.select("id"))
    if n is not None:
        check_graph_serving_scale(n, "knn_beam_topk", on_scale=on_scale)
    if need_dials:
        db, dh, de = serving_dials(n)
        beam = db if beam is None else beam
        hops = dh if hops is None else hops
        entries = de if entries is None else entries
    qv = qv.persist()
    g = graph.select("id", "nbr").persist()
    # r14 (guide §5): the coordinate fetch joins BASE against the
    # broadcast frontier once PER HOP — unpersisted, every hop re-ran
    # the upstream lineage (corpus scan + quantize HOF). Persist it for
    # the loop (skip when the caller already cached this exact plan —
    # the r05 canonical-plan eviction trap).
    _we_persisted_base = not base.is_cached
    if _we_persisted_base:
        base = base.persist()
    entry = (
        base.select("id", kmv_code(F.col("id")).alias("code"))
        .orderBy("code", "id")
        .limit(entries)
        .select(F.col("id").alias("node"))
    )
    # `entries`-row scalar cross join (declared bounded pattern)
    s = qv.select("qid").crossJoin(F.broadcast(entry))
    visited = []
    for _ in range(hops):
        # the frontier is the broadcast side everywhere — the graph and
        # the coordinate table are corpus-sized and stay partitioned
        exp = (
            g.withColumnRenamed("id", "node")
            .join(F.broadcast(s.select("qid", "node")), "node")
            .select("qid", F.col("nbr").alias("node"))
        )
        u = s.select("qid", "node").unionByName(exp).distinct()
        scored = base.select(
            F.col("id").alias("node"), F.col("x").alias("xn")
        ).join(F.broadcast(u.join(F.broadcast(qv), "qid")), "node")
        # JVM HOF fold, not the Arrow kernel: the frontier is at most
        # |q|·beam·(k+1) rows per hop — interpreted zip_with over that
        # is far below one Python-worker round-trip, and integer sums
        # are order-free so both paths are bit-identical.
        d = scored.select(
            "qid", "node", _dist2(F.col("xq"), F.col("xn")).alias("d2")
        )
        if _return_visited:
            d = d.localCheckpoint(eager=True)
            visited.append(d)
        w = Window.partitionBy("qid").orderBy("d2", "node")
        s = (
            d.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= beam)
            .localCheckpoint(eager=True)
        )
    qv.unpersist()
    g.unpersist()
    if _we_persisted_base:
        base.unpersist()
    topk = s.where(F.col("rn") <= k).select(
        "qid", F.col("node").alias("nbr"), "d2", F.col("rn").alias("rank")
    )
    if _return_visited:
        return topk, visited
    return topk


def knn_beam_topk_filtered(
    embs: DataFrame,
    queries: DataFrame,
    graph: DataFrame,
    allowed: DataFrame,
    k: int = 5,
    beam: int | None = None,
    hops: int | None = None,
    entries: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_scale: str = "raise",
) -> DataFrame:
    """(route, qid, nbr, d2, rank): filtered ANN on the GRAPH tier
    (X228) — the last cell of the filter × serving-tier matrix
    (brute/IVF/BQ/SQ8 scan and artifact forms all carry `allowed=`
    already). Routing per the X219 selectivity doctrine:

    - SELECTIVE (|allowed|·FILTERED_SELECTIVE_DEN ≤ n): exact int-L2
      panel over the allowed subset — recall 1.0 by construction and
      cheaper than traversal; the graph is not touched (route 'exact').
    - BROAD: the traversal runs FILTER-BLIND — pruning disallowed nodes
      from the beam would disconnect the navigable structure exactly
      when the filter bites (the r11 cluster-disconnection lesson,
      appearing as a filter), so disallowed nodes still route the walk —
      and the top-k then ranks ALL VISITED nodes semi-joined against
      `allowed` BEFORE the cut (route 'graph'). The under-returning
      post-filter of a fixed top-k is never executed.

    Visited-ranking theorem (pytest-pinned): the beam keeps the `beam`
    closest each hop, so any node it evicts is worse than the
    then-current beam-worst, which only improves — with allowed =
    everything the visited top-k therefore EQUALS the plain beam top-k.
    Under a filter the visited set can still rank allowed nodes the
    final beam evicted in favor of closer disallowed ones — strictly
    better than post-filtering the beam's k.

    Both routing counts are memoized driver scalars (VERDICT r11 #3);
    the route column pins the decision into any oracle hash.

    SELF-MATCH convention differs per route (ADVICE r13, pinned in the
    X228 pytest): the 'exact' route inherits the brute panels'
    self-EXCLUSION (query_id == neighbor_id never returned), while the
    'graph' route inherits the plain beam's self-INCLUSION — a query
    stored in the graph and contained in `allowed` ranks itself first
    (d2 = 0, rank 1), the HNSW-style serving convention knn_beam_topk
    and its oracle SQL share. Unifying would change the gated beam
    semantics (q_ann_knn_beam / q_ann_recall graph leg); consumers who
    want strict-neighbor results drop `qid == nbr` rows, which under
    the (d2, node) total order only promotes the remaining ranks."""
    from mimic2ts_spark.operators.similarity import FILTERED_SELECTIVE_DEN

    n = _memoized_count(embs.select(id_col))
    ids = allowed.select(F.col(allowed.columns[0]).alias(id_col))
    n_allowed = _memoized_count(ids)
    if n_allowed * FILTERED_SELECTIVE_DEN <= n:
        from mimic2ts_spark.operators.pq import brute_force_l2_panel

        sub = embs.join(ids, id_col, "left_semi")
        exact = brute_force_l2_panel(
            sub, queries, k, id_col=id_col, vec_col=vec_col
        )
        w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
        return (
            exact.withColumn("rank", F.row_number().over(w).cast("long"))
            .select(
                F.lit("exact").alias("route"),
                F.col("query_id").alias("qid"),
                F.col("neighbor_id").alias("nbr"),
                "d2",
                "rank",
            )
        )
    base = embs.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("x")
    )
    qv = queries.select(
        F.col(id_col).alias("qid"), quantize(F.col(vec_col)).alias("xq")
    )
    _topk, visited = _beam_quantized(
        base, qv, graph, k, beam, hops, entries, n=n,
        on_scale=on_scale, _return_visited=True,
    )
    vis = visited[0]
    for v in visited[1:]:
        vis = vis.unionByName(v)
    # a (qid, node) pair rescored across hops carries the IDENTICAL
    # deterministic integer d2 — dropDuplicates picks that one value
    vis = vis.dropDuplicates(["qid", "node"])
    flt = vis.join(
        ids.select(F.col(id_col).alias("node")), "node", "left_semi"
    )
    w = Window.partitionBy("qid").orderBy("d2", "node")
    return (
        flt.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.lit("graph").alias("route"),
            "qid",
            F.col("node").alias("nbr"),
            "d2",
            "rank",
        )
    )


# --- multi-source BFS over the graph (seed hop distance) --------------------

BFS_SEEDS = 8   # md5-min trusted-seed nodes
BFS_HOPS = 4    # fixed propagation rounds (distances cap at BFS_HOPS)


def seed_hop_distance(
    nodes: DataFrame,
    graph: DataFrame,
    n_seeds: int = BFS_SEEDS,
    hops: int = BFS_HOPS,
    id_col: str = "vec_id",
) -> DataFrame:
    """(vec_id, dist): minimum hop count from any of the `n_seeds`
    md5-min seed nodes through the UNDIRECTED k-NN graph, -1 when no
    path within `hops` exists — seed-distance propagation through
    embedding space (the curation pattern behind trusted-seed quality
    filters: score every item by its graph proximity to a vetted set).

    Shape at scale: per round ONE shuffle join of the settled-distance
    table against the symmetrized edge list plus one min-groupBy —
    whole-set propagation (no frontier bookkeeping) is exact for
    fixed small hop counts and keeps the plan two hash shuffles per
    round; iterated lineage is checkpointed per round."""
    ids = nodes.select(F.col(id_col).alias("id"))
    seeds = (
        ids.select("id", kmv_code(F.col("id")).alias("code"))
        .orderBy("code", "id")
        .limit(n_seeds)
        .select("id")
    )
    e = graph.select(F.col("id").alias("src"), F.col("nbr").alias("dst"))
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .localCheckpoint(eager=True)  # reused every round
    )
    d = seeds.select("id", F.lit(0).cast("long").alias("dist"))
    for _ in range(hops):
        step = (
            d.join(edges, d["id"] == edges["src"])
            .select(F.col("dst").alias("id"), (F.col("dist") + 1).alias("dist"))
        )
        # eager stays (r15 A/B, VERDICT r14 #4): localCheckpoint(
        # eager=False) per round LOST 3/3 interleaved pairs (mins 1.18
        # vs 1.07 s) — AQE finalization at the .rdd conversion executes
        # the round's shuffle stages eagerly anyway, and the lazy
        # checkpoint's deferred fill-in job recomputes partitions cold
        # instead of persisting them while hot.
        d = (
            d.unionByName(step)
            .groupBy("id")
            .agg(F.min("dist").alias("dist"))
            .localCheckpoint(eager=True)
        )
    return ids.join(d, "id", "left").select(
        F.col("id").alias(id_col),
        F.coalesce(F.col("dist"), F.lit(-1)).cast("long").alias("dist"),
    )


def sql_seed_hop_distance(
    table: str = "embeddings",
    n_seeds: int = BFS_SEEDS,
    hops: int = BFS_HOPS,
    graph_k: int = KNN_K,
    graph_rounds: int = KNN_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Unrolled mirror over the unrolled graph chain: same seeds, same
    symmetrized edges, same whole-set min-propagation per round."""
    parts = _sql_init_parts(table, id_col, vec_col, graph_k)
    for r in range(graph_rounds):
        parts += _sql_round_parts(r, graph_k)
    parts += [
        f"graph AS (SELECT id, nbr FROM nb{graph_rounds})",
        f"seeds AS (SELECT id FROM coded ORDER BY code, id LIMIT {n_seeds})",
        "edges AS MATERIALIZED (SELECT id AS src, nbr AS dst FROM graph "
        "UNION SELECT nbr AS src, id AS dst FROM graph)",
        "bfs0 AS (SELECT id, CAST(0 AS BIGINT) AS dist FROM seeds)",
    ]
    for r in range(hops):
        parts.append(
            f"bfs{r + 1} AS MATERIALIZED (SELECT id, min(dist) AS dist FROM ("
            f"SELECT id, dist FROM bfs{r} UNION ALL "
            f"SELECT e.dst AS id, b.dist + 1 AS dist "
            f"FROM bfs{r} b JOIN edges e ON e.src = b.id) GROUP BY id)"
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT b.id AS {id_col}, "
        f"CAST(coalesce(d.dist, -1) AS BIGINT) AS dist "
        f"FROM base b LEFT JOIN bfs{hops} d ON d.id = b.id"
    )


# --- DuckDB oracle (same algorithm, unrolled) -------------------------------

_SQL_PAIR_DIST = (
    "CAST(list_aggregate(list_transform(generate_series(1, len(ba.x)), "
    "i -> (ba.x[i] - bb.x[i]) * (ba.x[i] - bb.x[i])), 'sum') AS BIGINT)"
)


def _sql_init_parts(table: str, id_col: str, vec_col: str, k: int) -> list[str]:
    code = SQL_CODE.format(tok="CAST(id AS VARCHAR)")
    h = "md5(CAST(id AS VARCHAR) || '_' || CAST(t.j AS VARCHAR))"
    js = ", ".join(f"{j}::BIGINT" for j in range(k))
    return [
        f"base AS MATERIALIZED (SELECT {id_col} AS id, {_sql_quant(vec_col)} AS x "
        f"FROM {table})",
        "nn AS (SELECT count(*) AS n FROM base)",
        f"nbk AS (SELECT greatest(1, n // {RING_BUCKET}) AS nb FROM nn)",
        f"coded AS (SELECT id, {code} % (SELECT nb FROM nbk) AS bucket, "
        f"{code} AS code FROM base)",
        "rkd AS MATERIALIZED (SELECT id, bucket, "
        "row_number() OVER (PARTITION BY bucket ORDER BY code, id) - 1 AS rk "
        "FROM coded)",
        "sizes AS (SELECT bucket, count(*) AS bn FROM rkd GROUP BY bucket)",
        f"hashes AS (SELECT id, {h} AS h FROM base "
        f"CROSS JOIN unnest([{js}]) AS t(j))",
        "probes AS (SELECT p.id, p.bucket, "
        "CAST(('0x' || substr(p.h, 16, 15)) AS BIGINT) % s.bn AS rk "
        "FROM (SELECT id, h, CAST(('0x' || substr(h, 1, 15)) AS BIGINT) "
        "% (SELECT nb FROM nbk) AS bucket FROM hashes) p "
        "JOIN sizes s ON s.bucket = p.bucket)",
        "nb0 AS (SELECT DISTINCT p.id, b.id AS nbr "
        "FROM probes p JOIN rkd b ON b.bucket = p.bucket AND b.rk = p.rk "
        "WHERE p.id <> b.id)",
    ]


def _sql_round_parts(r: int, k: int) -> list[str]:
    return [
        f"g{r} AS MATERIALIZED (SELECT id, nbr FROM nb{r} "
        f"UNION SELECT nbr AS id, id AS nbr FROM nb{r})",
        f"ff{r} AS (SELECT a.id AS id, b.nbr AS nbr "
        f"FROM g{r} a JOIN g{r} b ON a.nbr = b.id)",
        f"cand{r} AS (SELECT DISTINCT id, nbr FROM "
        f"(SELECT id, nbr FROM g{r} UNION ALL SELECT id, nbr FROM ff{r}) u "
        f"WHERE id <> nbr)",
        f"sc{r} AS (SELECT c.id, c.nbr, {_SQL_PAIR_DIST} AS d2 "
        f"FROM cand{r} c JOIN base ba ON ba.id = c.id "
        f"JOIN base bb ON bb.id = c.nbr)",
        f"nb{r + 1} AS MATERIALIZED (SELECT id, nbr, d2, rank FROM "
        f"(SELECT id, nbr, d2, row_number() OVER "
        f"(PARTITION BY id ORDER BY d2, nbr) AS rank FROM sc{r}) "
        f"WHERE rank <= {k})",
    ]


def sql_knn_graph(
    table: str = "embeddings",
    k: int = KNN_K,
    rounds: int = KNN_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    parts = _sql_init_parts(table, id_col, vec_col, k)
    for r in range(rounds):
        parts += _sql_round_parts(r, k)
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT id AS vec_id, nbr, d2, rank FROM nb{rounds}"
    )


_SQL_QDIST = (
    "CAST(list_aggregate(list_transform(generate_series(1, len(q.xq)), "
    "i -> (q.xq[i] - b.x[i]) * (q.xq[i] - b.x[i])), 'sum') AS BIGINT)"
)


def sql_knn_beam_topk(
    table: str = "embeddings",
    query_pred: str = "id < 32",
    k: int = 5,
    beam: int = BEAM_WIDTH,
    hops: int = BEAM_HOPS,
    entries: int = BEAM_ENTRIES,
    graph_k: int = KNN_K,
    graph_rounds: int = KNN_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> str:
    """Unrolled mirror of knn_beam_topk over the unrolled knn graph
    (one composed CTE chain — the oracle re-derives the same graph and
    walks it with the same beam/tie rules).

    The static defaults are the serving-dial FLOORS, which
    serving_dials(n) returns exactly for n ≤ RING_BUCKET — every
    oracle-gated corpus (sf0.001–sf0.1: 500–2000 vectors). Past that
    knee hops is data-dependent and a static unroll cannot follow it;
    graph quality there is pinned by the measured recall floors (module
    dial table + the scaled-fixture pytest), not by hashes."""
    parts = _sql_init_parts(table, id_col, vec_col, graph_k)
    for r in range(graph_rounds):
        parts += _sql_round_parts(r, graph_k)
    parts += [
        f"graph AS MATERIALIZED (SELECT id, nbr FROM nb{graph_rounds})",
        f"q AS MATERIALIZED (SELECT id AS qid, x AS xq FROM base "
        f"WHERE {query_pred})",
        f"entry AS (SELECT id AS node FROM coded ORDER BY code, id "
        f"LIMIT {entries})",
        "s0 AS (SELECT qid, node FROM q CROSS JOIN entry)",
    ]
    for h in range(hops):
        parts += [
            f"e{h} AS (SELECT s.qid, gg.nbr AS node "
            f"FROM s{h} s JOIN graph gg ON gg.id = s.node)",
            f"u{h} AS (SELECT DISTINCT qid, node FROM "
            f"(SELECT qid, node FROM s{h} UNION ALL "
            f"SELECT qid, node FROM e{h}) t)",
            f"d{h} AS (SELECT u.qid, u.node, {_SQL_QDIST} AS d2 "
            f"FROM u{h} u JOIN q ON q.qid = u.qid JOIN base b ON b.id = u.node)",
            f"s{h + 1} AS MATERIALIZED (SELECT qid, node, d2, rn FROM "
            f"(SELECT qid, node, d2, row_number() OVER "
            f"(PARTITION BY qid ORDER BY d2, node) AS rn FROM d{h}) "
            f"WHERE rn <= {beam})",
        ]
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT qid, node AS nbr, d2, rn AS rank FROM s{hops} "
        f"WHERE rn <= {k}"
    )


# --- maintained artifact: build / O(delta) append / serve --------------------
#
# The graph-ANN family's standing-corpus form (the X152/X172 artifact
# pattern): `maintain knn-graph` persists (vectors, graph, meta);
# `knn-graph-append` inserts a NEW-ids batch at delta cost — exactly how
# incremental graph-ANN insertion works (HNSW: search, then connect):
#   1. each delta vector BEAM-SEARCHES the existing graph for its
#      approximate top-k (frontier-bound — the corpus is never scanned),
#   2. within-batch exact pairs come from one bounded |delta|² kernel
#      block (batches are documented <= RING_BUCKET vectors; chunk
#      larger ingests),
#   3. delta nodes adopt the k closest of (found ∪ within-batch),
#   4. REVERSE edges: only the nodes the beam search actually found
#      (<= |delta|·k of them) rescore their neighbor lists against the
#      delta — untouched nodes' rows are carried verbatim,
#   5. vectors append; the graph table is rewritten (n·k skinny rows —
#      at lakehouse scale the rewrite routes through the partition-
#      pruned MERGE (X124) keyed on affected ids, the X175 note).
# The merged graph is NOT the bit-image of a from-scratch NN-Descent
# run (insertion is a different — also approximate — path), so the pin
# is QUALITY, not hashes: recall of the merged graph stays within a
# fixed margin of the from-scratch build on the grown corpus, and the
# delta rows are exactly the top-k of their candidate sets (replayable).

KNN_META = "_knn_meta.json"


def _read_meta(out_dir: str) -> dict:
    import json
    import os

    with open(os.path.join(out_dir, KNN_META)) as f:
        return json.load(f)


def build_knn_artifact(
    spark,
    out_dir: str,
    src: DataFrame,
    k: int = KNN_K,
    rounds: int = KNN_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    import json
    import os

    base = src.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("x")
    )
    graph = knn_graph(src, k=k, rounds=rounds, id_col=id_col, vec_col=vec_col)
    os.makedirs(out_dir, exist_ok=True)
    base.repartition(1).sortWithinPartitions("id").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "vectors"))
    graph.repartition(1).sortWithinPartitions("id", "rank").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "graph"))
    n = spark.read.parquet(os.path.join(out_dir, "vectors")).count()
    ne = spark.read.parquet(os.path.join(out_dir, "graph")).count()
    with open(os.path.join(out_dir, KNN_META), "w") as f:
        json.dump({"k": k, "rounds": rounds, "n": n, "edges": ne}, f)
    return {"n": n, "edges": ne, "k": k}


def append_knn_artifact(
    spark,
    out_dir: str,
    delta: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_scale: str = "raise",
) -> dict:
    """Insert a NEW-ids delta batch (see module comment for the five
    steps). Returns audit counts. The serving-cap guard applies to the
    internal beam search too (delta neighbor lists inherit the decayed
    recall past GRAPH_SERVE_MAX_N) — `on_scale` passes through."""
    import json
    import os

    meta = _read_meta(out_dir)
    k = meta["k"]
    vectors = spark.read.parquet(os.path.join(out_dir, "vectors"))
    graph = spark.read.parquet(os.path.join(out_dir, "graph"))
    dq = delta.select(
        F.col(id_col).alias("id"), quantize(F.col(vec_col)).alias("x")
    ).persist()
    n_delta = dq.count()

    # 1. search: approximate top-k among EXISTING ids per delta vector
    found = _beam_quantized(
        vectors,
        dq.select(F.col("id").alias("qid"), F.col("x").alias("xq")),
        graph,
        k=k,
        n=meta["n"],  # dials from artifact meta — no count job
        on_scale=on_scale,
    ).persist()
    found.count()  # settle before the graph table is overwritten below

    # 2. exact within-batch pairs (single bounded kernel block)
    dd = _local_join_pairs(
        dq.select(F.lit(0).alias("m"), F.col("id").alias("mid"), "x")
    )

    # 3. delta neighbor lists (found ∪ within-batch are disjoint nbr
    # spaces — existing vs new ids — so no dedupe is needed)
    wd = Window.partitionBy("id").orderBy("d2", "nbr")
    delta_rows = (
        found.select(F.col("qid").alias("id"), "nbr", "d2")
        .unionByName(dd)
        .withColumn("rank", F.row_number().over(wd))
        .where(F.col("rank") <= k)
    )

    # 4. reverse adoption: only beam-found nodes rescore
    rev = found.select(
        F.col("nbr").alias("id"), F.col("qid").alias("nbr"), "d2"
    )
    affected = rev.select("id").distinct()
    old_affected = graph.join(F.broadcast(affected), "id").select(
        "id", "nbr", "d2"
    )
    re_topk = (
        old_affected.unionByName(rev)
        .withColumn("rank", F.row_number().over(wd))
        .where(F.col("rank") <= k)
    )
    keep = graph.join(F.broadcast(affected), "id", "left_anti")
    new_graph = keep.unionByName(re_topk).unionByName(delta_rows)

    # 5. persist the new state (vectors append; graph rewrite — see
    # module comment for the lakehouse-scale MERGE route)
    new_graph = new_graph.localCheckpoint(eager=True)  # pre-overwrite settle
    dq.write.mode("append").parquet(os.path.join(out_dir, "vectors"))
    new_graph.repartition(1).sortWithinPartitions("id", "rank").write.mode(
        "overwrite"
    ).parquet(os.path.join(out_dir, "graph"))
    n = spark.read.parquet(os.path.join(out_dir, "vectors")).count()
    ne = spark.read.parquet(os.path.join(out_dir, "graph")).count()
    n_aff = affected.count()
    dq.unpersist()
    found.unpersist()
    with open(os.path.join(out_dir, KNN_META), "w") as f:
        json.dump(
            {"k": k, "rounds": meta["rounds"], "n": n, "edges": ne}, f
        )
    return {"n": n, "edges": ne, "delta": n_delta, "rescored": n_aff}


def serve_knn_artifact(
    spark,
    out_dir: str,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    on_scale: str = "raise",
) -> DataFrame:
    import os

    vectors = spark.read.parquet(os.path.join(out_dir, "vectors"))
    graph = spark.read.parquet(os.path.join(out_dir, "graph"))
    qv = queries.select(
        F.col(id_col).alias("qid"), quantize(F.col(vec_col)).alias("xq")
    )
    # dials AND the serving-cap guard derive from the artifact's own
    # recorded size — no count job
    return _beam_quantized(
        vectors, qv, graph, k=k, n=_read_meta(out_dir)["n"], on_scale=on_scale
    )

"""Integer-exact quantized k-means (Lloyd iterations) and SemDeDup-style
semantic dedup (Abbas et al. 2023: cluster the embedding space, then
pairwise-compare only within clusters).

Why quantized: Lloyd's update is a float mean — a distributed sum whose
accumulation order Spark does not fix, so float centroids can't meet the
bit-exact oracle contract (CLAUDE.md). Instead every embedding is
quantized once to integer units (floor(v · 2^20) — exact on float32
inputs in both engines) and the centroid update is the FLOOR-DIV mean
(sum div count, per dimension): integer in, integer out, order-free.
Quantization error is ≤ 2^-20 of the coordinate range per update —
semantically irrelevant for clustering, decisive for reproducibility.
Distances are int64-safe: 64 dims · (2·2^20)^2 ≈ 2^48.

Shape at scale:
- assignment: the centroid table is k rows — a broadcast join; the
  argmin is a lexicographic struct-min hash aggregate (map-side
  partials), not a window. One shuffle on vec_id per round.
- update: the per-dim sums reuse the posexplode + (cid, dim) hash-agg
  shape of embedding_stats — map-side combine absorbs the 64× fan-out.
- rounds are FIXED (2) ⇒ linear lineage, no checkpointing needed.
- semantic near-dup: the final clusters are the blocking key — the
  pairwise cosine self-join runs per cluster, turning the corpus-wide
  O(n²) into Σ O(|cluster|²), the entire point of SemDeDup.

Empty clusters simply drop out of the next centroid table (both engines
derive them from the same assignment, so the oracle stays exact).
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

QUANT = 1 << 20  # integer units per 1.0 of embedding coordinate
KM_K = 8         # MINIMUM centroid count (the k used below this floor)
KM_ROUNDS = 2    # Lloyd updates (fixed — lineage stays linear)

# SemDeDup's contract says k must GROW with the corpus so cluster size —
# and the O(Σ cluster²) verify — stays bounded (a constant k went 2.7×
# super-linear on the 10× sweep). k = max(KM_K, n // KM_TARGET_CLUSTER):
# 256-vector target clusters keep sf0.01 (500 vecs) and sf0.1 (2000) at
# the historical k=8 (oracle hashes unchanged) while a 10× sweep corpus
# (20k) derives k=78. Pass an int k to pin it explicitly (tests do).
KM_TARGET_CLUSTER = 256

# Lloyd TRAINING is bounded: past KM_TRAIN_CAP rows, training runs on the
# KM_TRAIN_CAP vectors with the smallest md5 code of vec_id (the same
# deterministic hash-order sampling as q_sample_topk_hash, mirrored in
# SQL) and the full corpus is assigned exactly ONCE against the trained
# centroids. k derives from min(n, cap), so EVERY index-build term is
# bounded or linear: per-round training cost ≤ cap·k = cap²/target, the
# driver-side centroid collect ≤ (cap/target)·dim ints, and the one full
# assignment is n·k = n·cap/target — linear in the corpus. (Unbounded
# k = n/target made the build O(n²/target): the r05 verdict's one scale
# flaw.) The cap is the standard FAISS max_points_per_centroid form; at
# production scale it is the dial that buys more cells (cap 2^20 → 4096
# cells) for a one-time bounded training cost.
KM_MAX_CELLS = 256
KM_TRAIN_CAP = KM_TARGET_CLUSTER * KM_MAX_CELLS  # 65 536 training rows


def derived_k(n: int) -> int:
    """Shared Python-side formula; sql_derived_k is the DuckDB mirror.
    Both floor-divide non-negative counts, so they agree exactly."""
    return max(KM_K, min(n, KM_TRAIN_CAP) // KM_TARGET_CLUSTER)


def sql_derived_k(table: str) -> str:
    return (
        f"(SELECT greatest({KM_K}, least(count(*), {KM_TRAIN_CAP})"
        f" // {KM_TARGET_CLUSTER}) FROM {table})"
    )


def quantize(vec: Column) -> Column:
    """float32 array → int64 units: floor(double(v) · 2^20), exact in
    Spark and DuckDB (floor then cast; DuckDB CAST alone would round)."""
    return F.transform(vec, lambda v: F.floor(v.cast("double") * F.lit(QUANT)))


def _dist2(x: Column, m: Column) -> Column:
    d = F.zip_with(x, m, lambda a, b: (a - b) * (a - b))
    return F.aggregate(d, F.lit(0).cast("long"), lambda acc, v: acc + v)


# At/above this k, assignment uses the Arrow mapInPandas numpy kernel:
# n·k·dim integer ops go vectorized-C instead of interpreted HOF (the
# derived k makes assignment O(n²/256) in corpus size, which the HOF
# form cannot survive — the 100× sweep's k=781 ran >15 min interpreted
# vs 7 s vectorized). Integer distances are ASSOCIATIVE, so numpy's
# accumulation order is irrelevant and both paths are bit-identical
# (pinned by test_kmeans_kernel_matches_crossjoin). Default 0 = always:
# the kernel also wins at k=8 (1.92 vs 2.07 s best-of-5, sf0.1) despite
# its per-round centroid collects. The broadcast crossJoin+struct-min
# form remains as the expression-shaped reference implementation (and
# was itself the best of the pure-expression forms — CLAUDE.md).
KM_KERNEL_MIN_K = 0


def _assign(base: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, x, cid): nearest centroid by exact int distance;
    ties break to the lowest cid via lexicographic struct-min."""
    scored = base.crossJoin(F.broadcast(cents)).select(
        "vec_id", "x", F.struct(_dist2(F.col("x"), F.col("m")).alias("d"), "cid").alias("s")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min("s").alias("s"), F.first("x").alias("x"))
        .select("vec_id", "x", F.col("s.cid").alias("cid"), F.col("s.d").alias("d"))
    )


def _assign_kernel(base: DataFrame, cents_rows: list) -> DataFrame:
    """Large-k assignment: centroids as a driver-side int64 matrix
    (k·dim values — bounded, a documented broadcast-budget choice like
    bpe's per-round argmax), distances d = |x|² + |c|² − 2x·c via int64
    matmul in a mapInPandas kernel. Exact: every term < 2^50, int64
    arithmetic is associative, and np.argmin's first-minimum tie-break
    equals the struct-min's lowest-cid rule because `cents_rows` arrive
    sorted by cid ascending."""
    import numpy as np
    import pandas as pd

    cids = np.array([r.cid for r in cents_rows], dtype=np.int64)
    M = np.array([list(r.m) for r in cents_rows], dtype=np.int64)  # (k, dim)
    m_norm = (M * M).sum(axis=1)  # (k,)

    def score(it):
        for pdf in it:
            if not len(pdf):
                continue
            X = np.array(list(pdf["x"]), dtype=np.int64)  # (n, dim)
            dots = X @ M.T
            x_norm = (X * X).sum(axis=1)
            D = x_norm[:, None] + m_norm[None, :] - 2 * dots
            j = np.argmin(D, axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "x": pdf["x"],
                    "cid": cids[j],
                    "d": D[np.arange(len(j)), j],
                }
            )

    return base.mapInPandas(
        score, schema="vec_id long, x array<bigint>, cid long, d long"
    )


def _update(assigned: DataFrame) -> DataFrame:
    """(cid, m): floor-div mean per dimension."""
    # floor-div via double division + floor on BOTH engines: Spark `div`
    # truncates toward zero but DuckDB `//` floors, and per-dim sums go
    # NEGATIVE here. s and n are ≪ 2^53 and true quotients are rationals
    # with denominator n, never within an ulp of an integer unless exact,
    # so floor(double(s)/n) is the same integer in both engines.
    per_dim = (
        assigned.select("cid", F.posexplode("x").alias("dim", "v"))
        .groupBy("cid", "dim")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "cid",
            "dim",
            F.floor(F.col("s").cast("double") / F.col("n")).alias("mv"),
        )
    )
    return per_dim.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "mv"))), lambda s: s["mv"]
        ).alias("m")
    )


def _train_sample(base: DataFrame, n: int) -> tuple[DataFrame, bool]:
    """Bounded deterministic training subset: past KM_TRAIN_CAP rows,
    the cap vectors with the smallest md5 code of vec_id (ties by
    vec_id) — a pure hash order, reproducible across engines/retries,
    planned as TakeOrdered top-k heaps (no full sort). At or below the
    cap the base IS the sample, so small corpora train exactly as
    before (oracle hashes unchanged at sf0.01/sf0.1)."""
    if n <= KM_TRAIN_CAP:
        return base, False
    from mimic2ts_spark.operators.sketch import kmv_code

    return (
        base.orderBy(kmv_code(F.col("vec_id")), "vec_id").limit(KM_TRAIN_CAP),
        True,
    )


def lloyd_train(
    base: DataFrame, k: int, rounds: int = KM_ROUNDS, n: int | None = None
) -> tuple[DataFrame, list]:
    """Kernel-path Lloyd iteration over an ALREADY-QUANTIZED base
    (vec_id, x: array<bigint>): training runs on the bounded md5-order
    sample (_train_sample — the whole base when n ≤ KM_TRAIN_CAP),
    seeds = the k lowest-id rows OF THE SAMPLE, `rounds` floor-div
    updates, then ONE assignment of the FULL base against the trained
    centroids via the int64 matmul kernel. Returns (final assigned DF
    (vec_id, x, cid, d), final centroid rows sorted by cid) — the
    centroid rows ARE the trained artifact (IVF coarse cells, PQ
    codebooks) the ANN stack scores against; with k ≤ cap/target their
    driver-side size is bounded by the sample, not the corpus. Caller
    persists `base`; the sampled subset is persisted here (≤ cap rows)
    so the TakeOrdered never re-runs per round."""
    if n is None:
        n = base.count()
    train, sampled = _train_sample(base, n)
    if sampled:
        # bounded rows — spread them so the kernel batches parallelize
        # (the TakeOrdered result would otherwise land in one partition)
        par = base.sparkSession.sparkContext.defaultParallelism
        train = train.repartition(par).persist()
    cents_rows = (
        train.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("x").alias("m"))
        .orderBy("cid")
        .collect()
    )
    for _ in range(rounds):
        assigned_t = _assign_kernel(train, cents_rows)
        cents_rows = _update(assigned_t).orderBy("cid").collect()
    assigned = _assign_kernel(base, cents_rows)
    if sampled:
        train.unpersist()
    return assigned, cents_rows


# Trained coarse centroids are ARTIFACTS (like PQ codebooks): one
# training per (k, cache_key) per process — q_ann_ivf and q_ann_ivfpq
# share the same k=16/KM_ROUNDS coarse training when the harness keys
# both by sf_dir. Driver-side size is k·dim ints.
_COARSE_CACHE: dict[tuple, list] = {}


class CentRow(NamedTuple):
    """Attribute-compatible stand-in for a collected centroid Row
    (consumers access .cid / .m) when centroids load from a JSON
    artifact instead of a collect()."""

    cid: int
    m: list


def save_centroids(cents_rows: list, path: str, meta: dict | None = None) -> None:
    """Persist trained coarse centroids as a JSON artifact (the
    cross-run form of _COARSE_CACHE, like pq.save_codebooks): the IVF
    index's trained state is maintained TABLE state, not per-query
    work. Integer centroids serialize exactly — reload is bit-identical."""
    import json

    doc = dict(meta or {})
    doc["cells"] = [[int(r.cid), [int(v) for v in r.m]] for r in cents_rows]
    with open(path, "w") as f:
        json.dump(doc, f)


def load_centroids(path: str) -> tuple[list, dict]:
    """(cents_rows, meta): centroid rows attribute-compatible with the
    collect() form (CentRow), plus whatever metadata the save recorded."""
    import json

    with open(path) as f:
        doc = json.load(f)
    rows = [CentRow(cid, m) for cid, m in doc.pop("cells")]
    return rows, doc


def train_coarse(
    vectors: DataFrame,
    k: int,
    rounds: int = KM_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
    _base: DataFrame | None = None,
    n: int | None = None,
) -> list:
    """Trained centroid rows [(cid, m)] sorted by cid — the coarse-cell
    artifact of the ANN stack (IVF cells, IVF-PQ residual anchors).
    Training is sample-bounded (lloyd_train): the collect here is at
    most (KM_TRAIN_CAP/KM_TARGET_CLUSTER)·dim ints.

    _base: a caller's already-persisted quantized base to train on.
    Callers that keep their own persist of the SAME plan must pass it:
    Spark's CacheManager matches persist() by canonicalized plan, so an
    internal persist+unpersist of an identical derivation would EVICT
    the caller's cache entry out from under it. n: the caller's already
    computed row count (skips a count job)."""
    if cache_key is not None and (k, rounds, cache_key) in _COARSE_CACHE:
        return _COARSE_CACHE[(k, rounds, cache_key)]
    if _base is not None:
        base = _base
    else:
        base = vectors.select(
            F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("x")
        ).persist()
    _, cents_rows = lloyd_train(base, k, rounds, n=n)
    if _base is None:
        base.unpersist()
    if cache_key is not None:
        _COARSE_CACHE[(k, rounds, cache_key)] = cents_rows
    return cents_rows


def kmeans_assign(
    vectors: DataFrame,
    k: int | None = None,
    rounds: int = KM_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
) -> DataFrame:
    """(vec_id, cid, d): cluster assignment (and final int distance)
    after `rounds` quantized Lloyd updates seeded by the k lowest-id
    vectors (the oracle contract forbids trainable state; the ITERATION
    is the machinery under test; ivf_topk/ivfpq share it via
    train_coarse).

    k=None (default) derives k from the corpus size via derived_k — one
    count() job up front (a scalar, not a collect of data). cache_key
    memoizes the trained centroids (train_coarse): consumers sharing a
    key (q_kmeans / q_dedup_semantic per sf_dir) pay ONE training and a
    single assignment pass each — the same artifact framing as PQ
    codebooks, bit-identical because training is deterministic."""
    base = vectors.select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("x")
    ).persist()
    n = base.count()
    if k is None:
        k = derived_k(n)
    if k >= KM_KERNEL_MIN_K:
        # kernel path: centroids collect per round (k rows, bounded);
        # assignment lineage stays FLAT (base + literal matrix), so
        # rounds never stack join plans.
        if cache_key is not None:
            cents_rows = train_coarse(
                vectors, k, rounds, id_col, vec_col, cache_key, _base=base, n=n
            )
            assigned = _assign_kernel(base, cents_rows)
        else:
            assigned, _ = lloyd_train(base, k, rounds, n=n)
    else:
        cents = (
            base.orderBy("vec_id")
            .limit(k)
            .select(F.col("vec_id").alias("cid"), F.col("x").alias("m"))
        )
        assigned = _assign(base, cents)
        for _ in range(rounds):
            cents = _update(assigned)
            assigned = _assign(base, cents)
    return assigned.select("vec_id", "cid", "d")


def kmeans_cluster_stats(
    vectors: DataFrame,
    k: int | None = None,
    rounds: int = KM_ROUNDS,
    cache_key: str | None = None,
) -> DataFrame:
    """(cid, n, inertia): cluster sizes and exact integer inertia after
    the fixed Lloyd rounds — the convergence scoreboard."""
    a = kmeans_assign(vectors, k, rounds, cache_key=cache_key)
    return a.groupBy("cid").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("d").alias("inertia")
    )


SEM_SUB_BOUND = 512  # max rows per exact-verify gram group (see below)
_SEM_SIZES_CACHE: dict = {}  # (cache_key, k, rounds, id, vec) -> {cid: csize}


def canonical_vectors(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact-dedup gate for the embedding side (the vector twin of
    dedup.canonical_docs): byte-identical vectors collapse to their
    min-id canonical row, keyed on the md5 of the comma-joined QUANTIZED
    int coordinates (integer→string rendering is engine-portable, float
    rendering is not). This is the composition that handles what LSH
    sub-bucketing cannot: identical vectors co-bucket under EVERY
    deterministic function of the vector, so a 100-copy cluster pays its
    Θ(c²) pairs in any pairwise stage unless the copies are removed
    first — exact groups reconstruct the dropped pairs."""
    key = F.md5(
        F.concat_ws(
            ",", F.transform(quantize(F.col(vec_col)), lambda v: v.cast("string"))
        )
    )
    canon_ids = vectors.groupBy(key.alias("_h")).agg(F.min(id_col).alias(id_col))
    # plain semi join (NOT broadcast): the canonical-id set is ~corpus
    # sized; AQE may still broadcast it when it is actually small
    return vectors.join(canon_ids.select(id_col), id_col, "left_semi")


def sql_canonical_vectors(
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """DuckDB mirror of canonical_vectors as a derived-table expression."""
    q = _sql_quant(vec_col)
    return f"""(SELECT e.* FROM {table} e JOIN (
        SELECT min({id_col}) AS {id_col} FROM (
            SELECT {id_col}, md5(array_to_string({q}, ',')) AS _h FROM {table}
        ) GROUP BY _h
    ) k ON k.{id_col} = e.{id_col})"""


def semantic_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    k: int | None = None,
    rounds: int = KM_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cache_key: str | None = None,
    sub_bound: int = SEM_SUB_BOUND,
) -> DataFrame:
    """SemDeDup: (vec_a, vec_b, cid, cosine) for same-cluster pairs with
    cosine ≥ threshold. The cluster id is the blocking key of the
    pairwise join; cosine uses the exact float64 expression shared with
    the ANN oracle paths. Misses only pairs k-means separates — the
    accepted recall trade of clustering-blocked dedup (X24's LSH path
    is the recall-bounded alternative).

    Bounded verify (the r06-verdict scale fix): past the Lloyd train cap
    cells plateau, so |cluster| grows with n and an unbounded in-cluster
    gram verify pays Σ cluster² (measured 33 s at the 100× sweep vs
    0.94 s at sf0.1). Clusters larger than `sub_bound` are therefore
    SUB-BUCKETED before the verify: each row gets SEM_SUB_TABLES
    independent sign-bit sub-signatures (similarity.sem_sub_signatures —
    deterministic closed-form planes disjoint from the X24 tables), the
    per-cluster key width nb grows with cluster size
    (2^nb ≈ csize / sub_bound, capped at SEM_SUB_MAX_BITS), and a pair
    is a candidate if it co-buckets in ANY table (X24 OR-semantics,
    dropDuplicates after the kernel). Verify work becomes
    Σ T · csize · sub_bound — linear in n. Clusters ≤ sub_bound take the
    single-group path unchanged (nb = 0, one table), so small-corpus
    results and gate hashes are identical to the unbounded form. Within
    an oversized cluster a true pair no table co-buckets is missed —
    the same documented recall trade as X24, mirrored exactly by the
    oracle (sql_semantic_near_dup_pairs replays the identical plane
    folds and masks)."""
    import numpy as np
    import pandas as pd

    from mimic2ts_spark.operators.similarity import (
        SEM_SUB_MAX_BITS,
        SEM_SUB_TABLES,
        sem_sub_signatures,
    )

    a = kmeans_assign(vectors, k, rounds, id_col, vec_col, cache_key=cache_key).select(
        "vec_id", "cid"
    )
    v = vectors.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("vec"))
    # Cluster sizes are ≤ cells rows — a bounded driver-side scalar (the
    # same budget class as the centroid collects), memoized per corpus
    # like the centroids themselves (a plain row cache: immune to
    # release_storage, must NOT register — CLAUDE.md r06). Reading them
    # here lets the common case (no cluster above sub_bound — every
    # corpus below ~sub_bound·cells rows) keep the ORIGINAL single-leg
    # plan with zero new plan weight; the decision is deterministic
    # (sizes are), so the oracle — whose SQL takes the nb = 0 branch on
    # the same data — stays value-identical either way.
    skey = (cache_key, k, rounds, id_col, vec_col)
    if cache_key is not None and skey in _SEM_SIZES_CACHE:
        sizes = _SEM_SIZES_CACHE[skey]
    else:
        # persist: two consumers on the first call (sizes + main pass);
        # repeat calls hit the canonical-plan cache or skip via the memo
        a = a.persist()
        sizes = {
            r.cid: r.csize
            for r in a.groupBy("cid")
            .agg(F.count(F.lit(1)).cast("long").alias("csize"))
            .collect()
        }
        if cache_key is not None:
            _SEM_SIZES_CACHE[skey] = sizes

    def _nb(csize: int) -> int:
        # Key width must absorb the T-table OR fan-out: gram work per
        # oversized cluster is T·c²/2^nb, so break-even needs
        # 2^nb ≥ T·c/bound (with 2^nb ≈ c/bound the fan-out would make
        # splitting WORSE than the unbounded gram until nb > log2 T).
        # nb = bits of m = (T·(c−1)) div bound: Σ_i [m ≥ 2^i]
        # = floor(log2 m) + 1 — pure ints, the exact math the SQL
        # mirror's CASE chain replays (no float log, CLAUDE.md rule)
        m = (SEM_SUB_TABLES * (csize - 1)) // sub_bound
        return sum(1 for i in range(SEM_SUB_MAX_BITS) if m >= (1 << i))

    nb_rows = [(cid, _nb(cs)) for cid, cs in sizes.items() if cs > sub_bound]
    if nb_rows:
        nb_df = vectors.sparkSession.createDataFrame(nb_rows, "cid long, nb int")
        grouped = a.join(v, "vec_id").join(F.broadcast(nb_df), "cid", "left").withColumn(
            "nb", F.coalesce("nb", F.lit(0))
        )
    else:
        grouped = a.join(v, "vec_id").withColumn("nb", F.lit(0))
    # Two legs: bounded clusters (nb = 0) keep the original
    # one-group-per-cluster path; only oversized clusters pay the
    # signature UDF, the T-table fan-out and the pair dedup. Legs can't
    # overlap (a cluster is entirely in one leg), so the union needs no
    # global dedup.
    any_oversized = bool(nb_rows)
    small = grouped.where(F.col("nb") == 0).select("vec_id", "cid", "vec")
    big = (
        grouped.where(F.col("nb") > 0)
        .withColumn("sig", sem_sub_signatures("vec"))
        .select(
            "vec_id",
            "cid",
            "vec",
            "nb",
            "sig",
            F.explode(F.expr(f"sequence(0, {SEM_SUB_TABLES - 1})")).alias("t"),
        )
        .withColumn(
            "sub",
            F.expr("element_at(sig, t + 1) % CAST(shiftleft(1L, nb) AS BIGINT)"),
        )
    )

    # Per-group Arrow gram kernel (applyInPandas): the (cluster, table,
    # sub-bucket) group IS the SemDeDup unit of work — the paper sizes
    # clusters to a batch; sub_bound re-establishes that invariant when
    # derived-k plateaus. The join-shaped alternative (pair rows +
    # per-pair cosine expression) paid ~5s at sf0.1 in interpreted HOF
    # evaluation for the same math.
    # Accumulation is the dim-by-dim left-to-right loop shared with
    # similarity.py's kernels, so cosines bit-match sql_cosine; the
    # neighbor axis is tiled to keep the accumulator cache-resident.
    TILE = 1024

    def score(key, pdf):
        cid = int(key[0])
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        mat = np.array(list(pdf["vec"]), dtype=np.float64)
        n = len(ids)
        norm2 = np.zeros(n, dtype=np.float64)
        for d in range(mat.shape[1]):  # left-to-right, matches SQL_DOT
            norm2 += mat[:, d] * mat[:, d]
        norms = np.sqrt(norm2)
        out_a, out_b, out_c = [], [], []
        for t0 in range(0, n, TILE):
            t1 = min(t0 + TILE, n)
            dot = np.zeros((n, t1 - t0), dtype=np.float64)
            for d in range(mat.shape[1]):
                dot += mat[:, d, None] * mat[None, t0:t1, d]
            cos = dot / (norms[:, None] * norms[None, t0:t1])
            keep = (ids[:, None] < ids[None, t0:t1]) & (cos >= threshold)
            ai, bj = np.nonzero(keep)
            out_a.append(ids[ai])
            out_b.append(ids[t0:t1][bj])
            out_c.append(cos[ai, bj])
        return pd.DataFrame(
            {
                "vec_a": np.concatenate(out_a) if out_a else np.array([], np.int64),
                "vec_b": np.concatenate(out_b) if out_b else np.array([], np.int64),
                "cid": cid,
                "cosine": np.concatenate(out_c) if out_c else np.array([], np.float64),
            }
        )

    schema = "vec_a long, vec_b long, cid long, cosine double"
    small_pairs = small.groupBy("cid").applyInPandas(score, schema)
    if not any_oversized:
        return small_pairs
    big_pairs = (
        big.groupBy("cid", "t", "sub")
        .applyInPandas(score, schema)
        .dropDuplicates(["vec_a", "vec_b"])
    )
    return small_pairs.unionByName(big_pairs)


# --- SQL mirrors -----------------------------------------------------------


def _sql_quant(vec: str) -> str:
    return (
        f"list_transform({vec}, v -> CAST(floor(CAST(v AS DOUBLE) * {QUANT}) AS BIGINT))"
    )


_SQL_DIST = (
    "list_aggregate(list_transform(generate_series(1, len(x)), "
    "i -> (x[i] - m[i]) * (x[i] - m[i])), 'sum')"
)


def _sql_assign(base: str, cents: str) -> str:
    return f"""(
    SELECT vec_id, x, cid, d FROM (
        SELECT b.vec_id, b.x, c.cid, {_SQL_DIST} AS d,
               row_number() OVER (
                   PARTITION BY b.vec_id ORDER BY {_SQL_DIST}, c.cid
               ) AS rn
        FROM {base} b CROSS JOIN {cents} c
    ) WHERE rn = 1
)"""


def _sql_update(assigned: str) -> str:
    return f"""(
    SELECT cid, list(mv ORDER BY dim) AS m FROM (
        SELECT a.cid, g.i AS dim,
               CAST(floor(CAST(sum(a.x[CAST(g.i AS INTEGER)]) AS DOUBLE)
                          / count(*)) AS BIGINT) AS mv
        FROM {assigned} a, unnest(generate_series(1, len(a.x))) AS g(i)
        GROUP BY 1, 2
    ) GROUP BY 1
)"""


def sql_kmeans_parts(
    table: str,
    k: int | str | None = None,
    rounds: int = KM_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    prefix: str = "",
    pre_quantized: bool = False,
    train_cap: int | None = KM_TRAIN_CAP,
) -> tuple[list[str], str, str]:
    """CTE chain for one unrolled Lloyd run; returns (parts,
    final_assign_cte, final_cents_cte) so composites (PQ's M subspace
    runs, ADC tables against the trained codebook) can reuse it under a
    name prefix. pre_quantized=True skips the float→int quantization
    (for bases that are already integer, e.g. IVF-PQ residuals).

    train_cap mirrors _train_sample: the training CTEs (seeds + the
    `rounds` update assignments) read the md5-order top-cap sample and
    only the FINAL assignment runs over the full base. At n ≤ cap the
    LIMIT keeps every row, so the chain is value-identical to the
    uncapped form (the Spark side skips the sort entirely there).
    Pass train_cap=None for chains whose Spark twin trains on the full
    base (PQ's fixed-k=16 subspace codebooks — linear, not the derived-k
    quadratic the cap exists to bound)."""
    if k is None:
        k = sql_derived_k(table)  # DuckDB: scalar-subquery LIMIT
    p = prefix
    x_expr = vec_col if pre_quantized else _sql_quant(vec_col)
    parts = [
        f"{p}base AS (SELECT {id_col} AS vec_id, {x_expr} AS x FROM {table})",
    ]
    if train_cap is not None:
        from mimic2ts_spark.operators.text import SQL_CODE

        code = SQL_CODE.format(tok="CAST(vec_id AS VARCHAR)")
        parts.append(
            f"{p}train AS (SELECT vec_id, x FROM {p}base "
            f"ORDER BY {code}, vec_id LIMIT {train_cap})"
        )
        train = f"{p}train"
    else:
        train = f"{p}base"
    parts.append(
        f"{p}c0 AS (SELECT vec_id AS cid, x AS m FROM {train} ORDER BY vec_id LIMIT {k})"
    )
    for r in range(rounds):
        parts.append(f"{p}a{r} AS {_sql_assign(train, f'{p}c{r}')}")
        parts.append(f"{p}c{r + 1} AS {_sql_update(f'{p}a{r}')}")
    parts.append(f"{p}a{rounds} AS {_sql_assign(f'{p}base', f'{p}c{rounds}')}")
    return parts, f"{p}a{rounds}", f"{p}c{rounds}"


def sql_kmeans_assign(
    table: str = "embeddings",
    k: int | str | None = None,
    rounds: int = KM_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    train_cap: int | None = KM_TRAIN_CAP,
) -> str:
    """Unrolled CTE mirror of kmeans_assign (same quantization, same
    md5-sample-bounded training, same floor-div update, same (d, cid)
    tie-break)."""
    parts, final_a, _ = sql_kmeans_parts(
        table, k, rounds, id_col, vec_col, train_cap=train_cap
    )
    return "WITH " + ",\n".join(parts) + f"\nSELECT vec_id, cid, d FROM {final_a}"


def sql_kmeans_cluster_stats(
    table: str = "embeddings", k: int | str | None = None, rounds: int = KM_ROUNDS
) -> str:
    inner = sql_kmeans_assign(table, k, rounds)
    return (
        f"SELECT cid, CAST(count(*) AS BIGINT) AS n, "
        f"CAST(sum(d) AS BIGINT) AS inertia FROM ({inner}) GROUP BY cid"
    )


def sql_semantic_near_dup_pairs(
    threshold: float,
    table: str = "embeddings",
    k: int | str | None = None,
    rounds: int = KM_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sub_bound: int = SEM_SUB_BOUND,
) -> str:
    """Mirror of semantic_near_dup_pairs INCLUDING the bounded verify:
    per-cluster nb from the same integer bit-count, per-table signatures
    from the identical plane folds (sql_sem_sub_signature), X24
    OR-semantics via UNION of sub-tables + DISTINCT. Clusters ≤
    sub_bound go through the nb = 0 branch (single group), so at gate
    scale the result — and its cost — is identical to the unbounded
    form; the sig folds are only evaluated for oversized clusters."""
    from mimic2ts_spark.operators.similarity import (
        SEM_SUB_MAX_BITS,
        SEM_SUB_TABLES,
        sql_cosine,
        sql_sem_sub_signature,
    )

    assign = sql_kmeans_assign(table, k, rounds, id_col, vec_col)
    cos = sql_cosine("l.vec", "r.vec")
    nb_expr = " + ".join(
        f"(CASE WHEN ({SEM_SUB_TABLES} * (csize - 1)) // {int(sub_bound)}"
        f" >= {1 << i} THEN 1 ELSE 0 END)"
        for i in range(SEM_SUB_MAX_BITS)
    )
    sig_cols = ",\n           ".join(
        f"{sql_sem_sub_signature('s.vec', t)} AS sig{t}"
        for t in range(SEM_SUB_TABLES)
    )
    sig_case = " ".join(
        f"WHEN {t} THEN sig{t}" for t in range(SEM_SUB_TABLES)
    )
    tables_list = ", ".join(str(t) for t in range(SEM_SUB_TABLES))
    return f"""
WITH sides AS MATERIALIZED (
    SELECT a.vec_id, a.cid, t.{vec_col} AS vec
    FROM ({assign}) a JOIN {table} t ON a.vec_id = t.{id_col}
),
csz AS (
    -- nb only for clusters past the TRIGGER (csize > bound — the same
    -- predicate the Spark side splits legs on); the width then absorbs
    -- the T-table fan-out: 2^nb >= T*csize/bound
    SELECT cid, (CASE WHEN csize > {int(sub_bound)} THEN ({nb_expr}) ELSE 0 END) AS nb
    FROM (SELECT cid, count(*) AS csize FROM sides GROUP BY cid)
),
sig AS (
    SELECT s.vec_id, s.cid, s.vec, n.nb,
           {sig_cols}
    FROM sides s JOIN csz n USING (cid) WHERE n.nb > 0
),
keyed AS MATERIALIZED (
    SELECT vec_id, cid, vec, tt.t,
           (CASE tt.t {sig_case} END) % (1 << nb) AS sub
    FROM sig, unnest([{tables_list}]) AS tt(t)
    UNION ALL
    SELECT s.vec_id, s.cid, s.vec, 0 AS t, 0::BIGINT AS sub
    FROM sides s JOIN csz n USING (cid) WHERE n.nb = 0
)
SELECT DISTINCT l.vec_id AS vec_a, r.vec_id AS vec_b, l.cid, {cos} AS cosine
FROM keyed l JOIN keyed r
  ON l.cid = r.cid AND l.t = r.t AND l.sub = r.sub AND l.vec_id < r.vec_id
WHERE {cos} >= {threshold}
"""


# --- greedy k-center coreset (diversity-maximizing data selection) ----------

KC_ROUNDS = 8


def kcenter_coreset(
    df: DataFrame,
    k: int = KC_ROUNDS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy farthest-point selection (Gonzalez 1985, the classic
    2-approximation of the k-center objective) over quantized integer
    coordinates — CORPUS-LEVEL diversity selection, the companion of
    per-query MMR (X151): pick the min-id vector as the seed, then k-1
    times select the vector with the MAXIMUM running min-distance to
    the selected set (ties to the lowest id).

    Each round is ONE Column-expression pass tightening the running
    min (least(dmin, dist-to-latest-pick), the latest pick shipped as
    a parsed literal int array — r6: never F.array of 64 F.lits) plus
    one max-struct aggregate; the iterated dmin lineage is truncated
    per round (eager localCheckpoint, the r2 rule). Integer distances
    make every round bit-exact against the oracle's unrolled CTE
    chain; per-round argmax collects are bounded scalars (a documented
    broadcast-budget choice, like BPE's per-round argmax).

    Returns (round, vec_id, dist): dist is the selection-time distance
    to the previously selected set (0 for the seed) — monotone
    non-increasing over rounds, a property pinned in pytest."""
    base = df.select(
        F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("x")
    )
    seed = base.orderBy("vec_id").limit(1).collect()[0]
    picks = [(0, int(seed.vec_id), 0)]
    latest_x = list(seed.x)
    state = base.withColumn("dmin", F.lit((1 << 62)).cast("long"))
    for rnd in range(1, k):
        lit_x = F.expr("array(" + ",".join(f"{int(v)}L" for v in latest_x) + ")")
        # eager stays (r15 A/B, VERDICT r14 #4): fusing the round's two
        # jobs via localCheckpoint(eager=False) — the argmax collect as
        # the materializer — was a WASH at best (new mins 1.26 vs 1.19 s
        # over 3 interleaved pairs): LocalRDDCheckpointData schedules a
        # fill-in materialization job at the first action regardless, so
        # laziness saves no job here and adds recompute jitter.
        state = state.withColumn(
            "dmin", F.least(F.col("dmin"), _dist2(F.col("x"), lit_x))
        ).localCheckpoint(eager=True)
        top = (
            state.select(
                F.struct(F.col("dmin"), (-F.col("vec_id")).alias("nid")).alias("s"),
                "vec_id",
                "x",
            )
            .orderBy(F.desc("s"))
            .limit(1)
            .collect()[0]
        )
        picks.append((rnd, int(top.vec_id), int(top.s.dmin)))
        latest_x = list(top.x)
    spark = df.sparkSession
    return spark.createDataFrame(picks, "round long, vec_id long, dist long")


def sql_kcenter_coreset(table: str, k: int = KC_ROUNDS) -> str:
    """DuckDB oracle: the identical greedy unrolled as k-1 CTE steps —
    each step tightens the running min against the previous pick
    (1-row cross join) and takes the (dist DESC, id ASC) top-1."""
    dist = (
        "list_aggregate(list_transform(generate_series(1, len({a})), "
        "i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), 'sum')"
    )
    parts = [
        f"b AS (SELECT vec_id, {_sql_quant('embedding')} AS x FROM {table})",
        "s0 AS (SELECT vec_id, x FROM b ORDER BY vec_id LIMIT 1)",
        f"""d1 AS (SELECT b.vec_id, b.x,
            CAST({dist.format(a='b.x', b='s0.x')} AS BIGINT) AS dmin
            FROM b CROSS JOIN s0)""",
        "p1 AS (SELECT vec_id, x, dmin FROM d1 ORDER BY dmin DESC, vec_id LIMIT 1)",
    ]
    for r in range(2, k):
        parts.append(
            f"""d{r} AS (SELECT d.vec_id, d.x,
            least(d.dmin, CAST({dist.format(a='d.x', b=f'p{r-1}.x')} AS BIGINT)) AS dmin
            FROM d{r-1} d CROSS JOIN p{r-1})"""
        )
        parts.append(
            f"p{r} AS (SELECT vec_id, x, dmin FROM d{r} "
            f"ORDER BY dmin DESC, vec_id LIMIT 1)"
        )
    unions = ["SELECT CAST(0 AS BIGINT) AS round, s0.vec_id, CAST(0 AS BIGINT) AS dist FROM s0"]
    unions += [
        f"SELECT CAST({r} AS BIGINT), p{r}.vec_id, CAST(p{r}.dmin AS BIGINT) FROM p{r}"
        for r in range(1, k)
    ]
    return "WITH " + ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(unions)

"""Product quantization (Jégou et al. 2011, "Product Quantization for
Nearest Neighbor Search"): split the embedding space into M orthogonal
subspaces, learn a small codebook per subspace (k-means), encode every
vector as M small codes, and answer queries by Asymmetric Distance
Computation — the query's exact subvectors against the codebook, so
each candidate costs M table lookups instead of a full dim-by-dim scan.

Why this matters at 100 TB: PQ is the memory side of ANN scale. IVF
(similarity.py) bounds which vectors a query touches; PQ bounds the
bytes per touched vector (M codes ≈ 4 bytes vs 256 bytes of float32) —
a ~64× compression of the candidate stream through any shuffle. The
two compose (IVF-PQ) exactly as built here: both are the same k-means
machinery (operators/kmeans.py), so codebooks, codes, and ADC
distances inherit its integer-exact cross-engine contract.

Shape at scale:
- encoding: M independent kmeans passes over SLICED vectors (each 1/M
  of the bytes; the Arrow int64-matmul assignment kernel), joined back
  on vec_id as slim (vec_id, code) rows.
- ADC query: the query row and the k·M-integer distance table are
  bounded driver-side literals (documented broadcast-budget choices,
  like the BPE merge rules); scoring is ONE scan over the encoded
  corpus with M map lookups per row — zero joins — and top-k plans as
  TakeOrderedAndProject.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mimic2ts_spark.operators.kmeans import (
    _assign_kernel,
    _sql_quant,
    _update,
    kmeans_assign,
    quantize,
    sql_kmeans_parts,
)

PQ_M = 4        # subspaces
PQ_SUB = 16     # dims per subspace (embeddings are 64-d)
PQ_K = 16       # centroids per subspace codebook
PQ_ROUNDS = 1   # Lloyd rounds per codebook
PQ_TOP_K = 20


def _sub(vec_col: str, m: int):
    return F.slice(F.col(vec_col), m * PQ_SUB + 1, PQ_SUB)


def _train_subspace(
    vectors: DataFrame, m: int, id_col: str, vec_col: str
) -> tuple[DataFrame, list]:
    """(assigned, final_centroid_rows) for subspace m — the exact loop
    kmeans_assign runs, with the centroids of the FINAL assignment kept
    (they are the codebook ADC scores against)."""
    sub = vectors.select(
        F.col(id_col).alias("vec_id"), quantize(_sub(vec_col, m)).alias("x")
    ).persist()
    seed_rows = (
        sub.orderBy("vec_id")
        .limit(PQ_K)
        .select(F.col("vec_id").alias("cid"), F.col("x").alias("m"))
        .orderBy("cid")
        .collect()
    )
    assigned, cents_rows = _assign_kernel(sub, seed_rows), seed_rows
    for _ in range(PQ_ROUNDS):
        cents_rows = _update(assigned).orderBy("cid").collect()
        assigned = _assign_kernel(sub, cents_rows)
    return assigned, cents_rows


def _train_all(vectors: DataFrame, id_col: str, vec_col: str) -> list:
    """Train the M independent subspace codebooks CONCURRENTLY (Spark
    job submission is thread-safe; each subspace's collect-per-round
    chain interleaves with the others, so wall ≈ one subspace instead
    of M — measured 4.9 → ~2 s at sf0.1). Determinism is untouched:
    subspaces share no state."""
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(PQ_M) as ex:
        return list(
            ex.map(
                lambda m: _train_subspace(vectors, m, id_col, vec_col),
                range(PQ_M),
            )
        )


def pq_encode(
    vectors: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """(vec_id, code_0..code_{M-1}, distortion): per-subspace codebook
    codes plus the exact integer quantization distortion Σ_m d_m — the
    PQ reconstruction-error scoreboard."""
    trained = _train_all(vectors, id_col, vec_col)
    out = None
    distortion = None
    for m in range(PQ_M):
        a, _ = trained[m]
        a = a.select(
            "vec_id",
            F.col("cid").alias(f"code_{m}"),
            F.col("d").alias(f"_d{m}"),
        )
        out = a if out is None else out.join(a, "vec_id")
        dm = F.col(f"_d{m}")
        distortion = dm if distortion is None else distortion + dm
    return out.select(
        "vec_id",
        *[f"code_{m}" for m in range(PQ_M)],
        distortion.cast("long").alias("distortion"),
    )


def pq_adc_topk(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_k: int = PQ_TOP_K,
) -> DataFrame:
    """(vec_id, adc_dist2): the top_k nearest encoded vectors to the
    lowest-id vector, by ADC over the learned codebooks. Python-side
    distance-table arithmetic is pure int — bit-equal to the SQL
    mirror's integer expressions."""
    q_id, q_vec = _query_row(vectors, id_col, vec_col)
    enc, dist_expr = _encode_with_adc(vectors, q_vec, id_col, vec_col)
    return (
        enc.where(F.col("vec_id") != q_id)
        .select("vec_id", dist_expr.cast("long").alias("adc_dist2"))
        .orderBy("adc_dist2", "vec_id")
        .limit(top_k)
    )


def _query_row(vectors: DataFrame, id_col: str, vec_col: str) -> tuple[int, list]:
    q_row = (
        vectors.select(
            F.col(id_col).alias("vec_id"), quantize(F.col(vec_col)).alias("qx")
        )
        .orderBy("vec_id")
        .limit(1)
        .collect()[0]
    )
    return int(q_row["vec_id"]), [int(v) for v in q_row["qx"]]


def _encode_with_adc(vectors, q_vec, id_col, vec_col):
    """(enc_df, adc_dist_expr): codes joined across subspaces plus the
    literal-map ADC distance expression for the given quantized query."""
    trained = _train_all(vectors, id_col, vec_col)
    enc = None
    dist_expr = None
    for m in range(PQ_M):
        assigned, cents_rows = trained[m]
        a = assigned.select("vec_id", F.col("cid").alias(f"code_{m}"))
        enc = a if enc is None else enc.join(a, "vec_id")

        q_sub = q_vec[m * PQ_SUB : (m + 1) * PQ_SUB]
        entries = []
        for r in cents_rows:
            c = [int(v) for v in r["m"]]
            d2 = sum((x - y) * (x - y) for x, y in zip(q_sub, c))
            entries.append((int(r["cid"]), d2))
        mapping = F.map_from_arrays(
            F.array(*[F.lit(c).cast("long") for c, _ in entries]),
            F.array(*[F.lit(d).cast("long") for _, d in entries]),
        )
        term = F.element_at(mapping, F.col(f"code_{m}"))
        dist_expr = term if dist_expr is None else dist_expr + term
    return enc, dist_expr


def ivfpq_topk(
    vectors: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_k: int = PQ_TOP_K,
) -> DataFrame:
    """IVF-PQ: the two ANN scale halves composed — the IVF cell
    structure bounds WHICH vectors the query touches (nprobe/n_centroids
    of the corpus), PQ bounds the BYTES per touched vector (M codes +
    map lookups, no float vectors in the candidate stream). Cell
    assignment/probing reuses similarity.py's centroid-cosine kernel
    (bit-equal to the SQL cosine); candidate ranking is the ADC
    expression. Production IVF-PQ encodes residuals-vs-cell-centroid;
    here codebooks are global (the oracle contract forbids trainable
    state) — the DISTRIBUTED SHAPE (probe-limited candidate join +
    code-table ranking) is the part that matters at scale."""
    import numpy as np

    from mimic2ts_spark.operators.similarity import (
        IVF_K,
        IVF_NPROBE,
        _centroid_scores_udf,
    )

    cents = (
        vectors.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy("cid")
        .limit(IVF_K)
        .collect()
    )
    cent_ids = np.array([r.cid for r in cents], dtype=np.int64)
    cent_mat = np.array([list(r.cvec) for r in cents], dtype=np.float64)
    cent_norm2 = np.zeros(len(cents), dtype=np.float64)
    for d in range(cent_mat.shape[1]):
        cent_norm2 += cent_mat[:, d] * cent_mat[:, d]
    cent_norms = np.sqrt(cent_norm2)

    assign = _centroid_scores_udf(cent_ids, cent_mat, cent_norms, 1)
    probe = _centroid_scores_udf(cent_ids, cent_mat, cent_norms, IVF_NPROBE)

    # probed cells of the query — through the SAME kernel, so the cell
    # choice is bit-identical to the corpus assignment path
    probed = [
        int(c)
        for c in vectors.orderBy(id_col)
        .limit(1)
        .select(probe(F.col(vec_col)).alias("cells"))
        .collect()[0]["cells"]
    ]

    q_id, q_vec = _query_row(vectors, id_col, vec_col)
    enc, dist_expr = _encode_with_adc(vectors, q_vec, id_col, vec_col)
    cells = vectors.select(
        F.col(id_col).alias("vec_id"),
        F.element_at(assign(F.col(vec_col)), 1).alias("cell"),
    )
    return (
        enc.join(cells, "vec_id")
        .where(F.col("cell").isin(probed) & (F.col("vec_id") != q_id))
        .select("vec_id", "cell", dist_expr.cast("long").alias("adc_dist2"))
        .orderBy("adc_dist2", "vec_id")
        .limit(top_k)
    )


# --- SQL mirrors -----------------------------------------------------------


def _sql_sub(vec_col: str, m: int) -> str:
    # DuckDB list slice is 1-based INCLUSIVE on both ends
    return f"{vec_col}[{m * PQ_SUB + 1}:{(m + 1) * PQ_SUB}]"


def _sql_subspace_parts(
    table: str, m: int, id_col: str, vec_col: str
) -> tuple[list[str], str, str]:
    sub_tbl = (
        f"(SELECT {id_col} AS vec_id, {_sql_sub(vec_col, m)} AS sub FROM {table})"
    )
    return sql_kmeans_parts(
        sub_tbl, k=PQ_K, rounds=PQ_ROUNDS, id_col="vec_id", vec_col="sub",
        prefix=f"s{m}_",
    )


def sql_pq_encode(
    table: str = "embeddings", id_col: str = "vec_id", vec_col: str = "embedding"
) -> str:
    """Mirror of pq_encode: M unrolled Lloyd chains over sliced
    subvectors, joined on vec_id."""
    parts: list[str] = []
    finals = []
    for m in range(PQ_M):
        p, final_a, _ = _sql_subspace_parts(table, m, id_col, vec_col)
        parts.extend(p)
        finals.append(final_a)
    joins = " ".join(
        f"JOIN {finals[m]} e{m} ON e0.vec_id = e{m}.vec_id" for m in range(1, PQ_M)
    )
    codes = ", ".join(f"e{m}.cid AS code_{m}" for m in range(PQ_M))
    dist = " + ".join(f"e{m}.d" for m in range(PQ_M))
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT e0.vec_id, {codes}, CAST({dist} AS BIGINT) AS distortion"
        + f"\nFROM {finals[0]} e0 {joins}"
    )


def sql_ivfpq_topk(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_k: int = PQ_TOP_K,
) -> str:
    """Mirror of ivfpq_topk: the IVF cell/probe CTEs (exact cosine
    argmax, same as the q_ann_ivf oracle) gating the PQ ADC ranking."""
    from mimic2ts_spark.operators.similarity import IVF_K, IVF_NPROBE, sql_cosine

    parts: list[str] = []
    finals = []
    for m in range(PQ_M):
        p, final_a, final_c = _sql_subspace_parts(table, m, id_col, vec_col)
        parts.extend(p)
        q_sub = _sql_quant(_sql_sub(vec_col, m))
        parts.append(
            f"q{m} AS (SELECT {q_sub} AS qx FROM {table} ORDER BY {id_col} LIMIT 1)"
        )
        parts.append(
            f"""adc{m} AS (
    SELECT c.cid,
           list_aggregate(list_transform(generate_series(1, len(c.m)),
               i -> (q.qx[CAST(i AS INTEGER)] - c.m[CAST(i AS INTEGER)])
                    * (q.qx[CAST(i AS INTEGER)] - c.m[CAST(i AS INTEGER)])),
               'sum') AS d2
    FROM {final_c} c CROSS JOIN q{m} q
)"""
        )
        finals.append(final_a)
    cos = sql_cosine(f"v.{vec_col}", "c.cvec")
    parts.append(f"ivf_v AS (SELECT {id_col} AS vec_id, {vec_col} FROM {table})")
    parts.append(
        f"ivf_c AS (SELECT vec_id AS cid, {vec_col} AS cvec FROM ivf_v "
        f"ORDER BY vec_id LIMIT {IVF_K})"
    )
    parts.append(
        f"""ivf_score AS (
    SELECT v.vec_id, c.cid, {sql_cosine(f'v.{vec_col}', 'c.cvec')} AS cs
    FROM ivf_v v CROSS JOIN ivf_c c
)"""
    )
    parts.append(
        """cell_of AS (
    SELECT vec_id, cid AS cell FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY cs DESC, cid) AS rn
        FROM ivf_score
    ) WHERE rn = 1
)"""
    )
    parts.append(
        f"""probes AS (
    SELECT cid AS cell FROM (
        SELECT cid, row_number() OVER (ORDER BY cs DESC, cid) AS rn
        FROM ivf_score
        WHERE vec_id = (SELECT min({id_col}) FROM {table})
    ) WHERE rn <= {IVF_NPROBE}
)"""
    )
    joins = " ".join(
        f"JOIN {finals[m]} e{m} ON e0.vec_id = e{m}.vec_id" for m in range(1, PQ_M)
    ) + " " + " ".join(f"JOIN adc{m} ON adc{m}.cid = e{m}.cid" for m in range(PQ_M))
    dist = " + ".join(f"adc{m}.d2" for m in range(PQ_M))
    return (
        "WITH " + ",\n".join(parts)
        + f"""
SELECT e0.vec_id, co.cell, CAST({dist} AS BIGINT) AS adc_dist2
FROM {finals[0]} e0 {joins}
JOIN cell_of co ON co.vec_id = e0.vec_id
JOIN probes pr ON pr.cell = co.cell
WHERE e0.vec_id != (SELECT min({id_col}) FROM {table})
ORDER BY adc_dist2, e0.vec_id
LIMIT {top_k}"""
    )


def sql_pq_adc_topk(
    table: str = "embeddings",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    top_k: int = PQ_TOP_K,
) -> str:
    """Mirror of pq_adc_topk: per-subspace ADC tables (query subvector
    vs final codebook), summed through the code joins."""
    parts: list[str] = []
    finals = []
    for m in range(PQ_M):
        p, final_a, final_c = _sql_subspace_parts(table, m, id_col, vec_col)
        parts.extend(p)
        q_sub = _sql_quant(_sql_sub(vec_col, m))
        parts.append(
            f"""q{m} AS (
    SELECT {q_sub} AS qx FROM {table} ORDER BY {id_col} LIMIT 1
)"""
        )
        parts.append(
            f"""adc{m} AS (
    SELECT c.cid,
           list_aggregate(list_transform(generate_series(1, len(c.m)),
               i -> (q.qx[CAST(i AS INTEGER)] - c.m[CAST(i AS INTEGER)])
                    * (q.qx[CAST(i AS INTEGER)] - c.m[CAST(i AS INTEGER)])),
               'sum') AS d2
    FROM {final_c} c CROSS JOIN q{m} q
)"""
        )
        finals.append(final_a)
    joins = " ".join(
        f"JOIN {finals[m]} e{m} ON e0.vec_id = e{m}.vec_id" for m in range(1, PQ_M)
    ) + " " + " ".join(f"JOIN adc{m} ON adc{m}.cid = e{m}.cid" for m in range(PQ_M))
    dist = " + ".join(f"adc{m}.d2" for m in range(PQ_M))
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT e0.vec_id, CAST({dist} AS BIGINT) AS adc_dist2"
        + f"\nFROM {finals[0]} e0 {joins}"
        + f"\nWHERE e0.vec_id != (SELECT min({id_col}) FROM {table})"
        + f"\nORDER BY adc_dist2, e0.vec_id\nLIMIT {top_k}"
    )

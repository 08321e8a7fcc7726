"""Similarity search over embedding columns (array<float>).

- Brute-force cosine top-k: the correctness baseline. All arithmetic uses
  a FIXED left-to-right op order in double precision so Spark and DuckDB
  produce bit-identical cosines (float→double widening is exact), making
  even the tie-broken top-k ranking oracle-checkable.
- Random-hyperplane LSH: the scale path. Hyperplane weights are a
  deterministic closed-form formula of (plane, dim) — reproducible in SQL
  — so bucket assignment is cross-engine identical. At 100 TB the bucket
  join replaces the O(n·m) cross product with per-bucket candidates;
  planes-per-table trades recall for bucket size.

An IVF variant would follow the same shape with learned centroids; with
no trainable state allowed in the oracle, LSH is the deterministic choice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DIM = 64
LSH_TABLES = 4
LSH_PLANES = 4  # bits per table


def _dot(a: Column, b: Column) -> Column:
    """Σ a[i]*b[i] in doubles, left-to-right (deterministic)."""
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column, b: Column) -> Column:
    """dot/(sqrt(na)*sqrt(nb)) — same op tree as the SQL mirror."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def plane_weight(table: int, plane: int, d: Column) -> Column:
    """Deterministic pseudo-random hyperplane weight in [-48/48, 48/48]:
    w(p, d) = (((2p+3) * (5d+7) + 11) mod 97 - 48) / 48,  p = table*PLANES+plane
    (d is 1-based)."""
    p = table * LSH_PLANES + plane
    raw = (F.lit(2 * p + 3) * (F.lit(5) * (d - 1) + F.lit(7)) + F.lit(11)) % 97
    return (raw - F.lit(48)).cast("double") / F.lit(48.0)


def lsh_bucket(vec: Column, table: int) -> Column:
    """Sign-bit bucket of `vec` in one hash table (LSH_PLANES bits)."""
    def _proj(t: int, p: int):
        def term(d):
            return F.element_at(vec, d).cast("double") * plane_weight(t, p, d)

        return F.aggregate(
            F.transform(F.sequence(F.lit(1), F.lit(DIM)), term),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket = F.lit(0).cast("long")
    for plane in range(LSH_PLANES):
        bucket = bucket + F.when(_proj(table, plane) > 0, F.lit(1 << plane)).otherwise(
            F.lit(0)
        )
    return bucket


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query (ties broken by neighbor id)."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec")
    )
    v = vectors.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("nvec"))
    scored = (
        q.crossJoin(v)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine(F.col("qvec"), F.col("nvec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: candidates share an LSH bucket in ≥1 table; exact cosine
    rank within candidates. The join shuffles on (table, bucket), never
    materializing the full cross product."""

    def bucketed(df: DataFrame, ident: str) -> DataFrame:
        base = df.select(F.col(id_col).alias(ident), F.col(vec_col).alias(f"{ident}_vec"))
        return base.select(
            ident,
            f"{ident}_vec",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(t).alias("table"),
                            lsh_bucket(F.col(f"{ident}_vec"), t).alias("bucket"),
                        )
                        for t in range(LSH_TABLES)
                    ]
                )
            ).alias("tb"),
        ).select(ident, f"{ident}_vec", "tb.table", "tb.bucket")

    qb = bucketed(queries, "query_id")
    vb = bucketed(vectors, "neighbor_id")
    cand = (
        qb.join(vb, ["table", "bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", "query_id_vec", "neighbor_id_vec")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine(F.col("query_id_vec"), F.col("neighbor_id_vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
    )


def embedding_near_dup_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold (brute force; LSH is the scale
    path — same shape as lsh_topk with a threshold filter)."""
    a = vectors.select(F.col(id_col).alias("vec_a"), F.col(vec_col).alias("va"))
    b = vectors.select(F.col(id_col).alias("vec_b"), F.col(vec_col).alias("vb"))
    return (
        a.crossJoin(b)
        .where(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", cosine(F.col("va"), F.col("vb")).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


# --- SQL mirrors -----------------------------------------------------------

SQL_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, "
    "list_transform(generate_series(1, {dim}), i -> {a}[i]::DOUBLE * {b}[i]::DOUBLE)), "
    "(acc, x) -> acc + x)"
)


def sql_cosine(a: str, b: str, dim: int = DIM) -> str:
    dot = SQL_DOT.format(a=a, b=b, dim=dim)
    na = SQL_DOT.format(a=a, b=a, dim=dim)
    nb = SQL_DOT.format(a=b, b=b, dim=dim)
    return f"({dot}) / (sqrt({na}) * sqrt({nb}))"


def sql_lsh_bucket(vec: str, table: int) -> str:
    parts = []
    for plane in range(LSH_PLANES):
        p = table * LSH_PLANES + plane
        proj = (
            "list_reduce(list_prepend(0.0::DOUBLE, "
            f"list_transform(generate_series(1, {DIM}), "
            f"d -> {vec}[d]::DOUBLE * "
            f"(CAST((({2 * p + 3} * (5 * (d - 1) + 7) + 11) % 97 - 48) AS DOUBLE) / 48.0))), "
            "(acc, x) -> acc + x)"
        )
        parts.append(f"(CASE WHEN ({proj}) > 0 THEN {1 << plane} ELSE 0 END)")
    return "(" + " + ".join(parts) + ")::BIGINT"

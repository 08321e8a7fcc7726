"""DSIR-style importance weighting for training-data selection
(Xie et al. 2023, "Data Selection for Language Models via Importance
Resampling"): score every raw document by how much its hashed n-gram
distribution looks like a TARGET corpus, then keep the top-scoring docs.

Engine-exact adaptation: the paper scores log p_target(w)/p_raw(w) per
hashed feature. log() is NOT bit-stable across engines (Java Math.log
and libm differ in the last ulp), so the weight here is the integer
ratio proxy

    score(doc)  = Σ_tokens (t_cnt[b]+1) · SCALE div (r_cnt[b]+1)
    norm(doc)   = score div n_tokens

with add-one smoothing, all in int64 (Spark `div` == DuckDB `//` on
non-negative operands). Monotone in the same direction as the
likelihood ratio per feature, deterministic everywhere.

Shape at scale (the point of DSIR is that it runs on raw-corpus scale):
- bucket stats: ONE explode → groupBy(bucket) with conditional sums —
  output is B rows (4096), constant-bounded whatever the corpus.
- scoring: the stats table broadcasts (B rows), so the per-occurrence
  join is map-side; the per-doc sum is one shuffle on doc_id.
- the tokenize+hash pass runs twice (stats pass + scoring pass) — two
  linear scans instead of persisting a token-level (i.e. corpus-sized
  × token-count) intermediate, which would dwarf the input at 100 TB.
- top-k selection plans as TakeOrderedAndProject (per-partition heaps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mimic2ts_spark.operators.text import SQL_CODE, SQL_TOKENS, token_code, tokens

DSIR_BUCKETS = 4096      # hashed feature space (the paper uses 10k)
DSIR_SCALE = 1_000_000   # integer ratio scale
DSIR_TOP_K = 50


def _bucket(tok: Column) -> Column:
    return token_code(tok) % DSIR_BUCKETS


def dsir_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = DSIR_TOP_K,
) -> DataFrame:
    """(doc_id, n_tokens, score, norm_score): the top_k docs whose hashed
    unigram distribution best matches the `is_target` subset, by
    normalized integer importance score (ties break on doc_id)."""
    occ = docs.select(
        F.col(id_col).alias("doc_id"),
        is_target.alias("_t"),
        F.explode(tokens(F.col(text_col))).alias("tok"),
    ).select("doc_id", "_t", _bucket(F.col("tok")).alias("b"))
    # NOT persisted (r14 decision, pinned in test_plans): occ is a
    # token-level corpus-sized relation re-derived map-side only —
    # two scans stay cheaper than caching it at 100 TB

    stats = occ.groupBy("b").agg(
        F.sum(F.when(F.col("_t"), 1).otherwise(0)).cast("long").alias("t_cnt"),
        F.count(F.lit(1)).cast("long").alias("r_cnt"),
    )

    scored = (
        occ.join(F.broadcast(stats), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.expr(f"(t_cnt + 1) * {DSIR_SCALE} div (r_cnt + 1)")
            ).cast("long").alias("score"),
        )
        .withColumn("norm_score", F.expr("score div n_tokens"))
    )
    return scored.orderBy(F.desc("norm_score"), "doc_id").limit(top_k)


def sql_dsir_weights(
    target_pred: str,
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = DSIR_TOP_K,
) -> str:
    """DuckDB mirror: same buckets (md5 token codes), same add-one
    integer ratio, same div/limit tie-break."""
    toks = SQL_TOKENS.format(text=text_col)
    code = SQL_CODE.format(tok="tok")
    return f"""
WITH occ AS (
    SELECT {id_col} AS doc_id, ({target_pred}) AS _t,
           {code} % {DSIR_BUCKETS} AS b
    FROM {table}, unnest({toks}) AS u(tok)
),
stats AS (
    SELECT b,
           CAST(sum(CASE WHEN _t THEN 1 ELSE 0 END) AS BIGINT) AS t_cnt,
           CAST(count(*) AS BIGINT) AS r_cnt
    FROM occ GROUP BY b
),
scored AS (
    SELECT o.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum((s.t_cnt + 1) * {DSIR_SCALE} // (s.r_cnt + 1)) AS BIGINT) AS score
    FROM occ o JOIN stats s ON o.b = s.b
    GROUP BY o.doc_id
)
SELECT doc_id, n_tokens, score,
       CAST(score // n_tokens AS BIGINT) AS norm_score
FROM scored
ORDER BY norm_score DESC, doc_id
LIMIT {top_k}
"""

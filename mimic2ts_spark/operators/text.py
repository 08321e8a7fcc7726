"""Text-analysis operators for large-scale training-data pipelines:
tokenization, quality scoring, language-ID heuristic, fingerprinting.

All are native Column expressions (split/filter/aggregate/transform —
JVM-side, codegen'd); nothing here touches Python per row. Every operator
has an exactly-mirrorable ANSI-SQL form (see harness) built on the same
deterministic token hash:

    code(t) = int64(first 15 hex digits of md5(t))

md5 is available and identical in both Spark and DuckDB, making
fingerprints/minhashes cross-engine reproducible — unlike engine-native
`hash()` functions, which differ.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MOD = 1_000_000_007
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization (matches regexp_split_to_array(text,'\\s+'))."""
    return F.split(text, r"\s+")


def token_code(tok: Column) -> Column:
    """Deterministic 60-bit token hash from md5 (cross-engine stable)."""
    return F.conv(F.substring(F.md5(tok), 1, 15), 16, 10).cast("long")


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


# BPE-ish pre-tokenization classes (letters runs / digit runs / single
# punctuation), the usual pre-split a byte-pair tokenizer sees. ASCII
# classes only, so the Java and RE2 regex dialects agree byte-for-byte.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(text: Column) -> Column:
    """Sub-word-ish token count: counts BPE pre-tokenization units rather
    than whitespace words ('don't x2!' → don, ', t, x2... → 6 not 2) —
    the cheap proxy for LLM token budgeting at corpus scale.

    regexp_count counts non-overlapping leftmost matches WITHOUT
    materializing the match array (regexp_extract_all + size cost the
    q_text_stats bench ~40% at sf0.1); identical count by definition."""
    return F.regexp_count(text, F.lit(BPE_ISH_PATTERN)).cast("long")


def stopword_hits(text: Column) -> Column:
    toks = tokens(F.lower(text))
    return F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS))).cast("long")


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are stopwords (single fp division — exact)."""
    return stopword_hits(text).cast("double") / token_count(text).cast("double")


def mean_token_len(text: Column) -> Column:
    """Mean token length via exact integer char sum / single division.

    The char sum of `split(text, '\\s+')` tokens equals the count of
    non-whitespace chars (empty boundary tokens contribute 0), so it is
    computed as length(regexp_replace(text, '\\s', '')) — whole-stage
    codegen, no interpreted HOF lambda (the F.aggregate form cost the
    q_text_stats bench ~25% at sf0.1; outputs verified bit-equal on the
    full sf0.1 corpus)."""
    char_sum = F.length(F.regexp_replace(text, r"\s", "")).cast("long")
    return char_sum.cast("double") / F.size(tokens(text)).cast("double")


def lang_id(text: Column, min_hits: int = 2) -> Column:
    """N-gram/stopword language heuristic: enough English stopword hits →
    'en', else 'und'. (A real model is out of scope; the operator shape —
    cheap per-doc classification — is what matters at 100 TB.)"""
    return F.when(stopword_hits(text) >= min_hits, F.lit("en")).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality: half length saturation, half stopword mass.

    Written as a fixed fp expression tree (same op order as the SQL mirror)
    so results are bit-identical cross-engine.
    """
    length_part = F.least(F.lit(1.0), token_count(text).cast("double") / F.lit(200.0))
    stop_part = F.least(F.lit(1.0), stopword_ratio(text) * F.lit(4.0))
    return length_part * F.lit(0.5) + stop_part * F.lit(0.5)


def fingerprint(text: Column) -> Column:
    """Order-sensitive rolling document fingerprint:
    fold (acc*131 + code(tok) % MOD) % MOD over tokens, acc0 = 0."""
    codes = F.transform(tokens(text), lambda t: token_code(t) % MOD)
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, x: (acc * 131 + x) % MOD
    )


# --- SQL mirrors (DuckDB) --------------------------------------------------

SQL_TOKENS = r"regexp_split_to_array({text}, '\s+')"
SQL_CODE = "CAST(('0x' || substr(md5({tok}), 1, 15)) AS BIGINT)"
SQL_STOP_HITS = (
    "CAST(len(list_filter(" + SQL_TOKENS.format(text="lower({text})") + ", "
    "t -> t IN ('the','a','and','of','to','in','is','it'))) AS BIGINT)"
)
SQL_TOKEN_COUNT = "CAST(len(" + SQL_TOKENS + ") AS BIGINT)"


def sql_char_sum(text: str) -> str:
    toks = SQL_TOKENS.format(text=text)
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({toks}, t -> CAST(length(t) AS BIGINT))), "
        f"(acc, x) -> acc + x)"
    )


def sql_fingerprint(text: str) -> str:
    toks = SQL_TOKENS.format(text=text)
    code = SQL_CODE.format(tok="t")
    return (
        f"list_reduce(list_prepend(0::BIGINT, "
        f"list_transform({toks}, t -> {code} % {MOD})), "
        f"(acc, x) -> (acc * 131 + x) % {MOD})"
    )


# --- chunking (fixed token windows with overlap) ---------------------------

CHUNK_TOKENS = 50
CHUNK_STRIDE = 40  # 10-token overlap between consecutive chunks


def chunk_docs(
    df,
    text_col: str = "text",
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
):
    """Explode each document into overlapping fixed-size token windows —
    the context-window packing primitive of an LLM training pipeline.

    Starts are 1, 1+stride, ... while start <= n_tokens, so the tail
    chunk may be short; chunk_idx = (start-1)/stride is derived from the
    start itself (order-free, safe under the driver's order-insensitive
    compare). Tokens are materialized ONCE as a named column before the
    explode — inlining would let Catalyst re-substitute the split under
    the generator (same trap as dedup.with_shingle_codes).

    Emits (doc_id passthrough cols, chunk_idx, start_tok,
    n_chunk_tokens, chunk_hash); the hash stands in for the chunk text
    to keep the row narrow — downstream consumers re-slice by
    (start_tok, n_chunk_tokens).
    """
    from pyspark.sql import functions as F

    step = df.withColumn("_toks", tokens(F.col(text_col)))
    step = step.withColumn(
        "start_tok",
        F.explode(F.sequence(F.lit(1), F.greatest(F.lit(1), F.size("_toks")), F.lit(stride))),
    )
    chunk = F.slice(F.col("_toks"), F.col("start_tok"), window)
    return (
        step.withColumn("chunk_idx", ((F.col("start_tok") - 1) / stride).cast("long"))
        .withColumn("start_tok", F.col("start_tok").cast("long"))
        .withColumn("n_chunk_tokens", F.size(chunk).cast("long"))
        .withColumn("chunk_hash", F.md5(F.concat_ws(" ", chunk)))
        .drop("_toks", text_col)
    )


def chunk_docs_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = CHUNK_TOKENS,
    stride: int = CHUNK_STRIDE,
) -> str:
    toks = SQL_TOKENS.format(text=text_col)
    return f"""
WITH toked AS (
    SELECT {id_col}, {toks} AS toks FROM {table}
),
starts AS (
    SELECT {id_col}, toks,
           unnest(generate_series(1, greatest(1, len(toks)), {stride})) AS start_tok
    FROM toked
)
SELECT {id_col},
       CAST((start_tok - 1) / {stride} AS BIGINT) AS chunk_idx,
       CAST(start_tok AS BIGINT) AS start_tok,
       CAST(len(list_slice(toks, start_tok, start_tok + {window} - 1)) AS BIGINT)
         AS n_chunk_tokens,
       md5(array_to_string(list_slice(toks, start_tok, start_tok + {window} - 1), ' '))
         AS chunk_hash
FROM starts
"""


def normalize_text(col: Column) -> Column:
    """Standard pre-tokenization cleaning: lowercase, every
    non-[a-z0-9] run → one space, trim. Only literal character classes
    — no \\s, \\w, or unicode classes, whose semantics differ between
    Java regex (Spark) and RE2 (DuckDB); with plain classes the two
    engines agree byte-for-byte on ASCII corpora."""
    cleaned = F.regexp_replace(F.lower(col), "[^a-z0-9]+", " ")
    return F.trim(cleaned)


SQL_NORMALIZE = "trim(regexp_replace(lower({text}), '[^a-z0-9]+', ' ', 'g'))"


# --- hashed doc vectors (feature hashing / the hashing trick) ---------------
#
# Text -> fixed-dim vector WITHOUT a trained model (Weinberger et al.
# 2009): every token lands in bucket md5(token) % HASH_DIM with a
# ±1 sign drawn from the next hash bit (the sign is what makes the
# estimator unbiased — collisions cancel in expectation instead of
# accumulating). The result is a 64-dim signed integer count vector —
# integer-exact cross-engine, and (cast to double, exactly
# representable) a drop-in `embedding` column for the whole vector
# family (brute force / LSH / IVF / kNN graph / k-means) — the bridge
# that lets the similarity operators run on corpora that ship no
# embeddings.

HASH_DIM = 64


def hashed_vector_rows(
    df, dim: int = HASH_DIM, text_col: str = "text", id_col: str = "doc_id"
):
    """Long-form (doc_id, dim, v): one hash-agg pass over the exploded
    tokens; only touched buckets emit rows (v can be 0 when signs
    cancel — both engines emit the group)."""
    from pyspark.sql import functions as F

    code = token_code(F.col("_tok"))
    sign = F.expr(
        f"CASE WHEN ((cast(conv(substring(md5(_tok), 1, 15), 16, 10) "
        f"AS BIGINT) div {dim}) % 2) = 1 THEN 1 ELSE -1 END"
    )
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok"))
        .select(
            id_col,
            F.pmod(code, F.lit(dim)).alias("dim"),
            sign.alias("_s"),
        )
        .groupBy(id_col, "dim")
        .agg(F.sum("_s").cast("long").alias("v"))
    )


def hashed_vectors_dense(rows_df, dim: int = HASH_DIM, id_col: str = "doc_id"):
    """(vec_id, embedding): the long form assembled into a dense
    double array (integer counts are exactly representable). The map
    lookup runs over a MATERIALIZED agg output column — not a
    re-evaluated expression — so the per-element element_at is O(1),
    not the HOF re-evaluation trap."""
    from pyspark.sql import functions as F

    m = F.map_from_entries(F.collect_list(F.struct("dim", "v")))
    return rows_df.groupBy(id_col).agg(m.alias("_m")).select(
        F.col(id_col).alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: F.coalesce(
                F.element_at(F.col("_m"), d), F.lit(0)
            ).cast("double"),
        ).alias("embedding"),
    )


def sql_hashed_vector_rows(
    table: str = "documents",
    dim: int = HASH_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    toks = SQL_TOKENS.format(text=text_col)
    code = SQL_CODE.format(tok="t.tok")
    return f"""
SELECT {id_col}, {code} % {dim} AS dim,
       CAST(sum(CASE WHEN ({code} // {dim}) % 2 = 1 THEN 1 ELSE -1 END)
            AS BIGINT) AS v
FROM {table}, unnest({toks}) AS t(tok)
GROUP BY 1, 2
"""


def sql_hashed_vectors_dense(
    rows_rel: str, dim: int = HASH_DIM, id_col: str = "doc_id"
) -> str:
    """Dense assembly: per-doc map(dim -> v), then a 0..dim-1 fill
    (map_extract returns a list — empty when absent)."""
    return f"""(
    SELECT {id_col} AS vec_id,
           list_transform(generate_series(0, {dim - 1}),
               d -> CAST(coalesce(map_extract(m, d)[1], 0) AS DOUBLE))
               AS embedding
    FROM (
        SELECT {id_col},
               map(list(dim ORDER BY dim), list(v ORDER BY dim)) AS m
        FROM {rows_rel} GROUP BY {id_col}
    )
)"""


# --- JL random projection (X209) --------------------------------------------
#
# Achlioptas/JL dimensionality reduction with a ±1 sign matrix: p_j =
# Σ_d v_d·s(d,j), s md5-derived — for a random ±1 matrix E||p||² =
# out_dim·||v||², so pairwise squared distances are preserved up to the
# out_dim factor in expectation (Johnson–Lindenstrauss / Achlioptas
# 2003, database-friendly projections). Run over the INTEGER hashed
# vectors (X187 bridge): integer addition is associative (r04), so no
# left-to-right float discipline is needed anywhere and the oracle is
# exact by construction. The sign matrix is a GLOBAL (dim × out_dim)
# table — 1024 scalars at 64→16 — derived once from the distinct dims
# and joined on (AQE broadcasts the tiny side); the md5 sign expr runs
# once per matrix ENTRY, never per occurrence.

JL_DIM = 16


def jl_project_rows(rows_df, out_dim: int = JL_DIM, id_col: str = "doc_id"):
    """(doc_id, j, p): the projected out_dim-vector in long form.
    rows_df is the X187 long form (doc_id, dim, v)."""
    from pyspark.sql import functions as F

    signs = (
        rows_df.select("dim")
        .distinct()
        .select(
            "dim",
            F.explode(F.expr(f"sequence(0L, {out_dim - 1}L)")).alias("j"),
        )
        .withColumn(
            "s",
            F.when(
                F.pmod(
                    token_code(
                        F.concat_ws(":", F.lit("jl"), F.col("dim"), F.col("j"))
                    ),
                    F.lit(2),
                )
                == 1,
                F.lit(1),
            ).otherwise(F.lit(-1)),
        )
    )
    return (
        rows_df.join(signs, "dim")
        .groupBy(id_col, "j")
        .agg(F.sum(F.col("v") * F.col("s")).cast("long").alias("p"))
    )


def sql_jl_project_rows(
    rows_rel: str, out_dim: int = JL_DIM, id_col: str = "doc_id"
) -> str:
    code = SQL_CODE.format(tok="'jl:' || CAST(r.dim AS VARCHAR) || ':' || CAST(g.j AS VARCHAR)")
    return f"""(
    SELECT {id_col}, j,
           CAST(sum(v * s) AS BIGINT) AS p
    FROM (
        SELECT r.{id_col}, r.dim, r.v, g.j,
               CASE WHEN {code} % 2 = 1 THEN 1 ELSE -1 END AS s
        FROM {rows_rel} r, generate_series(0, {out_dim - 1}) AS g(j)
    )
    GROUP BY 1, 2
)"""


# --- hashed linear quality classifier (X208) --------------------------------
#
# The model-APPLY stage of a fasttext-style quality filter (Joulin et al.
# 2017 / the CCNet+fasttext pipeline every released corpus runs): score =
# Σ_tokens w[h(token) mod D], keep iff score ≥ 0. The hashing trick means
# the model is ONE dense weight array of D scalars — colliding tokens
# share a weight — so applying it at corpus scale is an explode + a
# vocabulary-sized weight join + a per-doc sum: no model object ever
# ships to executors. The WEIGHTS here are a deterministic md5-derived
# stand-in (w(b) = code('w:'||b) % 201 − 100 ∈ [−100, 100]) — the real
# pipeline loads trained scalars, and the plumbing (bucketing, shared
# collision weights, margin, gate) is identical and is what this
# operator tests; swapping in trained weights is a one-column change.

CLS_DIM = 4096


def classifier_weight(bucket):
    """The deterministic md5-derived stand-in weight for one bucket —
    shared by the apply path and the `maintain classifier-weights`
    artifact builder so the two can never drift."""
    from pyspark.sql import functions as F

    return (
        F.pmod(
            token_code(F.concat(F.lit("w:"), bucket.cast("string"))),
            F.lit(201),
        )
        - F.lit(100)
    ).cast("long")


def build_classifier_weights(spark, out_dir: str, dim: int = CLS_DIM) -> int:
    """Persist the DENSE (bucket, w) model table — every bucket gets a
    row (an absent bucket would silently drop its tokens from every
    score through the apply join). Shared by `maintain
    classifier-weights` and the streaming gate's memoized build."""
    from pyspark.sql import functions as F

    (
        spark.range(dim)
        .select(
            F.col("id").alias("bucket"),
            classifier_weight(F.col("id")).alias("w"),
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(out_dir)
    )
    return dim


def classifier_scores(
    df,
    dim: int = CLS_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
    weights=None,
):
    """(doc_id, n_tokens, score, label): hashed-linear score and the
    keep/drop gate. One token pass; weights derive from the DISTINCT
    bucket set (vocabulary-sized, AQE decides the join — unbounded
    vocab at 100 TB, never force-broadcast) and join back onto the
    per-(doc, bucket) tf aggregate, so the weight expression is
    evaluated once per distinct bucket, not once per occurrence.
    `weights` (bucket, w) swaps in a persisted/TRAINED model table
    (`maintain classifier-weights` writes the stand-in as an
    artifact); the join shape is identical."""
    from pyspark.sql import functions as F

    tf = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok"))
        .select(id_col, F.pmod(token_code(F.col("_tok")), F.lit(dim)).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )
    if weights is None:
        # persisted: consumed twice (the distinct-bucket weight
        # derivation and the scoring join) — unpersisted the tokenize
        # + md5 bucket pass ran per consumer (r14 §5; with a supplied
        # weights table tf is single-consumer, no persist)
        tf = tf.persist()
    w = (
        weights
        if weights is not None
        else tf.select("bucket").distinct().withColumn(
            "w", classifier_weight(F.col("bucket"))
        )
    )
    return (
        tf.join(w, "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("tf").cast("long").alias("n_tokens"),
            F.sum(F.col("tf") * F.col("w")).cast("long").alias("score"),
        )
        .select(
            id_col,
            "n_tokens",
            "score",
            F.when(F.col("score") >= 0, F.lit("keep"))
            .otherwise(F.lit("drop"))
            .alias("label"),
        )
    )


def sql_classifier_scores(
    table: str = "documents",
    dim: int = CLS_DIM,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror — token_code is a positive 60-bit int, so plain %
    equals Spark's pmod; all arithmetic is exact int64."""
    toks = SQL_TOKENS.format(text=text_col)
    code = SQL_CODE.format(tok="t.tok")
    wcode = SQL_CODE.format(tok="'w:' || CAST(bucket AS VARCHAR)")
    return f"""
WITH tf AS (
    SELECT {id_col}, {code} % {dim} AS bucket, CAST(count(*) AS BIGINT) AS tf
    FROM {table}, unnest({toks}) AS t(tok)
    GROUP BY 1, 2
),
w AS (
    SELECT bucket, {wcode} % 201 - 100 AS w
    FROM (SELECT DISTINCT bucket FROM tf)
),
scored AS (
    SELECT tf.{id_col},
           CAST(sum(tf.tf) AS BIGINT) AS n_tokens,
           CAST(sum(tf.tf * w.w) AS BIGINT) AS score
    FROM tf JOIN w USING (bucket)
    GROUP BY 1
)
SELECT {id_col}, n_tokens, score,
       CASE WHEN score >= 0 THEN 'keep' ELSE 'drop' END AS label
FROM scored
"""

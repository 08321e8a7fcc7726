"""Deterministic dataset splitting (train/val/test) by content hash.

The split must be a pure function of a stable row identity — never
rand() (CLAUDE.md determinism rule; also the only way a 100 TB split is
reproducible across retries, backfills, and engines). Bucket = 60-bit
md5 code of the id modulo 100; fractions are then exact percentages of
hash space, stable under appends and re-partitioning. Pure Column
expressions: fully codegen'd, no shuffle added to the scan it
decorates.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mimic2ts_spark.operators.sketch import kmv_code
from mimic2ts_spark.operators.text import SQL_CODE

DEFAULT_CUTS = (("train", 80), ("val", 90), ("test", 100))


def split_bucket(id_col: Column) -> Column:
    """Stable bucket in [0, 100) from the md5 code of the id."""
    return kmv_code(id_col) % 100


def with_split(
    df: DataFrame,
    id_col: str,
    cuts: Sequence[tuple[str, int]] = DEFAULT_CUTS,
    out: str = "split",
) -> DataFrame:
    """Assign each row a split label by hash bucket: label_i for
    bucket < cut_i (cuts ascending, last cut = 100)."""
    b = split_bucket(F.col(id_col))
    expr = None
    for label, cut in cuts:
        cond = b < cut
        expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
    return df.withColumn(out, expr)


def split_bucket_sql(id_expr: str) -> str:
    code = SQL_CODE.format(tok=f"CAST({id_expr} AS VARCHAR)")
    return f"({code} % 100)"


def split_case_sql(id_expr: str, cuts: Sequence[tuple[str, int]] = DEFAULT_CUTS) -> str:
    b = split_bucket_sql(id_expr)
    whens = " ".join(f"WHEN {b} < {cut} THEN '{label}'" for label, cut in cuts)
    return f"CASE {whens} END"


EPOCH_SHARDS = 16


def epoch_shuffle(
    df: DataFrame, id_col: str, epoch: int, n_shards: int = EPOCH_SHARDS
) -> DataFrame:
    """Deterministic per-epoch training-order shuffle WITHOUT a global
    sort (X136): order code = md5("{epoch}:{id}") — a fresh
    pseudorandom permutation per epoch, reproducible across retries and
    engines (no rand()) — sharded by code % n_shards, position =
    row_number within the shard ordered by (code, id).

    Scale shape: ONE shuffle on the shard key plus a per-shard local
    sort; the global training order is defined as shard-major
    (shard 0's positions, then shard 1's …), which is exactly how an
    epoch loader consumes data — shard per worker — so a 100 TB corpus
    never pays a global sort. n_shards is the loader-parallelism dial."""
    code = kmv_code(
        F.concat(F.lit(f"{epoch}:"), F.col(id_col).cast("string"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("code", id_col)
    return (
        df.withColumn("code", code)
        .withColumn("shard", (F.col("code") % n_shards).cast("long"))
        .withColumn("position", F.row_number().over(w).cast("long"))
        .drop("code")
    )


def epoch_shuffle_sql(
    table: str, id_expr: str, epoch: int, n_shards: int = EPOCH_SHARDS,
    cols: str = "doc_id",
) -> str:
    code = SQL_CODE.format(tok=f"'{epoch}:' || CAST({id_expr} AS VARCHAR)")
    return f"""
SELECT {cols},
       CAST(code % {n_shards} AS BIGINT) AS shard,
       CAST(row_number() OVER (
           PARTITION BY code % {n_shards} ORDER BY code, {id_expr}
       ) AS BIGINT) AS position
FROM (SELECT {cols}, {code} AS code FROM {table})
"""


def distributed_rank(
    df: DataFrame, weight_col: str = "w", id_col: str = "doc_id"
) -> DataFrame:
    """Global (weight DESC, id ASC) rank WITHOUT a single-partition
    window — the scale-safe form of row_number() OVER (ORDER BY ...):
    (1) per-weight-group counts aggregate to a TINY table (one row per
    distinct weight — bounded: token counts, byte sizes), where an
    empty-partition cumulative window is harmless; (2) the exclusive
    cumulative offset broadcasts back; (3) row_number PARTITIONED BY
    the weight value ranks within each group by id. rank = offset +
    within-group row_number. Every wide operation on the big side keys
    on the weight value, so no task materializes the whole corpus —
    the naive global window would (its single partition is the oracle
    form, which must return identical ranks; pytest-pinned)."""
    from pyspark.sql import Window

    counts = df.groupBy(weight_col).agg(F.count(F.lit(1)).alias("_n"))
    wcum = Window.orderBy(F.desc(weight_col)).rowsBetween(
        Window.unboundedPreceding, 0
    )
    offs = (
        counts.withColumn("_off", F.sum("_n").over(wcum) - F.col("_n"))
        .select(weight_col, "_off")
    )
    win = Window.partitionBy(weight_col).orderBy(id_col)
    return (
        df.join(F.broadcast(offs), weight_col)
        .withColumn(
            "rank", (F.col("_off") + F.row_number().over(win)).cast("long")
        )
        .drop("_off")
    )


def snake_shard(rank: Column, n_shards: int) -> Column:
    """Boustrophedon (snake) assignment of a 1-based size-descending
    rank to n shards: window w = (rank-1) % 2n maps w -> w for w < n,
    else -> 2n-1-w. Plain modulo would hand shard 0 every window's
    LARGEST doc (systematic bias); the snake alternates direction so
    consecutive windows cancel — the distributed form of greedy
    longest-first (LPT) bin packing."""
    w = (rank - F.lit(1)) % F.lit(2 * n_shards)
    return F.when(w < n_shards, w).otherwise(F.lit(2 * n_shards - 1) - w).cast("long")

"""Data-layout optimization: Z-order (Morton) clustering keys.

Multi-dimensional data skipping at 100 TB: sorting/partitioning facts by
an interleaved-bit key co-locates rows that are close in EVERY dimension,
so per-file min/max statistics prune scans for predicates on any of the
interleaved columns (the technique behind Delta/Iceberg `OPTIMIZE
ZORDER BY`). As real implementations do, each dimension is first
RANGE-NORMALIZED to a fixed bit width (otherwise a column that occupies
only the low bits of its type contributes nothing to the high key bits
and every row lands in one bucket). The per-column (min, max) is a
1-row scalar broadcast; the key itself is pure per-row bit math — no
shuffle; the payoff is measured by how tight each Z-bucket's per-column
ranges are, which `zorder_bucket_stats` reports.

Determinism: normalization is integer floor arithmetic
(((x − min) · (2^bits − 1)) div (max − min)) and the interleave is plain
shifts/masks on non-negative int64 — identical in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZBITS = 16  # normalized bits per dimension


def _norm_expr(x: str, lo: str, hi: str, bits: int = ZBITS) -> str:
    top = (1 << bits) - 1
    return f"CASE WHEN {hi} > {lo} THEN (({x} - {lo}) * {top}) div ({hi} - {lo}) ELSE 0 END"


def _interleave_expr(a: str, b: str, bits: int = ZBITS) -> str:
    """a's bit i -> position 2i, b's bit i -> position 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"(((({a}) >> {i}) & 1) << {2 * i})")
        terms.append(f"(((({b}) >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


def zorder_bucket_stats(
    df: DataFrame, a: str, b: str, bucket_bits: int, bits: int = ZBITS
) -> DataFrame:
    """Per-Z-bucket (n, a_min, a_max, b_min, b_max): the data-skipping
    effectiveness report. Bucket = the TOP bucket_bits bits of the
    range-normalized Morton key — contiguous Z-ranges, i.e. the rows one
    optimized file would hold. Tight per-bucket ranges on BOTH columns =
    pruning works for either predicate."""
    ranges = df.agg(
        F.min(a).cast("long").alias("_alo"),
        F.max(a).cast("long").alias("_ahi"),
        F.min(b).cast("long").alias("_blo"),
        F.max(b).cast("long").alias("_bhi"),
    )
    na = _norm_expr(a, "_alo", "_ahi", bits)
    nb = _norm_expr(b, "_blo", "_bhi", bits)
    zk = _interleave_expr(f"({na})", f"({nb})", bits)
    bucket = F.expr(f"({zk}) >> {2 * bits - bucket_bits}").cast("long")
    return (
        df.crossJoin(F.broadcast(ranges))
        .select(F.col(a).alias("a"), F.col(b).alias("b"), bucket.alias("zbucket"))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.min("a").alias("a_min"),
            F.max("a").alias("a_max"),
            F.min("b").alias("b_min"),
            F.max("b").alias("b_max"),
        )
    )


def sql_zorder_bucket_stats(
    table: str, a: str, b: str, bucket_bits: int, bits: int = ZBITS
) -> str:
    na = _norm_expr(a, "_alo", "_ahi", bits).replace(" div ", " // ")
    nb = _norm_expr(b, "_blo", "_bhi", bits).replace(" div ", " // ")
    z = _interleave_expr(f"({na})", f"({nb})", bits)
    shift = 2 * bits - bucket_bits
    return f"""
WITH r AS (
    SELECT CAST(min({a}) AS BIGINT) AS _alo, CAST(max({a}) AS BIGINT) AS _ahi,
           CAST(min({b}) AS BIGINT) AS _blo, CAST(max({b}) AS BIGINT) AS _bhi
    FROM {table}
)
SELECT CAST(({z}) >> {shift} AS BIGINT) AS zbucket,
       CAST(count(*) AS BIGINT) AS n,
       min({a}) AS a_min, max({a}) AS a_max,
       min({b}) AS b_min, max({b}) AS b_max
FROM {table}, r
GROUP BY 1
"""

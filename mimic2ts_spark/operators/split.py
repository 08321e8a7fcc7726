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

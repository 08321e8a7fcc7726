"""Record linkage / entity resolution: fuzzy-match dirty records to a
clean reference table under a bounded edit distance.

The record-level complement of the document-level dedup family
(operators/dedup.py): instead of near-duplicate TEXTS, the unit is a
short KEY string (a name, an id rendered with typos) and the question
is "which reference row does this dirty row denote?".

Scale design — the SymSpell / deletion-neighborhood scheme:
- materialize every string reachable by <= depth deletions of the match
  key on BOTH sides (n*(L+1) rows for depth 1 — LINEAR in data size,
  independent of the reference's row count),
- equality-join on the variant (an ordinary co-partitioned hash shuffle
  on short strings; never a cross join),
- dedup the candidate pairs, then verify with the exact levenshtein
  distance and the caller's threshold.

Completeness theorem (property-tested in tests/test_linkage.py): if
lev(a, b) <= 1 then a and b share a depth-1 deletion variant — a
substitution deletes the substituted position on both sides, an
insertion/deletion deletes the inserted character on the longer side
only (the shorter side contributes its ORIGINAL, which is why the
original string is always part of its own neighborhood). So the
blocking cannot lose a true pair at max_dist=1. Depth-k neighborhoods
extend the theorem to distance k; depth 1 is what this module ships
(the k=1 expression stays a pure codegen'd Column — no UDF, no
explode-of-explode).

levenshtein() is integer-exact and identically defined in Spark and
DuckDB, so the gate oracle deliberately stays the NAIVE all-pairs form:
it shares no pruning theorem with the Spark side, so a hole in the
blocking cannot hide behind a matching hash (CLAUDE.md round-3 rule).

Duplicate-heavy references: a reference with many copies of one name
turns that name's variants into hot join keys (copies x dirty fan-out).
The exact-first doctrine applies unchanged — link DISTINCT keys
(``dropDuplicates`` on the match column, e.g. via dedup.canonical_docs
for full rows), then rejoin matches to the copies; same remedy as
q_dedup_pipeline (X65).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def deletion_variants(name: str) -> Column:
    """Array of the column's depth-1 deletion neighborhood INCLUDING the
    original string, deduplicated. Pure Column expression (codegen'd);
    `name` is the column name. Empty strings map to [''] (guarded:
    Spark's sequence(1, 0) would yield a DESCENDING [1, 0], not [])."""
    return F.expr(
        f"CASE WHEN length({name}) = 0 THEN array({name}) ELSE "
        f"array_union(array({name}), transform(sequence(1, length({name})), "
        f"i -> concat(substr({name}, 1, i-1), substr({name}, i+1)))) END"
    )


def fuzzy_link(
    dirty: DataFrame,
    clean: DataFrame,
    dirty_key: str,
    clean_key: str,
    dirty_col: str,
    clean_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """All (dirty_key, clean_key, dist) pairs with
    lev(dirty_col, clean_col) <= max_dist (max_dist <= 1 for the
    depth-1 blocking to be complete). Output is distinct pairs; rank or
    aggregate downstream for a best-match report."""
    if max_dist > 1:
        raise ValueError("depth-1 deletion blocking is complete only for max_dist <= 1")
    d = dirty.select(
        F.col(dirty_key).alias("dirty_key"),
        F.col(dirty_col).alias("_dname"),
        F.explode(deletion_variants(dirty_col)).alias("_variant"),
    )
    c = clean.select(
        F.col(clean_key).alias("clean_key"),
        F.col(clean_col).alias("_cname"),
        F.explode(deletion_variants(clean_col)).alias("_variant"),
    )
    return (
        d.join(c, "_variant")
        .select("dirty_key", "clean_key", "_dname", "_cname")
        .dropDuplicates(["dirty_key", "clean_key"])
        .select(
            "dirty_key",
            "clean_key",
            F.levenshtein("_dname", "_cname").cast("long").alias("dist"),
        )
        .where(F.col("dist") <= max_dist)
    )


def best_match_report(pairs: DataFrame) -> DataFrame:
    """One row per dirty record: its best candidate (min distance, ties
    to the smallest clean key — deterministic) plus the ambiguity count.
    A single hash aggregation (min-struct + count), no window sort."""
    best = F.min(F.struct("dist", "clean_key")).alias("_best")
    return (
        pairs.groupBy("dirty_key")
        .agg(best, F.count(F.lit(1)).cast("long").alias("n_cand"))
        .select(
            "dirty_key",
            F.col("_best.clean_key").alias("best_clean_key"),
            F.col("_best.dist").alias("best_dist"),
            "n_cand",
        )
    )

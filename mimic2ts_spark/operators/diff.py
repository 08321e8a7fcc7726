"""Corpus snapshot diff — the data-versioning primitive for training-data
pipelines: classify every key across two corpus snapshots as
added / removed / changed / unchanged.

Not in the reference (its pipeline is single-snapshot batch ETL); this is
the incremental-ingest companion to operators/dedup.py's
incremental_ngram_pairs — run the diff first, feed only `added`+`changed`
docs into the (much more expensive) dedup/quality passes.

Shape at scale: each side is reduced to (key, md5(payload)) AT THE SCAN
(payload bytes never cross the wire), then ONE full-outer shuffle join on
the key. No skew risk: keys are unique per side by contract, so every
join group is ≤ 1×1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key: str = "doc_id",
    payload: str = "text",
) -> DataFrame:
    """(key, old_md5, new_md5, status) for every key in either snapshot.

    `status`: 'added' (new only), 'removed' (old only), 'changed'
    (both, payload md5 differs), 'unchanged'. md5 comparison makes the
    payload equality check O(1) per row and engine-portable."""
    o = old.select(F.col(key), F.md5(F.col(payload)).alias("old_md5"))
    n = new.select(F.col(key), F.md5(F.col(payload)).alias("new_md5"))
    j = o.join(n, key, "full_outer")
    status = (
        F.when(F.col("old_md5").isNull(), F.lit("added"))
        .when(F.col("new_md5").isNull(), F.lit("removed"))
        .when(F.col("old_md5") != F.col("new_md5"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(key, "old_md5", "new_md5", status.alias("status"))


def sql_snapshot_diff(
    old_rel: str,
    new_rel: str,
    key: str = "doc_id",
    payload: str = "text",
) -> str:
    return f"""
WITH o AS (SELECT {key}, md5({payload}) AS old_md5 FROM {old_rel}),
n AS (SELECT {key}, md5({payload}) AS new_md5 FROM {new_rel})
SELECT coalesce(o.{key}, n.{key}) AS {key}, o.old_md5, n.new_md5,
       CASE WHEN o.old_md5 IS NULL THEN 'added'
            WHEN n.new_md5 IS NULL THEN 'removed'
            WHEN o.old_md5 <> n.new_md5 THEN 'changed'
            ELSE 'unchanged' END AS status
FROM o FULL OUTER JOIN n ON o.{key} = n.{key}
"""

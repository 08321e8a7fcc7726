"""MERGE/upsert partition-pruned rewrite (operators/merge.py): the
copy-on-write contract — an update batch must only READ and only
REWRITE the bucket partitions its keys hash into."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mimic2ts_spark.operators.merge import (
    key_bucket,
    merge_upsert,
    write_base,
)

SF = "/root/testdata/sf0.001"


def _partition_state(path: str) -> dict[int, set[tuple[str, float]]]:
    out: dict[int, set[tuple[str, float]]] = {}
    for d in os.listdir(path):
        if not d.startswith("bucket="):
            continue
        b = int(d.split("=")[1])
        full = os.path.join(path, d)
        out[b] = {
            (f, os.path.getmtime(os.path.join(full, f)))
            for f in os.listdir(full)
            if f.endswith(".parquet")
        }
    return out


def test_merge_rewrites_only_affected_buckets(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "base")
    write_base(docs, path, "doc_id", n_buckets=8)
    before = _partition_state(path)
    assert len(before) == 8  # 500 keys cover all 8 buckets

    # a 3-key update batch: touches at most 3 buckets
    updates = docs.where(F.col("doc_id").isin([1, 2, 3])).withColumn(
        "text", F.lit("updated")
    )
    audit = merge_upsert(spark, path, updates, "doc_id", n_buckets=8)
    assert audit["n_updates"] == 3
    assert 1 <= len(audit["affected_buckets"]) <= 3

    after = _partition_state(path)
    for b in before:
        if b in audit["affected_buckets"]:
            assert after[b] != before[b], f"affected bucket {b} not rewritten"
        else:
            assert after[b] == before[b], f"untouched bucket {b} was rewritten"

    # merge semantics: updated rows replaced, inserts appended, row count
    # = base + brand-new keys (none here: 1,2,3 exist in the base)
    final = spark.read.parquet(path)
    assert final.count() == docs.count()
    got = {
        r["doc_id"]: r["text"]
        for r in final.where(F.col("doc_id").isin([1, 2, 3])).collect()
    }
    assert got == {1: "updated", 2: "updated", 3: "updated"}

    # a genuinely NEW key inserts into its bucket
    new = spark.createDataFrame(
        [(10**9, "brand new", "en", "src", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    merge_upsert(spark, path, new, "doc_id", n_buckets=8)
    assert spark.read.parquet(path).count() == docs.count() + 1


def test_merge_duplicate_update_keys_raise(spark, tmp_path):
    """Duplicate keys in the update batch fan out the full-outer join
    (one merged row per duplicate) — which duplicate wins is undefined,
    so merge_upsert must fail loudly instead of silently multiplying
    rows in the rewritten partitions."""
    import pytest

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "base")
    write_base(docs, path, "doc_id", n_buckets=4)
    dup = spark.createDataFrame(
        [(1, "a", "en", "s", 1), (1, "b", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    before = sorted(r["text"] for r in spark.read.parquet(path)
                    .where(F.col("doc_id") == 1).collect())
    with pytest.raises(ValueError, match="duplicate key"):
        merge_upsert(spark, path, dup, "doc_id")
    after = sorted(r["text"] for r in spark.read.parquet(path)
                   .where(F.col("doc_id") == 1).collect())
    assert after == before  # guard fired BEFORE any write


def test_merge_null_update_overwrites(spark, tmp_path):
    """Row-replacement semantics (MERGE UPDATE SET *): a NULL column in
    a matched update row lands as NULL — the base value must NOT
    survive (column-patch coalesce semantics would keep it)."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "base")
    write_base(docs, path, "doc_id", n_buckets=4)
    upd = spark.createDataFrame(
        [(1, None, "xx", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    merge_upsert(spark, path, upd, "doc_id")
    row = spark.read.parquet(path).where(F.col("doc_id") == 1).collect()[0]
    assert row["text"] is None and row["lang"] == "xx"


def test_merge_bucket_count_is_table_state(spark, tmp_path):
    """The bucket count persists in _merge_meta.json at init; a merge
    that omits it resolves the manifest value, and an explicit value
    contradicting the layout raises (wrong modulus = wrong pruning =
    silent stale-duplicate corruption)."""
    import pytest

    from mimic2ts_spark.operators.merge import read_meta

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "base")
    write_base(docs, path, "doc_id", n_buckets=8)
    assert read_meta(path) == {"key": "doc_id", "n_buckets": 8}

    upd = docs.where(F.col("doc_id") == 1).withColumn("text", F.lit("u"))
    with pytest.raises(ValueError, match="contradicts"):
        merge_upsert(spark, path, upd, "doc_id", n_buckets=32)

    # no n_buckets passed → manifest's 8 is used and the merge lands
    audit = merge_upsert(spark, path, upd, "doc_id")
    assert audit["n_updates"] == 1
    got = spark.read.parquet(path).where(F.col("doc_id") == 1).collect()[0]
    assert got["text"] == "u"


def test_merge_changelog_classifies_and_prunes(spark, tmp_path):
    """CDF contract: inserts are keys absent from the base (NULL
    pre-image), updates carry old/new values; classification is pure
    read-side (base unchanged) and the base scan is partition-pruned
    to the batch's buckets."""
    from mimic2ts_spark.operators.merge import merge_changelog

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "base")
    write_base(docs.where(F.col("doc_id") != 1), path, "doc_id", n_buckets=8)
    before = _partition_state(path)

    upd = docs.where(F.col("doc_id").isin([1, 2])).withColumn(
        "n_chars", F.col("n_chars") + 5
    )
    cdf = merge_changelog(spark, path, upd, "doc_id", carry_cols=("n_chars",))
    plan = cdf._sc._jvm.PythonSQLUtils.explainString(
        cdf._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "bucket" in plan

    got = {r["doc_id"]: r for r in cdf.collect()}
    n1 = docs.where(F.col("doc_id") == 1).collect()[0]["n_chars"]
    n2 = docs.where(F.col("doc_id") == 2).collect()[0]["n_chars"]
    assert got[1]["op"] == "insert" and got[1]["old_n_chars"] is None
    assert got[1]["new_n_chars"] == n1 + 5
    assert got[2]["op"] == "update" and got[2]["old_n_chars"] == n2
    assert got[2]["new_n_chars"] == n2 + 5
    assert _partition_state(path) == before  # read-side only


def test_compaction_reduces_files_preserves_content(spark, tmp_path):
    """compact_buckets: one file per bucket afterwards, contents
    byte-identical (sorted rows compare equal)."""
    from pyspark.sql import functions as F

    from mimic2ts_spark.operators.merge import (
        bucket_file_counts,
        compact_buckets,
        merge_upsert,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "base")
    write_base(docs.repartition(4), path, "doc_id", n_buckets=4)
    # several merges fragment the buckets
    for k in (1, 2, 3):
        upd = docs.where(F.col("doc_id") == k).withColumn("text", F.lit(f"u{k}"))
        merge_upsert(spark, path, upd, "doc_id", n_buckets=4)
    assert sum(bucket_file_counts(path).values()) > 4

    before_rows = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(path).collect()
    )
    audit = compact_buckets(spark, path)
    assert audit["files_after"] == 4 < audit["files_before"]
    after_rows = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(path).collect()
    )
    assert after_rows == before_rows

    # scale form: maxRecordsPerFile splits each bucket deterministically
    # (500 docs / 4 buckets ≈ 125 per bucket → ≥3 files per bucket at 50)
    audit2 = compact_buckets(spark, path, max_records_per_file=50)
    assert audit2["files_after"] >= 12
    rows3 = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(path).collect()
    )
    assert rows3 == before_rows


def test_merge_base_scan_prunes_partitions(spark, tmp_path):
    """The affected-bucket read must reach the scan as PartitionFilters
    (partition pruning), not a post-scan filter."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "base")
    write_base(docs, path, "doc_id", n_buckets=8)

    pruned = spark.read.parquet(path).where(F.col("bucket").isin([0, 1]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    # the deterministic bucket function agrees with what's on disk
    b = docs.select(key_bucket(F.col("doc_id"), 8).alias("bucket")).distinct()
    assert {r["bucket"] for r in b.collect()} <= set(range(8))

"""Versioned merge table (operators/versioned.py): atomic manifest
commits, time travel, manifest-driven file pruning."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mimic2ts_spark.operators.versioned import (
    init_table,
    latest_version,
    merge_versioned,
    read_manifest,
    read_table,
)

SF = "/root/testdata/sf0.001"


def _file_state(path: str, ver_dir: str) -> dict:
    out = {}
    root = os.path.join(path, ver_dir)
    for d in os.listdir(root):
        if d.startswith("pb="):
            full = os.path.join(root, d)
            out[d] = {
                (f, os.path.getmtime(os.path.join(full, f)))
                for f in os.listdir(full)
                if f.endswith(".parquet")
            }
    return out


def test_versioned_merge_and_time_travel(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "t")
    m0 = init_table(docs, path, "doc_id", n_buckets=8)
    assert m0["version"] == 0 and latest_version(path) == 0
    v0_files = _file_state(path, "v0")

    upd = docs.where(F.col("doc_id").isin([1, 2, 3])).withColumn(
        "text", F.lit("updated")
    )
    m1 = merge_versioned(spark, path, upd, "doc_id")
    assert m1["version"] == 1 and latest_version(path) == 1
    assert 1 <= len(m1["affected_buckets"]) <= 3

    # untouched buckets are REFERENCED, not rewritten: v0 files untouched
    assert _file_state(path, "v0") == v0_files
    for b, ver in m1["buckets"].items():
        want = "v1" if int(b) in m1["affected_buckets"] else "v0"
        assert ver == want, (b, ver)

    # latest state = dict upsert
    got = {r["doc_id"]: r["text"] for r in read_table(spark, path).collect()}
    want = {r["doc_id"]: r["text"] for r in docs.collect()}
    want.update({1: "updated", 2: "updated", 3: "updated"})
    assert got == want

    # time travel: version 0 is the pristine base
    v0 = {r["doc_id"]: r["text"] for r in read_table(spark, path, version=0).collect()}
    assert v0 == {r["doc_id"]: r["text"] for r in docs.collect()}


def test_versioned_uncommitted_version_is_invisible(spark, tmp_path):
    """The pointer flip IS the commit: data + manifest for a new version
    without the pointer update must leave readers on the previous
    consistent state — the crash-window the in-place overwrite has and
    this layout doesn't."""
    from mimic2ts_spark.operators import versioned as V

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "t")
    init_table(docs, path, "doc_id", n_buckets=4)

    # simulate a crash mid-merge: v1 data + manifest exist, pointer not flipped
    upd = docs.where(F.col("doc_id") == 1).withColumn("text", F.lit("PHANTOM"))
    data = upd.withColumn(
        "bucket", __import__("mimic2ts_spark.operators.merge", fromlist=["key_bucket"])
        .key_bucket(F.col("doc_id"), 4)
    )
    V._write_version_dirs(data, path, "v1")
    m = read_manifest(path, 0)
    m.update({"version": 1, "parent": 0, "op": "merge"})
    V._write_manifest(path, m)
    # no V._commit(path, 1)

    assert latest_version(path) == 0
    got = read_table(spark, path).where(F.col("doc_id") == 1).collect()[0]["text"]
    assert got != "PHANTOM"

    # a real merge afterwards RECLAIMS the orphan version number (its
    # data dir + manifest are overwritten — crash leftovers are garbage)
    merge_versioned(spark, path, upd, "doc_id")
    assert latest_version(path) == 1
    got = read_table(spark, path).where(F.col("doc_id") == 1).collect()[0]["text"]
    assert got == "PHANTOM"


def test_versioned_pruned_read_touches_selected_dirs_only(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "t")
    init_table(docs, path, "doc_id", n_buckets=8)
    sub = read_table(spark, path, buckets=[0, 3])
    assert set(r["bucket"] for r in sub.select("bucket").distinct().collect()) == {0, 3}
    # the plan reads exactly the two manifest-selected dirs
    files = sub.inputFiles()
    assert files and all("/pb=0/" in f or "/pb=3/" in f for f in files)


def test_versioned_key_lookup_prunes_and_matches(spark, tmp_path):
    """keys= pruning: the driver-side md5 bucket of each key equals the
    writer's bucket (same function), so the read touches ONLY those
    dirs and still contains every requested key's row."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "t")
    init_table(docs, path, "doc_id", n_buckets=8)

    want_keys = [5, 17, 123]
    sub = read_table(spark, path, keys=want_keys)
    touched = {f.split("/pb=")[1].split("/")[0] for f in sub.inputFiles()}
    assert 1 <= len(touched) <= 3
    got = {
        r["doc_id"]: r["text"]
        for r in sub.where(F.col("doc_id").isin(want_keys)).collect()
    }
    want = {
        r["doc_id"]: r["text"]
        for r in docs.where(F.col("doc_id").isin(want_keys)).collect()
    }
    assert got == want and len(got) == 3


def test_versioned_compact_is_a_commit(spark, tmp_path):
    """OPTIMIZE as a commit: one file per bucket afterwards, rows
    identical, and the PRE-compaction version remains time-travelable
    (readers on it are undisturbed until VACUUM)."""
    import os as _os

    from mimic2ts_spark.operators.versioned import compact_versioned

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "t")
    init_table(docs.repartition(4), path, "doc_id", n_buckets=4)
    for k in (1, 2):
        upd = docs.where(F.col("doc_id") == k).withColumn("text", F.lit(f"u{k}"))
        merge_versioned(spark, path, upd, "doc_id")
    before = sorted(
        (r["doc_id"], r["text"]) for r in read_table(spark, path).collect()
    )

    m = compact_versioned(spark, path)
    assert m["op"] == "compact" and latest_version(path) == m["version"]
    for b in m["buckets"]:
        d = _os.path.join(path, m["buckets"][b], f"pb={b}")
        n_files = sum(1 for f in _os.listdir(d) if f.endswith(".parquet"))
        assert n_files == 1, (b, n_files)
    after = sorted(
        (r["doc_id"], r["text"]) for r in read_table(spark, path).collect()
    )
    assert after == before
    # pre-compaction version still reconstructs exactly
    prev = sorted(
        (r["doc_id"], r["text"])
        for r in read_table(spark, path, version=m["parent"]).collect()
    )
    assert prev == before


def test_versioned_schema_mismatch_raises(spark, tmp_path):
    """Row replacement with a missing or extra column must fail loudly
    BEFORE any write — silent drops/NULLs would corrupt replaced rows."""
    import pytest

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "t")
    init_table(docs, path, "doc_id", n_buckets=4)

    bad = docs.where(F.col("doc_id") == 1).drop("lang")
    with pytest.raises(ValueError, match="missing=\\['lang'\\]"):
        merge_versioned(spark, path, bad, "doc_id")
    assert latest_version(path) == 0  # nothing committed


def test_version_diff_classifies_and_reads_changed_buckets_only(spark, tmp_path):
    """diff_versions: pointer-unchanged buckets are never read
    (immutable-dir identity), rewritten-bucket rows that didn't change
    are filtered, and insert/update/delete all classify. A delete is
    simulated by committing a version with a bucket's row removed via a
    direct rewrite (the merge never deletes; the DIFF must still see
    it)."""
    from mimic2ts_spark.operators import versioned as V

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "t")
    init_table(docs, path, "doc_id", n_buckets=8)
    upd = docs.where(F.col("doc_id").isin([1, 2])).withColumn(
        "n_chars", F.col("n_chars") + 9
    )
    m1 = merge_versioned(spark, path, upd, "doc_id")

    d = V.diff_versions(spark, path, 0, 1, carry_cols=("n_chars",))
    # only pointer-changed buckets are read
    touched = {f.split("/pb=")[1].split("/")[0] for f in d.inputFiles()}
    assert touched == {str(b) for b in m1["affected_buckets"]}
    got = {r["doc_id"]: r for r in d.collect()}
    assert set(got) == {1, 2}  # unchanged rows in rewritten buckets filtered
    for k in (1, 2):
        assert got[k]["op"] == "update"
        assert got[k]["new_n_chars"] == got[k]["old_n_chars"] + 9

    # hand-commit v2 with doc 1's row dropped from its bucket → delete
    m = V.read_manifest(path, 1)
    keep = read_table(spark, path).where(F.col("doc_id") != 1)
    from mimic2ts_spark.operators.merge import key_bucket

    bucket_of_1 = docs.where(F.col("doc_id") == 1).select(
        key_bucket(F.col("doc_id"), 8).alias("b")
    ).collect()[0]["b"]
    rewritten = keep.where(F.col("bucket") == bucket_of_1)
    V._write_version_dirs(rewritten, path, "v2")
    m.update({"version": 2, "parent": 1, "op": "delete"})
    m["buckets"] = {**m["buckets"], str(bucket_of_1): "v2"}
    V._write_manifest(path, m)
    V._commit(path, 2)

    d2 = {r["doc_id"]: r for r in
          V.diff_versions(spark, path, 1, 2, carry_cols=("n_chars",)).collect()}
    assert set(d2) == {1} and d2[1]["op"] == "delete"
    assert d2[1]["new_n_chars"] is None

    # CDC-maintained rollup across the DELETE commit: refresh the v1
    # per-lang aggregate with the v1→v2 CDF; must equal the v2 recompute
    def rollup(version):
        return (
            read_table(spark, path, version=version)
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_chars").cast("long").alias("sum_n_chars"),
            )
        )

    cdf12 = V.diff_versions(spark, path, 1, 2, carry_cols=("lang", "n_chars"))
    refreshed = V.incremental_agg_refresh(rollup(1), cdf12, "lang", ("n_chars",))
    want = {r["lang"]: (r["n_rows"], r["sum_n_chars"]) for r in rollup(2).collect()}
    got = {r["lang"]: (r["n_rows"], r["sum_n_chars"]) for r in refreshed.collect()}
    assert got == want


def test_versioned_schema_evolution_opt_in(spark, tmp_path):
    """allow_new_columns=True ADDS batch-only columns: updated rows
    carry values, every pre-existing row reads NULL (parquet
    schema-merge across version dirs), pre-evolution versions simply
    lack the column on time travel, and the default still rejects."""
    import pytest

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "t")
    init_table(docs, path, "doc_id", n_buckets=4)

    upd = docs.where(F.col("doc_id") == 1).withColumn("score", F.lit(0.9))
    with pytest.raises(ValueError, match="extra=\\['score'\\]"):
        merge_versioned(spark, path, upd, "doc_id")

    merge_versioned(spark, path, upd, "doc_id", allow_new_columns=True)
    final = read_table(spark, path)
    assert "score" in final.columns
    got = {r["doc_id"]: r["score"] for r in
           final.where(F.col("doc_id").isin([1, 2])).collect()}
    assert got[1] == pytest.approx(0.9) and got[2] is None
    # time travel to v0: the column does not exist there
    assert "score" not in read_table(spark, path, version=0).columns


def test_versioned_metadata_count_and_conflict_guard(spark, tmp_path):
    """row_counts ride the manifest (parquet footers, no data scan):
    table_count must equal the real count at every version and after
    compaction; the optimistic commit guard rejects a commit whose
    expected parent is no longer the pointer."""
    import pytest

    from mimic2ts_spark.operators import versioned as V

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "t")
    init_table(docs, path, "doc_id", n_buckets=4)
    assert V.table_count(path) == docs.count()

    new = spark.createDataFrame(
        [(10**9, "brand new", "en", "src", 9)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    merge_versioned(spark, path, new, "doc_id")
    assert V.table_count(path) == docs.count() + 1
    assert V.table_count(path, version=0) == docs.count()  # per-version stats

    V.compact_versioned(spark, path)
    assert V.table_count(path) == docs.count() + 1
    assert V.table_count(path) == read_table(spark, path).count()

    with pytest.raises(RuntimeError, match="commit conflict"):
        V._commit(path, 9, expected_parent=0)  # pointer is at v2, not v0


def test_versioned_insert_into_unborn_bucket(spark, tmp_path):
    """A batch whose keys hash into a bucket NO manifest entry exists
    for (sparse table) must still merge: the base for that bucket is
    empty, the insert lands, and the manifest learns the bucket."""
    import hashlib

    from mimic2ts_spark.operators import versioned as V

    docs = spark.read.parquet(f"{SF}/documents.parquet").limit(3)
    path = str(tmp_path / "t")
    m0 = init_table(docs, path, "doc_id", n_buckets=32)
    born = set(m0["buckets"])

    def bucket_of(k: int) -> int:
        return int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % 32

    k = next(
        k for k in range(10**6, 10**6 + 10_000) if str(bucket_of(k)) not in born
    )
    new = spark.createDataFrame(
        [(k, "fresh", "en", "s", 5)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    m1 = merge_versioned(spark, path, new, "doc_id")
    assert str(bucket_of(k)) in m1["buckets"]
    got = read_table(spark, path, keys=[k]).where(F.col("doc_id") == k).collect()
    assert len(got) == 1 and got[0]["text"] == "fresh"
    assert V.table_count(path) == 4


def test_versioned_vacuum_retention(spark, tmp_path):
    """VACUUM keeps the newest K manifests and deletes every
    (version, bucket) dir no retained manifest references; time travel
    inside the window survives, outside it is gone."""
    import os as _os

    import pytest

    from mimic2ts_spark.operators.versioned import vacuum

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    path = str(tmp_path / "t")
    init_table(docs, path, "doc_id", n_buckets=4)
    for k in (1, 2, 3):
        upd = docs.where(F.col("doc_id") == k).withColumn("text", F.lit(f"u{k}"))
        merge_versioned(spark, path, upd, "doc_id")
    assert latest_version(path) == 3

    audit = vacuum(path, keep_versions=2)
    assert audit["retained_versions"] == [2, 3]
    assert audit["manifests_deleted"] == 2
    assert audit["dirs_deleted"] >= 1

    # latest + in-window time travel intact
    got = {r["doc_id"]: r["text"] for r in read_table(spark, path).collect()}
    assert got[1] == "u1" and got[2] == "u2" and got[3] == "u3"
    v2 = {r["doc_id"]: r["text"] for r in read_table(spark, path, version=2).collect()}
    assert v2[3] != "u3" and v2[2] == "u2"
    # outside the window: manifest gone
    with pytest.raises(FileNotFoundError):
        read_table(spark, path, version=0)
    # retained manifests reference only existing dirs (no dangling)
    for v in (2, 3):
        m = read_manifest(path, v)
        for b, ver in m["buckets"].items():
            assert _os.path.isdir(_os.path.join(path, ver, f"pb={b}")), (v, b, ver)

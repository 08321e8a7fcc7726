"""Versioned merge table: manifest-committed copy-on-write with time
travel — the transaction-log-lite answer to merge.py's documented
non-atomic overwrite window.

Layout:
    path/
      _versions/0.json … N.json   one manifest per committed version:
                                  {"version", "buckets": {bucket -> "v{k}"},
                                   "parent", "op"}
      _latest                     the COMMIT POINTER: a one-line file
                                  naming the current version; os.replace
                                  makes updating it atomic on POSIX
      v0/b=0/…parquet             immutable data dirs: version k writes
      v1/b=7/…parquet             ONLY its affected buckets under v{k}/

Semantics this buys over merge.py's in-place dynamic overwrite:
- ATOMIC COMMIT: data files land first (new dirs, invisible to any
  reader), the version manifest lands second, and the _latest pointer
  flips last via an atomic rename. A crash anywhere leaves readers on
  the previous fully-consistent version — there is no partial-rewrite
  window. (merge.py documents that window; this module removes it.)
- TIME TRAVEL: every manifest is retained, so read_table(path,
  version=k) reconstructs any historical state — the Delta/Iceberg
  `VERSION AS OF` read.
- MANIFEST-DRIVEN FILE PRUNING: the reader lists NOTHING. The manifest
  maps each bucket to the version dir holding its current data, and a
  filtered read selects manifest entries driver-side before Spark ever
  touches storage — at 100 TB this replaces object-store listing (the
  scan-planning killer) exactly the way a table format's log does.
  `bucket` is a DATA column here (not a hive partition dir), because
  pruning happens in the manifest, not in directory discovery.

The merge algebra (md5 bucketing, row-replacement full-outer join,
duplicate-key guard) is shared with operators/merge.py, so the final
state is the same oracle-expressible FULL OUTER JOIN.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mimic2ts_spark.operators.merge import MERGE_BUCKETS, key_bucket

_VERSIONS = "_versions"
_LATEST = "_latest"


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(path, _VERSIONS, f"{version}.json")


def _write_manifest(path: str, manifest: dict) -> None:
    os.makedirs(os.path.join(path, _VERSIONS), exist_ok=True)
    with open(_manifest_path(path, manifest["version"]), "w") as f:
        json.dump(manifest, f, sort_keys=True)


def _commit(path: str, version: int, expected_parent: int | None = None) -> None:
    """Flip the commit pointer atomically (os.replace = rename(2)).

    expected_parent adds BEST-EFFORT optimistic concurrency: if another
    writer committed since this transaction read its base version, the
    pointer no longer names the expected parent and the commit raises
    instead of silently clobbering the other writer's version chain.
    (Check-then-rename is not atomic — a true multi-writer table needs
    a lock service or CAS object store; the layout documents
    single-writer, this guard catches the accident.)"""
    if expected_parent is not None:
        current = latest_version(path)
        if current != expected_parent:
            raise RuntimeError(
                f"commit conflict: table advanced to v{current} while this "
                f"transaction was based on v{expected_parent} — re-read and retry"
            )
    tmp = os.path.join(path, f"{_LATEST}.tmp")
    with open(tmp, "w") as f:
        f.write(str(version))
    os.replace(tmp, os.path.join(path, _LATEST))


def latest_version(path: str) -> int:
    with open(os.path.join(path, _LATEST)) as f:
        return int(f.read().strip())


def read_manifest(path: str, version: int | None = None) -> dict:
    if version is None:
        version = latest_version(path)
    with open(_manifest_path(path, version)) as f:
        return json.load(f)


def _write_version_dirs(data: DataFrame, path: str, ver_dir: str) -> dict:
    """ONE write job for all buckets of a version: partition on a
    duplicate `pb` column so dirs land as v{k}/pb={bucket} while the
    `bucket` column itself survives INSIDE the data files (leaf-dir
    reads don't do hive discovery, so a hive-dropped column would
    vanish). Returns per-bucket row counts from the parquet FOOTERS of
    what was just written (no second scan of the data) — the manifest
    row-count stats that make count() a metadata-only query."""
    data.withColumn("pb", F.col("bucket")).write.mode("overwrite").partitionBy(
        "pb"
    ).parquet(os.path.join(path, ver_dir))
    import pyarrow.parquet as pq

    counts: dict[str, int] = {}
    root = os.path.join(path, ver_dir)
    for d in os.listdir(root):
        if d.startswith("pb="):
            n = 0
            full = os.path.join(root, d)
            for f in os.listdir(full):
                if f.endswith(".parquet"):
                    n += pq.ParquetFile(os.path.join(full, f)).metadata.num_rows
            counts[d.split("=")[1]] = n
    return counts


def init_table(
    df: DataFrame, path: str, key_col: str, n_buckets: int = MERGE_BUCKETS
) -> dict:
    """Write version 0: every bucket's data under v0/pb={bucket}."""
    data = df.withColumn("bucket", key_bucket(F.col(key_col), n_buckets))
    counts = _write_version_dirs(data, path, "v0")
    manifest = {
        "version": 0,
        "key": key_col,
        "n_buckets": n_buckets,
        "buckets": {b: "v0" for b in sorted(counts, key=int)},
        "row_counts": counts,
        "parent": None,
        "op": "init",
    }
    _write_manifest(path, manifest)
    _commit(path, 0)
    return manifest


def _bucket_dirs(path: str, manifest: dict, buckets: list[int] | None = None) -> list:
    sel = manifest["buckets"]
    if buckets is not None:
        sel = {str(b): sel[str(b)] for b in buckets if str(b) in sel}
    return [os.path.join(path, ver, f"pb={b}") for b, ver in sorted(sel.items())]


def read_table(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    buckets: list[int] | None = None,
    keys: list | None = None,
) -> DataFrame:
    """Read a table version (default: committed latest). `buckets`
    restricts the read to those buckets' dirs — manifest-driven file
    pruning, resolved driver-side before any storage access. `keys`
    prunes by KEY: each key's md5 bucket is computed driver-side (the
    same bucket function the writer used, evaluated via hashlib — no
    Spark job), so a point/batch lookup on a 100 TB table reads only
    the handful of dirs its keys hash into; the caller still applies
    the row-level key filter inside those buckets."""
    m = read_manifest(path, version)
    if keys is not None:
        import hashlib

        n = m["n_buckets"]
        key_buckets = sorted(
            {
                int(hashlib.md5(str(k).encode()).hexdigest()[:15], 16) % n
                for k in keys
            }
        )
        buckets = (
            key_buckets if buckets is None
            else sorted(set(buckets) & set(key_buckets))
        )
    dirs = _bucket_dirs(path, m, buckets)
    if not dirs:
        raise ValueError("no buckets selected (empty manifest selection)")
    # mergeSchema: version dirs written before a schema evolution lack
    # the added columns; the merged read surfaces them as NULL
    return spark.read.option("mergeSchema", "true").parquet(*dirs)


def merge_versioned(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_col: str,
    allow_new_columns: bool = False,
) -> dict:
    """MERGE an update batch as a NEW COMMITTED VERSION: affected
    buckets' merged data lands under v{n}/ (untouched buckets keep
    their existing dirs byte-identical — referenced, not rewritten),
    then manifest + pointer commit atomically. Returns the new
    manifest.

    Schema evolution is EXPLICIT opt-in (Delta's autoMerge analog):
    with allow_new_columns=True, batch columns absent from the table
    are ADDED — existing rows read as NULL for them (parquet
    schema-merge across version dirs; read_table always merges
    schemas), and versions committed before the evolution simply lack
    the column on time travel. Missing columns still always raise."""
    prev = read_manifest(path)
    n_buckets = prev["n_buckets"]
    if prev["key"] != key_col:
        raise ValueError(f"table key is {prev['key']!r}, not {key_col!r}")
    dup = (
        updates.groupBy(key_col).count().where(F.col("count") > 1).limit(1).collect()
    )
    if dup:
        raise ValueError(
            f"duplicate key {dup[0][key_col]!r} in update batch: which row "
            "wins is undefined — dedupe upstream before merging"
        )

    up = updates.withColumn("bucket", key_bucket(F.col(key_col), n_buckets))
    affected = sorted(r["bucket"] for r in up.select("bucket").distinct().collect())

    # buckets the manifest doesn't know yet (first rows ever hashing
    # there) have no dir to read — the base for them is simply empty
    present = [b for b in affected if str(b) in prev["buckets"]]
    if present:
        base = read_table(spark, path, buckets=present)
    elif prev["buckets"]:
        any_b = int(next(iter(prev["buckets"])))
        base = read_table(spark, path, buckets=[any_b]).limit(0)  # schema only
    else:  # degenerate: empty table — schema comes from the batch
        base = up.limit(0)
    data_cols = [c for c in base.columns if c != "bucket"]
    # schema check BEFORE any write: row-replacement needs every table
    # column in the batch — silently dropping extras or NULLing missing
    # ones would corrupt rows (Delta rejects mismatches too, absent the
    # explicit schema-evolution opt-in below)
    missing = sorted(set(data_cols) - set(updates.columns))
    extra = sorted(set(updates.columns) - set(data_cols))
    if missing or (extra and not allow_new_columns):
        raise ValueError(
            f"update batch schema does not match the table: missing={missing} "
            f"extra={extra} (pass allow_new_columns=True to ADD new columns; "
            "missing columns always require aligning the batch upstream)"
        )
    if extra:
        # evolution: widen the in-flight base with NULLs of the batch's
        # types; only the affected buckets rewrite with the new schema —
        # untouched buckets stay on the old schema and the reader's
        # parquet schema-merge reconciles them as NULL
        up_schema = {f.name: f.dataType for f in updates.schema.fields}
        for c in extra:
            base = base.withColumn(c, F.lit(None).cast(up_schema[c]))
        data_cols = data_cols + extra
    b = base.alias("b")
    u = up.alias("u")
    merged = b.join(u, F.col(f"b.{key_col}") == F.col(f"u.{key_col}"), "full_outer")
    take_u = F.col(f"u.{key_col}").isNotNull()  # row replacement
    picked = merged.select(
        *[
            F.when(take_u, F.col(f"u.{c}")).otherwise(F.col(f"b.{c}")).alias(c)
            for c in data_cols
        ],
        F.when(take_u, F.col("u.bucket")).otherwise(F.col("b.bucket")).alias("bucket"),
    )

    version = prev["version"] + 1
    ver_dir = f"v{version}"
    # 1) data first — new dirs, invisible to every reader (one job)
    counts = _write_version_dirs(picked, path, ver_dir)
    # 2) manifest second, 3) pointer flip last (atomic)
    buckets = dict(prev["buckets"])
    row_counts = dict(prev.get("row_counts", {}))
    for bkt in affected:
        buckets[str(bkt)] = ver_dir
    row_counts.update(counts)
    manifest = {
        "version": version,
        "key": key_col,
        "n_buckets": n_buckets,
        "buckets": buckets,
        "row_counts": row_counts,
        "parent": prev["version"],
        "op": "merge",
        "affected_buckets": affected,
    }
    _write_manifest(path, manifest)
    _commit(path, version, expected_parent=prev["version"])
    return manifest


def compact_versioned(spark: SparkSession, path: str) -> dict:
    """OPTIMIZE as a COMMIT: rewrite every current bucket's (possibly
    many) files into one file per bucket under a new version dir, then
    commit it — content-identical by construction (pure repartition on
    the bucket column, no expressions), and the PRE-compaction version
    stays time-travelable until VACUUM reclaims it. This is how a
    log-structured table compacts without a stop-the-world rewrite:
    readers on the old version are undisturbed, the pointer flip
    switches them over atomically."""
    prev = read_manifest(path)
    version = prev["version"] + 1
    ver_dir = f"v{version}"
    data = read_table(spark, path).repartition("bucket")
    counts = _write_version_dirs(data, path, ver_dir)
    manifest = {
        "version": version,
        "key": prev["key"],
        "n_buckets": prev["n_buckets"],
        "buckets": {b: ver_dir for b in prev["buckets"]},
        "row_counts": counts,
        "parent": prev["version"],
        "op": "compact",
    }
    _write_manifest(path, manifest)
    _commit(path, version, expected_parent=prev["version"])
    return manifest


def diff_versions(
    spark: SparkSession,
    path: str,
    from_version: int,
    to_version: int,
    carry_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Change-data-feed BETWEEN two committed versions: (key, op) with
    op ∈ {'insert', 'update', 'delete'}, plus old_/new_ carry columns.

    The manifest does the heavy lifting: a bucket whose version pointer
    is IDENTICAL in both manifests holds byte-identical data (version
    dirs are immutable), so only pointer-changed buckets are read and
    full-outer-joined — at 100 TB, diffing two adjacent versions costs
    the touched buckets, not two table scans. Same classification as a
    Delta CDF read over the commit range."""
    m_from = read_manifest(path, from_version)
    m_to = read_manifest(path, to_version)
    key_col = m_to["key"]
    changed = sorted(
        int(b)
        for b in set(m_from["buckets"]) | set(m_to["buckets"])
        if m_from["buckets"].get(b) != m_to["buckets"].get(b)
    )

    def _side(m, version):
        present = [b for b in changed if str(b) in m["buckets"]]
        if present:
            return read_table(spark, path, version=version, buckets=present)
        return None

    old = _side(m_from, from_version)
    new = _side(m_to, to_version)
    if old is None and new is None:  # identical manifests
        raise ValueError("versions are identical (no pointer differs)")
    if old is None:  # every changed bucket is brand-new → all inserts
        old = spark.createDataFrame([], new.schema)
    if new is None:  # every changed bucket was dropped → all deletes
        new = spark.createDataFrame([], old.schema)
    o = old.alias("o")
    n = new.alias("n")
    j = o.join(n, F.col(f"o.{key_col}") == F.col(f"n.{key_col}"), "full_outer")
    op = (
        F.when(F.col(f"o.{key_col}").isNull(), F.lit("insert"))
        .when(F.col(f"n.{key_col}").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
    )
    out = j.select(
        F.coalesce(F.col(f"o.{key_col}"), F.col(f"n.{key_col}")).alias(key_col),
        op.alias("op"),
        *[F.col(f"o.{c}").alias(f"old_{c}") for c in carry_cols],
        *[F.col(f"n.{c}").alias(f"new_{c}") for c in carry_cols],
    )
    if carry_cols:
        # unchanged rows inside a rewritten bucket are NOT changes
        same = None
        for c in carry_cols:
            eq = F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
            same = eq if same is None else same & eq
        out = out.where((F.col("op") != "update") | ~same)
    return out


def table_count(path: str, version: int | None = None) -> int:
    """count(*) as a METADATA-ONLY query: the manifest carries per-bucket
    row counts (harvested from the parquet footers at write time), so a
    table/version count touches one small JSON file — the planner-side
    stat every table format keeps so COUNT(*), size estimation, and
    broadcast decisions never scan data."""
    m = read_manifest(path, version)
    return sum(m["row_counts"].values())


def incremental_agg_refresh(
    agg: DataFrame,
    cdf: DataFrame,
    group_col: str,
    sum_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Maintain a rollup FROM the CDF instead of recomputing it — the
    consumer pattern that justifies a change feed at 100 TB: a grouped
    aggregate over the whole table refreshes at the cost of the delta.

    agg: (group_col, n_rows, sum_<c>…) — the maintained state.
    cdf:  diff_versions output carrying old_<group_col>/new_<group_col>
          and old_<c>/new_<c> for every sum col.
    Δ = (new image of insert+update rows) − (old image of delete+update
    rows), grouped; refreshed = agg ⊕ Δ, groups whose count reaches 0
    drop out. Pure integer adds/subtracts — exact, order-free."""
    def _img(side: str, ops: tuple[str, ...]) -> DataFrame:
        aggs = [F.count(F.lit(1)).cast("long").alias("_n")] + [
            F.sum(f"{side}_{c}").cast("long").alias(f"_s_{c}") for c in sum_cols
        ]
        return (
            cdf.where(F.col("op").isin(*ops))
            .groupBy(F.col(f"{side}_{group_col}").alias(group_col))
            .agg(*aggs)
        )

    adds = _img("new", ("insert", "update"))
    subs = _img("old", ("delete", "update"))
    a = adds.alias("a")
    s = subs.alias("s")
    delta = a.join(s, F.col(f"a.{group_col}") == F.col(f"s.{group_col}"), "full_outer").select(
        F.coalesce(F.col(f"a.{group_col}"), F.col(f"s.{group_col}")).alias(group_col),
        (F.coalesce(F.col("a._n"), F.lit(0)) - F.coalesce(F.col("s._n"), F.lit(0))).alias("_dn"),
        *[
            (
                F.coalesce(F.col(f"a._s_{c}"), F.lit(0))
                - F.coalesce(F.col(f"s._s_{c}"), F.lit(0))
            ).alias(f"_ds_{c}")
            for c in sum_cols
        ],
    )
    g = agg.alias("g")
    d = delta.alias("d")
    return (
        g.join(d, F.col(f"g.{group_col}") == F.col(f"d.{group_col}"), "full_outer")
        .select(
            F.coalesce(F.col(f"g.{group_col}"), F.col(f"d.{group_col}")).alias(group_col),
            (
                F.coalesce(F.col("g.n_rows"), F.lit(0))
                + F.coalesce(F.col("d._dn"), F.lit(0))
            ).cast("long").alias("n_rows"),
            *[
                (
                    F.coalesce(F.col(f"g.sum_{c}"), F.lit(0))
                    + F.coalesce(F.col(f"d._ds_{c}"), F.lit(0))
                ).cast("long").alias(f"sum_{c}")
                for c in sum_cols
            ],
        )
        .where(F.col("n_rows") > 0)
    )


def vacuum(path: str, keep_versions: int = 2) -> dict:
    """Retention GC (the VACUUM side of the table format): keep the
    newest `keep_versions` committed manifests, delete older manifests
    and every (version-dir, bucket) data dir no retained manifest
    references. Orphan manifests above the committed pointer (crash
    leftovers) are removed too. Bounds time travel to the retention
    window — the storage-cost dial every log-structured table has.
    Returns {retained_versions, dirs_deleted, manifests_deleted}."""
    import shutil

    latest = latest_version(path)
    all_versions = sorted(
        int(f.split(".")[0])
        for f in os.listdir(os.path.join(path, _VERSIONS))
        if f.endswith(".json")
    )
    retained = [v for v in all_versions if v <= latest][-keep_versions:]
    referenced: set[tuple[str, str]] = set()
    for v in retained:
        m = read_manifest(path, v)
        referenced |= {(ver, b) for b, ver in m["buckets"].items()}

    dirs_deleted = 0
    for d in os.listdir(path):
        if not (d.startswith("v") and d[1:].isdigit()):
            continue
        for sub in os.listdir(os.path.join(path, d)):
            if sub.startswith("pb=") and (d, sub.split("=")[1]) not in referenced:
                shutil.rmtree(os.path.join(path, d, sub))
                dirs_deleted += 1
        if not any(
            s.startswith("pb=") for s in os.listdir(os.path.join(path, d))
        ):
            shutil.rmtree(os.path.join(path, d))

    manifests_deleted = 0
    for v in all_versions:
        if v not in retained:
            os.remove(_manifest_path(path, v))
            manifests_deleted += 1
    return {
        "retained_versions": retained,
        "dirs_deleted": dirs_deleted,
        "manifests_deleted": manifests_deleted,
    }

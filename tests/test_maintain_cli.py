"""Maintenance CLI end-to-end: init → merge → compact over real parquet,
audit JSON on stdout, final state equals the dict upsert."""

from __future__ import annotations

import json
import subprocess
import sys

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _run(*argv: str) -> dict:
    r = subprocess.run(
        [sys.executable, "-m", "mimic2ts_spark.maintain", *argv],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        check=True,
    )
    return json.loads(r.stdout.strip().splitlines()[-1])


def test_maintain_init_merge_compact_roundtrip(spark, tmp_path):
    base_dir = str(tmp_path / "base")
    upd_dir = str(tmp_path / "updates")

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    docs.where(F.col("doc_id") % 7 == 0).withColumn(
        "text", F.lit("updated")
    ).write.parquet(upd_dir)

    a1 = _run("init", base_dir, f"{SF}/documents.parquet", "--buckets", "8")
    assert a1["n_rows"] == docs.count()

    a2 = _run("merge", base_dir, upd_dir, "--buckets", "8")
    assert a2["n_updates"] == docs.where(F.col("doc_id") % 7 == 0).count()
    assert 1 <= len(a2["affected_buckets"]) <= 8

    a3 = _run("compact", base_dir)
    assert a3["files_after"] <= a3["files_before"]
    assert a3["files_after"] == 8  # one file per bucket

    final = spark.read.parquet(base_dir)
    assert final.count() == docs.count()
    n_upd = final.where(F.col("text") == "updated").count()
    assert n_upd == a2["n_updates"]

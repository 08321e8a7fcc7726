"""X226 persisted-SQ8-codes scale check: build / serve / append walls on
the deterministic unit-vector sweep corpora of knn_recall_sweep
(32-query panel, best-of-2), plus the X227 fragmentation effect on the
IVF artifact (serve wall on a 16-append fragmented index vs compacted).
Results recorded in README ("X226/X227"). Usage:
    python scripts/sq8_artifact_scale.py [n ...]
"""
import json
import os
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "./scripts")

from pyspark.sql import functions as F

from knn_recall_sweep import synth_corpus
from mimic2ts_spark.operators.kmeans import save_centroids, train_coarse
from mimic2ts_spark.operators.pq import (
    append_sq8_artifact,
    build_sq8_artifact,
    serve_sq8_artifact,
)
from mimic2ts_spark.operators.similarity import (
    assign_vectors,
    compact_ivf_artifact,
    derived_cells,
    serve_ivf_artifact,
)
from mimic2ts_spark.session import get_spark, release_storage, session_tmpdir

spark = get_spark()
for n in [int(a) for a in sys.argv[1:]] or [20_000, 200_000]:
    embs = synth_corpus(spark, n).persist()
    embs.count()
    qs = embs.where(F.col("vec_id") < 32)

    # --- X226: SQ8 codes artifact ---------------------------------------
    out = session_tmpdir(prefix=f"sq8_scale_{n}_")
    t0 = time.time()
    build_sq8_artifact(spark, out, embs)
    build = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        rows = serve_sq8_artifact(spark, out, qs, 5).count()
        best = min(best, time.time() - t0)
    # O(delta) append wall: re-encode 1/16 of the corpus as a fresh-id delta
    delta = embs.where(F.col("vec_id") % 16 == 0).withColumn(
        "vec_id", F.col("vec_id") + 10_000_000
    )
    t0 = time.time()
    audit = append_sq8_artifact(spark, out, delta)
    append_s = time.time() - t0
    print(json.dumps({
        "x": "X226", "n": n, "build_s": round(build, 1),
        "serve_s": round(best, 2), "rows": rows,
        "append_s": round(append_s, 1), "append_rows": audit["delta"],
    }))

    # --- X227: fragmented IVF index, serve before/after compaction ------
    ivf = session_tmpdir(prefix=f"ivffrag_{n}_")
    cents = train_coarse(embs, derived_cells(n), n=n, cache_key=f"synth{n}")
    save_centroids(cents, f"{ivf}/centroids.json", meta={"n_base": n})
    # 16 appends = up to 16 files per cell (the streaming-ingest shape)
    for i in range(16):
        assign_vectors(embs.where(F.col("vec_id") % 16 == i), cents).write.mode(
            "append"
        ).partitionBy("cid").parquet(f"{ivf}/postings")
    frag = 1e9
    for _ in range(2):
        t0 = time.time()
        serve_ivf_artifact(spark, ivf, qs, embs, k=5).count()
        frag = min(frag, time.time() - t0)
    t0 = time.time()
    caudit = compact_ivf_artifact(spark, ivf)
    compact_s = time.time() - t0
    comp = 1e9
    for _ in range(2):
        t0 = time.time()
        serve_ivf_artifact(spark, ivf, qs, embs, k=5).count()
        comp = min(comp, time.time() - t0)
    print(json.dumps({
        "x": "X227", "n": n, "files_before": caudit["files_before"],
        "files_after": caudit["files_after"],
        "serve_fragmented_s": round(frag, 2),
        "serve_compacted_s": round(comp, 2),
        "compact_s": round(compact_s, 1),
        "cells_compacted": caudit["cells_compacted"],
    }))
    embs.unpersist()
    release_storage(spark)

"""X222 index-served IVF scale check: build + serve walls on the
deterministic unit-vector sweep corpora of knn_recall_sweep (32-query
panel, best-of-2). Results recorded in README ("X222 index-served
IVF"). Usage: python scripts/ivf_serve_scale.py [n ...]"""
import json, sys, time
sys.path.insert(0, "."); sys.path.insert(0, "./scripts")
from pyspark.sql import functions as F
from mimic2ts_spark.session import get_spark, release_storage, session_tmpdir
from knn_recall_sweep import synth_corpus
from mimic2ts_spark.operators.kmeans import KM_ROUNDS, save_centroids, train_coarse
from mimic2ts_spark.operators.similarity import (
    assign_vectors, derived_cells, serve_ivf_artifact)

spark = get_spark()
for n in [int(a) for a in sys.argv[1:]] or [20_000, 200_000]:
    embs = synth_corpus(spark, n).persist(); embs.count()
    out = session_tmpdir(prefix=f"ivf_scale_{n}_")
    t0 = time.time()
    cents = train_coarse(embs, derived_cells(n), n=n, cache_key=f"synth{n}")
    save_centroids(cents, f"{out}/centroids.json", meta={"n_base": n})
    assign_vectors(embs, cents).write.mode("overwrite").partitionBy("cid").parquet(f"{out}/postings")
    build = time.time() - t0
    qs = embs.where(F.col("vec_id") < 32)
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        got = serve_ivf_artifact(spark, out, qs, embs, k=5).count()
        best = min(best, time.time() - t0)
    print(json.dumps({"n": n, "cells": len(cents), "build_s": round(build,1),
                      "serve_s": round(best,2), "rows": got}))
    embs.unpersist(); release_storage(spark)

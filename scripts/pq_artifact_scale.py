"""X230 persisted-PQ-codes scale check: build / serve / append walls on
the deterministic unit-vector sweep corpora of knn_recall_sweep
(32-query panel, best-of-2), the X226 methodology applied to the PQ
tier. Results recorded in README ("X230"). Usage:
    python scripts/pq_artifact_scale.py [n ...]
"""
import json
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "./scripts")

from pyspark.sql import functions as F

from knn_recall_sweep import synth_corpus
from mimic2ts_spark.operators.pq import (
    append_pq_artifact,
    build_pq_artifact,
    serve_pq_artifact,
)
from mimic2ts_spark.session import get_spark, release_storage, session_tmpdir

spark = get_spark()
for n in [int(a) for a in sys.argv[1:]] or [20_000, 200_000]:
    embs = synth_corpus(spark, n).persist()
    embs.count()
    qs = embs.where(F.col("vec_id") < 32)

    out = session_tmpdir(prefix=f"pq_scale_{n}_")
    t0 = time.time()
    build_pq_artifact(spark, out, embs)
    build = time.time() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.time()
        rows = serve_pq_artifact(spark, out, qs, 5).count()
        best = min(best, time.time() - t0)
    # O(delta) append wall: re-encode 1/16 of the corpus as a fresh-id delta
    delta = embs.where(F.col("vec_id") % 16 == 0).withColumn(
        "vec_id", F.col("vec_id") + 10_000_000
    )
    t0 = time.time()
    audit = append_pq_artifact(spark, out, delta)
    append_s = time.time() - t0
    print(json.dumps({
        "x": "X230", "n": n, "build_s": round(build, 1),
        "serve_s": round(best, 2), "rows": rows,
        "append_s": round(append_s, 1), "append_rows": audit["delta"],
    }))
    embs.unpersist()
    release_storage(spark)

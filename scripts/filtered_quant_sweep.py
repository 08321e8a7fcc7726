"""X221 filtered quantized-tier sweep: serve wall + recall@5 of the
filtered BQ / SQ8 routes against the exact filtered truth, on the
deterministic md5-uniform unit-vector corpora of knn_recall_sweep
(distinct-at-scale — the make_scale_dataset copies are byte-identical
vectors, degenerate for recall). Results recorded in README
("X221 filtered quantized tiers").

Usage: python scripts/filtered_quant_sweep.py [n ...]  (default 20000 200000)
"""
import json, sys, time
sys.path.insert(0, ".")
from pyspark.sql import functions as F
from mimic2ts_spark.session import get_spark, release_storage
sys.path.insert(0, "./scripts")
from knn_recall_sweep import synth_corpus, N_QUERIES, K
from mimic2ts_spark.operators.similarity import (
    filtered_topk_bq, filtered_topk_sq8, brute_force_topk)
from mimic2ts_spark.operators.pq import _quant_base, sq8_int_stats

spark = get_spark()
for n in [int(a) for a in sys.argv[1:]] or [20_000, 200_000]:
    embs = synth_corpus(spark, n).persist()
    embs.count()
    qs = embs.where(F.col("vec_id") < N_QUERIES)
    stats = sq8_int_stats(_quant_base(embs, "vec_id", "embedding"))
    for label, pred in (("selective", F.col("vec_id") % 16 == 1),
                        ("broad", F.col("vec_id") % 7 != 0)):
        allowed = embs.where(pred).select("vec_id")
        sub = embs.join(allowed, "vec_id", "left_semi")
        truth = brute_force_topk(sub, qs, k=K).select("query_id", "neighbor_id").persist()
        truth.count()
        for name, fn, kw in (("bq", filtered_topk_bq, {}),
                             ("sq8", filtered_topk_sq8, {"stats": stats})):
            best, rec = 1e9, None
            for _ in range(2):
                t0 = time.time()
                rows = fn(embs, qs, allowed, k=K, **kw).select("query_id", "neighbor_id").persist()
                got = rows.count()
                dt = time.time() - t0
                hit = truth.join(rows, ["query_id", "neighbor_id"], "left_semi").count()
                rows.unpersist()
                best = min(best, dt); rec = hit / (N_QUERIES * K)
            print(json.dumps({"n": n, "fset": label, "route": name,
                              "wall_s": round(best, 2), "recall@5": round(rec, 3)}))
        truth.unpersist()
    embs.unpersist()
    release_storage(spark)

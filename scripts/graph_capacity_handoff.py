"""Graph-tier capacity HANDOFF drive (VERDICT r13 #3): one run at/past
GRAPH_SERVE_MAX_N (1M) that (a) exercises the GraphTierOverCapacity
raise on the real serving entry point, and (b) measures the tiers the
guard's message recommends instead — brute-force exact, artifact-served
SQ8, and index-served IVF — recall@5 + wall at the same corpus size, so
the "route past 1M to SQ8/IVF/brute" advice carries numbers, not just a
message string.

Corpus = the knn_recall_sweep deterministic md5-uniform UNIT vectors
(validated stand-in for the shipped embeddings — see that script's
header for why make_scale_dataset sweeps are degenerate for recall).
The corpus is materialized to a parquet tmp dir once; every tier reads
the same files.

Usage: python scripts/graph_capacity_handoff.py [n] [out_json]
       (default n=1_200_000; results also land in README "Graph-ANN
       serving capacity handoff".)

Metric-matching (the q_ann_recall discipline): IVF ranks by cosine so
its reference is the exact cosine panel; SQ8 ranks by quantized int-L2
so its reference is the exact quantized-int-L2 panel. Brute force IS
each reference (recall 1.0 by construction) — its wall is what the
32-query exact panel costs at this n.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mimic2ts_spark.session import get_spark  # noqa: E402
from mimic2ts_spark.operators import pq as PQ  # noqa: E402
from mimic2ts_spark.operators import similarity as S  # noqa: E402
from knn_recall_sweep import synth_corpus  # noqa: E402

N_QUERIES = 32
K = 5


def recall(exact, approx) -> float:
    hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    return hit / (N_QUERIES * K)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_200_000
    out_json = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("graph_capacity_handoff")
    work = f"/tmp/graph_handoff_{n}"
    shutil.rmtree(work, ignore_errors=True)
    os.makedirs(work)
    results = []

    corpus_path = os.path.join(work, "embeddings.parquet")
    t0 = time.time()
    synth_corpus(spark, n).repartition(64).write.parquet(corpus_path)
    embs = spark.read.parquet(corpus_path)
    results.append({"stage": "corpus", "n": n,
                    "wall_sec": round(time.time() - t0, 1)})
    print(json.dumps(results[-1]), flush=True)

    qs = embs.where(F.col("vec_id") < N_QUERIES).localCheckpoint(eager=True)

    # (a) the guard FIRES on the serving entry point at this n — before
    # any graph work (the dummy graph relation is never evaluated)
    from mimic2ts_spark.operators.knn import (
        GRAPH_SERVE_MAX_N,
        GraphTierOverCapacity,
        knn_beam_topk,
    )

    if n >= GRAPH_SERVE_MAX_N:
        dummy_graph = spark.createDataFrame(
            [], "id long, nbr long, d2 long"
        )
        try:
            knn_beam_topk(embs, qs, dummy_graph, k=K)
            raise SystemExit("guard did NOT fire at n=%d" % n)
        except GraphTierOverCapacity as e:
            results.append({"stage": "guard", "n": n, "raised": True,
                            "message_names_tiers": all(
                                t in str(e) for t in ("sq8", "ivf", "brute"))})
            print(json.dumps(results[-1]), flush=True)
    else:
        results.append({"stage": "guard", "n": n,
                        "raised": False, "below_cap": True})
        print(json.dumps(results[-1]), flush=True)

    # (b) the recommended tiers at the same n ------------------------------
    # exact references (and the brute-force tier itself)
    t0 = time.time()
    exact_l2 = (
        PQ.brute_force_l2_panel(embs, qs, k=K)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    results.append({"stage": "brute_l2", "n": n, "recall@5": 1.0,
                    "wall_sec": round(time.time() - t0, 1)})
    print(json.dumps(results[-1]), flush=True)

    t0 = time.time()
    exact_cos = (
        S.brute_force_topk(embs, qs, k=K)
        .select("query_id", "neighbor_id")
        .localCheckpoint(eager=True)
    )
    results.append({"stage": "brute_cosine", "n": n, "recall@5": 1.0,
                    "wall_sec": round(time.time() - t0, 1)})
    print(json.dumps(results[-1]), flush=True)

    # SQ8: artifact build (once-per-corpus cost), then artifact serve
    sq8_dir = os.path.join(work, "sq8")
    t0 = time.time()
    PQ.build_sq8_artifact(spark, sq8_dir, embs)
    sq8_build = round(time.time() - t0, 1)
    t0 = time.time()
    sq8 = PQ.serve_sq8_artifact(spark, sq8_dir, qs, k=K).select(
        "query_id", "neighbor_id"
    )
    r = recall(exact_l2, sq8)
    results.append({"stage": "sq8_artifact", "n": n, "recall@5": round(r, 4),
                    "build_sec": sq8_build,
                    "serve_sec": round(time.time() - t0, 1)})
    print(json.dumps(results[-1]), flush=True)

    # IVF: `maintain ivf` layout build (sample-capped coarse train +
    # one assignment pass + cid-partitioned write), then indexed serve
    from mimic2ts_spark.operators.kmeans import (
        KM_ROUNDS,
        save_centroids,
        train_coarse,
    )

    ivf_dir = os.path.join(work, "ivf")
    os.makedirs(ivf_dir)
    t0 = time.time()
    cells = S.derived_cells(n)
    cents = train_coarse(embs, cells, n=n)
    save_centroids(
        cents, os.path.join(ivf_dir, "centroids.json"),
        meta={"n_base": n, "n_cells": len(cents), "rounds": KM_ROUNDS,
              "id_col": "vec_id", "vec_col": "embedding"},
    )
    S.assign_vectors(embs, cents).write.partitionBy("cid").parquet(
        os.path.join(ivf_dir, "postings")
    )
    ivf_build = round(time.time() - t0, 1)
    t0 = time.time()
    ivf = S.serve_ivf_artifact(spark, ivf_dir, qs, embs, k=K).select(
        "query_id", "neighbor_id"
    )
    r = recall(exact_cos, ivf)
    results.append({"stage": "ivf_indexed", "n": n, "cells": cells,
                    "recall@5": round(r, 4), "build_sec": ivf_build,
                    "serve_sec": round(time.time() - t0, 1)})
    print(json.dumps(results[-1]), flush=True)

    if out_json:
        with open(out_json, "w") as f:
            json.dump(results, f, indent=1)
    print("DONE", flush=True)


if __name__ == "__main__":
    main()

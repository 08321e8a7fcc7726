"""X181 serving-dial recall sweep (VERDICT r10 #2): measure beam-search
recall@5 over the NN-Descent graph at corpus sizes past the derived-dial
knee, comparing the fixed FLOOR dials (32, 4, 4) against
knn.serving_dials(n).

Corpora are generated DETERMINISTICALLY here (md5-derived uniform 64-dim
coordinates in [-0.5, 0.5) — the same locality-free hard regime as the
shipped testdata embeddings) rather than via make_scale_dataset, because
the id-offset sweep copies are byte-identical VECTORS: identical points
are degenerate for a recall measurement (the exact top-5 is all-ties at
d2=0) and fire the knn_graph dup guard by design. Distinct-at-scale is
the regime the serving dials must hold in.

Usage: python scripts/knn_recall_sweep.py [n ...]   (default: 20000 200000)
Prints one JSON line per (n, dial-set) with the dials, recall@5 and
serve wall seconds. Results are recorded in the knn.py dial table and
pinned by tests/test_extensions.py::test_beam_derived_dials_recall_floor.
"""

from __future__ import annotations

import json
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from mimic2ts_spark.session import get_spark  # noqa: E402
from mimic2ts_spark.operators import pq as PQ  # noqa: E402
from mimic2ts_spark.operators.knn import (  # noqa: E402
    BEAM_ENTRIES,
    BEAM_HOPS,
    BEAM_WIDTH,
    knn_beam_topk,
    knn_graph,
    serving_dials,
)

N_QUERIES = 32
K = 5

# Scaled corpus = deterministic md5-uniform UNIT vectors — one md5 per
# (id, dim), top-15 hex chars → uniform in [-0.5, 0.5), then normalized.
# This is a VALIDATED stand-in for the shipped testdata distribution:
# the real embeddings are themselves random unit vectors (avg per-vector
# max cosine 0.41 ≈ the √(2·ln n / d) random expectation, zero cos>0.9
# pairs), and floor-dial serve recall at n=2000 measures 0.556 on BOTH
# corpora. Why not make_scale_dataset sweeps: its id-offset copies are
# byte-identical VECTORS — degenerate for a recall measurement (the
# exact top-5 is all-ties at d2=0) and the knn_graph dup guard refuses
# them by design; the serving dials must hold on DISTINCT data growing
# in content, which is also the r09 sweep rule (scaling adds new values,
# not new counts per value).
_COORD = (
    "transform(sequence(0, 63), d -> "
    "(conv(substring(md5(concat(cast(id as string), '_', cast(d as string))), "
    "1, 15), 16, 10) % 1048576L) / 1048576.0d - 0.5d)"
)


def synth_corpus(spark, n: int):
    raw = spark.range(n).select(
        F.col("id").alias("vec_id"), F.expr(_COORD).alias("_raw")
    )
    nrm = F.sqrt(F.aggregate("_raw", F.lit(0.0), lambda a, x: a + x * x))
    return raw.select(
        "vec_id", F.transform("_raw", lambda x: x / nrm).alias("embedding")
    )


def recall_at_k(exact, approx) -> float:
    hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi").count()
    return hit / (N_QUERIES * K)


def main() -> None:
    sizes = [int(a) for a in sys.argv[1:]] or [20_000, 200_000]
    spark = get_spark()
    for n in sizes:
        embs = synth_corpus(spark, n).persist()
        embs.count()
        qs = embs.where(F.col("vec_id") < N_QUERIES)
        t0 = time.time()
        graph = knn_graph(embs)  # distinct by construction — guard silent
        graph = graph.persist()
        graph.count()
        build_s = round(time.time() - t0, 1)
        exact = (
            PQ.brute_force_l2_panel(embs, qs, k=K)
            .select("query_id", "neighbor_id")
            .persist()
        )
        exact.count()
        for label, dials in (
            ("floor", (BEAM_WIDTH, BEAM_HOPS, BEAM_ENTRIES)),
            ("derived", serving_dials(n)),
        ):
            beam, hops, entries = dials
            t0 = time.time()
            approx = knn_beam_topk(
                embs, qs, graph, k=K, beam=beam, hops=hops, entries=entries
            ).select(
                F.col("qid").alias("query_id"), F.col("nbr").alias("neighbor_id")
            )
            r = recall_at_k(exact, approx)
            print(
                json.dumps(
                    {
                        "n": n,
                        "dials": label,
                        "beam": beam,
                        "hops": hops,
                        "entries": entries,
                        "recall@5": round(r, 4),
                        "serve_sec": round(time.time() - t0, 1),
                        "graph_build_sec": build_s,
                    }
                ),
                flush=True,
            )
        exact.unpersist()
        graph.unpersist()
        embs.unpersist()


if __name__ == "__main__":
    main()

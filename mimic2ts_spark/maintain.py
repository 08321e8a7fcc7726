"""Table-maintenance CLI: MERGE an update batch into a bucket-partitioned
base and/or compact its small files — the operational surface over
operators/versioned.py (default) and operators/merge.py (`--inplace`).

Usage:
    python -m mimic2ts_spark.maintain init   BASE_DIR SRC_PARQUET --key doc_id
    python -m mimic2ts_spark.maintain merge  BASE_DIR UPD_PARQUET --key doc_id
    python -m mimic2ts_spark.maintain compact BASE_DIR [--max-records-per-file N]
    python -m mimic2ts_spark.maintain codebook OUT_JSON SRC_PARQUET \
        [--id-col vec_id] [--vec-col embedding]
    python -m mimic2ts_spark.maintain cluster OUT_DIR SRC_PARQUET \
        [--threshold 0.8]
    python -m mimic2ts_spark.maintain bpe OUT_JSON SRC_PARQUET [--rounds N]
    python -m mimic2ts_spark.maintain ivf OUT_DIR SRC_PARQUET
    python -m mimic2ts_spark.maintain ivf-append OUT_DIR DELTA_PARQUET
    python -m mimic2ts_spark.maintain ivf-compact OUT_DIR [--max-files-per-cell N]
    python -m mimic2ts_spark.maintain postings OUT_DIR SRC_PARQUET
    python -m mimic2ts_spark.maintain postings-append OUT_DIR DELTA_PARQUET
    python -m mimic2ts_spark.maintain sq8-stats OUT_JSON SRC_PARQUET \
        [--id-col vec_id] [--vec-col embedding]
    python -m mimic2ts_spark.maintain sq8-codes OUT_DIR SRC_PARQUET \
        [--id-col vec_id] [--vec-col embedding]
    python -m mimic2ts_spark.maintain sq8-codes-append OUT_DIR DELTA_PARQUET
    python -m mimic2ts_spark.maintain pq-codes OUT_DIR SRC_PARQUET \
        [--id-col vec_id] [--vec-col embedding]
    python -m mimic2ts_spark.maintain pq-codes-append OUT_DIR DELTA_PARQUET
    python -m mimic2ts_spark.maintain bq-codes OUT_DIR SRC_PARQUET \
        [--id-col vec_id] [--vec-col embedding]
    python -m mimic2ts_spark.maintain bq-codes-append OUT_DIR DELTA_PARQUET
    python -m mimic2ts_spark.maintain ivfpq-codes OUT_DIR SRC_PARQUET \
        [--id-col vec_id] [--vec-col embedding]
    python -m mimic2ts_spark.maintain ivfpq-codes-append OUT_DIR DELTA_PARQUET
    python -m mimic2ts_spark.maintain ivfpq-compact OUT_DIR [--max-files-per-cell N]
    python -m mimic2ts_spark.maintain codes-compact OUT_DIR [--subdir codes]
    python -m mimic2ts_spark.maintain canon-postings OUT_DIR SRC_PARQUET
    python -m mimic2ts_spark.maintain canon-postings-append OUT_DIR DELTA_PARQUET
    python -m mimic2ts_spark.maintain canon-postings-compact OUT_DIR [--max-files N]

init/merge/compact default to the VERSIONED backend (manifest +
atomic pointer-flip commit, time travel, no partial-rewrite crash
window — the r05 verdict's routing ask): `init` writes a versioned v0
and every `merge`/`compact` commits a new version. `--inplace` on
`init` selects merge.py's in-place dynamic-overwrite layout instead
(fast path: no version dirs to retain/vacuum, but a documented
non-atomic overwrite window); `merge`/`compact` auto-route by the
layout on disk, so existing in-place tables keep working unchanged.

Each command prints ONE JSON audit line (bucket/file/row counts) — the
same auditability contract as the corpus CLI's manifest. `codebook`
trains the PQ subspace codebooks once and persists them as a JSON
artifact (operators/pq.py:save_codebooks) — at real scale codebooks are
maintained table state like bucket layout, not per-query work; encode /
ADC queries load them (`load_codebooks`) instead of retraining.
"""

from __future__ import annotations

import argparse
import json
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        prog="python -m mimic2ts_spark.maintain",
        description=__doc__.split("\n")[0],
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p_init = sub.add_parser("init", help="write SRC as a bucketed merge base")
    p_init.add_argument("base_dir")
    p_init.add_argument("src")
    p_init.add_argument("--key", default="doc_id")
    p_init.add_argument("--buckets", type=int, default=32)
    p_init.add_argument(
        "--inplace", action="store_true",
        help="merge.py in-place layout instead of the versioned default",
    )

    p_merge = sub.add_parser("merge", help="upsert an update batch into BASE")
    p_merge.add_argument("base_dir")
    p_merge.add_argument("updates")
    p_merge.add_argument("--key", default="doc_id")
    # default None: the bucket count is TABLE STATE (persisted by init in
    # _merge_meta.json), not a per-invocation choice — an explicit value
    # that contradicts the manifest is rejected by merge_upsert.
    p_merge.add_argument("--buckets", type=int, default=None)

    p_comp = sub.add_parser("compact", help="compact BASE's bucket files")
    p_comp.add_argument("base_dir")
    p_comp.add_argument("--max-records-per-file", type=int, default=None)

    p_cb = sub.add_parser(
        "codebook", help="train + persist PQ codebooks from SRC vectors"
    )
    p_cb.add_argument("out_json")
    p_cb.add_argument("src")
    p_cb.add_argument("--id-col", default="vec_id")
    p_cb.add_argument("--vec-col", default="embedding")

    p_vac = sub.add_parser(
        "vacuum", help="retention GC for a VERSIONED table (operators/versioned.py)"
    )
    p_vac.add_argument("base_dir")
    p_vac.add_argument("--keep-versions", type=int, default=2)

    p_cl = sub.add_parser(
        "cluster",
        help="persist near-dup cluster labels (minhash pairs + CC) as an artifact",
    )
    p_cl.add_argument("out_dir")
    p_cl.add_argument("src")
    p_cl.add_argument("--threshold", type=float, default=0.8)
    p_cl.add_argument("--id-col", default="doc_id")
    p_cl.add_argument("--text-col", default="text")

    p_bpe = sub.add_parser(
        "bpe", help="train + persist the BPE merge table from SRC docs"
    )
    p_bpe.add_argument("out_json")
    p_bpe.add_argument("src")
    p_bpe.add_argument("--rounds", type=int, default=None)
    p_bpe.add_argument("--text-col", default="text")

    p_ivf = sub.add_parser(
        "ivf", help="build + persist an IVF index (trained cells + postings)"
    )
    p_ivf.add_argument("out_dir")
    p_ivf.add_argument("src")
    p_ivf.add_argument("--id-col", default="vec_id")
    p_ivf.add_argument("--vec-col", default="embedding")

    p_cp = sub.add_parser(
        "canon-postings",
        help="build + persist the CANONICAL inverted index (exact md5 "
             "map + postings/doclens over canonical docs) the "
             "panel-BM25 evals serve from (r15, X176 layout)",
    )
    p_cp.add_argument("out_dir")
    p_cp.add_argument("src")
    p_cp.add_argument("--id-col", default="doc_id")
    p_cp.add_argument("--text-col", default="text")

    p_cpa = sub.add_parser(
        "canon-postings-append",
        help="append a NEW-ids delta to a canon-postings artifact at "
             "O(delta) cost — only genuinely new texts band into new "
             "canonical docs; idempotent on redelivery",
    )
    p_cpa.add_argument("out_dir")
    p_cpa.add_argument("delta")
    p_cpa.add_argument("--id-col", default="doc_id")
    p_cpa.add_argument("--text-col", default="text")

    p_cpc = sub.add_parser(
        "canon-postings-compact",
        help="compact the three flat canon-postings dirs fragmented by "
             "appends (crash-safe sibling-staged swaps, X229)",
    )
    p_cpc.add_argument("out_dir")
    p_cpc.add_argument("--max-files", type=int, default=1)

    p_po = sub.add_parser(
        "postings", help="build + persist a BM25 inverted index (term-sorted)"
    )
    p_po.add_argument("out_dir")
    p_po.add_argument("src")
    p_po.add_argument("--text-col", default="text")
    p_po.add_argument("--id-col", default="doc_id")
    p_po.add_argument(
        "--positions", action="store_true",
        help="also persist the positional index (term, doc_id, positions) "
             "that serves phrase queries without a corpus scan",
    )
    p_po.add_argument(
        "--trigrams", action="store_true",
        help="also persist the char-trigram index (gram, doc_id) that "
             "serves substring (grep) queries without a corpus scan",
    )
    p_po.add_argument(
        "--impacts", action="store_true",
        help="also persist the per-term (df, u_max) impact scalars that "
             "serve MaxScore-pruned BM25 (X200) without scoring a posting",
    )

    p_poa = sub.add_parser(
        "postings-append",
        help="append a NEW-docs delta to the postings index, update stats",
    )
    p_poa.add_argument("out_dir")
    p_poa.add_argument("delta")
    p_poa.add_argument("--text-col", default="text")
    p_poa.add_argument("--id-col", default="doc_id")
    p_poa.add_argument(
        "--positions", action="store_true",
        help="also append the delta's positional postings (NEW doc_ids "
             "only, so rows append without array merges)",
    )
    p_poa.add_argument(
        "--trigrams", action="store_true",
        help="also append the delta's trigram postings (NEW doc_ids only)",
    )
    p_poa.add_argument(
        "--impacts", action="store_true",
        help="REBUILD the impact scalars after the append (u_max and df "
             "embed corpus-global stats, so appends must rebuild them — "
             "serving against stale impacts could under-bound and break "
             "the MaxScore prune theorem)",
    )

    p_iva = sub.add_parser(
        "ivf-append",
        help="assign a delta batch against the persisted cells, append postings",
    )
    p_iva.add_argument("out_dir")
    p_iva.add_argument("delta")
    p_iva.add_argument("--id-col", default="vec_id")
    p_iva.add_argument("--vec-col", default="embedding")

    p_ivc = sub.add_parser(
        "ivf-compact",
        help="rewrite fragmented postings cells (streaming appends leave "
             "one file per touched cell per microbatch) — O(fragmented "
             "cells), crash-safe per-cell swap, rows untouched (X227)",
    )
    p_ivc.add_argument("out_dir")
    p_ivc.add_argument("--max-files-per-cell", type=int, default=1)

    p_dq = sub.add_parser(
        "ddq",
        help="build + persist the log-bucket quantile-sketch counter table",
    )
    p_dq.add_argument("out_dir")
    p_dq.add_argument("src")
    p_dq.add_argument("--group-col", default="event_type")
    p_dq.add_argument("--value-col", default="value")

    p_dqa = sub.add_parser(
        "ddq-append",
        help="append a delta batch's quantile-sketch counters "
             "(counters ADD — merge happens at read time)",
    )
    p_dqa.add_argument("out_dir")
    p_dqa.add_argument("delta")
    p_dqa.add_argument("--group-col", default="event_type")
    p_dqa.add_argument("--value-col", default="value")

    p_mh = sub.add_parser(
        "minhash-index",
        help="build + persist the MinHash banding index (band, key, doc_id, codes)",
    )
    p_mh.add_argument("out_dir")
    p_mh.add_argument("src")
    p_mh.add_argument("--text-col", default="text")
    p_mh.add_argument("--id-col", default="doc_id")
    p_mh.add_argument(
        "--canonical", action="store_true",
        help="exact-first layout: bands over CANONICAL docs only plus an "
             "exact (text_md5, canon) map — dup-heavy corpora then attach "
             "copies by one md5 join instead of per-copy band collisions",
    )

    p_mha = sub.add_parser(
        "minhash-index-append",
        help="append a NEW-docs delta's banded rows (bands are per-doc "
             "=> blind row append, no reconciliation)",
    )
    p_mha.add_argument("out_dir")
    p_mha.add_argument("delta")
    p_mha.add_argument("--text-col", default="text")
    p_mha.add_argument("--id-col", default="doc_id")
    p_mha.add_argument(
        "--canonical", action="store_true",
        help="append to an exact-first layout: only genuinely NEW texts' "
             "batch canonicals enter the bands; the exact map gains the "
             "new (text_md5, canon) rows",
    )

    p_kg = sub.add_parser(
        "knn-graph",
        help="build + persist the NN-Descent k-NN graph artifact "
             "(vectors + graph + meta)",
    )
    p_kg.add_argument("out_dir")
    p_kg.add_argument("src")
    p_kg.add_argument("--id-col", default="vec_id")
    p_kg.add_argument("--vec-col", default="embedding")

    p_kga = sub.add_parser(
        "knn-graph-append",
        help="insert a NEW-ids delta at delta cost: beam-search the "
             "existing graph, exact within-batch pairs, reverse "
             "adoption on beam-found nodes only (batches <= 4096 "
             "vectors; chunk larger ingests)",
    )
    p_kga.add_argument("out_dir")
    p_kga.add_argument("delta")
    p_kga.add_argument("--id-col", default="vec_id")
    p_kga.add_argument("--vec-col", default="embedding")

    p_cla = sub.add_parser(
        "cluster-append",
        help="O(delta) cluster-label maintenance: dedup a delta batch "
             "against the minhash index, merge components on the label "
             "table, append the delta's bands to the index",
    )
    p_cla.add_argument("labels_dir")
    p_cla.add_argument("index_dir")
    p_cla.add_argument("delta")
    p_cla.add_argument("--threshold", type=float, default=0.8)
    p_cla.add_argument("--id-col", default="doc_id")
    p_cla.add_argument("--text-col", default="text")

    p_cw = sub.add_parser(
        "classifier-weights",
        help="persist the hashed-linear classifier weight table "
             "(bucket, w) as a DENSE model artifact (X208)",
    )
    p_cw.add_argument("out_dir")
    p_cw.add_argument("--dim", type=int, default=None)

    p_sq8 = sub.add_parser(
        "sq8-stats",
        help="persist the SQ8 serving quantizer state (per-dim int "
             "lo/hi over the quant grid) as a JSON artifact (X212)",
    )
    p_sq8.add_argument("out_json")
    p_sq8.add_argument("src")
    p_sq8.add_argument("--id-col", default="vec_id")
    p_sq8.add_argument("--vec-col", default="embedding")

    p_sqc = sub.add_parser(
        "sq8-codes",
        help="persist the SQ8 index (frozen quantizer stats + per-dim "
             "int8 codes table) — 64 small ints/vector (X226)",
    )
    p_sqc.add_argument("out_dir")
    p_sqc.add_argument("src")
    p_sqc.add_argument("--id-col", default="vec_id")
    p_sqc.add_argument("--vec-col", default="embedding")

    p_sqa = sub.add_parser(
        "sq8-codes-append",
        help="append a NEW-ids delta batch to an sq8-codes index at "
             "O(delta) cost (frozen stats: codes' meaning never moves)",
    )
    p_sqa.add_argument("out_dir")
    p_sqa.add_argument("delta")
    p_sqa.add_argument("--id-col", default="vec_id")
    p_sqa.add_argument("--vec-col", default="embedding")

    p_pqc = sub.add_parser(
        "pq-codes",
        help="persist the PQ index (frozen codebooks + 4-int/vector "
             "codes table) — ADC serving never rescans the corpus (X230)",
    )
    p_pqc.add_argument("out_dir")
    p_pqc.add_argument("src")
    p_pqc.add_argument("--id-col", default="vec_id")
    p_pqc.add_argument("--vec-col", default="embedding")

    p_pqa = sub.add_parser(
        "pq-codes-append",
        help="append a NEW-ids delta batch to a pq-codes index at "
             "O(delta) cost (frozen codebooks: codes' meaning never moves)",
    )
    p_pqa.add_argument("out_dir")
    p_pqa.add_argument("delta")
    p_pqa.add_argument("--id-col", default="vec_id")
    p_pqa.add_argument("--vec-col", default="embedding")

    p_qc = sub.add_parser(
        "ivfpq-codes",
        help="persist the IVF-PQ index (coarse centroids + frozen "
             "residual codebooks + cid-PARTITIONED 4-int codes) — the "
             "Faiss IVFADC layout; probes read only their cells (X231)",
    )
    p_qc.add_argument("out_dir")
    p_qc.add_argument("src")
    p_qc.add_argument("--id-col", default="vec_id")
    p_qc.add_argument("--vec-col", default="embedding")

    p_qa = sub.add_parser(
        "ivfpq-codes-append",
        help="append a NEW-ids delta to an ivfpq-codes index at "
             "O(delta) cost (frozen coarse+books: codes' meaning never "
             "moves)",
    )
    p_qa.add_argument("out_dir")
    p_qa.add_argument("delta")
    p_qa.add_argument("--id-col", default="vec_id")
    p_qa.add_argument("--vec-col", default="embedding")

    p_qx = sub.add_parser(
        "ivfpq-compact",
        help="rewrite fragmented ivfpq-codes cells — the X227 per-cell "
             "crash-safe swap on the cid-partitioned codes tree",
    )
    p_qx.add_argument("out_dir")
    p_qx.add_argument("--max-files-per-cell", type=int, default=1)

    p_cc = sub.add_parser(
        "codes-compact",
        help="compact a fragmented FLAT codes artifact dir (bq-codes / "
             "sq8-codes appends add one file per batch) to one "
             "vec_id-sorted file — crash-safe sibling-staged swap (X229)",
    )
    p_cc.add_argument("out_dir")
    p_cc.add_argument("--subdir", default="codes")
    p_cc.add_argument("--max-files", type=int, default=1)

    p_bq = sub.add_parser(
        "bq-codes",
        help="persist the packed 1-bit sign sketch (vec_id, b0, b1) "
             "as the standing BQ index — 8 bytes/vector (X218)",
    )
    p_bq.add_argument("out_dir")
    p_bq.add_argument("src")
    p_bq.add_argument("--id-col", default="vec_id")
    p_bq.add_argument("--vec-col", default="embedding")

    p_bqa = sub.add_parser(
        "bq-codes-append",
        help="append a NEW-ids delta batch to a bq-codes index at "
             "O(delta) cost (row-local pack: append == rebuild)",
    )
    p_bqa.add_argument("out_dir")
    p_bqa.add_argument("delta")
    p_bqa.add_argument("--id-col", default="vec_id")
    p_bqa.add_argument("--vec-col", default="embedding")

    args = ap.parse_args(argv)

    if args.cmd == "vacuum":  # pure driver-side FS walk, no Spark session
        from mimic2ts_spark.operators.versioned import vacuum

        t0 = time.time()
        audit = {"cmd": "vacuum", "base_dir": args.base_dir}
        audit.update(vacuum(args.base_dir, keep_versions=args.keep_versions))
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        return

    from mimic2ts_spark.operators.merge import (
        bucket_file_counts,
        compact_buckets,
        merge_upsert,
        write_base,
    )
    from mimic2ts_spark.session import get_spark, release_storage

    t0 = time.time()
    spark = get_spark("mimic2ts_spark_maintain")

    if args.cmd == "classifier-weights":
        # The stand-in derivation is shared with the apply path
        # (classifier_weight) so artifact-served and derived scores are
        # identical by construction; a trained model replaces this
        # table, same shape.
        from mimic2ts_spark.operators.text import CLS_DIM, build_classifier_weights

        dim = build_classifier_weights(spark, args.out_dir, args.dim or CLS_DIM)
        audit = {
            "cmd": "classifier-weights",
            "out_dir": args.out_dir,
            "dim": dim,
            "runtime_seconds": round(time.time() - t0, 3),
        }
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "cluster":
        # Exact-first build (r07): CC runs over CANONICAL near-dup pairs
        # and every doc takes its canonical's component. Labels are
        # IDENTICAL to the raw-pair form (identical text => identical
        # signature => same component; the component's min doc id is
        # the min over its canonicals, which are their exact groups'
        # minima) — pinned by test_maintain_cluster_artifact — but the
        # duplicate-heavy Θ(cluster²) pair blow-up never happens
        # (466 s -> ~30 s at the 100× dup-heavy sweep).
        from pyspark.sql import functions as F

        from mimic2ts_spark.operators.cluster import connected_components
        from mimic2ts_spark.operators.dedup import canonical_near_dup_pairs

        docs = spark.read.parquet(args.src)
        canon = (
            docs.groupBy(F.md5(F.col(args.text_col)).alias("_h"))
            .agg(F.min(args.id_col).alias("_cid"))
            .join(
                docs.select(args.id_col, F.md5(F.col(args.text_col)).alias("_h")),
                "_h",
            )
            .select(args.id_col, F.col("_cid").alias("_canon"))
        )
        pairs_c = canonical_near_dup_pairs(
            docs, text_col=args.text_col, id_col=args.id_col,
            threshold=args.threshold,
        )
        comp = connected_components(pairs_c)
        labels = (
            canon.join(
                comp.select(F.col("node").alias("_canon"), "comp"),
                "_canon",
                "left",
            )
            .select(
                args.id_col,
                F.coalesce(F.col("comp"), F.col("_canon")).alias("cluster_id"),
            )
        )
        labels.write.mode("overwrite").parquet(args.out_dir)
        # audit from the PERSISTED artifact (what a consumer will read)
        out = spark.read.parquet(args.out_dir)
        from pyspark.sql import functions as F

        stats = out.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        ).collect()[0]
        audit = {
            "cmd": "cluster", "out": args.out_dir,
            "threshold": args.threshold,
            "n_docs": stats["n_docs"],
            "n_clusters": stats["n_clusters"],
            "n_duplicates": stats["n_docs"] - stats["n_clusters"],
            "runtime_seconds": round(time.time() - t0, 3),
        }
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd in ("postings", "postings-append"):
        # BM25 inverted index as maintained table state: `postings`
        # builds the full (term, doc_id, tf, dl) index term-sorted (the
        # reader's In(term, ...) filter then skips whole rowgroups via
        # parquet min/max stats) plus additive {n_docs, sum_dl} stats;
        # `postings-append` appends a NEW-docs delta and adds its
        # counts — per-term df is recomputed from the postings at read
        # time, so appends need no df reconciliation. Single-writer
        # layout, like every artifact here.
        import os

        from mimic2ts_spark.operators.search import (
            build_positional_postings,
            build_postings,
            build_term_impacts,
            build_trigram_postings,
            corpus_stats,
        )

        stats_path = os.path.join(args.out_dir, "stats.json")
        data_dir = os.path.join(args.out_dir, "postings")
        pos_dir = os.path.join(args.out_dir, "positions")
        tri_dir = os.path.join(args.out_dir, "trigrams")
        par = spark.sparkContext.defaultParallelism

        def write_positions(src_df, mode):
            (
                build_positional_postings(
                    src_df, text_col=args.text_col, id_col=args.id_col
                )
                .repartition(par, "term")
                .sortWithinPartitions("term", "doc_id")
                .write.mode(mode)
                .parquet(pos_dir)
            )

        imp_dir = os.path.join(args.out_dir, "impacts")

        def write_impacts(cur_stats):
            # always a full overwrite from the CURRENT postings + stats:
            # u_max/df embed corpus-global scalars (single-writer layout)
            (
                build_term_impacts(spark.read.parquet(data_dir), cur_stats)
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(imp_dir)
            )

        def write_trigrams(src_df, mode):
            (
                build_trigram_postings(
                    src_df, text_col=args.text_col, id_col=args.id_col
                )
                .repartition(par, "gram")
                .sortWithinPartitions("gram", "doc_id")
                .write.mode(mode)
                .parquet(tri_dir)
            )
        if args.cmd == "postings":
            docs = spark.read.parquet(args.src)
            os.makedirs(args.out_dir, exist_ok=True)
            stats = corpus_stats(docs, text_col=args.text_col)
            (
                build_postings(docs, text_col=args.text_col, id_col=args.id_col)
                .repartition(par, "term")
                .sortWithinPartitions("term", "doc_id")
                .write.mode("overwrite")
                .parquet(data_dir)
            )
            with open(stats_path, "w") as f:
                json.dump(stats, f)
            audit = {"cmd": "postings", "out": args.out_dir, **stats,
                     "n_postings": spark.read.parquet(data_dir).count()}
            if args.positions:
                write_positions(docs, "overwrite")
                audit["n_positional"] = spark.read.parquet(pos_dir).count()
            if args.trigrams:
                write_trigrams(docs, "overwrite")
                audit["n_trigram"] = spark.read.parquet(tri_dir).count()
            if args.impacts:
                write_impacts(stats)
                audit["n_impact_terms"] = spark.read.parquet(imp_dir).count()
        else:
            delta = spark.read.parquet(args.delta)
            with open(stats_path) as f:
                stats = json.load(f)
            d_stats = corpus_stats(delta, text_col=args.text_col)
            (
                build_postings(delta, text_col=args.text_col, id_col=args.id_col)
                .repartition(par, "term")
                .sortWithinPartitions("term", "doc_id")
                .write.mode("append")
                .parquet(data_dir)
            )
            stats = {k: stats[k] + d_stats[k] for k in ("n_docs", "sum_dl")}
            with open(stats_path, "w") as f:
                json.dump(stats, f)
            audit = {"cmd": "postings-append", "out": args.out_dir,
                     "n_delta_docs": d_stats["n_docs"], **stats,
                     "n_postings": spark.read.parquet(data_dir).count()}
            if args.positions:
                write_positions(delta, "append")
                audit["n_positional"] = spark.read.parquet(pos_dir).count()
            if args.trigrams:
                write_trigrams(delta, "append")
                audit["n_trigram"] = spark.read.parquet(tri_dir).count()
            if args.impacts:
                write_impacts(stats)
                audit["n_impact_terms"] = spark.read.parquet(imp_dir).count()
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "cluster-append":
        # The full standing-corpus dedup ingest loop at delta cost:
        # (1) cross pairs from the persisted banding index (X172 — the
        # corpus is never re-hashed), (2) within-delta pairs on the
        # small batch, (3) O(delta) component merge on the labels table
        # (labels are a sufficient summary of the old graph —
        # operators/cluster.merge_labels), (4) the delta's bands append
        # to the index so the NEXT batch sees this one. The labels
        # rewrite is a full overwrite of a 2-int-per-doc table; at
        # lakehouse scale route it through the partition-pruned MERGE
        # (X124) keyed on the affected cluster_ids instead.
        from pyspark.sql import functions as F

        from mimic2ts_spark.operators.cluster import merge_labels
        from mimic2ts_spark.operators.dedup import (
            incremental_pairs_from_index,
            minhash_banded_rows,
            minhash_lsh_pairs,
        )

        import os

        bands_dir = args.index_dir.rstrip("/") + "/bands"
        exact_dir = args.index_dir.rstrip("/") + "/exact"
        delta = spark.read.parquet(args.delta)
        par = spark.sparkContext.defaultParallelism
        if os.path.isdir(exact_dir):
            # exact-first canonical layout (X176): copies attach by one
            # md5 join; only new-text batch canonicals touch the bands.
            from mimic2ts_spark.operators.dedup import canonical_delta_edges

            edges, new_canon_docs, new_exact_rows = canonical_delta_edges(
                spark, args.index_dir.rstrip("/"), delta,
                threshold=args.threshold,
                text_col=args.text_col, id_col=args.id_col,
            )
            new_canon_docs = new_canon_docs.localCheckpoint(eager=True)
            new_exact_rows = new_exact_rows.localCheckpoint(eager=True)
            # canonical_delta_edges normalizes to (doc_id, text)
            band_delta = new_canon_docs.withColumnRenamed(
                "doc_id", args.id_col
            ).withColumnRenamed("text", args.text_col)
        else:
            cross = incremental_pairs_from_index(
                spark, bands_dir, delta,
                threshold=args.threshold,
                text_col=args.text_col, id_col=args.id_col,
            ).select(
                F.col("doc_new").alias("doc_a"), F.col("doc_old").alias("doc_b")
            )
            # within-batch pairs on the RAW delta (legacy bands-only
            # layout): warn, don't raise — deltas are bounded batches,
            # and the exact-first layout above is the designed
            # dup-heavy path (X176)
            within = minhash_lsh_pairs(
                delta, text_col=args.text_col, id_col=args.id_col,
                threshold=args.threshold, on_duplicates="warn",
            ).select("doc_a", "doc_b")
            edges = cross.unionByName(within)
            band_delta = delta
            new_exact_rows = None
        labels = spark.read.parquet(args.labels_dir)
        new_labels = merge_labels(
            labels, edges,
            delta.select(args.id_col), id_col=args.id_col,
        ).localCheckpoint(eager=True)  # sever lineage from the table being overwritten
        new_labels.write.mode("overwrite").parquet(args.labels_dir)
        (
            minhash_banded_rows(band_delta, text_col=args.text_col, id_col=args.id_col)
            .repartition(par, "band", "key")
            .sortWithinPartitions("band", "key", "doc_id")
            .write.mode("append")
            .parquet(bands_dir)
        )
        if new_exact_rows is not None:
            new_exact_rows.write.mode("append").parquet(exact_dir)
        out = spark.read.parquet(args.labels_dir)
        stats = out.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("cluster_id").alias("n_clusters"),
        ).collect()[0]
        audit = {
            "cmd": "cluster-append", "labels": args.labels_dir,
            "index": args.index_dir, "n_delta_docs": delta.count(),
            "n_docs": stats["n_docs"], "n_clusters": stats["n_clusters"],
            "n_duplicates": stats["n_docs"] - stats["n_clusters"],
            "runtime_seconds": round(time.time() - t0, 3),
        }
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd in ("minhash-index", "minhash-index-append"):
        # The near-dup banding index as maintained table state: bands
        # are a pure per-doc function, so `minhash-index-append` is a
        # blind row append and incremental dedup of the NEXT batch never
        # re-scans or re-hashes the corpus — it joins the batch's bands
        # against this table (operators/dedup.incremental_pairs_from_index,
        # pinned bit-equal to the full-corpus cross pairs by pytest).
        # With --canonical (X176), only one row per DISTINCT text is
        # banded and byte-identical arrivals resolve through the exact
        # (text_md5, canon) map — exact-first applied to the artifact.
        import os

        from pyspark.sql import functions as F

        from mimic2ts_spark.operators.dedup import (
            canonical_docs,
            exact_text_map,
            minhash_banded_rows,
        )

        data_dir = os.path.join(args.out_dir, "bands")
        exact_dir = os.path.join(args.out_dir, "exact")
        src = args.src if args.cmd == "minhash-index" else args.delta
        df = spark.read.parquet(src)
        mode = "overwrite" if args.cmd == "minhash-index" else "append"
        if args.cmd == "minhash-index":
            os.makedirs(args.out_dir, exist_ok=True)
        par = spark.sparkContext.defaultParallelism
        if args.canonical and args.cmd == "minhash-index":
            band_src = canonical_docs(df, text_col=args.text_col, id_col=args.id_col)
            exact_text_map(df, text_col=args.text_col, id_col=args.id_col)\
                .write.mode("overwrite").parquet(exact_dir)
        elif args.canonical:
            exact = spark.read.parquet(exact_dir)
            d = df.withColumn("_h", F.md5(F.col(args.text_col)))
            new = d.join(
                exact.select(F.col("text_md5").alias("_h")), "_h", "left_anti"
            )
            new_map = new.groupBy(F.col("_h").alias("text_md5")).agg(
                F.min(args.id_col).alias("canon")
            )
            band_src = (
                new.join(
                    new_map.select(
                        F.col("text_md5").alias("_h"), F.col("canon").alias(args.id_col)
                    ),
                    ["_h", args.id_col],
                )
                .drop("_h")
                .localCheckpoint(eager=True)  # sever from exact_dir before its append
            )
            new_map.write.mode("append").parquet(exact_dir)
        else:
            band_src = df
        (
            minhash_banded_rows(band_src, text_col=args.text_col, id_col=args.id_col)
            .repartition(par, "band", "key")
            .sortWithinPartitions("band", "key", "doc_id")
            .write.mode(mode)
            .parquet(data_dir)
        )
        state = spark.read.parquet(data_dir)
        audit = {
            "cmd": args.cmd,
            "out": args.out_dir,
            "n_band_rows": state.count(),
            "n_docs": state.select("doc_id").distinct().count(),
            "runtime_seconds": round(time.time() - t0, 3),
        }
        if args.canonical:
            audit["n_distinct_texts"] = spark.read.parquet(exact_dir).count()
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd in ("ddq", "ddq-append"):
        # The quantile sketch is maintained table state in its purest
        # form: counters ADD, so `ddq-append` is a blind row append and
        # the merge (one sum per (group, bucket)) happens at read time —
        # no reconciliation, no retraining, and the artifact-served
        # report bit-equals the from-scratch sketch at any append state
        # (operators/sketch.ddq_from_artifact; pinned by pytest).
        import os

        from mimic2ts_spark.operators.sketch import ddq_counters

        data_dir = os.path.join(args.out_dir, "counters")
        src = args.src if args.cmd == "ddq" else args.delta
        df = spark.read.parquet(src)
        cents = f"CAST(round({args.value_col} * 100, 0) AS BIGINT)"
        mode = "overwrite" if args.cmd == "ddq" else "append"
        if args.cmd == "ddq":
            os.makedirs(args.out_dir, exist_ok=True)
        ddq_counters(df, [args.group_col], cents).write.mode(mode).parquet(data_dir)
        state = spark.read.parquet(data_dir)
        audit = {
            "cmd": args.cmd,
            "out": args.out_dir,
            "n_counter_rows": state.count(),
            "n_groups": state.select(args.group_col).distinct().count(),
            "runtime_seconds": round(time.time() - t0, 3),
        }
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd in ("knn-graph", "knn-graph-append"):
        from mimic2ts_spark.operators.knn import (
            append_knn_artifact,
            build_knn_artifact,
        )

        if args.cmd == "knn-graph":
            audit = {"cmd": "knn-graph", "out": args.out_dir}
            audit.update(
                build_knn_artifact(
                    spark, args.out_dir, spark.read.parquet(args.src),
                    id_col=args.id_col, vec_col=args.vec_col,
                )
            )
        else:
            audit = {"cmd": "knn-graph-append", "out": args.out_dir}
            audit.update(
                append_knn_artifact(
                    spark, args.out_dir, spark.read.parquet(args.delta),
                    id_col=args.id_col, vec_col=args.vec_col,
                )
            )
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd in ("ivf", "ivf-append"):
        # The IVF index is maintained table state: `ivf` trains the
        # coarse cells ONCE (sample-bounded) and persists cells JSON +
        # postings parquet; `ivf-append` grows it at delta cost — one
        # kernel assignment of the batch against the LOADED cells, an
        # append-only postings write, no retrain (the X146 contract,
        # now cross-run). Single-writer layout, like the versioned
        # tables (README contract).
        import os

        from mimic2ts_spark.operators.kmeans import (
            KM_ROUNDS,
            save_centroids,
            train_coarse,
        )
        from mimic2ts_spark.operators.similarity import (
            assign_vectors,
            derived_cells,
        )

        cents_path = os.path.join(args.out_dir, "centroids.json")
        postings_dir = os.path.join(args.out_dir, "postings")
        if args.cmd == "ivf":
            vecs = spark.read.parquet(args.src)
            n = vecs.count()
            cells = derived_cells(n)
            cents = train_coarse(
                vecs, cells, id_col=args.id_col, vec_col=args.vec_col, n=n
            )
            os.makedirs(args.out_dir, exist_ok=True)
            save_centroids(
                cents, cents_path,
                meta={"n_base": n, "n_cells": len(cents), "rounds": KM_ROUNDS,
                      "id_col": args.id_col, "vec_col": args.vec_col},
            )
            # cid-partitioned layout: serving probes push a static
            # In(cid, …) partition filter, so a query reads only its
            # nprobe cells' files (serve_ivf_artifact, plan-pinned)
            # repartition("cid") first (r14, guide §6): one file per
            # cell instead of one per (scan task, cell) — the fresh
            # build writes the layout ivf-compact would otherwise have
            # to restore (measured 1,010 files for 16 cells without it)
            # r15: postings carry the raw coordinates (IVF-Flat) — the
            # serve-time exact re-rank reads nvec from the probed cells
            # instead of key-joining the raw corpus per serve
            from pyspark.sql import functions as F

            assign_vectors(
                vecs, cents, id_col=args.id_col, vec_col=args.vec_col
            ).join(
                vecs.select(
                    F.col(args.id_col).alias("vec_id"),
                    F.col(args.vec_col).alias("vec"),
                ),
                "vec_id",
            ).repartition("cid").write.mode("overwrite").partitionBy(
                "cid"
            ).parquet(postings_dir)
            n_post = spark.read.parquet(postings_dir).count()
            # seed the incremental audit sidecar (ADVICE r12) so the
            # FIRST append already derives its total at delta cost
            from mimic2ts_spark.operators.similarity import (
                _write_postings_meta,
            )

            _write_postings_meta(
                os.path.join(args.out_dir, "_postings_meta.json"), n_post
            )
            audit = {
                "cmd": "ivf", "out": args.out_dir, "n_vectors": n,
                "n_cells": len(cents), "n_postings": n_post,
            }
        else:
            # shared append helper (X223): assignment against the loaded
            # cells, idempotent NEW-ids append under the cid-partitioned
            # layout — the streaming ingest routes through the same code
            from mimic2ts_spark.operators.similarity import (
                append_ivf_artifact,
            )

            audit = {"cmd": "ivf-append", "out": args.out_dir}
            audit.update(
                append_ivf_artifact(
                    spark, args.out_dir, spark.read.parquet(args.delta),
                    id_col=args.id_col, vec_col=args.vec_col,
                )
            )
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd in ("canon-postings", "canon-postings-append"):
        from mimic2ts_spark.operators.search import (
            append_canon_postings_artifact,
            build_canon_postings_artifact,
        )

        if args.cmd == "canon-postings":
            audit = {"cmd": "canon-postings", "out": args.out_dir}
            audit.update(
                build_canon_postings_artifact(
                    spark, args.out_dir, spark.read.parquet(args.src),
                    text_col=args.text_col, id_col=args.id_col,
                )
            )
        else:
            audit = {"cmd": "canon-postings-append", "out": args.out_dir}
            audit.update(
                append_canon_postings_artifact(
                    spark, args.out_dir, spark.read.parquet(args.delta),
                    text_col=args.text_col, id_col=args.id_col,
                )
            )
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "canon-postings-compact":
        from mimic2ts_spark.operators.pq import compact_codes_dir

        audit = {"cmd": "canon-postings-compact", "out": args.out_dir}
        for subdir, sort_cols in (
            ("postings", ("term", "doc_id")),
            ("doclens", ("doc",)),
            ("canon_map", ("text_md5",)),
        ):
            got = compact_codes_dir(
                spark, args.out_dir, subdir=subdir,
                max_files=args.max_files, sort_cols=sort_cols,
            )
            audit[subdir] = got
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "bpe":
        from mimic2ts_spark.operators.bpe import BPE_ROUNDS, save_merges, train_merges

        rounds = args.rounds if args.rounds is not None else BPE_ROUNDS
        docs = spark.read.parquet(args.src)
        rules = train_merges(docs, rounds=rounds, text_col=args.text_col)
        save_merges(rules, args.out_json)
        audit = {
            "cmd": "bpe", "out": args.out_json, "rounds": rounds,
            "n_merges": len(rules), "merges": [list(r) for r in rules],
            "runtime_seconds": round(time.time() - t0, 3),
        }
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "sq8-stats":
        from mimic2ts_spark.operators.pq import (
            _quant_base,
            save_sq8_stats,
            sq8_int_stats,
        )

        vecs = spark.read.parquet(args.src)
        stats = sq8_int_stats(_quant_base(vecs, args.id_col, args.vec_col))
        save_sq8_stats(stats, args.out_json)
        audit = {
            "cmd": "sq8-stats", "out": args.out_json,
            "n_vectors": vecs.count(), "n_dims": len(stats),
            "runtime_seconds": round(time.time() - t0, 3),
        }
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "ivf-compact":
        from mimic2ts_spark.operators.similarity import compact_ivf_artifact

        audit = {"cmd": "ivf-compact", "out": args.out_dir}
        audit.update(
            compact_ivf_artifact(
                spark, args.out_dir,
                max_files_per_cell=args.max_files_per_cell,
            )
        )
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "sq8-codes":
        from mimic2ts_spark.operators.pq import build_sq8_artifact

        vecs = spark.read.parquet(args.src)
        meta = build_sq8_artifact(
            spark, args.out_dir, vecs, id_col=args.id_col, vec_col=args.vec_col
        )
        audit = {"cmd": "sq8-codes", "out": args.out_dir}
        audit.update(meta)
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "sq8-codes-append":
        from mimic2ts_spark.operators.pq import append_sq8_artifact

        delta = spark.read.parquet(args.delta)
        audit = {"cmd": "sq8-codes-append", "out": args.out_dir}
        audit.update(
            append_sq8_artifact(
                spark, args.out_dir, delta,
                id_col=args.id_col, vec_col=args.vec_col,
            )
        )
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "pq-codes":
        from mimic2ts_spark.operators.pq import build_pq_artifact

        vecs = spark.read.parquet(args.src)
        meta = build_pq_artifact(
            spark, args.out_dir, vecs, id_col=args.id_col, vec_col=args.vec_col
        )
        audit = {"cmd": "pq-codes", "out": args.out_dir}
        audit.update(meta)
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "pq-codes-append":
        from mimic2ts_spark.operators.pq import append_pq_artifact

        delta = spark.read.parquet(args.delta)
        audit = {"cmd": "pq-codes-append", "out": args.out_dir}
        audit.update(
            append_pq_artifact(
                spark, args.out_dir, delta,
                id_col=args.id_col, vec_col=args.vec_col,
            )
        )
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "ivfpq-codes":
        from mimic2ts_spark.operators.pq import build_ivfpq_artifact

        vecs = spark.read.parquet(args.src)
        meta = build_ivfpq_artifact(
            spark, args.out_dir, vecs, id_col=args.id_col, vec_col=args.vec_col
        )
        audit = {"cmd": "ivfpq-codes", "out": args.out_dir}
        audit.update(meta)
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "ivfpq-codes-append":
        from mimic2ts_spark.operators.pq import append_ivfpq_artifact

        delta = spark.read.parquet(args.delta)
        audit = {"cmd": "ivfpq-codes-append", "out": args.out_dir}
        audit.update(
            append_ivfpq_artifact(
                spark, args.out_dir, delta,
                id_col=args.id_col, vec_col=args.vec_col,
            )
        )
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "ivfpq-compact":
        from mimic2ts_spark.operators.similarity import compact_ivf_artifact

        audit = {"cmd": "ivfpq-compact", "out": args.out_dir}
        audit.update(
            compact_ivf_artifact(
                spark, args.out_dir,
                max_files_per_cell=args.max_files_per_cell,
                subdir="codes",
            )
        )
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "codes-compact":
        from mimic2ts_spark.operators.pq import compact_codes_dir

        audit = {"cmd": "codes-compact", "out": args.out_dir}
        audit.update(
            compact_codes_dir(
                spark, args.out_dir, subdir=args.subdir,
                max_files=args.max_files,
            )
        )
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "bq-codes":
        from mimic2ts_spark.operators.pq import build_bq_artifact

        vecs = spark.read.parquet(args.src)
        meta = build_bq_artifact(
            spark, args.out_dir, vecs, id_col=args.id_col, vec_col=args.vec_col
        )
        audit = {"cmd": "bq-codes", "out": args.out_dir}
        audit.update(meta)
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "bq-codes-append":
        from mimic2ts_spark.operators.pq import append_bq_artifact

        delta = spark.read.parquet(args.delta)
        audit = {"cmd": "bq-codes-append", "out": args.out_dir}
        audit.update(
            append_bq_artifact(
                spark, args.out_dir, delta,
                id_col=args.id_col, vec_col=args.vec_col,
            )
        )
        audit["runtime_seconds"] = round(time.time() - t0, 3)
        print(json.dumps(audit))
        release_storage(spark)
        return

    if args.cmd == "codebook":
        from mimic2ts_spark.operators.pq import (
            PQ_K,
            PQ_M,
            save_codebooks,
            train_codebooks,
        )

        vecs = spark.read.parquet(args.src)
        books = train_codebooks(vecs, id_col=args.id_col, vec_col=args.vec_col)
        save_codebooks(books, args.out_json)
        audit = {
            "cmd": "codebook", "out": args.out_json,
            "n_vectors": vecs.count(), "m": PQ_M, "k": PQ_K,
            "entries": [len(b) for b in books],
            "runtime_seconds": round(time.time() - t0, 3),
        }
        print(json.dumps(audit))
        release_storage(spark)
        return

    audit: dict = {"cmd": args.cmd, "base_dir": args.base_dir}

    # merge/compact route by the layout on disk: a committed versioned
    # table carries a _latest pointer; merge.py's in-place layout does
    # not. init picks the layout (versioned unless --inplace).
    import os

    from mimic2ts_spark.operators import versioned as V

    is_versioned = os.path.exists(os.path.join(args.base_dir, "_latest"))

    def _versioned_audit(manifest: dict) -> dict:
        return {
            "backend": "versioned",
            "version": manifest["version"],
            "op": manifest["op"],
            "n_buckets": manifest["n_buckets"],
            "n_rows": sum(manifest["row_counts"].values()),
            "affected_buckets": manifest.get(
                "affected_buckets", sorted(manifest["buckets"], key=int)
            ),
        }

    if args.cmd == "init":
        df = spark.read.parquet(args.src)
        if args.inplace:
            write_base(df, args.base_dir, args.key, n_buckets=args.buckets)
            audit["backend"] = "inplace"
            audit["n_rows"] = spark.read.parquet(args.base_dir).count()
            audit["n_files"] = sum(bucket_file_counts(args.base_dir).values())
        else:
            audit.update(
                _versioned_audit(
                    V.init_table(df, args.base_dir, args.key, n_buckets=args.buckets)
                )
            )
    elif args.cmd == "merge":
        updates = spark.read.parquet(args.updates)
        if is_versioned:
            n_upd = updates.count()
            m = V.merge_versioned(spark, args.base_dir, updates, args.key)
            audit.update(_versioned_audit(m))
            audit["n_updates"] = n_upd
        else:
            audit["backend"] = "inplace"
            audit.update(
                merge_upsert(
                    spark, args.base_dir, updates, args.key, n_buckets=args.buckets
                )
            )
    else:  # compact
        if is_versioned:
            audit.update(_versioned_audit(V.compact_versioned(spark, args.base_dir)))
        else:
            audit["backend"] = "inplace"
            audit.update(
                compact_buckets(
                    spark, args.base_dir,
                    max_records_per_file=args.max_records_per_file,
                )
            )

    audit["runtime_seconds"] = round(time.time() - t0, 3)
    print(json.dumps(audit))
    release_storage(spark)


if __name__ == "__main__":
    main()

"""Corpus-build CLI: the end-to-end training-data cleaning pipeline as a
runnable tool —

    python -m mimic2ts_spark.corpus SRC_DIR DST_DIR \\
        [--quality-min 0.25] [--near-dup-threshold 0.8] [--no-span-dedup]

chaining the engine's operators in the order a production corpus build
runs them (cheap row-local filters first, corpus-wide passes on the
survivors):

  1. normalize      text.normalize_text (casefold/collapse/trim)
  2. quality gate   text.quality_score >= --quality-min
  3. exact dedup    keep the min doc_id per md5(text)
  4. near-dup       MinHash-LSH pairs -> connected components ->
                    keep the min doc_id per cluster
  5. span dedup     dedup.span_dedup — spans repeated across DISTINCT
                    surviving docs (boilerplate) removed, empty
                    survivors dropped
  6. split          deterministic md5 train/val/test (80/10/10)
  7. pack           (--pack N) GPT-style concat-then-chunk layout: per
                    split, each doc gets (shard, seq_idx, seq_offset)
                    for N-token sequences — the reproducible training
                    input layout (one shuffle per split on the shard
                    key; shard count is the parallelism dial)
  8. write          parquet partitioned by split under DST_DIR/corpus,
                    plus DST_DIR/manifest.json with per-stage counts,
                    per-split doc/token/sequence totals + config echo.

Stage ORDER is load-bearing (both misorders were caught by the stage
counts on the synthetic corpus): exact dedup must precede span dedup —
an exact-duplicate pair shares every span, so span-first guts BOTH
copies instead of keeping one canonical — and document-level fuzzy
dedup must precede span removal, which otherwise strips exactly the
shared content MinHash needs to see the near-duplication. This is the
RefinedWeb/Gopher ordering.

Every stage is the library operator the harness oracle-checks; the CLI
adds only orchestration. Determinism: the whole pipeline is a pure
function of the input bytes (md5 everywhere, no rand()), so re-runs
produce identical corpora — pinned by tests/test_corpus_cli.py.
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_corpus(
    spark: SparkSession,
    src_dir: str,
    quality_min: float = 0.25,
    near_dup_threshold: float = 0.8,
    span_dedup_on: bool = True,
) -> tuple[DataFrame, dict]:
    """Returns (final docs DataFrame with `split` column, stage-count
    manifest dict). Stage counts force one action per stage — the
    price of an auditable manifest; each stage's output is persisted so
    the count and the next stage share the computation."""
    from mimic2ts_spark.operators.cluster import canonical_ids
    from mimic2ts_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        span_dedup,
    )
    from mimic2ts_spark.operators.split import with_split
    from mimic2ts_spark.operators.spread import ensure_parallelism
    from mimic2ts_spark.operators.text import normalize_text, quality_score

    stages: dict[str, int] = {}

    docs = ensure_parallelism(
        spark.read.parquet(os.path.join(src_dir, "documents.parquet"))
    )
    stages["input"] = docs.count()

    normed = docs.select(
        "doc_id", "lang", "source", normalize_text(F.col("text")).alias("text")
    )

    quality = normed.where(quality_score(F.col("text")) >= quality_min).persist()
    stages["quality_pass"] = quality.count()

    exact = (
        exact_dedup(quality)
        .select(F.col("keep_id").alias("doc_id"))
        .join(quality, "doc_id")
        .persist()
    )
    stages["exact_dedup_pass"] = exact.count()

    # exact-deduped rows are distinct on the probe key — skip the guard
    pairs = minhash_lsh_pairs(
        exact, threshold=near_dup_threshold, on_duplicates="ignore"
    )
    clusters = canonical_ids(exact.select("doc_id"), pairs)
    keep = clusters.where(F.col("doc_id") == F.col("cluster_id")).select("doc_id")
    near = exact.join(keep, "doc_id").persist()
    stages["near_dedup_pass"] = near.count()

    if span_dedup_on:
        deduped = (
            span_dedup(near)
            .where(F.col("n_kept") > 0)
            .withColumnRenamed("clean_text", "text")
            .join(near.select("doc_id", "lang", "source"), "doc_id")
            .select("doc_id", "lang", "source", "text")
            .persist()
        )
        stages["span_dedup_pass"] = deduped.count()
    else:
        deduped = near.select("doc_id", "lang", "source", "text")
        stages["span_dedup_pass"] = stages["near_dedup_pass"]

    final = with_split(deduped, "doc_id")
    return final, stages


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(
        prog="python -m mimic2ts_spark.corpus", description=__doc__.split("\n")[0]
    )
    ap.add_argument("src", help="directory containing documents.parquet")
    ap.add_argument("dst", help="output directory (corpus/ + manifest.json)")
    ap.add_argument("--quality-min", type=float, default=0.25)
    ap.add_argument("--near-dup-threshold", type=float, default=0.8)
    ap.add_argument("--no-span-dedup", action="store_true")
    ap.add_argument(
        "--pack",
        type=int,
        default=0,
        metavar="N",
        help="emit GPT-style packing columns for N-token sequences",
    )
    args = ap.parse_args(argv)

    from mimic2ts_spark.session import get_spark

    t0 = time.time()
    spark = get_spark("mimic2ts_spark_corpus")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    final, stages = build_corpus(
        spark,
        args.src,
        quality_min=args.quality_min,
        near_dup_threshold=args.near_dup_threshold,
        span_dedup_on=not args.no_span_dedup,
    )

    from mimic2ts_spark.operators.text import bpe_ish_token_count

    if args.pack:
        from pyspark.sql import Window

        from mimic2ts_spark.operators.bpe import bpe_apply_doc_stats

        # Pack in TRAINED-BPE tokens (X118): the merge table trains on
        # the cleaned corpus itself, each doc's n_tokens is its
        # post-merge symbol count, and the sequence layout uses that SAME
        # unit the manifest totals report — so per (split, shard),
        # n_sequences == ceil(shard_tokens / N) EXACTLY (the r04 advice:
        # whitespace-unit packing next to a BPE-ish manifest count made
        # the reconciliation only approximate).
        tok = bpe_apply_doc_stats(final).select("doc_id", "n_tokens")
        shards = 16
        w = (
            Window.partitionBy("split", "shard")
            .orderBy("doc_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        final = (
            final.join(tok, "doc_id")
            .withColumn("shard", F.col("doc_id") % shards)
            .withColumn(
                "start", F.sum("n_tokens").over(w) - F.col("n_tokens")
            )
            .withColumn("seq_idx", F.expr(f"start DIV {args.pack}"))
            .withColumn("seq_offset", F.col("start") % args.pack)
            .drop("start")
        )

    out_dir = os.path.join(args.dst, "corpus")
    final.write.mode("overwrite").partitionBy("split").parquet(out_dir)

    from mimic2ts_spark.operators.text import token_count as _ws_token_count

    # Token units, both reported: n_tokens — in pack mode the TRAINED-BPE
    # count the sequence layout is built in (sum of the written per-doc
    # column, so totals and layout reconcile exactly); without --pack the
    # BPE-ish regex estimate — plus n_tokens_ws (whitespace) either way.
    written = spark.read.parquet(out_dir)
    n_tokens_agg = (
        F.sum("n_tokens") if args.pack
        else F.sum(bpe_ish_token_count(F.col("text")))
    )
    per_split = {
        r["split"]: {
            "n_docs": r["n_docs"],
            "n_tokens": r["n_tokens"],
            "n_tokens_ws": r["n_tokens_ws"],
        }
        for r in written.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            n_tokens_agg.alias("n_tokens"),
            F.sum(_ws_token_count(F.col("text"))).alias("n_tokens_ws"),
        )
        .collect()
    }
    if args.pack:
        # sequence index space is PER SHARD: total = Σ_shards
        # ceil(shard_tokens / N). ceil — NOT max(seq_idx)+1, which
        # undercounts when a shard's last doc spills across a sequence
        # boundary (seq_idx marks where a doc STARTS). Same unit as the
        # layout, so n_sequences reconciles with n_tokens exactly.
        seqs = (
            written.groupBy("split", "shard")
            .agg(
                F.ceil(F.sum("n_tokens") / F.lit(args.pack)).alias("s")
            )
            .groupBy("split")
            .agg(F.sum("s").alias("n_sequences"))
        )
        for r in seqs.collect():
            per_split[r["split"]]["n_sequences"] = r["n_sequences"]

    manifest = {
        "tool": "mimic2ts_spark.corpus",
        "config": {
            "quality_min": args.quality_min,
            "near_dup_threshold": args.near_dup_threshold,
            "span_dedup": not args.no_span_dedup,
            "pack": args.pack,
            "token_unit": "bpe_trained" if args.pack else "bpe_ish_estimate",
        },
        "stages": stages,
        "splits": per_split,
        "runtime_seconds": round(time.time() - t0, 3),
    }
    os.makedirs(args.dst, exist_ok=True)
    with open(os.path.join(args.dst, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
    print(json.dumps({k: v for k, v in manifest.items() if k != "config"}))

    from mimic2ts_spark.session import release_storage

    release_storage(spark)  # all stage persists are write-complete by here


if __name__ == "__main__":
    main()

"""Mechanical dup-heavy routing (VERDICT r09 #4): the raw pair/graph
APIs must REFUSE duplicate-heavy input (pointing at their exact-first
canonical compositions) instead of silently going quadratic — the X5
broadcast-budget-enforcement pattern applied to duplicate share. Each
raise is pinned on a constructed dup-heavy fixture; clean and tiny
inputs must never fire; the registered oracle-baseline paths warn."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic2ts_spark.operators.dupguard import (
    DUP_GUARD_DEGREE,
    DUP_GUARD_MIN_ROWS,
    DUP_GUARD_MOD,
    DuplicateHeavyInput,
)

N_DOCS = 8192  # 1/DUP_GUARD_MOD sample ≈ 512 ≥ DUP_GUARD_MIN_ROWS


def _dup_docs(spark, share_pct: int = 90):
    """N_DOCS rows, share_pct% byte-identical text (long enough to pass
    every shingle-length filter)."""
    return spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 100 < share_pct,
            F.lit("the same duplicated document text body here"),
        )
        .otherwise(F.concat(F.lit("unique document body number "), F.col("id")))
        .alias("text"),
    )


def _dup_vectors(spark, share_pct: int = 90):
    return spark.range(N_DOCS).select(
        F.col("id").alias("vec_id"),
        F.when(
            F.col("id") % 100 < share_pct,
            F.array(F.lit(0.25), F.lit(-0.125), F.lit(0.5), F.lit(0.0625)),
        )
        .otherwise(
            F.array(
                (F.col("id") % 97).cast("double") / 97.0,
                (F.col("id") % 89).cast("double") / 89.0,
                (F.col("id") % 83).cast("double") / 83.0,
                (F.col("id") % 79).cast("double") / 79.0,
            )
        )
        .alias("embedding"),
    )


def _clique_edges(spark, n: int = 1500):
    a = spark.range(n).select(F.col("id").alias("src"))
    b = spark.range(n).select(F.col("id").alias("dst"))
    return a.crossJoin(b).where(F.col("src") != F.col("dst"))


def test_containment_pairs_raises_on_dup_heavy(spark):
    from mimic2ts_spark.operators.dedup import containment_pairs

    with pytest.raises(DuplicateHeavyInput, match="canonical_containment"):
        containment_pairs(_dup_docs(spark))


def test_containment_pairs_warn_path_returns(spark):
    from mimic2ts_spark.operators.dedup import containment_pairs

    with pytest.warns(RuntimeWarning, match="exact-duplicate-heavy"):
        df = containment_pairs(_dup_docs(spark), on_duplicates="warn")
    assert "containment" in df.columns  # plan built, not raised


def test_containment_pairs_clean_corpus_passes(spark):
    from mimic2ts_spark.operators.dedup import containment_pairs

    df = containment_pairs(_dup_docs(spark, share_pct=0))
    assert "containment" in df.columns


def test_guard_never_fires_below_min_rows(spark):
    """Tiny corpora and unit fixtures must never fire, whatever their
    duplicate share (sampled rows < DUP_GUARD_MIN_ROWS)."""
    from mimic2ts_spark.operators.dedup import containment_pairs

    tiny = spark.range(DUP_GUARD_MIN_ROWS * DUP_GUARD_MOD // 4).select(
        F.col("id").alias("doc_id"),
        F.lit("the same duplicated document text body here").alias("text"),
    )
    df = containment_pairs(tiny)
    assert "containment" in df.columns


def test_knn_graph_raises_on_dup_heavy(spark):
    from mimic2ts_spark.operators.knn import knn_graph

    with pytest.raises(DuplicateHeavyInput, match="X199"):
        knn_graph(_dup_vectors(spark))


def test_embedding_lsh_raises_on_dup_heavy(spark):
    from mimic2ts_spark.operators.similarity import (
        embedding_near_dup_pairs_lsh,
    )

    with pytest.raises(DuplicateHeavyInput, match="X203"):
        embedding_near_dup_pairs_lsh(_dup_vectors(spark), threshold=0.9)


def test_label_propagation_raises_on_clique(spark):
    from mimic2ts_spark.operators.graph import label_propagation

    assert 1500 - 1 > DUP_GUARD_DEGREE
    with pytest.raises(DuplicateHeavyInput, match="X158"):
        label_propagation(_clique_edges(spark))


def test_label_propagation_sparse_graph_passes(spark):
    """A ring (degree 2) at the same node count never fires."""
    from mimic2ts_spark.operators.graph import label_propagation

    n = 60000
    ring = spark.range(n).select(
        F.col("id").alias("src"), ((F.col("id") + 1) % n).alias("dst")
    )
    df = label_propagation(ring, iters=1)
    assert set(df.columns) == {"node", "community"}


def test_minhash_pairs_raises_on_dup_heavy(spark):
    from mimic2ts_spark.operators.dedup import minhash_lsh_pairs

    with pytest.raises(DuplicateHeavyInput, match="canonical_near_dup_pairs"):
        minhash_lsh_pairs(_dup_docs(spark))


def test_ngram_pairs_raises_on_dup_heavy(spark):
    from mimic2ts_spark.operators.dedup import ngram_jaccard_pairs

    with pytest.raises(DuplicateHeavyInput, match="exact-first"):
        ngram_jaccard_pairs(_dup_docs(spark))


def test_simhash_pairs_raises_on_dup_heavy(spark):
    from mimic2ts_spark.operators.dedup import simhash_pairs

    with pytest.raises(DuplicateHeavyInput, match="canonical_docs"):
        simhash_pairs(_dup_docs(spark))


def test_minhash_pairs_warn_path_returns(spark):
    from mimic2ts_spark.operators.dedup import minhash_lsh_pairs

    with pytest.warns(RuntimeWarning, match="exact-duplicate-heavy"):
        df = minhash_lsh_pairs(_dup_docs(spark), on_duplicates="warn")
    assert "jaccard" in df.columns


def test_probe_memo_runs_one_job_per_corpus_api(spark):
    """The probe MEASUREMENT is memoized per (api, canonicalized plan):
    a second call on the same corpus must run ZERO probe jobs (the gate
    and bench best-of rounds pay the probe once per process — VERDICT
    r10 #3/#4), and the warn must still re-fire from the memo."""
    from mimic2ts_spark.operators import dupguard
    from mimic2ts_spark.operators.dedup import minhash_lsh_pairs

    docs = _dup_docs(spark, share_pct=80)
    before = dict(dupguard.PROBE_STATS)
    with pytest.warns(RuntimeWarning):
        minhash_lsh_pairs(docs, on_duplicates="warn")
    mid = dict(dupguard.PROBE_STATS)
    with pytest.warns(RuntimeWarning):
        minhash_lsh_pairs(docs, on_duplicates="warn")
    after = dict(dupguard.PROBE_STATS)
    assert mid["jobs"] - before["jobs"] <= 1  # 0 if an earlier test probed it
    assert after["jobs"] == mid["jobs"]  # second call: memo hit, no job
    assert after["hits"] == mid["hits"] + 1


def test_routing_count_memo_runs_one_job_per_plan(spark):
    """VERDICT r11 #3: serving calls deriving routing scalars from a
    corpus count (IVF cells, filtered-ANN selectivity, broadcast
    budget) share ONE slim count job per (plan, process) via
    dupguard.memoized_count — a second identical call runs ZERO count
    jobs, and distinct plans (a different allowed filter) still get
    their own measurement."""
    from mimic2ts_spark.operators import dupguard
    from mimic2ts_spark.operators.similarity import filtered_topk

    embs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    qs = embs.where(F.col("vec_id") < 2)
    allowed = embs.where(F.col("vec_id") % 16 == 1).select("vec_id")

    before = dict(dupguard.COUNT_STATS)
    filtered_topk(embs, qs, allowed, k=3, cache_key="sf0.001:memo_pin")
    mid = dict(dupguard.COUNT_STATS)
    # first call: ≤2 count jobs (corpus n + allowed n; 0/1 if an
    # earlier test already counted one of the plans)
    assert mid["jobs"] - before["jobs"] <= 2
    filtered_topk(embs, qs, allowed, k=3, cache_key="sf0.001:memo_pin")
    after = dict(dupguard.COUNT_STATS)
    assert after["jobs"] == mid["jobs"]  # second call: memo hits only
    assert after["hits"] >= mid["hits"] + 2

    # a DIFFERENT allowed plan must not share the selectivity scalar
    other = embs.where(F.col("vec_id") % 16 == 2).select("vec_id")
    filtered_topk(embs, qs, other, k=3, cache_key="sf0.001:memo_pin")
    assert dupguard.COUNT_STATS["jobs"] == after["jobs"] + 1


def test_refused_call_leaves_no_cached_blocks(spark):
    """A raise must unpersist the probe's just-persisted base (ADVICE
    r10): repeated refused calls in a long session must not accumulate
    storage until the next release_storage."""
    from mimic2ts_spark.operators.dedup import containment_pairs

    sc = spark.sparkContext
    jsc = sc._jsc.sc()
    before = jsc.getRDDStorageInfo()
    with pytest.raises(DuplicateHeavyInput):
        containment_pairs(_dup_docs(spark, share_pct=95))
    after = jsc.getRDDStorageInfo()
    assert len(after) <= len(before)


def test_canonical_compositions_skip_probe_and_run(spark):
    """The canonical forms run dup-guard-free on the SAME dup-heavy
    input the raw forms refuse (the routing the guard points at)."""
    from mimic2ts_spark.operators.dedup import canonical_containment_pairs

    df = canonical_containment_pairs(_dup_docs(spark))
    assert "containment" in df.columns

"""Tests for the training-data-pipeline operators (text / dedup /
similarity / multimodal / streaming) on the sf0.001 harness tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mimic2ts_spark.operators import dedup as D
from mimic2ts_spark.operators import similarity as S
from mimic2ts_spark.operators import text as X
from mimic2ts_spark.operators.multimodal import attach_binary, extract_features
from mimic2ts_spark.operators.text import MOD

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_token_count_matches_python(spark, docs):
    rows = docs.select("doc_id", "text", X.token_count(F.col("text")).alias("n")).take(20)
    for r in rows:
        assert r.n == len(r.text.split())


def test_quality_score_bounded(spark, docs):
    rows = docs.select(X.quality_score(F.col("text")).alias("q")).collect()
    assert all(0.0 <= r.q <= 1.0 for r in rows)


def test_fingerprint_deterministic_and_modular(spark, docs):
    a = docs.select("doc_id", X.fingerprint(F.col("text")).alias("fp"))
    b = docs.select("doc_id", X.fingerprint(F.col("text")).alias("fp"))
    assert a.collect() == b.collect()
    assert all(0 <= r.fp < MOD for r in a.collect())


def test_minhash_candidates_cover_true_pairs(spark, docs):
    """LSH candidates + verify must find the brute-force pairs (recall on
    the planted near-dups; the verify step guarantees precision)."""
    brute = {
        (r.doc_a, r.doc_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.8).collect()
    }
    lsh = {(r.doc_a, r.doc_b) for r in D.minhash_lsh_pairs(docs, threshold=0.8).collect()}
    assert lsh <= brute  # precision 1.0 by construction (exact verify)
    assert brute, "fixture should contain planted near-dup pairs"
    recall = len(lsh & brute) / len(brute)
    assert recall >= 0.9, f"LSH recall {recall}"


def test_simhash_flags_near_dups(spark, docs):
    near = D.ngram_jaccard_pairs(docs, threshold=0.9).collect()
    if not near:
        pytest.skip("no >=0.9 pairs in fixture")
    sim = {
        (r.doc_a, r.doc_b): r.hamming
        for r in D.simhash_pairs(docs, max_hamming=D.SIMHASH_BITS).collect()
    }
    for r in near:
        assert sim[(r.doc_a, r.doc_b)] <= 6, (r.doc_a, r.doc_b, sim[(r.doc_a, r.doc_b)])


def test_ann_lsh_recall_vs_bruteforce(spark, embs):
    queries = embs.where(F.col("vec_id") < 10)
    brute = S.brute_force_topk(embs, queries, k=5).collect()
    lsh = S.lsh_topk(embs, queries, k=5).collect()
    brute_sets = {}
    for r in brute:
        brute_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    lsh_sets = {}
    for r in lsh:
        lsh_sets.setdefault(r.query_id, set()).add(r.neighbor_id)
    # every query must get candidates, and aggregate recall must be useful
    assert set(lsh_sets) == set(brute_sets)
    hits = sum(len(lsh_sets[q] & brute_sets[q]) for q in brute_sets)
    total = sum(len(brute_sets[q]) for q in brute_sets)
    assert hits / total >= 0.3, f"ANN recall {hits}/{total}"


def test_cosine_matches_numpy(spark, embs):
    import numpy as np

    two = embs.where(F.col("vec_id").isin(0, 1)).collect()
    v0 = np.array(two[0].embedding, dtype=np.float64)
    v1 = np.array(two[1].embedding, dtype=np.float64)
    expected = float(v0 @ v1 / (np.sqrt(v0 @ v0) * np.sqrt(v1 @ v1)))
    got = (
        S.embedding_near_dup_pairs(embs.where(F.col("vec_id").isin(0, 1)), threshold=-1.0)
        .collect()[0]
        .cosine
    )
    assert abs(got - expected) < 1e-12


def test_multimodal_features(spark, docs):
    feats = extract_features(attach_binary(docs)).where(F.col("doc_id") == 0).collect()[0]
    text = docs.where(F.col("doc_id") == 0).collect()[0].text
    payload = text.encode("utf-8")
    assert feats.byte_len == len(payload)
    assert feats.checksum == sum(payload) % MOD
    assert len(feats.features) == 8
    assert feats.media_type == "image/png"


def test_stream_tumbling_equals_batch(spark):
    from mimic2ts_spark.streaming import run_tumbling_available_now

    out = run_tumbling_available_now(spark, SF)
    total_stream = out.agg(F.sum("n_events")).collect()[0][0]
    total_batch = spark.read.parquet(f"{SF}/events.parquet").count()
    assert total_stream == total_batch

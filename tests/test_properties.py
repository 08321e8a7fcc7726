"""Property-based tests (hypothesis): the bucketing/interval semantics
must hold for arbitrary inputs, not just the hand-built fixtures.

Strategy: generate small random event sets driver-side, run them through
the same operator compositions the pipelines use, and check the
reference's conservation laws plus the pinned Python-range semantics
(/root/reference/tests/test_EventsAggregator.py:109-202 re-expressed)."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from mimic2ts_spark.operators.dense import dense_reindex, zero_fill
from mimic2ts_spark.operators.intervals import interval_instants, spread_evenly
from mimic2ts_spark.operators.time_ops import bucket_index, clamp_floor

H = 3600

# hypothesis + a shared SparkSession: function-scoped fixture reuse is fine
_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    start=st.integers(min_value=0, max_value=10**7),
    dur=st.integers(min_value=0, max_value=10**6),
    step=st.sampled_from([1, 7, 60, 3600, 5400]),
)
@settings(**_SETTINGS)
def test_interval_instants_is_python_range(spark, start, dur, step):
    end = start + dur
    got = (
        spark.range(1)
        .select(
            interval_instants(
                F.lit(start).cast("long"), F.lit(end).cast("long"), step
            ).alias("xs")
        )
        .first()
        .xs
    )
    assert got == list(range(start, end + step, step))


@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=-2 * H, max_value=12 * H),  # event offset vs intime
            st.floats(min_value=-100, max_value=100, allow_nan=False),
        ),
        min_size=1,
        max_size=30,
    ),
    total_windows=st.integers(min_value=0, max_value=10),
)
@settings(**_SETTINGS)
def test_bucket_sum_conservation(spark, events, total_windows):
    """Sum over the dense zero-filled matrix == sum of raw values that
    survive the clamp/late-drop — for ANY event layout."""
    df = spark.createDataFrame(
        [(1, 9, int(e), float(v)) for e, v in events],
        "stay_id long, feature_id long, event_epoch long, value double",
    ).withColumn("total_windows", F.lit(total_windows).cast("long"))
    bucketed = df.withColumn(
        "tidx", clamp_floor(bucket_index(F.col("event_epoch"), F.lit(0), H))
    ).where(F.col("tidx") <= F.col("total_windows"))
    agg = bucketed.groupBy("stay_id", "feature_id", "total_windows", "tidx").agg(
        F.sum("value").alias("value")
    )
    dense = zero_fill(dense_reindex(agg))

    expected = sum(
        v
        for e, v in events
        if max(0, math.floor(e / H)) <= total_windows
    )
    rows = dense.collect()
    # width law: every bucket 0..total_windows exists exactly once (if any
    # event survived; otherwise the series is absent entirely)
    if rows:
        assert sorted(r.tidx for r in rows) == list(range(total_windows + 1))
        got = sum(r.value for r in rows)
        assert math.isclose(got, expected, rel_tol=1e-9, abs_tol=1e-6)
    else:
        assert expected == 0


@given(
    amount=st.floats(min_value=0.01, max_value=1000, allow_nan=False),
    dur=st.integers(min_value=0, max_value=10 * H),
)
@settings(**_SETTINGS)
def test_dose_spread_conserves_total(spark, amount, dur):
    """spread_evenly over interval instants sums back to the dose."""
    df = spark.range(1).select(
        F.lit(0).cast("long").alias("s"),
        F.lit(dur).cast("long").alias("e"),
        F.lit(float(amount)).alias("v"),
    )
    df = df.withColumn("instants", interval_instants(F.col("s"), F.col("e"), H))
    df = df.withColumn("part", spread_evenly(F.col("v"), F.col("instants")))
    out = df.select(F.explode("instants").alias("i"), "part")
    total = out.agg(F.sum("part")).first()[0]
    assert math.isclose(total, amount, rel_tol=1e-9)


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefg"), min_size=0, max_size=12
        ).map(lambda toks: " ".join(toks)),
        min_size=2,
        max_size=12,
    ),
    threshold=st.sampled_from([0.3, 0.5, 0.8, 0.95]),
)
@settings(**_SETTINGS)
def test_prefix_filter_jaccard_is_complete(spark, docs, threshold):
    """ngram_jaccard_pairs (AllPairs prefix filtering) must equal the
    naive all-pairs Jaccard — the prefix theorem admits no false
    negatives, the verify step no false positives. Tiny alphabet forces
    shingle collisions; duplicate and empty docs included."""
    from mimic2ts_spark.operators import dedup as D

    pdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in D.ngram_jaccard_pairs(pdf, threshold=threshold).collect()
    }
    codes = {
        r.doc_id: set(r.codes)
        for r in D.with_shingle_codes(pdf)
        .select("doc_id", "codes")
        .where(F.size("codes") > 0)
        .collect()
    }
    ids = sorted(codes)
    want = {}
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            inter = len(codes[a] & codes[b])
            union = len(codes[a] | codes[b])
            j = inter / union
            if j >= threshold:
                want[(a, b)] = j
    assert set(got) == set(want), (set(got) ^ set(want), docs)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


@given(
    corpus=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=12
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
)
@settings(**_SETTINGS)
def test_span_dedup_matches_python_reference(spark, corpus):
    """span_dedup == an independent Python reimplementation of the
    spec (cut to w-token windows, drop spans in >max_df docs, rebuild
    in order) over arbitrary tiny corpora with heavy span collisions
    (4-symbol alphabet forces them)."""
    from mimic2ts_spark.operators.dedup import SPAN_MAX_DF, SPAN_W, span_dedup

    def py_spans(text):
        toks = text.split()
        return [
            " ".join(toks[i : i + SPAN_W]) for i in range(0, len(toks), SPAN_W)
        ]

    df_counts: dict[str, set[int]] = {}
    for i, text in enumerate(corpus):
        for s in set(py_spans(text)):
            df_counts.setdefault(s, set()).add(i)
    hot = {s for s, d in df_counts.items() if len(d) > SPAN_MAX_DF}
    want = {}
    for i, text in enumerate(corpus):
        spans = py_spans(text)
        kept = [s for s in spans if s not in hot]
        want[i] = (" ".join(kept), len(kept), len(spans) - len(kept))

    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
        for r in span_dedup(df).collect()
    }
    assert got == want


@given(
    words=st.lists(
        st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=6).map("".join),
        min_size=1,
        max_size=10,
    ),
)
@settings(**_SETTINGS)
def test_bpe_round_matches_python_reference(spark, words):
    """One full BPE round (pair argmax + greedy merge over the corpus)
    == an independent Python implementation, over adversarial 2-symbol
    corpora (maximal overlap pressure: aaaa…, abab…)."""
    from collections import Counter

    from mimic2ts_spark.operators.bpe import (
        US,
        best_pair,
        merged_syms,
        word_symbol_counts,
    )

    text = " ".join(words)
    df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    wsc = word_symbol_counts(df)

    # python reference: weighted pair counts over distinct words
    wcnt = Counter(words)
    pc = Counter()
    for w, c in wcnt.items():
        for x, y in zip(w[:-1], w[1:]):
            pc[(x, y)] += c
    if not pc:
        return  # all words single-char: no pairs, nothing to assert
    # deterministic tie-break: count DESC then pair-key ASC
    cands = sorted(
        pc.items(), key=lambda kv: (-kv[1], kv[0][0] + US + kv[0][1])
    )
    a, b = cands[0][0]
    ga, gb, gtotal = best_pair(wsc)
    assert (ga, gb, gtotal) == (a, b, cands[0][1])

    got = {
        r["word"]: r["m"]
        for r in wsc.select(
            "word", merged_syms(F.col("syms"), ga, gb).alias("m")
        ).collect()
    }
    for w in wcnt:
        out, lm = [], False
        for s in w:
            if out and not lm and out[-1] == ga and s == gb:
                out[-1] = ga + gb
                lm = True
            else:
                out.append(s)
                lm = False
        assert got[w] == out, (w, ga, gb, got[w], out)


@given(
    edges=st.sets(
        st.tuples(
            st.integers(min_value=0, max_value=6),
            st.integers(min_value=0, max_value=6),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=15,
    ),
)
@settings(**_SETTINGS)
def test_pagerank_matches_python_reference(spark, edges):
    """Integer PageRank over arbitrary small digraphs == an independent
    Python implementation of the same scaled floor-div recurrence
    (dangling leak, damping 85/100, 3 rounds)."""
    from mimic2ts_spark.operators.graph import (
        PR_DAMP_DEN,
        PR_DAMP_NUM,
        PR_ITERS,
        PR_SCALE,
        pagerank_scaled,
    )

    edge_list = sorted(edges)
    nodes = sorted({n for e in edge_list for n in e})
    outdeg = {}
    for s, _ in edge_list:
        outdeg[s] = outdeg.get(s, 0) + 1
    base = (15 * PR_SCALE) // 100
    pr = {n: PR_SCALE for n in nodes}
    for _ in range(PR_ITERS):
        in_mass = {n: 0 for n in nodes}
        for s, d in edge_list:
            in_mass[d] += pr[s] // outdeg[s]
        pr = {n: base + (PR_DAMP_NUM * in_mass[n]) // PR_DAMP_DEN for n in nodes}

    df = spark.createDataFrame(edge_list, "src long, dst long")
    got = {r["node"]: r["pr_scaled"] for r in pagerank_scaled(df).collect()}
    assert got == pr


@given(
    base_keys=st.sets(st.integers(0, 40), min_size=3, max_size=20),
    upd_keys=st.sets(st.integers(0, 50), min_size=1, max_size=10),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_merge_upsert_matches_dict_reference(spark, tmp_path_factory, base_keys, upd_keys):
    """MERGE semantics against the obvious dict upsert: for ANY base/update
    key sets, the final table equals {**base, **updates} — updates win,
    new keys insert, untouched rows survive partition-selective rewrite."""
    import tempfile

    from mimic2ts_spark.operators.merge import merge_upsert, write_base

    base = spark.createDataFrame(
        [(k, f"base-{k}") for k in sorted(base_keys)], "doc_id long, text string"
    )
    updates = spark.createDataFrame(
        [(k, f"upd-{k}") for k in sorted(upd_keys)], "doc_id long, text string"
    )
    path = tempfile.mkdtemp(prefix="merge_prop_", dir=str(tmp_path_factory.mktemp("m")))
    write_base(base, path, "doc_id", n_buckets=4)
    merge_upsert(spark, path, updates, "doc_id", n_buckets=4)

    got = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(path).select("doc_id", "text").collect()
    }
    want = {k: f"base-{k}" for k in base_keys}
    want.update({k: f"upd-{k}" for k in upd_keys})
    assert got == want


@given(
    base_keys=st.sets(st.integers(0, 40), min_size=3, max_size=20),
    upd_keys=st.sets(st.integers(0, 50), min_size=1, max_size=10),
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_merge_versioned_matches_dict_reference(
    spark, tmp_path_factory, base_keys, upd_keys
):
    """The VERSIONED merge obeys the same dict-upsert law as the
    in-place one for ANY base/update key sets — and version 0 must
    still reconstruct the pristine base afterwards (the time-travel
    contract the in-place merge cannot offer)."""
    import tempfile

    from mimic2ts_spark.operators.versioned import (
        init_table,
        merge_versioned,
        read_table,
        table_count,
    )

    base = spark.createDataFrame(
        [(k, f"base-{k}") for k in sorted(base_keys)], "doc_id long, text string"
    )
    updates = spark.createDataFrame(
        [(k, f"upd-{k}") for k in sorted(upd_keys)], "doc_id long, text string"
    )
    path = tempfile.mkdtemp(prefix="vmerge_prop_", dir=str(tmp_path_factory.mktemp("v")))
    init_table(base, path, "doc_id", n_buckets=4)
    merge_versioned(spark, path, updates, "doc_id")

    got = {r["doc_id"]: r["text"] for r in read_table(spark, path).collect()}
    want = {k: f"base-{k}" for k in base_keys}
    want.update({k: f"upd-{k}" for k in upd_keys})
    assert got == want
    assert table_count(path) == len(want)  # manifest stats agree

    v0 = {r["doc_id"]: r["text"] for r in read_table(spark, path, version=0).collect()}
    assert v0 == {k: f"base-{k}" for k in base_keys}


@given(
    docs=st.lists(
        st.lists(
            st.text(alphabet="abc", min_size=1, max_size=5), min_size=1, max_size=6
        ),
        min_size=2,
        max_size=6,
    )
)
@settings(max_examples=6, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_bpe_apply_matches_python_reference(spark, docs):
    """Tokenizer application against an independent pure-Python BPE:
    train the same greedy rounds on the corpus word counts, apply the
    merges per word, and compare every doc's n_words/n_tokens."""
    from collections import Counter

    from mimic2ts_spark.operators.bpe import bpe_apply_doc_stats

    texts = [" ".join(words) for words in docs]

    # --- independent python reference ---------------------------------
    def py_merge(syms, a, b):
        out, last = [], False
        for s in syms:
            if out and not last and out[-1] == a and s == b:
                out[-1] = a + b
                last = True
            else:
                out.append(s)
                last = False
        return out

    wc = Counter(w for words in docs for w in words)
    vocab = {w: list(w) for w in wc}
    for _ in range(2):  # BPE_ROUNDS
        pairs = Counter()
        for w, syms in vocab.items():
            for x, y in zip(syms, syms[1:]):
                pairs[(x, y)] += wc[w]
        if not pairs:
            break
        # tie-break: count DESC then pair key ASC with the US separator
        (a, b), _n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0] + "\x1f" + kv[0][1])
        )
        vocab = {w: py_merge(s, a, b) for w, s in vocab.items()}
    want = {
        i: (len(words), sum(len(vocab[w]) for w in words))
        for i, words in enumerate(docs)
    }

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_tokens"])
        for r in bpe_apply_doc_stats(df).collect()
    }
    assert got == want


@given(
    docs=st.lists(
        st.lists(
            st.sampled_from("abcdefg"), min_size=0, max_size=12
        ).map(lambda toks: " ".join(toks)),
        min_size=2,
        max_size=10,
    ),
    threshold=st.sampled_from([0.5, 0.8, 0.9, 1.0]),
)
@settings(**_SETTINGS)
def test_containment_prefix_filter_is_complete(spark, docs, threshold):
    """containment_pairs (contained-side prefix + full index) must equal
    the naive all-ordered-pairs containment — the asymmetric prefix
    theorem admits no false negatives, the exact verify no false
    positives. Tiny alphabet forces collisions; duplicates (containment
    1.0 BOTH directions), subset docs, and empties included."""
    from mimic2ts_spark.operators import dedup as D

    pdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        (r.doc_a, r.doc_b): r.containment
        for r in D.containment_pairs(pdf, threshold=threshold).collect()
    }
    codes = {
        r.doc_id: set(r.codes)
        for r in D.with_shingle_codes(pdf)
        .select("doc_id", "codes")
        .where(F.size("codes") > 0)
        .collect()
    }
    want = {}
    for a in codes:
        for b in codes:
            if a == b:
                continue
            c = len(codes[a] & codes[b]) / len(codes[a])
            if c >= threshold:
                want[(a, b)] = c
    assert set(got) == set(want), (set(got) ^ set(want), docs)
    for k, v in want.items():
        assert abs(got[k] - v) < 1e-12


@given(v=st.integers(min_value=1, max_value=(1 << 62) - 2))
@settings(max_examples=300, deadline=None)
def test_ddq_bucket_bounds_and_monotone(v):
    """X165 bucket math holds for ARBITRARY positive int64, not just the
    panel: the value lies inside its decoded bucket, relative width is
    <= 1/16 outside the exact region, and ids are monotone (v -> v+1
    never decreases) — the property the quantile-crossing argument
    needs. Pure python mirror (engine equality is pinned separately on
    the boundary panel in test_extensions)."""
    from tests.test_extensions import _py_ddq_bounds, _py_ddq_bucket

    b = _py_ddq_bucket(v)
    lo, hi = _py_ddq_bounds(b)
    assert lo <= v <= hi
    if v >= 32:
        assert (hi - lo + 1) * 16 <= lo
    assert _py_ddq_bucket(v + 1) >= b


@given(
    texts=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=6
    ),
    needle=st.text(alphabet="ab ", min_size=1, max_size=4),
)
@settings(**_SETTINGS)
def test_substring_counts_match_python(spark, texts, needle):
    """X166 scan form == python str.count (non-overlapping) for
    arbitrary texts and needles over a tiny alphabet chosen to force
    self-overlapping matches ('aa' in 'aaa') and space-crossing
    needles — the replace-difference identity's hard cases."""
    from mimic2ts_spark.operators.search import substring_occurrences

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        (r.needle, r.doc_id): r.n_occurrences
        for r in substring_occurrences(docs, (needle,)).collect()
    }
    expect = {
        (needle, i): t.count(needle)
        for i, t in enumerate(texts)
        if t.count(needle) > 0
    }
    assert got == expect


@given(
    toks=st.lists(st.sampled_from("xyz"), min_size=0, max_size=20),
    phrase=st.lists(st.sampled_from("xyz"), min_size=1, max_size=3),
)
@settings(**_SETTINGS)
def test_phrase_occurrences_match_python(spark, toks, phrase):
    """X163 anchor intersection == the python sliding-window count
    (tokens[i:i+k] == phrase for every start i, overlaps included) for
    arbitrary token sequences over a 3-token vocabulary — duplicate
    terms inside the phrase and self-overlapping runs are the cases the
    count(DISTINCT idx) = k argument must survive."""
    from mimic2ts_spark.operators.search import phrase_occurrences

    text = " ".join(toks)
    p = " ".join(phrase)
    docs = spark.createDataFrame([(0, text)], "doc_id long, text string")
    got = {r.doc_id: r.n_occurrences for r in phrase_occurrences(docs, (p,)).collect()}
    k = len(phrase)
    expect = sum(1 for i in range(len(toks) - k + 1) if toks[i : i + k] == phrase)
    assert got.get(0, 0) == expect


def _py_tokens(text):
    import re as _re

    return _re.split(r"\s+", text)


def _py_code(tok):
    import hashlib

    from mimic2ts_spark.operators.text import MOD

    return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % MOD


def _py_shingle_codes(toks, n=3):
    from mimic2ts_spark.operators.text import MOD

    tc = [_py_code(t) for t in toks]
    out = []
    for i in range(max(0, len(tc) - n + 1)):
        k = tc[i]
        for r in range(1, n):
            k = (k * 131 + tc[i + r]) % MOD
        out.append(k)
    return out


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=30).map(
            lambda toks: " ".join(toks)
        ),
        min_size=1,
        max_size=8,
    ),
)
@settings(**_SETTINGS)
def test_cdc_chunks_match_python_reference(spark, docs):
    """X215 for arbitrary inputs: the content-defined chunks must tile
    each doc exactly and reproduce a pure-python replay of the boundary
    rule (gram code % 16 == 0 cuts after the gram) and chunk hashes —
    tiny alphabet forces boundary collisions; empty and sub-shingle
    docs included."""
    import hashlib

    from mimic2ts_spark.operators.dedup import CDC_MOD, SHINGLE_N, cdc_chunks

    pdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(tuple(r) for r in cdc_chunks(pdf).collect())
    want = []
    for i, t in enumerate(docs):
        toks = _py_tokens(t)
        sc = _py_shingle_codes(toks, SHINGLE_N)
        starts = [0] + [
            p + SHINGLE_N for p, c in enumerate(sc) if c % CDC_MOD == 0
        ]
        ends = starts[1:] + [len(toks)]
        idx = 0
        for s, e in zip(starts, ends):
            idx += 1
            if e > s:
                want.append(
                    (
                        i,
                        idx,
                        s,
                        e - s,
                        hashlib.md5(" ".join(toks[s:e]).encode()).hexdigest(),
                    )
                )
    assert got == sorted(want), (docs,)


@given(
    docs=st.lists(
        st.lists(st.sampled_from("abcdefg"), min_size=0, max_size=30).map(
            lambda toks: " ".join(toks)
        ),
        min_size=1,
        max_size=8,
    ),
)
@settings(**_SETTINGS)
def test_winnow_fingerprints_match_python_reference(spark, docs):
    """X216 for arbitrary inputs: the winnowed selection must equal a
    pure-python replay of the per-window (code, pos) tuple-min with the
    short-doc single-global-min branch — the tiny alphabet forces code
    ties, exercising the leftmost-position tie rule."""
    from mimic2ts_spark.operators.dedup import (
        SHINGLE_N,
        WINNOW_W,
        winnow_fingerprints,
    )

    pdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = sorted(tuple(r) for r in winnow_fingerprints(pdf).collect())
    want = set()
    for i, t in enumerate(docs):
        sc = _py_shingle_codes(_py_tokens(t), SHINGLE_N)
        structs = [(c, p) for p, c in enumerate(sc)]
        if not structs:
            continue
        if len(structs) >= WINNOW_W:
            for p in range(len(structs) - WINNOW_W + 1):
                c, q = min(structs[p : p + WINNOW_W])
                want.add((i, q, c))
        else:
            c, q = min(structs)
            want.add((i, q, c))
    assert got == sorted(want), (docs,)

"""End-to-end corpus-build CLI: stage monotonicity, the split
partitioning contract, and byte-level determinism across runs."""

from __future__ import annotations

import json
import subprocess
import sys


def _run(dst: str) -> dict:
    subprocess.run(
        [sys.executable, "-m", "mimic2ts_spark.corpus", "/root/testdata/sf0.001", dst],
        check=True,
        capture_output=True,
        cwd="/root/repo",
    )
    with open(f"{dst}/manifest.json") as f:
        return json.load(f)


def test_corpus_cli_stages_and_determinism(tmp_path):
    m1 = _run(str(tmp_path / "a"))
    s = m1["stages"]
    # monotone non-increasing through the funnel
    assert (
        s["input"]
        >= s["quality_pass"]
        >= s["exact_dedup_pass"]
        >= s["near_dedup_pass"]
        >= s["span_dedup_pass"]
        > 0
    )
    # split totals account for every surviving doc
    assert sum(v["n_docs"] for v in m1["splits"].values()) == s["span_dedup_pass"]
    assert set(m1["splits"]) <= {"train", "val", "test"}

    # pure function of the input: a second run reproduces stages+splits
    m2 = _run(str(tmp_path / "b"))
    assert m1["stages"] == m2["stages"]
    assert m1["splits"] == m2["splits"]


def test_corpus_cli_pack_layout(tmp_path):
    """--pack lays out sequences in TRAINED-BPE tokens — the same unit
    the manifest totals report — so the reconciliation is EXACT: every
    doc's (seq_idx, seq_offset) equals the per-shard doc_id-ordered
    running-total layout, the manifest's n_tokens equals the written
    per-doc sums, and n_sequences == Σ_shards ceil(shard_tokens / N)."""
    from collections import defaultdict

    import pyarrow.dataset as ds

    N = 256
    dst = str(tmp_path / "p")
    subprocess.run(
        [
            sys.executable, "-m", "mimic2ts_spark.corpus",
            "/root/testdata/sf0.001", dst, "--pack", str(N),
        ],
        check=True,
        capture_output=True,
        cwd="/root/repo",
    )
    with open(f"{dst}/manifest.json") as f:
        m = json.load(f)
    assert m["config"]["token_unit"] == "bpe_trained"
    rows = ds.dataset(f"{dst}/corpus", format="parquet", partitioning="hive").to_table(
        columns=["split", "shard", "doc_id", "seq_idx", "seq_offset", "n_tokens"]
    ).to_pydict()
    assert all(0 <= o < N for o in rows["seq_offset"])

    by_shard: dict = defaultdict(list)
    split_tokens: dict = defaultdict(int)
    for sp, sh, did, si, so, tok in zip(
        rows["split"], rows["shard"], rows["doc_id"], rows["seq_idx"],
        rows["seq_offset"], rows["n_tokens"],
    ):
        by_shard[(sp, sh)].append((did, si, so, tok))
        split_tokens[sp] += tok

    shard_tokens: dict = {}
    for key, docs in by_shard.items():
        cum = 0
        for _did, si, so, tok in sorted(docs):
            assert (si, so) == (cum // N, cum % N), (key, _did)
            cum += tok
        shard_tokens[key] = cum

    for split, v in m["splits"].items():
        assert v["n_tokens"] == split_tokens[split]
        assert v["n_sequences"] == sum(
            -(-t // N) for (sp, _), t in shard_tokens.items() if sp == split
        )

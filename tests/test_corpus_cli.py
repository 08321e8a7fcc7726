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
    """--pack emits per-shard (seq_idx, seq_offset) packing columns and
    the manifest's n_sequences accounts per-shard sequence spaces:
    each split needs at least ceil(tokens/N) sequences and every
    offset lies inside the budget."""
    import pyarrow.dataset as ds

    dst = str(tmp_path / "p")
    subprocess.run(
        [
            sys.executable, "-m", "mimic2ts_spark.corpus",
            "/root/testdata/sf0.001", dst, "--pack", "256",
        ],
        check=True,
        capture_output=True,
        cwd="/root/repo",
    )
    with open(f"{dst}/manifest.json") as f:
        m = json.load(f)
    rows = ds.dataset(f"{dst}/corpus", format="parquet", partitioning="hive").to_table(
        columns=["seq_offset", "n_tokens"]
    ).to_pydict()
    assert all(0 <= o < 256 for o in rows["seq_offset"])
    for split, v in m["splits"].items():
        # manifest n_tokens is the bpe-ish count (>= the whitespace count
        # packing uses), so only the upper bound is tokenization-safe:
        # at most one partial sequence per shard
        assert 1 <= v["n_sequences"] <= v["n_tokens"] // 256 + 16

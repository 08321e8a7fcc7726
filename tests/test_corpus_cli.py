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

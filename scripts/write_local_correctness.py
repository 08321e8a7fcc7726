"""Summarize a check_correctness sweep log into the committed
LOCAL_CORRECTNESS_r{N}.json artifact (the full-registry local gate of
record each round — VERDICT r12 #7 cadence).

Usage: python scripts/write_local_correctness.py SWEEP_LOG OUT_JSON [SF_DIR]
"""
import json
import re
import sys


def main() -> int:
    log_path, out_path = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01"
    queries, rows_only, failed = [], [], []
    total_sec = None
    for line in open(log_path):
        m = re.match(r"(PASS|ROWS|FAIL) (\w+)", line.strip())
        if m:
            status, name = m.groups()
            queries.append(name)
            if status == "ROWS":
                rows_only.append(name)
            elif status == "FAIL":
                failed.append(name)
        m = re.match(r"TOTAL: ([\d.]+)s for (\d+) queries", line.strip())
        if m:
            total_sec = float(m.group(1))
    doc = {
        "sf_dir": sf_dir,
        "n_queries": len(queries),
        "n_pass": len(queries) - len(failed),
        "n_fail": len(failed),
        "failed": failed,
        "rows_only": rows_only,
        "total_sec": total_sec,
        "queries": queries,
    }
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps({k: v for k, v in doc.items() if k != "queries"}))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())

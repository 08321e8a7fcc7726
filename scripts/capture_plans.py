"""Capture .explain('formatted') for registry queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> <query> [query...]

Writes plans/<tag>/<query>_<suffix>.txt with the formatted physical plan
(the judge checks plan claims in OPTIMIZATION_r*.md against these files).
Runs in its own Spark session; do NOT run concurrently with a bench.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimic2ts_spark import harness  # noqa: E402
from mimic2ts_spark.session import get_spark, release_storage  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("capture_plans")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        fn = harness.REGISTRY[name][0] if name in harness.REGISTRY else getattr(
            harness, name
        )
        df = fn(spark, sf_dir)
        txt = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(txt)
        print(f"wrote {path} ({len(txt)} bytes)")
        release_storage(spark)


if __name__ == "__main__":
    main()

"""Time a subset of registry queries with the bench methodology.

Usage: python scripts/ab_time.py <label> <query> [query...]

Warm-up at sf0.001 (JIT + codegen on the plan shapes), one storage flush,
then best-of-3 interleaved rounds at $SPARK_GRAFT_SF_DIR with the noop
sink — exactly bench.py's timed region. Prints one line per query:
  AB <label> <query> <best_sec>
Run alternating processes (new code, old code, new, old, ...) for an
interleaved same-day A/B; never compare against a different session's
numbers (CLAUDE.md r08/r12 drift lessons).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mimic2ts_spark import harness  # noqa: E402
from mimic2ts_spark.session import get_spark, release_storage  # noqa: E402


def main() -> None:
    label = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("ab_time")
    spark.conf.set("spark.sql.session.timeZone", "UTC")

    def fn_of(name):
        if name == "flagship_dense_matrix":
            return harness.flagship
        return harness.REGISTRY[name][0]

    for name in names:
        fn_of(name)(spark, "/root/testdata/sf0.001").write.format(
            "noop"
        ).mode("overwrite").save()
    release_storage(spark)

    best = {n: float("inf") for n in names}
    for _ in range(3):
        for name in names:
            t0 = time.time()
            fn_of(name)(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best[name] = min(best[name], time.time() - t0)
    for name in names:
        print(f"AB {label} {name} {best[name]:.3f}", flush=True)


if __name__ == "__main__":
    main()

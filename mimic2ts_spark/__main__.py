"""CLI parity with `python -m mimic2ts SRC DST ...`
(/root/reference/src/mimic2ts/__main__.py:8-91).

Usage:
    python -m mimic2ts_spark SRC DST [--exclude a,b] [--timestep N] [--ffill]
           [--stay-ids CSV] [--feature-ids CSV] [--max-partition-bytes N]

`--blocksize` from the reference maps to `--max-partition-bytes`
(spark.sql.files.maxPartitionBytes — the input-split knob).
"""

from __future__ import annotations

import argparse
import time

import pandas as pd

from mimic2ts_spark import EventsAggregator, __version__, get_spark
from mimic2ts_spark.sinks import write_manifest


def _read_id_list(path: str | None, col: str) -> list[int] | None:
    if not path:
        return None
    return pd.read_csv(path)[col].astype(int).to_list()


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(prog="mimic2ts_spark")
    p.add_argument("src", help="MIMIC root (contains icu/*.csv)")
    p.add_argument("dst", help="output directory")
    p.add_argument("--exclude", default="", help="comma list of sources to skip")
    p.add_argument("--timestep", type=int, default=3600)
    p.add_argument("--ffill", action="store_true")
    p.add_argument("--stay-ids", default=None, help="CSV with a stay_id column")
    p.add_argument("--feature-ids", default=None, help="CSV with a feature_id column")
    p.add_argument("--max-partition-bytes", type=int, default=None)
    args = p.parse_args(argv)

    excluded = {s.strip() for s in args.exclude.split(",") if s.strip()}
    extra = (
        {"spark.sql.files.maxPartitionBytes": str(args.max_partition_bytes)}
        if args.max_partition_bytes
        else None
    )
    spark = get_spark("mimic2ts_spark_cli", extra_conf=extra)

    t0 = time.time()
    EventsAggregator(
        spark,
        args.src,
        args.dst,
        stay_ids=_read_id_list(args.stay_ids, "stay_id"),
        feature_ids=_read_id_list(args.feature_ids, "feature_id"),
        timestep_seconds=args.timestep,
        ffill=args.ffill,
        chartevents="chartevents" not in excluded,
        inputevents="inputevents" not in excluded,
        outputevents="outputevents" not in excluded,
        procedureevents="procedureevents" not in excluded,
    ).do_agg()

    write_manifest(args.dst, __version__, time.time() - t0, vars(args))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Time every registry query at sf0.1 (one warm pass + one timed pass,
collect() per the bench methodology). Finds runtime outliers the static
plan audit cannot. Usage: python plans/r15/time_all.py [out.tsv]"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from clickhouse_hdfs_loader_spark.plans.queries import REGISTRY
from clickhouse_hdfs_loader_spark.session import get_spark


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/time_all.tsv"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-all")
    spark.sparkContext.setLogLevel("ERROR")
    REGISTRY["filtered_projection"].fn(spark, sf_dir).collect()
    with open(out_path, "w") as fh:
        for name, spec in REGISTRY.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            try:
                spec.fn(spark, sf_dir).collect()
                dt = time.perf_counter() - t0
                fh.write(f"{name}\t{dt:.3f}\n")
            except Exception as exc:  # noqa: BLE001
                fh.write(f"{name}\tERR {type(exc).__name__}: {exc}"[:200] + "\n")
            fh.flush()
    spark.stop()


if __name__ == "__main__":
    main()

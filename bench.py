#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Timing = full query execution through collect() — count() lets Catalyst
shortcut 1-row global aggregates (and with it the whole pipeline being
measured); every bench query returns a small-to-moderate result set, so
driver transfer is negligible.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from clickhouse_hdfs_loader_spark.plans.queries import REGISTRY
    from clickhouse_hdfs_loader_spark.session import get_spark

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    bench_specs = [s for s in REGISTRY.values() if s.bench]
    # warm the JVM + file listing once so per-query numbers measure the
    # queries, not session startup
    REGISTRY["filtered_projection"].fn(spark, sf_dir).collect()
    # warm the Python UDF worker pool (process fork + pandas/numpy import)
    # so pandas-UDF queries measure steady-state, not one-time worker spawn
    from pyspark.sql import functions as F

    from clickhouse_hdfs_loader_spark.functions.text import shingles_udf
    (spark.range(2048)
     .select(F.concat(F.lit("warm up worker pool token "),
                      F.col("id").cast("string")).alias("t"))
     .select(F.explode(shingles_udf(3)(F.col("t")))).count())
    # warm the Guava-parity routing UDF too (numpy/murmur_np import in all
    # 32 workers): without this the FIRST timed loader_throughput run pays
    # the import storm and the driver's single bench pass records 2-3×
    # phantom swings on the headline loader metric (r5: 4.65 s recorded
    # vs 1.9 s steady-state)
    from clickhouse_hdfs_loader_spark.operators.sharding import (
        ClusterTopology, ShardNode, assign_shard)
    topo = ClusterTopology([ShardNode(1, 1), ShardNode(2, 1)])
    (assign_shard(spark.range(2048).repartition(32)
                  .select(F.col("id").cast("string").alias("k")),
                  "k", topo).collect())

    # Per-query isolation: one failing query must never cost the whole perf
    # signal — failures are recorded as {"err": ...} and the JSON line is
    # always printed. Each query is timed N times (median reported) with a
    # FRESH DataFrame per run — re-collecting the same DataFrame object
    # reuses shuffle outputs and reads absurdly fast.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))
    timings: dict[str, object] = {}
    errors = 0
    for spec in bench_specs:
        # the two loader queries are the headline metric AND the noisiest
        # (Python worker scheduling jitter): give their median 5 samples
        # so one bad run can't fake a 2-3x regression (r5 driver recorded
        # 4.65 s on a 1.9 s steady-state plan)
        n_runs = max(runs, 5) if spec.name.startswith("loader_throughput") else runs
        samples: list[float] = []
        try:
            for _ in range(n_runs):
                t0 = time.perf_counter()
                spec.fn(spark, sf_dir).collect()
                samples.append(time.perf_counter() - t0)
            samples.sort()
            timings[spec.name] = round(samples[len(samples) // 2], 3)
        except Exception as exc:  # noqa: BLE001 — survive any query failure
            errors += 1
            timings[spec.name] = {"err": f"{type(exc).__name__}: {exc}"[:300]}

    total = round(sum(v for v in timings.values() if isinstance(v, float)), 3)
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        out["errors"] = errors
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())

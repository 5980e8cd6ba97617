#!/usr/bin/env python
"""Static plan audit over the whole registry: for every query, count
plan-shape signals (scans per input file, exchanges, Python boundaries,
join strategies). Flags multi-scan subtree duplication — the r7 bloom /
r15 ngram class. Driver-side only (no execution)."""

from __future__ import annotations

import os
import re
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from clickhouse_hdfs_loader_spark.plans.queries import REGISTRY
from clickhouse_hdfs_loader_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="plan-audit")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []
    for name, spec in REGISTRY.items():
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted")
        except Exception as exc:  # noqa: BLE001
            rows.append((name, f"ERR {type(exc).__name__}: {exc}"[:120]))
            continue
        # operator-list section only (before the numbered details)
        head = plan.split("\n\n")[0]
        scans = Counter(re.findall(r"file:\S*?/(\w+)\.parquet", plan))
        n_ex = len(re.findall(r"\bExchange\b", head))
        n_bex = len(re.findall(r"BroadcastExchange", head))
        py = len(re.findall(r"ArrowEvalPython|BatchEvalPython", head))
        mip = len(re.findall(r"MapInPandas|FlatMapGroupsInPandas|MapInArrow", head))
        smj = len(re.findall(r"SortMergeJoin", head))
        bnl = len(re.findall(r"BroadcastNestedLoopJoin", head))
        cart = len(re.findall(r"CartesianProduct", head))
        flags = []
        multi = {f: c for f, c in scans.items() if c > 1}
        if multi:
            flags.append("MULTISCAN:" + ",".join(f"{f}x{c}" for f, c in sorted(multi.items())))
        if py > 1:
            flags.append(f"PYx{py}")
        if smj:
            flags.append(f"SMJx{smj}")
        if bnl:
            flags.append(f"BNLx{bnl}")
        if cart:
            flags.append(f"CARTx{cart}")
        rows.append((name, f"ex={n_ex - n_bex} bex={n_bex} py={py} mip={mip} "
                     f"scans={sum(scans.values())} {' '.join(flags)}"))
    for name, info in rows:
        print(f"{name:42s} {info}")
    spark.stop()


if __name__ == "__main__":
    main()

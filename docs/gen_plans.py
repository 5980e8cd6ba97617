#!/usr/bin/env python
"""Regenerate docs/PLANS.md: formatted physical plans + scan summaries of
the headline queries at sf0.1 — the evidence artifact for the scale
posture in README (pushdown, pruning, join strategy, codegen)."""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clickhouse_hdfs_loader_spark.plans.queries import REGISTRY
from clickhouse_hdfs_loader_spark.session import get_spark

PICKS = ["transform_chain", "q1_pricing_summary", "q5_region_revenue",
         "dedup_ngram_jaccard", "dedup_minhash_lsh", "similarity_topk",
         "asof_join_events", "sessionize", "pii_scrub", "embedding_quantize",
         "q4_order_priority", "q21_waiting_supplier", "q15_top_supplier",
         "q6_forecast_revenue", "q8_market_share", "q17_small_quantity",
         "q2_min_cost_supplier", "q9_product_profit", "q20_potential_promotion",
         "events_sliding_windows", "full_outer_reconcile",
         "passage_dedup_spans", "semantic_dedup", "tf_idf_topk",
         "quality_expectations",
         # new in r7
         "cdc_apply", "merge_upsert", "pivot_wide", "ohlc_resample",
         "histogram_fixed", "funnel", "funnel_conversion_window",
         "retention_cohorts", "anomaly_zscore", "bigram_likelihood"]


def main() -> None:
    spark = get_spark(app_name="plandoc")
    spark.sparkContext.setLogLevel("ERROR")
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode

    out = ["# Physical plan audit (generated from live session at sf0.1)", "",
           "Evidence for the scale posture claimed in README: pushed filters,",
           "pruned read schemas, broadcast vs shuffle join choices, and",
           "whole-stage-codegen coverage of the headline queries. Regenerate with",
           "`python docs/gen_plans.py`.", ""]
    for name in PICKS:
        df = REGISTRY[name].fn(spark, sf)
        qe = df._jdf.queryExecution()
        plan = qe.explainString(mode.fromString("simple"))
        lines = [line[:160] for line in plan.splitlines() if line.strip()]
        out += [f"## {name}", "", "```", *lines[:40], "```", ""]
        fm = qe.explainString(mode.fromString("formatted"))
        pushed = re.findall(r"PushedFilters: \[[^\]]*\]", fm)
        schemas = re.findall(r"ReadSchema: [^\n]*", fm)
        if pushed or schemas:
            out.append("Scan summary:")
            out += [f"- `{p[:150]}`" for p in pushed]
            out += [f"- `{s[:150]}`" for s in schemas]
            out.append("")
    path = os.path.join(os.path.dirname(__file__), "PLANS.md")
    with open(path, "w") as f:
        f.write("\n".join(out))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()

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


def _operator_picks(spark, sf):
    """Operators that live outside the query registry (the late-r7
    additions and everything after) — built directly so their plans
    land in the audit too."""
    from pyspark.sql import functions as F

    from clickhouse_hdfs_loader_spark.operators.analytics import (
        bounding_ratio, delta_sum, entropy_by_group, event_transitions,
        exact_weighted_quantiles_by_group, key_skew_report,
        linreg_by_group, retention_flags, sequence_count,
        sequence_next_node, window_funnel_strict_order,
        winsorize_by_group)
    from clickhouse_hdfs_loader_spark.operators.downsample import (
        lttb_downsample)
    from clickhouse_hdfs_loader_spark.operators.features import (
        covariance_stats, minmax_normalize)
    from clickhouse_hdfs_loader_spark.operators.intervals import (
        interval_length_sum, max_intersections)
    from clickhouse_hdfs_loader_spark.operators.linkage import fuzzy_join
    from clickhouse_hdfs_loader_spark.operators.prune import bloom_semi_join
    from clickhouse_hdfs_loader_spark.operators.retrieval import (
        bm25_topk, ranking_metrics)
    from clickhouse_hdfs_loader_spark.operators.stats import (
        anova_f, arg_min_max_by_group, avg_weighted, categorical_iv,
        cramers_v, cramers_v_bias_corrected,
        exponential_moving_average, group_array_sorted,
        group_array_intersect, group_bit_aggregate, kendall_tau,
        ks_test, mann_kendall_trend, mann_whitney_u, map_aggregate,
        mean_z_test, mutual_information, pearson_corr, rank_corr,
        rrf_fuse, skew_kurt, student_ttest, theils_u, welch_ttest)
    from clickhouse_hdfs_loader_spark.operators.dispersion import (
        benford_deviation, gini_coefficient, mad_outliers, psi_drift,
        robust_scale, simpson_diversity, trimmed_mean)
    from clickhouse_hdfs_loader_spark.operators.corpus import (
        pmi_collocations, zipf_fit)
    from clickhouse_hdfs_loader_spark.operators.analytics import (
        cohort_overlap, cusum_changepoint, group_array_moving_avg,
        histogram_adaptive, histogram_equi_depth, kaplan_meier,
        quantile_timing, quantile_timing_weighted, quantile_update,
        quantiles_from_state, runs_test, seasonal_decompose,
        sequence_match_events, sequence_match_multi,
        sequence_match_timed)
    from clickhouse_hdfs_loader_spark.operators.stats import (
        autocorr_lag, brown_forsythe, cohens_d,
        exponential_time_decayed, linear_trend, series_period_detect,
        two_proportion_z)
    from clickhouse_hdfs_loader_spark.operators.dispersion import (
        tukey_outliers)
    from clickhouse_hdfs_loader_spark.operators.features import (
        corr_matrix, feature_hashing, isotonic_fit)
    from clickhouse_hdfs_loader_spark.sources.tables import read_table

    docs = read_table(spark, sf, "documents")
    ev = read_table(spark, sf, "events")
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    cust = (spark.read.parquet(f"{sf}/customer.parquet")
            .where(F.col("c_nationkey") == 7)
            .select(F.col("c_custkey").alias("o_custkey")))
    qs = spark.createDataFrame([(1, "vector hash join")],
                               "query_id long, query_text string")
    right = docs.select((F.col("doc_id") + 100000).alias("doc_id"),
                        F.concat("text", F.lit(" z")).alias("text"))
    sec = F.unix_timestamp("ts")
    iv = (ev.where(F.col("ts").isNotNull() & F.col("value").isNotNull())
          .select(F.col("event_type").alias("g"),
                  F.col("event_id").alias("id"), sec.alias("s"),
                  (sec + F.floor(F.col("value") * 10).cast("long"))
                  .alias("e")))
    sided = (ev.where(F.col("user_id").isNotNull())
             .withColumn("side", F.pmod(F.col("user_id"), F.lit(2))))
    from clickhouse_hdfs_loader_spark.operators.analytics import (
        _quantizable_col)
    binned = (ev.where(F.col("user_id").isNotNull()
                       & _quantizable_col("value"))
              .withColumn("xbin",
                          F.pmod(F.floor(F.col("value")).cast("long"),
                                 F.lit(7)))
              .withColumn("ybin", F.pmod(F.col("user_id"), F.lit(5))))
    from pyspark.sql import Window
    rankings = (docs.withColumn("q", F.pmod(F.col("doc_id"), F.lit(3)))
                .withColumn("rank", F.row_number().over(
                    Window.partitionBy("q").orderBy("doc_id"))
                    .cast("int"))
                .where(F.col("rank") <= 15)
                .select("q", "doc_id", "rank"))
    nested = (binned.groupBy(F.pmod(F.col("user_id"), F.lit(10))
                             .alias("grp"), "user_id")
              .agg(F.sort_array(F.collect_list(F.struct(
                  "ts", "event_id", "event_type", "value"))).alias("_s"))
              .select("grp",
                      F.expr("transform(_s, x -> x.event_type)")
                      .alias("ks"),
                      F.expr("transform(_s, x -> x.value)").alias("vs")))
    return {
        "bm25_topk": bm25_topk(docs, qs),
        "bloom_semi_join": bloom_semi_join(orders, cust, "o_custkey"),
        "event_transitions": event_transitions(ev),
        "winsorize_by_group": winsorize_by_group(ev, "event_type", "value"),
        "linreg_by_group": linreg_by_group(ev),
        "key_skew_report": key_skew_report(ev, "user_id"),
        "minmax_normalize": minmax_normalize(emb),
        "fuzzy_join": fuzzy_join(docs, right),
        "fuzzy_join_exact": fuzzy_join(docs, right, exhaustive=True),
        "exact_weighted_quantiles": exact_weighted_quantiles_by_group(
            ev.withColumn("wt", F.pmod(F.col("event_id"), F.lit(5)) + 1),
            "event_type", "value", "wt"),
        "sequence_count": sequence_count(ev, ["view", "click", "purchase"]),
        "retention_flags": retention_flags(ev, ["view", "click",
                                                "purchase"]),
        "interval_length_sum": interval_length_sum(iv, "g", "s", "e",
                                                   id_col="id"),
        "max_intersections": max_intersections(iv, "g", "s", "e"),
        "delta_sum": delta_sum(ev),
        "quantile_timing": quantile_timing(ev),
        "quantile_timing_weighted": quantile_timing_weighted(
            ev.where(F.col("event_id").isNotNull())
            .withColumn("wt", F.pmod(F.col("event_id"), F.lit(5)) + 1)),
        "group_array_moving_avg": group_array_moving_avg(ev, n=5),
        "sequence_match_timed": sequence_match_timed(
            ev, ["view", "click", "purchase"], [21600, 86400]),
        "tukey_outliers": tukey_outliers(ev, "event_type", "value"),
        "brown_forsythe": brown_forsythe(
            ev.where(F.col("user_id").isNotNull())
            .withColumn("cls", F.pmod(F.col("user_id"), F.lit(3))),
            "event_type", "value", "cls"),
        "autocorr_lag": autocorr_lag(ev, lags=(1, 2)),
        "series_period_detect": series_period_detect(ev, max_lag=8),
        "seasonal_decompose": seasonal_decompose(ev, 7),
        "two_proportion_z": two_proportion_z(
            ev.where(F.col("user_id").isNotNull()
                     & F.col("event_id").isNotNull())
            .withColumn("side", F.pmod(F.col("user_id"), F.lit(2)))
            .withColumn("flag", F.pmod(F.col("event_id"), F.lit(2))),
            "event_type", "side", "flag"),
        # heavy_hitters_decayed is NOT plan-audited: the two-pass MG
        # collects candidates eagerly during construction (the
        # pagerank/pca_whiten posture below), so its "plan" would be a
        # local-result scan; the decay projection itself is a
        # stateless expression over the audited weighted-MG pipeline
        "sequence_match_multi": sequence_match_multi(
            ev, {"v_c_p": ["view", "click", "purchase"],
                 "p_v": ["purchase", "view"]}),
        "bounding_ratio": bounding_ratio(ev),
        "sequence_next_node": sequence_next_node(ev, ["view", "click"]),
        "window_funnel_strict_order": window_funnel_strict_order(
            ev, ["view", "click", "purchase"], within_hours=24),
        "entropy_by_group": entropy_by_group(ev),
        "group_array_sorted": group_array_sorted(
            ev, "event_type", "value", n=5),
        "arg_min_max_by_group": arg_min_max_by_group(
            ev, "event_type", "user_id", "value", "event_id"),
        "mann_whitney_u": mann_whitney_u(sided, "event_type", "value",
                                         "side"),
        "welch_ttest": welch_ttest(sided, "event_type", "value", "side"),
        "ks_test": ks_test(sided, "event_type", "value", "side"),
        "theils_u": theils_u(binned, "event_type", "xbin", "ybin"),
        "mutual_information": mutual_information(
            binned, "event_type", "xbin", "ybin"),
        "kendall_tau": kendall_tau(ev, "event_type", "value",
                                   "user_id"),
        "simpson_diversity": simpson_diversity(
            ev, "event_type", "user_id"),
        "zipf_fit": zipf_fit(ev, "event_type", "user_id"),
        "pmi_collocations": pmi_collocations(docs, min_count=5, k=15),
        "histogram_equi_depth": histogram_equi_depth(
            ev, "event_type", "value", buckets=7),
        "cusum_changepoint": cusum_changepoint(ev),
        "group_array_intersect": group_array_intersect(
            binned.groupBy("event_type", "user_id")
            .agg(F.sort_array(F.collect_set("xbin")).alias("arr")),
            "event_type", "arr"),
        "benford_deviation": benford_deviation(ev, "event_type",
                                               "value"),
        "trimmed_mean": trimmed_mean(ev, "event_type", "value"),
        "robust_scale": robust_scale(ev, "event_type", "value"),
        "feature_hashing": feature_hashing(docs, dims=64),
        "psi_drift": psi_drift(
            binned.withColumn("s", F.pmod(F.col("event_id"),
                                          F.lit(2))),
            "event_type", "xbin", "s"),
        "quantiles_from_state": quantiles_from_state(
            quantile_update(None, ev)),
        "isotonic_fit": isotonic_fit(ev, "event_type", "user_id",
                                     "value"),
        "mann_kendall_trend": mann_kendall_trend(ev),
        "histogram_adaptive": histogram_adaptive(
            ev, "event_type", "value", bins=8),
        "runs_test": runs_test(ev),
        "kaplan_meier": kaplan_meier(
            binned.groupBy("event_type", "user_id")
            .agg((F.unix_seconds(F.max("ts")) / 1000.0)
                 .alias("dur_ks"),
                 F.pmod(F.count(F.lit(1)), F.lit(2)).cast("int")
                 .alias("ended")),
            "event_type", "dur_ks", "ended"),
        "cohort_overlap": cohort_overlap(ev, "event_type", "user_id"),
        "gini_coefficient": gini_coefficient(ev, "event_type", "value"),
        "mad_outliers": mad_outliers(ev, "event_type", "value"),
        "cramers_v": cramers_v(binned, "event_type", "xbin", "ybin"),
        "cramers_v_bias_corrected": cramers_v_bias_corrected(
            binned, "event_type", "xbin", "ybin"),
        # lazy despite two passes: the pass-1 means join in as a
        # broadcast subtree, never a driver collect
        "skew_kurt": skew_kurt(ev, "event_type", "value"),
        "map_aggregate_sum": map_aggregate(nested, "grp", "ks", "vs"),
        "student_ttest": student_ttest(sided, "event_type", "value",
                                       "side"),
        "group_bit_aggregate_xor": group_bit_aggregate(
            ev, "event_type", "user_id", how="xor"),
        "avg_weighted": avg_weighted(
            ev.withColumn("w", F.pmod(F.col("event_id"), F.lit(5))),
            "event_type", "value", "w"),
        "pearson_corr": pearson_corr(
            ev.withColumn("y2", (F.col("value") * F.col("value"))
                          .cast("double")),
            "event_type", "value", "y2"),
        "mean_z_test": mean_z_test(sided, "event_type", "value", "side",
                                   var1=4.0, var2=9.0),
        "anova_f": anova_f(
            sided.withColumn("cls", F.pmod(F.col("user_id"), F.lit(3))),
            "event_type", "value", "cls"),
        "categorical_iv": categorical_iv(
            sided.withColumnRenamed("side", "tag"),
            "event_type", "event_type", "tag"),
        "exponential_moving_average": exponential_moving_average(ev),
        "exponential_time_decayed": exponential_time_decayed(ev),
        "rank_corr": rank_corr(
            ev.withColumn("y2", (F.col("value") * F.col("value"))
                          .cast("double")),
            "event_type", "value", "y2"),
        "rrf_fuse": rrf_fuse(
            rankings.unionByName(rankings.withColumn(
                "rank", (F.col("rank") % 7 + 1).cast("int"))),
            "q", "doc_id", "rank"),
        # dims=64 keeps construction lazy (no eager min/max bounds job
        # that would scan the source during plan audit — ADVICE r9)
        "covariance_stats": covariance_stats(emb, dims=64),
        "corr_matrix": corr_matrix(emb, dims=64),
        # pagerank / pca_whiten / ols_fit run eager jobs
        # (localCheckpoint, stats/solve collects) during construction —
        # replay-pinned instead of plan-audited
        "lttb_downsample": lttb_downsample(
            ev.select("event_type",
                      F.unix_micros("ts").cast("double").alias("x"),
                      F.col("value").alias("y")),
            "event_type", "x", "y", 100),
        # --- the r14-built batch (r15 promotion queue)
        "cohens_d": cohens_d(sided, "event_type", "value", "side"),
        "linear_trend": linear_trend(
            ev.where(F.col("event_type").isNotNull())),
        "sequence_match_events": sequence_match_events(
            ev, ["view", "click", "purchase"], [21600, 86400]),
        "ranking_metrics": ranking_metrics(
            ev.where(F.col("user_id").isNotNull()
                     & F.col("event_type").isNotNull())
            .withColumn("rel", F.pmod(F.col("user_id"), F.lit(3))),
            "event_type", "value", "rel", "event_id", k=10),
        # --- the r15-built batch (r16 promotion queue)
        **_r15_picks(spark, sf, ev, docs, right, sided),
    }


def _r15_picks(spark, sf, ev, docs, right, sided):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from clickhouse_hdfs_loader_spark.operators.analytics import (
        non_negative_derivative, sequence_match_events)
    from clickhouse_hdfs_loader_spark.operators.components import (
        triangle_count)
    from clickhouse_hdfs_loader_spark.operators.dispersion import (
        js_divergence)
    from clickhouse_hdfs_loader_spark.operators.asof import (
        vwap_resample)
    from clickhouse_hdfs_loader_spark.operators.linkage import (
        fuzzy_join_damerau)
    from clickhouse_hdfs_loader_spark.operators.stats import (
        brier_score, classification_report, holt_linear, roc_auc,
        rolling_corr)
    from clickhouse_hdfs_loader_spark.sources.tables import read_table

    wlag = Window.partitionBy("event_type").orderBy(
        F.unix_micros(F.col("ts")), F.col("event_id"))
    lagged = (ev.where(F.col("ts").isNotNull()
                       & F.col("event_id").isNotNull())
              .withColumn("vlag", F.lag("value").over(wlag)))
    labeled = (ev.where(F.col("user_id").isNotNull()
                        & F.col("event_id").isNotNull())
               .withColumn("pred", F.pmod(F.col("event_id"), F.lit(2)))
               .withColumn("label", F.pmod(F.col("user_id"), F.lit(2))))
    ps = (read_table(spark, sf, "lineitem")
          .select("l_partkey", "l_suppkey").distinct())
    tri_pairs = (ps.alias("a").join(
        ps.alias("b"),
        (F.col("a.l_partkey") == F.col("b.l_partkey"))
        & (F.col("a.l_suppkey") < F.col("b.l_suppkey")))
        .select(F.col("a.l_suppkey").alias("id_a"),
                F.col("b.l_suppkey").alias("id_b")))
    return {
        "roc_auc": roc_auc(sided, "event_type", "value", "side"),
        "brier_score": brier_score(sided, "event_type", "value",
                                   "side"),
        "classification_report": classification_report(
            labeled, "event_type", "pred", "label"),
        "non_negative_derivative": non_negative_derivative(ev),
        "rolling_corr": rolling_corr(lagged, "event_type", "value",
                                     "vlag", n=10),
        "js_divergence": js_divergence(
            ev.where(F.col("user_id").isNotNull()), "event_type",
            "user_id"),
        "sequence_match_events_ids": sequence_match_events(
            ev, ["view", "click", "purchase"], [21600, 86400],
            id_col="event_id"),
        "triangle_count": triangle_count(tri_pairs),
        "fuzzy_join_damerau": fuzzy_join_damerau(
            docs, right, max_edit=40, threshold_milli=1,
            exhaustive=True),
        "holt_linear": holt_linear(ev),
        "vwap_resample": vwap_resample(
            ev.where(F.col("event_id").isNotNull())
            .withColumn("vol", F.pmod(F.col("event_id"), F.lit(5)))),
    }


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
    builders = {name: (lambda n=name: REGISTRY[n].fn(spark, sf))
                for name in PICKS}
    builders.update({name: (lambda d=df: d)
                     for name, df in _operator_picks(spark, sf).items()})
    for name, build in builders.items():
        df = build()
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

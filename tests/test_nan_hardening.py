"""Review-pass regressions: NaN/Inf hardening of the Python-keyed
mapInPandas paths, NULL-ts window hardening, blank -i CLI parity, and
pagerank lifecycle guards."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

NAN = float("nan")


def test_uniq_up_to_excludes_nan_values_and_groups(spark):
    """Python id-hashes NaN (each NaN its own dict/set member), which
    silently exhausted the cap and dropped real values — and a NaN
    emitted back through an Arrow object column conflates with NULL.
    NaN rows are excluded up-front like NULLs (float columns only)."""
    from clickhouse_hdfs_loader_spark.operators.analytics import uniq_up_to

    df = spark.createDataFrame(
        [("g", NAN), ("g", NAN), ("g", NAN), ("g", NAN),
         ("g", 1.0), ("g", 2.0)],
        "g string, v double")
    rows = uniq_up_to(df, "g", "v", n=3).collect()
    assert len(rows) == 1 and rows[0]["uniq_up_to"] == 2

    # NaN GROUP keys excluded too (same stance as NULL groups)
    df2 = spark.createDataFrame(
        [(NAN, 1.0), (NAN, 2.0), (7.0, 3.0)], "g double, v double")
    rows2 = uniq_up_to(df2, "g", "v", n=5).collect()
    assert len(rows2) == 1 and rows2[0]["g"] == 7.0


def test_heavy_hitters_excludes_nan_values(spark):
    """Every NaN arrival used to be a fresh 'untracked' dict key,
    churning decrement rounds that eroded real candidates (and NaN
    could never survive the Arrow candidate boundary anyway); NaN rows
    are excluded up-front, so real values rank undisturbed."""
    from clickhouse_hdfs_loader_spark.operators.analytics import (
        heavy_hitters, heavy_hitters_weighted)

    rows = ([(NAN,)] * 50 + [(1.0,)] * 30 + [(2.0,)] * 20)
    df = spark.createDataFrame(rows, "v double").repartition(4)
    top = heavy_hitters(df, "v", k=2, capacity=4).collect()
    assert [(r["value"], r["cnt"]) for r in top] == [(1.0, 30), (2.0, 20)]

    dfw = df.withColumn("w", F.lit(2))
    topw = heavy_hitters_weighted(dfw, "v", "w", k=2,
                                  capacity=4).collect()
    assert [(r["value"], r["weight"]) for r in topw] \
        == [(1.0, 60), (2.0, 40)]


def test_lttb_excludes_nan_points(spark):
    """One NaN y made every affected bucket's mean NaN so area '>' never
    fired; NaN points are now excluded like NULLs."""
    from clickhouse_hdfs_loader_spark.operators.downsample import (
        lttb_downsample)

    clean = [( "g", float(i), float((i * 7) % 13)) for i in range(40)]
    with_nan = clean + [("g", 20.5, NAN), ("g", NAN, 1.0)]
    d1 = spark.createDataFrame(clean, "g string, x double, y double")
    d2 = spark.createDataFrame(with_nan, "g string, x double, y double")
    r1 = sorted(map(tuple, lttb_downsample(d1, "g", "x", "y", 8).collect()))
    r2 = sorted(map(tuple, lttb_downsample(d2, "g", "x", "y", 8).collect()))
    assert r1 == r2 and len(r1) == 8


def test_covariance_stats_raises_on_inf(spark):
    """Inf passed the old NaN-only guard and wrapped to INT64_MIN in the
    quantized sums."""
    from clickhouse_hdfs_loader_spark.operators.features import (
        covariance_stats)

    df = spark.createDataFrame(
        [(1, [1.0, float("inf")])], "vec_id long, embedding array<float>")
    with pytest.raises(Exception, match="non-finite"):
        covariance_stats(df).collect()


def test_blank_input_format_falls_back_to_mapper_class():
    """Reference gates -i priority on StringUtils.isNotBlank
    (ClickhouseHdfsLoader.java:165): a blank -i must fall back to the
    --mapper-class derivation, not win as an empty format."""
    from clickhouse_hdfs_loader_spark.config import parse_args

    req = ["--connect", "h:8123", "--table", "t",
           "--export-dir", "/x", "--dt", "2024-01-01"]
    ns = parse_args(req + ["-i", "", "--mapper-class",
                           "x.OrcLoaderMapper"])
    assert ns.input_format == "orc"
    ns = parse_args(req + ["-i", "  ", "--mapper-class",
                           "x.OrcLoaderMapper"])
    assert ns.input_format == "orc"
    ns = parse_args(req + ["-i", ""])
    assert ns.input_format == "text"
    # non-blank -i still wins over the mapper class
    ns = parse_args(req + ["-i", "text", "--mapper-class",
                           "x.OrcLoaderMapper"])
    assert ns.input_format == "text"


def test_null_ts_rows_excluded_from_window_chains(spark):
    """Spark sorts window NULLS FIRST, DuckDB NULLS LAST — NULL-ts rows
    must not participate in lead() chains (graded-oracle hardening for
    time_weighted_avg / event_transitions)."""
    from clickhouse_hdfs_loader_spark.operators.analytics import (
        event_transitions)
    from clickhouse_hdfs_loader_spark.operators.asof import (
        time_weighted_avg)

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=10)
    rows = [(1, 1, "a", t0, 1.0), (2, 1, "b", t0 + s, 3.0),
            (3, 1, "c", None, 9.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")
    trans = {(r["from_type"], r["to_type"]): r["n"]
             for r in event_transitions(df).collect()}
    assert trans == {("a", "b"): 1}   # the NULL-ts 'c' row joins no pair
    twap = {r["event_type"]: (r["num"], r["den"])
            for r in time_weighted_avg(df).collect()}
    assert "c" not in twap
    assert twap["a"] == (0, 0)        # singleton series: zero horizon
    assert twap["b"] == (0, 0)


def test_pagerank_rejects_zero_iters(spark):
    from clickhouse_hdfs_loader_spark.operators.components import pagerank

    e = spark.createDataFrame([("a", "b")], "src string, dst string")
    with pytest.raises(ValueError, match="iters"):
        pagerank(e, iters=0)


@pytest.mark.slow
def test_quantize_paths_exclude_nonfinite_values(spark):
    """ADVICE r9: the floor-milli quantize operators must drop NaN/±Inf
    value rows up-front — under ANSI, floor(NaN·1000) is silently 0 and
    ±Inf saturates the long cast, while the DuckDB twins raise on the
    same BIGINT cast. Finite rows must be unaffected."""
    from clickhouse_hdfs_loader_spark.operators.analytics import (
        bounding_ratio, delta_sum, group_array_moving_sum,
        histogram_fixed, linreg_by_group)
    from clickhouse_hdfs_loader_spark.operators.asof import (
        time_weighted_avg)

    t0 = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=10)
    rows = [(1, 1, "g", t0, 1.0),
            (2, 1, "g", t0 + s, float("nan")),
            (3, 1, "g", t0 + 2 * s, float("inf")),
            (4, 1, "g", t0 + 3 * s, float("-inf")),
            (5, 1, "g", t0 + 4 * s, 3.0)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, "
              "ts timestamp, value double")
    clean = spark.createDataFrame(
        [rows[0], rows[4]],
        "event_id long, user_id long, event_type string, "
        "ts timestamp, value double")

    for op in (delta_sum, bounding_ratio, time_weighted_avg,
               lambda d: group_array_moving_sum(d, n=2),
               lambda d: histogram_fixed(d, "value", width=2.0),
               linreg_by_group):
        got = sorted(map(tuple, op(df).collect()))
        want = sorted(map(tuple, op(clean).collect()))
        assert got == want, op
    # and the finite rows really flowed through (not everything dropped)
    assert delta_sum(df).first()["delta_sum_milli"] == 2000


def test_feature_scaling_quantizes_nonfinite_elements_to_null(spark):
    """ADVICE r10: dimension_stats/minmax_normalize/mean_center
    floor-quantized array ELEMENTS with no finite guard — under ANSI
    floor(NaN·1e6) silently yields 0 and Inf saturates the long cast
    while the DuckDB twin raises on the same BIGINT cast. Non-finite
    elements now quantize to NULL (excluded from stats, NULL in scaled
    outputs), mirrored as CASE WHEN isfinite(x) in the graded twins."""
    from clickhouse_hdfs_loader_spark.operators.features import (
        dimension_stats, mean_center, minmax_normalize)

    INF = float("inf")
    df = spark.createDataFrame(
        [(1, [1.0, NAN, 5.0]),
         (2, [3.0, 2.0, INF]),
         (3, [2.0, -INF, 1.0]),
         (4, None)],
        "vec_id long, embedding array<double>")

    st = {r["dim"]: (r["qmin"], r["qmax"], r["qsum"], r["n"])
          for r in dimension_stats(df).collect()}
    # dim 1: only the finite 2.0 survives; dim 2: Inf excluded
    assert st[0] == (1_000_000, 3_000_000, 6_000_000, 3)
    assert st[1] == (2_000_000, 2_000_000, 2_000_000, 1)
    assert st[2] == (1_000_000, 5_000_000, 6_000_000, 2)

    nm = {r["vec_id"]: r["normalized"] for r in
          minmax_normalize(df.where(F.col("embedding").isNotNull()))
          .collect()}
    # non-finite elements are NULL in the scaled output; dim 1 is
    # effectively constant (single finite value) -> pinned 0
    assert nm[1] == [0, None, 1000]
    assert nm[2] == [1000, 0, None]
    assert nm[3] == [500, None, 0]

    mc = {r["vec_id"]: r["centered_micro"] for r in
          mean_center(df.where(F.col("embedding").isNotNull())).collect()}
    assert mc[1][1] is None and mc[2][2] is None and mc[3][1] is None
    # dim 0 mean = 6e6 div 3 = 2e6
    assert [mc[v][0] for v in (1, 2, 3)] \
        == [-1_000_000, 1_000_000, 0]

"""As-of and range joins ([EXT] — time-series operators Spark lacks as
built-ins; build brief: "when the reference has an operator Spark lacks
(e.g., as-of join, range join), implement it as a composition of existing
DataFrame ops").

``asof_join`` uses the union+window composition (not a UDF):
tag both sides, union on (key, ts), and carry the right side's latest
value forward with ``last(ignorenulls=True)`` over an ordered window —
one shuffle on the key, O(n log n) per key for the sort, no range
explosion. This is the standard distributed as-of algorithm (same shape
Flink/kdb+ use); DuckDB's native ``ASOF JOIN`` is the correctness oracle.

``range_join`` is an equi-key join with a band predicate — Spark executes
it as a hash join + post-filter, which is the right plan when the equi key
carries the selectivity (per-user bands here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(left: DataFrame, right: DataFrame, key: str, ts: str,
              value_cols: list[str], direction: str = "backward") -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right.ts <= left.ts`` (direction='backward') or the earliest right
    row with ``right.ts >= left.ts`` (direction='forward') per key —
    both inclusive at equal timestamps, matching DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts`` / ``l.ts <= r.ts`` (the oracle).

    Left columns are preserved; ``value_cols`` from the right arrive
    null-filled when no prior (resp. later) right row exists. Same
    union+window shape in both directions: one shuffle on the key, a
    single per-key sort, no range explosion.

    The carried payload is ONE struct of all ``value_cols`` (the
    ohlc_resample struct-pick pattern), not per-column ignorenulls
    picks: the struct is non-null exactly when a right ROW exists, so a
    matching row whose value column is NULL yields NULL — DuckDB ASOF
    semantics — instead of skipping ahead to a farther row (and all
    columns always come from the SAME right row).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"unknown as-of direction: {direction!r}")
    lt = left.withColumn("_side", F.lit(1))
    # NULL-ts right rows can never satisfy either inequality (SQL
    # comparisons with NULL are never true) — without this filter they
    # sort first and become phantom backward matches
    rt = (right.select(key, ts, *value_cols)
          .where(F.col(ts).isNotNull())
          .withColumn("_side", F.lit(0)))
    merged = lt.unionByName(rt, allowMissingColumns=True)
    if direction == "backward":
        # right rows (side 0) sort before left rows at equal ts → "<="
        w = (Window.partitionBy(key).orderBy(F.asc(ts), F.asc("_side"))
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        pick = F.last
    else:
        # left rows (side 1) sort before right rows at equal ts, and the
        # frame looks FORWARD → equal-ts right rows stay in frame (">=")
        w = (Window.partitionBy(key).orderBy(F.asc(ts), F.desc("_side"))
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        pick = F.first
    payload = F.struct(*[F.col(c) for c in value_cols])
    row = pick(F.when(F.col("_side") == 0, payload), ignorenulls=True) \
        .over(w).alias("_asof_row")
    # a NULL-ts LEFT row matches nothing either (forward frames would
    # otherwise see every right row after it sorts first)
    out = (merged.select("*", row).where(F.col("_side") == 1)
           .select("*", *[F.when(F.col(ts).isNotNull(),
                                 F.col(f"_asof_row.{c}"))
                          .alias(f"asof_{c}") for c in value_cols]))
    return out.drop("_side", "_asof_row", *value_cols)


def range_join(left: DataFrame, right: DataFrame, key: str,
               left_ts: str, right_ts: str,
               lower_s: int = 0, upper_s: int = 3600) -> DataFrame:
    """Pairs (l, r) with same key and ``r.ts − l.ts ∈ [lower_s, upper_s)``.
    Equi-join on the key + band filter; AQE handles per-key skew.

    The band is evaluated at exact microsecond precision (``unix_micros``),
    never whole-second truncation — events timestamps carry sub-second
    precision and a truncated delta flips rows at the band edges.
    """
    lt = left.alias("l")
    rt = right.alias("r")
    delta_us = (F.unix_micros(F.col(f"r.{right_ts}"))
                - F.unix_micros(F.col(f"l.{left_ts}")))
    return (lt.join(rt, (F.col(f"l.{key}") == F.col(f"r.{key}"))
                    & (delta_us >= lower_s * 1_000_000)
                    & (delta_us < upper_s * 1_000_000)))


def anomaly_zscore(events, ts_col: str = "ts", key_col: str = "event_type",
                   window_hours: int = 24, z_threshold: float = 3.0,
                   min_history: int = 8):
    """Trailing-window z-score anomaly detection on hourly event counts —
    the classic observability workload (spike/drop detection per series).

    For each (key, hour): mean/std of the PRECEDING ``window_hours``
    hourly counts (ROWS frame, never the current row), z = (cnt − mean)/
    std, anomalies = |z| ≥ threshold with ≥ ``min_history`` prior hours
    and nonzero variance. Variance is computed from explicit sum/sum-sq
    in a FIXED expression order (not stddev_samp — engines disagree on
    Welford vs naive accumulation) and z is floor-rounded at 1e4, so the
    whole detector replays bit-exactly in SQL (in-test DuckDB oracle).

    Scale: one hourly pre-aggregate (shuffle rows = series × hours), one
    window per series partition — series count bounds parallelism, hours
    bound partition size; nothing scales with raw event volume past the
    first aggregate."""
    hourly = (events.groupBy(key_col,
                             F.date_trunc("hour", F.col(ts_col)).alias("h"))
              .agg(F.count(F.lit(1)).alias("cnt")))
    return anomaly_from_hourly(hourly, key_col, window_hours,
                               z_threshold, min_history)


def hourly_counts_update(state: "DataFrame | None", batch,
                         ts_col: str = "ts",
                         key_col: str = "event_type"):
    """Incremental hourly-count maintenance for
    :func:`anomaly_from_hourly`: per-(series, hour) counts ADD — a
    commutative monoid, so folding any batch partition in any order
    equals the one-shot hourly aggregate (the rollup contract). State is
    |series| x |hours| rows; each fold shuffles the batch plus that."""
    part = (batch.groupBy(key_col,
                          F.date_trunc("hour", F.col(ts_col)).alias("h"))
            .agg(F.count(F.lit(1)).alias("cnt")))
    if state is None:
        return part
    return (state.unionByName(part)
            .groupBy(key_col, "h")
            .agg(F.sum("cnt").alias("cnt")))


def anomaly_from_hourly(hourly, key_col: str = "event_type",
                        window_hours: int = 24, z_threshold: float = 3.0,
                        min_history: int = 8):
    """The :func:`anomaly_zscore` detector tail over a prebuilt (or
    incrementally maintained — :func:`hourly_counts_update`) hourly
    count table: raw events are never rescanned, so a continuously-
    ingesting pipeline serves fresh anomalies from |series| x |hours|
    rows of state."""
    from pyspark.sql import Window

    w = (Window.partitionBy(key_col).orderBy("h")
         .rowsBetween(-window_hours, -1))
    n = F.count(F.lit(1)).over(w)
    s = F.sum(F.col("cnt").cast("double")).over(w)
    sq = F.sum((F.col("cnt") * F.col("cnt")).cast("double")).over(w)
    # Spark 4 ANSI raises on ANY division by zero (doubles included), so
    # every quotient sits inside a lazily-evaluated CASE WHEN guard —
    # rows with an empty frame or zero variance never evaluate it
    nd = n.cast("double")
    enough = n >= min_history
    mean = F.when(enough, s / nd)
    var = F.when(enough, (sq - s * s / nd) / (nd - F.lit(1.0)))
    return (hourly
            .withColumn("_n", n).withColumn("_mean", mean)
            .withColumn("_var", var)
            .withColumn("_z", F.when(F.col("_var") > 0,
                                     (F.col("cnt") - F.col("_mean"))
                                     / F.sqrt(F.col("_var"))))
            .where((F.col("_n") >= min_history) & (F.col("_var") > 0)
                   & (F.abs(F.col("_z")) >= z_threshold))
            .select(key_col,
                    F.unix_timestamp("h").alias("hour_epoch"), "cnt",
                    (F.floor(F.col("_mean") * 10000 + 0.5) / 10000)
                    .alias("mean_cnt"),
                    (F.floor(F.col("_z") * 10000 + 0.5) / 10000)
                    .alias("z")))


def ohlc_resample(events: DataFrame, ts_col: str = "ts",
                  key_col: str = "event_type", value_col: str = "value",
                  id_col: str = "event_id") -> DataFrame:
    """OHLC bar resampling — the canonical time-series downsample (every
    market-data / metrics store ships it): per (series, hour) the
    opening value, high, low, closing value and tick count.

    Open/close are argmin/argmax over event TIME, which is not unique —
    ``id_col`` is the explicit tie-breaker, so the bars are
    deterministic and SQL-replayable (min/max of a (ts, id, value)
    struct: Spark orders structs lexicographically by field, and the
    oracle replays it as a row_number window). One shuffle (series ×
    hour keys), map-side partial min/max/count — nothing scales with
    raw volume past the partial aggregate."""
    h = F.date_trunc("hour", F.col(ts_col))
    pick = F.struct(F.col(ts_col).alias("t"), F.col(id_col).alias("i"),
                    F.col(value_col).alias("v"))
    return (events
            .where(F.col(value_col).isNotNull())
            .groupBy(F.col(key_col), h.alias("h"))
            .agg(F.round(F.min(pick)["v"], 2).alias("open"),
                 F.round(F.max(value_col), 2).alias("high"),
                 F.round(F.min(value_col), 2).alias("low"),
                 F.round(F.max(pick)["v"], 2).alias("close"),
                 F.count(F.lit(1)).alias("ticks"))
            .select(key_col, F.unix_timestamp("h").alias("hour_epoch"),
                    "open", "high", "low", "close", "ticks"))


def vwap_resample(events: DataFrame, ts_col: str = "ts",
                  key_col: str = "event_type",
                  price_col: str = "value",
                  vol_col: str = "vol") -> DataFrame:
    """Volume-weighted average price per (series, hour) — the OHLC
    bar's trading-volume companion (every market-data store reports
    VWAP next to the bars): per bucket,

        vwap_e4 = (Σ vol·price_milli) / (Σ vol)      (knife-edge e4)

    under the avg_weighted contract verbatim — prices milli-quantize,
    volumes must be non-negative integers (the ONE shared integral
    validator, named for THIS operator's volume), both sums are int64
    monoids, and the final ratio is the SAME shared
    :data:`~..operators.stats.AVG_WEIGHTED_SQL` float finish
    (zero-volume buckets → NULL, never a division trap). NULL
    price/ts/volume rows are excluded up-front (mirror in twins).
    Overflow: Σ vol·|pm| < 2⁶³ (the avg_weighted bound).

    One shuffle on (series × hour); map-side partial sums.

    Returns ``key, hour_epoch, wsum, wvsum_milli, vwap_e4``."""
    from .analytics import _integral_weight_expr, _quantizable_col
    from .stats import AVG_WEIGHTED_SQL

    w = _integral_weight_expr(
        "vwap_resample", vol_col, noun="volume",
        neg_reason="is not a valid trade volume")
    pm = F.floor(F.col(price_col).cast("double") * 1000).cast("long")
    h = F.date_trunc("hour", F.col(ts_col))
    return (events
            .where(_quantizable_col(price_col)
                   & F.col(ts_col).isNotNull()
                   & F.col(vol_col).isNotNull())
            .select(F.col(key_col), h.alias("_h"), pm.alias("_pm"),
                    w.alias("_w"))
            .groupBy(key_col, "_h")
            .agg(F.sum("_w").alias("wsum"),
                 F.sum(F.col("_w") * F.col("_pm"))
                 .alias("wvsum_milli"))
            .select(key_col, F.unix_timestamp("_h").alias("hour_epoch"),
                    "wsum", "wvsum_milli",
                    F.expr(AVG_WEIGHTED_SQL).alias("vwap_e4")))


def time_weighted_avg(events: DataFrame, ts_col: str = "ts",
                      key_col: str = "event_type",
                      value_col: str = "value",
                      id_col: str = "event_id") -> DataFrame:
    """Per-series time-weighted average (TWAP — the metric stores and
    market-data engines report when samples arrive irregularly): each
    observation is weighted by how long it remained current, i.e. the
    whole microseconds until the series' next event; the final event
    carries zero weight (no horizon assumption).

    Integer-exact and SQL-replayable end to end: values quantize to
    milli units (``floor(v*1000)``), durations are whole µs from the
    epoch, and the output is ``(Σ v_milli·dur) div (Σ dur)`` — both
    engines truncate integer division toward zero, so even negative
    values replay hash-exactly. Singleton series (zero total duration)
    emit NULL explicitly — never an ANSI divide-by-zero.

    Overflow bound: Σ v_milli·dur_µs must stay under 2^63 — holds for
    |v| < 1e6 over a ~3-century span per series; quantize coarser for
    wilder magnitudes.

    Scale: ONE shuffle on the series key; the lead() window and both
    sums run inside each partition (map-side combinable after the
    window). Equal timestamps order by ``id_col`` (zero-µs weight, but
    deterministic)."""
    from pyspark.sql import Window

    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    us = F.unix_micros(F.col(ts_col))
    from .analytics import _quantizable_col
    rows = (events
            # NULL ts excluded too: Spark windows sort NULLS FIRST,
            # DuckDB NULLS LAST — a drifted fixture with one NULL-ts
            # row would silently reorder the lead() chain differently
            # per engine (mirror the WHERE in the oracle). NaN/Inf
            # values excluded likewise (ANSI floor(NaN·1000) is 0, Inf
            # saturates — mirror AND isfinite(value) in the oracle).
            .where(_quantizable_col(value_col)
                   & F.col(ts_col).isNotNull())
            .withColumn("_us", us)
            .withColumn("_dur", F.coalesce(
                F.lead("_us").over(w) - F.col("_us"), F.lit(0)))
            .withColumn("_vm",
                        # float32 -> double before the multiply
                        F.floor(F.col(value_col).cast("double") * 1000)
                        .cast("long")))
    return (rows.groupBy(key_col)
            .agg(F.sum(F.expr("_vm * _dur")).alias("num"),
                 F.sum("_dur").alias("den"))
            .select(key_col, "num", "den",
                    F.expr("CASE WHEN den = 0 THEN NULL "
                           "ELSE num div den END").alias("twap_milli")))

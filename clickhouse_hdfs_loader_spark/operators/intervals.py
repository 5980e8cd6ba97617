"""Interval aggregates — ClickHouse's ``intervalLengthSum`` and
``maxIntersections``/``maxIntersectionsPosition`` combinators ([EXT],
SURVEY §2 analytics extensions; the reference era's ClickHouse surface).

Both operators take GENERIC integer interval columns (the caller derives
``start``/``end`` — e.g. epoch seconds — so the arithmetic stays
engine-exact int64 end to end; no float length ever appears). Intervals
are half-open ``[start, end)``: touching intervals ``[1,2)`` and
``[2,3)`` do not intersect but do merge into one covered segment, the
same convention on both operators.

Scale: each operator is ONE shuffle on the group key; the window
functions stream through sorted partitions (no per-group
materialization), and output is O(|groups|).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def interval_length_sum(df: DataFrame, group_col: str = "g",
                        start_col: str = "s", end_col: str = "e",
                        id_col: "str | None" = None) -> DataFrame:
    """ClickHouse ``intervalLengthSum``: per group, the total length of
    the UNION of (possibly overlapping) ``[start, end)`` intervals.

    Sweep-line as windows: ordered by (start, end[, id]), an interval
    starts a new covered segment iff its start exceeds the running max
    of all previous ends; the running count of segment-starts is the
    segment id, and the union length is Σ per-segment
    ``max(end) − min(start)``. All int64 — exact, and the identical
    window SQL replays in any engine.

    Rows with NULL bounds or ``end < start`` are excluded (mirror the
    ``WHERE`` in any SQL twin); zero-length intervals contribute 0.

    Returns ``group, union_len, segments, intervals``."""
    order = [F.col(start_col).asc(), F.col(end_col).asc()]
    if id_col:
        order.append(F.col(id_col).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    prev_max_end = (F.max(end_col)
                    .over(w.rowsBetween(Window.unboundedPreceding, -1)))
    base = df.where(F.col(start_col).isNotNull()
                    & F.col(end_col).isNotNull()
                    & (F.col(end_col) >= F.col(start_col)))
    seg = (base
           .withColumn("_new", F.when(
               prev_max_end.isNull()
               | (F.col(start_col) > prev_max_end), 1).otherwise(0))
           .withColumn("_seg", F.sum("_new").over(
               w.rowsBetween(Window.unboundedPreceding, 0))))
    per_seg = (seg.groupBy(group_col, "_seg")
               .agg((F.max(end_col) - F.min(start_col)).alias("_len"),
                    F.count(F.lit(1)).alias("_n")))
    return (per_seg.groupBy(group_col)
            .agg(F.sum("_len").alias("union_len"),
                 F.count(F.lit(1)).alias("segments"),
                 F.sum("_n").alias("intervals")))


def max_intersections(df: DataFrame, group_col: str = "g",
                      start_col: str = "s",
                      end_col: str = "e") -> DataFrame:
    """ClickHouse ``maxIntersections`` + ``maxIntersectionsPosition``:
    per group, the maximum number of simultaneously-open intervals and
    the earliest point where that maximum is reached.

    Sweep-line: every interval contributes ``(start, +1)`` and
    ``(end, −1)``; the running sum ordered by ``(point, delta)`` is the
    concurrency curve. ``−1 < +1`` puts closings before openings at the
    same point — exactly the half-open convention, so ``[1,2)`` and
    ``[2,3)`` never count as 2. Ties among equal ``(point, delta)`` rows
    permute only WITHIN a monotone run of the curve, so ``max`` and
    ``min(point where curve = max)`` are deterministic even though the
    per-row running sum is not — don't "fix" the tie-break by adding an
    id: no id makes the union cheaper and the outputs are already
    well-defined.

    Zero-length intervals (``end <= start``) are empty under half-open
    semantics and are excluded, as are NULL bounds (mirror the WHERE in
    any SQL twin).

    Returns ``group, max_intersections, position``."""
    base = df.where(F.col(start_col).isNotNull()
                    & F.col(end_col).isNotNull()
                    & (F.col(end_col) > F.col(start_col)))
    # explode (not union) so the source is scanned ONCE; the peak is a
    # whole-partition window max (not a groupBy + self-join, which
    # would re-plan the curve subtree on both join sides — plan-audit
    # finding on the first cut of this operator)
    pts = (base.select(
        F.col(group_col),
        F.explode(F.array(
            F.struct(F.col(start_col).alias("p"),
                     F.lit(1).alias("d")),
            F.struct(F.col(end_col).alias("p"),
                     F.lit(-1).alias("d")))).alias("_pt"))
        .select(F.col(group_col), F.col("_pt.p").alias("_p"),
                F.col("_pt.d").alias("_d")))
    w = (Window.partitionBy(group_col).orderBy("_p", "_d")
         .rowsBetween(Window.unboundedPreceding, 0))
    wg = Window.partitionBy(group_col)
    curve = (pts.withColumn("_c", F.sum("_d").over(w))
             .withColumn("_m", F.max("_c").over(wg)))
    return (curve.where(F.col("_c") == F.col("_m"))
            .groupBy(group_col)
            .agg(F.max("_c").alias("max_intersections"),
                 F.min("_p").alias("position")))

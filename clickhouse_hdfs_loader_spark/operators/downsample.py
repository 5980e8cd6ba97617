"""Time-series downsampling — ClickHouse's
``largestTriangleThreeBuckets`` aggregate ([EXT]; Steinarsson's public
LTTB thesis, "Downsampling Time Series for Visual Representation",
U. Iceland 2013).

LTTB is inherently sequential per series (every bucket's pick depends on
the PREVIOUS pick), so it cannot be a window/agg composition — the
idiomatic Spark shape is ``applyInPandas`` per series key: series
parallelize across the cluster, each series is processed whole. That
whole-series-in-memory contract is the operator's documented bound
(downsampling inputs are plot-sized; for truly unbounded series,
pre-bucket by coarse time range first).

Determinism contract (pinned by a pure-Python replay test): points sort
by ``(x, y)``; bucket means accumulate SEQUENTIALLY left-to-right (not
numpy pairwise — pairwise summation rounds differently and could flip an
argmax); ties on triangle area keep the FIRST maximum. The area formula
is evaluated elementwise in the exact written order, so an independent
replay reproduces the selection bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _lttb_indices(xs, ys, threshold: int) -> list:
    """Pure-sequential LTTB index selection over parallel float lists.
    The replay test re-derives the same selection with EXACT rational
    arithmetic (``fractions.Fraction`` — independent of this float
    implementation and of Spark), so a selection error here cannot hide
    behind matching rounding (tests/test_interval_combinators.py)."""
    n = len(xs)
    if n <= threshold:
        return list(range(n))
    every = (n - 2) / (threshold - 2)
    picked = [0]
    a = 0
    for i in range(threshold - 2):
        lo = int((i * every) // 1) + 1
        hi = int(((i + 1) * every) // 1) + 1
        nb_lo = hi
        nb_hi = min(int(((i + 2) * every) // 1) + 1, n)
        if nb_lo >= nb_hi:           # degenerate tail: average = last pt
            nb_lo, nb_hi = n - 1, n
        sx = 0.0
        sy = 0.0
        for j in range(nb_lo, nb_hi):
            sx += xs[j]
            sy += ys[j]
        m = nb_hi - nb_lo
        bx, by = sx / m, sy / m
        ax, ay = xs[a], ys[a]
        best, best_area = lo, -1.0
        for c in range(lo, hi):
            area = abs((ax - bx) * (ys[c] - ay)
                       - (ax - xs[c]) * (by - ay))
            if area > best_area:     # strict > keeps the FIRST max
                best, best_area = c, area
        picked.append(best)
        a = best
    picked.append(n - 1)
    return picked


def lttb_downsample(df: DataFrame, series_col: str, x_col: str,
                    y_col: str, threshold: int) -> DataFrame:
    """Downsample each series to ``threshold`` visually-representative
    points with Largest-Triangle-Three-Buckets: first and last points
    are always kept; the interior splits into ``threshold − 2``
    equal-count buckets and each bucket keeps the point forming the
    largest triangle with the previous pick and the next bucket's mean.
    Series with ≤ threshold points pass through unchanged.

    NULL x/y rows are dropped up-front. Output is
    ``series, x, y, pos`` (pos = rank of the point within the
    downsampled series — makes results hash-comparable without relying
    on output order)."""
    if threshold < 3:
        raise ValueError(
            f"lttb_downsample: threshold must be >= 3 (first + last + "
            f"at least one bucket), got {threshold}")
    import pandas as pd
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    out_schema = (f"{series_col} {dtypes[series_col]}, "
                  f"{x_col} double, {y_col} double, pos int")

    def one_series(pdf: pd.DataFrame) -> pd.DataFrame:
        sub = pdf.sort_values([x_col, y_col], kind="mergesort")
        xs = [float(v) for v in sub[x_col]]
        ys = [float(v) for v in sub[y_col]]
        idx = _lttb_indices(xs, ys, threshold)
        return pd.DataFrame({
            series_col: [pdf[series_col].iloc[0]] * len(idx),
            x_col: [xs[i] for i in idx],
            y_col: [ys[i] for i in idx],
            "pos": range(len(idx)),
        })

    # NaN excluded alongside NULL: one NaN poisons every bucket mean it
    # touches, all areas go NaN, and `>` never fires — each affected
    # bucket would silently keep its first point (review-caught)
    return (df.select(series_col, x_col, y_col)
            .where(F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
                   & ~F.isnan(F.col(x_col).cast("double"))
                   & ~F.isnan(F.col(y_col).cast("double")))
            .groupBy(series_col)
            .applyInPandas(one_series, schema=out_schema))

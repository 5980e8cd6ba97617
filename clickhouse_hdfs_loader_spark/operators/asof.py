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
    ``right.ts <= left.ts`` (direction='backward') per key.

    Left columns are preserved; ``value_cols`` from the right arrive
    null-filled when no prior right row exists.
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")
    lt = left.withColumn("_side", F.lit(1))
    rt = (right.select(key, ts, *value_cols)
          .withColumn("_side", F.lit(0)))
    merged = lt.unionByName(rt, allowMissingColumns=True)
    # right rows (side 0) sort before left rows at equal ts → "<=" semantics
    w = (Window.partitionBy(key).orderBy(F.asc(ts), F.asc("_side"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = [F.last(F.when(F.col("_side") == 0, F.col(c)), ignorenulls=True)
               .over(w).alias(f"asof_{c}") for c in value_cols]
    out = merged.select("*", *carried).where(F.col("_side") == 1)
    return out.drop("_side", *value_cols)


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

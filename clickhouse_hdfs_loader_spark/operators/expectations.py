"""Declarative data-quality expectations ([EXT] — the deequ-style
constraint-validation step a production training-data pipeline runs
before any corpus enters training; reference parity anchor is the
loader's own row-width gate, `AbstractClickhouseLoaderMapper.java:207-245`,
generalized from one hard-coded rule to a declarative check set).

Design: every check compiles to ONE aggregate expression, and the whole
suite runs as a SINGLE one-pass aggregate over the table — at 100 TB the
cost is one scan with map-side partial aggregation, identical to a
`count(*)`, no matter how many checks are attached. The report is then
unpivoted driver-free (literal-struct explode of the 1-row aggregate), so
nothing scales with data size except the scan itself.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Check:
    """One named expectation. Exactly one of ``violated`` (a row-level
    boolean predicate counted via sum-of-when) or ``agg_violations`` (a
    full aggregate expression returning the violation count, for
    non-row-local properties like uniqueness) is set."""
    name: str
    violated: Column | None = None
    agg_violations: Column | None = None


def not_null(name: str, col: str) -> Check:
    return Check(name, violated=F.col(col).isNull())


def unique(name: str, col: str) -> Check:
    """Violations = surplus copies beyond the first of each value.
    Aggregate-level: count(col) − count(distinct col)."""
    return Check(name, agg_violations=(
        F.count(F.col(col)) - F.count_distinct(F.col(col))))


def in_set(name: str, col: str, allowed: list) -> Check:
    return Check(name, violated=~F.col(col).isin(allowed))


def between(name: str, col: str, lo, hi) -> Check:
    return Check(name, violated=~F.col(col).between(lo, hi))


def matches(name: str, col: str, regex: str) -> Check:
    return Check(name, violated=F.regexp_count(F.col(col),
                                               F.lit(regex)) == 0)


def satisfies(name: str, predicate: Column) -> Check:
    """Arbitrary row-level consistency predicate (violation when false)."""
    return Check(name, violated=~predicate)


def run_expectations(df: DataFrame, checks: list[Check]) -> DataFrame:
    """Evaluate every check in one aggregate pass. Returns one row per
    check: ``check_name, violations, total_rows, passed``.

    NULL handling is explicit: a row where a row-level predicate
    evaluates to NULL (e.g. a NULL value in a range check) counts as a
    violation — an unknown is not a pass — except for ``not_null``
    itself, whose predicate is never NULL by construction.
    """
    aggs = [F.count(F.lit(1)).alias("_total")]
    for i, c in enumerate(checks):
        if (c.violated is None) == (c.agg_violations is None):
            raise ValueError(
                f"check {c.name!r}: set exactly one of violated/"
                f"agg_violations")
        if c.agg_violations is not None:
            expr = c.agg_violations
        else:
            expr = F.sum(F.when(F.coalesce(c.violated, F.lit(True)),
                                F.lit(1)).otherwise(F.lit(0)))
        aggs.append(F.coalesce(expr.cast("long"), F.lit(0)).alias(f"_v{i}"))
    row = df.agg(*aggs)
    structs = [F.struct(F.lit(c.name).alias("check_name"),
                        F.col(f"_v{i}").alias("violations"))
               for i, c in enumerate(checks)]
    return (row.select(F.col("_total").alias("total_rows"),
                       F.explode(F.array(*structs)).alias("c"))
            .select(F.col("c.check_name").alias("check_name"),
                    F.col("c.violations").alias("violations"),
                    "total_rows",
                    (F.col("c.violations") == 0).alias("passed")))

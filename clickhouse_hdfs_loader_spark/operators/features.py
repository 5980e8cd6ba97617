"""Embedding feature scaling ([EXT]) — the per-dimension normalization
step a training pipeline runs before quantization / indexing / distance
ops (sklearn's MinMaxScaler, but distributed and engine-exact).

Determinism contract (repo-wide): values quantize to integer micro-units
(``floor(x*1e6)``) BEFORE any aggregation, so min/max/sum are pure
integer ops with no float-order sensitivity, and the normalized outputs
are integer milli-units via IDENTICAL-expression-order floor division —
hash-replayable in DuckDB.

Scale shape:
- :func:`dimension_stats` is ONE posexplode + a map-side-combinable
  aggregate whose output is |dims| rows — never corpus-sized.
- :func:`minmax_normalize` collects those |dims| rows (a documented tiny
  collect, same budget as k-means centroids) into literal arrays and
  normalizes with a stateless ``zip_with`` — no explode, no shuffle, no
  Python in the row path. Spark's higher-order functions evaluate
  interpreted per element (see CLAUDE.md perf notes), which is fine at
  embedding dims (8–1024); swap in an Arrow kernel only if a profile
  says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000


def _quantize(x):
    """THE module's determinism contract, in one place: float32 ->
    double BEFORE the multiply (kmeans-sums precedent: a float-precision
    product can floor across a different integer boundary than the
    double product DuckDB computes), then floor to int64 micro-units."""
    return F.floor(x.cast("double") * F.lit(float(QUANT_SCALE)))         .cast("long")


def dimension_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension ``dim, qmin, qmax, qsum, n`` over micro-quantized
    values (``floor(x*1e6)`` as int64). NULL vectors are skipped; NULL
    elements are ignored by the aggregates (and counted via ``n``).
    Overflow: |x| < 9e6 per element and qsum bounded by n·9e12 — safe
    under int64 for n up to ~1e6 rows per dimension at extreme
    magnitudes, far looser for unit-norm embeddings."""
    q = _quantize(F.col("x"))
    return (emb.where(F.col(vec_col).isNotNull())
            .select(F.posexplode(vec_col).alias("dim", "x"))
            .select("dim", q.alias("q"))
            .groupBy("dim")
            .agg(F.min("q").alias("qmin"), F.max("q").alias("qmax"),
                 F.sum("q").alias("qsum"),
                 F.count("q").alias("n")))


def minmax_normalize(emb: DataFrame, stats: DataFrame = None,
                     vec_col: str = "embedding",
                     out_col: str = "normalized") -> DataFrame:
    """Append ``out_col``: each dimension min-max scaled to integer
    milli-units in [0, 1000] — ``((q - qmin) * 1000) div (qmax - qmin)``
    with constant dimensions pinned to 0 explicitly (never an ANSI
    divide-by-zero). ``stats`` defaults to :func:`dimension_stats` of
    ``emb`` itself; pass a precomputed/persisted stats table to apply a
    TRAIN split's scaling to eval data (the leakage-correct direction).

    NULL vectors pass through with ``out_col`` NULL (the repo's explicit
    degenerate-input stance — see semantic_dedup's sentinel)."""
    if stats is None:
        stats = dimension_stats(emb, vec_col)
    rows = sorted(stats.collect(), key=lambda r: r["dim"])  # |dims| rows
    if rows:
        assert [r["dim"] for r in rows] == list(range(len(rows))), \
            "dimension_stats must cover contiguous dims 0..d-1"
    # a dimension with zero non-NULL values (n=0) has NULL qmin/qmax —
    # pin it like a constant dimension (offset 0, range 0 -> output 0)
    mins = F.array(*[F.lit(int(r["qmin"]) if r["n"] else 0)
                     for r in rows])
    rngs = F.array(*[F.lit(int(r["qmax"] - r["qmin"]) if r["n"] else 0)
                     for r in rows])
    centered = F.zip_with(F.col(vec_col), mins,
                          lambda x, m: _quantize(x) - m)
    # NULL elements stay NULL in every branch — the constant-dimension
    # zero would otherwise shadow a missing value as a real 0
    scaled = F.zip_with(
        centered, rngs,
        lambda d, r: F.when(d.isNull(), F.lit(None).cast("long"))
        .when(r == 0, F.lit(0))
        .otherwise(F.floor((d * 1000).cast("double") / r).cast("long")))
    return emb.withColumn(
        out_col, F.when(F.col(vec_col).isNotNull(), scaled))


def mean_center(emb: DataFrame, stats: DataFrame = None,
                vec_col: str = "embedding",
                out_col: str = "centered_micro") -> DataFrame:
    """Append ``out_col``: per-dimension mean-centered micro-units,
    ``q - (qsum div n)`` — the rational mean (no float divide), same
    tiny-stats-collect shape as :func:`minmax_normalize`. The driver
    division truncates toward zero (Python ``//`` floors toward -inf;
    SQL ``div`` does not — the replay trap for negative sums)."""
    if stats is None:
        stats = dimension_stats(emb, vec_col)
    rows = sorted(stats.collect(), key=lambda r: r["dim"])

    def tdiv(a: int, b: int) -> int:   # truncate toward zero, like SQL div
        return -((-a) // b) if a < 0 else a // b

    means = F.array(*[F.lit(tdiv(int(r["qsum"]), int(r["n"]))
                            if r["n"] else 0) for r in rows])
    centered = F.zip_with(F.col(vec_col), means,
                          lambda x, m: _quantize(x) - m)
    return emb.withColumn(
        out_col, F.when(F.col(vec_col).isNotNull(), centered))

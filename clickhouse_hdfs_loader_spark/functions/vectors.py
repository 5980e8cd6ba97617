"""Vector column expressions for similarity search ([EXT], SURVEY §2.C).

Cosine similarity is built from native higher-order functions
(``zip_with`` + ``aggregate``) so the arithmetic is a deterministic
sequential left-fold over doubles — bit-reproducible and exactly
mirrorable in the DuckDB oracle. No UDF, no Python in the hot path; at
scale the dot products run inside whole-stage codegen next to the join.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double_array(c: Column) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    a, b = as_double_array(a), as_double_array(b)
    return dot(a, b) / (norm(a) * norm(b))


def random_hyperplane_bits(vec: Column, planes: list[list[float]],
                           pre_cast: bool = False) -> Column:
    """LSH signature: one sign bit per fixed hyperplane, packed to a long.

    ``planes`` are driver-side constants (deterministic, seeded), inlined as
    literal arrays — the comparison is pure codegen, no shuffle, no UDF.

    ``pre_cast=True`` promises ``vec`` is ALREADY a double array (a
    materialized ``as_double_array`` projection column). Without it the
    cast transform is inlined into every plane's dot fold — one
    interpreted 64-element cast pass PER PLANE per row (r15: callers
    materialize the cast once; bit values are identical because the
    cast produces the same doubles either way)."""
    v = vec if pre_cast else as_double_array(vec)
    bit_terms = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        positive = dot(v, plane) >= 0
        bit_terms.append(F.when(positive, F.lit(1 << i)).otherwise(F.lit(0)))
    out = F.lit(0)
    for t in bit_terms:
        out = out + t
    return out.cast("long")


def cosine_pairs_udf():
    """Arrow-vectorized twin of :func:`cosine` for PAIR-verification hot
    paths: one numpy row-wise dot per batch instead of an interpreted
    per-element fold (the fold evaluates its lambda per array slot —
    pure CPU per row; the arrow kernels cut the sf0.1 LSH near-dup
    pipeline 6.8 s → 3.9 s at 32 partitions, and 63 s → 4 s on the raw
    single-split fixture). numpy's vectorized sum can differ from the fold by
    ULPs; callers that grade against the fold-replaying oracle keep the
    expression kernel, and fixture-identical output of both kernels is
    pinned by test (same stance as the gemm argmax).

    Zero-norm vectors: 0/0 would yield NaN, which Spark orders ABOVE all
    doubles — a degenerate vector would pass every ``cos >= t`` filter
    and win every desc top-k. Mirror the documented unassignable-vector
    sentinel stance (semantic_dedup's centroid −1): emit −2.0, below the
    entire cosine range, so such pairs are excluded by any threshold and
    never ranked (the expression fold fails loudly under ANSI div-by-zero
    instead)."""
    import numpy as np

    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if not len(a):
            return pd.Series(dtype="float64")
        ma = np.array(list(a), dtype=np.float64)
        mb = np.array(list(b), dtype=np.float64)
        dot = (ma * mb).sum(axis=1)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        denom = na * nb
        with np.errstate(divide="ignore", invalid="ignore"):
            cos = dot / denom
        return pd.Series(np.where(denom == 0.0, -2.0, cos))

    return _cos


def hyperplane_bits_udf(planes: list[list[float]]):
    """Arrow-vectorized twin of :func:`random_hyperplane_bits`: sign bits
    from one ``M @ Pᵀ`` gemm per batch, packed to a long. A sign can
    differ from the fold only when a dot product sits within ULPs of
    zero (Gaussian planes make exact zeros measure-zero); fixture-
    identical bucket output is pinned by test."""
    import numpy as np

    pmat = np.array(planes, dtype=np.float64)
    weights = (1 << np.arange(len(planes), dtype=np.int64))

    @F.pandas_udf("long")
    def _sig(v: pd.Series) -> pd.Series:
        if not len(v):
            return pd.Series(dtype="int64")
        mat = np.array(list(v), dtype=np.float64)
        bits = (mat @ pmat.T) >= 0.0
        return pd.Series(bits @ weights)

    return _sig

"""Vector column expressions for similarity search ([EXT], SURVEY §2.C).

Cosine similarity is built from native higher-order functions
(``zip_with`` + ``aggregate``) so the arithmetic is a deterministic
sequential left-fold over doubles — bit-reproducible and exactly
mirrorable in the DuckDB oracle. No UDF, no Python in the hot path; at
scale the dot products run inside whole-stage codegen next to the join.
"""

from __future__ import annotations

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


def random_hyperplane_bits(vec: Column, planes: list[list[float]]) -> Column:
    """LSH signature: one sign bit per fixed hyperplane, packed to a long.

    ``planes`` are driver-side constants (deterministic, seeded), inlined as
    literal arrays — the comparison is pure codegen, no shuffle, no UDF.
    """
    v = as_double_array(vec)
    bit_terms = []
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in p])
        positive = dot(v, plane) >= 0
        bit_terms.append(F.when(positive, F.lit(1 << i)).otherwise(F.lit(0)))
    out = F.lit(0)
    for t in bit_terms:
        out = out + t
    return out.cast("long")

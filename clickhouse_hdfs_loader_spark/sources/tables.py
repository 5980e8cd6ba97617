"""Columnar sources: Parquet / ORC readers over the test-data star schema.

Reference coverage: ORC source = OrcLoaderMapper.java:22-30 +
OrcRecordDecoder.java:26-45 (positional struct fields coerced to string);
Parquet is [EXT] (the driver's fixtures are parquet — SURVEY §2.C). At
scale both formats give Catalyst predicate pushdown, column pruning and
partition pruning for free; readers here simply centralize table access.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings")


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # runtime-settable; required even under a caller-provided vanilla
        # session (the driver's), not just our session factory
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # events.ts is parquet TIMESTAMP(NANOS); with nanosAsLong it arrives as
    # raw ns since epoch. Truncate to µs (integer DIV — a double round-trip
    # would lose precision at 2^63 ns scale) exactly like DuckDB's ns→µs
    # read, so oracle comparisons see identical instants.
    for f_ in df.schema.fields:
        if f_.name == "ts" and f_.dataType.typeName() in ("long", "bigint"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def load_star(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Expose every table as a SQL view so ``spark.sql`` mirrors the DuckDB
    oracle's pre-registered views."""
    for t in TABLES:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)


def read_orc_stringly(spark: SparkSession, path: str) -> DataFrame:
    """ORC read with every field coerced to string — byte-parity with the
    reference's ``OrcStruct.getFieldValue(i).toString()`` decode
    (OrcRecordDecoder.java:32-45). Prefer native types when the target
    schema is known; this exists for strict parity loads."""
    df = spark.read.orc(path)
    return df.select([F.col(c).cast("string").alias(c) for c in df.columns])

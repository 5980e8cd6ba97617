"""Engine function surface.

``register_sql_functions`` exposes the Python-side engine functions to
``spark.sql`` users — the SQL twin of the DataFrame helpers (the murmur
routing hash is otherwise unreachable from pure SQL).

Reference parity: the routing hash is the loader's P1 shard hash
(AbstractClickhouseLoaderMapper.java:60,276-284 — Guava murmur3_128
``hashString`` UTF-16LE, ``asInt() & Integer.MAX_VALUE``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import SparkSession


def register_sql_functions(spark: SparkSession) -> None:
    """Register engine UDFs in the session's SQL function registry:

    - ``guava_shard_code(key)`` — murmur3_128 ``asInt() & MAX_INT``
      (reference P1 routing hash, Guava-parity, vectorized numpy)
    - ``guava_shard(key, total_weight)`` — weighted slot in
      ``[0, total_weight)``: ``guava_shard_code(key) % total_weight``,
      the value the cumulative-weight walk maps onto a shard
    - ``winnow_size(text)`` — number of winnowing fingerprints

    Safe to call more than once per session (re-registration replaces).
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import IntegerType, LongType

    from .fingerprint import winnow_batch
    from .murmur_np import guava_shard_codes

    @F.pandas_udf(LongType())
    def _code(keys: pd.Series) -> pd.Series:
        return pd.Series(guava_shard_codes([str(k) for k in keys]))

    @F.pandas_udf(LongType())
    def _slot(keys: pd.Series, weights: pd.Series) -> pd.Series:
        codes = guava_shard_codes([str(k) for k in keys])
        return pd.Series(codes % weights.astype("int64").to_numpy())

    @F.pandas_udf(IntegerType())
    def _winnow_size(texts: pd.Series) -> pd.Series:
        fps = winnow_batch(texts.tolist())
        return pd.Series([len(f) for f in fps], dtype="int32")

    spark.udf.register("guava_shard_code", _code)
    spark.udf.register("guava_shard", _slot)
    spark.udf.register("winnow_size", _winnow_size)

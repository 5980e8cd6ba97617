"""De-circularized loader_throughput goldens: the ``shard_sum`` literals in
the loader oracles (plans/queries.py) must NOT be "whatever the engine
printed once". This module re-derives both, Spark-free:

- parity path: pyarrow column read → guava_shard_codes (the numpy
  murmur3_128, itself pinned to Guava byte-for-byte in tests/test_murmur.py)
  → inline cumulative-weight walk. No Spark, no DataFrame, no UDF.
- jvm path: an INDEPENDENT pure-Python XXH64 written from the public spec
  (https://github.com/Cyan4973/xxHash, XXH64 with seed 42 like Spark's
  ``F.xxhash64``), cross-pinned against Spark on a handful of keys, then
  rolled over the full fixture column.

If either derived sum stops matching the oracle literal, the GOLDEN (or the
fixture) changed — not merely the engine.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from clickhouse_hdfs_loader_spark.functions.murmur_np import guava_shard_codes

SF_GRADING = "/root/testdata/sf0.01"

# the loader queries' topology: weights (2, 1, 1) → slot table [0, 0, 1, 2]
SLOT_TABLE = [0, 0, 1, 2]
TOTAL_WEIGHT = 4

# --- independent XXH64 (public spec; NOT the engine's code path) ---------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, lane: int) -> int:
    return (_rotl((acc + lane * _P2) & _M, 31) * _P1) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    n, i = len(data), 0
    if n >= 32:
        v1, v2 = (seed + _P1 + _P2) & _M, (seed + _P2) & _M
        v3, v4 = seed, (seed - _P1) & _M
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        for v in (v1, v2, v3, v4):
            h = ((h ^ _round(0, v)) * _P1 + _P4) & _M
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i + 8 <= n:
        h = (_rotl(h ^ _round(0, int.from_bytes(data[i:i + 8], "little")), 27)
             * _P1 + _P4) & _M
        i += 8
    if i + 4 <= n:
        h = (_rotl(h ^ (int.from_bytes(data[i:i + 4], "little") * _P1) & _M, 23)
             * _P2 + _P3) & _M
        i += 4
    while i < n:
        h = (_rotl(h ^ (data[i] * _P5) & _M, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _orderkeys() -> list[str]:
    col = pq.read_table(f"{SF_GRADING}/lineitem.parquet",
                        columns=["l_orderkey"]).column(0)
    return [str(v) for v in col.to_pylist()]


def test_xxh64_model_matches_spark(spark):
    """Pin the independent XXH64 model to Spark's F.xxhash64 (seed 42,
    utf-8 bytes of the string) before trusting it for the derivation:
    fixed edge-case keys (every length-class branch of the algorithm)
    plus 200 seeded random strings spanning 0-96 bytes, one Spark job."""
    import random

    from pyspark.sql import functions as F
    keys = ["1", "42", "599042", "", "abcdefghijklmnopqrstuvwxyz0123456789!",
            "x" * 100]
    rnd = random.Random(20260813)
    alphabet = "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789 _-./:@"
    keys += ["".join(rnd.choice(alphabet) for _ in range(rnd.randrange(0, 97)))
             for _ in range(200)]
    keys = sorted(set(keys))
    df = spark.createDataFrame([(k,) for k in keys], ["k"])
    got = {r["k"]: r["h"] for r in
           df.select("k", F.xxhash64("k").alias("h")).collect()}
    for k in keys:
        expect = xxh64(k.encode())
        signed = expect - (1 << 64) if expect >= (1 << 63) else expect
        assert got[k] == signed, k


def test_loader_shard_sum_golden_derivation_parity():
    """44219 (loader_throughput oracle) from pyarrow + Guava-pinned numpy
    murmur + inline weight walk — no Spark anywhere."""
    codes = guava_shard_codes(_orderkeys())
    shard_sum = sum(SLOT_TABLE[c % TOTAL_WEIGHT] for c in codes.tolist())
    assert shard_sum == 44219


def test_loader_shard_sum_golden_derivation_jvm():
    """45779 (loader_throughput_jvm oracle) from the independent XXH64
    model: slot = (hash & 2⁶³-1) % total_weight, same weight walk."""
    shard_sum = 0
    for k in _orderkeys():
        h = xxh64(k.encode())
        shard_sum += SLOT_TABLE[(h & 0x7FFFFFFFFFFFFFFF) % TOTAL_WEIGHT]
    assert shard_sum == 45779

"""Guava-compatible MurmurHash3 x64 128-bit, used for shard routing parity.

The reference routes each row to a ClickHouse shard with
``Hashing.murmur3_128().hashString(key).asInt() & Integer.MAX_VALUE``
(reference: AbstractClickhouseLoaderMapper.java:60,270-284;
ShardingTest.java:13-23). Guava's charset-less ``hashString`` hashes the
UTF-16LE code units of the string, and ``asInt()`` reads the first four
bytes of the 16-byte digest little-endian (i.e. the low 32 bits of h1).

This module implements the standard MurmurHash3 x64_128 (seed 0) in pure
Python, exactly matching Guava bit-for-bit (golden vectors generated from
guava-33.4.8 live in tests/test_murmur.py). Spark's built-in ``F.hash`` is
murmur3_32 over Spark's internal encoding and cannot reproduce this.

Scale note: the pure-Python hash runs inside an Arrow-batched pandas UDF
(``murmur3_shard_udf``), so the per-row cost is Python-loop-bound but
batch-amortized; at 100 TB you would register the identical algorithm as a
JVM UDF or push routing into ClickHouse itself. The UDF is only on the
write path (one pass), never in analytical queries.
"""

from __future__ import annotations

MASK64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & MASK64


def _fmix64(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & MASK64
    k ^= k >> 33
    return k


def murmur3_128(data: bytes, seed: int = 0) -> bytes:
    """MurmurHash3 x64_128 digest (16 bytes, h1 LE then h2 LE)."""
    h1 = seed & MASK64
    h2 = seed & MASK64
    length = len(data)
    nblocks = length // 16

    for i in range(nblocks):
        off = i * 16
        k1 = int.from_bytes(data[off : off + 8], "little")
        k2 = int.from_bytes(data[off + 8 : off + 16], "little")

        k1 = (k1 * _C1) & MASK64
        k1 = _rotl64(k1, 31)
        k1 = (k1 * _C2) & MASK64
        h1 ^= k1
        h1 = _rotl64(h1, 27)
        h1 = (h1 + h2) & MASK64
        h1 = (h1 * 5 + 0x52DCE729) & MASK64

        k2 = (k2 * _C2) & MASK64
        k2 = _rotl64(k2, 33)
        k2 = (k2 * _C1) & MASK64
        h2 ^= k2
        h2 = _rotl64(h2, 31)
        h2 = (h2 + h1) & MASK64
        h2 = (h2 * 5 + 0x38495AB5) & MASK64

    tail = data[nblocks * 16 :]
    if tail:
        k1 = int.from_bytes(tail[:8], "little")
        k2 = int.from_bytes(tail[8:16], "little")
        if k2:
            k2 = (k2 * _C2) & MASK64
            k2 = _rotl64(k2, 33)
            k2 = (k2 * _C1) & MASK64
            h2 ^= k2
        if k1:
            k1 = (k1 * _C1) & MASK64
            k1 = _rotl64(k1, 31)
            k1 = (k1 * _C2) & MASK64
            h1 ^= k1

    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    h1 = _fmix64(h1)
    h2 = _fmix64(h2)
    h1 = (h1 + h2) & MASK64
    h2 = (h2 + h1) & MASK64
    return h1.to_bytes(8, "little") + h2.to_bytes(8, "little")


def guava_hash_string_as_int(s: str) -> int:
    """``Hashing.murmur3_128().hashString(s).asInt()`` — signed 32-bit."""
    digest = murmur3_128(s.encode("utf-16-le"))
    return int.from_bytes(digest[:4], "little", signed=True)


def guava_shard_code(s: str) -> int:
    """``asInt() & Integer.MAX_VALUE`` — non-negative 31-bit code."""
    return guava_hash_string_as_int(s) & 0x7FFFFFFF


def guava_shard_index(s: str, total_weight: int) -> int:
    """Shard slot in [0, total_weight): ``code % total_weight``."""
    return guava_shard_code(s) % total_weight

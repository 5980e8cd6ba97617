"""Winnowing document fingerprints (rolling hash + window minimum).

Implements the standard winnowing scheme (Schleimer, Wilkerson, Aiken —
"Winnowing: Local Algorithms for Document Fingerprinting", SIGMOD 2003):
k-gram rolling hashes, then the minimum hash per sliding window of w
hashes, keeping rightmost minima. Deterministic, so fingerprints are
stable across runs and machines.

This is the one text op that is genuinely iterative per document, so it
runs as an Arrow-batched pandas UDF (SURVEY §7: pandas UDFs only where
built-ins can't express the semantics). The md5/exact fingerprints in
functions/text.py stay fully native.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType

_B = 1_000_003          # polynomial base
_M = (1 << 61) - 1      # Mersenne modulus


def winnow(text: str, k: int = 8, w: int = 4) -> list[int]:
    s = text.lower()
    n = len(s)
    if n < k:
        return []
    # rolling k-gram hashes
    pow_k = pow(_B, k - 1, _M)
    h = 0
    hashes = []
    for i, ch in enumerate(s):
        h = (h * _B + ord(ch)) % _M
        if i >= k:
            h = (h - ord(s[i - k]) * pow_k * _B) % _M
        if i >= k - 1:
            hashes.append(h)
    # winnow: rightmost minimum of each window of w hashes
    out: list[int] = []
    last = -1
    for start in range(0, len(hashes) - w + 1):
        window = hashes[start:start + w]
        m = min(window)
        idx = start + max(i for i, v in enumerate(window) if v == m)
        if idx != last:
            out.append(m)
            last = idx
    return out


def winnow_udf(k: int = 8, w: int = 4) -> Column:
    @F.pandas_udf(ArrayType(LongType()))
    def _winnow(texts: pd.Series) -> pd.Series:
        return texts.map(lambda t: winnow(t or "", k, w))

    return _winnow

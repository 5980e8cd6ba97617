"""Text-analysis column expressions ([EXT] — SURVEY §2.C / BASELINE.json
north star: LLM-data-pipeline operators at 100 TB scale).

Everything here is a **native Column expression** (JVM whole-stage
codegen, zero Python in the hot path) unless noted. Each expression has a
1:1 ANSI-SQL twin used by the DuckDB oracle — see plans/queries.py — so
regexes are restricted to the dialect intersection of Java regex and RE2.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

# Tiny per-language stopword lists for the n-gram language-ID heuristic.
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "you", "that", "it", "for"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "fr": ("le", "la", "les", "et", "des", "est", "une", "dans", "que", "pour"),
    "es": ("el", "los", "de", "que", "y", "en", "un", "es", "una", "por"),
}

WORD_RE = "[A-Za-z0-9]+"
# BPE-ish subword splitter: runs of letters, runs of digits, or single
# non-space symbols — approximates byte-pair tokenizer segmentation.
BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def whitespace_token_count(c: Column) -> Column:
    """Tokens = maximal non-space runs. SQL twin:
    ``len(regexp_extract_all(s, '[^ ]+'))``."""
    return F.regexp_count(c, F.lit("[^ ]+"))


def bpe_token_count(c: Column) -> Column:
    """Approximate BPE token count. SQL twin uses the same pattern."""
    return F.regexp_count(c, F.lit(BPE_RE))


def stopword_hits(c: Column, lang: str) -> Column:
    """Count of stopword occurrences for one language."""
    pat = r"\b(" + "|".join(STOPWORDS[lang]) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pat))


def lang_id(c: Column) -> Column:
    """n-gram-heuristic language ID: argmax of stopword hit counts with a
    deterministic precedence (en > de > fr > es > unknown on ties/zero)."""
    en, de = stopword_hits(c, "en"), stopword_hits(c, "de")
    fr, es = stopword_hits(c, "fr"), stopword_hits(c, "es")
    best = F.greatest(en, de, fr, es)
    return (F.when(best == 0, F.lit("unknown"))
            .when(en == best, F.lit("en"))
            .when(de == best, F.lit("de"))
            .when(fr == best, F.lit("fr"))
            .otherwise(F.lit("es")))


def punct_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]"))


def alpha_count(c: Column) -> Column:
    return F.regexp_count(c, F.lit("[A-Za-z]"))


def quality_score(c: Column) -> Column:
    """Deterministic quality heuristic in [0,1]: length band + alpha ratio −
    punctuation ratio. Mirrors the length/punct/stopword-ratio scoring used
    by LLM corpus filters; exact arithmetic so the oracle hash-matches."""
    n = F.length(c).cast("double")
    words = whitespace_token_count(c).cast("double")
    alpha_ratio = alpha_count(c).cast("double") / F.greatest(n, F.lit(1.0))
    punct_ratio = punct_count(c).cast("double") / F.greatest(n, F.lit(1.0))
    len_band = F.when((n >= 100) & (n <= 2000), F.lit(1.0)) \
                .when(n < 100, n / F.lit(100.0)) \
                .otherwise(F.lit(2000.0) / n)
    mean_word_len = n / F.greatest(words, F.lit(1.0))
    word_band = F.when((mean_word_len >= 3) & (mean_word_len <= 12), F.lit(1.0)) \
                 .otherwise(F.lit(0.5))
    score = (F.lit(0.4) * len_band + F.lit(0.3) * alpha_ratio
             + F.lit(0.3) * word_band - F.lit(0.2) * punct_ratio)
    return F.least(F.greatest(score, F.lit(0.0)), F.lit(1.0))


def normalize_text(c: Column) -> Column:
    """Fingerprint normalization: lowercase, strip non-alnum to single
    spaces, trim. SQL twin: ``trim(regexp_replace(lower(s), '[^a-z0-9]+',
    ' ', 'g'))``."""
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def md5_fingerprint(c: Column) -> Column:
    """Document fingerprint = md5 of normalized text (exact-dedup key)."""
    return F.md5(normalize_text(c))


def words_array(c: Column) -> Column:
    """Lowercased word tokens as an array (shingling input)."""
    return F.filter(F.split(F.lower(c), r"[^a-z0-9]+"), lambda w: w != "")


def shingles(c: Column, k: int = 3) -> Column:
    """Distinct word ``k``-gram shingles, joined by single spaces.

    Built from native array ops: ``sequence`` over start offsets +
    ``transform``/``slice`` — no UDF, fully codegen'd.
    """
    ws = words_array(c)
    n = F.size(ws)
    # sequence(1, 0) would DESCEND through 0 (invalid slice start) — docs
    # shorter than k words get an explicitly empty shingle set
    starts = F.when(n >= k, F.sequence(F.lit(1), n - (k - 1))) \
              .otherwise(F.array().cast("array<int>"))
    grams = F.transform(starts, lambda i: F.concat_ws(" ", F.slice(ws, i, k)))
    return F.array_distinct(grams)


def shingles_udf(k: int = 3) -> Column:
    """Arrow-vectorized twin of :func:`shingles` — same output set.

    Measured 7× faster than the expression version at sf0.1: Spark's
    higher-order array functions (``transform``/``slice``/``array_distinct``)
    evaluate interpreted per element, so the "native" chain loses to an
    Arrow-batched Python loop. Per-partition, no shuffle impact — safe at
    scale; parity with :func:`shingles` is pinned by tests.
    """
    import re

    pat = re.compile(r"[^a-z0-9]+")

    @F.pandas_udf(ArrayType(StringType()))
    def _shingles(texts: pd.Series) -> pd.Series:
        def grams(t: str) -> list[str]:
            ws = [w for w in pat.split((t or "").lower()) if w]
            if len(ws) < k:
                return []
            return list({" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)})
        return texts.map(grams)

    return _shingles


def ngrams_udf(k: int = 2) -> Column:
    """ALL word ``k``-grams (non-distinct, order preserved) — the input to
    repetition-ratio quality filters, which need occurrence COUNTS where
    :func:`shingles_udf` dedups. Same Arrow-vectorized shape (interpreted
    HOF chains lose badly — see note below); same tokenizer as
    :func:`words_array`. SQL twin:
    ``list_transform(generate_series(1, len(ws)-k+1),
    i -> array_to_string(ws[i:i+k-1], ' '))``."""
    import re

    pat = re.compile(r"[^a-z0-9]+")

    @F.pandas_udf(ArrayType(StringType()))
    def _ngrams(texts: pd.Series) -> pd.Series:
        def grams(t: str) -> list[str]:
            ws = [w for w in pat.split((t or "").lower()) if w]
            if len(ws) < k:
                return []
            return [" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)]
        return texts.map(grams)

    return _ngrams


# NOTE: a pure-expression hash-combined shingle variant (xxhash64 per word,
# rotate-xor k-gram combine via nested F.transform) was benchmarked and
# REJECTED: Spark evaluates higher-order array lambdas interpreted, and the
# chain measured 36× slower than shingles_udf + post-explode xxhash64 at
# sf0.1 (24.9s vs 0.7s for the same 260k distinct shingles). The production
# shingle path is shingles_udf below; dedup._shingle_hashes converts its
# strings to 8-byte shuffle keys right after the explode.


def jaro_winkler_e6_udf():
    """Arrow-vectorized Jaro-Winkler similarity in EXACT e6 integer
    units (Jaro 1989 / Winkler 1990, public algorithm — the record-
    linkage scorer the fuzzy_join family composes with):

        jaro_e6 = (m²·|b| + m²·|a| + (m−t)·|a|·|b|) · 10⁶
                  div (3·|a|·|b|·m)
        jw_e6   = jaro_e6 + (l · (10⁶ − jaro_e6)) div 10
                  when jaro_e6 > 700000, else jaro_e6

    with m = matches inside the standard window (max(0, max(|a|,|b|)
    div 2 − 1) — the floor matters: 1-char identical strings have an
    empty window otherwise and would score 0, review-caught), t =
    half-transpositions div 2 (the Apache-commons integer convention),
    l = common prefix capped at 4, p = 0.1 exact as ``div 10``, and
    Winkler's ORIGINAL 0.7 boost threshold (DuckDB gates there too —
    an ungated boost diverges from it by up to 0.03·l on low-jaro
    shared-prefix pairs, review-measured at 0.056). The rational
    formula is the CONTRACT — every division is a final integer
    ``div``, so a Fraction replay matches exactly (pinned in tests;
    DuckDB's float jaro_winkler_similarity is a sanity cross-check
    only). Identical strings (including empty = empty) score 10⁶; an
    empty vs non-empty pair scores 0; NULL propagates NULL. Strings
    beyond 2000 chars raise (the ·10⁶ numerator bound) rather than
    silently truncating.

    Row-at-a-time character DP is unavoidable here (the same
    reasoning as shingles_udf: Arrow batching amortizes the Python
    cost; lengths are name/title-scale in linkage practice)."""
    import pandas as pd
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _jw(a: pd.Series, b: pd.Series) -> pd.Series:
        def score(s1, s2):
            if s1 is None or s2 is None:
                return None
            la, lb = len(s1), len(s2)
            if la > 2000 or lb > 2000:
                raise ValueError(
                    "jaro_winkler_e6: strings beyond 2000 chars "
                    "exceed the exact e6 integer bound")
            if la == 0 and lb == 0:
                return 1_000_000
            if la == 0 or lb == 0:
                return 0
            win = max(0, max(la, lb) // 2 - 1)
            ma = [False] * la
            mb = [False] * lb
            m = 0
            for i, ch in enumerate(s1):
                lo, hi = max(0, i - win), min(lb, i + win + 1)
                for j in range(lo, hi):
                    if not mb[j] and s2[j] == ch:
                        ma[i] = mb[j] = True
                        m += 1
                        break
            if m == 0:
                return 0
            k = 0
            jj = 0
            for i in range(la):
                if ma[i]:
                    while not mb[jj]:
                        jj += 1
                    if s1[i] != s2[jj]:
                        k += 1
                    jj += 1
            t = k // 2
            jaro = ((m * m * lb + m * m * la + (m - t) * la * lb)
                    * 1_000_000) // (3 * la * lb * m)
            if jaro <= 700_000:
                return jaro
            l = 0
            for x, y in zip(s1[:4], s2[:4]):
                if x != y:
                    break
                l += 1
            return jaro + (l * (1_000_000 - jaro)) // 10

        return pd.Series([score(x, y) for x, y in zip(a, b)],
                         dtype="object")

    return _jw


def damerau_levenshtein_udf():
    """Arrow-vectorized FULL Damerau-Levenshtein distance over UTF-8
    BYTES (Lowrance-Wagner 1975, public algorithm — insert, delete,
    substitute, and adjacent transposition, with edits allowed inside
    a transposed pair, so ``CA → ABC`` costs 2 where the restricted
    OSA variant says 3 — pinned by hand case). Byte semantics are
    DELIBERATE: they match DuckDB's native ``damerau_levenshtein``
    (verified: 'héllo' vs 'hello' = 2, the é being two UTF-8 bytes)
    and ClickHouse's byte-string distance family, which is what makes
    an exact cross-engine oracle possible; a codepoint variant would
    have no engine twin to grade against.

    NULL propagates NULL; an empty side costs the other side's byte
    length. Strings beyond 2000 bytes raise (the jaro_winkler bound
    stance — O(|a|·|b|) DP, never a silent truncation).

    The DP runs ROW-vectorized in numpy (r16, guide §4.2): the
    transposition lookups are pure gathers (``last`` is a 256-slot
    byte table; the per-row ``db`` column is a forward-filled
    match-position scan), and the in-row insert dependency
    ``d[j] = min(c[j], d[j-1]+1)`` folds into a prefix scan —
    ``d = j + cummin(c - j)`` — so each text row is ~12 numpy passes
    instead of an interpreted cell loop. Bit-identical to the scalar
    Lowrance-Wagner (parity fuzz-pinned in tests/test_text_functions)."""
    import pandas as pd
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _dl(a: pd.Series, b: pd.Series) -> pd.Series:
        return pd.Series([damerau_levenshtein_bytes(x, y)
                          for x, y in zip(a, b)],
                         dtype="object")

    return _dl


def damerau_levenshtein_bytes(x: "str | None", y: "str | None"):
    """FULL Damerau-Levenshtein over UTF-8 bytes (Lowrance-Wagner),
    numpy row-vectorized — the kernel behind
    :func:`damerau_levenshtein_udf`; see its docstring for semantics."""
    if x is None or y is None:
        return None
    s1b, s2b = x.encode("utf-8"), y.encode("utf-8")
    la, lb = len(s1b), len(s2b)
    if la > 2000 or lb > 2000:
        raise ValueError(
            "damerau_levenshtein: strings beyond 2000 bytes "
            "exceed the quadratic-DP bound")
    if la == 0:
        return lb
    if lb == 0:
        return la
    s1 = np.frombuffer(s1b, dtype=np.uint8)
    s2 = np.frombuffer(s2b, dtype=np.uint8)
    inf = la + lb
    d = np.full((la + 2, lb + 2), inf, dtype=np.int32)
    d[1:, 1] = np.arange(la + 1, dtype=np.int32)
    d[1, 1:] = np.arange(lb + 1, dtype=np.int32)
    last = np.zeros(256, dtype=np.int64)      # last row of each byte
    jpos = np.arange(1, lb + 1, dtype=np.int32)
    j_all = np.arange(lb + 1, dtype=np.int32)
    for i in range(1, la + 1):
        ch = s1[i - 1]
        match = s2 == ch
        # db at cell (i, j) = last j' < j with s2[j'-1] == s1[i-1]
        acc = np.maximum.accumulate(np.where(match, jpos, 0))
        db = np.empty(lb, dtype=np.int64)
        db[0] = 0
        db[1:] = acc[:-1]
        i1 = last[s2]                          # last row of s2[j-1]
        diag = d[i, 1:lb + 1] + (~match)       # d[i][j] + cost
        up = d[i, 2:lb + 2] + 1                # d[i][j+1] + 1 (delete)
        trans = d[i1, db] + (i - i1).astype(np.int32) \
            + (jpos - db - 1).astype(np.int32)  # (i-i1-1)+1+(j-j1-1)
        cand = np.minimum(np.minimum(diag, up), trans)
        # insert dependency d[i+1][j+1] = min(cand, d[i+1][j] + 1):
        # prefix-scan with base d[i+1][1] = i
        c = np.empty(lb + 1, dtype=np.int32)
        c[0] = i
        c[1:] = cand
        d[i + 1, 1:] = np.minimum.accumulate(c - j_all) + j_all
        last[ch] = i
    return int(d[la + 1, lb + 1])


def byte_jaccard_e6_udf():
    """Arrow-vectorized byte-SET Jaccard similarity in half-up e6
    integer units — ClickHouse's ``stringJaccardIndex`` / DuckDB's
    ``jaccard`` semantics (the set of distinct UTF-8 BYTES, not
    codepoints or shingles — verified against DuckDB: 'héé' vs 'he'
    = 0.25; for token/shingle Jaccard use the dedup family):

        jac_e6 = (2 · |A∩B| · 10⁶ + |A∪B|) div (2 · |A∪B|)

    — exact integer HALF-UP rounding of |A∩B|/|A∪B| · 10⁶ (|A∪B| ≤
    256 bounds everything trivially). Identical non-empty strings
    score 10⁶. NULL propagates NULL; an EMPTY side yields NULL too,
    deliberately: DuckDB's ``jaccard`` raises on empty inputs, so
    empties must be excluded by twins — a 0/1 convention here would
    have no oracle (documented, pinned by test)."""
    import pandas as pd
    from pyspark.sql.types import LongType

    @F.pandas_udf(LongType())
    def _bj(a: pd.Series, b: pd.Series) -> pd.Series:
        def sim(x, y):
            if x is None or y is None or x == "" or y == "":
                return None
            sa, sb = set(x.encode("utf-8")), set(y.encode("utf-8"))
            inter, union = len(sa & sb), len(sa | sb)
            return (2 * inter * 1_000_000 + union) // (2 * union)

        return pd.Series([sim(x, y) for x, y in zip(a, b)],
                         dtype="object")

    return _bj

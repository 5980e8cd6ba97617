"""Byte-pair-encoding tokenizer training + encoding ([EXT] — the
training-data pipeline's tokenizer step, Sennrich et al. 2016).

Scale design: the classic BPE loop is iterative, but every iteration
runs on the WORD-FREQUENCY table — one corpus pass builds
``(word, count)`` and everything after scales with |vocabulary| (≈10⁷
rows for web-scale text), never corpus bytes. Per merge iteration: one
adjacent-pair explode + count aggregate (shuffle rows = Σ word symbol
lengths over the vocab), one 1-row argmax to the driver (deterministic
count-desc / pair-asc tie-break — documented tiny collect), one
Arrow-batched merge map, and an eager ``localCheckpoint`` so the plan
never deepens with the merge count.

Determinism: integer counts + the total tie-break order make the merge
sequence a pure function of the corpus — pinned in tests against an
independent pure-Python Sennrich replay (same stance as the murmur
goldens).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import words_array

END = "</w>"


def _word_symbols(docs: DataFrame, text_col: str) -> DataFrame:
    """One corpus pass → (syms: array<string>, cnt) per distinct word,
    symbols = characters + the end-of-word marker."""
    words = (docs.select(F.explode(words_array(F.col(text_col)))
                         .alias("w"))
             .groupBy("w").agg(F.count(F.lit(1)).alias("cnt")))
    return words.select(
        "cnt",
        F.concat(F.split(F.col("w"), ""), F.array(F.lit(END)))
        .alias("syms"))


def _merge_udf(a: str, b: str):
    @F.pandas_udf("array<string>")
    def m(col: pd.Series) -> pd.Series:
        out = []
        for syms in col:
            res = []
            i, n = 0, len(syms)
            while i < n:
                if i + 1 < n and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            out.append(res)
        return pd.Series(out)

    return m


def bpe_train(docs: DataFrame, num_merges: int = 50,
              text_col: str = "text",
              min_pair_count: int = 2) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus; returns the
    ordered merge list (the tokenizer model — num_merges × 2 strings on
    the driver, nothing else ever leaves the cluster). Stops early when
    the best remaining pair falls under ``min_pair_count`` (merging
    hapax pairs memorizes noise)."""
    sym = _word_symbols(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        # fully-merged words collapse to ONE symbol; F.sequence(0, -1)
        # on those yields [0, -1] and syms[i+1] trips ANSI
        # INVALID_ARRAY_INDEX — exclude them (they have no pairs)
        pairs = (sym.where(F.size("syms") >= 2)
            .select(
            "cnt",
            F.explode(F.transform(
                F.sequence(F.lit(0), F.size("syms") - 2),
                lambda i: F.struct(F.col("syms")[i].alias("a"),
                                   F.col("syms")[i + 1].alias("b"))))
            .alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("total")))
        best = (pairs.orderBy(F.col("total").desc(), "a", "b")
                .limit(1).collect())      # 1 row — the argmax merge
        if not best or best[0]["total"] < min_pair_count:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        prev = sym
        sym = (sym.withColumn("syms", _merge_udf(a, b)(F.col("syms")))
               .localCheckpoint(eager=True))
        prev.unpersist()      # drop the superseded checkpoint's blocks —
        # without this the loop pins num_merges vocab copies in storage
    return merges


def bpe_encode(docs: DataFrame, merges: list[tuple[str, str]],
               text_col: str = "text",
               id_col: str = "doc_id") -> DataFrame:
    """Encode documents with a trained merge list: per doc, the BPE
    token sequence (words split to chars+``</w>``, merges applied in
    training order) plus the token count — the real tokens-per-doc
    number a packing/budgeting stage should use instead of the
    whitespace approximation.

    One Arrow-batched pass; the merge list rides the closure (tiny).
    Per-word results are memoized within each batch, so cost scales
    with distinct words per batch, not repetitions."""
    ranks = {pair: i for i, pair in enumerate(merges)}

    def encode_word(word: str, cache: dict) -> list[str]:
        got = cache.get(word)
        if got is not None:
            return got
        syms = list(word) + [END]
        while len(syms) > 1:
            ranked = [(ranks[(syms[i], syms[i + 1])], i)
                      for i in range(len(syms) - 1)
                      if (syms[i], syms[i + 1]) in ranks]
            if not ranked:
                break
            r, _ = min(ranked)
            a, b = merges[r]
            res, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            syms = res
        cache[word] = syms
        return syms

    import re
    word_re = re.compile(r"[a-z0-9]+")

    def run(batches):
        for pdf in batches:
            cache: dict = {}
            toks, counts = [], []
            for text in pdf["text"]:
                doc = []
                for w in word_re.findall((text or "").lower()):
                    doc.extend(encode_word(w, cache))
                toks.append(doc)
                counts.append(len(doc))
            yield pd.DataFrame({"doc_id": pdf["doc_id"].values,
                                "tokens": toks, "n_tokens": counts})

    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.col(text_col).alias("text"))
            .mapInPandas(run, schema="doc_id long, tokens array<string>, "
                                     "n_tokens long"))

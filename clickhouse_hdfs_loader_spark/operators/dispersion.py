"""Diversity, inequality, and robust-dispersion measures ([EXT]):
Simpson's diversity index, the Gini coefficient, MAD-based robust
outlier detection and its row-transform sibling (robust_scale),
rank-exact trimmed means, the Benford first-digit screen, and the PSI
distribution-drift index — the corpus-composition and data-quality
screens a training-data pipeline runs per source/shard (is one domain
dominating the mix? is the token-count distribution degenerating?
which rows are robust outliers? did the category mix shift between
snapshots?). Public textbook semantics (Simpson 1949, Gini 1912,
Hampel's MAD rule, Benford 1938, the credit-scoring PSI), re-derived
under the repo's graded-oracle discipline:

- float values milli-quantize to int64 BEFORE any aggregate, so every
  sum is order-free-exact and a DuckDB twin replays hash-identically;
- NULL/NaN/±Inf rows are excluded up-front
  (``analytics._quantizable_col``), mirrored as ``AND isfinite(v)`` in
  every SQL twin;
- medians are the exact LOWER median — an ELEMENT of the data, so any
  engine that can sort agrees bit-for-bit (exact_median_by_group's
  stance); position ties only permute equal values, so the value at
  the median position is deterministic without an id tie-break;
- the only divisions are final, guarded, integer ``div`` — no float
  appears anywhere in this module.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .analytics import _quantizable_col


def simpson_diversity(df: DataFrame, group_col: str,
                      cat_col: str) -> DataFrame:
    """Simpson's diversity index per group over a categorical column:
    the probability that two draws WITHOUT replacement land in the same
    category (the unbiased finite-sample form),

        D_e6  = (Σ_i n_i·(n_i−1)) · 10⁶ div (N·(N−1))
        GS_e6 = 10⁶ − D_e6                 (Gini-Simpson diversity)

    — exactly the screen for "one domain dominates this corpus shard".
    Pure integer end to end; NULL D when N < 2. Truncation makes D_e6
    undershoot by < 1 micro-unit; GS_e6 is DEFINED as its complement
    (the quantized formula is the CONTRACT, the cramers_v stance).

    Scale: one (group, category) count shuffle; the rollup runs on the
    |distinct categories| table. Overflow bound: Σn_i² ≤ N², so N must
    stay below ~3·10⁶ rows per group for the ·10⁶ product (coarsen by
    pre-bucketing categories or sharding the group beyond that — the
    bound raises loudly under ANSI, never wraps). NULL categories are
    excluded (mirror the WHERE in twins).

    Returns ``group, n, k, d_e6, gs_e6`` (k = distinct categories)."""
    counts = (df.where(F.col(cat_col).isNotNull())
              .groupBy(group_col, cat_col)
              .agg(F.count(F.lit(1)).alias("_c")))
    return (counts.groupBy(group_col)
            .agg(F.sum("_c").alias("n"),
                 F.count(F.lit(1)).alias("k"),
                 F.sum(F.col("_c") * (F.col("_c") - F.lit(1)))
                 .alias("_same"))
            .withColumn("d_e6", F.expr(
                "CASE WHEN n < 2 THEN NULL ELSE "
                "(_same * CAST(1000000 AS BIGINT)) div (n * (n - 1)) "
                "END"))
            .withColumn("gs_e6", F.expr(
                "CASE WHEN d_e6 IS NULL THEN NULL ELSE "
                "CAST(1000000 AS BIGINT) - d_e6 END"))
            .select(group_col, "n", "k", "d_e6", "gs_e6"))


def gini_coefficient(df: DataFrame, group_col: str,
                     value_col: str) -> DataFrame:
    """The Gini inequality coefficient per group over a NON-NEGATIVE
    value column (token counts, document lengths, per-key row counts —
    "how unequal is this distribution?"):

        with x₍₁₎ ≤ … ≤ x₍ₙ₎ the milli-quantized values ascending,
        num = 2·Σ i·x₍ᵢ₎ − (n+1)·Σx        den = n·Σx
        g_e6 = num·10⁶ div den             (exact, see below)

    Ties need no id tie-break: Σ i·x₍ᵢ₎ is invariant under permuting
    equal values within a run (the positions are a fixed set), so both
    engines agree however their sorts break ties. Negative values RAISE
    inside the projected expression (Gini is undefined there; silent
    clamping would lie) — NaN/±Inf/NULL rows are excluded first, so
    only genuine negatives trip it. NULL g when n < 1 or Σx = 0.

    The ·10⁶ scaling splits into two ·10³ steps via the remainder
    identity — ``t = (num·1000) div den; r = (num·1000) % den;
    g_e6 = t·1000 + (r·1000) div den`` — exact for the full int64 range
    of num·1000 (num ≤ den, so the bound is n·Σx_milli ≤ 9.2·10¹⁵;
    beyond that ANSI raises on the product, never wraps).

    Scale: one shuffle on the group key, one rank window over the same
    sort, one aggregate. Returns ``group, n, sum_milli, g_e6``."""
    vm = F.expr(
        f"CASE WHEN {value_col} < 0 THEN "
        f"raise_error('gini_coefficient: negative values are "
        f"undefined — filter or shift upstream') "
        f"ELSE CAST(floor(CAST({value_col} AS DOUBLE) * 1000) "
        f"AS BIGINT) END")
    w = Window.partitionBy(group_col).orderBy("_vm")
    ranked = (df.where(_quantizable_col(value_col))
              .select(F.col(group_col), vm.alias("_vm"))
              .withColumn("_i", F.row_number().over(w).cast("long")))
    agg = (ranked.groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("_vm").alias("sum_milli"),
                F.sum(F.col("_i") * F.col("_vm")).alias("_isum")))
    return (agg
            .withColumn("_num", F.expr(
                "2 * _isum - (n + 1) * sum_milli"))
            .withColumn("_den", F.expr("n * sum_milli"))
            .withColumn("g_e6", F.expr(
                "CASE WHEN n < 1 OR sum_milli = 0 THEN NULL ELSE "
                "((_num * 1000) div _den) * 1000"
                " + (((_num * 1000) % _den) * 1000) div _den END"))
            .select(group_col, "n", "sum_milli", "g_e6"))


def mad_outliers(df: DataFrame, group_col: str, value_col: str,
                 k: int = 3) -> DataFrame:
    """Robust outlier screen per group via the median absolute
    deviation (Hampel's rule): a row is an outlier when its absolute
    deviation from the group median exceeds ``k`` MADs — the
    mean/stddev-free sibling of the graded z-score screen, immune to
    the outliers it is hunting.

    Exact integer pipeline: values milli-quantize; the group median and
    the MAD are both exact LOWER medians (elements of the data —
    deterministic under ties without id tie-breaks, the
    exact_median_by_group stance); deviations, the k·MAD comparison,
    and the e4 rate are all int64. When MAD = 0 (over half the group
    identical) the rule degenerates to ``dev > 0`` — any row off the
    median is an outlier, the standard Hampel convention, documented
    rather than special-cased. NULL/NaN/±Inf rows are excluded
    up-front.

    Scale: ONE scan, ONE shuffle on the group key — both medians fold
    into whole-partition window maxima over the already-sorted rows
    (``max(CASE WHEN rn = median_pos THEN v END) OVER (PARTITION BY
    g)``), so no median join ever re-plans the source (the r7
    bloom-semi-join hazard; the first cut of this operator scanned the
    input 3×). Two sorts of the same partition (by value, then by
    deviation); per-group size bounds partition memory like any sorted
    window — shard hot groups upstream if one outgrows an executor.

    Returns ``group, n, median_milli, mad_milli, outlier_cnt,
    outlier_rate_e4``."""
    if int(k) < 1:
        raise ValueError(f"mad_outliers: k must be >= 1, got {k}")
    vm = F.floor(F.col(value_col).cast("double") * 1000).cast("long")
    wall = Window.partitionBy("_g")
    wv = Window.partitionBy("_g").orderBy("_vm")
    wd = Window.partitionBy("_g").orderBy("_dev")
    pos = F.floor((F.col("_n") + 1) / 2)
    d = (df.where(_quantizable_col(value_col))
         .select(F.col(group_col).alias("_g"), vm.alias("_vm"))
         .withColumn("_rn", F.row_number().over(wv))
         .withColumn("_n", F.count(F.lit(1)).over(wall))
         .withColumn("median_milli",
                     F.max(F.when(F.col("_rn") == pos, F.col("_vm")))
                     .over(wall))
         .withColumn("_dev", F.abs(F.col("_vm")
                                   - F.col("median_milli")))
         .withColumn("_rd", F.row_number().over(wd))
         .withColumn("mad_milli",
                     F.max(F.when(F.col("_rd") == pos, F.col("_dev")))
                     .over(wall)))
    return (d.groupBy("_g")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("median_milli").alias("median_milli"),
                 F.max("mad_milli").alias("mad_milli"),
                 F.sum(F.when(F.col("_dev")
                              > F.lit(int(k)).cast("long")
                              * F.col("mad_milli"), 1)
                       .otherwise(0)).alias("outlier_cnt"))
            .withColumn("outlier_rate_e4", F.expr(
                "(outlier_cnt * 10000) div n"))
            .select(F.col("_g").alias(group_col), "n", "median_milli",
                    "mad_milli", "outlier_cnt", "outlier_rate_e4"))


def tukey_outliers(df: DataFrame, group_col: str, value_col: str,
                   k_e3: int = 1500) -> DataFrame:
    """Tukey-fences outlier screen per group (the ClickHouse
    ``seriesOutliersDetectTukey`` decision rule as a summary
    aggregate): a row is an outlier when its value falls outside
    ``[Q1 − k·IQR, Q3 + k·IQR]`` — the boxplot rule, quartile-based
    where :func:`mad_outliers` is median-based.

    Exact integer pipeline: values milli-quantize; Q1/Q3 are the exact
    LOWER-quantile elements at rank ``ceil(n·q/1000)`` (the
    exact_quantiles_by_group element rule — deterministic under ties,
    no id tie-break needed); the fence multiplier is the integer
    ``k_e3`` thousandths (default 1500 = Tukey's 1.5), so the margin is
    ``(IQR·k_e3) div 1000`` — IQR ≥ 0 makes the truncation a floor,
    and everything downstream is int64 (safe while |vm|·k_e3 < 2^63).

    NULL/NaN/±Inf values are excluded up-front (mirror ``AND
    isfinite(v)`` in twins); NULL group keys form their own group, as
    in SQL.

    Scale: ONE scan, ONE shuffle on the group key — both quartiles
    fold into whole-partition window maxima over the already-sorted
    rows (the mad_outliers median-join-elimination shape; no quantile
    join ever re-plans the source), and the closing groupBy reuses the
    window's partitioning.

    Returns ``group, n, q1_milli, q3_milli, lo_milli, hi_milli,
    n_low, n_high, outlier_rate_e4``."""
    if int(k_e3) < 0:
        raise ValueError(f"tukey_outliers: k_e3 must be >= 0, "
                         f"got {k_e3}")
    k_e3 = int(k_e3)
    vm = F.floor(F.col(value_col).cast("double") * 1000).cast("long")
    wall = Window.partitionBy("_g")
    wv = Window.partitionBy("_g").orderBy("_vm")
    pos1 = F.expr("(_n * 250 + 999) div 1000")
    pos3 = F.expr("(_n * 750 + 999) div 1000")
    d = (df.where(_quantizable_col(value_col))
         .select(F.col(group_col).alias("_g"), vm.alias("_vm"))
         .withColumn("_rn", F.row_number().over(wv))
         .withColumn("_n", F.count(F.lit(1)).over(wall))
         .withColumn("q1_milli",
                     F.max(F.when(F.col("_rn") == pos1, F.col("_vm")))
                     .over(wall))
         .withColumn("q3_milli",
                     F.max(F.when(F.col("_rn") == pos3, F.col("_vm")))
                     .over(wall))
         .withColumn("_lo", F.expr(
             f"q1_milli - ((q3_milli - q1_milli) * {k_e3}) div 1000"))
         .withColumn("_hi", F.expr(
             f"q3_milli + ((q3_milli - q1_milli) * {k_e3}) div 1000")))
    return (d.groupBy("_g")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.max("q1_milli").alias("q1_milli"),
                 F.max("q3_milli").alias("q3_milli"),
                 F.max("_lo").alias("lo_milli"),
                 F.max("_hi").alias("hi_milli"),
                 F.sum(F.when(F.col("_vm") < F.col("_lo"), 1)
                       .otherwise(0)).alias("n_low"),
                 F.sum(F.when(F.col("_vm") > F.col("_hi"), 1)
                       .otherwise(0)).alias("n_high"))
            .withColumn("outlier_rate_e4", F.expr(
                "((n_low + n_high) * 10000) div n"))
            .select(F.col("_g").alias(group_col), "n", "q1_milli",
                    "q3_milli", "lo_milli", "hi_milli", "n_low",
                    "n_high", "outlier_rate_e4"))


# floor(log10(1 + 1/d) * 1e6) for d = 1..9 — the Benford first-digit
# law as fixed e6 literals, shared VERBATIM with every SQL twin (both
# engines consume the same integers, so no log ever runs at query time)
BENFORD_P_E6 = (301029, 176091, 124938, 96910, 79181,
                66946, 57991, 51152, 45757)


def benford_deviation(df: DataFrame, group_col: str,
                      value_col: str) -> DataFrame:
    """Benford first-significant-digit screen per group: the L1
    distance between the observed leading-digit distribution of the
    milli-quantized |values| and Benford's law — the classic
    fabricated/synthetic-data smell test (Benford 1938; public
    semantics). Naturally-spread measurements sit near 0; uniform or
    template-generated numbers deviate hard.

    INTEGER-EXACT: the leading digit of a positive int64 is its first
    decimal character (both engines render int64 identically), the
    law's probabilities are fixed e6 literals (:data:`BENFORD_P_E6` —
    shared verbatim, no runtime log), and the deviation folds missing
    digits WITHOUT a zero-fill grid join:

        dev·N = Σ_observed |cnt_d·10⁶ − p_d·N| + (T − Σ_observed p_d)·N
        dev_e6 = (dev·N) div N          (T = Σ all nine p_d)

    — a digit with zero count contributes exactly ``p_d·N``, which the
    right-hand term supplies in aggregate (one pass, no 9-row
    cross-join per group). Rows quantizing to 0 carry no leading digit
    and are excluded (documented; mirror ``vm != 0`` in twins), as are
    NULL/NaN/±Inf.

    Scale: one (group, digit) count shuffle (≤ 9 rows per group), one
    rollup. Overflow: cnt·10⁶ needs N < 9·10¹² per group.

    Returns ``group, n, dev_e6, top_digit, top_cnt`` (top digit breaks
    ties on the smaller digit, deterministically)."""
    t_all = sum(BENFORD_P_E6)
    vm = F.floor(F.col(value_col).cast("double") * 1000).cast("long")
    p_map = F.create_map(*[
        F.lit(v) for d, p in enumerate(BENFORD_P_E6, start=1)
        for v in (d, p)])
    digit = (F.substring(F.abs(F.col("_vm")).cast("string"), 1, 1)
             .cast("int"))
    per_d = (df.where(_quantizable_col(value_col))
             .select(F.col(group_col).alias("_g"), vm.alias("_vm"))
             .where(F.col("_vm") != 0)
             .select("_g", digit.alias("_d"))
             .groupBy("_g", "_d")
             .agg(F.count(F.lit(1)).alias("_c"))
             .withColumn("_p", p_map[F.col("_d")])
             # the group total N rides a window over the ≤9-row digit
             # table (a window inside the final aggregate is illegal;
             # a join would re-plan the count subtree)
             .withColumn("_n", F.sum("_c").over(
                 Window.partitionBy("_g"))))
    agg = (per_d.groupBy("_g")
           .agg(F.max("_n").alias("n"),
                F.sum(F.abs(F.col("_c") * F.lit(1_000_000).cast("long")
                            - F.col("_p") * F.col("_n")))
                .alias("_obs"),
                F.sum("_p").alias("_psum"),
                F.max(F.struct(F.col("_c"), (-F.col("_d")).alias("_nd")))
                .alias("_top")))
    return (agg
            .withColumn("dev_e6", F.expr(
                f"(_obs + ({t_all} - _psum) * n) div n"))
            .select(F.col("_g").alias(group_col), "n", "dev_e6",
                    (-F.col("_top._nd")).cast("int").alias("top_digit"),
                    F.col("_top._c").alias("top_cnt")))


def trimmed_mean(df: DataFrame, group_col: str, value_col: str,
                 trim_milli: int = 100) -> DataFrame:
    """Trimmed mean per group: drop the lowest and highest
    ``trim_milli``/1000 fraction of rows BY RANK and average the rest —
    the outlier-robust location estimate between the mean and the
    median (public textbook semantics; ClickHouse reaches it by
    combining quantile cuts with avgIf).

    Exact by rank arithmetic (the equi-depth stance): keep ranks in
    ``[floor(n·t/1000)+1, n − floor(n·t/1000)]`` over the milli-
    quantized sort — a pure function of the sorted position, so the
    kept COUNT is engine-exact and the kept SUM is deterministic under
    ties (any rank choice among equal values sums the same multiset).
    The mean stays integer: ``mean_milli = sum div kept`` (truncated —
    the contract). Raises when the trim leaves nothing (t ≥ 500 can
    empty even groups); NULL/NaN/±Inf rows excluded up-front.

    Scale: one shuffle on the group key, one rank window, one
    aggregate. Returns ``group, n, kept, sum_kept_milli,
    mean_milli``."""
    t = int(trim_milli)
    if not 0 <= t < 500:
        raise ValueError(
            f"trimmed_mean: trim_milli must be in [0, 500), got "
            f"{trim_milli}")
    vm = F.floor(F.col(value_col).cast("double") * 1000).cast("long")
    w = Window.partitionBy(group_col).orderBy("_vm")
    wall = Window.partitionBy(group_col)
    cut = F.expr(f"(_n * {t}) div 1000")
    kept = (df.where(_quantizable_col(value_col))
            .select(F.col(group_col), vm.alias("_vm"))
            .withColumn("_rn", F.row_number().over(w).cast("long"))
            .withColumn("_n", F.count(F.lit(1)).over(wall))
            .withColumn("_keep",
                        (F.col("_rn") > cut)
                        & (F.col("_rn") <= F.col("_n") - cut)))
    return (kept.groupBy(group_col)
            .agg(F.max("_n").alias("n"),
                 F.sum(F.col("_keep").cast("long")).alias("kept"),
                 F.sum(F.when(F.col("_keep"), F.col("_vm"))
                       .otherwise(F.lit(0).cast("long")))
                 .alias("sum_kept_milli"))
            .withColumn("mean_milli", F.expr(
                "CASE WHEN kept = 0 THEN "
                "raise_error('trimmed_mean: trim emptied a group') "
                "ELSE sum_kept_milli div kept END"))
            .select(group_col, "n", "kept", "sum_kept_milli",
                    "mean_milli"))


def robust_scale(df: DataFrame, group_col: str, value_col: str,
                 out_col: str = "scaled_milli") -> DataFrame:
    """Per-row robust normalization — the TRANSFORM companion to
    :func:`mad_outliers` (sklearn's RobustScaler, median/MAD instead
    of mean/stddev): appends ``out_col`` = (x − median)·1000 div MAD
    in integer milli-units, NULL when the group's MAD is 0 (constant
    majority — sklearn emits 0/inf there; NULL is the repo stance,
    never a silent division trap).

    Same ONE-scan window-folded median/MAD machinery as mad_outliers
    (whole-partition conditional maxima over the sorted partition —
    no median join re-planning the source); the input row set passes
    through unchanged except the appended column, excluded rows
    (NULL/NaN/±Inf values) carrying NULL. All working columns are
    ``_rs_``-prefixed and that prefix is RESERVED (a caller column
    named ``_rs_*`` or ``out_col`` would be silently overwritten —
    raise instead; review-caught: the first cut used bare
    ``median_milli``/``_dev`` names that clobbered same-named caller
    columns, plausibly fed back from mad_outliers itself).

    Scale: one shuffle on the group key, two sorts of the same
    partition. Returns the input columns + ``out_col``."""
    clash = [c for c in df.columns
             if c.lower().startswith("_rs_") or c == out_col]
    if clash:
        raise ValueError(
            f"robust_scale: input columns {clash} collide with the "
            f"reserved _rs_ working prefix / out_col")
    vm = F.floor(F.col(value_col).cast("double") * 1000).cast("long")
    wall = Window.partitionBy("_rs_g")
    pos = F.floor((F.col("_rs_n") + 1) / 2)
    base = (df.withColumn("_rs_g", F.col(group_col))
            .withColumn("_rs_vm",
                        F.when(_quantizable_col(value_col), vm)))
    # excluded rows sort NULLS FIRST in the value window; ranks for
    # the median positions must count only the quantizable rows, so
    # rank over a NULL-last key and size the window on the finite
    # count
    d = (base
         .withColumn("_rs_rn", F.row_number().over(
             Window.partitionBy("_rs_g").orderBy(
                 F.col("_rs_vm").asc_nulls_last())))
         .withColumn("_rs_n", F.count("_rs_vm").over(wall))
         .withColumn("_rs_med",
                     F.max(F.when(F.col("_rs_rn") == pos,
                                  F.col("_rs_vm"))).over(wall))
         .withColumn("_rs_dev", F.abs(F.col("_rs_vm")
                                      - F.col("_rs_med")))
         .withColumn("_rs_rd", F.row_number().over(
             Window.partitionBy("_rs_g").orderBy(
                 F.col("_rs_dev").asc_nulls_last())))
         .withColumn("_rs_mad",
                     F.max(F.when(F.col("_rs_rd") == pos,
                                  F.col("_rs_dev"))).over(wall)))
    scaled = F.expr(
        "CASE WHEN _rs_vm IS NULL OR _rs_mad IS NULL OR _rs_mad = 0 "
        "THEN NULL "
        "ELSE ((_rs_vm - _rs_med) * 1000) div _rs_mad END")
    return (d.withColumn(out_col, scaled)
            .drop("_rs_g", "_rs_vm", "_rs_rn", "_rs_n", "_rs_med",
                  "_rs_dev", "_rs_rd", "_rs_mad"))


def js_divergence(df: DataFrame, group_col: str,
                  cat_col: str) -> DataFrame:
    """Jensen-Shannon divergence of each group's categorical
    distribution vs the COMPLEMENT (all other groups) — the bounded
    symmetric "is this source unusual?" screen beside
    :func:`psi_drift`'s two-snapshot PSI, in milli-BITS (base-2 JSD
    ∈ [0, 1] bit, so the output lives in [0, 1000]).

    INTEGER-EXACT contract via the shared milli-log2 (the theils_u /
    MI rollup family): with per-category counts p (group) and
    q = total − p (complement), np/nq the side totals, every log
    argument is an integer —

        lg2(p̂/m) = lg2(2·p·nq) − lg2(p·nq + q·np)

    — so with L = milli-log2,

        A = Σ_supp p·(L(2·p·nq) − L(p·nq + q·np))
        B = Σ_supp q·(L(2·q·np) − L(p·nq + q·np))  (q ≥ 1 terms)
            + 1000·(nq − Σ_supp q)
        jsd_milli = (A·nq + B·np) div (2·np·nq)

    The second B line folds every category ABSENT from the group
    without a grid join (the benford missing-mass trick): there
    q = total and the bracket is exactly L(2x) − L(x) = 1000
    milli-bits (exact — the milli-log2's remainder scales with its
    power). Two identical distributions give EXACTLY 0 and two
    disjoint supports EXACTLY 1000 (the quantization cancels —
    pinned by hand cases). Groups with an empty complement (a
    single-group frame) are NULL, never a division trap. NULL
    group/category rows are excluded (mirror in twins).

    Overflow: log arguments reach 2·np·nq (< 2⁶² required by the
    milli-log2) and the A·nq product reaches ~62000·np·nq — keep
    group×complement products under ~1.4·10¹⁴ (≈10⁷ rows balanced) or
    pre-aggregate; ANSI raises loudly, never wraps (the psi_drift
    posture).

    Scale: ONE (group, category) aggregate over the raw rows;
    everything after runs on the |groups|·|categories| cell table
    (two windows + one rollup + a broadcast 1-row total).

    Returns ``group, n, n_rest, k, jsd_milli`` (k = support
    categories)."""
    from .retrieval import with_ilog2_milli

    base = (df.where(F.col(group_col).isNotNull()
                     & F.col(cat_col).isNotNull())
            .select(F.col(group_col).alias("_g"),
                    F.col(cat_col).alias("_c")))
    cnt = (base.groupBy("_g", "_c")
           .agg(F.count(F.lit(1)).alias("_pc")))
    wg = Window.partitionBy("_g")
    wc = Window.partitionBy("_c")
    tot = (cnt.withColumn("_np", F.sum("_pc").over(wg))
           .withColumn("_ct", F.sum("_pc").over(wc)))
    n_all = cnt.agg(F.sum("_pc").alias("_n"))
    cells = (tot.crossJoin(F.broadcast(n_all))
             .withColumn("_q", F.col("_ct") - F.col("_pc"))
             .withColumn("_nq", F.col("_n") - F.col("_np"))
             .withColumn("_a1", F.lit(2) * F.col("_pc") * F.col("_nq"))
             .withColumn("_a2", F.col("_pc") * F.col("_nq")
                         + F.col("_q") * F.col("_np"))
             .withColumn("_a3", F.lit(2) * F.col("_q") * F.col("_np")))
    # the milli-log2 needs args >= 1; rows of an empty complement
    # (nq = 0) produce junk L values that the final NULL CASE discards,
    # and q = 0 rows are gated before their L is used
    cells = with_ilog2_milli(
        cells.withColumn("_a1", F.greatest("_a1", F.lit(1))), "_a1",
        "_l1")
    cells = with_ilog2_milli(
        cells.withColumn("_a2", F.greatest("_a2", F.lit(1))), "_a2",
        "_l2")
    cells = with_ilog2_milli(
        cells.withColumn("_a3", F.greatest("_a3", F.lit(1))), "_a3",
        "_l3")
    aterm = F.col("_pc") * (F.col("_l1") - F.col("_l2"))
    bterm = (F.when(F.col("_q") >= 1,
                    F.col("_q") * (F.col("_l3") - F.col("_l2")))
             .otherwise(F.lit(0).cast("long")))
    agg = (cells.groupBy("_g")
           .agg(F.first("_np").alias("n"),
                F.first("_nq").alias("n_rest"),
                F.count(F.lit(1)).alias("k"),
                F.sum(aterm).alias("_A"),
                F.sum(bterm).alias("_Bs"),
                F.sum("_q").alias("_qs")))
    return agg.select(
        F.col("_g").alias(group_col), "n", "n_rest", "k",
        F.expr("CASE WHEN n_rest = 0 THEN NULL ELSE "
               "(_A * n_rest + (_Bs + 1000 * (n_rest - _qs)) * n) "
               "div (2 * n * n_rest) END").alias("jsd_milli"))


def psi_drift(df: DataFrame, group_col: str, cat_col: str,
              side_col: str) -> DataFrame:
    """Population stability index per group between a reference
    (``side = 0``) and a current (``side = 1``) sample of a
    categorical column — the standard ML-ops distribution-drift screen
    ("did this source's category mix shift between corpus
    snapshots?"), in milli-BITS (the textbook ln-based PSI is this
    times ln 2 — base 2 is the repo's entropy convention, documented):

        PSI = Σ_i (p_i − q_i) · lg2(p_i / q_i)

    INTEGER-EXACT with Laplace smoothing as part of the CONTRACT:
    a_i = c_ref,i + 1, b_i = c_cur,i + 1 over the categories observed
    in the group (either side), A = Σa, B = Σb; then with
    x = a_i·B, y = b_i·A,

        psi_milli = Σ_i (x − y)·(lgm(x) − lgm(y))  div  (A·B)

    — every summand is ≥ 0 ((x−y) and Δlg share sign), the ONE
    division is final, and the smoothing keeps absent-on-one-side
    cells finite (the ±∞ cells of the unsmoothed formula are exactly
    the ones that matter for drift). Side values other than 0/1 raise
    loudly; NULL group/category/side rows are excluded (mirror in
    twins). Overflow: the per-cell product reaches N²·62000, which
    crosses 2^63 near N ≈ 1.2·10⁷ — keep groups under ~10⁷ rows or
    pre-bucket (ANSI raises, never wraps; review-caught: an earlier
    draft advertised 10⁸, 10× past the bound).

    Scale: one (group, category) aggregate (the two sides split via
    conditional sums — no pivot join), one window over the |cells|
    table, one rollup. Returns ``group, n_ref, n_cur, k,
    psi_milli``."""
    from .retrieval import with_ilog2_milli

    side = F.expr(
        f"CASE WHEN {side_col} IS NULL THEN NULL "
        f"WHEN {side_col} IN (0, 1) THEN CAST({side_col} AS INT) "
        f"ELSE raise_error('psi_drift: side_col must be 0 or 1') END")
    wall = Window.partitionBy("_g")
    cells = (df.where(F.col(group_col).isNotNull()
                      & F.col(cat_col).isNotNull()
                      & F.col(side_col).isNotNull())
             .select(F.col(group_col).alias("_g"),
                     F.col(cat_col).alias("_cat"), side.alias("_s"))
             .groupBy("_g", "_cat")
             .agg(F.sum(F.when(F.col("_s") == 0, 1).otherwise(0))
                  .cast("long").alias("_ca"),
                  F.sum(F.when(F.col("_s") == 1, 1).otherwise(0))
                  .cast("long").alias("_cb"))
             .withColumn("_k", F.count(F.lit(1)).over(wall))
             .withColumn("_A", F.sum("_ca").over(wall) + F.col("_k"))
             .withColumn("_B", F.sum("_cb").over(wall) + F.col("_k"))
             .withColumn("_x", (F.col("_ca") + 1) * F.col("_B"))
             .withColumn("_y", (F.col("_cb") + 1) * F.col("_A")))
    logged = with_ilog2_milli(
        with_ilog2_milli(cells, "_x", "_lx"), "_y", "_ly")
    return (logged
            .withColumn("_term", (F.col("_x") - F.col("_y"))
                        * (F.col("_lx") - F.col("_ly")))
            .groupBy("_g")
            .agg((F.max("_A") - F.max("_k")).alias("n_ref"),
                 (F.max("_B") - F.max("_k")).alias("n_cur"),
                 F.max("_k").alias("k"),
                 F.expr("sum(_term) div (max(_A) * max(_B))")
                 .alias("psi_milli"))
            .select(F.col("_g").alias(group_col), "n_ref", "n_cur",
                    "k", "psi_milli"))

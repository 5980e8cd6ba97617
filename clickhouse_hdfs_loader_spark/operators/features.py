"""Embedding feature scaling ([EXT]) — the per-dimension normalization
step a training pipeline runs before quantization / indexing / distance
ops (sklearn's MinMaxScaler, but distributed and engine-exact).

Determinism contract (repo-wide): values quantize to integer micro-units
(``floor(x*1e6)``) BEFORE any aggregation, so min/max/sum are pure
integer ops with no float-order sensitivity, and the normalized outputs
are integer milli-units via IDENTICAL-expression-order floor division —
hash-replayable in DuckDB.

Scale shape:
- :func:`dimension_stats` is ONE posexplode + a map-side-combinable
  aggregate whose output is |dims| rows — never corpus-sized.
- :func:`minmax_normalize` collects those |dims| rows (a documented tiny
  collect, same budget as k-means centroids) into literal arrays and
  normalizes with a stateless ``zip_with`` — no explode, no shuffle, no
  Python in the row path. Spark's higher-order functions evaluate
  interpreted per element (see CLAUDE.md perf notes), which is fine at
  embedding dims (8–1024); swap in an Arrow kernel only if a profile
  says so.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

QUANT_SCALE = 1_000_000


def _quantize(x):
    """THE module's determinism contract, in one place: float32 ->
    double BEFORE the multiply (kmeans-sums precedent: a float-precision
    product can floor across a different integer boundary than the
    double product DuckDB computes), then floor to int64 micro-units.

    Non-finite ELEMENTS (NaN/±Inf) quantize to NULL — the array-element
    twin of analytics._quantizable_col's row exclusion: under ANSI,
    ``floor(NaN·1e6)`` silently yields 0 and ±Inf saturates the long
    cast, while a DuckDB twin raises on the same BIGINT cast. NULL keeps
    the element excluded from every aggregate and NULL in every scaled
    output, mirrored as ``CASE WHEN isfinite(x) …`` in the SQL twins."""
    xd = x.cast("double")
    finite = ~F.isnan(xd) & (F.abs(xd) != F.lit(float("inf")))
    return F.when(finite,
                  F.floor(xd * F.lit(float(QUANT_SCALE))).cast("long"))


def dimension_stats(emb: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension ``dim, qmin, qmax, qsum, n`` over micro-quantized
    values (``floor(x*1e6)`` as int64). NULL vectors are skipped; NULL
    and non-finite (NaN/±Inf) elements quantize to NULL and are ignored
    by the aggregates (``n`` counts only finite elements).
    Overflow: |x| < 9e6 per element and qsum bounded by n·9e12 — safe
    under int64 for n up to ~1e6 rows per dimension at extreme
    magnitudes, far looser for unit-norm embeddings."""
    q = _quantize(F.col("x"))
    return (emb.where(F.col(vec_col).isNotNull())
            .select(F.posexplode(vec_col).alias("dim", "x"))
            .select("dim", q.alias("q"))
            .groupBy("dim")
            .agg(F.min("q").alias("qmin"), F.max("q").alias("qmax"),
                 F.sum("q").alias("qsum"),
                 F.count("q").alias("n")))


def minmax_normalize(emb: DataFrame, stats: DataFrame = None,
                     vec_col: str = "embedding",
                     out_col: str = "normalized") -> DataFrame:
    """Append ``out_col``: each dimension min-max scaled to integer
    milli-units in [0, 1000] — ``((q - qmin) * 1000) div (qmax - qmin)``
    with constant dimensions pinned to 0 explicitly (never an ANSI
    divide-by-zero). ``stats`` defaults to :func:`dimension_stats` of
    ``emb`` itself; pass a precomputed/persisted stats table to apply a
    TRAIN split's scaling to eval data (the leakage-correct direction).

    NULL vectors pass through with ``out_col`` NULL (the repo's explicit
    degenerate-input stance — see semantic_dedup's sentinel)."""
    if stats is None:
        stats = dimension_stats(emb, vec_col)
    rows = sorted(stats.collect(), key=lambda r: r["dim"])  # |dims| rows
    if rows:
        assert [r["dim"] for r in rows] == list(range(len(rows))), \
            "dimension_stats must cover contiguous dims 0..d-1"
    # a dimension with zero non-NULL values (n=0) has NULL qmin/qmax —
    # pin it like a constant dimension (offset 0, range 0 -> output 0)
    mins = F.array(*[F.lit(int(r["qmin"]) if r["n"] else 0)
                     for r in rows])
    rngs = F.array(*[F.lit(int(r["qmax"] - r["qmin"]) if r["n"] else 0)
                     for r in rows])
    centered = F.zip_with(F.col(vec_col), mins,
                          lambda x, m: _quantize(x) - m)
    # NULL elements stay NULL in every branch — the constant-dimension
    # zero would otherwise shadow a missing value as a real 0
    scaled = F.zip_with(
        centered, rngs,
        lambda d, r: F.when(d.isNull(), F.lit(None).cast("long"))
        .when(r == 0, F.lit(0))
        .otherwise(F.floor((d * 1000).cast("double") / r).cast("long")))
    return emb.withColumn(
        out_col, F.when(F.col(vec_col).isNotNull(), scaled))


def mean_center(emb: DataFrame, stats: DataFrame = None,
                vec_col: str = "embedding",
                out_col: str = "centered_micro") -> DataFrame:
    """Append ``out_col``: per-dimension mean-centered micro-units,
    ``q - (qsum div n)`` — the rational mean (no float divide), same
    tiny-stats-collect shape as :func:`minmax_normalize`. The driver
    division truncates toward zero (Python ``//`` floors toward -inf;
    SQL ``div`` does not — the replay trap for negative sums)."""
    if stats is None:
        stats = dimension_stats(emb, vec_col)
    rows = sorted(stats.collect(), key=lambda r: r["dim"])

    def tdiv(a: int, b: int) -> int:   # truncate toward zero, like SQL div
        return -((-a) // b) if a < 0 else a // b

    means = F.array(*[F.lit(tdiv(int(r["qsum"]), int(r["n"]))
                            if r["n"] else 0) for r in rows])
    centered = F.zip_with(F.col(vec_col), means,
                          lambda x, m: _quantize(x) - m)
    return emb.withColumn(
        out_col, F.when(F.col(vec_col).isNotNull(), centered))


def covariance_stats(emb: DataFrame,
                     vec_col: str = "embedding",
                     dims: int | None = None) -> DataFrame:
    """Exact integer second-moment sums per dimension pair — the
    distributed half of PCA/whitening, in the kmeans quantize-then-sum
    shape: elements milli-quantize to int64 (``floor(double(x)·1e3)``),
    each partition folds one n-free gemm partial (``XᵀX`` on int64 is
    exact and ORDER-FREE, so map-side combining cannot change the
    result), and the partials sum in Spark. The covariance combine
    ``(n·s_ij − s_i·s_j) / n²`` is deliberately NOT done here: the
    caller does it on the collected O(d²) rows in Python arbitrary-
    precision ints, so it is exact at ANY n while every int64 Spark-side
    quantity stays linear in n (s_ij bounded by n·max|q|²; at |x| ≤ 9e3
    that is n·8.1e13 — safe past 10^5 rows per partition and 10^18
    globally for unit-scale embeddings).

    NULL vectors are skipped; NaN/NULL ELEMENTS raise (a silent NaN
    would poison every pair sum in the gemm); ragged vector lengths
    raise.

    ``dims``: when the caller already knows the vector width, passing
    it skips the eager min/max-size bounds job at construction (keeps
    plan building lazy — the plan-audit path uses this); raggedness is
    then still caught per batch inside the gemm pass.

    Returns ``i, j, n, s_i, s_j, s_ij`` for every pair 0 ≤ i ≤ j < d —
    O(d²) rows, never corpus-sized."""
    import numpy as np
    import pandas as pd

    src = emb.where(F.col(vec_col).isNotNull()).select(vec_col)
    if dims is None:
        bounds = src.select(F.min(F.size(vec_col)).alias("mn"),
                            F.max(F.size(vec_col)).alias("mx")).first()
        if bounds["mn"] is None:
            raise ValueError("covariance_stats: no non-NULL vectors")
        if bounds["mn"] != bounds["mx"]:
            raise ValueError(
                f"covariance_stats: ragged vector lengths "
                f"{bounds['mn']}..{bounds['mx']}")
        d = int(bounds["mn"])
    else:
        d = int(dims)

    def partials(batches):
        S = np.zeros((d, d), dtype=np.int64)
        s = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            if any(len(v) != d for v in vecs):
                raise ValueError(
                    f"covariance_stats: ragged vector lengths "
                    f"(expected {d})")
            X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            if not np.isfinite(X).all():
                raise ValueError(
                    "covariance_stats: non-finite element (NaN/Inf) in "
                    "a vector — drop or impute before computing moments "
                    "(Inf would silently wrap to INT64_MIN in the "
                    "quantized sums)")
            Q = np.floor(X * 1000.0).astype(np.int64)
            S += Q.T @ Q            # int64 matmul: exact, order-free
            s += Q.sum(axis=0)
            n += Q.shape[0]
        # emit the FULL per-pair partial row (s_i/s_j/n repeated across
        # pairs — d² small rows of redundancy) so the whole operator is
        # one scan + one aggregate; the first cut pivoted kind-tagged
        # rows through three joins, which re-planned the gemm scan on
        # every branch (4 source scans — plan-audit catch)
        if n == 0:
            # a partition that saw no vectors contributes NOTHING —
            # under dims= (which skips the eager no-non-NULL-vectors
            # guard) an empty/all-NULL input must yield 0 rows like its
            # SQL twin, not d² rows of zeros (review-caught)
            return
        ii, jj = np.triu_indices(d)
        yield pd.DataFrame({
            "i": ii, "j": jj,
            "n": np.full(len(ii), n, dtype=np.int64),
            "s_i": s[ii], "s_j": s[jj], "s_ij": S[ii, jj]})

    return (src.mapInPandas(
        partials,
        "i int, j int, n long, s_i long, s_j long, s_ij long")
        .groupBy("i", "j")
        .agg(F.sum("n").alias("n"), F.sum("s_i").alias("s_i"),
             F.sum("s_j").alias("s_j"), F.sum("s_ij").alias("s_ij"))
        .select("i", "j", "n", "s_i", "s_j", "s_ij"))


def pca_whiten(emb: DataFrame, stats: DataFrame = None,
               vec_col: str = "embedding", out_col: str = "whitened",
               k: int = 8, eps: float = 1e-9) -> DataFrame:
    """Append ``out_col``: the top-``k`` PCA-whitened projection of each
    vector (SemDeDup-style embedding preprocessing — decorrelate and
    unit-scale before cosine/kmeans). The d×d covariance comes from
    :func:`covariance_stats`' exact integer sums combined on the driver
    in Python ints (``(n·s_ij − s_i·s_j)/n²`` — exact at any n), then
    ``numpy.linalg.eigh`` + an explicit sign convention (flip each
    eigenvector so its largest-|coefficient| entry is positive — eigh's
    sign is otherwise arbitrary and would flake the replay test).
    Eigenvalues floor at ``eps`` before the inverse sqrt so a
    rank-deficient direction maps to a huge-but-finite scale instead of
    an ANSI division error.

    The projection is a stateless ``zip_with`` + sequential
    ``aggregate`` fold per output dim — deterministic evaluation order,
    so an independent Python replay of the same fold is BITWISE equal
    (pinned by test). No shuffle, no Python in the row path; at very
    large d swap the fold for a pandas-UDF gemm (the BLAS-top-k
    precedent) — same results apply only within float tolerance then.

    NULL vectors pass through with NULL ``out_col``. ``stats`` accepts a
    persisted TRAIN-split stats table (the leakage-correct direction,
    like :func:`minmax_normalize`)."""
    import numpy as np

    if stats is None:
        stats = covariance_stats(emb, vec_col)
    rows = stats.collect()                       # O(d²) rows
    d = max(r["j"] for r in rows) + 1
    if not 1 <= k <= d:
        raise ValueError(f"pca_whiten: k must be in [1, {d}], got {k}")
    cov = np.zeros((d, d))
    mu = np.zeros(d)
    for r in rows:
        num = int(r["n"]) * int(r["s_ij"]) - int(r["s_i"]) * int(r["s_j"])
        cov[r["i"], r["j"]] = cov[r["j"], r["i"]] = \
            num / (int(r["n"]) ** 2 * 1_000_000)
        mu[r["i"]] = int(r["s_i"]) / (int(r["n"]) * 1000.0)
        mu[r["j"]] = int(r["s_j"]) / (int(r["n"]) * 1000.0)
    lam, vecs = np.linalg.eigh(cov)              # ascending eigenvalues
    order = list(range(d - 1, d - 1 - k, -1))    # top-k, descending
    comps = vecs[:, order].copy()
    lam_k = lam[order]
    for t in range(k):                           # deterministic sign
        col = comps[:, t]
        if col[int(np.argmax(np.abs(col)))] < 0:
            comps[:, t] = -col
    scale = 1.0 / np.sqrt(np.maximum(lam_k, eps))
    W = comps * scale                            # (d, k)

    mu_arr = F.array(*[F.lit(float(m)) for m in mu])
    centered = F.zip_with(F.col(vec_col), mu_arr,
                          lambda x, m: x.cast("double") - m)
    outs = []
    for t in range(k):
        warr = F.array(*[F.lit(float(W[j, t])) for j in range(d)])
        prod = F.zip_with(centered, warr, lambda c, wv: c * wv)
        outs.append(F.aggregate(prod, F.lit(0.0),
                                lambda acc, v: acc + v))
    return emb.withColumn(
        out_col, F.when(F.col(vec_col).isNotNull(), F.array(*outs)))


def ols_fit(df: DataFrame, vec_col: str = "embedding",
            y_col: str = "y", dims: int | None = None,
            intercept: bool = True) -> DataFrame:
    """Closed-form multi-feature least squares (the distributed
    normal-equations OLS every feature-screening pipeline wants before
    reaching for SGD): regress a scalar target on a feature-vector
    column and return the coefficients plus R².

    Built ENTIRELY on :func:`covariance_stats`' exact integer gemm —
    the augmented matrix ``Z = [X | y]`` (both milli-quantized) yields
    every normal-equation sum in one scan: ``XᵀX`` is the upper block,
    ``Xᵀy`` the last column, ``yᵀy`` the corner, ``Σx/Σy/n`` ride
    along. The d+1-square system solves on the DRIVER from exact
    integer sums (the pca_whiten shape: O(d²) collect, arbitrary-
    precision combine, LAPACK solve) —

        intercept:  [[n, Σxᵀ], [Σx, XᵀX]] · β = [Σy, Xᵀy]
        through 0:  XᵀX · β = Xᵀy
        R² = 1 − SSE/SST,  SSE = yᵀy − βᵀ·rhs (exact-sum float combine)

    The CONTRACT is the fit of the milli-QUANTIZED data (the repo
    stance; the quantization cancels in slope units, and the intercept
    rescales by 1e-3). Like pca_whiten this is replay-pinned BY DESIGN,
    not oracle-graded: the solve's LAPACK ulps are build-specific, but
    a pure-numpy replay from the same parquet reproduces every output
    BITWISE (pinned in tests). A singular system (collinear/constant
    features) raises a named error — silently pseudo-inverting would
    hide the modeling bug. Rows with NULL vectors or NULL/NaN/±Inf
    targets are excluded; non-finite ELEMENTS raise (inherited from the
    gemm). Degenerate SST (constant y) yields NULL r2.

    Scale: one scan + one O(d²) aggregate (all covariance_stats'
    properties), driver work O(d³) on d ≤ a few thousand. EAGER at
    construction (driver solve) — excluded from the lazy plan audit
    like pca_whiten.

    Returns ``term, beta, n, r2`` — one row per feature (term = dim
    index) plus term = -1 for the intercept when enabled."""
    import numpy as np

    from .analytics import _quantizable_col

    aug = (df.where(F.col(vec_col).isNotNull()
                    & _quantizable_col(y_col))
           .select(F.concat(
               F.col(vec_col).cast("array<double>"),
               F.array(F.col(y_col).cast("double"))).alias("_z")))
    rows = covariance_stats(
        aug, "_z", dims=(int(dims) + 1 if dims is not None else None)
    ).collect()
    if not rows:
        raise ValueError("ols_fit: no usable rows (all-NULL vectors "
                         "or non-finite targets)")
    d1 = max(int(r["j"]) for r in rows) + 1
    d = d1 - 1
    n = int(rows[0]["n"])
    S = [[0] * d1 for _ in range(d1)]
    s = [0] * d1
    for r in rows:
        i, j = int(r["i"]), int(r["j"])
        S[i][j] = S[j][i] = int(r["s_ij"])
        s[i], s[j] = int(r["s_i"]), int(r["s_j"])

    if intercept:
        A = np.zeros((d + 1, d + 1))
        b = np.zeros(d + 1)
        A[0, 0] = float(n)
        for i in range(d):
            A[0, i + 1] = A[i + 1, 0] = float(s[i])
            b[i + 1] = float(S[i][d])
            for j in range(d):
                A[i + 1, j + 1] = float(S[i][j])
        b[0] = float(s[d])
    else:
        A = np.array([[float(S[i][j]) for j in range(d)]
                      for i in range(d)])
        b = np.array([float(S[i][d]) for i in range(d)])
    try:
        beta = np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        raise ValueError(
            "ols_fit: singular normal equations — collinear or "
            "constant features (drop or regularize upstream)")

    # SSE/SST from the same exact sums, one written-down float order
    yy = float(S[d][d])
    sse = yy - float(np.dot(beta, b))
    if intercept:
        sst = yy - float(s[d]) * float(s[d]) / float(n)
    else:
        sst = yy
    r2 = None if sst <= 0.0 else 1.0 - sse / sst

    out = []
    if intercept:
        # beta[0] is in milli-y units (the quantization's only
        # non-cancelling leg); slopes are milli/milli = unitless
        out.append((-1, float(beta[0]) / 1000.0))
        out.extend((t, float(beta[t + 1])) for t in range(d))
    else:
        out.extend((t, float(beta[t])) for t in range(d))
    spark = df.sparkSession
    return spark.createDataFrame(
        [(term, v, n, r2) for term, v in out],
        "term int, beta double, n long, r2 double")


def feature_hashing(docs: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", dims: int = 1024,
                    signed: bool = True) -> DataFrame:
    """Hashing-trick text vectorizer (Weinberger et al. 2009 — the
    fixed-dimension, vocabulary-free featurizer classifiers run over a
    corpus): token → ``dim = pmod(xxhash64(token), dims)``, with the
    signed variant drawing a ±1 from an independent chained hash
    (``xxhash64(token, 1)``) so collisions cancel in expectation
    instead of biasing counts upward.

    Emitted as scalar ``(doc, dim, weight)`` SPARSE rows — never an
    array column (the r11 non-scalar tripwire), and sparse is the
    honest representation at dims ≫ tokens-per-doc. Exact integers end
    to end; engine-pinned the loader-golden way: Spark's ``xxhash64``
    on a string is XXH64(UTF-8 bytes, seed 42), and the chained form
    appends the int32's 4 LE bytes with the running hash as seed — the
    spec-written Python model in tests/test_loader_golden.py replays
    every row Spark-free.

    Scale: one token explode + one (doc, dim) count shuffle — the
    contamination_check shape; output bounded by distinct (doc, dim)
    pairs. NULL texts and NULL ids drop out (mirror in twins).

    Returns ``id, dim, weight``."""
    from ..functions.text import words_array

    if int(dims) < 1:
        raise ValueError(
            f"feature_hashing: dims must be >= 1, got {dims}")
    toks = (docs.where(F.col(id_col).isNotNull())
            .select(F.col(id_col),
                    F.explode(words_array(F.col(text_col)))
                    .alias("_w")))
    dim = F.pmod(F.xxhash64(F.col("_w")), F.lit(int(dims))).cast("int")
    if signed:
        s = (F.when(F.pmod(F.xxhash64(F.col("_w"), F.lit(1)),
                           F.lit(2)) == 0,
                    F.lit(1)).otherwise(F.lit(-1))).cast("long")
    else:
        s = F.lit(1).cast("long")
    return (toks.select(F.col(id_col), dim.alias("dim"), s.alias("_s"))
            .groupBy(id_col, "dim")
            .agg(F.sum("_s").alias("weight")))


def isotonic_fit(df: DataFrame, group_col: str, x_col: str,
                 y_col: str) -> DataFrame:
    """Per-group isotonic (monotone non-decreasing) least-squares fit
    via pool-adjacent-violators — probability calibration's workhorse
    (PAVA; Zadrozny & Elkan 2002, public algorithm). "Fit a monotone
    score→label curve per source" is the classifier-calibration step
    between scoring and thresholding.

    EXACT end to end: x and y milli-quantize; tied x's pre-average
    into one point (a function must give equal x equal fits — this
    removes tie-order sensitivity entirely); PAVA pools compare by
    integer CROSS-MULTIPLICATION (``sum_a·cnt_b > sum_b·cnt_a``), so
    pooling decisions are exact rational arithmetic with no float
    anywhere; the emitted fit truncates each pool's rational mean to
    milli units, with the pool's ``(sum, cnt)`` carried alongside so
    the rational answer stays auditable. A pure-Fraction Python replay
    matches every output exactly (pinned by test).

    Plan: one (group, x) pre-aggregate, then ONE applyInPandas over
    the group key — the whole-group contract (EMA/kendall stance:
    PAVA is inherently sequential in x; per-group distinct-x count
    must fit one executor). The output group column carries the INPUT
    column's type (ADVICE r10). NULL group keys and NULL/NaN/±Inf in
    either column are excluded (the kendall stance).

    Returns ``group, x_milli, pts, pool_sum_milli, pool_cnt,
    fit_milli`` — one row per distinct (group, x), fit monotone
    non-decreasing in x within each group."""
    import pandas as pd

    from .analytics import _quantizable_col

    g_ddl = df.schema[group_col].dataType.simpleString()
    qx = F.floor(F.col(x_col).cast("double") * 1000).cast("long")
    qy = F.floor(F.col(y_col).cast("double") * 1000).cast("long")
    base = (df.where(_quantizable_col(x_col) & _quantizable_col(y_col)
                     & F.col(group_col).isNotNull())
            .select(F.col(group_col).alias("_g"),
                    qx.alias("_x"), qy.alias("_y"))
            .groupBy("_g", "_x")
            .agg(F.count(F.lit(1)).alias("_n"),
                 F.sum("_y").alias("_s")))

    def pava(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_x", kind="mergesort")
        xs = [int(v) for v in pdf["_x"]]
        ns = [int(v) for v in pdf["_n"]]
        ss = [int(v) for v in pdf["_s"]]
        # stack of pools as (sum, cnt, n_points); merge while the
        # previous pool's mean exceeds the new one's (cross-mult)
        pools: list = []
        for s, c in zip(ss, ns):
            cur = (s, c, 1)
            while pools and pools[-1][0] * cur[1] > cur[0] * pools[-1][1]:
                p = pools.pop()
                cur = (p[0] + cur[0], p[1] + cur[1], p[2] + cur[2])
            pools.append(cur)
        out_rows = []
        i = 0
        for s, c, npts in pools:
            # TRUNCATE toward zero like SQL `div` (Python // floors —
            # the CLAUDE.md tdiv note; keeps a future SQL twin of the
            # fit column engine-exact on negative pools)
            fit = s // c if s >= 0 else -((-s) // c)
            for _ in range(npts):
                out_rows.append((pdf["_g"].iloc[0], xs[i], ns[i],
                                 s, c, fit))
                i += 1
        return pd.DataFrame(out_rows, columns=[
            "_g", "x_milli", "pts", "pool_sum_milli", "pool_cnt",
            "fit_milli"])

    out = base.groupBy("_g").applyInPandas(
        pava, schema=(f"_g {g_ddl}, x_milli long, pts long, "
                      f"pool_sum_milli long, pool_cnt long, "
                      f"fit_milli long"))
    return out.withColumnRenamed("_g", group_col)


def corr_matrix(emb: DataFrame, vec_col: str = "embedding",
                dims: int | None = None) -> DataFrame:
    """ClickHouse ``corrMatrix``: the full Pearson correlation matrix
    across vector dimensions, as scalar ``(i, j, corr_e4)`` rows for
    0 ≤ i ≤ j < d — the redundancy screen run before feature pruning /
    whitening. Pure composition over :func:`covariance_stats`' exact
    integer moment sums:

        corr = (n·s_ij − s_i·s_j)
               / (√(n·s_ii − s_i²) · √(n·s_jj − s_j²))

    computed in DOUBLE with one verbatim expression order
    (``CORR_MATRIX_SQL``, the rank_corr stance: each cast to DOUBLE
    first — above 2^53 the products round, but identically on every
    engine, so the e4 knife-edge round replays). NULL corr on a
    constant dimension (zero variance). Diagonal entries are exactly
    1.0 whenever variance is nonzero (asserted by test, not special-
    cased).

    Plan: the gemm stats table feeds the pair rows once, and the
    diagonal moments arrive via ONE collect_list map row
    (map_from_entries → element_at, the bloom_semi_join idiom) — so
    the corpus is scanned exactly TWICE (pairs + diagonal branch),
    never once per diagonal join side. Output is O(d²) rows.

    Returns ``i, j, n, corr_e4``."""
    stats = covariance_stats(emb, vec_col, dims=dims)
    diag = (stats.where(F.col("i") == F.col("j"))
            .select(F.col("i").alias("_di"),
                    F.struct(F.col("s_i").alias("s"),
                             F.col("s_ij").alias("ss")).alias("_v"))
            .agg(F.map_from_entries(F.collect_list(
                F.struct("_di", "_v"))).alias("_dmap")))
    return (stats.crossJoin(F.broadcast(diag))
            .withColumn("_sii", F.expr("element_at(_dmap, i).ss"))
            .withColumn("_sjj", F.expr("element_at(_dmap, j).ss"))
            .withColumn("corr_e4", F.expr(CORR_MATRIX_SQL))
            .select("i", "j", "n", "corr_e4"))


# shared verbatim: the e4-rounded Pearson finish from the exact
# integer gemm sums, every operand cast to DOUBLE before multiplying
# (identical IEEE on both engines — the rank_corr stance)
_CM_NUM = ("(CAST(n AS DOUBLE) * CAST(s_ij AS DOUBLE)"
           " - CAST(s_i AS DOUBLE) * CAST(s_j AS DOUBLE))")
_CM_DI = ("(CAST(n AS DOUBLE) * CAST(_sii AS DOUBLE)"
          " - CAST(s_i AS DOUBLE) * CAST(s_i AS DOUBLE))")
_CM_DJ = ("(CAST(n AS DOUBLE) * CAST(_sjj AS DOUBLE)"
          " - CAST(s_j AS DOUBLE) * CAST(s_j AS DOUBLE))")
CORR_MATRIX_SQL = (
    "CASE WHEN n < 2 OR " + _CM_DI + " <= CAST(0 AS DOUBLE)"
    " OR " + _CM_DJ + " <= CAST(0 AS DOUBLE) THEN NULL ELSE "
    "CAST(floor(" + _CM_NUM + " / (sqrt(" + _CM_DI + ")"
    " * sqrt(" + _CM_DJ + "))"
    " * CAST(10000 AS DOUBLE) + CAST(0.5 AS DOUBLE)) AS DOUBLE)"
    " / CAST(10000 AS DOUBLE) END")

"""Data-layout operators for scan-time pruning at 100 TB ([EXT]).

The reference's only layout lever is the daily-table partition
(`ClickhouseHdfsLoader.java:338-380` — one table per dt). Columnar lakes
add a second, finer lever: ORDERING data so parquet min/max footer stats
let a range predicate skip whole files/row-groups before any IO. This
module provides that layout step and a footer-stats reader that proves
the property, engine-free.

`repartitionByRange(col)` + `sortWithinPartitions(col)` yields files
whose [min, max] intervals are pairwise disjoint (range partitioner) and
internally sorted (row-group stats monotone) — a range filter then prunes
to the few files whose interval intersects the predicate. This is the
standard "sort by query key at write time" recipe (Z-order generalizes it
to multiple keys; one key needs no curve).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_range_layout(df: DataFrame, path: str, sort_col: str,
                       num_files: int = 8) -> None:
    """Write ``df`` as parquet laid out for range scans on ``sort_col``:
    range-repartitioned (disjoint per-file key intervals) and sorted
    within each file (monotone row-group stats). ``num_files`` sizes the
    layout — at scale pick ``total_bytes / target_file_size`` (128-512 MB
    files keep footers cheap and scans parallel)."""
    (df.repartitionByRange(num_files, F.col(sort_col))
     .sortWithinPartitions(sort_col)
     .write.mode("overwrite").parquet(path))


def file_stats(path: str, col: str) -> list[tuple[str, object, object]]:
    """Per-file (name, min, max) of ``col`` read straight from parquet
    footers with pyarrow — the same metadata any engine's scan pruner
    uses, so disjointness here IS the file-skipping guarantee. Driver
    cost: one footer read per file (no data IO)."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.read_metadata(os.path.join(path, name))
        idx = md.schema.to_arrow_schema().get_field_index(col)
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or not st.has_min_max:
                continue
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out.append((name, lo, hi))
    return out


def pruned_fraction(path: str, col: str, lo, hi) -> float:
    """Fraction of files a ``col BETWEEN lo AND hi`` scan can skip based
    on footer stats alone (1.0 = everything skipped)."""
    stats = [s for s in file_stats(path, col) if s[1] is not None]
    if not stats:
        return 0.0
    hit = sum(1 for _, mn, mx in stats if not (mx < lo or mn > hi))
    return 1.0 - hit / len(stats)


def zorder_value(c1, c2, bits: int = 16,
                 lo1=None, hi1=None, lo2=None, hi2=None):
    """Morton (Z-order) interleave of two numeric columns, each min-max
    scaled to ``bits`` bits. Ordering data by this value clusters BOTH
    dimensions at once, so footer-stats pruning works for predicates on
    either column — the multi-key generalization of the single-key sort
    in :func:`write_range_layout` (one sorted key gives the other
    dimension no locality at all). Bounds are driver-side constants
    (pass them, or the writer computes them with one tiny aggregate).
    Pure integer shift/or expressions — codegen, no UDF."""
    def scaled(c, lo, hi):
        c = c.cast("double")
        span = F.lit(float(hi - lo)) if hi > lo else F.lit(1.0)
        x = (c - F.lit(float(lo))) / span * F.lit(float((1 << bits) - 1))
        return F.least(F.greatest(x.cast("long"), F.lit(0)),
                       F.lit((1 << bits) - 1))
    a, b = scaled(c1, lo1, hi1), scaled(c2, lo2, hi2)
    out = F.lit(0).cast("long")
    for i in range(bits):
        abit = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bbit = F.shiftright(b, i).bitwiseAND(F.lit(1))
        out = (out.bitwiseOR(F.shiftleft(abit, 2 * i))
               .bitwiseOR(F.shiftleft(bbit, 2 * i + 1)))
    return out


def write_zorder_layout(df: DataFrame, path: str, col1: str, col2: str,
                        num_files: int = 8, bits: int = 16) -> None:
    """Write parquet laid out on the Z-order curve of (col1, col2):
    range-repartition + sort on the morton value, so per-file footer
    stats are tight rectangles in BOTH dimensions and a predicate on
    either column prunes files. One tiny bounds aggregate (4 scalars to
    the driver), then a single shuffle — same cost shape as the
    single-key layout."""
    lo1, hi1, lo2, hi2 = df.agg(
        F.min(col1), F.max(col1), F.min(col2), F.max(col2)).first()
    z = zorder_value(F.col(col1), F.col(col2), bits,
                     float(lo1), float(hi1), float(lo2), float(hi2))
    (df.withColumn("_z", z)
     .repartitionByRange(num_files, F.col("_z"))
     .sortWithinPartitions("_z")
     .drop("_z")
     .write.mode("overwrite").parquet(path))


def compact_parquet(spark, path: str, target_mb: int = 256,
                    preserve_sort: str | None = None,
                    rename=None, remove_dir=None) -> int:
    """Compact a small-file parquet directory in place: coalesce to
    ``ceil(total_bytes / target_mb)`` files (the small-file problem —
    thousands of KB-size files from incremental appends turn every scan
    into a listing+open storm; the reference side-steps it with
    ``--input-split-max-bytes``, a READ-time workaround this fixes at
    REST — MainCliParameterParser.java:102-103). Returns the new file
    count.

    Swap protocol: write to a sibling ``._compact_tmp`` dir, rename the
    live dir aside to ``._compact_old``, rename tmp into place, delete
    old. A crash leaves the OLD data or the NEW data fully intact (data
    is never mixed), but between the two renames there is a brief window
    with no directory at ``path`` — readers racing the swap can see a
    missing path; recovery is manual (rename ``._compact_old`` back).
    Leftover ``._compact_tmp``/``._compact_old`` dirs from a previously
    crashed run make this run fail fast with a named error instead of a
    confusing mid-swap OSError.

    The default ``rename``/``remove_dir`` pair is POSIX
    (``os.rename``/``shutil.rmtree``) and assumes a local or HDFS-like
    filesystem where same-device dir rename is atomic. Object stores
    (S3) have NO atomic rename — callers there must inject their own
    pair (e.g. a manifest/pointer swap); a cross-device POSIX rename
    raises ``OSError(EXDEV)`` loudly rather than degrading to
    copy+delete.

    ``preserve_sort`` re-sorts within partitions so a compacted
    range/Z-order layout keeps its footer-stats pruning (plain coalesce
    would interleave file contents and widen every min/max interval).
    """
    import math
    import os
    import shutil

    if rename is None:
        rename = os.rename
    if remove_dir is None:
        remove_dir = shutil.rmtree

    parts = [d for d in os.listdir(path)
             if os.path.isdir(os.path.join(path, d)) and "=" in d]
    if parts:
        # a hive-partitioned store (e.g. the IVF index's centroid=N
        # dirs): a flat rewrite would silently DROP the partitioning and
        # with it every PartitionFilters prune — refuse instead of
        # corrupting the layout; compact each partition dir separately
        raise ValueError(
            f"{path} is hive-partitioned ({parts[:3]}...); compact each "
            f"partition directory individually to preserve pruning")
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    for leftover in (tmp, old):
        if os.path.exists(leftover):
            raise RuntimeError(
                f"{leftover} exists — a previous compact crashed mid-swap; "
                f"inspect it (._compact_old holds the pre-swap data) and "
                f"remove it before re-running")
    total = sum(os.path.getsize(os.path.join(path, f))
                for f in os.listdir(path) if f.endswith(".parquet"))
    n = max(1, math.ceil(total / (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    if preserve_sort is not None:
        out = (df.repartitionByRange(n, F.col(preserve_sort))
               .sortWithinPartitions(preserve_sort))
    else:
        out = df.coalesce(n)
    out.write.mode("overwrite").parquet(tmp)
    rename(path, old)
    rename(tmp, path)
    remove_dir(old)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def compact_partitioned(spark, path: str, target_mb: int = 256,
                        rename=None, remove_dir=None) -> dict:
    """Compact a hive-partitioned store partition-BY-partition (the
    companion to :func:`compact_parquet`, which refuses such stores):
    each ``key=value`` directory is compacted independently with the
    same atomic swap, so the partition layout — and every
    PartitionFilters prune on it — survives. Incremental appenders
    (``append_to_ivf_index``, daily loads) fragment exactly these
    per-partition dirs; nested partitioning recurses. Returns
    {partition_path: new_file_count}."""
    import os

    out: dict = {}
    for d in sorted(os.listdir(path)):
        sub = os.path.join(path, d)
        if not (os.path.isdir(sub) and "=" in d):
            continue
        if any(os.path.isdir(os.path.join(sub, g)) and "=" in g
               for g in os.listdir(sub)):
            out.update(compact_partitioned(spark, sub, target_mb,
                                           rename, remove_dir))
        else:
            out[sub] = compact_parquet(spark, sub, target_mb,
                                       rename=rename, remove_dir=remove_dir)
    if not out:
        raise ValueError(f"{path} has no key=value partition dirs — "
                         f"use compact_parquet for flat stores")
    return out

"""Change-data-capture materialization ([EXT]).

The reference loads immutable daily drops (`ClickhouseHdfsLoader.java`'s
dt-partitioned tables); a lakehouse ingest additionally has to APPLY a
change log — the Debezium/binlog shape: a stream of
insert/update/delete ops per business key that must collapse into the
current table state (ClickHouse models this as
ReplacingMergeTree/CollapsingMergeTree background merges; here it is an
explicit, deterministic operator).

Both operators are pure DataFrame compositions with exact SQL twins:

- :func:`cdc_apply` — latest-op-wins snapshot of an op log.
- :func:`merge_upsert` — MERGE a change batch into an existing
  snapshot (the Delta/Iceberg `MERGE INTO` shape).

Scale: one shuffle each, keyed on the business key. ``cdc_apply`` is a
per-key window (row_number over the op order); ``merge_upsert`` is one
left-anti join plus a union — both linear, no driver actions, skew
bounded by per-key op counts (bounded in any real log by compaction
cadence).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def cdc_apply(ops: DataFrame, key_cols: list[str], order_cols: list[str],
              op_col: str = "op", delete_value: str = "delete",
              keep_deletes: bool = False) -> DataFrame:
    """Collapse a CDC op log into current state: for each key keep the
    payload of the op with the HIGHEST ``order_cols`` tuple — unless
    that op is a delete, in which case the key vanishes.

    ``order_cols`` must be a deterministic total order per key (e.g.
    ``[commit_ts, seq_no]`` — pass the tie-breaker explicitly; a bare
    timestamp with duplicates would make the snapshot
    nondeterministic). Plan: one shuffle on the key, one row_number
    window (Spark pushes a WindowGroupLimit partial top-1 below the
    shuffle, so only per-partition winners move), one filter — never a
    self-join, never a driver action.

    ``keep_deletes=True`` keeps the winning delete markers (and the
    ``op_col``) instead of dropping those keys — the CHANGE-SET shape
    :func:`merge_upsert` consumes, used by the incremental
    apply-then-merge pipeline (streaming/events.py:stream_cdc_merge).
    """
    w = Window.partitionBy(*key_cols).orderBy(
        *[F.col(c).desc() for c in order_cols])
    latest = (ops.withColumn("_rn", F.row_number().over(w))
              .where(F.col("_rn") == 1))
    if keep_deletes:
        return latest.drop("_rn")
    return (latest.where(F.col(op_col) != delete_value)
            .drop("_rn", op_col))


def merge_upsert(base: DataFrame, changes: DataFrame, key_cols: list[str],
                 op_col: str = "op",
                 delete_value: str = "delete") -> DataFrame:
    """MERGE a change batch into a snapshot (Delta/Iceberg ``MERGE
    INTO`` semantics): rows whose key appears in ``changes`` are
    replaced by the change payload (insert-or-update) or dropped
    (delete); untouched base rows pass through.

    ``changes`` must hold at most one op per key — it is the OUTPUT
    shape of :func:`cdc_apply` over the interval's log plus that log's
    delete markers (apply-then-merge is the standard two-step); a
    multi-op batch should be collapsed by :func:`cdc_apply` first.
    Columns of ``changes`` (minus ``op_col``) must match ``base``.

    Plan: one left-anti join (base vs change keys) + one union — the
    snapshot is never shuffled beyond the join, and AQE broadcasts the
    change side when the batch is small (the common case: a day's
    changes vs a 100 TB snapshot)."""
    kept = base.join(changes.select(*key_cols).distinct(),
                     key_cols, "left_anti")
    upserts = changes.where(F.col(op_col) != delete_value).drop(op_col)
    return kept.unionByName(upserts)

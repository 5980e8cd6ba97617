"""CDC materialization + OHLC edge semantics (the cases the fixture
oracles can't force: delete-last vs delete-then-reinsert keys, order
tie-breaks, same-timestamp open/close picks)."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from clickhouse_hdfs_loader_spark.operators.cdc import cdc_apply, merge_upsert


def test_cdc_apply_latest_op_wins(spark):
    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    ops = spark.createDataFrame(
        [  # key 1: upsert then delete → vanishes
         (1, "a1", t, 1, "upsert"),
         (1, "a2", t + h, 2, "delete"),
         # key 2: delete then re-insert → present with latest payload
         (2, "b1", t, 3, "delete"),
         (2, "b2", t + h, 4, "upsert"),
         # key 3: same ts, seq tie-break — seq 6 wins
         (3, "c-low", t, 5, "upsert"),
         (3, "c-high", t, 6, "upsert"),
         # key 4: single upsert
         (4, "d", t, 7, "upsert")],
        "k long, payload string, ts timestamp, seq long, op string")
    got = {r["k"]: r["payload"]
           for r in cdc_apply(ops, ["k"], ["ts", "seq"]).collect()}
    assert got == {2: "b2", 3: "c-high", 4: "d"}


def test_merge_upsert_semantics(spark):
    base = spark.createDataFrame(
        [(1, "old1"), (2, "old2"), (3, "old3")], "k long, v string")
    changes = spark.createDataFrame(
        [(2, "new2", "upsert"),          # replace
         (3, None, "delete"),            # drop
         (9, "new9", "upsert")],         # insert
        "k long, v string, op string")
    got = sorted(map(tuple, merge_upsert(base, changes, ["k"]).collect()))
    assert got == [(1, "old1"), (2, "new2"), (9, "new9")]


def test_ohlc_same_timestamp_tie_break(spark):
    from clickhouse_hdfs_loader_spark.operators.asof import ohlc_resample
    t = dt.datetime(2024, 1, 1, 10, 15)
    ev = spark.createDataFrame(
        [  # all in the same hour; events 1 and 2 share the open ts,
           # events 3 and 4 share the close ts — id breaks both ties
         (2, 1, "click", t, 20.0),
         (1, 1, "click", t, 10.0),
         (3, 1, "click", t + dt.timedelta(minutes=5), 99.0),
         (4, 1, "click", t + dt.timedelta(minutes=5), 5.0),
         (5, 1, "click", t + dt.timedelta(minutes=5), None)],
        "event_id long, user_id long, event_type string, ts timestamp, "
        "value double")
    rows = ohlc_resample(ev).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["open"], r["close"]) == (10.0, 5.0)   # id 1 opens, id 4 closes
    assert (r["high"], r["low"], r["ticks"]) == (99.0, 5.0, 4)  # null excluded


def test_two_batch_apply_then_merge_equals_one_shot(spark):
    """The incremental contract: collapsing each in-order batch of the
    log and merging sequentially equals one-shot cdc_apply over the
    whole log — including a key upserted in batch 1 and deleted in
    batch 2 (must vanish) and the reverse (must reappear)."""
    t = dt.datetime(2024, 1, 1)
    h = dt.timedelta(hours=1)
    schema = "k long, payload string, ts timestamp, seq long, op string"
    early = spark.createDataFrame(
        [(1, "a1", t, 1, "upsert"),
         (2, "b1", t, 2, "upsert"),
         (3, "c1", t, 3, "delete")], schema)
    late = spark.createDataFrame(
        [(1, "a2", t + h, 4, "delete"),
         (3, "c2", t + h, 5, "upsert"),
         (4, "d1", t + h, 6, "upsert")], schema)
    one_shot = sorted(map(tuple, cdc_apply(
        early.unionByName(late), ["k"], ["ts", "seq"]).collect()))
    snap = None
    for batch in (early, late):
        changes = cdc_apply(batch, ["k"], ["ts", "seq"], keep_deletes=True)
        base = changes.drop("op").limit(0) if snap is None else snap
        snap = merge_upsert(base, changes, ["k"])
    incremental = sorted(map(tuple, snap.collect()))
    assert incremental == one_shot
    assert {r[0] for r in incremental} == {2, 3, 4}


def test_stream_cdc_merge_matches_batch(spark, sf_dir):
    """The foreachBatch streaming twin lands on the IDENTICAL snapshot
    as the graded batch cdc_apply query over the same op log."""
    from clickhouse_hdfs_loader_spark.plans.queries import REGISTRY
    from clickhouse_hdfs_loader_spark.streaming.events import (
        stream_cdc_merge)
    batch = sorted(map(tuple,
                       REGISTRY["cdc_apply"].fn(spark, sf_dir).collect()))
    stream = sorted(map(tuple, stream_cdc_merge(spark, sf_dir).collect()))
    assert stream == batch and len(stream) > 0


@pytest.mark.slow
def test_cdc_incremental_equals_one_shot_any_in_order_split(spark):
    """For ANY op log and ANY in-order batch split, per-batch collapse +
    sequential merge equals the one-shot collapse — the stream_cdc_merge
    correctness contract, hypothesis-driven over random logs (seq = list
    position, the required explicit total order)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @given(st.lists(st.tuples(st.integers(0, 5), st.booleans()),
                    min_size=1, max_size=24),
           st.integers(1, 4))
    @settings(max_examples=12, deadline=None)
    def check(ops, nbatch):
        rows = [(k, f"p{k}-{i}", i, "delete" if d else "upsert")
                for i, (k, d) in enumerate(ops)]
        schema = "k long, payload string, seq long, op string"
        full = spark.createDataFrame(rows, schema)
        one_shot = sorted(map(tuple,
                              cdc_apply(full, ["k"], ["seq"]).collect()))
        cuts = sorted({(i * len(rows)) // nbatch for i in range(1, nbatch)})
        snap = None
        lo = 0
        for hi in cuts + [len(rows)]:
            if hi == lo:
                continue
            batch = spark.createDataFrame(rows[lo:hi], schema)
            changes = cdc_apply(batch, ["k"], ["seq"], keep_deletes=True)
            base = changes.drop("op").limit(0) if snap is None else snap
            snap = merge_upsert(base, changes, ["k"]) \
                .localCheckpoint(eager=True)
            lo = hi
        assert sorted(map(tuple, snap.collect())) == one_shot

    check()

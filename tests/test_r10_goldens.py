"""r10 golden re-derivations — every pinned literal in the four new
golden oracles (seeded_shuffle, sequence_count, bpe_merges,
pagerank_summary) is recomputed here WITHOUT Spark (duckdb/pyarrow reads
+ pure-Python models), so the driver grade is never circular: the
registry parity harness proves Spark == literals, this file proves
literals == independent replay (the shard_assign / loader-golden
stance, VERDICT r9 ladder step 2)."""

from __future__ import annotations

import re
import struct
from collections import Counter

import duckdb

from clickhouse_hdfs_loader_spark.plans.queries import (
    BPE_MERGES_GOLDEN, PAGERANK_GOLDEN, SEEDED_SHUFFLE_GOLDEN,
    SEQUENCE_COUNT_GOLDEN)
from tests.test_loader_golden import xxh64

SF_GRADING = "/root/testdata/sf0.01"


def _duck():
    con = duckdb.connect()
    for t in ("documents", "events", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{SF_GRADING}/{t}.parquet'")
    return con


def _shuffle_key(doc_id: int, seed: int = 42) -> int:
    """Spark's multi-arg xxhash64(long_col, int_lit) from the public
    spec: hash the 8 LE bytes of the long with seed 42, then the 4 LE
    bytes of the int literal with the previous digest as seed; reported
    as a SIGNED 64-bit value (the sort key)."""
    h = xxh64(struct.pack("<q", doc_id), 42)
    h = xxh64(struct.pack("<i", seed), h)
    return h - (1 << 64) if h >= (1 << 63) else h


def test_seeded_shuffle_golden_rederives():
    ids = [r[0] for r in _duck().execute(
        "SELECT doc_id FROM documents").fetchall()]
    order = sorted(ids, key=lambda d: (_shuffle_key(d), d))
    assert [(p + 1, d) for p, d in enumerate(order[:20])] \
        == SEEDED_SHUFFLE_GOLDEN
    # guard constants
    n, s = _duck().execute(
        "SELECT count(*), sum(doc_id) FROM documents").fetchone()
    assert (n, s) == (500, 124750)


def test_sequence_count_golden_rederives():
    steps = ["view", "click", "purchase"]
    rows = _duck().execute(
        "SELECT user_id, event_type, ts FROM events "
        "ORDER BY user_id, ts, event_id").fetchall()
    want: dict = {}
    state: dict = {}
    for u, t, ts in rows:
        want.setdefault(u, 0)
        idx, last = state.get(u, (0, None))
        if t == steps[idx] and (idx == 0 or ts > last):
            last = ts
            idx += 1
            if idx == len(steps):
                want[u] += 1
                idx, last = 0, None
        state[u] = (idx, last)
    got = (len(want), sum(want.values()),
           sum(1 for v in want.values() if v >= 1))
    assert got == SEQUENCE_COUNT_GOLDEN
    g = _duck().execute("SELECT count(*), sum(event_id), sum(user_id) "
                        "FROM events").fetchone()
    assert tuple(g) == (10000, 49995000, 742783)


def test_bpe_merges_golden_rederives():
    wc: Counter = Counter()
    for (text,) in _duck().execute("SELECT text FROM documents").fetchall():
        wc.update(re.findall(r"[a-z0-9]+", text.lower()))
    vocab = {tuple(list(w) + ["</w>"]): c for w, c in wc.items()}
    merges = []
    for _ in range(8):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), total = min(pairs.items(),
                            key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if total < 2:
            break
        merges.append((a, b))
        nv: dict = {}
        for syms, c in vocab.items():
            res, i = [], 0
            while i < len(syms):
                if (i + 1 < len(syms) and syms[i] == a
                        and syms[i + 1] == b):
                    res.append(a + b)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            nv[tuple(res)] = nv.get(tuple(res), 0) + c
        vocab = nv
    assert merges == BPE_MERGES_GOLDEN
    n, ls = _duck().execute(
        "SELECT count(*), sum(length(text)) FROM documents").fetchone()
    assert (n, ls) == (500, 149174)


def test_pagerank_golden_rederives():
    con = _duck()
    epairs = sorted({(c, s + 1_000_000) for c, s in con.execute(
        "SELECT o_custkey, l_suppkey FROM orders JOIN lineitem "
        "ON o_orderkey = l_orderkey "
        "WHERE o_custkey IS NOT NULL AND l_suppkey IS NOT NULL")
        .fetchall()})
    nodes = sorted({s for s, _ in epairs} | {d for _, d in epairs})
    odeg: dict = {}
    for s, _d in epairs:
        odeg[s] = odeg.get(s, 0) + 1
    mass = {v: 1_000_000 for v in nodes}
    teleport = (1_000_000 * 150) // 1000
    for _ in range(5):
        infl = {v: 0 for v in nodes}
        for s, d in epairs:
            infl[d] += (mass[s] * 850) // (1000 * odeg[s])
        mass = {v: teleport + infl[v] for v in nodes}
    mx = max(mass.values())
    top = min(v for v in nodes if mass[v] == mx)
    assert (len(nodes), sum(mass.values()), mx, top) == PAGERANK_GOLDEN
    g = con.execute(
        "SELECT (SELECT count(*) FROM orders),"
        "(SELECT sum(o_custkey) FROM orders),"
        "(SELECT count(*) FROM lineitem),"
        "(SELECT sum(l_suppkey) FROM lineitem)").fetchone()
    assert tuple(g) == (15000, 11259112, 60000, 2962419)

"""Distributed ClickHouse writer: batching, shard routing, replica fan-out.

Reference parity (SURVEY §2.A W1/W2/W6 + P1/P4):
- W1 buffered batch INSERT — rows buffered per shard under an
  ``INSERT INTO … FORMAT …`` header, flushed at ``--batch-size`` or the
  1 048 576-row ClickHouse atomic-insert cap
  (AbstractClickhouseLoaderMapper.java:288-298, HostRecordsCache.java:6-17).
- W2 direct insert w/ replica fan-out — Replicated engine → insert into
  ONE alive replica (HTTP-200 probe); non-replicated → insert into EVERY
  replica of the shard (AbstractClickhouseLoaderMapper.java:309-359).
- W6 load accounting — Success/Failed records accumulators; job fails if
  any failed (:135-138; ClickhouseHdfsLoader.java:203-207).

Spark shape: ``repartition`` on the shard column co-locates each shard's
rows (operators/sharding.py), then ``foreachPartition`` runs this writer
with per-shard buffers — the exact HostRecordsCache design, one Python
writer per partition, connections from the per-process client cache. At
1000 executors this gives bounded ClickHouse fan-in: ≤ partitions × shards
connections, tunable via tasks_per_shard.

Speculative execution must stay off (session.py: spark.speculation=false,
mirroring ClickhouseHdfsLoader.java:194-197) or retried tasks double-insert
in direct mode; the staged mode (staging.py) is the exactly-once-ish path.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame

from ..config import LoaderConfig
from ..operators.sharding import ClusterTopology, repartition_by_shard
from .client import get_client, with_retries

FLUSH_CAP = 1_048_576  # ClickHouse atomic-insert bound (reference :294-295)


def insert_header(database: str, table: str, fmt: str) -> str:
    """``INSERT INTO db.table FORMAT TabSeparated`` — the sqlHeader of
    AbstractClickhouseLoaderMapper.java:548-553."""
    return f"INSERT INTO {database}.{table} FORMAT {fmt}"


@dataclass
class ShardBuffer:
    """Per-shard row buffer — HostRecordsCache.java:6-17."""
    lines: list[str]
    count: int = 0

    def append(self, line: str) -> None:
        self.lines.append(line)
        self.count += 1

    def drain(self) -> str:
        payload = "\n".join(self.lines)
        self.lines = []
        self.count = 0
        return payload


def _deliver(payload: str, header: str, hosts: tuple[str, ...], *,
             http_port: int, replicated: bool, max_tries: int,
             backoff_scale: float, database: str,
             user: str = "default", password: str = "") -> int:
    """W2 fan-out decision tree: Replicated → first alive replica only;
    non-replicated → every replica (AbstractClickhouseLoaderMapper.java:
    309-359)."""
    targets: list[str]
    if replicated:
        alive = [h for h in hosts
                 if get_client(h, http_port, user=user, password=password,
                               database=database).ping()]
        targets = [alive[0] if alive else hosts[0]]
    else:
        targets = list(hosts)
    for h in targets:
        cli = get_client(h, http_port, user=user, password=password,
                         database=database)
        with_retries(lambda c=cli: c.insert_payload(header, payload),
                     tier="direct", max_tries=max_tries,
                     backoff_scale=backoff_scale)
    return len(targets)


def write_direct(df: DataFrame, key_col: str, topology: ClusterTopology,
                 config: LoaderConfig, *, database: str, table: str,
                 replicated: bool = False, backoff_scale: float = 1.0) -> dict:
    """Direct-mode load (``--direct true``): route → serialize → buffered
    batch inserts to the shard's local table. Returns accounting counters
    (W6)."""
    fmt = config.clickhouse_format
    header = insert_header(database, table, fmt)
    batch_size = min(config.batch_size, FLUSH_CAP)
    hosts_per_shard = [n.hosts for n in topology.nodes]
    http_port = config.clickhouse_http_port
    max_tries = config.max_tries
    user, password = config.username, config.password

    spark = df.sparkSession
    ok_acc = spark.sparkContext.accumulator(0)
    fail_acc = spark.sparkContext.accumulator(0)

    routed = repartition_by_shard(df, key_col, topology,
                                  config.tasks_per_shard(len(topology.nodes)))
    data_cols = [c for c in routed.columns if c != "shard"]
    from ..operators.transform import (format_header_lines, wire_line_col,
                                       wire_separator)
    line = wire_line_col(routed, data_cols, wire_separator(fmt))
    serialized = routed.select("shard", line.alias("line"))
    # WithNames[AndTypes] formats: every batch INSERT payload leads with
    # the names (and types) rows
    hdr_lines = format_header_lines(fmt, routed, data_cols)
    payload_prefix = "".join(l + "\n" for l in hdr_lines)

    def write_partition(rows) -> None:
        buffers: dict[int, ShardBuffer] = {}

        def flush(shard: int, buf: ShardBuffer) -> None:
            n = buf.count
            payload = payload_prefix + buf.drain()
            try:
                _deliver(payload, header, hosts_per_shard[shard],
                         http_port=http_port, replicated=replicated,
                         max_tries=max_tries, backoff_scale=backoff_scale,
                         database=database, user=user, password=password)
                ok_acc.add(n)
            except Exception:
                # Count the failure but do NOT re-raise: a failed Spark task
                # would be re-attempted (spark.task.maxFailures) and the
                # retry would re-insert every batch this attempt already
                # delivered. The reference does the same — it counts Failed
                # records in the mapper (AbstractClickhouseLoaderMapper.java:
                # 350-357) and fails the JOB from the driver verdict
                # (ClickhouseHdfsLoader.java:203-207), which write_direct
                # mirrors below.
                fail_acc.add(n)

        for row in rows:
            shard = row["shard"]
            buf = buffers.setdefault(shard, ShardBuffer([]))
            buf.append(row["line"])
            if buf.count >= batch_size:
                flush(shard, buf)
        for shard, buf in buffers.items():
            if buf.count:
                flush(shard, buf)

    serialized.foreachPartition(write_partition)
    stats = {"success_records": ok_acc.value, "failed_records": fail_acc.value}
    if stats["failed_records"] > 0:
        # job verdict: exit non-zero when any record failed
        # (ClickhouseHdfsLoader.java:203-207)
        raise RuntimeError(f"load failed: {stats}")
    return stats

"""Two-phase staged load (``--direct false``) — reference W3/W4/D1.

Protocol (SURVEY §3.2-3.3):
1. per-task temp table ``temp.<table>_<dtYYYYMMDD>_<epoch>_p<NNNNNN>_A``
   created on every shard host with the target's DDL rewritten to
   ``ENGINE = StripeLog`` (ClickhouseHdfsLoader.java:114-118 prefix;
   AbstractClickhouseLoaderMapper.java:568-591 rewrite, :631-651
   create-with-retry);
2. executors batch-insert into their temp table;
3. after the Spark action completes, the DRIVER promotes each
   (host, temp) with ``INSERT INTO target SELECT * FROM temp.x``
   (ClickhouseLoaderReducer.java:218-260) — no reducer stage needed,
   Spark's driver already knows every (partition → shard → host) pair;
4. non-replicated targets replay on sibling replicas via
   ``INSERT INTO target SELECT * FROM remote('h:9000', temp, u, p)``
   (ClickhouseLoaderReducer.java:231-254);
5. temp tables dropped on success AND on abort — the
   CleanupTempTableOutputCommitter.java:62-87 / ClickhouseHdfsLoader.java:
   496-524 GC, here a ``try/finally`` around the action.

Exactly-once posture: temp-table names are attempt-scoped
(partitionId + attemptNumber), so a retried task writes a fresh table and
an aborted attempt's table is simply never promoted — duplicate promotion
is impossible without distributed coordination, which is the same
guarantee level the reference achieves by disabling speculation.
"""

from __future__ import annotations

import re
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from ..config import LoaderConfig
from ..operators.sharding import ClusterTopology, repartition_by_shard
from .client import ClickHouseClient, get_client, with_retries

TEMP_DATABASE = "temp"


def temp_table_prefix(table: str, dt: str) -> str:
    """``<tbl>_<dtYYYYMMDD>_<epochSeconds>_`` (ClickhouseHdfsLoader.java:
    114-118)."""
    return f"{table}_{dt.replace('-', '')}_{int(time.time())}_"


def temp_table_name(prefix: str, partition_id: int, attempt: int) -> str:
    """Attempt-scoped analogue of the MR task id ``m_NNNNNN_A``."""
    return f"{prefix}p{partition_id:06d}_{attempt}"


def rewrite_ddl_to_striplog(create_ddl: str, temp_db: str, temp_table: str) -> str:
    """Rewrite ``SHOW CREATE TABLE`` output to a StripeLog temp table —
    same transformation as AbstractClickhouseLoaderMapper.java:568-591:
    new name, ENGINE → StripeLog, engine parameters dropped."""
    ddl = re.sub(r"CREATE TABLE\s+\S+", f"CREATE TABLE {temp_db}.{temp_table}",
                 create_ddl, count=1, flags=re.IGNORECASE)
    ddl = re.sub(r"ENGINE\s*=\s*\w+(\([^)]*\))?.*$", "ENGINE = StripeLog",
                 ddl, count=1, flags=re.IGNORECASE | re.DOTALL)
    return ddl


@dataclass
class StagedLoadPlan:
    """Driver-side bookkeeping of what must be promoted where."""
    target_database: str
    target_table: str
    temp_tables: list[tuple[str, str]] = field(default_factory=list)  # (host, temp)


def stage_partitions(df: DataFrame, key_col: str, topology: ClusterTopology,
                     config: LoaderConfig, *, create_ddl: str,
                     target_database: str, target_table: str, dt: str,
                     backoff_scale: float = 1.0) -> StagedLoadPlan:
    """Phase 1+2: create per-partition temp tables and batch-insert into
    them from ``foreachPartition``. Returns the promote plan."""
    from pyspark import TaskContext
    from pyspark.sql import functions as F

    from ..operators.transform import format_header_lines, wire_separator

    prefix = temp_table_prefix(target_table, dt or "00000000")
    fmt = config.clickhouse_format
    sep = wire_separator(fmt)
    batch_size = min(config.batch_size, 1_048_576)
    hosts_per_shard = [n.hosts for n in topology.nodes]
    http_port = config.clickhouse_http_port
    max_tries = config.max_tries
    user, password = config.username, config.password

    routed = repartition_by_shard(df, key_col, topology,
                                  config.tasks_per_shard(len(topology.nodes)))
    data_cols = [c for c in routed.columns if c != "shard"]
    from ..operators.transform import wire_line_col
    line = wire_line_col(routed, data_cols, sep)
    serialized = routed.select("shard", line.alias("line"))
    hdr_lines = format_header_lines(fmt, routed, data_cols)
    payload_prefix = "".join(l + "\n" for l in hdr_lines)

    def stage_one(rows):
        ctx = TaskContext.get()
        pid, attempt = ctx.partitionId(), ctx.attemptNumber()
        temp = temp_table_name(prefix, pid, attempt)
        ddl = rewrite_ddl_to_striplog(create_ddl, TEMP_DATABASE, temp)
        header = f"INSERT INTO {TEMP_DATABASE}.{temp} FORMAT {fmt}"
        created: set[str] = set()
        loaded: set[str] = set()

        def ensure(host: str) -> None:
            if host not in created:
                cli = get_client(host, http_port, user=user, password=password)
                with_retries(lambda: cli.execute(
                    f"CREATE DATABASE IF NOT EXISTS {TEMP_DATABASE}"),
                    tier="ddl", max_tries=max_tries, backoff_scale=backoff_scale)
                with_retries(lambda: cli.execute(ddl), tier="ddl",
                             max_tries=max_tries, backoff_scale=backoff_scale)
                created.add(host)

        picked: dict[int, str] = {}

        def pick_host(shard: int) -> str:
            # stage on the first ALIVE replica, falling back through the
            # list (the reference picks an available node via
            # getANodeAddress, AbstractClickhouseLoaderMapper.java:318-326)
            # — a single down first-replica must not fail the staged load
            if shard not in picked:
                hosts = hosts_per_shard[shard]
                picked[shard] = next(
                    (h for h in hosts
                     if get_client(h, http_port, user=user,
                                   password=password).ping()),
                    hosts[0])
            return picked[shard]

        def flush(shard: int, buf: list[str]) -> None:
            host = pick_host(shard)
            ensure(host)
            payload = payload_prefix + "\n".join(buf)
            cli = get_client(host, http_port, user=user, password=password)
            with_retries(lambda: cli.insert_payload(header, payload),
                         tier="staged", max_tries=max_tries,
                         backoff_scale=backoff_scale)
            loaded.add(host)

        buffers: dict[int, list[str]] = {}
        for row in rows:
            buf = buffers.setdefault(row["shard"], [])
            buf.append(row["line"])
            if len(buf) >= batch_size:
                flush(row["shard"], buf)
                buffers[row["shard"]] = []
        for shard, buf in buffers.items():
            if buf:
                flush(shard, buf)
        # mapper output of W3: ("taskId@host", temp_table) pairs
        return [(h, f"{TEMP_DATABASE}.{temp}") for h in loaded]

    pairs = serialized.rdd.mapPartitions(
        lambda rows: iter(stage_one(rows))).collect()
    plan = StagedLoadPlan(target_database, target_table)
    plan.temp_tables = sorted(set(pairs))
    return plan


def promote(plan: StagedLoadPlan, topology: ClusterTopology,
            config: LoaderConfig, *, replicated: bool = False,
            user: str = "default", password: str = "",
            backoff_scale: float = 1.0) -> None:
    """Phase 3+4: driver-side ``INSERT INTO target SELECT * FROM temp`` per
    (host, temp) pair, replica replay via remote() for non-replicated
    engines, then drop (ClickhouseLoaderReducer.java:218-260)."""
    tgt = f"{plan.target_database}.{plan.target_table}"
    port = config.clickhouse_http_port
    try:
        for host, temp in plan.temp_tables:
            cli = get_client(host, port, user=user, password=password)
            with_retries(lambda c=cli, t=temp: c.execute(
                f"INSERT INTO {tgt} SELECT * FROM {t}"),
                tier="promote", max_tries=config.max_tries,
                backoff_scale=backoff_scale)
            if not replicated:
                siblings = _replicas_of(host, topology)
                for sib in siblings:
                    scli = get_client(sib, port, user=user, password=password)
                    with_retries(lambda c=scli, h=host, t=temp: c.execute(
                        f"INSERT INTO {tgt} SELECT * FROM "
                        f"remote('{h}:9000', {t}, '{user}', '{password}')"),
                        tier="promote", max_tries=config.max_tries,
                        backoff_scale=backoff_scale)
    finally:
        cleanup(plan, topology, config, backoff_scale=backoff_scale)


def _replicas_of(host: str, topology: ClusterTopology) -> tuple[str, ...]:
    for n in topology.nodes:
        if host in n.hosts:
            return tuple(h for h in n.hosts if h != host)
    return ()


def cleanup(plan: StagedLoadPlan, topology: ClusterTopology,
            config: LoaderConfig, backoff_scale: float = 1.0) -> None:
    """D1 temp-table GC — drop every staged table on its host(s); errors
    swallowed per host like the reference's best-effort cleaner
    (ClickhouseHdfsLoader.java:496-524)."""
    port = config.clickhouse_http_port
    for host, temp in plan.temp_tables:
        for h in (host, *_replicas_of(host, topology)):
            try:
                get_client(h, port, user=config.username,
                           password=config.password).execute(
                    f"DROP TABLE IF EXISTS {temp}")
            except Exception:  # noqa: BLE001 — best-effort GC
                pass


def staged_load(df: DataFrame, key_col: str, topology: ClusterTopology,
                config: LoaderConfig, *, create_ddl: str,
                target_database: str, target_table: str, dt: str = "",
                replicated: bool = False, backoff_scale: float = 1.0) -> StagedLoadPlan:
    """Full two-phase load: stage → promote (+replica replay) → GC."""
    plan = stage_partitions(df, key_col, topology, config,
                            create_ddl=create_ddl,
                            target_database=target_database,
                            target_table=target_table, dt=dt,
                            backoff_scale=backoff_scale)
    promote(plan, topology, config, replicated=replicated,
            user=config.username, password=config.password,
            backoff_scale=backoff_scale)
    return plan

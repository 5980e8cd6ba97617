"""Streaming → ClickHouse sink via ``foreachBatch`` ([EXT]).

The reference's incremental story is the daily batch load (D2/D3); the
streaming continuation is a Structured Streaming query whose micro-batches
run the SAME direct-mode writer — identical routing, batching, retries and
accounting — so a Kafka/file stream loads into the sharded cluster with
per-batch atomicity. At scale this is the standard exactly-once-ish
pattern: micro-batch id + attempt-scoped temp tables (staging.py) give
idempotent replays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from ..config import LoaderConfig
from ..operators.sharding import ClusterTopology
from .. import clickhouse


def stream_to_clickhouse(stream: DataFrame, key_col: str,
                         topology: ClusterTopology, config: LoaderConfig, *,
                         database: str, table: str, replicated: bool = False,
                         backoff_scale: float = 1.0,
                         checkpoint_dir: str | None = None,
                         available_now: bool = True) -> StreamingQuery:
    """Attach the direct-mode writer to a stream; each micro-batch is one
    bounded load job (W1/W2 semantics per batch)."""
    from ..clickhouse.writer import write_direct

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        write_direct(batch_df, key_col, topology, config,
                     database=database, table=table, replicated=replicated,
                     backoff_scale=backoff_scale)

    writer = stream.writeStream.foreachBatch(write_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()

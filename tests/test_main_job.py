"""End-to-end load-job test mirroring the reference's quick-start worked
example (doc/quick-start.md, FIXTURES.md §2): pipe-delimited text read →
exclude-fields → null rules → width check against the DESCRIBEd target →
murmur shard routing → staged/direct write — all against mock ClickHouse
hosts with a canned catalog."""

from __future__ import annotations

import pytest

from clickhouse_hdfs_loader_spark.config import parse_args
from clickhouse_hdfs_loader_spark.main import _parse_connect, run_load

from .mock_clickhouse import MockClickHouse

TARGET_DDL = ("CREATE TABLE test.t1 (plat Int8, h_did String, v Int32) "
              "ENGINE = Distributed(ck, test_local, t1, cityHash64(h_did))")
LOCAL_DDL = ("CREATE TABLE test_local.t1 (plat Int8, h_did String, v Int32) "
             "ENGINE = MergeTree ORDER BY h_did")


@pytest.fixture()
def cluster():
    servers = [MockClickHouse() for _ in range(2)]
    entry = servers[0]
    hosts = "','".join(f"{s.host}:{s.port}" for s in servers)
    entry.canned["SHOW CREATE TABLE test.t1"] = TARGET_DDL
    entry.canned["SHOW CREATE TABLE test_local.t1"] = LOCAL_DDL
    # a real server answers ORDER BY shard_num DESC — highest shard first
    entry.canned["system.clusters"] = (
        f"2\t1\t['{servers[1].host}:{servers[1].port}']\n"
        f"1\t1\t['{servers[0].host}:{servers[0].port}']\n")
    entry.canned["DESC test_local.t1"] = \
        "plat\tInt8\nh_did\tString\nv\tInt32\n"
    entry.canned["system.columns"] = "3\n"
    for s in servers:
        s.canned.setdefault("system.tables", "")
    yield servers
    for s in servers:
        s.stop()


def _write_input(tmp_path, lines):
    p = tmp_path / "input" / "dt=2017-01-07"
    p.mkdir(parents=True)
    (p / "part-00000").write_text("\n".join(lines) + "\n")
    return str(p)


def test_parse_connect():
    assert _parse_connect("jdbc:clickhouse://h1:8123/db") == ("h1", 8123, "db")
    assert _parse_connect("clickhouse://h2:9000/") == ("h2", 9000, "default")


def test_quickstart_shaped_direct_load(spark, tmp_path, cluster):
    """5 source fields, exclude {1, 3} → 3 target columns; \\N nulls
    normalized per target type; rows land sharded by h_did."""
    lines = [
        f"{i % 7}|junk|did_{i}|junk2|{i}" for i in range(50)
    ] + ["\\N|junk|did_x|junk2|\\N"]      # null plat (non-string) + null v
    export_dir = _write_input(tmp_path, lines)
    entry = cluster[0]
    cfg = parse_args([
        "--connect", f"jdbc:clickhouse://{entry.host}:{entry.port}/test",
        "--table", "t1", "--export-dir", export_dir,
        "--fields-terminated-by", "|", "--exclude-fields", "1,3",
        "--direct", "true", "--batch-size", "20", "--input-format", "text",
    ])
    stats = run_load(cfg, spark, backoff_scale=0.001)
    assert stats == {"success_records": 51, "failed_records": 0}

    rows = [line for s in cluster for ins in s.inserts()
            if ins.startswith("INSERT INTO test_local.t1 FORMAT")
            for line in ins.splitlines()[1:]]
    assert len(rows) == 51
    # null normalization: \N → "0" for the non-string cols (plat, v)
    assert "0\tdid_x\t0" in rows
    # both shards received data (murmur spread over 51 distinct keys)
    per_shard = [sum(len(i.splitlines()) - 1 for i in s.inserts()) for s in cluster]
    assert all(n > 0 for n in per_shard)


def test_quickstart_shaped_staged_load(spark, tmp_path, cluster):
    lines = [f"{i % 7}|junk|did_{i}|junk2|{i}" for i in range(30)]
    export_dir = _write_input(tmp_path, lines)
    entry = cluster[0]
    cfg = parse_args([
        "--connect", f"jdbc:clickhouse://{entry.host}:{entry.port}/test",
        "--table", "t1", "--export-dir", export_dir,
        "--exclude-fields", "1,3", "--direct", "false", "--dt", "2017-01-07",
    ])
    stats = run_load(cfg, spark, backoff_scale=0.001)
    assert stats["staged_tables"] >= 1
    all_stmts = [s for m in cluster for s in m.statements]
    assert any(s.startswith("CREATE TABLE temp.t1_20170107_") for s in all_stmts)
    assert any(s.startswith("INSERT INTO test_local.t1 SELECT * FROM temp.")
               for s in all_stmts)


def test_width_mismatch_rejected(spark, tmp_path, cluster):
    """T9: wrong produced-column count must abort before any write
    (AbstractClickhouseLoaderMapper.java:242-245)."""
    export_dir = _write_input(tmp_path, ["a|b|c|d|e"])
    entry = cluster[0]
    cfg = parse_args([
        "--connect", f"jdbc:clickhouse://{entry.host}:{entry.port}/test",
        "--table", "t1", "--export-dir", export_dir,
        "--exclude-fields", "1",    # 5 − 1 = 4 ≠ 3 target columns
        "--direct", "true",
    ])
    with pytest.raises(ValueError, match="Illegal format"):
        run_load(cfg, spark, backoff_scale=0.001)
    assert not [i for s in cluster for i in s.inserts()]


def test_daily_mode_creates_and_expires(spark, tmp_path, cluster):
    entry = cluster[0]
    for s in cluster:
        s.canned["system.tables"] = ""
    export_dir = _write_input(tmp_path, ["1|x|did_1|y|2"])
    cfg = parse_args([
        "--connect", f"jdbc:clickhouse://{entry.host}:{entry.port}/test",
        "--table", "t1", "--export-dir", export_dir,
        "--exclude-fields", "1,3", "--direct", "true",
        "--daily", "true", "--dt", "2017-01-07", "--mode", "drop",
    ])
    run_load(cfg, spark, backoff_scale=0.001)
    all_stmts = [s for m in cluster for s in m.statements]
    assert any("CREATE TABLE IF NOT EXISTS test_local.t1_20170107" in s
               for s in all_stmts)
    # direct insert goes to the daily table
    assert any(s.startswith("INSERT INTO test_local.t1_20170107 FORMAT")
               for s in all_stmts)


def test_hive_partition_and_additional_cols_load(spark, tmp_path, cluster):
    """T6+T7 through the CLI: partition value from the path and a constant
    column both count toward the target width (5 data − 2 excl + dt +
    const = 5 target columns)."""
    entry = cluster[0]
    entry.canned["DESC test_local.t1"] = \
        "plat\tInt8\nh_did\tString\nv\tInt32\ndt\tString\nsrc\tString\n"
    lines = [f"{i % 3}|x|did_{i}|y|{i}" for i in range(12)]
    export_dir = _write_input(tmp_path, lines)
    cfg = parse_args([
        "--connect", f"jdbc:clickhouse://{entry.host}:{entry.port}/test",
        "--table", "t1", "--export-dir", export_dir,
        "--exclude-fields", "1,3", "--direct", "true",
        "--extract-hive-partitions", "true",
        "--additional-cols", "batch7",
    ])
    stats = run_load(cfg, spark, backoff_scale=0.001)
    assert stats["success_records"] == 12
    rows = [line for s in cluster for ins in s.inserts()
            for line in ins.splitlines()[1:]]
    # every wire row carries the path partition value and the constant
    assert all(line.endswith("\t2017-01-07\tbatch7") for line in rows)


def test_orc_input_direct_load(spark, tmp_path, cluster):
    """S2+T2 through the CLI: ORC source decoded stringly (every field
    coerced to string, OrcRecordDecoder.java:32-45 semantics), excluded
    positionally, null-normalized per target type, sharded and written."""
    orc_dir = str(tmp_path / "orc_in" / "dt=2017-01-07")
    rows = [(i % 7, "junk", f"did_{i}", "junk2", i) for i in range(20)]
    df = spark.createDataFrame(
        rows, ["plat", "skip1", "h_did", "skip2", "v"])
    # one ORC file with a null in a non-string target column
    df = df.union(spark.createDataFrame(
        [(None, "junk", "did_x", "junk2", None)], df.schema))
    df.coalesce(1).write.orc(orc_dir)
    entry = cluster[0]
    cfg = parse_args([
        "--connect", f"jdbc:clickhouse://{entry.host}:{entry.port}/test",
        "--table", "t1", "--export-dir", orc_dir,
        "--exclude-fields", "1,3", "--direct", "true",
        "--input-format", "orc",
    ])
    stats = run_load(cfg, spark, backoff_scale=0.001)
    assert stats == {"success_records": 21, "failed_records": 0}
    wire = [line for s in cluster for ins in s.inserts()
            if ins.startswith("INSERT INTO test_local.t1 FORMAT")
            for line in ins.splitlines()[1:]]
    assert len(wire) == 21
    # ORC null → "0" for the non-string cols (plat Int8, v Int32)
    assert "0\tdid_x\t0" in wire
    # stringly decode keeps integer field text form
    assert any(line.split("\t") == ["3", "did_3", "3"] for line in wire)


def test_credentials_and_reduce_tasks_options(spark, tmp_path, cluster):
    """--username/--password flow to every HTTP call; --num-reduce-tasks
    overrides the P4 write-task sizing; --mapper-class (deprecated) maps
    reference mapper class names onto the input-format registry."""
    lines = [f"{i % 7}|x|did_{i}|y|{i}" for i in range(10)]
    export_dir = _write_input(tmp_path, lines)
    entry = cluster[0]
    cfg = parse_args([
        "--connect", f"jdbc:clickhouse://{entry.host}:{entry.port}/test",
        "--table", "t1", "--export-dir", export_dir,
        "--exclude-fields", "1,3", "--direct", "true",
        "--username", "loader_user", "--password", "s3cret",
        "--num-reduce-tasks", "8",
        "--mapper-class",
        "com.kugou.loader.clickhouse.mapper.TextLoaderMapper",
    ])
    assert cfg.username == "loader_user" and cfg.password == "s3cret"
    assert cfg.input_format == "text"
    # 8 total write tasks over 2 shards → 4 per shard
    assert cfg.tasks_per_shard(2) == 4
    stats = run_load(cfg, spark, backoff_scale=0.001)
    assert stats["failed_records"] == 0
    for s in cluster:
        assert s.auth_users and all(u == "loader_user" for u in s.auth_users)


def test_mapper_class_orc_mapping():
    cfg = parse_args([
        "--mapper-class", "com.kugou.loader.clickhouse.mapper.OrcLoaderMapper",
    ])
    assert cfg.input_format == "orc"
    # explicit -i wins over the deprecated alias
    cfg2 = parse_args(["--input-format", "parquet",
                       "--mapper-class", "whatever.OrcLoaderMapper"])
    assert cfg2.input_format == "parquet"

"""Driver-mimicking correctness gate: run every registered query on Spark
and its oracle on DuckDB over the same parquet, compare row count, column
names, and an order-insensitive value hash (columns sorted by name) — the
same comparison shape the driver records in CORRECTNESS_r{N}.json."""

from __future__ import annotations

import math

import duckdb
import pytest

from clickhouse_hdfs_loader_spark.plans.queries import REGISTRY
from clickhouse_hdfs_loader_spark.sources.tables import TABLES

ORACLE_SPECS = [s for s in REGISTRY.values() if s.oracle is not None]
ROWS_ONLY_SPECS = [s for s in REGISTRY.values() if s.oracle is None]


def _norm_cell(v):
    if v is None:
        return "␀"
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # normalize -0.0 and integral floats
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return repr(round(v, 9))
    return str(v)


def _value_multiset(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm_cell(r[i]) for i in order) for r in rows)


def _connect(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def duck(sf_dir):
    return _connect(sf_dir)


@pytest.fixture(scope="module")
def duck_grading():
    return _connect("/root/testdata/sf0.01")


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_parity(spark, sf_dir, duck, duck_grading, spec):
    if "golden-sf0.01" in spec.tags:
        # Oracles with pinned-literal components are only valid at the
        # driver's grading scale — run BOTH sides there (their computed
        # columns still need sf0.01 views).
        sf_dir = "/root/testdata/sf0.01"
        duck = duck_grading
    sdf = spec.fn(spark, sf_dir)
    # the Spark side of the non-scalar tripwire: an array/struct/map
    # output column crashes the driver's pandas canonicalizer even when
    # the DuckDB DESCRIBE side looks fine (r10 minmax_normalize)
    complex_cols = [(f.name, f.dataType.simpleString())
                    for f in sdf.schema.fields
                    if f.dataType.typeName() in ("array", "struct", "map")]
    assert not complex_cols, (
        f"{spec.name}: Spark output columns {complex_cols} are "
        f"non-scalar — the driver's pandas sort_values cannot hash list "
        f"cells; serialize or explode to scalar rows")
    srows = sdf.collect()
    scols = sdf.columns

    res = duck.execute(spec.oracle)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()

    assert sorted(scols) == sorted(ocols), \
        f"{spec.name}: column mismatch {scols} vs {ocols}"
    assert len(srows) == len(orows), \
        f"{spec.name}: row count {len(srows)} vs {len(orows)}"
    sm = _value_multiset(scols, [tuple(r) for r in srows])
    om = _value_multiset(ocols, orows)
    if sm != om:
        diff = [(a, b) for a, b in zip(sm, om) if a != b][:5]
        pytest.fail(f"{spec.name}: value mismatch, first diffs: {diff}")


# DuckDB renders HUGEINT (int128 — what an uncast sum(CASE…1…0) yields)
# and DECIMAL as float64 through pandas, so the driver's hash path sees
# "1791.0" where Spark emits "1791" — a silent hash mismatch that
# fetchall() (Python ints, used above) can NOT detect. This bit twice in
# r6 (q12_priority_shipping, quality_expectations). DESCRIBE binds the
# query without executing it, so it is safe even for golden oracles with
# error()-guard subqueries.
_FORBIDDEN_ORACLE_TYPES = ("HUGEINT", "DECIMAL")


def _nonscalar_oracle_type(t: str) -> bool:
    """LIST/ARRAY (`BIGINT[]`, `INTEGER[3]`), STRUCT, MAP, and UNION
    output columns crash the driver's pandas canonicalizer
    (`sort_values` → factorize → `unhashable type: 'list'`) — the r10
    minmax_normalize never-green. Serialize (array_to_string) or explode
    to scalar rows instead."""
    u = t.upper()
    return ("[" in u or u.startswith("STRUCT") or u.startswith("MAP")
            or u.startswith("UNION"))


@pytest.mark.parametrize("spec", ORACLE_SPECS, ids=lambda s: s.name)
def test_oracle_types_survive_driver_hashing(duck_grading, spec):
    rows = duck_grading.execute(f"DESCRIBE {spec.oracle}").fetchall()
    bad = [(r[0], r[1]) for r in rows
           if any(t in r[1].upper() for t in _FORBIDDEN_ORACLE_TYPES)
           or _nonscalar_oracle_type(r[1])]
    assert not bad, (
        f"{spec.name}: oracle columns {bad} are HUGEINT/DECIMAL or "
        f"non-scalar (LIST/STRUCT/MAP) — HUGEINT/DECIMAL render as "
        f"floats through the driver's pandas hash path while Spark "
        f"emits ints; non-scalar cells crash its sort_values. CAST to "
        f"BIGINT/DOUBLE, serialize, or explode to scalar rows")




@pytest.mark.parametrize("spec", ROWS_ONLY_SPECS, ids=lambda s: s.name)
def test_rows_only_queries_run(spark, sf_dir, spec):
    df = spec.fn(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_grading_window_registry_discipline():
    """Queries registered in the current round MUST be in that round's
    grading window (the first 50 registry entries) — the r5 late-add gap
    the r6 verdict flagged must not recur. Update this set each round
    alongside _GRADING_WINDOW."""
    window = set(list(REGISTRY)[:50])
    added_this_round = {
        # r16: the twelve r15-built operators, promoted verbatim from
        # their in-test oracles (VERDICT r15 item 5)
        "roc_auc", "brier_score", "classification_report",
        "stream_classification_report", "rolling_corr",
        "vwap_resample", "non_negative_derivative",
        "sequence_match_events_ids", "triangle_count",
        "js_divergence", "fuzzy_join_damerau", "holt_summary",
    }
    missing = added_this_round - window
    assert not missing, (
        f"queries registered this round but absent from the grading "
        f"window (would never be driver-graded): {sorted(missing)}")

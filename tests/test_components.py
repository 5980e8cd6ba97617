"""Connected-components operator tests: chain transitivity, fixpoint,
isolated nodes."""

from __future__ import annotations

from clickhouse_hdfs_loader_spark.operators.components import (
    connected_components,
    dedup_components,
)


def test_chain_collapses_to_one_component(spark):
    # a~b, b~c, c~d → all labeled min(a)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"])
    comp = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_star_and_reverse_chain(spark):
    # reverse-ordered chain exercises propagation through high→low ids
    pairs = spark.createDataFrame(
        [(8, 9), (7, 8), (6, 7), (5, 6)], ["id_a", "id_b"])
    comp = {r["id"]: r["component"]
            for r in connected_components(pairs).collect()}
    assert set(comp.values()) == {5}


def test_dedup_components_keeps_isolated_docs(spark):
    docs = spark.createDataFrame([(i, f"t{i}") for i in range(6)],
                                 ["doc_id", "text"])
    pairs = spark.createDataFrame([(0, 3), (3, 5)], ["id_a", "id_b"])
    out = {r["doc_id"]: r["keeper"]
           for r in dedup_components(docs, pairs).collect()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 0, 4: 4, 5: 0}
    # greedy pair-dropping would have kept 3 docs {0,1,2,4} minus... the
    # component answer keeps exactly one per cluster: keepers {0,1,2,4}
    assert sorted(set(out.values())) == [0, 1, 2, 4]

"""Bucketed co-located join: persisting both join sides bucketed on the
key lets the sort-merge join read pre-shuffled data — the plan must show
NO Exchange above either scan (SURVEY §7 / brief: "bucketing for
co-located joins"). This is the 100 TB pattern for repeated fact-fact
joins on the same key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse_spark(tmp_path_factory):
    # dedicated session: bucketed tables need a catalog + warehouse dir
    from clickhouse_hdfs_loader_spark.session import get_spark
    wh = str(tmp_path_factory.mktemp("warehouse"))
    spark = get_spark(app_name="bucketing",
                      extra_conf={"spark.sql.warehouse.dir": wh,
                                  "spark.sql.autoBroadcastJoinThreshold": "-1"})
    yield spark
    # getOrCreate applied the -1 threshold to the SHARED session — restore
    # the default so later plan-shape tests (broadcast asserts) aren't
    # poisoned by module ordering
    spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


@pytest.mark.slow
def test_bucketed_join_has_no_exchange(warehouse_spark, sf_dir):
    spark = warehouse_spark
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").saveAsTable("orders_b"))
    (li.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").saveAsTable("lineitem_b"))

    joined = (spark.table("orders_b")
              .join(spark.table("lineitem_b"),
                    F.col("o_orderkey") == F.col("l_orderkey"))
              .groupBy("o_orderstatus")
              .agg(F.count(F.lit(1)).alias("cnt")))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    join_section = plan[plan.find("SortMergeJoin"):] if "SortMergeJoin" in plan else plan
    assert "SortMergeJoin" in plan
    # co-located: no shuffle feeds the join inputs
    assert "Exchange hashpartitioning(o_orderkey" not in plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan

    # identical result to the unbucketed join
    plain = (orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
             .groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("cnt")))
    assert sorted(map(tuple, joined.collect())) == sorted(map(tuple, plain.collect()))

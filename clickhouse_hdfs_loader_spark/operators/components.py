"""Connected components over near-duplicate pair graphs ([EXT]).

Greedy pair-dropping (keep id_a, drop id_b) over-deletes when duplicates
chain (a~b, b~c but a≁c); the correct dedup unit is the connected
component. This is the canonical iterative-algorithm case the brief calls
out as genuinely non-SQL-expressible: min-label propagation to fixpoint.

Algorithm: every node starts labeled with its own id; each round, every
node adopts the minimum label in its neighborhood (including itself);
stop when no label changes. Converges in O(graph diameter) rounds — for
near-dup graphs the diameter is tiny (dup clusters are dense), so 3-5
rounds at any corpus size. Each round is two shuffles (join + groupBy);
``localCheckpoint`` truncates the growing lineage so round N doesn't
re-execute rounds 1..N-1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(pairs: DataFrame, max_iter: int = 10) -> DataFrame:
    """pairs(id_a, id_b) undirected → (id, component) with component = min
    node id in the component."""
    edges = (pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
             .unionByName(pairs.select(F.col("id_b").alias("src"),
                                       F.col("id_a").alias("dst"))))
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("component", F.col("id")))
    for _ in range(max_iter):
        neighbor_min = (edges.join(labels, edges.dst == labels.id)
                        .groupBy("src").agg(F.min("component").alias("nmin")))
        updated = (labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
                   .select(labels.id,
                           F.least("component", F.coalesce("nmin", "component"))
                           .alias("component")))
        updated = updated.localCheckpoint(eager=True)
        changed = (updated.alias("u")
                   .join(labels.alias("l"), "id")
                   .where(F.col("u.component") != F.col("l.component"))
                   .limit(1).count())
        labels = updated
        if changed == 0:
            break
    return labels


def dedup_components(docs: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Materialized dedup: keep one doc (min id) per duplicate component;
    docs not in any pair keep themselves. Returns (doc_id, keeper)."""
    comp = connected_components(pairs)
    return (docs.select(id_col)
            .join(comp, docs[id_col] == comp.id, "left")
            .select(F.col(id_col),
                    F.coalesce("component", F.col(id_col)).alias("keeper")))

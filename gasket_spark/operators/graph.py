"""Connected components over near-duplicate pair edges.

``dedup_by_pairs`` uses a one-pass star approximation (drop every
larger-id endpoint), which over-drops when duplicate clusters chain:
a~b, b~c with a<b<c drops BOTH b and c even if a~c was never observed.
Proper cluster resolution labels each doc with its component's min id
and keeps exactly one survivor per component.

:func:`connected_components` is iterative min-label propagation:
every node starts labeled with its own id; each round, a node adopts
the smallest label among itself and its neighbors; fixpoint = every
node carries its component's minimum id. Convergence takes
O(component diameter) rounds — near-dup clusters are shallow, so a
handful. Each round is two shuffles (neighbor-min groupBy + label
join); lineage is truncated per round with ``localCheckpoint`` so the
plan doesn't grow with iterations (the standard iterative-Spark
discipline; on a cluster use ``checkpoint`` to reliable storage).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gasket_spark.utils import persisted


def _loop_partitions(df: DataFrame) -> int:
    """Scale-adaptive partition count for a fixpoint loop's invariant
    tables (guide §2: derive partitioning from input size, never a
    constant): Catalyst's size estimate of the edge input (file-size
    based at the scan — costs no job) over a per-partition byte
    target, clamped to [1, 4 × defaultParallelism]. The old implicit
    constant (spark.sql.shuffle.partitions) over-fans small graphs —
    every one of an 8-round loop's co-partitioned SHJ stages paid
    32 tasks of scheduler overhead for KB-sized partitions that AQE
    cannot coalesce (the cached tables' partitioning is frozen, no
    exchange to re-plan) — and under-fans 100 TB ones. Partition
    count cannot change any result here: both loop fixpoints are
    integer-exact and partition-independent (tests/test_graph.py
    pins partition invariance).

    The default target is 1 MB of ESTIMATE bytes per partition:
    Catalyst's scan estimate is compressed columnar file bytes,
    roughly 8-16x smaller than the in-memory row data the loop
    actually moves, so 1 MB of estimate is a healthy 8-16 MB task —
    measured at sf0.1 (4.5 MB estimate -> 5 partitions) the 8-round
    pagerank loop dropped 7.0 -> 5.2 s noop median vs the 32-constant,
    while a 32 MB target (1 partition) serialized the loop to 8.0 s."""
    target = int(os.environ.get("SPARK_GRAFT_LOOP_PARTITION_BYTES",
                                str(1024 * 1024)))
    est = int(df._jdf.queryExecution().optimizedPlan()
              .stats().sizeInBytes())
    cap = df.sparkSession.sparkContext.defaultParallelism * 4
    return max(1, min(-(-est // target), cap))


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 50) -> DataFrame:
    """Label every vertex of the undirected ``edges`` graph with its
    component's minimum vertex id. Returns (v, component_id).
    Deterministic: the fixpoint is unique regardless of partitioning
    or iteration interleaving."""
    # No .distinct() on sym: the per-round groupBy-min absorbs
    # duplicate edges (they only pad the join output), so the
    # symmetrize pass stays shuffle-free — one fewer exchange +
    # materialization before the loop. (A repartition("u") +
    # shuffle-hash loop like pagerank()'s was A/B-measured 2.7×
    # SLOWER here: the near-dup pair graph is tiny, so the per-round
    # exchange it would save costs less than the setup shuffle —
    # the loop-invariant-partitioning trick only pays on edge tables
    # big enough for the per-round sort/exchange to dominate.)
    sc = edges.sparkSession.sparkContext
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        # union stacks both inputs' partitions (2× task count every
        # round); a narrow coalesce restores the parallelism target
        # without the exchange the old .distinct() paid for.
        .coalesce(sc.defaultParallelism)
    )
    # sym is re-joined every round; labels are localCheckpoint'ed
    # (materialized) each round, so sym's cache can be released the
    # moment the loop exits — scope-bound, not LRU-bound.
    from pyspark.sql import Observation

    # Convergence check without a join OR a second job: labels only
    # ever DECREASE, so Σ label is strictly monotone until the
    # fixpoint — and an Observation attached under the checkpoint
    # computes it DURING the materialization job (verified: metrics
    # fire on localCheckpoint), so each round is exactly one job.
    def _checkpoint_with_sum(df):
        obs = Observation()
        out = df.observe(obs, F.sum("label").alias("s")) \
            .localCheckpoint()
        return out, obs.get["s"]

    with persisted(sym):
        # Round 1 needs NO join: the neighbor-min of the identity seed
        # (label(v) = v) is min(v, min of v's neighbors), which reads
        # straight off the edge list — neighbor candidates from
        # sym(v ← u), self candidates from sym(u ← u). One shuffle
        # replaces seed-distinct + join.
        labels, label_sum = _checkpoint_with_sum(
            sym.select("v", F.col("u").alias("label"))
            .unionByName(sym.select(F.col("u").alias("v"),
                                    F.col("u").alias("label")))
            .groupBy("v").agg(F.min("label").alias("label"))
        )
        for _ in range(max_iter - 1):
            # one hop of min-label propagation in TWO shuffles: push
            # every neighbor's label to v (join on u), union v's own
            # label row, take the min per v. (The previous three-
            # shuffle form did groupBy then re-joined onto labels.)
            labels, new_sum = _checkpoint_with_sum(
                sym.join(labels.select(F.col("v").alias("u"), "label"), "u")
                .select("v", "label")
                .unionByName(labels)
                .groupBy("v").agg(F.min("label").alias("label"))
            )
            if new_sum == label_sum:
                break
            label_sum = new_sum
    return labels.select("v", F.col("label").alias("component_id"))


def dedup_by_components(df: DataFrame, pairs: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """Cluster-correct survivor resolution: connected-components over
    the pair graph, keep the min-id doc per component (docs in no pair
    are their own component and always survive)."""
    comp = connected_components(pairs)
    labeled = df.join(comp.withColumnRenamed("v", id_col), id_col, "left")
    return labeled.filter(
        F.col("component_id").isNull()
        | (F.col(id_col) == F.col("component_id"))).drop("component_id")


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             damping: float = 0.85, max_iter: int = 20) -> DataFrame:
    """PageRank in FIXED-POINT arithmetic: ranks are longs in
    micro-units (1e12 = mass 1.0), contributions use integer floor
    division, and every per-iteration sum is an integer sum — so the
    fixpoint is bit-identical under any partitioning (a double-sum
    PageRank drifts with association order, which would make results
    flap between runs and cluster layouts). The tiny mass lost to
    floor division decays the total by < |V| ulp per round —
    deterministic, and irrelevant to ranking.

    Shape per iteration: one join (ranks → out-edges) + one groupBy
    (contributions by target) + the dangling-mass scalar — two
    shuffles over edge-sized data, lineage truncated per round
    (``localCheckpoint``), edges cached for the loop's lifetime only
    (scope-bound). The dangling-mass scalar needs NO join: the rank
    table carries each vertex's out-degree (joined once, before the
    loop), so the per-round scalar is a plain agg over the
    just-materialized checkpoint. Returns (v, rank) with rank scaled
    back to doubles summing ≈ 1."""
    SCALE = 1_000_000_000_000
    # Loop-invariant tables are pre-partitioned ON THEIR JOIN KEYS and
    # persisted: a cached DataFrame keeps its hash partitioning, so
    # every iteration's join shuffles only the vertex-sized rank table
    # — the edge table (the big side at 100 TB) never moves again.
    # repartition("u") FIRST, dedup second: hash(u) co-locates every
    # copy of an (u, w) edge, and Spark recognizes that
    # HashPartitioning(u) satisfies the dedup's ClusteredDistribution
    # on (u, w) — so the dedup needs NO second exchange (one setup
    # shuffle where distinct().repartition("u") paid two).
    n_parts = _loop_partitions(edges)
    out = (edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
           .repartition(n_parts, "u").dropDuplicates())
    deg = out.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    # verts carries the out-degree (NULL = dangling) for the loop's
    # lifetime, so every rank table inherits it for free.
    verts = (out.select(F.col("u").alias("v"))
             .unionByName(out.select(F.col("w").alias("v")))
             .distinct()
             .join(deg.select(F.col("u").alias("v"), "deg"), "v", "left")
             .repartition(n_parts, "v"))
    with persisted(out, verts):
        n = verts.count()
        d_num, d_den = int(damping * 100), 100
        ranks = verts.withColumn(
            "r", F.lit(SCALE // n).cast("long")).localCheckpoint()
        for _ in range(max_iter):
            # SHUFFLE_HASH hint on the vertex-sized side: both joins
            # are already co-partitioned (no exchange), but the SMJ
            # default re-SORTS the cached edge partitions every round
            # — a per-round O(E log E) the hash build avoids. Build
            # side is one rank-table partition (O(V/P), near-uniform
            # hash keys), so the build is bounded at any scale;
            # measured ~0.3 s/round at sf0.1. Results are unchanged
            # by construction (join strategy can't affect the
            # fixed-point integer arithmetic).
            contrib = (
                out.join(ranks.select(F.col("v").alias("u"), "deg", "r")
                         .hint("shuffle_hash"), "u")
                .select("w", (F.col("r") / F.col("deg"))
                        .cast("long").alias("c"))
                .groupBy("w").agg(F.sum("c").alias("in_mass"))
            )
            # dangling-mass scalar as a BROADCAST 1-row aggregate
            # inside the same plan — no driver collect, so each
            # iteration is ONE job (the checkpoint) instead of two.
            # SQL `div` = Python `//` on the non-negative longs here,
            # keeping the fixed point bit-identical to the unrolled
            # oracle.
            base_df = (
                ranks.agg(
                    F.sum("r").alias("_t"),
                    F.sum(F.when(F.col("deg").isNotNull(), F.col("r"))
                          .otherwise(F.lit(0))).alias("_l"))
                .select(F.expr(
                    f"(_t - _t * {d_num} div {d_den}"
                    f" + (_t - _l) * {d_num} div {d_den}) div {n}")
                    .alias("_base"))
            )
            ranks = (
                verts.join(contrib.withColumnRenamed("w", "v")
                           .hint("shuffle_hash"), "v", "left")
                .crossJoin(F.broadcast(base_df))
                .select("v", "deg",
                        (F.col("_base") + F.coalesce("in_mass", F.lit(0))
                         * d_num / d_den)
                        .cast("long").alias("r"))
                .localCheckpoint()
            )
    return ranks.select(
        "v", (F.col("r").cast("double") / F.lit(float(SCALE)))
        .alias("rank"))

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

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from gasket_spark.utils import persisted


def connected_components(edges: DataFrame, src: str = "id_a",
                         dst: str = "id_b",
                         max_iter: int = 50) -> DataFrame:
    """Label every vertex of the undirected ``edges`` graph with its
    component's minimum vertex id. Returns (v, component_id).
    Deterministic: the fixpoint is unique regardless of partitioning
    or iteration interleaving."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(
            edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    # sym is re-joined every round; labels are localCheckpoint'ed
    # (materialized) each round, so sym's cache can be released the
    # moment the loop exits — scope-bound, not LRU-bound.
    with persisted(sym):
        labels = (
            sym.select(F.col("u").alias("v")).distinct()
            .withColumn("label", F.col("v"))
            .localCheckpoint()
        )
        for _ in range(max_iter):
            nbr_min = (
                sym.join(labels.select(F.col("v").alias("u"), "label"), "u")
                .groupBy("v").agg(F.min("label").alias("nbr_label"))
            )
            new_labels = (
                labels.join(nbr_min, "v", "left")
                .select("v", F.least(
                    "label", F.coalesce("nbr_label", "label")).alias("label"))
                .localCheckpoint()  # truncate lineage each round
            )
            changed = (
                new_labels.alias("n")
                .join(labels.alias("o"), "v")
                .filter(F.col("n.label") < F.col("o.label"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
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
    (scope-bound). Returns (v, rank) with rank scaled back to
    doubles summing ≈ 1."""
    SCALE = 1_000_000_000_000
    out = (edges.select(F.col(src).alias("u"), F.col(dst).alias("w"))
           .distinct())
    verts = (out.select(F.col("u").alias("v"))
             .unionByName(out.select(F.col("w").alias("v")))
             .distinct())
    deg = out.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    with persisted(out, verts, deg):
        n = verts.count()
        d_num, d_den = int(damping * 100), 100
        ranks = verts.withColumn(
            "r", F.lit(SCALE // n).cast("long")).localCheckpoint()
        for _ in range(max_iter):
            contrib = (
                out.join(deg, "u").join(
                    ranks.withColumnRenamed("v", "u"), "u")
                .select("w", (F.col("r") / F.col("deg"))
                        .cast("long").alias("c"))
                .groupBy("w").agg(F.sum("c").alias("in_mass"))
            )
            # one scalar pass: total mass + mass on nodes with out-links
            total, linked = (
                ranks.join(deg.select(F.col("u").alias("v"), "deg"),
                           "v", "left")
                .agg(F.sum("r"),
                     F.sum(F.when(F.col("deg").isNotNull(), F.col("r"))
                           .otherwise(F.lit(0))))
                .collect()[0]
            )
            dangling = total - (linked or 0)
            base = (total - total * d_num // d_den
                    + dangling * d_num // d_den) // n
            ranks = (
                verts.join(contrib.withColumnRenamed("w", "v"), "v", "left")
                .select("v", (F.lit(base) + F.coalesce("in_mass", F.lit(0))
                              * d_num / d_den)
                        .cast("long").alias("r"))
                .localCheckpoint()
            )
    return ranks.select(
        "v", (F.col("r").cast("double") / F.lit(float(SCALE)))
        .alias("rank"))

"""Graph-operator tests: fixed-point PageRank determinism and
structural correctness (connected components are covered via the dedup
suites and the recursive-CTE oracle)."""

import pytest

from gasket_spark.operators.graph import pagerank


@pytest.fixture(scope="module")
def star_graph(spark):
    # b is pointed at by everyone; a gets b's whole mass back
    return spark.createDataFrame(
        [("a", "b"), ("c", "b"), ("d", "b"), ("b", "a")],
        "src string, dst string")


class TestPageRank:
    def test_hub_ranks_highest_and_mass_conserves(self, spark,
                                                  star_graph):
        ranks = {r.v: r.rank for r in
                 pagerank(star_graph, max_iter=25).collect()}
        assert set(ranks) == {"a", "b", "c", "d"}
        # b absorbs three links; a absorbs b's entire rank; c,d only
        # get teleport mass
        assert ranks["b"] > ranks["a"] > ranks["c"]
        assert abs(ranks["c"] - ranks["d"]) < 1e-9
        # floor-division mass loss is bounded: total stays ~1
        assert 0.99 < sum(ranks.values()) <= 1.0 + 1e-9

    def test_fixpoint_is_partition_independent(self, spark, star_graph):
        """Integer-space arithmetic: the SAME longs must come out no
        matter how the edges are partitioned — the property a
        double-sum PageRank cannot offer."""
        one = {(r.v, r.rank) for r in
               pagerank(star_graph.repartition(1), max_iter=10).collect()}
        many = {(r.v, r.rank) for r in
                pagerank(star_graph.repartition(7), max_iter=10).collect()}
        assert one == many

    def test_dangling_mass_redistributes(self, spark):
        # b has no out-links: its mass must not vanish
        g = spark.createDataFrame([("a", "b")], "src string, dst string")
        ranks = {r.v: r.rank for r in pagerank(g, max_iter=25).collect()}
        assert 0.99 < sum(ranks.values()) <= 1.0 + 1e-9
        assert ranks["b"] > ranks["a"]

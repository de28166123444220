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


class TestSssp:
    def test_matches_reference_bellman_ford(self, spark):
        """The frontier-pruned Spark loop must equal a plain
        4-round Bellman-Ford run in local Python over the collected
        edge list (full relaxation, no pruning)."""
        from gasket_spark.queries import QUERIES
        from gasket_spark.queries.relational import _copurchase_edges
        from tests.conftest import SF_SMALL

        e = _copurchase_edges(spark, SF_SMALL).collect()
        adj = []
        for r in e:
            w = 1 + (r["u"] + 2 * r["v"]) % 7
            adj.append((r["u"], r["v"], w))
            adj.append((r["v"], r["u"], w))
        root = min(u for u, _, _ in adj)
        dist = {root: 0}
        for _ in range(4):
            prev = dict(dist)
            for u, v, w in adj:
                if u in prev and prev[u] + w < dist.get(v, 1 << 60):
                    dist[v] = min(dist.get(v, 1 << 60), prev[u] + w)
        got = {r["part_node"]: r["dist"]
               for r in QUERIES["q_graph_sssp"](spark, SF_SMALL).collect()}
        assert got == dist

    def test_weights_symmetric_and_positive(self, spark):
        """Edge weights derive from the canonical u<v edge, so both
        directions carry the same strictly positive weight."""
        from gasket_spark.queries.relational import _copurchase_edges
        from tests.conftest import SF_SMALL

        e = _copurchase_edges(spark, SF_SMALL).collect()
        for r in e:
            w = 1 + (r["u"] + 2 * r["v"]) % 7
            assert 1 <= w <= 7


class TestKcore:
    def test_bounded_peel_reaches_fixed_point_here(self, spark):
        """At this graph size 6 rounds converge: every surviving node
        keeps degree >= 3 within the surviving subgraph, i.e. the
        result IS the 3-core, and one more peel changes nothing."""
        from gasket_spark.queries import QUERIES
        from tests.conftest import SF_SMALL

        rows = QUERIES["q_graph_kcore"](spark, SF_SMALL).collect()
        assert rows, "3-core unexpectedly empty"
        assert min(r["degree"] for r in rows) >= 3


class TestLabelProp:
    def test_labels_partition_the_vertex_set(self, spark):
        """Communities partition V: sizes sum to |V|, every community
        label is itself a vertex id."""
        from gasket_spark.queries import QUERIES
        from gasket_spark.queries.relational import _copurchase_edges
        from tests.conftest import SF_SMALL

        rows = QUERIES["q_graph_labelprop"](spark, SF_SMALL).collect()
        e = _copurchase_edges(spark, SF_SMALL).collect()
        nodes = {r["u"] for r in e} | {r["v"] for r in e}
        assert sum(r["n_nodes"] for r in rows) == len(nodes)
        assert all(r["community"] in nodes for r in rows)
        assert all(r["min_node"] in nodes for r in rows)

"""KMV sketch: accuracy within the 1/sqrt(k) bound, exactness below k,
and the union-merge law (merge of part sketches == sketch of whole)."""

import pytest
from pyspark.sql import functions as F

from gasket_spark.io import read_table
from gasket_spark.operators.sketch import kmv_estimate, kmv_merge, kmv_sketch
from tests.conftest import SF_ORACLE


@pytest.fixture(scope="module")
def lineitem(spark):
    return read_table(spark, SF_ORACLE, "lineitem").cache()


class TestKMV:
    def test_accuracy_within_bound(self, spark, lineitem):
        k = 1024
        est = kmv_estimate(
            kmv_sketch(lineitem, ["l_returnflag"], "l_partkey", k), k)
        exact = lineitem.groupBy("l_returnflag").agg(
            F.count_distinct("l_partkey").alias("exact"))
        joined = est.join(exact, "l_returnflag").collect()
        assert len(joined) == 3
        for r in joined:
            rel_err = abs(r.distinct_est - r.exact) / r.exact
            assert rel_err < 3.0 / (k ** 0.5), (r.l_returnflag, rel_err)

    def test_exact_below_k(self, spark):
        df = spark.range(500).select(
            F.lit("g").alias("g"), (F.col("id") % 37).alias("v"))
        est = kmv_estimate(kmv_sketch(df, ["g"], "v", k=1024), 1024)
        assert est.collect()[0].distinct_est == 37.0

    def test_union_merge_law(self, spark, lineitem):
        """sketch(A) ⊎ sketch(B) must equal sketch(A ∪ B) exactly —
        the property that makes per-batch sketches roll up without
        rescanning."""
        k = 256
        a = lineitem.filter(F.col("l_orderkey") % 2 == 0)
        b = lineitem.filter(F.col("l_orderkey") % 2 == 1)
        merged = kmv_merge(
            kmv_sketch(a, ["l_returnflag"], "l_partkey", k),
            kmv_sketch(b, ["l_returnflag"], "l_partkey", k),
            ["l_returnflag"], k)
        whole = kmv_sketch(lineitem, ["l_returnflag"], "l_partkey", k)
        got = {r.l_returnflag: (r.sketch, r.n_seen)
               for r in merged.collect()}
        want = {r.l_returnflag: (r.sketch, r.n_seen)
                for r in whole.collect()}
        assert got == want


class TestQuantileSketch:
    def test_merge_law_exact(self, spark, lineitem):
        """Bottom-k sampling is coherent: merging per-half sketches
        must reproduce the whole-data sketch bit-for-bit (sample AND
        count)."""
        from gasket_spark.operators.sketch import qsketch, qsketch_merge

        li = lineitem.withColumn(
            "cents", F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).withColumn("rid",
                     F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        k = 256
        a = li.filter(F.col("l_orderkey") % 2 == 0)
        b = li.filter(F.col("l_orderkey") % 2 == 1)
        merged = qsketch_merge(
            qsketch(a, ["l_returnflag"], "cents", "rid", k),
            qsketch(b, ["l_returnflag"], "cents", "rid", k),
            ["l_returnflag"], k)
        whole = qsketch(li, ["l_returnflag"], "cents", "rid", k)
        got = {r.l_returnflag: (r.sample, r.n_rows) for r in merged.collect()}
        want = {r.l_returnflag: (r.sample, r.n_rows) for r in whole.collect()}
        assert got == want

    def test_quantile_accuracy(self, spark, lineitem):
        """Sketch median/p90 must land within a few percentile ranks of
        the exact values (k=1024 → rank error ~1/sqrt(k) ≈ 3%)."""
        from gasket_spark.operators.sketch import qsketch, qsketch_quantiles

        li = lineitem.withColumn(
            "cents", F.round(F.col("l_extendedprice") * 100).cast("bigint")
        ).withColumn("rid",
                     F.col("l_orderkey") * 10 + F.col("l_linenumber"))
        est = qsketch_quantiles(
            qsketch(li, ["l_returnflag"], "cents", "rid", 1024),
            [0.5, 0.9]).collect()
        exact = {r.l_returnflag: (r.q50, r.q90) for r in lineitem.groupBy(
            "l_returnflag").agg(
            F.expr("percentile(CAST(ROUND(l_extendedprice*100) AS BIGINT),"
                   " 0.5)").alias("q50"),
            F.expr("percentile(CAST(ROUND(l_extendedprice*100) AS BIGINT),"
                   " 0.9)").alias("q90")).collect()}
        for r in est:
            e50, e90 = exact[r.l_returnflag]
            assert abs(r.q50 - e50) / e50 < 0.10, (r.l_returnflag, r.q50, e50)
            assert abs(r.q90 - e90) / e90 < 0.10, (r.l_returnflag, r.q90, e90)


class TestKMVSetAlgebra:
    def test_jaccard_and_intersection_estimates(self, spark, lineitem):
        """Overlap estimates from sketches alone must land near exact
        Jaccard/intersection of the underlying part-key sets. The two
        'corpora' share orders ending in 0-4 (half of A, half of B)."""
        from gasket_spark.operators.sketch import kmv_jaccard, kmv_sketch

        k = 1024
        a = lineitem.filter(F.col("l_orderkey") % 10 < 7)   # 0-6
        b = lineitem.filter(F.col("l_orderkey") % 10 >= 3)  # 3-9
        grp = lineitem.select(F.lit("all").alias("g"), "l_partkey")
        est = kmv_jaccard(
            kmv_sketch(a.withColumn("g", F.lit("all")), ["g"],
                       "l_partkey", k),
            kmv_sketch(b.withColumn("g", F.lit("all")), ["g"],
                       "l_partkey", k),
            ["g"], k).collect()[0]

        pa = {r.l_partkey for r in
              a.select("l_partkey").distinct().collect()}
        pb = {r.l_partkey for r in
              b.select("l_partkey").distinct().collect()}
        true_j = len(pa & pb) / len(pa | pb)
        true_i = len(pa & pb)
        assert abs(est.jaccard_est - true_j) < 0.1
        assert abs(est.intersect_est - true_i) / true_i < 0.15


class TestCountMinSketch:
    def _tokens(self, spark, lineitem):
        # token stream: one row per (flag, part key occurrence)
        return lineitem.select(
            F.col("l_returnflag").alias("g"),
            F.col("l_partkey").alias("tok"))

    def test_never_underestimates_and_is_tight_for_heavy_items(
            self, spark, lineitem):
        from gasket_spark.operators.sketch import cms_estimate, cms_sketch

        toks = self._tokens(spark, lineitem)
        sk = cms_sketch(toks, ["g"], "tok", depth=4, width=1024)
        true = toks.groupBy("g", "tok").agg(
            F.count(F.lit(1)).alias("true_n"))
        top = true.orderBy(F.desc("true_n"), "g", "tok").limit(20)
        est = cms_estimate(sk, top.withColumnRenamed("g", "gg"),
                           "tok", width=1024) \
            .filter(F.col("g") == F.col("gg"))
        rows = est.collect()
        assert len(rows) == 20
        n_total = toks.count()
        for r in rows:
            assert r.freq_est >= r.true_n, (r.tok, r.freq_est, r.true_n)
            # CMS bound: overestimate < e/width * N with high prob
            assert r.freq_est - r.true_n <= 2.72 / 1024 * n_total * 2

    def test_merge_law_is_exact(self, spark, lineitem):
        """cms(A) + cms(B) must equal cms(A ∪ B) EXACTLY — sketch
        equality, not estimate equality."""
        from gasket_spark.operators.sketch import cms_merge, cms_sketch

        toks = self._tokens(spark, lineitem)
        a = toks.filter(F.col("tok") % 2 == 0)
        b = toks.filter(F.col("tok") % 2 == 1)
        merged = cms_merge(cms_sketch(a, ["g"], "tok"),
                           cms_sketch(b, ["g"], "tok"), ["g"])
        full = cms_sketch(toks, ["g"], "tok")

        def canon(df):
            return {r.g: [sorted(m.items()) for m in r.sketch]
                    for r in df.collect()}

        assert canon(merged) == canon(full)


class TestThetaSketch:
    """Theta set algebra: exactness in the θ=1 regime, estimator
    accuracy when saturated, and the closure law (op outputs are
    themselves sketches that compose)."""

    def _halves(self, lineitem, k):
        from gasket_spark.operators.sketch import kmv_sketch, theta_from_kmv

        g = ["l_returnflag"]
        a = lineitem.filter(F.col("l_orderkey") % 2 == 0)
        b = lineitem.filter(F.col("l_orderkey") % 2 == 1)
        return (theta_from_kmv(kmv_sketch(a, g, "l_partkey", k), k),
                theta_from_kmv(kmv_sketch(b, g, "l_partkey", k), k))

    def test_exact_regime_all_ops(self, spark):
        """Below k every op is EXACT set arithmetic: the sketch holds
        the whole distinct hash set and θ stays 1.0 (NULL)."""
        from gasket_spark.operators.sketch import (
            kmv_sketch, theta_estimate, theta_from_kmv, theta_op)

        a = spark.range(60).select(
            F.lit("g").alias("g"), F.col("id").alias("v"))       # 0..59
        b = spark.range(40, 100).select(
            F.lit("g").alias("g"), F.col("id").alias("v"))       # 40..99
        ta = theta_from_kmv(kmv_sketch(a, ["g"], "v", 1024), 1024)
        tb = theta_from_kmv(kmv_sketch(b, ["g"], "v", 1024), 1024)
        expect = {"union": 100.0, "intersect": 20.0, "a_not_b": 40.0}
        for op, want in expect.items():
            row = theta_estimate(
                theta_op(ta, tb, ["g"], op)).collect()[0]
            assert row.theta_h is None, op
            assert row.distinct_est == want, op

    def test_saturated_estimates_within_bound(self, spark, lineitem):
        from gasket_spark.operators.sketch import theta_estimate, theta_op

        k = 1024
        ta, tb = self._halves(lineitem, k)
        exact = (
            lineitem.select(
                "l_returnflag", "l_partkey",
                (F.col("l_orderkey") % 2 == 0).alias("_a"))
            .groupBy("l_returnflag", "l_partkey")
            .agg(F.max(F.col("_a").cast("int")).alias("_ha"),
                 F.max((~F.col("_a")).cast("int")).alias("_hb"))
            .groupBy("l_returnflag")
            .agg(F.count_if(F.col("_ha") == 1).alias("n_a"),
                 F.count_if((F.col("_ha") == 1) & (F.col("_hb") == 1))
                 .alias("n_int"))
            .collect())
        want = {r.l_returnflag: (r.n_a, r.n_int) for r in exact}
        ints = {r.l_returnflag: r.distinct_est for r in theta_estimate(
            theta_op(ta, tb, ["l_returnflag"], "intersect")).collect()}
        anbs = {r.l_returnflag: r.distinct_est for r in theta_estimate(
            theta_op(ta, tb, ["l_returnflag"], "a_not_b")).collect()}
        assert set(ints) == set(want) and len(want) == 3
        for flag, (n_a, n_int) in want.items():
            assert abs(ints[flag] - n_int) <= 0.10 * n_a, flag
            assert abs(anbs[flag] - (n_a - n_int)) <= 0.10 * n_a, flag

    def test_closure_recombination(self, spark, lineitem):
        """(A∩B) ∪ (A\\B) — a union of two op RESULTS — must estimate
        |A|: the outputs really are sketches, not just numbers."""
        from gasket_spark.operators.sketch import theta_estimate, theta_op

        k = 1024
        g = ["l_returnflag"]
        ta, tb = self._halves(lineitem, k)
        recomb = theta_op(theta_op(ta, tb, g, "intersect"),
                          theta_op(ta, tb, g, "a_not_b"), g, "union")
        n_a = {r.l_returnflag: r.n_a for r in (
            lineitem.filter(F.col("l_orderkey") % 2 == 0)
            .groupBy("l_returnflag")
            .agg(F.count_distinct("l_partkey").alias("n_a")).collect())}
        for r in theta_estimate(recomb).collect():
            assert abs(r.distinct_est - n_a[r.l_returnflag]) \
                <= 0.10 * n_a[r.l_returnflag], r.l_returnflag

    def test_union_and_intersect_algebra_laws(self, spark, lineitem):
        """union/intersect are commutative AND associative as EXACT
        sketch identities (θ = min composes associatively; the final
        θ-filter subsumes intermediate ones) — the property that makes
        a sketch tree from any rollup order equivalent."""
        from gasket_spark.operators.sketch import (
            kmv_sketch, theta_from_kmv, theta_op)

        k, g = 256, ["l_returnflag"]
        thirds = [
            theta_from_kmv(kmv_sketch(
                lineitem.filter(F.col("l_orderkey") % 3 == i),
                g, "l_partkey", k), k)
            for i in range(3)
        ]

        def rows(df):
            return sorted(
                (r.l_returnflag, r.theta_h, tuple(r.hashes))
                for r in df.collect())

        a, b, c = thirds
        for op in ("union", "intersect"):
            ab = theta_op(a, b, g, op)
            ba = theta_op(b, a, g, op)
            assert rows(ab) == rows(ba), f"{op} not commutative"
            left = theta_op(ab, c, g, op)
            right = theta_op(a, theta_op(b, c, g, op), g, op)
            assert rows(left) == rows(right), f"{op} not associative"

    def test_one_sided_groups(self, spark):
        """Groups missing on one side follow each op's identity."""
        from gasket_spark.operators.sketch import (
            kmv_sketch, theta_estimate, theta_from_kmv, theta_op)

        a = spark.createDataFrame(
            [("only_a", i) for i in range(10)], "g string, v long")
        b = spark.createDataFrame(
            [("only_b", i) for i in range(7)], "g string, v long")
        ta = theta_from_kmv(kmv_sketch(a, ["g"], "v", 64), 64)
        tb = theta_from_kmv(kmv_sketch(b, ["g"], "v", 64), 64)
        uni = {r.g: r.distinct_est for r in theta_estimate(
            theta_op(ta, tb, ["g"], "union")).collect()}
        assert uni == {"only_a": 10.0, "only_b": 7.0}
        inter = {r.g: r.distinct_est for r in theta_estimate(
            theta_op(ta, tb, ["g"], "intersect")).collect()}
        assert inter == {"only_a": 0.0, "only_b": 0.0}
        anb = {r.g: r.distinct_est for r in theta_estimate(
            theta_op(ta, tb, ["g"], "a_not_b")).collect()}
        assert anb == {"only_a": 10.0}


class TestKLL:
    def test_rank_bound_and_exact_count(self, spark):
        """k=200 on 20k uniform values: every estimated quantile's
        true rank must land within 2% of p*n (theory gives ~1%, the
        query's production bound is 5%); n_rows is exact."""
        from gasket_spark.operators.sketch import kll_quantiles, kll_sketch

        n = 20_000
        df = spark.range(n).select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.col("id").alias("v")).repartition(8)
        sk = kll_sketch(df, ["g"], "v", k=200)
        rows = {r.g: r for r in kll_quantiles(
            sk, [0.1, 0.5, 0.9]).collect()}
        assert all(r.n_rows == n // 2 for r in rows.values())
        # per group the values are the evens / odds of range(n): value
        # v has rank ~v/2 within its group
        for g, r in rows.items():
            for p, est in [(0.1, r.q10), (0.5, r.q50), (0.9, r.q90)]:
                true_rank = est / 2 / (n // 2)
                assert abs(true_rank - p) <= 0.02, (g, p, est)

    def test_merge_matches_whole(self, spark):
        """Mergeability: merging the sketches of two halves estimates
        the SAME quantiles (within bound) as sketching the union —
        the cross-batch rollup contract."""
        from gasket_spark.operators.sketch import (
            _kll_merge_states, kll_sketch,
        )

        n = 10_000
        df = spark.range(n).select(F.lit("g").alias("g"),
                                   F.col("id").alias("v"))
        half_a = df.filter(F.col("v") < n // 2)
        half_b = df.filter(F.col("v") >= n // 2)
        ra = kll_sketch(half_a, ["g"], "v", k=200).collect()[0]
        rb = kll_sketch(half_b, ["g"], "v", k=200).collect()[0]
        sa = {"levels": [list(x) for x in ra.levels],
              "counters": list(ra.counters), "n": ra.n_rows}
        sb = {"levels": [list(x) for x in rb.levels],
              "counters": list(rb.counters), "n": rb.n_rows}
        merged = _kll_merge_states(sa, sb, 200)
        assert merged["n"] == n
        from gasket_spark.operators.sketch import _kll_quantile

        for p in (0.25, 0.5, 0.75):
            est = _kll_quantile(merged, p)
            assert abs(est / n - p) <= 0.02, (p, est)

    def test_sketch_state_is_bounded(self, spark):
        """The whole point: sketch size stays O(k) no matter how many
        rows went in."""
        from gasket_spark.operators.sketch import kll_sketch

        df = spark.range(50_000).select(F.lit("g").alias("g"),
                                        F.col("id").alias("v"))
        r = kll_sketch(df, ["g"], "v", k=200).collect()[0]
        assert sum(len(l) for l in r.levels) < 3 * 200


class TestTDigest:
    def test_rank_bound_tight_at_tails(self, spark):
        """δ=100 on 20k uniform values: mid quantiles within 1% rank
        error, and the TAIL quantile (p99) within 0.2% — the relative-
        error property that distinguishes t-digest from KLL."""
        from gasket_spark.operators.sketch import (
            tdigest_quantiles, tdigest_sketch,
        )

        n = 20_000
        df = spark.range(n).select(
            (F.col("id") % 2).cast("string").alias("g"),
            F.col("id").alias("v")).repartition(8)
        sk = tdigest_sketch(df, ["g"], "v", delta=100.0)
        rows = {r.g: r for r in tdigest_quantiles(
            sk, [0.5, 0.99]).collect()}
        assert all(r.n_rows == n // 2 for r in rows.values())
        for g, r in rows.items():
            assert abs(r.q5 / 2 / (n // 2) - 0.5) <= 0.01, (g, r.q5)
            assert abs(r.q99 / 2 / (n // 2) - 0.99) <= 0.002, (g, r.q99)

    def test_merge_matches_whole(self, spark):
        """Mergeability: the digest of two halves merged estimates the
        same quantiles (within bound) as digesting the union."""
        from gasket_spark.operators.sketch import (
            _td_merge, _td_quantile, tdigest_sketch,
        )

        n = 10_000
        df = spark.range(n).select(F.lit("g").alias("g"),
                                   F.col("id").alias("v"))
        ra = tdigest_sketch(df.filter(F.col("v") < n // 2),
                            ["g"], "v").collect()[0]
        rb = tdigest_sketch(df.filter(F.col("v") >= n // 2),
                            ["g"], "v").collect()[0]
        m, w = _td_merge(ra.means, ra.weights, rb.means, rb.weights, 100.0)
        assert abs(sum(w) - n) < 1e-6          # weight conservation
        for p in (0.25, 0.5, 0.75, 0.99):
            est = _td_quantile(m, w, p)
            assert abs(est / n - p) <= 0.01, (p, est)

    def test_state_is_bounded_and_sorted(self, spark):
        """Centroid count stays O(δ) for any n; means are sorted and
        tail centroids are near-singleton (the k1 property)."""
        from gasket_spark.operators.sketch import tdigest_sketch

        df = spark.range(50_000).select(F.lit("g").alias("g"),
                                        F.col("id").alias("v"))
        r = tdigest_sketch(df, ["g"], "v", delta=100.0).collect()[0]
        assert len(r.means) <= 2 * 100
        assert list(r.means) == sorted(r.means)
        assert abs(sum(r.weights) - 50_000) < 1e-6
        # the k1 tail bound: an extreme centroid holds at most
        # ~n*(pi/delta)^2 points (~49 here) — tiny RELATIVE to n and
        # to the median centroids (which k1 allows up to ~n*pi/delta)
        tail_cap = 50_000 * (3.1416 / 100.0) ** 2 * 2
        assert r.weights[0] <= tail_cap and r.weights[-1] <= tail_cap
        assert max(r.weights) > 10 * max(r.weights[0], r.weights[-1])


class TestMisraGries:
    def test_exact_when_under_capacity(self, spark):
        """distinct ≤ k on every path → err_bound 0 and counts equal
        the exact groupBy, regardless of partitioning."""
        from gasket_spark.operators.sketch import mg_sketch

        df = spark.range(0, 3000).select(
            F.lit("g").alias("g"),
            (F.col("id") % 40).cast("string").alias("v")).repartition(7)
        row = mg_sketch(df, ["g"], "v", k=64).collect()[0]
        assert row.err_bound == 0 and row.n_rows == 3000
        assert dict(zip(row.items, row.counts)) == {
            str(i): 75 for i in range(40)}

    def test_guarantees_on_skewed_stream(self, spark):
        """The deterministic MG guarantees under truncation: every
        stored count underestimates by ≤ err_bound,
        err_bound ≤ n/(k+1), and every item with true frequency >
        err_bound is PRESENT — on a skewed corpus with far more
        distinct items than capacity, under two different
        partitionings."""
        from gasket_spark.operators.sketch import mg_sketch

        # 3 heavy items (1000 each) + 3000 singletons
        heavy = [(f"h{i}", 1000) for i in range(3)]
        rows = [("g", h) for h, c in heavy for _ in range(c)]
        rows += [("g", f"s{j}") for j in range(3000)]
        true = {h: c for h, c in heavy}
        n = len(rows)
        k = 32
        for parts in (3, 11):
            df = spark.createDataFrame(rows, "g string, v string") \
                      .repartition(parts)
            row = mg_sketch(df, ["g"], "v", k=k).collect()[0]
            got = dict(zip(row.items, row.counts))
            assert row.n_rows == n
            assert 0 < row.err_bound <= n // (k + 1)
            for h, c in true.items():
                assert h in got                      # presence
                assert c - row.err_bound <= got[h] <= c   # bracket
            assert len(got) <= k

    def test_topk_brackets(self, spark):
        from gasket_spark.operators.sketch import mg_sketch, mg_topk

        rows = [("g", "big")] * 500 + [("g", f"x{i}") for i in range(400)]
        df = spark.createDataFrame(rows, "g string, v string")
        top = mg_topk(mg_sketch(df, ["g"], "v", k=16), m=1).collect()
        assert len(top) == 1
        r = top[0]
        assert r.item == "big"
        assert r.count_lo <= 500 <= r.count_hi

    def test_null_groups_and_null_items_counted(self, spark):
        """SQL semantics under NULLs: a NULL group key still gets a
        sketch row and NULL values count as an item — pandas'
        dropna defaults would silently lose both."""
        from gasket_spark.operators.sketch import mg_sketch

        rows = ([("a", "x")] * 5 + [("a", None)] * 3
                + [(None, "y")] * 4 + [(None, None)] * 2)
        df = spark.createDataFrame(rows, "g string, v string") \
                  .repartition(3)
        got = {r.g: r for r in mg_sketch(df, ["g"], "v", k=8).collect()}
        assert set(got) == {"a", None}
        assert dict(zip(got["a"].items, got["a"].counts)) \
            == {"x": 5, None: 3}
        assert got["a"].n_rows == 8 and got["a"].err_bound == 0
        assert dict(zip(got[None].items, got[None].counts)) \
            == {"y": 4, None: 2}
        assert got[None].n_rows == 6 and got[None].err_bound == 0

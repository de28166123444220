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

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

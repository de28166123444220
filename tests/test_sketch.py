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

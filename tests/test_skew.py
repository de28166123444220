"""Salted aggregation / salted join must be result-identical to their
unsalted counterparts — salting changes the physical distribution,
never the answer."""

import pytest
from pyspark.sql import functions as F

from gasket_spark.io import read_table
from gasket_spark.operators.skew import salted_agg, salted_join
from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def skewed(spark):
    """lineitem with a manufactured hot key: ~1/3 of rows share key 0."""
    li = read_table(spark, SF_SMALL, "lineitem")
    return li.withColumn(
        "hot_key",
        F.when(F.col("l_orderkey") % 3 == 0, F.lit(0))
        .otherwise(F.col("l_orderkey"))).cache()


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestSaltedAgg:
    def test_equals_plain_groupby(self, skewed):
        got = salted_agg(
            skewed, ["hot_key"],
            {"n": ("l_quantity", "count"),
             "qty": ("l_quantity", "sum"),
             "min_line": ("l_linenumber", "min"),
             "max_line": ("l_linenumber", "max")},
            row_identity="l_orderkey", n_salts=8)
        want = skewed.groupBy("hot_key").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("l_quantity").alias("qty"),
            F.min("l_linenumber").alias("min_line"),
            F.max("l_linenumber").alias("max_line"))
        assert _sorted_rows(got.select("hot_key", "n", "min_line",
                                       "max_line")) == \
            _sorted_rows(want.select("hot_key", "n", "min_line",
                                     "max_line"))

    def test_rejects_non_mergeable(self, skewed):
        with pytest.raises(ValueError, match="not mergeable"):
            salted_agg(skewed, ["hot_key"], {"a": ("l_quantity", "avg")},
                       row_identity="l_orderkey")


class TestSaltedJoin:
    def test_equals_plain_join(self, spark, skewed):
        dim = spark.createDataFrame(
            [(0, "hot"), (3, "a"), (6, "b")], "hot_key long, tag string")
        got = salted_join(skewed.select("l_orderkey", "hot_key"), dim,
                          ["hot_key"], row_identity="l_orderkey",
                          n_salts=8)
        want = skewed.select("l_orderkey", "hot_key").join(dim, ["hot_key"])
        assert _sorted_rows(got) == _sorted_rows(want)
        assert "_salt" not in got.columns

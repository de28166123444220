"""Exact merge-law tests for incremental aggregate states: merging
per-batch states must be indistinguishable from aggregating the full
input, for ANY batch split and ANY merge order/shape."""

import pytest

from pyspark.sql import functions as F

from gasket_spark.io import read_table
from gasket_spark.operators.incremental import (
    finalize, merge_states, partial_agg,
)
from tests.conftest import SF_SMALL

KEYS = ["l_returnflag", "l_linestatus"]


@pytest.fixture(scope="module")
def lineitem(spark):
    return read_table(spark, SF_SMALL, "lineitem")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


class TestMergeLaw:
    def test_merge_equals_full_aggregate(self, lineitem):
        full = _rows(finalize(partial_agg(lineitem, KEYS,
                                          "l_extendedprice")))
        batches = [lineitem.filter(F.col("l_orderkey") % 4 == i)
                   for i in range(4)]
        states = [partial_agg(b, KEYS, "l_extendedprice")
                  for b in batches]
        assert _rows(finalize(merge_states(*states))) == full

    def test_merge_is_order_and_shape_independent(self, lineitem):
        batches = [lineitem.filter(F.col("l_orderkey") % 3 == i)
                   for i in range(3)]
        s = [partial_agg(b, KEYS, "l_extendedprice") for b in batches]
        flat = _rows(finalize(merge_states(s[0], s[1], s[2])))
        reversed_ = _rows(finalize(merge_states(s[2], s[1], s[0])))
        # nested: merged states are themselves valid states
        nested = _rows(finalize(merge_states(merge_states(s[1], s[0]),
                                             s[2])))
        assert flat == reversed_ == nested

    def test_empty_batch_is_identity(self, lineitem):
        s = partial_agg(lineitem, KEYS, "l_extendedprice")
        empty = partial_agg(lineitem.filter(F.lit(False)), KEYS,
                            "l_extendedprice")
        assert _rows(finalize(merge_states(s, empty))) == \
            _rows(finalize(s))

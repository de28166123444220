"""Behavioral edge-case tests for the round-7 operators — synthetic
micro-fixtures (written to tmp as parquet, same table names the
queries read) pin the contracts the sf-fixture oracle can't reach:
degenerate group sizes, the decay-window bound, head-flag boundaries."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from gasket_spark.queries import QUERIES


def _write_events(spark, path, rows):
    """rows: (event_id, ts, user_id, event_type, value)"""
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    df.coalesce(1).write.mode("overwrite").parquet(
        f"{path}/events.parquet")


class TestPercentileDiscEdges:
    def test_single_row_group_yields_that_value(self, spark, tmp_path):
        t0 = datetime.datetime(2024, 1, 1)
        _write_events(spark, str(tmp_path),
                      [(1, t0, 1, "solo", 42.0)])
        out = QUERIES["q_agg_percentile_disc"](spark, str(tmp_path))
        rows = out.collect()
        # all four percentiles of a 1-row group are the value itself
        assert len(rows) == 4
        assert {r.pct for r in rows} == {25, 50, 75, 95}
        assert all(r.pct_value_nano == 42_000_000_000 for r in rows)

    def test_disc_returns_real_observations(self, spark, tmp_path):
        t0 = datetime.datetime(2024, 1, 1)
        vals = [1.0, 2.0, 3.0, 4.0]
        _write_events(spark, str(tmp_path),
                      [(i, t0, 1, "g", v) for i, v in enumerate(vals)])
        out = {(r.pct, r.pct_value_nano) for r in
               QUERIES["q_agg_percentile_disc"](
                   spark, str(tmp_path)).collect()}
        # rank = ceil(p*n/100): p25->1st, p50->2nd, p75->3rd, p95->4th
        assert out == {(25, 1_000_000_000), (50, 2_000_000_000),
                       (75, 3_000_000_000), (95, 4_000_000_000)}


class TestDecayedTopkWindowBound:
    def test_events_older_than_31_days_are_excluded(self, spark,
                                                    tmp_path):
        base = datetime.datetime(2024, 1, 1)
        late = base + datetime.timedelta(days=100)
        _write_events(spark, str(tmp_path), [
            # user 1: one ancient huge purchase (would dominate — and
            # overflow the shift — if the 31-day window didn't apply)
            (1, base, 1, "purchase", 9999.0),
            # user 2: one small purchase at the frontier
            (2, late, 2, "purchase", 1.0),
        ])
        rows = QUERIES["q_decayed_topk"](spark, str(tmp_path)).collect()
        assert [r.user_id for r in rows] == [2]
        assert rows[0].decayed_fp == 100  # cents * 2^0


class TestParetoHeadFlagBoundary:
    def test_head_flag_is_integer_exact_at_80_percent(self, spark,
                                                      tmp_path):
        # orders: one nation, two customers, 80/20 split exactly —
        # cum*10 <= total*8 must INCLUDE the 80% head row
        od = spark.createDataFrame(
            [(1, 10, 80.0), (2, 20, 20.0)],
            "o_orderkey long, o_custkey long, o_totalprice double")
        cu = spark.createDataFrame(
            [(10, 7), (20, 7)], "c_custkey long, c_nationkey int")
        od.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/orders.parquet")
        cu.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/customer.parquet")
        rows = {r.c_custkey: r for r in
                QUERIES["q_pareto_share"](spark, str(tmp_path)).collect()}
        assert rows[10].in_head is True     # cum 8000*10 == 10000*8
        assert rows[20].in_head is False
        assert rows[10].rnk == 1 and rows[20].rnk == 2


class TestAttributionEdges:
    def test_converter_with_no_prior_events_dilutes_effects(
            self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)

        def at(m):
            return base + datetime.timedelta(minutes=m)

        _write_events(spark, str(tmp_path), [
            (1, at(0), 1, "view", 1.0),       # A touches view...
            (2, at(5), 1, "purchase", 9.0),   # ...then converts
            (3, at(0), 2, "purchase", 9.0),   # B converts cold
            (4, at(9), 2, "view", 1.0),       # post-conversion: ignored
        ])
        rows = QUERIES["q_attribution_removal"](
            spark, str(tmp_path)).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r.channel, r.n_touched, r.n_conv) == ("view", 1, 2)
        assert r.removal_ppb == 500_000_000  # blocks 1 of 2 conversions
        assert r.share_ppb == 1_000_000_000  # only touched channel


class TestTopSupplierTies:
    def test_equal_max_revenue_suppliers_all_surface(self, spark,
                                                     tmp_path):
        t = datetime.datetime(1996, 2, 1)
        li = spark.createDataFrame(
            [(1, 101, 100.0, 0.0, t), (2, 202, 50.0, 0.0, t),
             (3, 202, 50.0, 0.0, t), (4, 303, 99.0, 0.0, t)],
            "l_orderkey long, l_suppkey long, l_extendedprice double, "
            "l_discount double, l_shipdate timestamp")
        sup = spark.createDataFrame(
            [(101, "a"), (202, "b"), (303, "c")],
            "s_suppkey long, s_name string")
        li.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/lineitem.parquet")
        sup.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/supplier.parquet")
        rows = QUERIES["q_sql_top_supplier"](spark, str(tmp_path)) \
            .collect()
        # suppliers 101 and 202 tie at 10000 cents — both surface
        assert {(r.s_suppkey, r.total_cents) for r in rows} == \
            {(101, 10000), (202, 10000)}


class TestTimeWeightedAvgEdges:
    def test_single_event_user_is_excluded(self, spark, tmp_path):
        base = datetime.datetime(2024, 1, 1)
        _write_events(spark, str(tmp_path), [
            (1, base, 1, "view", 5.0),  # no successor -> no interval
            (2, base, 2, "view", 10.0),
            (3, base + datetime.timedelta(seconds=30), 2, "view", 20.0),
        ])
        rows = {r.user_id: r for r in
                QUERIES["q_time_weighted_avg"](
                    spark, str(tmp_path)).collect()}
        assert set(rows) == {2}
        # one interval: value 10.0 held for 30s -> TWA = 1000 cents
        assert rows[2].n_intervals == 1
        assert rows[2].twa_microcents == 1_000_000_000


class TestCorrDegenerateGroups:
    def test_zero_variance_and_singleton_yield_null(self, spark,
                                                    tmp_path):
        # one group with constant quantity (zero variance), one with a
        # single row — both must yield NULL, never NaN/Inf
        li = spark.createDataFrame(
            [(1, "C", 5.0, 10.0), (2, "C", 5.0, 20.0),
             (3, "S", 7.0, 30.0)],
            "l_orderkey long, l_returnflag string, l_quantity double, "
            "l_extendedprice double")
        li.coalesce(1).write.mode("overwrite").parquet(
            f"{tmp_path}/lineitem.parquet")
        rows = {r.l_returnflag: r for r in
                QUERIES["q_agg_corr"](spark, str(tmp_path)).collect()}
        assert rows["C"].corr_nano is None        # zero x-variance
        assert rows["C"].cov_micro == 0           # cov defined: n=2
        assert rows["S"].corr_nano is None        # n=1
        assert rows["S"].cov_micro is None        # n-1 = 0

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
        assert all(r.pct_value == 42.0 for r in rows)

    def test_disc_returns_real_observations(self, spark, tmp_path):
        t0 = datetime.datetime(2024, 1, 1)
        vals = [1.0, 2.0, 3.0, 4.0]
        _write_events(spark, str(tmp_path),
                      [(i, t0, 1, "g", v) for i, v in enumerate(vals)])
        out = {(r.pct, r.pct_value) for r in
               QUERIES["q_agg_percentile_disc"](
                   spark, str(tmp_path)).collect()}
        # rank = ceil(p*n/100): p25->1st, p50->2nd, p75->3rd, p95->4th
        assert out == {(25, 1.0), (50, 2.0), (75, 3.0), (95, 4.0)}


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

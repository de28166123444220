"""Semantic property tests for the round-6 operators — invariants the
Spark-vs-DuckDB oracle can't pin (both engines could share a bug in
the same formulation): island partitioning laws, merged-interval
disjointness, an independent brute-force triangle count, the Bloom
no-false-negative contract, and a numpy rolling-median twin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gasket_spark.io import read_table
from gasket_spark.queries import QUERIES
from tests.conftest import SF_SMALL


class TestGapsIslands:
    def test_islands_partition_events_and_respect_gap(self, spark):
        ev = read_table(spark, SF_SMALL, "events")
        out = QUERIES["q_gaps_islands"](spark, SF_SMALL).collect()
        # islands partition the event set exactly
        assert sum(r.n_events for r in out) == ev.count()
        # per user: islands don't overlap, and consecutive islands are
        # separated by MORE than the 30-minute threshold
        by_user: dict[int, list] = {}
        for r in out:
            by_user.setdefault(r.user_id, []).append(r)
        for rows in by_user.values():
            rows.sort(key=lambda r: r.island_start)
            for a, b in zip(rows, rows[1:]):
                assert a.island_end < b.island_start
                gap = (b.island_start - a.island_end).total_seconds()
                assert gap > 30 * 60
            for r in rows:
                assert r.island_start <= r.island_end
                assert 1 <= r.n_types <= r.n_events

    def test_within_island_gaps_bounded(self, spark):
        """Inside one island every consecutive gap is <= 30 min —
        recomputed from the raw events of the largest island."""
        out = QUERIES["q_gaps_islands"](spark, SF_SMALL).collect()
        big = max(out, key=lambda r: r.n_events)
        ev = (read_table(spark, SF_SMALL, "events")
              .filter((F.col("user_id") == big.user_id)
                      & (F.col("ts") >= big.island_start)
                      & (F.col("ts") <= big.island_end))
              .orderBy("ts").collect())
        assert len(ev) == big.n_events
        for a, b in zip(ev, ev[1:]):
            assert (b.ts - a.ts).total_seconds() <= 30 * 60


class TestIntervalMerge:
    def test_merged_intervals_disjoint_and_cover(self, spark):
        ev = read_table(spark, SF_SMALL, "events")
        out = QUERIES["q_interval_merge"](spark, SF_SMALL).collect()
        assert sum(r.n_intervals for r in out) == ev.count()
        by_user: dict[int, list] = {}
        for r in out:
            by_user.setdefault(r.user_id, []).append(r)
        for rows in by_user.values():
            rows.sort(key=lambda r: r.merged_start)
            for a, b in zip(rows, rows[1:]):
                # strictly disjoint: the next merged interval starts
                # AFTER this one ends (a touch would have merged)
                assert b.merged_start > a.merged_end
            for r in rows:
                assert r.merged_start <= r.merged_end


class TestRollingMedian:
    def test_matches_numpy_for_one_user(self, spark):
        import numpy as np

        out = {r.event_id: r.rolling_median_nano
               for r in QUERIES["q_rolling_median"](spark, SF_SMALL)
               .filter(F.col("user_id") == 3).collect()}
        ev = (read_table(spark, SF_SMALL, "events")
              .filter(F.col("user_id") == 3)
              .orderBy("ts", "event_id").collect())
        assert out and len(out) == len(ev)
        vals = [r.value for r in ev]
        for i, r in enumerate(ev):
            window = vals[max(0, i - 6):i + 1]
            expect = float(np.median(np.array(window)))
            # output is floor(x*1e9 + 0.5) nano-units
            assert out[r.event_id] / 1e9 == pytest.approx(
                expect, abs=1e-8)


class TestTriangles:
    def test_against_bruteforce(self, spark):
        """Independent brute force: rebuild the co-purchase edge set
        in plain Python and enumerate triangles via adjacency-set
        intersection; per-node counts must match the degree-ordered
        join pipeline exactly."""
        li = (read_table(spark, SF_SMALL, "lineitem")
              .filter(F.col("l_orderkey") % 10 == 0)
              .select("l_orderkey", "l_partkey").distinct().collect())
        by_order: dict[int, set[int]] = {}
        for r in li:
            by_order.setdefault(r.l_orderkey, set()).add(r.l_partkey)
        edges: set[tuple[int, int]] = set()
        for parts in by_order.values():
            ps = sorted(parts)
            for i, u in enumerate(ps):
                for v in ps[i + 1:]:
                    edges.add((u, v))
        adj: dict[int, set[int]] = {}
        for u, v in edges:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        expect: dict[int, int] = {}
        for u, v in edges:
            for wnode in adj[u] & adj[v]:
                if wnode > v:   # count each triangle once (u < v < w)
                    for node in (u, v, wnode):
                        expect[node] = expect.get(node, 0) + 1
        got = {r.part_node: r.n_triangles
               for r in QUERIES["q_graph_triangles"](spark, SF_SMALL)
               .collect()}
        assert got == expect
        assert sum(got.values()) % 3 == 0   # each triangle counted 3x


class TestBloom:
    def test_no_false_negatives_and_fill(self, spark):
        rows = QUERIES["q_agg_bloom"](spark, SF_SMALL).collect()
        assert rows
        # Bloom's contract: every true member tests positive
        assert all(r.fn_free for r in rows)
        members = [r for r in rows if r.is_member]
        assert members and all(r.might_contain for r in members)
        # fill sanity: k=3 hashes set at most 3 bits per member
        for r in rows:
            assert 0 < r.bits_set <= 3 * r.n_members
        # and SOME non-member must test negative (the filter actually
        # filters; with ~2% fill a false-positive-everything filter
        # would be broken)
        non = [r for r in rows if not r.is_member]
        assert any(not r.might_contain for r in non)


class TestBFS:
    def test_against_bruteforce(self, spark):
        """Independent BFS in plain Python over the same edge set must
        produce identical (node, min-hop) pairs for hops <= 4."""
        from collections import deque

        from gasket_spark.queries.relational import _copurchase_edges

        e = _copurchase_edges(spark, SF_SMALL).collect()
        adj: dict[int, set[int]] = {}
        for r in e:
            adj.setdefault(r.u, set()).add(r.v)
            adj.setdefault(r.v, set()).add(r.u)
        root = min(min(r.u, r.v) for r in e)
        dist = {root: 0}
        dq = deque([root])
        while dq:
            n = dq.popleft()
            if dist[n] >= 4:
                continue
            for m in adj[n]:
                if m not in dist:
                    dist[m] = dist[n] + 1
                    dq.append(m)
        got = {r.part_node: r.hops
               for r in QUERIES["q_graph_bfs"](spark, SF_SMALL).collect()}
        assert got == dist

    def test_hops_monotone_frontier(self, spark):
        out = QUERIES["q_graph_bfs"](spark, SF_SMALL).collect()
        by_hop: dict[int, int] = {}
        for r in out:
            by_hop[r.hops] = by_hop.get(r.hops, 0) + 1
        assert by_hop.get(0) == 1          # exactly one root
        assert set(by_hop) <= {0, 1, 2, 3, 4}


class TestWeightedSample:
    def test_matches_python_aes_keys(self, spark):
        """Recompute the Efraimidis-Spirakis priorities in plain
        Python (hashlib md5) for one language and confirm the exact
        same top-5 in the same order."""
        import hashlib
        import math

        docs = read_table(spark, SF_SMALL, "documents") \
            .filter(F.col("lang") == "en") \
            .select("doc_id", "n_chars").collect()
        pri = []
        for r in docs:
            h = int(hashlib.md5(f"{r.doc_id}:wsamp".encode())
                    .hexdigest()[:15], 16)
            u = max(h / 2 ** 60, 1e-18)
            # the engine's fixed-point key: ln HALF_UP-rounded once to
            # micro-units, then trunc-toward-zero pico division
            ln_micro = math.floor(abs(math.log(u)) * 1e6 + 0.5) \
                * (1 if math.log(u) >= 0 else -1)
            num = ln_micro * 1000000
            pico = (abs(num) // r.n_chars) * (1 if num >= 0 else -1)
            pri.append((pico, -r.doc_id, r.doc_id))
        expect = [d for _, _, d in sorted(pri, reverse=True)[:5]]
        got = [r.doc_id for r in
               QUERIES["q_sample_weighted"](spark, SF_SMALL)
               .filter(F.col("lang") == "en")
               .orderBy("rank").collect()]
        assert got == expect

    def test_weighting_biases_selection(self, spark):
        """A-ES law: selected docs must skew long — the mean weight of
        winners exceeds the stratum mean (overwhelmingly likely at
        any fixture size; deterministic for the committed data)."""
        sel = QUERIES["q_sample_weighted"](spark, SF_SMALL).collect()
        docs = read_table(spark, SF_SMALL, "documents") \
            .groupBy("lang").agg(F.avg("n_chars").alias("mean_w")) \
            .collect()
        mean_by_lang = {r.lang: r.mean_w for r in docs}
        by_lang: dict[str, list] = {}
        for r in sel:
            by_lang.setdefault(r.lang, []).append(r.weight)
        skewed = sum(
            1 for lang, ws in by_lang.items()
            if sum(ws) / len(ws) > mean_by_lang[lang])
        assert skewed >= len(by_lang) - 1   # allow one small stratum


class TestConstraintAudit:
    def test_clean_fixture_rules_and_injected_violation(self, spark):
        rows = {r.rule: r for r in
                QUERIES["q_constraint_audit"](spark, SF_SMALL).collect()}
        assert set(rows) == {
            "lineitem_qty_range", "lineitem_discount_range",
            "orders_customer_fk", "lineitem_orders_fk",
            "customer_pk_unique", "events_user_nonnull"}
        # the TPC-H-ish generator keeps these invariants
        for rule in ("lineitem_qty_range", "orders_customer_fk",
                     "lineitem_orders_fk", "customer_pk_unique",
                     "events_user_nonnull"):
            assert rows[rule].n_violations == 0, rule
            assert rows[rule].n_checked > 0


class TestQualityClassifier:
    def test_matches_python_inference(self, spark):
        """Recompute the hashed-feature linear score in plain Python
        (hashlib + math) for a handful of docs."""
        import hashlib
        import math

        docs = read_table(spark, SF_SMALL, "documents") \
            .filter(F.col("doc_id") < 5).collect()
        got = {r.doc_id: r for r in
               QUERIES["q_quality_classifier"](spark, SF_SMALL)
               .filter(F.col("doc_id") < 5).collect()}
        for d in docs:
            z_milli = 0
            toks = d.text.split(" ")
            for t in toks:
                b = int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % 256
                k = int(hashlib.md5(f"w:{b}".encode())
                        .hexdigest()[:15], 16) % 2001 - 1000
                z_milli += k
            # logit in exact micro-units: trunc-toward-zero division
            # (Spark div / DuckDB //), NOT Python's floor //
            num = z_milli * 1000
            logit_micro = (abs(num) // len(toks)) * (1 if num >= 0 else -1)
            assert got[d.doc_id].logit_micro == logit_micro
            assert got[d.doc_id].keep == (z_milli >= 0)

    def test_scores_are_probabilities(self, spark):
        """logit_micro is the exact pre-sigmoid score: bounded by the
        max |weight| (1000 milli = 1e6 micro), monotone with the
        sigmoid it replaced; both classes occur."""
        rows = QUERIES["q_quality_classifier"](spark, SF_SMALL).collect()
        assert rows and all(abs(r.logit_micro) <= 1_000_000 for r in rows)
        # the md5 weight vector is ~zero-mean: both classes occur
        keeps = sum(1 for r in rows if r.keep)
        assert 0 < keeps < len(rows)


class TestChunkOverlap:
    def test_chunks_cover_and_overlap(self, spark):
        """Chunking law: stride-48/width-64 windows cover every token,
        adjacent chunks share exactly 16 tokens (except a short final
        chunk), and chunk hashes match a Python recomputation."""
        import hashlib

        docs = {r.doc_id: r.text.split(" ") for r in
                read_table(spark, SF_SMALL, "documents")
                .filter(F.col("doc_id") < 30).collect()}
        out = QUERIES["q_chunk_overlap"](spark, SF_SMALL) \
            .filter(F.col("doc_id") < 30).collect()
        by_doc: dict[int, list] = {}
        for r in out:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert set(by_doc) == set(docs)
        for doc_id, toks in docs.items():
            rows = sorted(by_doc[doc_id], key=lambda r: r.chunk_idx)
            n = len(toks)
            expect_chunks = 1 + max(0, -(-(n - 64) // 48))
            assert len(rows) == expect_chunks
            assert [r.chunk_idx for r in rows] == list(range(len(rows)))
            covered = 0
            for r in rows:
                start = r.chunk_idx * 48
                ck = toks[start:start + 64]
                assert r.chunk_tokens == len(ck)
                assert r.chunk_hash == hashlib.md5(
                    " ".join(ck).encode()).hexdigest()
                covered = max(covered, start + len(ck))
            assert covered == n   # every token lands in some chunk


class TestEmbedPCA:
    def test_gram_partition_independent(self, spark):
        """The integer-unit Gram matrix must be bit-identical under
        any partition layout (order-independent int64 sums)."""
        import numpy as np

        from gasket_spark.operators import similarity as S

        emb = read_table(spark, SF_SMALL, "embeddings")
        g1 = S.gram_matrix(emb)
        g2 = S.gram_matrix(emb.repartition(13))
        assert np.array_equal(g1, g2)
        assert np.array_equal(g1, g1.T)   # Gram symmetry survives

    def test_direction_matches_numpy_eigenvector(self, spark):
        """On a corpus with a DOMINANT direction (rank-1 spike), the
        iterate must align with numpy's top eigenvector (>0.999); on
        the natural near-isotropic fixture the eigengap is tiny, so
        the claim there is the Rayleigh residual, not the axis."""
        import numpy as np
        from pyspark.sql import Row

        from gasket_spark.operators import similarity as S

        emb = read_table(spark, SF_SMALL, "embeddings")
        spike_dir = np.zeros(64)
        spike_dir[7], spike_dir[23] = 0.8, 0.6
        spikes = spark.createDataFrame(
            [Row(vec_id=100000 + i, embedding=(spike_dir * 2.0).tolist(),
                 label=0) for i in range(50)])
        spiked = emb.unionByName(spikes)
        G = S.gram_matrix(spiked)
        x = S.power_iteration_top1(G).astype(np.float64)
        x /= np.linalg.norm(x)
        w, V = np.linalg.eigh(G / S.GRAM_SCALE)
        top = V[:, np.argmax(w)]
        assert abs(float(np.dot(x, top))) > 0.999

        # natural fixture: the iterate is an approximate eigenvector
        # (small Rayleigh residual) even when the axis is ambiguous
        Gn = S.gram_matrix(emb) / S.GRAM_SCALE
        xn = S.power_iteration_top1(S.gram_matrix(emb)).astype(np.float64)
        xn /= np.linalg.norm(xn)
        gx = Gn @ xn
        lam = float(xn @ gx)
        assert np.linalg.norm(gx - lam * xn) / np.linalg.norm(gx) < 0.15

        rows = QUERIES["q_embed_pca"](spark, SF_SMALL).collect()
        vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64)
                for r in emb.collect()}
        xq = S.power_iteration_top1(S.gram_matrix(emb)) / 1e9
        for r in rows[:20]:
            expect = float(np.dot(vecs[r.vec_id], xq))
            assert r.proj_nano / 1e9 == pytest.approx(
                expect, rel=1e-3, abs=1e-4)


class TestAnomalyIQRAndTimegrain:
    def test_iqr_outliers_outside_fences(self, spark):
        rows = QUERIES["q_anomaly_iqr"](spark, SF_SMALL).collect()
        assert rows and all(r.is_outlier for r in rows)
        for r in rows:
            q1, q3 = r.q1_nano / 1e9, r.q3_nano / 1e9
            iqr = q3 - q1
            # q1/q3 are floor(x*1e9+0.5) nano-units, so LOOSEN both
            # fences by the scaling slack — tightening would flag
            # genuine outliers sitting within the slack as failures
            assert (r.value < q1 - 1.5 * iqr + 1e-7
                    or r.value > q3 + 1.5 * iqr - 1e-7)

    def test_timegrain_partitions_per_grain(self, spark):
        total = read_table(spark, SF_SMALL, "events").count()
        rows = QUERIES["q_rollup_timegrain"](spark, SF_SMALL).collect()
        by_grain: dict[str, int] = {}
        for r in rows:
            by_grain[r.grain] = by_grain.get(r.grain, 0) + r.n_events
        assert by_grain == {"hour": total, "day": total, "week": total}


class TestMomentsAgainstBuiltins:
    def test_matches_spark_skewness_kurtosis(self, spark):
        """The exact-integer-power-sum moments must agree with
        Spark's native skewness()/kurtosis() (population form) to
        float tolerance — an independent derivation of the same
        statistics."""
        from pyspark.sql import functions as F

        from gasket_spark.io import read_table
        from gasket_spark.queries import QUERIES
        from tests.conftest import SF_SMALL

        got = {r["event_type"]: r for r in
               QUERIES["q_agg_moments"](spark, SF_SMALL).collect()}
        ev = read_table(spark, SF_SMALL, "events").select(
            "event_type",
            F.round(F.col("value") * 10).cast("bigint")
            .cast("double").alias("v"))
        ref = {r["event_type"]: r for r in
               ev.groupBy("event_type").agg(
                   F.skewness("v").alias("sk"),
                   F.kurtosis("v").alias("ku")).collect()}
        assert set(got) == set(ref)
        for k in got:
            assert abs(got[k]["skew_nano"] / 1e9 - ref[k]["sk"]) < 1e-6
            assert abs(got[k]["kurt_nano"] / 1e9 - ref[k]["ku"]) < 1e-6


class TestPowerIterationOverflow:
    def test_large_eigenvalue_no_int64_wrap(self):
        """Regression: the renormalization step must not wrap int64.
        A rank-1 Gram with huge entries (the shape a spike-dominated
        10^4+-vector corpus produces) drives |y| far past 2^63/1e9;
        the double-space renorm still recovers the uniform top
        eigenvector exactly."""
        import numpy as np

        from gasket_spark.operators import similarity as S

        G = np.full((64, 64), int(1.4e17), dtype=np.int64)  # rank-1 ones
        x = S.power_iteration_top1(G).astype(np.float64)
        # top eigenvector of the ones matrix is uniform: every
        # component renormalizes to exactly +1e9
        assert np.all(x == 1e9)

"""Property-based tests (hypothesis): invariants of the pipeline-spec
compiler and the determinism contracts that the engine leans on.

Pure-Python properties run at full example counts; Spark-backed
properties use small example budgets (each example is a Spark job)."""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from gasket_spark.pipeline.spec import (
    STAGE_TYPES, Stage, normalize_stage, split_groups,
)

# ---------------------------------------------------------------------------
# spec compiler invariants (pure python, no Spark)
# ---------------------------------------------------------------------------

stage_types = st.sampled_from(STAGE_TYPES)
commands = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd"),
                           whitelist_characters=" -_./"),
    min_size=1, max_size=30).filter(str.strip)


@given(st.lists(stage_types, min_size=1, max_size=30))
def test_split_groups_are_maximal_runs(types):
    """split (index.js:94-115): groups are non-empty maximal runs of
    equal type, and flattening restores the original order."""
    stages = [{"command": "cat -", "type": t} for t in types]
    groups = split_groups(stages)
    flat = [s.type for g in groups for s in g]
    assert flat == types
    for g in groups:
        assert len({s.type for s in g}) == 1  # homogeneous
    for a, b in zip(groups, groups[1:]):
        assert a[0].type != b[0].type  # maximal: adjacent groups differ


@given(commands)
def test_bare_string_is_pipe_command(cmd):
    """Intended semantics (SURVEY §2.4 item 1): any bare-string stage
    normalizes to a pipe-type command stage, round-tripping via
    to_json back to the same string (what `gasket add` writes)."""
    s = normalize_stage(cmd)
    assert (s.kind, s.type, s.command) == ("command", "pipe", cmd)
    assert s.to_json() == cmd


@given(commands, stage_types,
       st.lists(st.text(min_size=1, max_size=8), max_size=4))
def test_dict_stage_roundtrip(cmd, stype, params):
    """Object stages keep type and params through normalize → to_json →
    normalize (the reference DROPS everything but command,
    index.js:83 — the rebuild preserves the documented surface)."""
    s = normalize_stage({"command": cmd, "type": stype, "params": params})
    assert (s.command, s.type, s.params) == (cmd, stype, params)
    s2 = normalize_stage(s.to_json())
    assert (s2.command, s2.type, s2.params) == (cmd, stype, params)


@given(st.one_of(st.integers(), st.booleans(), st.none(),
                 st.lists(st.integers(), max_size=3)))
def test_unsupported_forms_raise(bad):
    with pytest.raises(ValueError):
        normalize_stage(bad)


# ---------------------------------------------------------------------------
# determinism contracts (Spark-backed; tiny example budgets)
# ---------------------------------------------------------------------------


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False,
                          width=32),
                min_size=1, max_size=40),
       st.integers(min_value=1, max_value=8))
def test_money_sum_partition_independent(spark, values, n_parts):
    """Integer-space money sums must not depend on partitioning (plain
    float sums would)."""
    from pyspark.sql import functions as F

    from gasket_spark.functions.numeric import money_sum

    df = spark.createDataFrame([(float(v),) for v in values], "v double")
    a = df.coalesce(1).agg(money_sum(F.col("v")).alias("s")).collect()[0].s
    b = df.repartition(n_parts).agg(
        money_sum(F.col("v")).alias("s")).collect()[0].s
    assert a == b


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.integers(min_value=0, max_value=500),
                min_size=1, max_size=60),
       st.integers(min_value=100, max_value=2000))
def test_pack_shards_budget_property(spark, token_counts, target):
    """Floor-binning invariants: shard ids start at 0 and are
    non-decreasing in doc order (a doc bigger than the target may
    legitimately SKIP ids), and every shard's total stays under
    target + its largest doc (the bin bound)."""
    from gasket_spark.operators.packing import pack_shards

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(token_counts)], "doc_id long, n long")
    out = sorted(pack_shards(df, "n", "doc_id", target,
                             n_partitions=3).collect(),
                 key=lambda r: r.doc_id)
    assert out[0].shard_id == 0
    assert all(a.shard_id <= b.shard_id for a, b in zip(out, out[1:]))
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard_id, []).append(r)
    for rows in by_shard.values():
        total = sum(r.n for r in rows)
        assert total <= target + max(r.n for r in rows)


class TestCodecRoundTrips:
    """Property-based round-trips for the pure-numpy media codecs:
    decode must invert make_* for ARBITRARY content, not just the
    closed-form fixtures — strides, odd widths, single frames and
    extreme pixel values included."""

    @given(
        n=st.integers(1, 4), h=st.integers(1, 5), w=st.integers(1, 9),
        seed=st.integers(0, 2 ** 31 - 1),
    )
    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_avi_roundtrip(self, n, h, w, seed):
        import numpy as np

        from gasket_spark.operators import multimodal as M

        rng = np.random.default_rng(seed)
        fx = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        d = M.decode_avi(M.make_avi(fx))
        assert d["feature"] == f"avi:{w}x{h}:{n}@{M.AVI_FPS}"
        assert d["content"] == ",".join(
            str(int(v)) for v in fx.reshape(-1))

    @given(h=st.integers(1, 6), w=st.integers(1, 9),
           seed=st.integers(0, 2 ** 31 - 1))
    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_ppm_roundtrip(self, h, w, seed):
        import numpy as np

        from gasket_spark.operators import multimodal as M

        rng = np.random.default_rng(seed)
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        d = M.decode_ppm(M.make_ppm(px))
        assert d["feature"] == f"ppm:{w}x{h}"
        assert d["content"] == ",".join(
            str(int(v)) for v in px.reshape(-1))

    @given(n=st.integers(0, 64), seed=st.integers(0, 2 ** 31 - 1))
    @settings(max_examples=40, deadline=None,
              suppress_health_check=[HealthCheck.too_slow])
    def test_wav_roundtrip(self, n, seed):
        import numpy as np

        from gasket_spark.operators import multimodal as M

        rng = np.random.default_rng(seed)
        samples = rng.integers(-32768, 32768, size=n).astype(np.int16)
        d = M.decode_wav(M.make_wav(samples))
        assert d["feature"] == f"wav:{M.WAV_RATE}:{n}"
        assert d["content"] == ",".join(str(int(s)) for s in samples)


# ---------------------------------------------------------------------------
# round-6 kernel invariants (pure numpy/python, no Spark)
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(min_value=0, max_value=100_000),
                min_size=1, max_size=40))
def test_ewma_fixed_point_invariants(cents):
    """The unrolled fixed-point EWMA (q_window_ewma arithmetic) is a
    true weighted average: between min and max of the lagged values,
    exactly the newest value when history is length-1, and its
    denominator always the sum of the weights actually present."""
    K = 8
    for t in range(len(cents)):
        lags = cents[max(0, t - K + 1): t + 1][::-1]  # newest first
        num = sum(c * (1 << (K - 1 - i)) for i, c in enumerate(lags))
        den = sum(1 << (K - 1 - i) for i in range(len(lags)))
        ewma = num / den
        assert min(lags) <= ewma <= max(lags)
        if t == 0:
            assert ewma == cents[0]


@given(st.lists(st.integers(min_value=-1000, max_value=1000),
                min_size=2, max_size=60))
def test_cusum_scaled_transform_is_monotone(xs):
    """n·prefix_i − i·total (q_cusum_changepoint's integer transform)
    equals n · Σ(x_j − mean): same argmax, same sign, no float
    mean — the property that makes the all-integer argmax exact."""
    n, tot = len(xs), sum(xs)
    pfx = 0
    for i, x in enumerate(xs, start=1):
        pfx += x
        scaled = n * pfx - i * tot
        true = sum(xs[:i]) - i * tot / n
        assert scaled == pytest.approx(n * true)


@given(st.lists(st.tuples(st.integers(0, 20_000), st.integers(0, 20_000)),
                min_size=2, max_size=60, unique=True))
def test_spatial_grid_join_is_lossless(pts):
    """Grid pruning coverage (q_join_spatial_grid): with cell size =
    radius, every pair within the radius shares a cell after one side
    expands to its 3x3 neighborhood — the brute-force pair set is
    recovered exactly, and no pair is produced twice."""
    cell = 1500
    brute = {(i, j) for i in range(len(pts)) for j in range(len(pts))
             if i < j and (pts[i][0] - pts[j][0]) ** 2
             + (pts[i][1] - pts[j][1]) ** 2 <= cell * cell}
    got = []
    for i, (ax, ay) in enumerate(pts):
        for j, (bx, by) in enumerate(pts):
            if i >= j:
                continue
            acx, acy = ax // cell, ay // cell
            bcx, bcy = bx // cell, by // cell
            hits = sum(1 for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                       if (acx + dx, acy + dy) == (bcx, bcy))
            if hits and (ax - bx) ** 2 + (ay - by) ** 2 <= cell * cell:
                got.extend([(i, j)] * hits)
    assert set(got) == brute
    assert len(got) == len(set(got))  # each pair found exactly once


@given(st.integers(1, 8), st.integers(0, 2**32 - 1))
def test_maxsim_bounds_cosinelike(n_vec_seed, seed):
    """MaxSim invariants (q_sim_maxsim kernel): score of a vector
    against itself >= score against any other vector whose sub-dots
    are elementwise <= its own; and MaxSim >= the aligned-sum (sum of
    diagonal sub-dots), since max_j >= the j=i term."""
    import numpy as np

    rng = np.random.RandomState(seed)
    q = rng.randn(64)
    d = rng.randn(64)
    SCALE = 1e15

    def sub_dot(a, b, i, j):
        prods = a[8 * i:8 * i + 8] * b[8 * j:8 * j + 8] * SCALE
        return int((np.sign(prods) * np.floor(np.abs(prods) + 0.5))
                   .astype(np.int64).sum())

    maxsim = sum(max(sub_dot(q, d, i, j) for j in range(8))
                 for i in range(8))
    aligned = sum(sub_dot(q, d, i, i) for i in range(8))
    assert maxsim >= aligned


@given(st.lists(st.sets(st.integers(0, 30), min_size=1, max_size=12),
                min_size=2, max_size=10),
       st.sampled_from([0.3, 0.5, 0.7, 0.8]))
def test_prefix_filter_principle_lossless(sets, t):
    """The prefix principle behind operators/dedup.prefix_filter_pairs:
    with every set's elements under ONE global canonical order
    (df ascending, ties by element), any pair with J >= t must share
    an element within each side's first |s| - ceil(t*|s|) + 1 — for
    ARBITRARY set families, not just the fixture corpus. (The Spark
    plumbing is pinned separately against the brute-force oracle.)"""
    import math
    from collections import Counter

    df = Counter(e for s in sets for e in s)
    prefixes = []
    for s in sets:
        ordered = sorted(s, key=lambda e: (df[e], e))
        p = len(s) - math.ceil(t * len(s)) + 1
        prefixes.append(set(ordered[:p]))
    for i in range(len(sets)):
        for j in range(i + 1, len(sets)):
            inter = len(sets[i] & sets[j])
            uni = len(sets[i] | sets[j])
            if uni and inter / uni >= t:
                assert prefixes[i] & prefixes[j]


@given(st.lists(st.floats(min_value=-1e6, max_value=1e6,
                          allow_nan=False, allow_infinity=False),
                min_size=1, max_size=50))
def test_cents_half_up_matches_decimal_half_up_of_the_double(values):
    """streaming.core.cents_half_up must agree with HALF-AWAY-FROM-ZERO
    rounding of the EXACT value the float64 carries (what Spark
    F.round and DuckDB round compute) — for arbitrary doubles,
    including exact half-cent landings, where np.round's half-to-even
    disagrees."""
    import math

    import numpy as np

    from gasket_spark.streaming.core import cents_half_up

    got = cents_half_up(np.array(values, dtype=np.float64))
    for v, g in zip(values, got):
        x = v * 100.0  # the identical IEEE product the JVM computes
        want = math.floor(abs(x) + 0.5) * (1 if x >= 0 else -1)
        assert g == want


def test_cents_half_up_half_cent_boundary():
    """The concrete r7 ADVICE case: 0.125 -> 12.5 must round to 13
    (np.round gives 12), and -0.125 to -13."""
    import numpy as np

    from gasket_spark.streaming.core import cents_half_up

    got = cents_half_up(np.array([0.125, -0.125, 0.135, -0.135],
                                 dtype=np.float64))
    assert got.tolist() == [13, -13, 14, -14]


# ---------------------------------------------------------------------------
# round-11 kernel invariants (pure python, no Spark)
# ---------------------------------------------------------------------------


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(st.lists(st.text(alphabet="abcx ", min_size=0, max_size=24),
                min_size=2, max_size=12, unique=True),
       st.integers(1, 3))
@settings(max_examples=60, deadline=None)
def test_edit_distance_blocking_is_lossless(texts, d):
    """The edit_distance_pairs candidate rule (rare-gram signatures +
    the length-banded short bucket), simulated exactly in Python:
    EVERY pair within edit distance d must be a candidate. This is
    the lemma the Spark operator's recall rests on, explored over
    random corpora instead of the one hand-built fixture.

    r13 (optimization round): the candidate rule tightened from
    sig(a) ∩ grams(b) to sig(a) ∩ sig(b) — the standard
    prefix-filter lemma under the global (df, gram) order, which the
    operator's sig × sig join now relies on — so this test pins the
    STRONGER claim."""
    q = 2
    sig_k = d * q + 1
    short_max = q * (d + 1) - 1
    grams = {t: {t[i:i + q] for i in range(max(len(t) - q + 1, 0))}
             for t in texts}
    df = {}
    for g_set in grams.values():
        for g in g_set:
            df[g] = df.get(g, 0) + 1
    sig = {t: set(sorted(gs, key=lambda g: (df[g], g))[:sig_k])
           for t, gs in grams.items()}
    for i, a in enumerate(texts):
        for b in texts[i + 1:]:
            if _lev(a, b) > d:
                continue
            sig_hit = sig[a] & sig[b]
            short_hit = (
                (len(a) <= short_max or len(b) <= short_max)
                and abs(len(a) - len(b)) <= d
                and max(len(a), len(b)) <= short_max + d)
            assert sig_hit or short_hit, (a, b, d)


@given(st.lists(st.sampled_from("xy"), min_size=2, max_size=24),
       st.sampled_from([("x", "y"), ("x", "x"), ("y", "x")]))
@settings(max_examples=120, deadline=None)
def test_padded_replace_fixpoint_merge_contract(syms, pair):
    """The BPE merge-application contract, as it ACTUALLY holds
    (Python str.replace shares the JVM's and DuckDB's left-to-right
    non-overlapping semantics, so this simulates all three engines):

    * the fixpoint is reached and MAXIMAL — no adjacent (left, right)
      pair survives;
    * the merge is LOSSLESS — concatenating the tokens restores the
      original symbol stream;
    * it equals the classic list-greedy scan whenever the longest
      same-pair run is < 5 symbols. At >= 5 the grouping differs
      (' x x x x x ' -> [xx, x, xx] vs greedy [xx, xx, x]) — a REAL
      divergence this property test discovered (the first draft
      asserted unconditional equality and hypothesis refuted it);
      the operators/oracles all use the fixpoint semantics on both
      engines, so cross-engine exactness is unaffected."""
    left, right = pair
    s = " " + " ".join(syms) + " "
    pat, rep = f" {left} {right} ", f" {left}{right} "
    for _ in range(32):
        nxt = s.replace(pat, rep)
        if nxt == s:
            break
        s = nxt
    assert pat not in s                      # maximal fixpoint
    got = s.strip().split(" ")
    assert "".join(got) == "".join(syms)     # lossless

    out, i = [], 0
    while i < len(syms):
        if (i + 1 < len(syms) and syms[i] == left
                and syms[i + 1] == right):
            out.append(left + right)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    assert all(not (a == left and b == right)
               for a, b in zip(got, got[1:]))
    # longest run of the PAIR pattern (overlapping occurrences)
    run, longest = 0, 0
    for a, b in zip(syms, syms[1:]):
        run = run + 1 if (a == left and b == right) else 0
        longest = max(longest, run)
    if longest <= 3:      # same-pair runs < 5 symbols
        assert got == out, (syms, pair, got, out)


def test_padded_replace_run5_divergence_pinned():
    """The concrete >= 5-run divergence, pinned: the fixpoint skips
    the middle symbol while list-greedy packs left."""
    s = " x x x x x ".replace(" x x ", " xx ")
    assert s == " xx x xx "
    assert s.replace(" x x ", " xx ") == s   # already at fixpoint


# ---------------------------------------------------------------------------
# round-12 bank invariants (pure python, no Spark) — the BPE lesson:
# hypothesis the correctness story BEFORE the registration round
# ---------------------------------------------------------------------------

@given(st.lists(st.integers(min_value=1, max_value=50),
                min_size=1, max_size=60),
       st.integers(min_value=1, max_value=40))
def test_pack_sequences_span_formulas_tile_and_cover(ns, L):
    """pack_sequences' integer span formulas (first/last seq id, lo/hi
    clamps) against the definitional reference — walking the
    concatenated token stream one token at a time: identical spans,
    exact sequence tiling, lossless contiguous doc coverage."""
    # reference: token t of the global stream lands in seq t // L
    spans_ref = {}
    pos = 0
    for doc, n in enumerate(ns):
        for t in range(n):
            g = pos + t
            key = (doc, g // L)
            if key not in spans_ref:
                spans_ref[key] = [t, g % L, 0]   # doc_off, seq_off, len
            spans_ref[key][2] += 1
        pos += n
    # operator formulas (operators/packing.py:pack_sequences)
    spans_op = {}
    start = 0
    for doc, n in enumerate(ns):
        for s in range(start // L, (start + n - 1) // L + 1):
            lo = max(s * L, start)
            hi = min((s + 1) * L, start + n)
            spans_op[(doc, s)] = [lo - start, lo - s * L, hi - lo]
        start += n
    assert spans_op == spans_ref
    # tiling: every sequence except the last is exactly full
    total = sum(ns)
    per_seq = {}
    for (_doc, s), (_do, _so, ln) in spans_op.items():
        per_seq[s] = per_seq.get(s, 0) + ln
    n_seqs = -(-total // L)
    assert set(per_seq) == set(range(n_seqs))
    for s, filled in per_seq.items():
        assert filled == (L if s < n_seqs - 1
                          else total - L * (n_seqs - 1))


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@given(st.text(alphabet="abcd", min_size=1, max_size=30),
       st.lists(st.tuples(st.integers(0, 29), st.sampled_from("abcdx"),
                          st.sampled_from("ins del sub".split())),
                min_size=0, max_size=3),
       st.integers(min_value=2, max_value=5))
def test_edit_blocking_lemma_and_length_band(s, edits, q):
    """The two pruning facts edit_distance_pairs stakes its recall on,
    pinned over random edit scripts: levenshtein <= d forces
    (1) |len(a) − len(b)| <= d — the r12 IN-JOIN band — and
    (2) |grams(a) \\ grams(b)| <= d·q (each edit disturbs <= q
    q-grams), the signature pigeonhole. Small alphabet ON PURPOSE:
    repetitive strings are where rarity-based intuition fails."""
    t = s
    for pos, ch, kind in edits:
        p = min(pos, max(len(t) - 1, 0))
        if kind == "ins":
            t = t[:p] + ch + t[p:]
        elif kind == "del" and t:
            t = t[:p] + t[p + 1:]
        elif kind == "sub" and t:
            t = t[:p] + ch + t[p + 1:]
    d = _lev(s, t)
    assert d <= len(edits)
    assert abs(len(s) - len(t)) <= d            # the length band
    gs = {s[i:i + q] for i in range(max(len(s) - q + 1, 0))}
    gt = {t[i:i + q] for i in range(max(len(t) - q + 1, 0))}
    assert len(gs - gt) <= d * q                 # the gram lemma

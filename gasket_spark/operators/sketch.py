"""KMV (k-minimum-values) distinct-count sketches.

``approx_count_distinct`` (HLL++) answers one-shot cardinality; a KMV
sketch additionally gives an ENGINE-INSPECTABLE, UNION-MERGEABLE
representation: the sketch of A ∪ B is just the k smallest values of
the two sketches' union — so per-partition / per-day sketches roll up
without rescanning data (the cross-batch shape incremental pipelines
need). Estimate: with u_k = the k-th smallest of the key hashes mapped
uniformly into (0,1), E[distinct] ≈ (k-1)/u_k; error ~ 1/√k.

Everything is JVM expressions (xxhash64 + windowed top-k + aggregates);
the sketch per group is k longs — broadcastable, storable, diffable.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# map signed-64 hash to uniform (0,1): (h + 2^63 + 1) / (2^64 + 2)
_OFFSET = float(2 ** 63) + 1.0
_RANGE = float(2 ** 64) + 2.0


def kmv_sketch(df: DataFrame, group_cols: list[str], value_col: str,
               k: int = 1024) -> DataFrame:
    """Per-group KMV sketch: the ``k`` smallest distinct hash values of
    ``value_col``, plus ``n_seen`` (how many distinct hashes the group
    actually had, capped at k — needed for the exact-below-k case).
    Returns (group_cols…, sketch: array<long>, n_seen: long).

    Built as a TWO-PHASE aggregate (per-input-partition bottom-k →
    merge of ≤ P·k hashes), because bottom-k is mergeable: a per-group
    sort window would funnel every distinct hash of a group through
    ONE task — with few groups (the common sketching shape) that's a
    single-reducer bottleneck at scale, and it's also why there is no
    ``.distinct()`` pre-pass (the partial phase dedups in place; a
    distinct would be a second corpus-wide shuffle)."""
    part = (
        df.select(*group_cols, F.xxhash64(F.col(value_col)).alias("_h"))
        .groupBy(*group_cols, F.spark_partition_id().alias("_p"))
        .agg(F.slice(F.array_sort(F.collect_set("_h")), 1, k)
             .alias("_pk"))
    )
    merged = F.slice(
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("_pk")))),
        1, k)
    return (
        part.groupBy(*group_cols)
        .agg(merged.alias("sketch"))
        .withColumn("n_seen", F.size("sketch").cast("long"))
    )


def kmv_estimate(sketches: DataFrame, k: int = 1024) -> DataFrame:
    """Distinct-count estimate per sketch row: exact when the group had
    fewer than k distinct values (the sketch IS the distinct hash set),
    else (k-1)/u_k."""
    u_k = (F.element_at("sketch", k).cast("double") + F.lit(_OFFSET)) \
        / F.lit(_RANGE)
    return sketches.withColumn(
        "distinct_est",
        F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
        .otherwise((F.lit(float(k - 1)) / u_k)))


def kmv_merge(a: DataFrame, b: DataFrame, group_cols: list[str],
              k: int = 1024) -> DataFrame:
    """Union-merge two sketch tables: per group, the k smallest of the
    combined (distinct) hash values — the sketch the FULL union of the
    underlying data would have produced. Outer-merges groups present in
    only one side."""
    both = (
        a.select(*group_cols, F.explode("sketch").alias("_h"))
        .unionByName(b.select(*group_cols, F.explode("sketch").alias("_h")))
        .distinct()
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    topk = both.withColumn("_rk", F.row_number().over(w)) \
               .filter(F.col("_rk") <= k)
    return (
        topk.groupBy(*group_cols)
        .agg(F.sort_array(F.collect_list("_h")).alias("sketch"),
             F.count(F.lit(1)).alias("n_seen"))
    )


# ---------------------------------------------------------------------------
# Quantile sketch: bottom-k coherent row sample
# ---------------------------------------------------------------------------
#
# Mergeable quantiles without a native KLL/t-digest: keep, per group,
# the k rows whose xxhash64(row id) is smallest ("bottom-k sample").
# Bottom-k sampling is COHERENT: the bottom-k of A ∪ B equals the
# bottom-k of (bottom-k(A) ∪ bottom-k(B)), so per-batch/per-partition
# sketches union-merge EXACTLY into the sketch the full dataset would
# have produced (tested). The sample is uniform over rows
# (content-addressed — no RNG, stable under retries and partitioning),
# so the rank-q element of the sample estimates the rank-q element of
# the data with error O(1/sqrt(k)). Sketch = k (hash, value) structs +
# the true row count: inspectable, storable, diffable — the
# cross-batch percentile-rollup shape (daily p99s that roll up into a
# monthly p99 without rescanning).


def qsketch(df: DataFrame, group_cols: list[str], value_col: str,
            id_col: str, k: int = 1024) -> DataFrame:
    """Per-group bottom-k quantile sketch over ``value_col`` (sampled
    by ``xxhash64(id_col)``; ``id_col`` must be row-unique for the
    sample to be uniform over rows). Returns
    (group_cols…, sample: array<struct<h:long, v:long>>, n_rows)."""
    # two-phase bottom-k, for the same single-reducer reason as
    # kmv_sketch (structs sort by h first, so slice-after-sort is the
    # per-partition bottom-k by hash)
    hashed = df.select(
        *group_cols,
        F.xxhash64(F.col(id_col)).alias("_h"),
        F.col(value_col).cast("long").alias("_v"))
    part = (
        hashed
        .groupBy(*group_cols, F.spark_partition_id().alias("_p"))
        .agg(F.slice(F.array_sort(F.collect_list(F.struct(
            F.col("_h").alias("h"), F.col("_v").alias("v")))), 1, k)
            .alias("_pk"),
            F.count(F.lit(1)).alias("_n"))
    )
    sk = part.groupBy(*group_cols).agg(
        F.slice(F.array_sort(F.flatten(F.collect_list("_pk"))), 1, k)
        .alias("sample"),
        F.sum("_n").alias("n_rows"))
    return sk


def qsketch_merge(a: DataFrame, b: DataFrame, group_cols: list[str],
                  k: int = 1024) -> DataFrame:
    """Merge sketches of two DISJOINT row sets: bottom-k of the union
    of samples (coherence makes this exact), row counts add. Groups
    present on one side pass through."""
    cols = [*group_cols, "sample", "n_rows"]
    both = (
        a.select(*cols).unionByName(b.select(*cols))
        .select(*group_cols, F.col("n_rows"),
                F.explode("sample").alias("_s"))
    )
    w = Window.partitionBy(*group_cols).orderBy(F.col("_s.h").asc())
    topk = both.withColumn("_rk", F.row_number().over(w)) \
               .filter(F.col("_rk") <= k)
    n = (
        a.select(*group_cols, "n_rows")
        .unionByName(b.select(*group_cols, "n_rows"))
        .groupBy(*group_cols).agg(F.sum("n_rows").alias("n_rows"))
    )
    sk = topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("_s")).alias("sample"))
    return sk.join(n, group_cols)


def qsketch_quantiles(sketches: DataFrame, probs: list[float]) -> DataFrame:
    """Estimate quantiles from a sketch: the rank-``round(p·(m-1))``
    element of the sample's sorted values, emitted as one column per
    probability (``q50``, ``q90``, …). Nearest-rank (no interpolation)
    so estimates are always observed values."""
    vals = F.array_sort(F.transform("sample", lambda s: s["v"]))
    out = sketches
    m = F.size("sample")
    for p in probs:
        idx = F.round(F.lit(p) * (m - 1).cast("double")).cast("int") + 1
        out = out.withColumn(
            f"q{int(p * 100)}", F.element_at(vals, idx))
    return out.drop("sample")


def kmv_jaccard(a: DataFrame, b: DataFrame, group_cols: list[str],
                k: int = 1024) -> DataFrame:
    """Set-algebra estimates from two KMV sketch tables (theta-sketch
    style): per group, the Jaccard similarity of the underlying
    distinct sets is estimated as the overlap fraction *within the
    bottom-k of the union* — the union's bottom-k is a uniform sample
    of A ∪ B, so |A∩B|/|A∪B| estimated on the sample is unbiased,
    error ~1/sqrt(k). Combined with the union cardinality estimate
    this yields intersection counts: |A∩B| ≈ J · |A∪B| — the
    cross-corpus overlap probe (how much of corpus B is already in A)
    that exact distinct-joins can't answer without rescanning both.

    Returns (group_cols…, jaccard_est, union_est, intersect_est).
    """
    ea = a.select(*group_cols, F.explode("sketch").alias("_h")) \
          .withColumn("_in_a", F.lit(1))
    eb = b.select(*group_cols, F.explode("sketch").alias("_h")) \
          .withColumn("_in_b", F.lit(1))
    both = ea.join(eb, [*group_cols, "_h"], "full") \
        .select(*group_cols, "_h",
                F.coalesce("_in_a", F.lit(0)).alias("_in_a"),
                F.coalesce("_in_b", F.lit(0)).alias("_in_b"))
    w = Window.partitionBy(*group_cols).orderBy(F.col("_h").asc())
    union_k = both.withColumn("_rk", F.row_number().over(w)) \
                  .filter(F.col("_rk") <= k)
    est = union_k.groupBy(*group_cols).agg(
        F.sum(F.col("_in_a") * F.col("_in_b")).alias("_n_both"),
        F.count(F.lit(1)).alias("_n"),
        F.max(F.when(F.col("_rk") == k, F.col("_h"))).alias("_kth"),
    )
    u_k = (F.col("_kth").cast("double") + F.lit(_OFFSET)) / F.lit(_RANGE)
    union_est = F.when(F.col("_n") < k, F.col("_n").cast("double")) \
        .otherwise(F.lit(float(k - 1)) / u_k)
    jac = F.col("_n_both").cast("double") / F.col("_n")
    return est.select(
        *group_cols,
        jac.alias("jaccard_est"),
        union_est.alias("union_est"),
        (jac * union_est).alias("intersect_est"))


# ---------------------------------------------------------------------------
# Theta sketch: KMV generalized to COMPOSABLE set algebra
# ---------------------------------------------------------------------------
#
# kmv_jaccard answers overlap questions with SCALAR estimates; a theta
# sketch makes intersection and difference first-class SKETCH→SKETCH
# operations, so expressions compose: (A ∩ B) \ C, (A \ B) ∪ (C ∩ D)…
# each intermediate is again a (theta, retained-hash-set) pair that can
# be stored, shipped, and further combined — the standard
# theta-sketch design (Dalvi et al. / Apache DataSketches semantics,
# re-expressed as DataFrame array algebra).
#
# State per group: ``theta_h`` (a raw signed-64 hash threshold; NULL
# means θ = 1.0, the exact regime) + ``hashes`` (the retained distinct
# hash values < theta_h). Every retained hash is a uniform sample of
# the underlying set at rate θ, so |set| ≈ |hashes| / θ with relative
# error ~1/√|hashes|. Op laws (result is always a valid sketch):
#
# * union:     θ = min(θa, θb); retained = (Ha ∪ Hb) < θ
# * intersect: θ = min(θa, θb); retained = (Ha ∩ Hb) < θ
# * a_not_b:   θ = min(θa, θb); retained = (Ha \ Hb) < θ
#
# Group counts are small after sketching (the sketch IS the
# reduction), so the per-group array algebra below is JVM higher-order
# functions over ≤k-long arrays — no shuffle beyond the outer join on
# the group keys.


def theta_from_kmv(sketches: DataFrame, k: int = 1024) -> DataFrame:
    """Lift a :func:`kmv_sketch` table into theta form. Saturated
    groups (n_seen == k): θ is the k-th smallest hash (exclusive
    threshold) and the first k−1 hashes are retained. Unsaturated
    groups hold their ENTIRE distinct hash set: θ = 1.0 (NULL).
    Returns (group_cols…, theta_h: long|null, hashes: array<long>)."""
    sat = F.col("n_seen") >= k
    return sketches.select(
        *[c for c in sketches.columns if c not in ("sketch", "n_seen")],
        F.when(sat, F.element_at("sketch", k)).alias("theta_h"),
        F.when(sat, F.slice("sketch", 1, k - 1))
        .otherwise(F.col("sketch")).alias("hashes"))


def _theta_filter(hashes, theta_h):
    return F.when(theta_h.isNull(), hashes).otherwise(
        F.filter(hashes, lambda h: h < theta_h))


def theta_op(a: DataFrame, b: DataFrame, group_cols: list[str],
             op: str) -> DataFrame:
    """Binary theta-sketch set operation (``union`` | ``intersect`` |
    ``a_not_b``) per group; groups present on one side only follow the
    op's identity (union: pass through; intersect: empty; a_not_b: A
    passes, B-only drops). Output is again a theta sketch table."""
    if op not in ("union", "intersect", "a_not_b"):
        raise ValueError(f"unknown theta op: {op}")
    aa = a.select(*group_cols, F.col("theta_h").alias("_ta"),
                  F.col("hashes").alias("_ha"))
    bb = b.select(*group_cols, F.col("theta_h").alias("_tb"),
                  F.col("hashes").alias("_hb"))
    # NO broadcast hint: a sketch row is ≤k longs, but the GROUP COUNT
    # is unbounded (per-domain / per-doc sketching = millions of
    # groups), so a forced broadcast would OOM exactly at scale.
    # Below the autoBroadcastJoinThreshold Spark picks BHJ for the
    # left join on its own; union/intersect need the full group
    # universe (B-only groups pass through / emit empty sketches) and
    # a full-outer join shuffles — on sketch-sized data, not the
    # underlying corpus.
    j = aa.join(bb, group_cols,
                "left" if op == "a_not_b" else "full")
    # least() skips NULLs, which is exactly "NULL means θ=1.0 = +∞"
    theta = F.least("_ta", "_tb")
    ha = F.coalesce("_ha", F.array().cast("array<long>"))
    hb = F.coalesce("_hb", F.array().cast("array<long>"))
    if op == "union":
        merged = F.array_distinct(F.concat(ha, hb))
    elif op == "intersect":
        merged = F.array_intersect(ha, hb)
    else:
        merged = F.array_except(ha, hb)
    return j.select(
        *group_cols, theta.alias("theta_h"),
        F.sort_array(_theta_filter(merged, theta)).alias("hashes"))


def theta_estimate(sketches: DataFrame) -> DataFrame:
    """Cardinality estimate per sketch row: exact (|hashes|) in the
    θ=1 regime, else |hashes| / θ."""
    theta = (F.col("theta_h").cast("double") + F.lit(_OFFSET)) \
        / F.lit(_RANGE)
    return sketches.withColumn(
        "distinct_est",
        F.when(F.col("theta_h").isNull(),
               F.size("hashes").cast("double"))
        .otherwise(F.size("hashes").cast("double") / theta))


# ---------------------------------------------------------------------------
# Count-min sketch: mergeable per-item frequency estimates
# ---------------------------------------------------------------------------
#
# KMV answers distinct-count and set overlap; count-min answers "how
# often does ITEM x occur" from a fixed-size state, with one-sided
# error (never underestimates; overestimates by at most eN with
# probability 1-delta, w = e/eps, d = ln(1/delta)). The sketch is
# depth-d rows of width-w counters; here each row is a SPARSE map
# (bucket -> count) since fixture-scale groups touch few buckets —
# the dense array is the same law with a different storage choice.
# Merge is entrywise addition, which is EXACT: cms(A) + cms(B) is the
# very sketch cms(A ∪ B) would have produced (tested), so per-batch
# sketches roll up like the KMV/quantile states.


def cms_sketch(df: DataFrame, group_cols: list[str], value_col: str,
               depth: int = 4, width: int = 1024) -> DataFrame:
    """Per-group count-min sketch of ``value_col`` occurrences.
    Returns (group_cols…, sketch: array<map<int,long>>) with
    ``sketch[j]`` the j-th hash row. One explode (×depth) + one
    two-phase count aggregate + two reshape aggs — all JVM-side;
    xxhash64(value, j) provides the d independent hash functions."""
    probes = df.select(
        *group_cols, F.col(value_col).alias("_v"),
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("_j"))
    counts = probes.groupBy(
        *group_cols, "_j",
        F.pmod(F.xxhash64(F.col("_v"), F.col("_j")), F.lit(width))
        .cast("int").alias("_b")
    ).agg(F.count(F.lit(1)).alias("_c"))
    rows = counts.groupBy(*group_cols, "_j").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("_b", "_c"))))
        .alias("_row"))
    return rows.groupBy(*group_cols).agg(
        F.transform(
            # array_sort with an explicit comparator: structs holding
            # maps have no natural ordering, but we only order by _j
            F.array_sort(
                F.collect_list(F.struct("_j", "_row")),
                lambda a, b: a.getField("_j") - b.getField("_j")),
            lambda s: s.getField("_row")).alias("sketch"))


def cms_merge(a: DataFrame, b: DataFrame,
              group_cols: list[str]) -> DataFrame:
    """Entrywise-add two sketch tables (exact merge law); groups
    present on one side pass through unchanged."""
    joined = a.withColumnRenamed("sketch", "_sa").join(
        b.withColumnRenamed("sketch", "_sb"), group_cols, "full")
    add = F.zip_with(
        "_sa", "_sb",
        lambda ma, mb: F.map_zip_with(
            ma, mb,
            lambda _k, x, y: F.coalesce(x, F.lit(0))
            + F.coalesce(y, F.lit(0))))
    return joined.select(
        *group_cols,
        F.when(F.col("_sa").isNull(), F.col("_sb"))
        .when(F.col("_sb").isNull(), F.col("_sa"))
        .otherwise(add).alias("sketch"))


def cms_estimate(sketches: DataFrame, items: DataFrame,
                 item_col: str, width: int = 1024) -> DataFrame:
    """Point-query frequency estimates: for every (group, item) pair,
    min over the d hash rows of that row's counter —
    ``min_j sketch[j][h_j(item)]``. ``items`` is expected to be small
    (it is broadcast); absent buckets read as 0."""
    probed = sketches.join(F.broadcast(items))
    est = F.array_min(F.transform(
        "sketch",
        lambda m, j: F.coalesce(
            F.element_at(m, F.pmod(
                F.xxhash64(F.col(item_col), j), F.lit(width)).cast("int")),
            F.lit(0))))
    return probed.select(
        *[c for c in probed.columns if c != "sketch"],
        est.alias("freq_est"))


# ---------------------------------------------------------------------------
# KLL quantile sketch (Karnin–Lang–Liberty, FOCS 2016 — public algorithm)
# ---------------------------------------------------------------------------
#
# Where ``qsketch`` is a uniform bottom-k SAMPLE (rank error ~1/sqrt(k),
# probabilistic), KLL is the formally-bounded quantile sketch: a stack
# of compactors where level i holds items of weight 2^i and capacities
# shrink geometrically below the top. Rank error is eps*n with
# k = O((1/eps) * sqrt(log(1/delta))) — the state-of-the-art space/
# accuracy trade-off, and the sketch is MERGEABLE, so the distributed
# shape is: per-partition build (mapInPandas, no shuffle) -> shuffle
# only the compactor state (k doubles per group, not rows) -> per-group
# merge (applyInPandas over sketch rows). Estimates depend on the
# partition layout (compaction order), so correctness is verified the
# q_agg_kmv way: in-plan rank-error-bound booleans against an exact
# twin, not value equality.

_KLL_C = 2.0 / 3.0


def _kll_caps(n_levels: int, k: int) -> list[int]:
    return [max(int(-(-k * (_KLL_C ** (n_levels - 1 - i)) // 1)), 2)
            for i in range(n_levels)]


def _kll_insert(state, x: float, k: int) -> None:
    state["levels"][0].append(x)
    state["n"] += 1
    _kll_compress(state, k)


def _kll_compress(state, k: int) -> None:
    levels, counters = state["levels"], state["counters"]
    while True:
        caps = _kll_caps(len(levels), k)
        for i, lvl in enumerate(levels):
            if len(lvl) > caps[i]:
                lvl.sort()
                off = counters[i] & 1      # deterministic alternating
                counters[i] += 1           # offset (classic KLL detail)
                promoted = lvl[off::2]
                levels[i] = []
                if i + 1 == len(levels):
                    levels.append([])
                    counters.append(0)
                levels[i + 1].extend(promoted)
                break
        else:
            return


def _kll_merge_states(a, b, k: int):
    while len(a["levels"]) < len(b["levels"]):
        a["levels"].append([])
        a["counters"].append(0)
    for i, lvl in enumerate(b["levels"]):
        a["levels"][i].extend(lvl)
        if i < len(a["counters"]) and i < len(b["counters"]):
            a["counters"][i] += b["counters"][i]
    a["n"] += b["n"]
    _kll_compress(a, k)
    return a


def _kll_rank_items(state):
    """All (value, weight) pairs sorted by value."""
    out = []
    for i, lvl in enumerate(state["levels"]):
        w = 1 << i
        out.extend((v, w) for v in lvl)
    out.sort()
    return out


def _kll_quantile(state, p: float) -> float:
    items = _kll_rank_items(state)
    if not items:
        return float("nan")
    target = p * state["n"]
    cum = 0
    for v, w in items:
        cum += w
        if cum >= target:
            return v
    return items[-1][0]


def kll_sketch(df: DataFrame, group_cols: list[str], value_col: str,
               k: int = 200) -> DataFrame:
    """Distributed KLL build: per-partition compactor stacks
    (mapInPandas — zero shuffle over the data), then ONE shuffle of
    the compactor state per (partition, group) and a per-group
    applyInPandas merge. Returns
    (group_cols…, levels: array<array<double>>, counters: array<long>,
    n_rows: long)."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    src = df.select(*group_cols, F.col(value_col).cast("double")
                    .alias("_v"))
    gfields = [src.schema[c] for c in group_cols]
    sk_schema = StructType(list(gfields) + [
        StructField("levels", ArrayType(ArrayType(DoubleType()))),
        StructField("counters", ArrayType(LongType())),
        StructField("n_rows", LongType()),
    ])

    def build(batches):
        states = {}
        for pdf in batches:
            # BULK feed per group: extend level 0 with the whole Arrow
            # batch's values and compress once — compaction points
            # differ from row-at-a-time insertion (both are valid KLL
            # executions; estimates are bound-verified, not
            # value-pinned), and the Python cost drops from one call
            # per ROW to one pandas groupby per batch.
            for key, vals in pdf.groupby(group_cols, sort=False)["_v"]:
                if not isinstance(key, tuple):
                    key = (key,)
                st = states.get(key)
                if st is None:
                    st = {"levels": [[]], "counters": [0], "n": 0}
                    states[key] = st
                st["levels"][0].extend(
                    vals.to_numpy(dtype=float).tolist())
                st["n"] += len(vals)
                _kll_compress(st, k)
        rows = [(*key, st["levels"], st["counters"], st["n"])
                for key, st in states.items()]
        yield pd.DataFrame(rows, columns=[f.name for f in sk_schema.fields])

    partial = src.mapInPandas(build, schema=sk_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for row in pdf.itertuples(index=False):
            st = {"levels": [list(l) for l in row.levels],
                  "counters": list(row.counters), "n": int(row.n_rows)}
            acc = st if acc is None else _kll_merge_states(acc, st, k)
        key = tuple(pdf.iloc[0][c] for c in group_cols)
        return pd.DataFrame(
            [(*key, acc["levels"], acc["counters"], acc["n"])],
            columns=[f.name for f in sk_schema.fields])

    return partial.groupBy(*group_cols).applyInPandas(merge,
                                                      schema=sk_schema)


def kll_quantiles(sketches: DataFrame, probs: list[float]) -> DataFrame:
    """Estimate quantiles from KLL sketch rows: one ``q{p}`` column
    per probability (weighted nearest-rank over the compactor items —
    always an observed value). Arrow-batched; each row's work is
    O(k log k)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def q_at(p: float):
        @pandas_udf(DoubleType())
        def _q(levels: pd.Series, n: pd.Series) -> pd.Series:
            out = []
            for lv, nn in zip(levels, n):
                st = {"levels": [list(x) for x in lv], "n": int(nn)}
                out.append(_kll_quantile(st, p))
            return pd.Series(out)
        return _q

    out = sketches
    for p in probs:
        out = out.withColumn(f"q{int(p * 100)}",
                             q_at(p)(F.col("levels"), F.col("n_rows")))
    return out.drop("levels", "counters")


# ---------------------------------------------------------------------------
# t-digest (Dunning & Ertl, "Computing extremely accurate quantiles
# using t-digests", 2019 — public algorithm)
# ---------------------------------------------------------------------------
#
# KLL bounds UNIFORM rank error (eps*n everywhere); the t-digest's k1
# scale function bounds RELATIVE rank error — centroids near the median
# may hold many points while the tails stay near-singleton, which is
# what makes p99/p999 estimates sharp at any n. Same distributed shape
# as KLL: per-partition merging-digest build (mapInPandas, zero data
# shuffle), ONE shuffle of centroid state (≤ ~2δ (mean, weight) pairs
# per group, never rows), per-group applyInPandas merge. Estimates
# depend on partition layout (merge order), so correctness is verified
# the q_agg_kll way: in-plan rank-bound booleans against exact twins.

_TD_DELTA = 100.0


def _td_k(q: float, delta: float) -> float:
    """k1 scale function: δ/2π · asin(2q−1). Its derivative → ∞ at the
    tails, forcing tail centroids to stay tiny."""
    import math
    return delta / (2.0 * math.pi) * math.asin(
        max(-1.0, min(1.0, 2.0 * q - 1.0)))


def _td_compress(means: list, weights: list, delta: float):
    """One merging pass over mean-sorted centroids: greedily absorb the
    next centroid while the merged span stays within one k-unit. Input
    MUST be sorted by mean; output is sorted, weight-conserving, with
    at most ~2δ centroids."""
    n = float(sum(weights))
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = means[0], weights[0]
    cum = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q0 = cum / n
        q2 = (cum + cur_w + w) / n
        if _td_k(q2, delta) - _td_k(q0, delta) <= 1.0:
            cur_w += w
            cur_m += (m - cur_m) * (w / cur_w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            cum += cur_w
            cur_m, cur_w = m, w
    out_m.append(cur_m)
    out_w.append(cur_w)
    return out_m, out_w


def _td_from_values(vals, delta: float):
    """Digest a batch of raw (unit-weight) values. r14 (guide §4.2):
    the generic ``_td_compress`` loop walked every VALUE in Python
    with two asin calls per step — the dominant cost of the whole
    sketch build pass. For unit weights the greedy boundaries have a
    closed form: a centroid starting at sorted position c0 absorbs
    through the largest e with k(e/n) − k(c0/n) <= 1, so the scan is
    O(centroids · log n) numpy searchsorted steps over a precomputed
    k-grid instead of O(n) Python iterations; segment means come from
    one reduceat. Same greedy segmentation (up to asin ulp at an
    exact-1.0 boundary); estimates remain bound-verified, never
    value-pinned (the module's contract). Weight conservation exact:
    integer counts."""
    import numpy as np

    v = np.sort(np.asarray(vals, dtype=np.float64))
    n = len(v)
    if n == 0:
        return [], []
    q = np.arange(n + 1, dtype=np.float64) / n
    kgrid = delta / (2.0 * np.pi) * np.arcsin(
        np.clip(2.0 * q - 1.0, -1.0, 1.0))
    bounds = [0]
    c0 = 0
    while c0 < n:
        e = int(np.searchsorted(kgrid, kgrid[c0] + 1.0,
                                side="right")) - 1
        e = min(max(e, c0 + 1), n)
        bounds.append(e)
        c0 = e
    starts = np.asarray(bounds[:-1])
    counts = np.diff(np.asarray(bounds))
    means = np.add.reduceat(v, starts) / counts
    return means.tolist(), counts.astype(np.float64).tolist()


def _td_merge(ma, wa, mb, wb, delta: float):
    """Merge two digests: concatenate, re-sort by mean, one compress
    pass — associative up to the (bound-verified) estimate tolerance."""
    pairs = sorted(zip(list(ma) + list(mb), list(wa) + list(wb)))
    return _td_compress([p[0] for p in pairs], [p[1] for p in pairs], delta)


def _td_quantile(means, weights, p: float) -> float:
    """Piecewise-linear interpolation between centroid midpoints (the
    standard t-digest estimator); clamps to the extreme means."""
    if not len(means):
        return float("nan")
    n = float(sum(weights))
    target = p * n
    cum = 0.0
    prev_mid, prev_mean = None, None
    for m, w in zip(means, weights):
        mid = cum + w / 2.0
        if mid >= target:
            if prev_mid is None:
                return float(m)
            frac = (target - prev_mid) / (mid - prev_mid)
            return float(prev_mean + (m - prev_mean) * frac)
        cum += w
        prev_mid, prev_mean = mid, m
    return float(means[-1])


def tdigest_sketch(df: DataFrame, group_cols: list[str], value_col: str,
                   delta: float = _TD_DELTA) -> DataFrame:
    """Distributed t-digest build. Returns
    (group_cols…, means: array<double>, weights: array<double>,
    n_rows: long) — mergeable, storable, ≤ ~2δ centroids per group.

    NULL values are dropped before the build (standard SQL aggregate
    semantics) — without the filter a single NULL becomes NaN, sorts
    last, merges into the top centroid and silently poisons every
    upper-quantile estimate."""
    from pyspark.sql.types import (
        ArrayType, DoubleType, LongType, StructField, StructType,
    )

    src = (df.filter(F.col(value_col).isNotNull())
           .select(*group_cols, F.col(value_col).cast("double")
                   .alias("_v")))
    gfields = [src.schema[c] for c in group_cols]
    sk_schema = StructType(list(gfields) + [
        StructField("means", ArrayType(DoubleType())),
        StructField("weights", ArrayType(DoubleType())),
        StructField("n_rows", LongType()),
    ])

    def build(batches):
        states: dict = {}
        for pdf in batches:
            for key, vals in pdf.groupby(group_cols, sort=False)["_v"]:
                if not isinstance(key, tuple):
                    key = (key,)
                m, w = _td_from_values(vals.to_numpy(dtype=float), delta)
                st = states.get(key)
                if st is None:
                    states[key] = (m, w, len(vals))
                else:
                    mm, ww = _td_merge(st[0], st[1], m, w, delta)
                    states[key] = (mm, ww, st[2] + len(vals))
        rows = [(*key, m, w, n) for key, (m, w, n) in states.items()]
        yield pd.DataFrame(rows, columns=[f.name for f in sk_schema.fields])

    partial = src.mapInPandas(build, schema=sk_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        acc_m, acc_w, acc_n = None, None, 0
        for row in pdf.itertuples(index=False):
            if acc_m is None:
                acc_m, acc_w = list(row.means), list(row.weights)
            else:
                acc_m, acc_w = _td_merge(acc_m, acc_w, row.means,
                                         row.weights, delta)
            acc_n += int(row.n_rows)
        key = tuple(pdf.iloc[0][c] for c in group_cols)
        return pd.DataFrame([(*key, acc_m, acc_w, acc_n)],
                            columns=[f.name for f in sk_schema.fields])

    return partial.groupBy(*group_cols).applyInPandas(merge,
                                                      schema=sk_schema)


def tdigest_quantiles(sketches: DataFrame, probs: list[float]) -> DataFrame:
    """Estimate quantiles from t-digest rows: one ``q{...}`` column per
    probability (midpoint interpolation). Arrow-batched; each row's
    work is O(centroids)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def q_at(p: float):
        @pandas_udf(DoubleType())
        def _q(means: pd.Series, weights: pd.Series) -> pd.Series:
            return pd.Series([
                _td_quantile(list(m), list(w), p)
                for m, w in zip(means, weights)])
        return _q

    out = sketches
    for p in probs:
        col = f"q{p}".replace("0.", "").replace(".", "_")
        out = out.withColumn(col, q_at(p)(F.col("means"),
                                          F.col("weights")))
    return out.drop("means", "weights")


# ---------------------------------------------------------------------------
# Misra-Gries heavy-hitter summary (mergeable, Agarwal et al. 2013)
# ---------------------------------------------------------------------------
#
# The frequency sibling of the quantile sketches above: a capacity-k
# counter table whose merge is "add counters itemwise, subtract the
# (k+1)-th largest count, drop non-positive" — associative enough to
# run as per-partition summaries + one state-grain shuffle, with the
# classic deterministic guarantees (no RNG, no hashing error):
#   * every stored count UNDERestimates by at most err_bound,
#   * err_bound ≤ n_rows/(k+1) cumulatively,
#   * any item with true frequency > err_bound is PRESENT in the
#     summary (it cannot have been decremented to zero).
# Unlike the exact q_heavy_hitters groupBy (shuffle = |vocab|), the
# shuffle here is ≤ partitions·k counters per group — the posture for
# n-gram/URL-grain keys whose vocabulary no longer fits a shuffle.


def _mg_reduce(counts: dict, k: int) -> tuple[dict, int]:
    """Truncate a counter table to capacity k: subtract the (k+1)-th
    largest count from everything, drop non-positive. Returns the
    reduced table and the subtracted offset (the step's added
    undercount)."""
    if len(counts) <= k:
        return counts, 0
    d = sorted(counts.values(), reverse=True)[k]
    return {i: c - d for i, c in counts.items() if c > d}, d


def mg_sketch(df: DataFrame, group_cols: list[str], value_col: str,
              k: int = 64) -> DataFrame:
    """Distributed Misra-Gries build: per-partition counter tables
    (mapInPandas — zero shuffle over the data; each Arrow batch folds
    through one pandas value_counts per group), then ONE shuffle of
    ≤ k counters per (partition, group) and a per-group applyInPandas
    merge. Returns (group_cols…, items: array<string>,
    counts: array<long>, err_bound: long, n_rows: long) with counts
    descending (ties: item asc) — exact (err_bound = 0) whenever a
    group's distinct-item count never exceeded k on any path, which
    makes small groups self-certifying."""
    from pyspark.sql.types import (
        ArrayType, LongType, StringType, StructField, StructType,
    )

    src = df.select(*group_cols, F.col(value_col).cast("string")
                    .alias("_v"))
    gfields = [src.schema[c] for c in group_cols]
    sk_schema = StructType(list(gfields) + [
        StructField("items", ArrayType(StringType())),
        StructField("counts", ArrayType(LongType())),
        StructField("err_bound", LongType()),
        StructField("n_rows", LongType()),
    ])
    cols = [f.name for f in sk_schema.fields]

    def _emit(states):
        rows = []
        for key, st in states.items():
            # NULL items sort after every string on count ties (SQL
            # NULLS LAST flavor) — None is not comparable to str
            ordered = sorted(st["counts"].items(),
                             key=lambda kv: (-kv[1], kv[0] is None,
                                             kv[0] or ""))
            rows.append((*key, [i for i, _ in ordered],
                         [c for _, c in ordered], st["err"], st["n"]))
        return pd.DataFrame(rows, columns=cols)

    def build(batches):
        states = {}
        for pdf in batches:
            # dropna=False everywhere: SQL GROUP BY keeps NULL keys
            # and a NULL value is a countable item — pandas' silent
            # dropna=True default would both lose null-keyed groups
            # and inflate n_rows relative to counted mass, breaking
            # the presence guarantee
            for key, vals in pdf.groupby(group_cols, sort=False,
                                         dropna=False)["_v"]:
                if not isinstance(key, tuple):
                    key = (key,)
                key = tuple(None if pd.isna(x) else x for x in key)
                st = states.setdefault(
                    key, {"counts": {}, "err": 0, "n": 0})
                for item, c in vals.value_counts(dropna=False).items():
                    item = None if pd.isna(item) else item
                    st["counts"][item] = st["counts"].get(item, 0) \
                        + int(c)
                st["n"] += len(vals)
                st["counts"], d = _mg_reduce(st["counts"], k)
                st["err"] += d
        yield _emit(states)

    partial = src.mapInPandas(build, schema=sk_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        counts, err, n = {}, 0, 0
        for row in pdf.itertuples(index=False):
            for item, c in zip(row.items, row.counts):
                counts[item] = counts.get(item, 0) + int(c)
            err += int(row.err_bound)
            n += int(row.n_rows)
        counts, d = _mg_reduce(counts, k)
        key = tuple(pdf.iloc[0][c] for c in group_cols)
        return _emit({key: {"counts": counts, "err": err + d, "n": n}})

    return partial.groupBy(*group_cols).applyInPandas(merge,
                                                      schema=sk_schema)


def mg_topk(sketches: DataFrame, m: int = 10) -> DataFrame:
    """Read the top-``m`` heavy hitters out of mg_sketch rows with
    their deterministic count brackets: the stored count is the LOWER
    bound, stored + err_bound the UPPER. One row per (group, item)."""
    ex = sketches.select(
        *[c for c in sketches.columns
          if c not in ("items", "counts", "err_bound", "n_rows")],
        F.col("err_bound"), F.col("n_rows"),
        F.posexplode(F.arrays_zip("items", "counts"))
        .alias("_rk", "_ic"))
    return (ex.filter(F.col("_rk") < m)
            .select(*[c for c in ex.columns
                      if c not in ("_rk", "_ic")],
                    F.col("_ic.items").alias("item"),
                    F.col("_ic.counts").alias("count_lo"),
                    (F.col("_ic.counts") + F.col("err_bound"))
                    .alias("count_hi")))

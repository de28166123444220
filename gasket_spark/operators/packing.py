"""Document packing: assign documents to fixed-token-budget shards.

The training-data step after dedup/filtering: pack the corpus into
shards of ~``target_tokens`` each (sequence-packing at the file level).
Shard id is ``floor(prefix_sum_before_doc / target)`` over a
deterministic document order — simple, reproducible, and what the SQL
oracle can state in one window expression.

The implementation point is the PREFIX SUM. The naive form — a window
over a global ORDER BY with no PARTITION BY — makes Spark shuffle the
entire corpus into ONE task; correct at test scale, dead at 100 TB.
:func:`pack_shards` computes the same numbers with the classic
distributed two-phase pattern instead:

1. range-partition by the order key (`repartitionByRange` gives
   ascending, non-overlapping key ranges per partition id);
2. per-partition running sums (parallel windows, partitioned by the
   Spark partition id);
3. per-partition totals — at most one row per partition — cascaded
   into global offsets with one tiny window;
4. global prefix = partition offset + local running sum.

Only step 3 is single-task, over ~thousands of rows, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_row_number(df: DataFrame, order_by: list,
                      out_col: str = "rn") -> DataFrame:
    """Distributed global ``row_number()`` (1-based) over ``order_by``
    WITHOUT a single-partition window — the same two-phase prefix-sum
    shape as :func:`pack_shards`: range-partition by the sort key
    (ascending partition ids follow the key order), a parallel local
    row_number per partition, then a broadcast cascade of per-partition
    counts (one tiny window over ≤ #partitions rows). Total order must
    be unique for a deterministic result (callers pass a tie-breaking
    column)."""
    parts = df.repartitionByRange(*order_by) \
        .withColumn("_pid", F.spark_partition_id())
    w_local = Window.partitionBy("_pid").orderBy(*order_by)
    local = parts.withColumn("_lrn", F.row_number().over(w_local))
    w_off = (Window.orderBy(F.col("_pid").asc())
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (
        local.groupBy("_pid").agg(F.max("_lrn").alias("_pcnt"))
        .withColumn("_off",
                    F.coalesce(F.sum("_pcnt").over(w_off), F.lit(0)))
        .select("_pid", "_off")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col,
                    (F.col("_off") + F.col("_lrn")).cast("bigint"))
        .drop("_pid", "_lrn", "_off")
    )


def pack_shards(df: DataFrame, token_col: str, id_col: str,
                target_tokens: int, n_partitions: int | None = None
                ) -> DataFrame:
    """Assign each row a ``shard_id`` so consecutive docs (by
    ``id_col``) fill ~``target_tokens`` per shard. Returns the input
    columns plus (cum_before, shard_id). Deterministic for a given
    (corpus, target)."""
    parts = df.repartitionByRange(
        *( [n_partitions] if n_partitions else [] ), F.col(id_col))
    parts = parts.withColumn("_pid", F.spark_partition_id())

    w_local = (Window.partitionBy("_pid").orderBy(F.col(id_col).asc())
               .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = parts.withColumn(
        "_local_cum", F.sum(token_col).over(w_local))

    # one row per partition; the cascade window is over this tiny set
    w_off = (Window.orderBy(F.col("_pid").asc())
             .rowsBetween(Window.unboundedPreceding, -1))
    offsets = (
        local.groupBy("_pid").agg(F.max("_local_cum").alias("_ptotal"))
        .withColumn("_offset",
                    F.coalesce(F.sum("_ptotal").over(w_off), F.lit(0)))
        .select("_pid", "_offset")
    )

    out = (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn("cum_before",
                    (F.col("_offset") + F.col("_local_cum")
                     - F.col(token_col)).cast("bigint"))
        .withColumn("shard_id",
                    F.floor(F.col("cum_before") / F.lit(target_tokens)))
        .drop("_pid", "_local_cum", "_offset")
    )
    return out


def pack_sequences(df: DataFrame, token_col: str, id_col: str,
                   seq_len: int) -> DataFrame:
    """Concat-and-chunk SEQUENCE PACKING — the canonical LLM
    pretraining batch step (GPT-style): documents are concatenated in
    a deterministic order (``id_col`` ascending) into one virtual
    token stream, which is cut every ``seq_len`` tokens; a document
    crossing a cut is SPLIT across consecutive sequences. Returns one
    row per (document × overlapped sequence):

    * ``seq_id``      — which fixed-length sequence the span lands in
    * ``doc_offset``  — first token of the span within the document
    * ``seq_offset``  — first token of the span within the sequence
    * ``span_len``    — tokens in the span

    Together the spans tile every sequence exactly (Σ span_len per
    seq_id = seq_len, except the final partial sequence) and cover
    every document losslessly (Σ span_len per doc = its token count)
    — both invariants pytest-pinned.

    Scale shape: the global token offset comes from
    :func:`pack_shards`'s distributed two-phase prefix sum (never a
    single-partition window over the corpus); the span fan-out is a
    per-row integer ``sequence()`` explode (a doc overlaps
    ceil(n/seq_len)+1 sequences at most). Entirely integer
    arithmetic, so the SQL oracle states the identical spans.

    Reference parity: gasket's `pipe` re-frames a stream into
    stage-sized records (reference index.js:1-258); sequence packing
    is that re-framing at token granularity.

    Precondition: ``token_col`` > 0 for every row (zero-token docs
    would be unplaceable — filter them first; the operator refuses
    loudly in-plan rather than silently dropping)."""
    if seq_len < 1:
        raise ValueError(f"seq_len must be >= 1, got {seq_len}")
    packed = pack_shards(df, token_col, id_col,
                         target_tokens=seq_len).drop("shard_id")
    n = F.col(token_col).cast("bigint")
    guard = F.when(
        n > 0, F.col("cum_before").cast("bigint")
    ).otherwise(F.raise_error(F.concat(
        F.lit("pack_sequences: non-positive token count for "),
        F.col(id_col).cast("string"),
        F.lit(" — filter zero-token docs before packing"))))
    # span formulas use SQL `div` (true integer division), not
    # floor(double /): double division is exact only while cumulative
    # token counts stay below 2^53 — `div` matches the oracle's `//`
    # at ANY scale (r13 ADVICE fix)
    staged = packed.withColumn("_start", guard).withColumn("_n", n)
    first = F.expr(f"_start div {seq_len}")
    last = F.expr(f"(_start + _n - 1) div {seq_len}")
    seq, start = F.col("seq_id"), F.col("_start")
    lo = F.greatest(seq * F.lit(seq_len), start)
    hi = F.least((seq + F.lit(1)) * F.lit(seq_len), start + F.col("_n"))
    return (staged
            .withColumn("seq_id", F.explode(F.sequence(first, last)))
            .select(id_col,
                    "seq_id",
                    (lo - start).cast("bigint").alias("doc_offset"),
                    (lo - seq * F.lit(seq_len)).cast("bigint")
                    .alias("seq_offset"),
                    (hi - lo).cast("bigint").alias("span_len")))


def rendezvous_assign(df: DataFrame, key_col: str, n_shards: int,
                      out_col: str = "shard") -> DataFrame:
    """Rendezvous (highest-random-weight) shard assignment: each key
    goes to argmax over shards of md5(key ':' shard) — the
    consistent-hashing scheme whose defining property is MINIMAL
    MOVEMENT: growing n→n+1 shards reassigns only the keys whose new
    shard wins the argmax, i.e. an expected 1/(n+1) of the corpus
    (mod-hashing reshuffles ~all of it). That is what makes periodic
    re-sharding of a 100 TB content-addressed store an incremental
    copy instead of a full rewrite.

    Entirely JVM-side and engine-exact: the per-shard weights are
    md5 hex strings and the argmax is ``array_max`` over
    (weight, shard) structs — lexicographic string order, no floats,
    so the same assignment is derivable in ANSI SQL (a DuckDB oracle
    states the identical argmax). O(n_shards) work per row — the
    inherent HRW cost, fine for shard counts in the hundreds; beyond
    that, jump-consistent hashing is the constant-time alternative
    (needs float iterates, so it trades away the cross-engine
    exactness this repo pins).

    Reference parity: gasket's `fork` fans a stream out to N branches
    (reference index.js:1-258); rendezvous_assign is the stable
    fan-out rule a resumable pipeline needs."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    # NULL keys hash as a sentinel string instead of propagating NULL
    # into every md5 weight: an all-NULL weight array would resolve
    # by Spark-specific NULL-in-struct ordering (engine-dependent,
    # and it would pile every NULL key onto one arbitrary shard
    # silently) — the repo's NULL-guard rule says decide explicitly.
    # Real keys hash under a "k:" prefix the bare sentinel never
    # carries, so the two domains are disjoint BY CONSTRUCTION even
    # for a string key whose value is literally "\\x00null" (the r11
    # ADVICE catch: a cast-only sentinel is collision-free for
    # numeric key types but not for arbitrary strings).
    key = F.coalesce(F.concat(F.lit("k:"), F.col(key_col).cast("string")),
                     F.lit("\x00null"))
    pairs = F.array(*[
        F.struct(
            F.md5(F.concat(key, F.lit(f":{s}"))).alias("w"),
            F.lit(s).alias("shard"))
        for s in range(n_shards)
    ])
    return df.withColumn(out_col,
                         F.array_max(pairs)["shard"].cast("int"))


def shard_fingerprints(df: DataFrame, shard_col: str = "shard_id",
                       content_cols: list | None = None) -> DataFrame:
    """Per-shard content fingerprint: SUM of per-row xxhash64 folded
    to 31 bits (the CDC batch-fingerprint arithmetic,
    streaming/core.py) — order- and partition-INDEPENDENT, so the
    same shard content yields the same fingerprint however Spark
    scheduled the write, and a dropped/duplicated/altered row changes
    it. One two-phase agg at shard grain; nothing wider than
    (n_shards) rows leaves the executors."""
    cols = content_cols or [c for c in df.columns if c != shard_col]
    return (df.groupBy(shard_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.coalesce(
                     F.sum(F.pmod(F.xxhash64(*cols), F.lit(2 ** 31))),
                     F.lit(0)).cast("bigint").alias("fingerprint")))


def write_shards_with_manifest(df: DataFrame, path: str,
                               shard_col: str = "shard_id",
                               content_cols: list | None = None) -> dict:
    """Write the packed corpus as shard-partitioned parquet PLUS a
    checksummed manifest recording each shard's row count and content
    fingerprint — the reproducibility contract a training run needs:
    "this exact byte set trained the model" becomes verifiable long
    after the write (and corruption/partial-rewrite is detectable
    without re-reading the producer's input). The fingerprints are
    computed AFTER the write, from a read-back of the written path —
    the same scan :func:`verify_shards` performs — so the manifest
    always describes the actual on-disk bytes: fingerprinting ``df``
    in a separate pre-write action would re-execute the plan for the
    write, and any upstream nondeterminism (sample, shuffle-order-
    dependent ids, now()) would certify content that was never
    written (r9 advice). The manifest itself is md5-enveloped so a
    truncated/hand-edited manifest fails loudly rather than
    vacuously verifying."""
    import hashlib
    import json
    import os

    cols = content_cols or [c for c in df.columns if c != shard_col]
    df.write.mode("overwrite").partitionBy(shard_col).parquet(path)
    spark = df.sparkSession
    fps = {int(r[shard_col]): (r["n_rows"], r["fingerprint"])
           for r in shard_fingerprints(
               spark.read.parquet(path), shard_col, cols).collect()}
    shards = {str(k): {"n_rows": int(n), "fingerprint": int(f)}
              for k, (n, f) in sorted(fps.items())}
    body = {"schema_version": 1, "shard_col": shard_col,
            "content_cols": list(cols), "shards": shards}
    blob = json.dumps(body, sort_keys=True)
    manifest = dict(body)
    manifest["checksum"] = hashlib.md5(blob.encode()).hexdigest()
    with open(os.path.join(path, "_shard_manifest.json"), "w") as fh:
        json.dump(manifest, fh, sort_keys=True)
    return manifest


def verify_shards(spark, path: str) -> list:
    """Recompute every shard's fingerprint from the FILES and compare
    to the manifest. Returns the list of shard ids whose content
    diverged (missing shards count too); raises on a missing,
    truncated, or tampered manifest — an audit that cannot tell you
    anything must say so, not pass. Cost: one column-pruned scan +
    one shard-grain agg — runnable as a routine post-ingest check at
    any scale."""
    import hashlib
    import json
    import os

    mp = os.path.join(path, "_shard_manifest.json")
    try:
        with open(mp) as fh:
            manifest = json.load(fh)
    except (OSError, ValueError) as exc:
        raise ValueError(f"shard manifest unreadable at {mp}") from exc
    body = {k: v for k, v in manifest.items() if k != "checksum"}
    blob = json.dumps(body, sort_keys=True)
    if hashlib.md5(blob.encode()).hexdigest() != manifest.get("checksum"):
        raise ValueError(f"shard manifest checksum mismatch at {mp}")
    shard_col = manifest["shard_col"]
    cols = manifest["content_cols"]
    got = {int(r[shard_col]): (r["n_rows"], r["fingerprint"])
           for r in shard_fingerprints(
               spark.read.parquet(path), shard_col, cols).collect()}
    bad = []
    for k, want in manifest["shards"].items():
        have = got.get(int(k))
        if (have is None or have[0] != want["n_rows"]
                or have[1] != want["fingerprint"]):
            bad.append(int(k))
    for k in got:
        if str(k) not in manifest["shards"]:
            bad.append(k)  # extra shard not in the manifest
    return sorted(bad)

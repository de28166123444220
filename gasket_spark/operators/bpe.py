"""Distributed BPE tokenizer training — the merge-table build.

Byte-pair encoding's training loop (count adjacent symbol pairs →
take the most frequent → merge it everywhere → repeat) re-expressed
as DataFrame rounds over the DISTINCT-WORD table, the shape that
makes it 100 TB-viable:

* the corpus is scanned ONCE into (word, freq) — everything after
  runs at vocabulary grain, orders of magnitude smaller than the
  corpus, with every pair count weighted by the word frequency
  (identical statistics to scanning raw text);
* each round's pair counting is one explode + two-phase aggregate;
  the winning pair is a bounded 1-row driver scalar (the
  q_graph_bfs root precedent);
* the merge APPLIES as plain string ``replace`` on a space-padded
  symbol encoding (" l o w " — symbols never contain spaces, so
  " l o " can only match a real symbol boundary): entirely JVM-side,
  no Python in the loop, and restatable verbatim in ANSI SQL — the
  property that makes the whole training run oracle-checkable.

Replace-vs-greedy subtlety (worth its paragraph): a single
left-to-right non-overlapping ``replace`` pass can MISS occurrences
whose leading space was consumed by the previous match (" x y x y "
merges only the first pair), so each round applies ``passes``
replace passes and then ASSERTS the pattern is gone — if any
residual occurrence survives, the build raises loudly rather than
silently leaving a round half-applied (the lsh_bucket domain-guard
posture). The fixpoint these passes reach is the operator's DEFINED
merge semantics: it is maximal (no adjacent pair remains), lossless,
and equals the classic list-greedy scan except within same-pair runs
of >= 5 symbols, where the grouping differs (" x x x x x " ->
[xx, x, xx] vs greedy [xx, xx, x] — a real divergence the
hypothesis property in tests/test_properties.py discovered and now
pins). All three engines (Spark, DuckDB, Python) share the replace
semantics, so training, encoding, and the SQL oracles agree
bit-for-bit BY CONSTRUCTION; only bit-parity with list-greedy
tokenizers (e.g. HF BPE) is scoped out on long runs. Determinism:
the winning pair breaks count ties on the pair string ascending.

Reference parity: gasket pipelines stage user transforms over a
stream (reference index.js:1-258); tokenizer training is the
canonical corpus-preprocessing stage, here one declarative loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _padded_symbols(word_col: str) -> F.Column:
    """' c h a r s ' — initial character symbols, space-padded."""
    return F.concat(F.lit(" "),
                    F.concat_ws(" ", F.split(F.col(word_col), "")),
                    F.lit(" "))


def bpe_merge_table(df: DataFrame, text_col: str = "text",
                    n_merges: int = 8, passes: int = 4) -> list[tuple]:
    """Learn ``n_merges`` BPE merges from the corpus. Returns the
    merge table as a list of (rank, left, right, pair_count) —
    driver-side because it IS a driver artifact (the tokenizer file a
    training run ships; n_merges rows, bounded by construction).

    ``passes`` bounds the per-round replace fixpoint (exact for
    same-pair runs up to 2^passes symbols; guarded loudly beyond).

    Job shape (r14 optimization round): the loop runs at VOCABULARY
    grain — tiny next to the corpus (31 rows at the sf0.1 fixture) —
    so its cost is per-JOB overhead, not data. Three levers vs the
    r13 form (3 jobs/round × 32 tasks each over localCheckpoints):

    * the word state lives in lazy ``persist``s; each round's
      residual check is the SAME job that fills the new state's
      cache (one pass does both), so a round costs 2 jobs (argmax +
      residual/materialize), not 3 (argmax + checkpoint + residual);
    * the state is ``coalesce``d to a partition count derived from
      the TRUE vocabulary size (one row per ~50k words, clamped to
      4×parallelism — the graph-loop _loop_partitions posture:
      partitioning from data, never the shuffle constant), so the
      sf0.1 loop runs 1-task jobs instead of 32-task ones while a
      100 TB vocabulary keeps its fan-out (coalesce never grows);
    * the previous round's cache is unpersisted only AFTER the next
      state materializes, so no round recomputes the chain.

    Same rounds, same argmax, same fixpoint guard — bit-identical
    merges (the cross-engine and property tests pin them)."""
    spark = df.sparkSession
    base = (df.select(F.explode(F.split(F.col(text_col), " ")).alias("w"))
            .filter(F.col("w") != "")
            .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
            .select(F.col("freq"), _padded_symbols("w").alias("sym"))
            .persist())
    n_words = base.count()
    cap = spark.sparkContext.defaultParallelism * 4
    n_parts = max(1, min(-(-n_words // 50_000), cap))
    words = base.coalesce(n_parts).persist()
    base_live = True
    merges: list[tuple] = []
    for rank in range(n_merges):
        syms = F.split(F.trim(F.col("sym")), " ")
        pair_idx = F.when(F.size(syms) >= 2,
                          F.sequence(F.lit(1), F.size(syms) - 1)) \
            .otherwise(F.array().cast("array<int>"))
        pairs = words.select(
            "freq",
            F.explode(F.transform(
                pair_idx,
                lambda i: F.concat(F.element_at(syms, i), F.lit(" "),
                                   F.element_at(syms, i + 1))))
            .alias("pair"))
        best = (pairs.groupBy("pair")
                .agg(F.sum("freq").alias("n"))
                .orderBy(F.col("n").desc(), F.col("pair").asc())
                .limit(1).collect())
        # the argmax job just materialized `words` — the corpus-grain
        # base feed is no longer needed after round 0
        if base_live:
            base.unpersist(False)
            base_live = False
        if not best:
            break
        pair, n = best[0].pair, int(best[0].n)
        left, right = pair.split(" ")
        merges.append((rank, left, right, n))
        pat = F.lit(f" {left} {right} ")
        rep = F.lit(f" {left}{right} ")
        col = F.col("sym")
        for _ in range(passes):
            col = F.replace(col, pat, rep)
        nxt = words.select("freq", col.alias("sym")).persist()
        # ONE job: scans every advanced row (filling nxt's cache from
        # the cached `words`) while checking the replace fixpoint
        residual = nxt.filter(
            F.contains("sym", pat)).limit(1).count()
        if residual:
            nxt.unpersist(False)
            words.unpersist(False)
            raise ValueError(
                f"bpe_merge_table: pattern {pair!r} survives {passes} "
                "replace passes — raise `passes` so the round reaches "
                "its replace fixpoint (the operator's defined merge "
                "semantics) instead of leaving the merge half-applied")
        # nxt's cache is full (the residual job scanned every row) —
        # the previous state can go now
        words.unpersist(False)
        words = nxt
    if base_live:
        base.unpersist(False)
    words.unpersist(False)
    return merges


def bpe_merges_df(df: DataFrame, text_col: str = "text",
                  n_merges: int = 8, passes: int = 4) -> DataFrame:
    """DataFrame form of :func:`bpe_merge_table` — (merge_rank, left,
    right, pair_count), the shape a ``queries()`` registration and
    its SQL oracle compare."""
    rows = bpe_merge_table(df, text_col, n_merges, passes)
    spark = df.sparkSession
    return spark.createDataFrame(
        rows or [], "merge_rank int, left string, right string, "
                    "pair_count bigint")


def bpe_encode(df: DataFrame, merges: list[tuple],
               text_col: str = "text", id_col: str = "doc_id",
               passes: int = 4, check_residual: bool = True) -> DataFrame:
    """Apply a learned merge table — the ENCODE half of the
    tokenizer: every word re-tokenizes by replaying the merges in
    rank order (the exact BPE inference rule), entirely as chained
    JVM ``replace`` expressions over the padded symbol encoding, so
    a 100 TB corpus tokenizes in ONE narrow map-side pass (no
    Python, no shuffle — the merge table is a driver-side literal
    chain, exactly how a broadcast tokenizer behaves) and the result
    is restatable in ANSI SQL. Returns (id_col, tokens array<string>,
    n_tokens) at document grain; token count is the pack/packing
    currency (q_pack_shards).

    Same fixpoint guard as training, and it must be INDEPENDENT of
    it: the trainer certified ``passes`` only for the corpus it
    trained on, while encode routinely runs a stored merge table
    over UNSEEN documents whose same-pair runs may exceed 2^passes
    (the r11 ADVICE catch — encode used to trust the caller and
    silently leave such a merge half-applied). ``check_residual``
    (default) therefore guards each merge IN-PLAN: a row whose
    padded stream still contains the merge pattern after the replace
    chain raises loudly at execution (per-row ``when``/
    ``raise_error`` — no extra action, no shuffle, negligible JVM
    cost). The check sits right after each merge's passes, mirroring
    the trainer's per-round residual check, because a later merge
    can legitimately RE-CREATE an earlier pair (" l x y r " with
    merge (x,y) and xy == nothing — adjacency (l, r) never forms,
    but a fused symbol equal to an earlier pattern's left/right can;
    the operator's defined rank-order semantics leaves such re-formed
    pairs unmerged, exactly as the trainer's own stream would).

    Expression-shape note (the r13 optimization round's catch): the
    guard must reference the accumulated stream through a LET binding,
    not directly. ``when(~contains(col, pat), col)`` names ``col``
    twice, and Catalyst expressions are trees, not DAGs — with the
    guard value inside a conditional branch, subexpression elimination
    does not fire, so eight guarded merge layers nested to ~2^8 copies
    of the replace chain and the encode evaluated EXPONENTIALLY in the
    merge count (measured 120 s for the sf0.1 noop-sink pass vs ~1 s
    once let-bound). ``transform(array(col), s -> guard(s))`` binds the
    evaluated value to a lambda variable: each stage is computed once,
    the guard references only the variable, and the whole chain is
    linear again — same values, same in-plan raise, still
    zero-exchange map-side JVM."""
    col = _padded_symbols_text(text_col)
    for _rank, left, right, _n in merges:
        pat, rep = F.lit(f" {left} {right} "), F.lit(f" {left}{right} ")
        for _ in range(passes):
            col = F.replace(col, pat, rep)
        if check_residual:
            err = F.concat(F.lit(
                f"bpe_encode: pattern {left!r}+{right!r} survives "
                f"{passes} replace passes on "), F.col(id_col).cast(
                    "string"), F.lit(
                " — raise `passes` so every merge reaches its replace "
                "fixpoint (the operator's defined semantics) instead "
                "of silently half-applying a stored merge table to an "
                "unseen corpus"))
            col = F.get(F.transform(
                F.array(col),
                lambda s: F.when(~F.contains(s, pat), s)
                .otherwise(F.raise_error(err))), 0)
    toks = F.split(F.trim(col), " +")
    return df.select(
        F.col(id_col).alias(id_col),
        toks.alias("tokens"),
        F.size(toks).cast("bigint").alias("n_tokens"))


def bpe_train_oracle_sql(n_merges: int, passes: int = 4,
                         table: str = "corpus",
                         text_col: str = "text") -> str:
    """Unrolled ANSI-SQL twin of :func:`bpe_merge_table` (DuckDB
    dialect) — one CTE chain per round: pair counts from the previous
    word state, the 1-row argmax (count desc, pair asc), and the word
    state advanced by ``passes`` nested replaces of ``' l r '`` with
    ``' lr '``. The q_bpe_train oracle; also the pinned cross-engine
    twin in tests/test_cross_engine.py (single shared builder so the
    test and the registration can never drift)."""
    parts = [f"""
    WITH words AS (
      SELECT w, COUNT(*) AS freq FROM (
        SELECT unnest(string_split({text_col}, ' ')) AS w FROM {table})
      WHERE w <> '' GROUP BY w),
    w0 AS (
      SELECT freq, ' ' || array_to_string(string_split_regex(w, ''), ' ')
             || ' ' AS sym
      FROM words)"""]
    for r in range(1, n_merges + 1):
        rep = "sym"
        for _ in range(passes):
            rep = (f"replace({rep}, ' ' || pair || ' ', "
                   f"' ' || replace(pair, ' ', '') || ' ')")
        parts.append(f""",
    p{r} AS (
      SELECT freq, unnest(list_transform(
        range(1, greatest(len(sy) - 1, 0) + 1),
        i -> sy[i] || ' ' || sy[i + 1])) AS pair
      FROM (SELECT freq, string_split(trim(sym), ' ') AS sy
            FROM w{r - 1})),
    b{r} AS (
      SELECT pair, CAST(SUM(freq) AS BIGINT) AS n FROM p{r}
      GROUP BY pair ORDER BY n DESC, pair LIMIT 1),
    w{r} AS (
      SELECT freq, {rep} AS sym FROM w{r - 1} CROSS JOIN b{r})""")
    unions = " UNION ALL ".join(
        f"""SELECT {r - 1} AS merge_rank,
               split_part(pair, ' ', 1) AS left_sym,
               split_part(pair, ' ', 2) AS right_sym, n AS pair_count
            FROM b{r}""" for r in range(1, n_merges + 1))
    parts.append(f" SELECT * FROM ({unions})")
    return "".join(parts)


def bpe_encode_oracle_sql(n_merges: int, passes: int = 4,
                          table: str = "corpus",
                          doc_table: str | None = None,
                          text_col: str = "text",
                          id_col: str = "doc_id") -> str:
    """ANSI-SQL twin of learn-then-encode: the training CTE chain of
    :func:`bpe_train_oracle_sql` (over ``table``) extended with a
    document-grain replay of every learned merge (over ``doc_table``,
    defaulting to the same table) — the q_bpe_tokens oracle shape:
    (id, tokens_str, n_tokens). Tokens flatten to a space-joined
    string per the repo's array-hashing rule (q_agg_collect
    precedent)."""
    doc_table = doc_table or table
    train = bpe_train_oracle_sql(n_merges, passes, table, text_col)
    ctes = train[:train.index(" SELECT * FROM (")]
    # the word separator is a DOUBLE space; stated as ' ' || ' '
    # because the @query registry normalizes oracle SQL with
    # " ".join(sql.split()), which would silently collapse a literal
    # '  ' to ' ' INSIDE the quotes (the r12 q_bpe_tokens catch) —
    # never put runs of >1 space in an oracle string literal
    parts = [ctes, f""",
    d0 AS (
      SELECT {id_col},
             ' ' || array_to_string(list_transform(
               string_split({text_col}, ' '),
               w -> array_to_string(string_split_regex(w, ''), ' ')),
               ' ' || ' ') || ' ' AS sym
      FROM {doc_table})"""]
    for r in range(1, n_merges + 1):
        rep = "sym"
        for _ in range(passes):
            rep = (f"replace({rep}, ' ' || pair || ' ', "
                   f"' ' || replace(pair, ' ', '') || ' ')")
        parts.append(f""",
    d{r} AS (SELECT {id_col}, {rep} AS sym
             FROM d{r - 1} CROSS JOIN b{r})""")
    parts.append(f"""
    SELECT {id_col},
           array_to_string(string_split_regex(trim(sym), ' +'), ' ')
             AS tokens_str,
           CAST(len(string_split_regex(trim(sym), ' +'))
                AS BIGINT) AS n_tokens
    FROM d{n_merges}""")
    return "".join(parts)


def _padded_symbols_text(text_col: str) -> F.Column:
    """Whole-document padded symbol stream: every WORD becomes its
    padded character symbols, words separated by a double space (a
    zero-width symbol boundary no ``" l r "`` pattern can match
    across, since patterns contain single interior spaces and
    symbols are never empty)."""
    word = F.transform(
        F.split(F.col(text_col), " "),
        lambda w: F.concat_ws(" ", F.split(w, "")))
    return F.concat(F.lit(" "), F.concat_ws("  ", word), F.lit(" "))

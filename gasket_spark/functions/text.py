"""Text-analysis column expressions for LLM-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` —
higher-order array functions, regexes, xxhash64 — so the hot path stays
inside whole-stage codegen with zero Python cost per row. These are the
building blocks for dedup/similarity/quality operators in
``gasket_spark.operators``; at 100 TB that difference (codegen vs
Python UDF) is roughly two orders of magnitude of throughput.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, IntegerType, LongType

# A word-ish BPE-flavored pattern: letter runs, digit runs, or single
# non-space symbols (mirrors the common pre-tokenizer shape).
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

PUNCT_RE = r"[.!?,;:]"

# tiny per-language marker inventories for the n-gram/stopword heuristic
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "a", "and", "of", "to"],
    "de": ["der", "die", "das", "und", "ist"],
    "es": ["el", "la", "los", "que", "de"],
    "fr": ["le", "la", "les", "et", "est"],
    "zh": ["的", "是", "了", "在", "我"],
}


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (single-space split — mirrors SQL
    string_split semantics exactly, empties preserved)."""
    return F.split(col, " ")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col)).cast("int")


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish regex tokens (letters / digits / symbols)."""
    return F.regexp_count(F.col(col) if isinstance(col, str) else col,
                          F.lit(BPE_TOKEN_RE)).cast("int")


def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(PUNCT_RE)) / F.greatest(
        F.length(c), F.lit(1))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    toks = tokens(col)
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(markers, t)))
    return n_stop / F.greatest(F.size(toks), F.lit(1))


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: length sweet-spot, low punct
    density, presence of stopwords — the standard cheap pre-filter
    before expensive model scoring. Returns the raw double composite;
    callers that need a cross-engine-hashable value fixed-point it
    (every op here is IEEE-exact: +, *, /, least/greatest — so
    floor(x*1e9 + 0.5) is bit-agreed by construction)."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c) / F.lit(200.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(c) * 5, F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 10, F.lit(1.0))
    return (len_score * 0.5 + stop_score * 0.3
            + (1 - punct_pen) * 0.2)


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language marker-occurrence counts (the n-gram-heuristic
    core of a language identifier)."""
    toks = tokens(col)
    out = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
    return out


def lang_id(col: Column | str) -> Column:
    """argmax over lang_scores; deterministic tie-break = the
    lexicographically larger language code (struct-max semantics).
    No marker hits at all → 'und'."""
    scores = lang_scores(col)
    pairs = F.array(*[
        F.struct(scores[lang].alias("score"), F.lit(lang).alias("lang"))
        for lang in sorted(LANG_MARKERS)
    ])
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Token n-gram shingles (JVM-side: sequence + transform +
    element_at; no explode, no UDF). Documents with fewer than ``n``
    tokens (and NULL text) yield the EMPTY array: ``sequence(1, 0)``
    DESCENDS in Spark (the dedup.py winnow lesson), and under Spark
    4's default ANSI mode the old greatest(...,0) form crashed
    element_at with INVALID_ARRAY_INDEX — the r13 review catch, only
    reachable on corpora with short/empty docs (never the fixture)."""
    toks = tokens(col)
    m = F.size(toks) - (n - 1)
    idx = F.when(m >= 1, F.sequence(F.lit(1), m)) \
        .otherwise(F.array().cast("array<int>"))
    return F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j) for j in range(n)]))


def distinct_shingles(col: Column | str, n: int = 3) -> Column:
    return F.array_distinct(shingles(col, n))


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for hash fn i, min over shingles of
    xxhash64(shingle, i). Empty shingle sets get MAX_LONG sentinels.
    Pure JVM (xxhash64 + array_min under transform).

    NOTE: correct but interpreted (num_hashes × HOF passes per row) —
    the hot path is :func:`minhash_band_hashes`, which hashes each
    shingle once JVM-side and runs the permutation family in numpy."""
    sig = [
        F.coalesce(
            F.array_min(F.transform(
                shingle_col, lambda s, i=i: F.xxhash64(s, F.lit(i)))),
            F.lit(2 ** 63 - 1))
        for i in range(num_hashes)
    ]
    return F.array(*sig)


def lsh_band_hashes(sig_col: Column, bands: int, rows: int) -> Column:
    """Band the signature: bands × rows must equal signature length.
    Docs sharing any band hash are near-dup candidates."""
    return F.array(*[
        F.xxhash64(F.slice(sig_col, b * rows + 1, rows)) for b in range(bands)
    ])


def hashed_shingles(shingle_col: Column) -> Column:
    """xxhash64 each distinct shingle ONCE (single JVM pass) — the
    compact array<long> input to the vectorized MinHash kernel."""
    return F.transform(shingle_col, lambda s: F.xxhash64(s))


_SHINGLE_MIX = np.uint64(0x100000001B3)  # FNV-style odd multiplier


def hashed_shingle_set(col: Column | str, n: int = 3) -> Column:
    """Distinct token-n-gram shingles as 64-bit hashes, without ever
    materializing shingle STRINGS: tokens are xxhash64'd once
    JVM-side, then each window of n token-hashes is folded with an
    order-sensitive uint64 mix and deduplicated — one vectorized pass
    per Arrow batch. 64-bit collisions are ~|shingles|²/2⁶⁴, so
    set ops (Jaccard) over these hashes are exact in practice, at a
    fraction of the memory/shuffle width of string shingles."""
    hashed = F.transform(tokens(col), lambda t: F.xxhash64(t))

    @pandas_udf(ArrayType(LongType()))
    def _sh(tok_hashes: pd.Series) -> pd.Series:
        out = []
        err = np.seterr(over="ignore")
        try:
            for h in tok_hashes:
                if h is None:  # NULL text -> empty shingle set
                    out.append(np.empty(0, dtype=np.int64))
                    continue
                x = np.asarray(h, dtype=np.int64).view(np.uint64)
                m = x.size - n + 1
                if m <= 0:
                    out.append(np.empty(0, dtype=np.int64))
                    continue
                acc = x[:m].copy()
                for j in range(1, n):
                    acc = acc * _SHINGLE_MIX + x[j:m + j]
                out.append(np.unique(acc).view(np.int64))
            return pd.Series(out)
        finally:
            np.seterr(**err)

    # asNondeterministic (r13, guide 4.4): the kernel IS pure, but
    # declaring it non-deterministic stops the optimizer pushing
    # inferred isnotnull/join filters BELOW the projection, which
    # duplicated the Arrow kernel (2 evals per row per join side in
    # the banding/block plans). Planner hint only - values unchanged.
    return _sh.asNondeterministic()(hashed)


def minhash_band_hashes(hashed_col: Column, num_hashes: int = 64,
                        bands: int = 16, seed: int = 42) -> Column:
    """Vectorized MinHash + banding: from per-shingle base hashes,
    apply ``num_hashes`` universal-hash permutations h_i(x) = a_i·x +
    b_i (mod 2^64, a_i odd) and min-reduce, then fold each band of
    rows into one 64-bit band hash — all in one Arrow batch per
    partition. Same asymptotics as the HOF version but ~50× fewer
    interpreted-expression evaluations (one xxhash64 pass instead of
    ``num_hashes``). Deterministic for a fixed seed.
    """
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands "
            f"({bands}) — a truncated rows_per_band would silently "
            "drop hashes then crash in the executor reshape")
    rows_per_band = num_hashes // bands
    rng = np.random.RandomState(seed)
    a = (rng.randint(0, 2 ** 62, num_hashes, dtype=np.uint64) * 2 + 1)
    b = rng.randint(0, 2 ** 62, num_hashes, dtype=np.uint64)
    mix = np.uint64(0x9E3779B97F4A7C15)  # band fold multiplier

    @pandas_udf(ArrayType(LongType()))
    def _bands(hashes: pd.Series) -> pd.Series:
        out = []
        err = np.seterr(over="ignore")  # uint64 wraparound is the point
        try:
            for h in hashes:
                x = (np.empty(0, dtype=np.int64) if h is None
                     else np.asarray(h, dtype=np.int64)).view(np.uint64)
                if x.size == 0:
                    sig = np.full(num_hashes, 2 ** 63 - 1, dtype=np.uint64)
                else:
                    # (n_shingles, num_hashes) permuted then min-reduced
                    sig = (x[:, None] * a[None, :] + b[None, :]).min(axis=0)
                grp = sig.reshape(bands, rows_per_band)
                band = np.zeros(bands, dtype=np.uint64)
                for r in range(rows_per_band):
                    band = band * mix + grp[:, r]
                out.append(band.view(np.int64))
            return pd.Series(out)
        finally:
            np.seterr(**err)

    # asNondeterministic (r13, guide 4.4): the kernel IS pure, but
    # declaring it non-deterministic stops the optimizer pushing
    # inferred isnotnull/join filters BELOW the projection, which
    # duplicated the Arrow kernel (2 evals per row per join side in
    # the banding/block plans). Planner hint only - values unchanged.
    return _bands.asNondeterministic()(hashed_col)


def simhash_from_token_hashes(hashed_col: Column, bits: int = 64) -> Column:
    """Vectorized SimHash from per-token xxhash64 values: unpack each
    hash into ±1 bit contributions and sum — one numpy pass per Arrow
    batch. Bit-identical to :func:`simhash_bits` (same base hash, same
    sign rule) at a fraction of the cost."""
    shifts = np.arange(bits, dtype=np.uint64)

    @pandas_udf(ArrayType(IntegerType()))
    def _simhash(hashes: pd.Series) -> pd.Series:
        out = []
        for h in hashes:
            x = (np.empty(0, dtype=np.int64) if h is None
                 else np.asarray(h, dtype=np.int64)).view(np.uint64)
            if x.size == 0:
                out.append(np.zeros(bits, dtype=np.int32))
                continue
            bits_m = ((x[:, None] >> shifts[None, :]) & np.uint64(1)) \
                .astype(np.int64) * 2 - 1
            out.append((bits_m.sum(axis=0) > 0).astype(np.int32))
        return pd.Series(out)

    # asNondeterministic (r13, guide 4.4): the kernel IS pure, but
    # declaring it non-deterministic stops the optimizer pushing
    # inferred isnotnull/join filters BELOW the projection, which
    # duplicated the Arrow kernel (2 evals per row per join side in
    # the banding/block plans). Planner hint only - values unchanged.
    return _simhash.asNondeterministic()(hashed_col)


def md5_prefix_hash(col: Column, hex_chars: int = 15) -> Column:
    """60-bit md5-prefix hash of a string — an ORACLE-REPLICABLE hash
    family: Spark's ``conv(substr(md5(t),1,15),16,10)`` and DuckDB's
    ``('0x' || substr(md5(t),1,15))::BIGINT`` compute the identical
    value (unlike xxhash64, whose seed/flavor is Spark-specific). 15
    hex chars = 60 bits keeps the value inside a signed long on both
    engines. JVM-side end to end (md5 + conv are codegen
    expressions)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, hex_chars),
                  16, 10).cast("long")


def simhash64(col: Column | str, bits: int = 64,
              token_hash: str = "xxhash64") -> Column:
    """Charikar SimHash packed into ONE 64-bit long.

    Term-frequency weighted: each distinct token's ±1 bit
    contributions are weighted by its in-document count (essential on
    small-vocabulary corpora, where distinct-token SimHash
    degenerates — every doc shares the vocab, so unweighted signatures
    collide en masse). Tokens are hashed once JVM-side; the
    unpack/weight/sum/pack runs vectorized per Arrow batch. Hamming
    distance between two signatures is then pure codegen:
    ``bit_count(a ^ b)``.

    ``token_hash`` picks the base hash family: ``"xxhash64"`` (the
    fast production default) or ``"md5_60"`` (:func:`md5_prefix_hash`
    with ``bits=60`` — bit-replicable in ANSI SQL, which is what lets
    q_dedup_simhash be verified against a DuckDB twin instead of
    rows-only).
    """
    if token_hash == "xxhash64":
        hashed = F.transform(tokens(col), lambda t: F.xxhash64(t))
    elif token_hash == "md5_60":
        if bits > 60:
            raise ValueError("md5_60 provides 60 hash bits; pass bits<=60")
        hashed = F.transform(tokens(col), lambda t: md5_prefix_hash(t))
    else:
        raise ValueError(f"unknown token_hash family: {token_hash!r}")
    shifts = np.arange(bits, dtype=np.uint64)
    weights = (np.uint64(1) << shifts)

    @pandas_udf(LongType())
    def _simhash(hashes: pd.Series) -> pd.Series:
        out = np.zeros(len(hashes), dtype=np.uint64)
        for k, h in enumerate(hashes):
            x = (np.empty(0, dtype=np.int64) if h is None
                 else np.asarray(h, dtype=np.int64)).view(np.uint64)
            if x.size == 0:
                continue
            uniq, cnt = np.unique(x, return_counts=True)
            contrib = (((uniq[:, None] >> shifts[None, :]) & np.uint64(1))
                       .astype(np.int64) * 2 - 1) * cnt[:, None]
            sign_bits = (contrib.sum(axis=0) > 0).astype(np.uint64)
            out[k] = (sign_bits * weights).sum(dtype=np.uint64)
        return pd.Series(out.view(np.int64))

    # asNondeterministic (r13, guide 4.4): the kernel IS pure, but
    # declaring it non-deterministic stops the optimizer pushing
    # inferred isnotnull/join filters BELOW the projection, which
    # duplicated the Arrow kernel (2 evals per row per join side in
    # the banding/block plans). Planner hint only - values unchanged.
    return _simhash.asNondeterministic()(hashed)


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set (near-identical docs with shuffled word order
    collide — the classic Broder-style content key)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def rolling_hash(col: Column | str, base: int = 1_000_003) -> Column:
    """Polynomial rolling hash over the token sequence (order
    *sensitive*, unlike :func:`fingerprint`): h = Σ h·B + xxhash64(t),
    wrapping mod 2⁶⁴. Runs as an Arrow kernel — Spark 4's default
    ANSI mode makes the JVM ``aggregate`` fold throw
    ARITHMETIC_OVERFLOW on the (intended, modular) wrap (the r13
    review catch), while numpy uint64 arithmetic wraps by definition:
    h = Σ hash_i · B^(m−1−i), evaluated vectorized per document with
    wrap-accumulated powers — identical to the left-fold. NULL/empty
    text hashes to 0."""
    hashed = F.transform(tokens(col), lambda t: F.xxhash64(t))
    b = np.uint64(base & 0xFFFFFFFFFFFFFFFF)

    @pandas_udf(LongType())
    def _roll(hs: pd.Series) -> pd.Series:
        out = np.zeros(len(hs), dtype=np.uint64)
        err = np.seterr(over="ignore")  # uint64 wrap is the point
        try:
            for k, h in enumerate(hs):
                if h is None:
                    continue
                x = np.asarray(h, dtype=np.int64).view(np.uint64)
                if x.size == 0:
                    continue
                pows = np.empty(x.size, dtype=np.uint64)
                pows[0] = np.uint64(1)
                for j in range(1, x.size):
                    pows[j] = pows[j - 1] * b
                out[k] = (x * pows[::-1]).sum(dtype=np.uint64)
            return pd.Series(out.view(np.int64))
        finally:
            np.seterr(**err)

    # asNondeterministic (r13, guide 4.4): the kernel IS pure, but
    # declaring it non-deterministic stops the optimizer pushing
    # inferred isnotnull/join filters BELOW the projection, which
    # duplicated the Arrow kernel (2 evals per row per join side in
    # the banding/block plans). Planner hint only - values unchanged.
    return _roll.asNondeterministic()(hashed)

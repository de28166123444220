"""Text-analysis column expressions for LLM-data pipelines.

Everything here is built from JVM-side ``pyspark.sql.functions`` —
higher-order array functions, regexes, xxhash64 — so the hot path stays
inside whole-stage codegen with zero Python cost per row. These are the
building blocks for dedup/similarity/quality operators in
``gasket_spark.operators``; at 100 TB that difference (codegen vs
Python UDF) is roughly two orders of magnitude of throughput.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

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
    before expensive model scoring."""
    c = F.col(col) if isinstance(col, str) else col
    len_score = F.least(F.length(c) / F.lit(200.0), F.lit(1.0))
    punct_pen = F.least(punct_ratio(c) * 5, F.lit(1.0))
    stop_score = F.least(stopword_ratio(c) * 10, F.lit(1.0))
    return F.round((len_score * 0.5 + stop_score * 0.3
                    + (1 - punct_pen) * 0.2), 6)


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
    element_at; no explode, no UDF)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(0)))
    return F.transform(idx, lambda i: F.concat_ws(
        " ", *[F.element_at(toks, i + j) for j in range(n)]))


def distinct_shingles(col: Column | str, n: int = 3) -> Column:
    return F.array_distinct(shingles(col, n))


def minhash_signature(shingle_col: Column, num_hashes: int = 64) -> Column:
    """MinHash signature: for hash fn i, min over shingles of
    xxhash64(shingle, i). Empty shingle sets get MAX_LONG sentinels.
    Pure JVM (xxhash64 + array_min under transform)."""
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


def simhash_bits(col: Column | str, bits: int = 64) -> Column:
    """SimHash bit vector: per token, xxhash64 contributes ±1 to each
    bit position; the sign of each accumulated position is the bit.
    Implemented as one aggregate+zip_with fold — no explode, no UDF."""
    toks = F.array_distinct(tokens(col))
    zero = F.array(*[F.lit(0).cast("long")] * bits)

    def contrib(t: Column) -> Column:
        h = F.xxhash64(t)
        # unrolled: shift amounts must be Python ints (codegen constants)
        return F.array(*[
            F.when(F.shiftright(h, i).bitwiseAND(1) == 1,
                   F.lit(1)).otherwise(F.lit(-1)).cast("long")
            for i in range(bits)
        ])

    acc = F.aggregate(toks, zero, lambda a, t: F.zip_with(
        a, contrib(t), lambda x, y: x + y))
    return F.transform(acc, lambda v: (v > 0).cast("int"))


def hamming_distance(a: Column, b: Column) -> Column:
    return F.size(F.filter(F.zip_with(a, b, lambda x, y: x != y),
                           lambda d: d))


def fingerprint(col: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of the sorted
    distinct token set (near-identical docs with shuffled word order
    collide — the classic Broder-style content key)."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(col)))))


def rolling_hash(col: Column | str, base: int = 1_000_003) -> Column:
    """Polynomial rolling hash over the token sequence (order
    *sensitive*, unlike :func:`fingerprint`): h = Σ h*B + xxhash64(t),
    wrapping in signed-64 space. A left-fold, so the value is
    well-defined and engine-reproducible."""
    return F.aggregate(
        tokens(col), F.lit(0).cast("long"),
        lambda acc, t: acc * base + F.xxhash64(t))

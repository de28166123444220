"""Cross-engine primitive parity: the four arithmetic contracts every
oracle in the registry leans on, pinned Spark-vs-DuckDB directly.

The determinism conventions (NOTES/r8) assert:

1. 0-decimal ``round(x)`` agrees across engines (integer±0.5 ties are
   exactly representable doubles; both round ties away from zero) —
   while N>0 decimal rounding is engine-specific and BANNED.
2. ``round(x*100)`` integer-cents conversion agrees (the money rule).
3. Spark ``div`` and DuckDB ``//`` both truncate toward zero on
   BIGINT, including negatives (the fixed-point ratio rule).
4. ``floor(x·1e9 + 0.5)`` agrees bit-for-bit (the irreducible-double
   recipe: floor is exact on doubles and both engines evaluate the
   identical IEEE expression).

Each contract runs as ONE batched job per engine over an adversarial
vector (exact ties, half-cent boundaries, representation-boundary
doubles, negatives, near-2^53 magnitudes) plus a seeded 4k-value
random sweep — so a Spark or DuckDB upgrade that shifts any of these
fails HERE, with the primitive named, not as an opaque driver hash
red on some downstream query.

HARNESS PITFALL (found writing this test, worth keeping loud): a
double embedded in SQL text via ``repr`` is parsed by DuckDB as a
DECIMAL literal — ``940869.8709691325`` types DECIMAL(16,10) and a
later ``::DOUBLE`` cast yields ...1324, one ULP off the Python
double. The engines were never divergent; the TEXT round-trip was.
Values therefore cross into DuckDB via a registered DataFrame (exact
float64 transfer), exactly how the driver's parquet views do it.
Oracle-authoring rule pinned by ``test_decimal_literal_pitfall``:
never let a comparison rest on a repr-embedded double being
bit-exact in DuckDB. The registry's one literal-embedding oracle
(q_sim_ann's 512 plane constants) embeds INTEGER coordinates since
r10 — small ints render exactly in SQL text, and the whole sign
decision is exact int64 arithmetic, so cross-engine agreement is by
construction rather than by a per-corpus margin. Pinned below —
full per-plane int64 dot equality, not just sign — by
``TestAnnOracleExactness``.
"""

from __future__ import annotations

import math
import random

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


def _adversarial_doubles() -> list[float]:
    vals = []
    # exact .5 ties at integer grain, both signs
    vals += [i + 0.5 for i in range(-12, 12)]
    vals += [-v for v in (0.5, 1.5, 2.5, 1e6 + 0.5)]
    # half-cent boundaries for the *100 rule (x.xx5 is NOT exactly
    # representable — both engines must round the same double)
    vals += [0.125, 0.135, 2.675, -2.675, 1.005, -1.005, 99.995]
    # doubles just below/above a tie after scaling
    vals += [0.1249999999999999, 0.1250000000000001]
    # large magnitudes approaching 2^53 / 100 (exact-integer ceiling)
    vals += [9.007199254740991e13, 9.007199254740991e13 / 100,
             123456789012.345, -123456789012.345]
    # small magnitudes and zero
    vals += [0.0, -0.0, 1e-9, -1e-9, 0.004999999, -0.004999999]
    rng = random.Random(0xC0FFEE)
    vals += [rng.uniform(-1e6, 1e6) for _ in range(4000)]
    vals += [rng.uniform(-1e12, 1e12) for _ in range(200)]
    return vals


@pytest.fixture(scope="module")
def duck():
    return duckdb.connect()


def _duck_eval(duck, vals: list[float], expr: str) -> dict[int, int]:
    """Evaluate ``expr`` (over column x) in DuckDB with EXACT float64
    transfer — registered DataFrame, never SQL text literals (see the
    module docstring's harness pitfall)."""
    pdf = pd.DataFrame({"i": range(len(vals)),
                        "x": pd.Series(vals, dtype="float64")})
    duck.register("tv", pdf)
    try:
        return dict(duck.execute(
            f"SELECT i, {expr} FROM tv").fetchall())
    finally:
        duck.unregister("tv")


class TestCrossEngineArithmetic:
    def test_round_zero_decimals_parity(self, spark, duck):
        vals = _adversarial_doubles()
        sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                    "i long, x double")
        got = {r.i: r.r for r in sdf.select(
            "i", F.round("x").cast("bigint").alias("r")).collect()}
        want = _duck_eval(duck, vals, "CAST(round(x) AS BIGINT)")
        diffs = {i: (got[i], want[i], vals[i])
                 for i in want if got[i] != want[i]}
        assert not diffs, f"round(x) diverges: {dict(list(diffs.items())[:5])}"

    def test_cents_conversion_parity(self, spark, duck):
        vals = _adversarial_doubles()
        sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                    "i long, x double")
        got = {r.i: r.c for r in sdf.select(
            "i", F.round(F.col("x") * 100).cast("bigint").alias("c"))
            .collect()}
        want = _duck_eval(duck, vals, "CAST(round(x * 100) AS BIGINT)")
        diffs = {i: (got[i], want[i], vals[i])
                 for i in want if got[i] != want[i]}
        assert not diffs, (
            f"round(x*100) diverges: {dict(list(diffs.items())[:5])}")

    def test_integer_div_truncates_toward_zero_both_engines(
            self, spark, duck):
        nums = [7, -7, 9, -9, 1, -1, 0, 10**17, -10**17,
                999999999999999999, -999999999999999999]
        dens = [2, -2, 3, -3, 7, -7, 1000000000]
        pairs = [(a, b) for a in nums for b in dens]
        sdf = spark.createDataFrame(pairs, "a long, b long")
        got = sorted(tuple(r) for r in sdf.select(
            "a", "b", F.expr("a div b").alias("q")).collect())
        pdf = pd.DataFrame(pairs, columns=["a", "b"]).astype("int64")
        duck.register("td", pdf)
        try:
            want = sorted(duck.execute(
                "SELECT a, b, CAST(a // b AS BIGINT) FROM td").fetchall())
        finally:
            duck.unregister("td")
        assert got == want
        # and both really truncate toward zero, not floor
        q = dict(((a, b), v) for a, b, v in got)
        assert q[(-7, 2)] == -3 and q[(7, -2)] == -3 and q[(7, 2)] == 3

    def test_floor_scaled_fixed_point_parity(self, spark, duck):
        vals = [v for v in _adversarial_doubles()
                if abs(v) < 9e9]  # keep x*1e9 inside BIGINT
        sdf = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                                    "i long, x double")
        got = {r.i: r.f for r in sdf.select(
            "i", F.floor(F.col("x") * 1e9 + F.lit(0.5))
            .cast("bigint").alias("f")).collect()}
        want = _duck_eval(duck, vals,
                          "CAST(floor(x * 1e9 + 0.5) AS BIGINT)")
        diffs = {i: (got[i], want[i], vals[i])
                 for i in want if got[i] != want[i]}
        assert not diffs, (
            f"floor(x*1e9+0.5) diverges: {dict(list(diffs.items())[:5])}")
        # spot-agree with Python's exact-math floor too
        for v in (940869.8709691325, -961834.6946879415, 2.5, -2.5):
            i = vals.index(v) if v in vals else None
            if i is not None:
                assert got[i] == math.floor(v * 1e9 + 0.5)

    def test_decimal_literal_pitfall(self, duck):
        """The harness pitfall, pinned as a rule: a 10+ significant-
        digit double rendered into SQL text parses as DECIMAL and a
        ::DOUBLE cast does NOT restore the original bits. Any oracle
        embedding such a literal would silently compare one ULP off."""
        x = 940869.8709691325
        assert duck.execute(
            "SELECT typeof(940869.8709691325)").fetchone()[0] \
            .startswith("DECIMAL")
        roundtrip = duck.execute(
            "SELECT 940869.8709691325::DOUBLE").fetchone()[0]
        assert roundtrip != x  # the bit loss is REAL in this build
        # exact transfer path (registered frame) preserves the bits
        duck.register("tp", pd.DataFrame({"x": [x]}))
        try:
            assert duck.execute("SELECT x FROM tp").fetchone()[0] == x
        finally:
            duck.unregister("tp")


class TestAnnOracleExactness:
    """r10 replacement for the retired TestAnnOracleMargin: with
    INTEGER plane coordinates the q_sim_ann oracle is bit-exact by
    construction — no per-corpus margin argument. Pin it directly:
    for every embedding and every plane, the FULL int64 scaled dot
    (not merely its sign) computed by the numpy kernel equals what
    DuckDB computes from the literal-embedded oracle expression."""

    def test_plane_literals_are_exact_integers(self):
        from gasket_spark.operators.similarity import (
            EMB_SCALE, MAX_ABS_EMB, MAX_ABS_PLANE, _hyperplanes)

        planes = _hyperplanes(64, 8, 42)
        assert all(isinstance(x, int) for p in planes for x in p)
        # the JOINT overflow contract (r11 advice): the plane bound
        # and the kernels' |x| <= MAX_ABS_EMB guard must TOGETHER
        # leave int64 headroom — the old <10_000 allowance did not
        # (64·16e12·9999 > 2^63)
        assert max(abs(x) for p in planes for x in p) <= MAX_ABS_PLANE
        assert 64 * MAX_ABS_EMB * EMB_SCALE * MAX_ABS_PLANE < 2 ** 63

    def test_duckdb_dot_matches_kernel_bit_for_bit(self, duck):
        import numpy as np

        from gasket_spark.operators.similarity import (
            EMB_SCALE, _hyperplanes)

        emb = pd.read_parquet(
            "/root/testdata/sf0.001/embeddings.parquet")
        V = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
        planes = _hyperplanes(64, 8, 42)
        P = np.asarray(planes, dtype=np.int64).T      # (dim, planes)
        S = V * EMB_SCALE
        E = (np.sign(S) * np.floor(np.abs(S) + 0.5)).astype(np.int64)
        want = E @ P                                   # (n, planes)

        duck.register("emb", emb[["vec_id", "embedding"]])
        try:
            dots = []
            for plane in planes:
                lits = ", ".join(str(int(x)) for x in plane)
                dots.append(
                    "CAST(list_sum(list_transform(range(1, 65), i -> "
                    "CAST(round(CAST(embedding[i] AS DOUBLE) * 1e12) "
                    f"AS BIGINT) * CAST(([{lits}])[i] AS BIGINT))) "
                    "AS BIGINT)")
            got = duck.execute(
                f"SELECT {', '.join(dots)} FROM emb ORDER BY vec_id"
            ).fetchnumpy()
        finally:
            duck.unregister("emb")
        order = np.argsort(emb["vec_id"].to_numpy(), kind="stable")
        for j, col in enumerate(got):
            assert np.array_equal(got[col], want[order, j]), (
                f"plane {j}: DuckDB dot diverges from kernel")


class TestLevenshteinParity:
    """Cross-engine contract for the edit-distance verify step:
    Spark's levenshtein counts CODEPOINTS, DuckDB's counts UTF-8
    BYTES. They agree exactly on ASCII (the fixture corpus) — pinned
    over adversarial vectors — and the multi-byte divergence is
    pinned too, so a future non-ASCII oracle knows to normalize."""

    VECTORS = [
        ("kitten", "sitting"), ("abc", ""), ("", ""),
        ("aaaa", "aa"), ("ab", "ba"), ("x" * 50, "x" * 49 + "y"),
        ("spark table scan", "spark table scen"),
        ("the quick brown fox", "the quick brown dog"),
    ]

    def test_ascii_agrees(self, spark, duck):
        from pyspark.sql import functions as F

        df = spark.createDataFrame(self.VECTORS, "a string, b string")
        got = [r.d for r in
               df.select(F.levenshtein("a", "b").alias("d")).collect()]
        want = [duck.execute("SELECT levenshtein(?, ?)", list(p))
                .fetchone()[0] for p in self.VECTORS]
        assert got == want

    def test_multibyte_diverges_as_documented(self, spark, duck):
        from pyspark.sql import functions as F

        pair = ("héllo", "hello")   # é = 2 UTF-8 bytes
        df = spark.createDataFrame([pair], "a string, b string")
        s = df.select(F.levenshtein("a", "b").alias("d")).first().d
        k = duck.execute("SELECT levenshtein(?, ?)", list(pair)) \
            .fetchone()[0]
        assert s == 1 and k == 2


class TestVariantJsonParity:
    """Spark 4 VARIANT (parse_json / variant_get / try_variant_get /
    is_variant_null) vs DuckDB's JSON functions over the SAME
    documents — the r12 ``q_json_variant`` oracle shape, probed and
    pinned early (the r10/r11 banked-operator discipline): typed path
    extraction, missing-path NULL, JSON-null vs missing distinction,
    and array indexing all agree."""

    DOCS = [
        (1, '{"k": 7, "tags": ["a", "b"], "meta": {"d": 2.5}}'),
        (2, '{"k": -3, "tags": [], "meta": {"d": 0.125}}'),
        (3, '{"k": 0, "extra": null}'),
        (4, '{"nested": {"deep": {"val": 123456789012}}}'),
    ]

    def test_typed_extraction_agrees(self, spark, duck):
        from pyspark.sql import functions as F

        sdf = spark.createDataFrame(self.DOCS, "i long, j string")
        v = F.parse_json("j")
        got = {r.i: (r.k, r.t0, r.deep, r.cents) for r in sdf.select(
            "i",
            F.try_variant_get(v, "$.k", "long").alias("k"),
            F.try_variant_get(v, "$.tags[0]", "string").alias("t0"),
            F.try_variant_get(v, "$.nested.deep.val", "long")
            .alias("deep"),
            # money rule holds through JSON too: extract double,
            # convert to integer cents before any compare
            F.round(F.try_variant_get(v, "$.meta.d", "double") * 100)
            .cast("long").alias("cents")).collect()}
        import pandas as pd
        duck.register("vj", pd.DataFrame(self.DOCS, columns=["i", "j"]))
        try:
            want = {i: (k, t0, deep, cents) for i, k, t0, deep, cents
                    in duck.execute("""
                SELECT i,
                       CAST(j->>'$.k' AS BIGINT),
                       j->>'$.tags[0]',
                       CAST(j->>'$.nested.deep.val' AS BIGINT),
                       CAST(round(CAST(j->>'$.meta.d' AS DOUBLE) * 100)
                            AS BIGINT)
                FROM vj""").fetchall()}
        finally:
            duck.unregister("vj")
        assert got == want

    def test_json_null_vs_missing(self, spark):
        """VARIANT distinguishes an explicit JSON null (is_variant_null
        TRUE) from a missing path (try_variant_get -> SQL NULL) — the
        semantics a props-evolution pipeline needs; DuckDB's ->> maps
        both to SQL NULL, so an oracle must compare through the typed
        extraction, not the null-kind — pinned here so the r12 query
        states only oracle-expressible columns."""
        from pyspark.sql import functions as F

        sdf = spark.createDataFrame(self.DOCS, "i long, j string")
        v = F.parse_json("j")
        rows = {r.i: (r.null_kind, r.missing) for r in sdf.select(
            "i",
            F.is_variant_null(F.try_variant_get(v, "$.extra", "variant"))
            .alias("null_kind"),
            F.try_variant_get(v, "$.extra", "long").alias("missing"))
            .collect()}
        assert rows[3] == (True, None)       # explicit null
        # path absent entirely: try_variant_get yields SQL NULL and
        # is_variant_null(NULL variant) evaluates FALSE (not NULL) —
        # the actual Spark 4.1 semantics, pinned as observed
        assert rows[1] == (False, None)


class TestEditDistanceOracleTwin:
    def test_duckdb_twin_matches_operator(self, spark, duck):
        """The full edit_distance_pairs pipeline restated in DuckDB
        SQL (distinct char q-grams -> (df, gram)-ranked signatures ->
        sig x full candidates + length-banded short bucket ->
        levenshtein verify) produces the identical pair set — the r12
        ``q_dedup_edit`` oracle shape, pinned before registration
        (the r10 rendezvous pattern)."""
        import pandas as pd

        from gasket_spark.operators.dedup import edit_distance_pairs

        d_max, q = 2, 2
        docs = [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dot"),
            (3, "the quick brown fox jump over the lazy dog"),
            (4, "a wholly different line of text for contrast"),
            (5, "a wholly different line of text for contrasts"),
            (6, "zq"), (7, "zr"), (8, "zqx"),
            (9, "the the the the the the"),
            (10, "the the the the the tha"),
        ]
        sdf = spark.createDataFrame(docs, "doc_id long, text string")
        got = sorted((r.id_a, r.id_b, r.edit_distance) for r in
                     edit_distance_pairs(sdf, d=d_max, q=q).collect())

        sig_k = d_max * q + 1
        short_max = q * (d_max + 1) - 1
        duck.register("ed_docs",
                      pd.DataFrame(docs, columns=["doc_id", "text"]))
        try:
            want = sorted(map(tuple, duck.execute(f"""
              WITH grams AS (
                SELECT doc_id, length(text) AS dlen,
                       unnest(list_distinct(list_transform(
                  range(1, greatest(length(text) - {q - 1}, 0) + 1),
                  i -> substr(text, i, {q})))) AS g
                FROM ed_docs),
              dfq AS (SELECT g, COUNT(*) AS df FROM grams GROUP BY g),
              ranked AS (
                SELECT doc_id, dlen, g, row_number() OVER (
                  PARTITION BY doc_id ORDER BY df, g) AS rk
                FROM grams JOIN dfq USING (g)),
              sig AS (SELECT doc_id, dlen, g FROM ranked
                      WHERE rk <= {sig_k}),
              cand_sig AS (
                SELECT DISTINCT least(s.doc_id, f.doc_id) AS id_a,
                       greatest(s.doc_id, f.doc_id) AS id_b
                FROM sig s JOIN ranked f USING (g)
                WHERE s.doc_id <> f.doc_id
                  AND abs(s.dlen - f.dlen) <= {d_max}),
              lens AS (SELECT doc_id, text, length(text) AS len
                       FROM ed_docs),
              cand_short AS (
                SELECT DISTINCT least(sh.doc_id, nr.doc_id) AS id_a,
                       greatest(sh.doc_id, nr.doc_id) AS id_b
                FROM (SELECT * FROM lens WHERE len <= {short_max}) sh
                JOIN lens nr ON sh.doc_id <> nr.doc_id
                 AND abs(sh.len - nr.len) <= {d_max}
                 AND nr.len <= {short_max + d_max}),
              cand AS (SELECT * FROM cand_sig
                       UNION SELECT * FROM cand_short)
              SELECT id_a, id_b, levenshtein(a.text, b.text) AS ed
              FROM cand JOIN lens a ON a.doc_id = id_a
                        JOIN lens b ON b.doc_id = id_b
              WHERE abs(a.len - b.len) <= {d_max}
                AND levenshtein(a.text, b.text) <= {d_max}
              """).fetchall()))
        finally:
            duck.unregister("ed_docs")
        assert got == want and got   # non-vacuous, identical


class TestBpeOracleTwin:
    def test_duckdb_twin_matches_trainer(self, spark, duck):
        """The whole BPE training loop restated in unrolled SQL yields
        the identical merge table — pinned ahead of the r12
        registration (the rendezvous/edit-distance pattern). Includes
        the alternating-run shape that needs >1 replace pass. The SQL
        comes from the SAME builder the q_bpe_train registration uses
        (operators/bpe.py:bpe_train_oracle_sql), so test and oracle
        cannot drift."""
        import pandas as pd

        from gasket_spark.operators.bpe import (bpe_merge_table,
                                                bpe_train_oracle_sql)

        texts = ["low lower lowest newest newer new",
                 "banana bandana banal", "xyxy xyxyxy",
                 "aaaa aaaaa aa a"]
        sdf = spark.createDataFrame([(t,) for t in texts], "text string")
        got = bpe_merge_table(sdf, n_merges=8, passes=4)

        duck.register("corpus", pd.DataFrame({"text": texts}))
        try:
            want = [tuple(r) for r in
                    duck.execute(bpe_train_oracle_sql(8, passes=4) +
                                 " ORDER BY merge_rank").fetchall()]
        finally:
            duck.unregister("corpus")
        assert [tuple(m) for m in got] == want and len(want) == 8


class TestTokenRunsOracleTwin:
    def test_gaps_and_islands_sql_matches_udtf(self, spark, duck):
        """token_runs (LATERAL UDTF) == the classic gaps-and-islands
        restatement in ANSI SQL — the planned r12 ``q_udtf_runs``
        oracle, pinned ahead of registration."""
        import pandas as pd

        from gasket_spark.functions.udtfs import register_udtfs

        register_udtfs(spark)
        texts = {1: "a a a b b c", 2: "x", 3: "p q p p q q q",
                 4: "same same same same", 5: "t u t u t"}
        spark.createDataFrame(list(texts.items()),
                              "doc_id long, text string") \
            .createOrReplaceTempView("_tr_docs")
        got = sorted(tuple(r) for r in spark.sql("""
            SELECT d.doc_id, r.run_idx, r.token, r.start_pos, r.run_len
            FROM _tr_docs d, LATERAL token_runs(d.text) r
        """).collect())

        duck.register("trd", pd.DataFrame(list(texts.items()),
                                          columns=["doc_id", "text"]))
        try:
            want = sorted(tuple(r) for r in duck.execute("""
              WITH pos AS (
                SELECT doc_id, pg.i AS i, pg.tok AS tok
                FROM (SELECT doc_id,
                        unnest(list_transform(
                          range(1, len(string_split(text, ' ')) + 1),
                          i -> struct_pack(i := i,
                                 tok := string_split(text, ' ')[i])))
                          AS pg
                      FROM trd)),
              isl AS (
                SELECT doc_id, tok,
                       i - row_number() OVER (
                         PARTITION BY doc_id, tok ORDER BY i) AS grp,
                       i
                FROM pos),
              runs AS (
                SELECT doc_id, tok, CAST(min(i) AS INT) AS start_pos,
                       CAST(COUNT(*) AS INT) AS run_len
                FROM isl GROUP BY doc_id, tok, grp)
              SELECT doc_id,
                     CAST(row_number() OVER (PARTITION BY doc_id
                       ORDER BY start_pos) - 1 AS INT) AS run_idx,
                     tok, start_pos, run_len
              FROM runs""").fetchall())
        finally:
            duck.unregister("trd")
        assert got == want and got


class TestBpeEncodeOracleTwin:
    def test_duckdb_twin_matches_encoder(self, spark, duck):
        """bpe_encode over corpus-learned merges == the SQL chain that
        learns the same merges (the training twin above) and replays
        them over the padded doc stream — the r12 ``q_bpe_tokens``
        oracle shape (doc grain: tokens_str + n_tokens), built by the
        SAME shared builder the registration uses
        (operators/bpe.py:bpe_encode_oracle_sql)."""
        import pandas as pd

        from pyspark.sql import functions as F

        from gasket_spark.operators.bpe import (bpe_encode,
                                                bpe_encode_oracle_sql,
                                                bpe_merge_table)

        docs = [(1, "low lower lowest"), (2, "new newer newest"),
                (3, "xyxy xyxyxy wide wider"), (4, "a aa aaa")]
        sdf = spark.createDataFrame(docs, "doc_id long, text string")
        n_merges, passes = 6, 4
        merges = bpe_merge_table(sdf, n_merges=n_merges, passes=passes)
        got = sorted((r.doc_id, r.tokens_str, r.n_tokens) for r in
                     bpe_encode(sdf, merges, passes=passes)
                     .select("doc_id",
                             F.array_join("tokens", " ")
                             .alias("tokens_str"), "n_tokens")
                     .collect())

        # the training CTEs read `corpus` (text grain); the encode
        # d0 CTE reads the doc-grain view — same text content
        sql = bpe_encode_oracle_sql(n_merges, passes=passes,
                                    table="corpus",
                                    doc_table="corpus_docs")
        duck.register("corpus", pd.DataFrame(
            [(t,) for _i, t in docs], columns=["text"]))
        duck.register("corpus_docs", pd.DataFrame(
            docs, columns=["doc_id", "text"]))
        try:
            want = sorted(map(tuple, duck.execute(sql).fetchall()))
        finally:
            duck.unregister("corpus")
            duck.unregister("corpus_docs")
        assert got == want and got

    def test_encode_residual_guard_raises_on_unseen_runs(self, spark):
        """A stored merge table replayed over an UNSEEN corpus whose
        same-pair runs exceed 2^passes must raise loudly, not
        silently half-apply (the r11 ADVICE finding); with the guard
        off the caller explicitly accepts the partial application."""
        import pytest

        from gasket_spark.operators.bpe import bpe_encode

        # trained elsewhere: merge (a, a) -> aa with passes=1. One
        # replace pass on the run-4 stream " a a a a " yields
        # " aa a a " (the second match's leading space was consumed)
        # — a genuine residual " a a " survives.
        merges = [(0, "a", "a", 99)]
        unseen = spark.createDataFrame(
            [(1, "aaaa")], "doc_id long, text string")
        with pytest.raises(Exception, match="survives 1 replace"):
            bpe_encode(unseen, merges, passes=1).collect()
        # opt-out: partial application is visible, not silent-exact
        toks = bpe_encode(unseen, merges, passes=1,
                          check_residual=False).collect()[0].tokens
        assert "a" in toks  # residual singles survive un-merged


class TestKnnLabelAnnOracleTwin:
    def test_duckdb_twin_matches_operator(self, spark, duck):
        """knn_label_ann restated in SQL from the two already-proven
        pieces — the integer-plane bucket expression (q_sim_ann's
        oracle machinery) and the integer-scaled cosine — plus the
        Hamming-1 probe set and the vote: the planned r12
        ``q_knn_label_ann`` oracle, pinned on the REAL embeddings
        fixture."""
        import pandas as pd

        from gasket_spark.operators import similarity as S
        from gasket_spark.operators.similarity import knn_label_ann

        emb = pd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
        sdf = spark.createDataFrame(emb)
        queries = sdf.filter("vec_id % 5 = 0")
        corpus = sdf.filter("vec_id % 5 <> 0")
        got = sorted((r.query_id, r.pred_label, r.n_votes) for r in
                     knn_label_ann(corpus, queries, k=5).collect())

        from gasket_spark.queries.llm import _ann_bucket_sql, _cos_expr
        bucket = _ann_bucket_sql(S._hyperplanes(64, 8, 42))
        probes = ", ".join(str(x) for x in [0] + [1 << j for j in range(8)])
        duck.register("embeddings", emb)
        try:
            want = sorted(map(tuple, duck.execute(f"""
              WITH b AS (
                SELECT vec_id, embedding, label, {bucket} AS bucket
                FROM embeddings),
              qp AS (
                SELECT vec_id AS query_id, embedding,
                       xor(bucket, p.x) AS bucket
                FROM b, (SELECT unnest([{probes}]) AS x) p
                WHERE vec_id % 5 = 0),
              scored AS (
                SELECT DISTINCT q.query_id, c.vec_id AS neighbor_id,
                       c.label AS lbl,
                       {_cos_expr('q', 'c')} AS cos_sim
                FROM qp q JOIN b c USING (bucket)
                WHERE c.vec_id % 5 <> 0),
              nbrs AS (
                SELECT query_id, lbl FROM (
                  SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY cos_sim DESC, neighbor_id) AS rnk
                  FROM scored) WHERE rnk <= 5),
              votes AS (SELECT query_id, lbl, COUNT(*) AS n_votes
                        FROM nbrs GROUP BY 1, 2)
              SELECT query_id, lbl AS pred_label, n_votes FROM (
                SELECT *, row_number() OVER (PARTITION BY query_id
                  ORDER BY n_votes DESC, lbl) AS rk FROM votes)
              WHERE rk = 1""").fetchall()))
        finally:
            duck.unregister("embeddings")
        assert got == want and got


class TestPackSequencesOracleTwin:
    def test_duckdb_twin_matches_operator(self, spark, duck):
        """pack_sequences (concat-and-chunk at seq_len) restated in
        SQL — naive single-window cumsum + a LATERAL range over the
        overlapped sequence ids — yields the identical span set: the
        planned r13 ``q_pack_sequences`` oracle, pinned ahead of
        registration (the r11/r12 banked-operator discipline). The
        operator computes the same offsets with the DISTRIBUTED
        two-phase prefix sum; the twin proves the arithmetic, the
        plan contract will pin the shape."""
        import pandas as pd

        from pyspark.sql import functions as F

        from gasket_spark.operators.packing import pack_sequences

        L = 7
        docs = [(i, "w " * (i % 11 + 1)) for i in range(1, 40)]
        sdf = (spark.createDataFrame(docs, "doc_id long, text string")
               .select("doc_id",
                       F.size(F.split(F.trim("text"), " +"))
                       .cast("bigint").alias("n_tok")))
        got = sorted(tuple(r) for r in
                     pack_sequences(sdf, "n_tok", "doc_id", L).collect())

        duck.register("ps_docs", pd.DataFrame(
            [(i, (i % 11 + 1)) for i in range(1, 40)],
            columns=["doc_id", "n_tok"]))
        try:
            want = sorted(map(tuple, duck.execute(f"""
              WITH cum AS (
                SELECT doc_id, CAST(n_tok AS BIGINT) AS n,
                       CAST(COALESCE(SUM(n_tok) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING
                         AND 1 PRECEDING), 0) AS BIGINT) AS strt
                FROM ps_docs)
              SELECT doc_id, CAST(s.seq_id AS BIGINT) AS seq_id,
                     CAST(greatest(s.seq_id * {L}, strt) - strt
                          AS BIGINT) AS doc_offset,
                     CAST(greatest(s.seq_id * {L}, strt)
                          - s.seq_id * {L} AS BIGINT) AS seq_offset,
                     CAST(least((s.seq_id + 1) * {L}, strt + n)
                          - greatest(s.seq_id * {L}, strt)
                          AS BIGINT) AS span_len
              FROM cum, LATERAL (SELECT unnest(range(strt // {L},
                     (strt + n - 1) // {L} + 1)) AS seq_id) s
              """).fetchall()))
        finally:
            duck.unregister("ps_docs")
        assert got == want and len(got) > 40   # splits occurred


class TestSemanticDedupOracleTwin:
    def test_duckdb_twin_matches_operator(self, spark, duck):
        """semantic_dedup (SemDeDup: engine-exact k-means clusters ->
        within-cluster cosine >= t -> min-lower-id survivor rule)
        restated in SQL from the SHARED trainer builder
        (_kmeans_assign_cte_sql, the exact CTEs q_sim_ivf's oracle
        runs) — the planned r13 ``q_dedup_semantic`` oracle, pinned on
        the REAL embeddings fixture plus perturbed clones (first
        coordinate +0.125 — the paraphrase analog: near-identical
        direction, zero shared n-grams; all arithmetic in doubles on
        both sides)."""
        from pyspark.sql import functions as F

        from gasket_spark.operators.similarity import semantic_dedup
        from gasket_spark.queries.llm import (_cos_expr,
                                              _kmeans_assign_cte_sql)

        sf = "/root/testdata/sf0.001"
        emb = (spark.read.parquet(f"{sf}/embeddings.parquet")
               .select("vec_id", "embedding"))
        dbl = emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double"))
            .alias("embedding"))
        pert = emb.select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.concat(
                F.array(F.element_at("embedding", 1).cast("double")
                        + F.lit(0.125)),
                F.transform(F.slice("embedding", 2, 63),
                            lambda x: x.cast("double")))
            .alias("embedding"))
        corpus = dbl.unionByName(pert)
        got = sorted(tuple(r) for r in
                     semantic_dedup(corpus, threshold=0.95,
                                    n_centroids=16).collect())

        head = """semcorp AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, e -> CAST(e AS DOUBLE))
                   AS embedding
          FROM embeddings
          UNION ALL
          SELECT vec_id + 100000,
                 [CAST(embedding[1] AS DOUBLE) + 0.125] ||
                 list_transform(embedding[2:64],
                                e -> CAST(e AS DOUBLE))
          FROM embeddings)"""
        sql = _kmeans_assign_cte_sql(table="semcorp", head=head) + f""",
        p AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM cassign a JOIN cassign b
            ON a.cl = b.cl AND a.vec_id < b.vec_id),
        sims AS (
          SELECT p.id_a, p.id_b, {_cos_expr('q', 'c')} AS cos_sim
          FROM p JOIN semcorp q ON q.vec_id = p.id_a
                 JOIN semcorp c ON c.vec_id = p.id_b)
        SELECT id_b AS vec_id, CAST(MIN(id_a) AS BIGINT) AS dup_of,
               CAST(COUNT(*) AS BIGINT) AS n_dup_neighbors
        FROM sims WHERE cos_sim >= 0.95
        GROUP BY id_b"""
        import pandas as pd
        duck.register("embeddings",
                      pd.read_parquet(f"{sf}/embeddings.parquet")
                      [["vec_id", "embedding"]])
        try:
            want = sorted(map(tuple, duck.execute(sql).fetchall()))
        finally:
            duck.unregister("embeddings")
        assert got == want and len(got) >= 400  # clones detected


class TestTwoLevelSemanticDedupOracleTwin:
    def test_duckdb_twin_matches_operator(self, spark, duck):
        """semantic_dedup_two_level — the CORPUS-PROPORTIONAL SemDeDup
        (K = ceil(n/target); coarse driver Lloyd + DISTRIBUTED
        per-cell fine Lloyds via applyInPandas) — restated in SQL by
        _kmeans2_cte_sql: kdef re-derives the geometry (ceil-division
        + ceil-sqrt, engine-exact), the coarse level is the familiar
        single-level restatement with kdef-subquery bounds, and the
        fine level is the SAME ten unrolled Lloyd iterations keyed by
        (cell, centroid) — proving the distributed execution lands on
        bit-identical centroids and assignments. Pinned RAW (no
        registry normalization) on the real embeddings fixture plus
        perturbed clones, the r13 ``q_dedup_semantic`` oracle."""
        import pandas as pd

        from pyspark.sql import functions as F

        from gasket_spark.operators.similarity import (
            semantic_dedup_two_level)
        from gasket_spark.queries.llm import _cos_expr, _kmeans2_cte_sql

        sf = "/root/testdata/sf0.001"
        emb = (spark.read.parquet(f"{sf}/embeddings.parquet")
               .select("vec_id", "embedding"))
        dbl = emb.select(
            "vec_id",
            F.transform("embedding", lambda x: x.cast("double"))
            .alias("embedding"))
        pert = emb.select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.concat(
                F.array(F.element_at("embedding", 1).cast("double")
                        + F.lit(0.125)),
                F.transform(F.slice("embedding", 2, 63),
                            lambda x: x.cast("double")))
            .alias("embedding"))
        corpus = dbl.unionByName(pert)
        got = sorted(tuple(r) for r in
                     semantic_dedup_two_level(corpus, threshold=0.95,
                                              target_cluster=64)
                     .collect())

        head = """semcorp AS MATERIALIZED (
          SELECT vec_id,
                 list_transform(embedding, e -> CAST(e AS DOUBLE))
                   AS embedding
          FROM embeddings
          UNION ALL
          SELECT vec_id + 100000,
                 [CAST(embedding[1] AS DOUBLE) + 0.125] ||
                 list_transform(embedding[2:64],
                                e -> CAST(e AS DOUBLE))
          FROM embeddings)"""
        sql = _kmeans2_cte_sql(table="semcorp", head=head,
                               target=64) + f""",
        p AS (
          SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM fassign a JOIN fassign b
            ON a.ccl = b.ccl AND a.fcl = b.fcl AND a.vec_id < b.vec_id),
        sims AS (
          SELECT p.id_a, p.id_b, {_cos_expr('q', 'c')} AS cos_sim
          FROM p JOIN semcorp q ON q.vec_id = p.id_a
                 JOIN semcorp c ON c.vec_id = p.id_b)
        SELECT id_b AS vec_id, CAST(MIN(id_a) AS BIGINT) AS dup_of,
               CAST(COUNT(*) AS BIGINT) AS n_dup_neighbors
        FROM sims WHERE cos_sim >= 0.95
        GROUP BY id_b"""
        duck.register("embeddings",
                      pd.read_parquet(f"{sf}/embeddings.parquet")
                      [["vec_id", "embedding"]])
        try:
            want = sorted(map(tuple, duck.execute(sql).fetchall()))
        finally:
            duck.unregister("embeddings")
        assert got == want and len(got) >= 400  # clones detected


class TestVocabCoverageOracleTwin:
    def test_duckdb_twin_matches_dataframe_build(self, spark, duck):
        """Vocabulary coverage curve (pieces needed for p% corpus
        coverage — the tokenizer-sizing diagnostic): top-1024 pieces
        by (freq desc, piece asc), cumulative share as ONE truncating
        integer division in ppb. Pieces are char 8-grams because the
        fixture's WHITESPACE vocabulary is 31 tokens at every SF (the
        r12 discovery that also drove the edit-distance band) — the
        gram grain gives a real ~20k-piece vocabulary. The r14 bank
        candidate ``q_vocab_coverage``, pinned ahead of registration.
        The cumulative window runs over the BOUNDED top-1024 table
        (a 1024-row single partition is fine at any corpus scale —
        the corpus-grain work is one piece-frequency aggregate)."""
        import pandas as pd

        from pyspark.sql import Window
        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.01"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        n = F.length("text") - 7
        gidx = F.when(n >= 1, F.sequence(F.lit(1), n)) \
            .otherwise(F.array().cast("array<int>"))
        toks = docs.select(F.explode(F.transform(
            gidx, lambda i: F.substring("text", i, 8))).alias("tok"))
        freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("freq"))
        wr = Window.orderBy(F.col("freq").desc(), F.col("tok").asc())
        top = (freq.withColumn("rank", F.row_number().over(wr))
               .filter(F.col("rank") <= 1024))
        total = toks.count()
        wc = (Window.orderBy("rank")
              .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        got = sorted(tuple(r) for r in top
                     .withColumn("cum_freq", F.sum("freq").over(wc))
                     .select(F.col("rank").cast("int"), "tok",
                             F.col("freq").cast("long"),
                             F.col("cum_freq").cast("long"),
                             F.expr(f"cum_freq * 1000000000 div {total}")
                             .alias("coverage_ppb")).collect())

        duck.register("vdocs", pd.read_parquet(
            f"{sf}/documents.parquet")[["doc_id", "text"]])
        try:
            want = sorted(map(tuple, duck.execute("""
              WITH toks AS (
                SELECT unnest(list_transform(
                  range(1, greatest(length(text) - 7, 0) + 1),
                  i -> substr(text, i, 8))) AS tok
                FROM vdocs),
              freq AS (SELECT tok, COUNT(*) AS freq FROM toks
                       GROUP BY tok),
              total AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM toks),
              top AS (
                SELECT tok, freq, row_number() OVER (
                  ORDER BY freq DESC, tok) AS rank
                FROM freq QUALIFY rank <= 1024)
              SELECT CAST(rank AS INT) AS rank, tok,
                     CAST(freq AS BIGINT) AS freq,
                     CAST(SUM(freq) OVER (ORDER BY rank
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS cum_freq,
                     CAST(SUM(freq) OVER (ORDER BY rank
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) * 1000000000 // total.n AS coverage_ppb
              FROM top, total""").fetchall()))
        finally:
            duck.unregister("vdocs")
        assert got == want and len(got) == 1024


class TestGroupSplitOracleTwin:
    def test_duckdb_twin_matches_and_split_is_leakage_safe(
            self, spark, duck):
        """GROUP-aware train/val/test split — the leakage-safe form of
        q_split_assign: the bucket hashes the SOURCE, not the doc, so
        every document of a source lands in the same split (near-dups
        cluster within sources; a doc-grain split can put a page and
        its re-crawl on opposite sides of the train/test line). Same
        salted-md5 content addressing: stable across runs, engines,
        partitionings, and corpus growth. The r13 bank candidate
        ``q_split_group``, pinned ahead of registration."""
        import pandas as pd

        from pyspark.sql import functions as F

        sf = "/root/testdata/sf0.01"
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        bucket = F.conv(F.substring(
            F.md5(F.concat(F.lit("gsplit42:"), F.col("source"))),
            1, 8), 16, 10).cast("bigint") % 100
        out = docs.select(
            "doc_id", "source",
            F.when(bucket < 80, "train").when(bucket < 90, "val")
            .otherwise("test").alias("split"))
        got = sorted(tuple(r) for r in out.collect())

        duck.register("gdocs", pd.read_parquet(
            f"{sf}/documents.parquet")[["doc_id", "source"]])
        try:
            want = sorted(map(tuple, duck.execute("""
              WITH h AS (
                SELECT doc_id, source,
                       CAST(('0x' || substr(md5('gsplit42:' || source),
                         1, 8)) AS BIGINT) % 100 AS bucket
                FROM gdocs)
              SELECT doc_id, source,
                     CASE WHEN bucket < 80 THEN 'train'
                          WHEN bucket < 90 THEN 'val'
                          ELSE 'test' END AS split
              FROM h""").fetchall()))
        finally:
            duck.unregister("gdocs")
        assert got == want and got
        # the leakage invariant: one split per source, several sources
        by_src = {}
        for _id, src, split in got:
            by_src.setdefault(src, set()).add(split)
        assert all(len(v) == 1 for v in by_src.values())
        assert len(by_src) > 1


class TestBm25OracleTwin:
    def test_duckdb_twin_matches_dataframe_build(self, spark, duck):
        """BM25 top-20 for the fixed query ('vector stream merge'),
        engine-exact: with k1 = 6/5, b = 3/4 the per-term contribution
        multiplies out to idf_micro·22·tf·T // (10·tf·T + 3·T +
        9·dl·N) — avgdl substituted symbolically as T/N, numerator
        widened to decimal(38,0)/HUGEINT, idf the one round-0 ln()
        mask. The r13 ``q_bm25_topk`` registration, pinned RAW."""
        import pandas as pd

        from gasket_spark.queries import QUERIES

        sf = "/root/testdata/sf0.01"
        got = sorted(tuple(r) for r in
                     QUERIES["q_bm25_topk"](spark, sf).collect())

        duck.register("bdocs", pd.read_parquet(
            f"{sf}/documents.parquet")[["doc_id", "text"]])
        try:
            want = sorted(map(tuple, duck.execute("""
              WITH dl AS (
                SELECT doc_id,
                       CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
                FROM bdocs),
              stats AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                               CAST(SUM(dl) AS BIGINT) AS t FROM dl),
              toks AS (SELECT doc_id, unnest(string_split(text, ' '))
                         AS term FROM bdocs),
              tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
                     FROM toks
                     WHERE term IN ('vector', 'stream', 'merge')
                     GROUP BY doc_id, term),
              idf AS (SELECT term,
                       CAST(round(ln(1 + (s.n - df + 0.5) / (df + 0.5))
                            * 1e6) AS BIGINT) AS idf_micro
                      FROM (SELECT term, CAST(COUNT(*) AS BIGINT) AS df
                            FROM tf GROUP BY term), stats s),
              contrib AS (
                SELECT tf.doc_id,
                       CAST(CAST(idf.idf_micro AS HUGEINT) * 22 * tf.tf
                            * s.t // (10 * tf.tf * s.t + 3 * s.t
                                      + 9 * dl.dl * s.n)
                         AS BIGINT) AS c
                FROM tf JOIN idf USING (term) JOIN dl USING (doc_id),
                     stats s),
              scored AS (SELECT doc_id, CAST(SUM(c) AS BIGINT)
                           AS score_micro FROM contrib GROUP BY doc_id),
              ranked AS (SELECT doc_id, score_micro, row_number() OVER (
                           ORDER BY score_micro DESC, doc_id) AS rnk
                         FROM scored)
              SELECT doc_id, score_micro, CAST(rnk AS INT) AS rank
              FROM ranked WHERE rnk <= 20""").fetchall()))
        finally:
            duck.unregister("bdocs")
        assert got == want and len(got) == 20
        # scores are meaningful: strictly positive, rank-consistent
        by_rank = sorted(got, key=lambda r: r[2])
        scores = [r[1] for r in by_rank]
        assert all(s > 0 for s in scores)
        assert scores == sorted(scores, reverse=True)


class TestNgramNoveltyOracleTwin:
    def test_duckdb_twin_matches_dataframe_build(self, spark, duck):
        """Per-doc first-occurrence novelty over distinct char
        8-grams (n_novel from grouping the min-doc-per-gram table by
        its own first_doc — never a gram-grain join back), ppb as one
        truncating integer division. The r13 ``q_ngram_novelty``
        registration, pinned RAW."""
        import pandas as pd

        from gasket_spark.queries import QUERIES

        sf = "/root/testdata/sf0.01"
        got = sorted(tuple(r) for r in
                     QUERIES["q_ngram_novelty"](spark, sf).collect())

        duck.register("ndocs", pd.read_parquet(
            f"{sf}/documents.parquet")[["doc_id", "text"]])
        try:
            want = sorted(map(tuple, duck.execute("""
              WITH grams AS (
                SELECT DISTINCT doc_id, tok FROM (
                  SELECT doc_id, unnest(list_transform(
                    range(1, greatest(length(text) - 7, 0) + 1),
                    i -> substr(text, i, 8))) AS tok
                  FROM ndocs)),
              per_doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT)
                            AS n_grams FROM grams GROUP BY doc_id),
              firsts AS (SELECT tok, MIN(doc_id) AS first_doc
                         FROM grams GROUP BY tok),
              novel AS (SELECT first_doc AS doc_id,
                               CAST(COUNT(*) AS BIGINT) AS n_novel
                        FROM firsts GROUP BY first_doc)
              SELECT p.doc_id, p.n_grams,
                     CAST(COALESCE(n.n_novel, 0) AS BIGINT) AS n_novel,
                     CAST(COALESCE(n.n_novel, 0) AS BIGINT)
                       * 1000000000 // p.n_grams AS novelty_ppb
              FROM per_doc p LEFT JOIN novel n USING (doc_id)"""
              ).fetchall()))
        finally:
            duck.unregister("ndocs")
        assert got == want and len(got) >= 400
        # structural invariants: doc 0's grams are all novel; every
        # gram is novel somewhere (sum(n_novel) = |distinct grams|)
        d0 = next(r for r in got if r[0] == 0)
        assert d0[1] == d0[2] and d0[3] == 1000000000
        assert all(0 <= r[2] <= r[1] for r in got)


"""Python user-defined TABLE functions (Spark 4 ``@udtf``) — the
row-to-rows module-stage surface.

gasket's module stage transforms a stream through user code one
record at a time (reference index.js:117-141, `compileModule`); its
natural Spark 4 analog for stages that EMIT MULTIPLE ROWS per input
record is a UDTF used as a LATERAL table function::

    SELECT d.doc_id, r.*
    FROM docs d, LATERAL token_runs(d.text) r

The engine's pipeline module stages (pipeline/stages.py) cover the
row-to-row and whole-stream shapes; this module covers the
row-to-table shape with the same determinism discipline: pure
functions of the input row, no state, so output is partition- and
replay-invariant and an ANSI-SQL oracle can restate it exactly
(token_runs ≡ gaps-and-islands over unnested tokens — the planned
r12 ``q_udtf_runs`` oracle).

Scale note: a UDTF runs per-row in a Python worker (Arrow-batched
transfer, interpreted eval) — the right home for genuinely imperative
row-to-table logic; anything expressible as explode/transform should
stay JVM-side instead (the repo's standing UDF rule).
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="run_idx int, token string, start_pos int, run_len int")
class TokenRuns:
    """Run-length encoding of a doc's token stream: one row per
    MAXIMAL run of consecutive identical tokens — (run index, token,
    1-based token position of the run start, run length). The RLE
    grain feeds repetition filters (a run_len >= k gate is the
    'aaaa...' degenerate-generation detector) and is the exact
    information needed to reconstruct the stream (lossless)."""

    def eval(self, text: str):  # noqa: D102 — contract in class doc
        if text is None:
            return
        toks = text.split(" ")
        i, idx = 0, 0
        while i < len(toks):
            j = i
            while j < len(toks) and toks[j] == toks[i]:
                j += 1
            yield idx, toks[i], i + 1, j - i
            idx += 1
            i = j


def register_udtfs(spark) -> None:
    """Register every UDTF under its SQL name (idempotent)."""
    spark.udtf.register("token_runs", TokenRuns)

"""[EXT] The remaining tiers of Spark's user-defined-function surface
(SURVEY.md §2.10): a Python UDTF (table function) and a grouped-aggregate
pandas UDAF. The reference registers zero engine UDFs (all custom logic is
host Python between queries) and this engine keeps that stance — built-in
column expressions first, Arrow-vectorized pandas UDFs where Python is
unavoidable (similarity/multimodal kernels), and these two entries complete
the API coverage for the cases the other tiers can't express:

- UDTF: one input row -> many output rows with *stateful per-row logic*
  (run-length encoding needs sequential state a generator expresses
  naturally; the pure-SQL equivalent is a lag + change-marker + cumulative
  window chain, which the DuckDB oracle uses to prove equivalence).
- grouped-agg pandas UDAF: a whole-group reduction to one scalar where the
  reduction is a selection (median), not a mergeable sum — Arrow ships the
  group as one pandas Series, NumPy reduces it vectorized.

Both are exact-integer / order-free-selection computations, so they sit
under the driver's exact-hash oracle gate despite crossing the Python
boundary.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

TOKEN_RE = re.compile(r"[^a-z]+")
# ascii_folded contract (operators/text.py): strip non-ASCII-letters
# BEFORE lower() — Python lower('İ') is the full mapping ('i'+U+0307)
# while DuckDB's utf8proc lower is the simple map, so un-stripped
# lowering tokenizes differently per engine.
TOKEN_STRIP = re.compile(r"[^A-Za-z]+")


class TokenRunsUDTF:
    """Run-length encoder over a document's token stream: one row per
    maximal run of identical consecutive tokens, with the 1-based token
    position where the run starts. Sequential state (current run) lives in
    plain Python locals — the natural UDTF shape."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        toks = [t for t in TOKEN_RE.split(TOKEN_STRIP.sub(" ", text).lower()) if t]
        if not toks:
            return
        run_start, run_term = 1, toks[0]
        for i, tok in enumerate(toks[1:], start=2):
            if tok != run_term:
                yield run_start, run_term, i - run_start
                run_start, run_term = i, tok
        yield run_start, run_term, len(toks) + 1 - run_start


def token_runs(spark, docs, id_col: str = "doc_id", text_col: str = "text"):
    """Lateral-apply the run-length UDTF per document. The UDTF evaluates
    inside the scan stage (no shuffle); rows fan out like any generator."""
    # udtf()/pandas_udf() parse their return types against the active
    # session, so construction is deferred to call time (a module-level
    # decorator would demand a SparkContext at import).
    spark.udtf.register(
        "token_runs_udtf",
        udtf(TokenRunsUDTF, returnType="run_start int, term string, run_len int"),
    )
    # unique per CALL (review r5: a name keyed only on the column names
    # let a second call over a DIFFERENT frame replace the view between
    # this call's registration and its spark.sql analysis — silently
    # computing runs over the other frame; salted hash() also varied the
    # leaked view name per process)
    from .._names import uid_name

    view = f"_{uid_name('docs_for_runs', width=12)}"
    docs.createOrReplaceTempView(view)
    try:
        # spark.sql ANALYZES eagerly: the returned DataFrame holds the
        # resolved plan, so the catalog entry can be dropped immediately
        # (advice r5: leaving one uuid-named view per call leaked a
        # catalog entry + plan reference for the session lifetime across
        # bench min-of-N loops and long test sessions).
        return spark.sql(
            f"SELECT d.{id_col}, r.run_start, r.term, r.run_len "
            f"FROM {view} d, LATERAL token_runs_udtf(d.{text_col}) r"
        )
    finally:
        spark.catalog.dropTempView(view)


def token_runs_builtin(docs, id_col: str = "doc_id", text_col: str = "text"):
    """Built-in twin of the UDTF: the same run-length output computed as
    the lag + change-marker + cumulative-sum window chain, entirely
    JVM-side (whole-stage codegen — the Python boundary is never
    crossed). This tier carries the bench flag (VERDICT r8 item 5): the
    UDTF twin exists to DEMONSTRATE the UDF surface, so its >2x wall is
    the per-row Python tax by construction — benchmarking it measured the
    demonstration, not a plan. Result equality of the two tiers is
    pinned in tests; both share the one DuckDB oracle.

    Plan shape: the tokenize+posexplode is map-side; the window shuffles
    once on the doc key; the run groupBy reuses that partitioning
    (HashPartitioning(doc_id) satisfies the clustered distribution on
    (doc_id, run_id)) — one exchange total at any scale."""
    from ..session import fan_out

    # The regex tokenize + posexplode run in the SCAN stage: a few-file
    # local input caps them at file-count parallelism (r11 measure: the
    # whole Generate stage on ONE task). fan_out widens CPU-heavy per-row
    # work exactly like the minhash/tfidf kernels (gated no-op at real
    # partition counts); measured 0.46 -> 0.37 s at sf0.1, rows identical
    # (round-robin repartition is deterministic and the window re-keys by
    # doc).
    docs = fan_out(docs, divisor=2)
    # selectExpr strings (r11 construction pass — see _names.sql_ident):
    # identical tokenize/lag/cumsum trees at a fraction of the py4j
    # round-trips; the CASE's <=> is the eqNullSafe the Column form used
    # (first row of each doc: lag NULL starts run 1; term itself is
    # never NULL after the filter)
    from .._names import sql_ident as _q

    over = f"OVER (PARTITION BY {_q(id_col)} ORDER BY pos)"
    toks = docs.selectExpr(
        _q(id_col),
        f"posexplode(filter(split(lower(regexp_replace({_q(text_col)}, "
        "'[^A-Za-z]+', ' ')), '[^a-z]+'), x -> x != '')) AS (pos0, term)",
    ).selectExpr(_q(id_col), "(pos0 + 1) AS pos", "term")
    return (
        toks.selectExpr(
            "*",
            f"sum(CASE WHEN (lag(term) {over}) <=> term THEN 0 ELSE 1 END) "
            f"{over} AS run_id",
        )
        .groupBy(id_col, "run_id", "term")
        .agg(
            F.min("pos").cast("int").alias("run_start"),
            F.count(F.lit(1)).cast("int").alias("run_len"),
        )
        .select(id_col, "run_start", "term", "run_len")
    )


def token_runs_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin: the same run-length encoding as a lag + change-marker +
    cumulative-sum window chain — the SQL shape the UDTF replaces."""
    return f"""
WITH toks AS (
    SELECT {id_col},
           unnest(list_filter(string_split_regex(lower(regexp_replace({text_col}, '[^A-Za-z]+', ' ', 'g')), '[^a-z]+'),
                              x -> x <> '')) AS term,
           generate_subscripts(list_filter(string_split_regex(lower(regexp_replace({text_col}, '[^A-Za-z]+', ' ', 'g')),
                              '[^a-z]+'), x -> x <> ''), 1) AS pos
    FROM {table}
),
marked AS (
    SELECT {id_col}, term, pos,
           CASE WHEN lag(term) OVER w IS DISTINCT FROM term THEN 1 ELSE 0 END AS chg
    FROM toks WINDOW w AS (PARTITION BY {id_col} ORDER BY pos)
),
runs AS (
    SELECT {id_col}, term, pos,
           SUM(chg) OVER (PARTITION BY {id_col} ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS run_id
    FROM marked
)
SELECT {id_col},
       CAST(MIN(pos) AS INTEGER) AS run_start,
       term,
       CAST(COUNT(*) AS INTEGER) AS run_len
FROM runs
GROUP BY {id_col}, run_id, term
"""


def _median_udaf():
    @pandas_udf("double")
    def median_udaf(v: pd.Series) -> float:
        # Even-count median uses quantile_cont's OWN interpolation
        # expression lo*0.5 + hi*0.5, NOT np.median's (lo+hi)/2 (review
        # r7, verified: the sum overflows to inf for two huge same-sign
        # doubles — [1e308, 1.5e308] -> inf vs DuckDB's 1.25e308 — while
        # the multiply-first form cannot; odd counts are pure selection).
        # NULLs are dropped like any SQL aggregate. Documented divergence:
        # a GENUINE NaN input is indistinguishable from an Arrow-rendered
        # NULL in a float64 Series, so it is dropped too, where DuckDB's
        # median ranks NaN as the largest value (same conflation class as
        # streaming/stateful.py; no testdata or sweep fixture carries NaN
        # measures, and parquet round-trips preserve them only from
        # sources this engine does not generate).
        arr = np.sort(v.dropna().to_numpy())
        n = arr.size
        if n == 0:
            return None
        if n % 2:
            return float(arr[n // 2])
        return float(arr[n // 2 - 1] * 0.5 + arr[n // 2] * 0.5)

    return median_udaf


def grouped_median(df, group_cols: list[str], value_col: str):
    """Per-group median via a grouped-aggregate pandas UDAF: Arrow ships
    each group's values as one Series; the group key drives the shuffle
    exactly like a built-in aggregate (partial aggregation does NOT apply —
    median is not mergeable, which is why this is the UDAF example and not
    a built-in rewrite)."""
    return df.groupBy(*group_cols).agg(
        _median_udaf()(F.col(value_col)).alias(f"median_{value_col}")
    )


def arrow_doc_stats(docs, id_col: str = "doc_id", text_col: str = "text"):
    """mapInArrow tier: per-document character/byte stats computed by
    pyarrow compute kernels directly on the Arrow RecordBatch — no pandas
    materialization at all (the zero-copy tier below mapInPandas; right
    when the kernel is itself Arrow-native). Integer outputs of identical
    semantics on both engines (utf8_length = codepoints = SQL length;
    binary_length of the utf8 bytes = octet_length), so fully
    oracle-checked."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from pyspark.sql import types as T

    # honor id_col's NAME and TYPE (review r5: the hardcoded 'doc_id
    # long' schema crashed on non-long ids and silently renamed others)
    id_type = docs.schema[id_col].dataType
    out_schema = T.StructType(
        [
            T.StructField(id_col, id_type),
            T.StructField("n_chars", T.LongType()),
            T.StructField("n_bytes", T.LongType()),
        ]
    )

    def kernel(batches):
        for batch in batches:
            txt = batch.column(text_col)
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column(id_col),
                    pc.cast(pc.utf8_length(txt), pa.int64()),
                    pc.cast(pc.binary_length(pc.cast(txt, pa.binary())), pa.int64()),
                ],
                [id_col, "n_chars", "n_bytes"],
            )

    return docs.select(id_col, text_col).mapInArrow(kernel, out_schema)

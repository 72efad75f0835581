#!/usr/bin/env python
"""Build adversarial copies of a testdata dir for full-catalog sweeps.

Usage:
    python tools/null_fixture.py [src_dir] [dst_dir]           # NULL injection
    python tools/null_fixture.py --dups [src_dir] [dst_dir]    # duplicate keys/ts
    python tools/null_fixture.py --empty [src_dir] [dst_dir]   # zero-row tables
    python tools/null_fixture.py --extreme [src_dir] [dst_dir] # extreme values
    python tools/null_fixture.py --timewarp [src_dir] [dst_dir] # epoch-edge ts
    python tools/null_fixture.py --nullts [src_dir] [dst_dir]  # NULL event times
    python tools/null_fixture.py --nullkeys [src_dir] [dst_dir] # NULL id/entity keys
    python tools/null_fixture.py --uniws [src_dir] [dst_dir]   # unicode ws/invisibles
    python tools/null_fixture.py --ragged [src_dir] [dst_dir]  # ragged embedding dims
    python tools/null_fixture.py --badjson [src_dir] [dst_dir] # malformed JSON props
    python tools/null_fixture.py --orphans [src_dir] [dst_dir] # orphan foreign keys
    python tools/null_fixture.py --giantdoc [src_dir] [dst_dir] # degenerate doc sizes
    python tools/null_fixture.py --tieflood [src_dir] [dst_dir] # ordering-column tie floods
    python tests/driver_sim.py <dst_dir>                       # the sweep

--extreme injects domain-edge values a 100 TB corpus WILL contain:
unicode case-mapping traps in document text (Turkish dotted-İ, German ß,
final-sigma Greek, NFD combining marks, emoji/ZWJ, CJK, RTL scripts),
empty/whitespace-only/regex-metacharacter documents, signed zeros and
magnitude-edge doubles in event values (exact binary fractions only:
a double with >15 significant decimal digits casts to DECIMAL via the
shortest-string repr in Spark but via the binary value in DuckDB, so
decimal-cast rounding of such inputs is engine-private by nature —
same class as the documented ROUND() trap), JSON props with unicode values
and escaped quotes, and zero-norm / 1e-20-norm / 1e9-norm embedding
vectors (cosine guards, magnitude edges; 1e9 keeps the k-means
fixed-point update inside int64 — embedding components are unit-scale
by contract, this already probes 9 orders beyond it).

--dups duplicates ~10% of events at the SAME (user_id, ts) under new
event ids (double-fire) and re-appends some lineitem natural-key rows —
the class that breaks any window ordered by ts without an id tiebreak
and any ASOF with unresolved right-side ties (165/165 green round 3
after the tiebreak hardening).

Injects NULLs into ~10% of rows of every non-key column (keys and join
columns stay intact), then the driver-contract simulation hash-compares
every catalog query against its oracle on that data. Round 3 this sweep
found: a NULL_MAP_KEY crash, an MLlib HashingTF NPE (Catalyst reorders
UDF predicates ahead of null filters), zero-signature SimHash pairing all
null docs, per-column last(ignorenulls) splitting an as-of row, NULLS
FIRST/LAST lag-chain divergence, concat_ws-vs-|| null-element divergence.
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from billing_data_pipeline_spark.sources.tables import TABLES  # noqa: E402

NULLABLE = {
    "events": ["value", "props", "event_type"],
    "documents": ["text", "lang", "source"],
    # measures went nullable in r8: a first probe run was 165/165 green —
    # the dsum_sql/exact-decimal discipline and COUNT(col) divisors
    # already NULL-align — so the class is locked in at zero cost
    "lineitem": [
        "l_shipdate",
        "l_comment",
        "l_quantity",
        "l_extendedprice",
        "l_discount",
        "l_tax",
    ],
    "orders": ["o_comment", "o_clerk", "o_totalprice"],
    "customer": ["c_mktsegment", "c_comment"],
    "part": ["p_comment"],
    "supplier": ["s_comment"],
    "nation": ["n_comment"],
    "region": ["r_comment"],
    # embedding itself went nullable in r8 (NULL-embedding contract:
    # similarity kernels and their oracles both exclude vector-less rows;
    # before this the sweep never exercised that contract)
    "embeddings": ["label", "embedding"],
}



def build(src: str, dst: str) -> str:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM '{src}/{t}.parquet'"
            ).fetchall()
        ]
        exprs = [
            (
                f"CASE WHEN hash(rowid_x || '{c}') % 10 = 0 THEN NULL "
                f"ELSE {c} END AS {c}"
                if c in NULLABLE.get(t, [])
                else c
            )
            for c in cols
        ]
        con.execute(
            f"COPY (SELECT {', '.join(exprs)} FROM ("
            f"SELECT *, row_number() OVER () AS rowid_x "
            f"FROM '{src}/{t}.parquet')) TO '{dst}/{t}.parquet' "
            f"(FORMAT PARQUET)"
        )
    return dst


def build_empty(src: str, dst: str) -> str:
    """Schema-preserving ZERO-ROW copies of every table — the graceful-
    degradation sweep (165/165 green round 3 after empty guards in the
    ANN/k-means seeding, the stream-flush sentinel anchor, and HAVING
    n > 0 on the grouping-set queries — on empty input DuckDB emits the
    standard's grand-total row while Spark emits none)."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet' WHERE 1=0) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    return dst


def build_dups(src: str, dst: str) -> str:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
                  SELECT event_id, ts, user_id, event_type, value, props
                  FROM '{src}/events.parquet'
                  UNION ALL
                  SELECT event_id + 1000000, ts, user_id,
                         CASE WHEN event_id % 3 = 0 THEN 'click'
                              ELSE event_type END,
                         value + 1.0, props
                  FROM '{src}/events.parquet' WHERE event_id % 10 = 0
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "lineitem":
            con.execute(
                f"""COPY (
                  SELECT * FROM '{src}/lineitem.parquet'
                  UNION ALL
                  SELECT * FROM '{src}/lineitem.parquet'
                  WHERE l_orderkey % 50 = 0
                ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


EXTREME_TEXTS = [
    "深度学习模型训练数据管道去重与相似检索流水线测试语料样本",
    "rocket \U0001F680 family \U0001F469‍\U0001F469‍\U0001F467‍\U0001F466 café naïve résumé",
    "İstanbul DİYARBAKIR Iı İİİ iiii",
    "STRASSE Straße ß ẞ GROSS",
    "école å français déjà vu",
    "",
    "   \t   ",
    "a.b*c+d(e)f[g]h|i\\j$k^ {m,n}? end",
    "vertical\x0btab and form\x0cfeed to\tkens split here paritycheck",
    "مرحبا world שלום עולם mixed",
    "ΟΔΟΣ ΣΟΦΟΣ οδος σοφος Σσς",
]

EXTREME_PROPS = [
    '{"k": -0}',
    '{"k": null}',
    '{"k": 3, "s": "日本語"}',
    '{"k": 7, "q": "a\\"b"}',
    '{"k": 2147483647}',
]


# --- r9: unicode whitespace & invisible characters -----------------------
# The r4 extreme corpus probes case traps and \x0B; this class probes the
# OTHER unicode text hazard: separators and invisibles where the three
# engines' notions of "whitespace" and "character" can part ways.
# Contract under test: \s means the JAVA ASCII set [ \t\n\x0B\f\r] on all
# three engines (JAVA_WS_SPLIT_SQL in oracles, re.ASCII in Python
# kernels), so NBSP/ideographic-space/NEL/LS/PS do NOT split tokens;
# invisibles (ZWSP/ZWJ/soft-hyphen/word-joiner/BOM) ride INSIDE tokens;
# lengths count codepoints (never UTF-16 units or graphemes) — astral
# letters count 1.
UNIWS_TEXTS = [
    # NBSP / narrow-NBSP / thin-space separated words: NOT \\s on any
    # engine under the Java-ASCII contract -> they ride INSIDE tokens
    "alpha\u00a0beta\u202fgamma\u2009delta plain end",
    # ideographic space + em space between CJK and latin runs
    "\u6570\u636e\u3000\u7ba1\u9053\u2003pipeline quality token",
    # NEL / line-separator / paragraph-separator as would-be newlines
    "first\u0085second\u2028third\u2029fourth real\nnewline",
    # zero-width space / ZWJ / word-joiner / soft hyphen INSIDE words
    "zero\u200bwidth zw\u200dj word\u2060joiner soft\u00adhyphen",
    # BOM at start and mid-text
    "\ufeffbom lead and mid\ufeffbom tail",
    # astral-plane letters: length must count codepoints (1 each)
    "math \U0001d524\U0001d52f\U0001d52a letters \U00010330\U00010344 end",
    # NFD combining sequences (precomposed twins live in EXTREME_TEXTS)
    "de\u0301ja\u0300 vu a\u030angstro\u0308m cafe\u0301",
    # document of ONLY non-ASCII whitespace: one un-split 'token', and
    # ASCII trim()/\\s+ must not erase it
    "\u00a0\u3000\u2007\u205f",
    # mixed CRLF + unicode newline soup around tokens
    "win\r\ndows\rmac\nunix\u0085mixed",
    # RTL with explicit directional marks riding inside tokens
    "\u200f\u0645\u0631\u062d\u0628\u0627\u200e ltr\u200e rtl\u200f end",
]


def build_uniws(src: str, dst: str) -> str:
    """Unicode-whitespace / invisible-character injection (~12% of docs,
    ~8% of event props), keys intact. See UNIWS_TEXTS for the classes;
    n_chars is kept consistent (codepoint length of the new text)."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    texts = "[" + ", ".join(
        "'" + t.replace("'", "''") + "'" for t in UNIWS_TEXTS
    ) + "]"
    n = len(UNIWS_TEXTS)
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (
                  SELECT doc_id,
                         CASE WHEN hash(doc_id || 'uw') % 8 = 0 THEN
                           {texts}[CAST(1 + hash(doc_id || 'upick') % {n} AS BIGINT)]
                         ELSE text END AS text,
                         lang, source,
                         CASE WHEN hash(doc_id || 'uw') % 8 = 0 THEN
                           length({texts}[CAST(1 + hash(doc_id || 'upick') % {n} AS BIGINT)])
                         ELSE n_chars END AS n_chars
                  FROM '{src}/documents.parquet'
                ) TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
            )
        elif t == "events":
            # JSON string values carrying NBSP / ZWSP / astral chars —
            # the get_json_object / to_json parse paths
            con.execute(
                f"""COPY (
                  SELECT event_id, ts, user_id, event_type, value,
                         CASE WHEN hash(event_id || 'uwp') % 12 = 0 THEN
                           '{{"k": 1, "s": "nb sp z​w \U0001d524"}}'
                         ELSE props END AS props
                  FROM '{src}/events.parquet'
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


def build_ragged(src: str, dst: str) -> str:
    """Ragged embedding DIMENSIONS (r9) — a 100 TB lake WILL carry a few
    wrong-length vectors (truncated downloads, mixed model versions,
    empty arrays). ~15% of embeddings mutate: 1/20 truncated to 48 dims,
    1/20 extended to 68 (exact-binary 0.25 padding), 1/20 emptied.
    Contract under test: a vector whose length differs from the
    operator's declared dimension carries no geometry — excluded on
    BOTH engines exactly like a NULL vector (the r8 NULL-embedding
    contract's missing half; plans/ml.py's k-means paths already
    enforced len = DIM, the similarity operators did not)."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    pad = ", ".join(["CAST(0.25 AS FLOAT)"] * 4)
    for t in TABLES:
        if t == "embeddings":
            con.execute(
                f"""COPY (
                  SELECT vec_id,
                         CASE hash(vec_id || 'rg') % 20
                           WHEN 0 THEN embedding[1:48]
                           WHEN 1 THEN list_concat(embedding, [{pad}])
                           WHEN 2 THEN CAST([] AS FLOAT[])
                           ELSE embedding
                         END AS embedding,
                         label
                  FROM '{src}/embeddings.parquet'
                ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


# --- r9: malformed / adversarial JSON props --------------------------------
# Precondition-respecting garbage only: $.k is an int32 JSON INTEGER,
# JSON null, or absent/unreachable. Non-integer numerics, string-numeric
# "7", booleans, and duplicate keys are EXCLUDED by the documented tier
# precondition (plans/relational.py _JSON_ROLLUP_ORACLE): the four
# extraction APIs (get_json_object, variant_get, from_json, DuckDB
# json_extract) disagree four ways on them BY DESIGN.
BADJSON_PROPS = [
    '{"k": 1',          # truncated object -> malformed
    '',                 # empty string -> malformed
    '42',               # bare scalar root: no $.k
    'null',             # JSON null root
    '[1, 2]',           # array root
    '"bare"',           # string root
    '{ }',              # empty object
    '{"K": 5}',         # path is case-sensitive: miss
    '{"k": null}',      # explicit null value
    '{"k": [1]}',       # array value: not an integer
    '{"k": {"x": 1}}',  # object value: not an integer
    '{"k": 7}',         # control: still parsed on every tier
]


def build_badjson(src: str, dst: str) -> str:
    """Malformed/adversarial JSON in ~25% of events.props (r9). First run
    found two Spark JOB KILLS (ANSI CAST_INVALID_INPUT in the string
    tier, MALFORMED_RECORD_IN_PARSING / INVALID_VARIANT_CAST in the
    variant tier) and a DuckDB oracle error (json_extract on malformed
    input); contract after the fix: unparseable props / missing /
    non-integer k => NULL k_val, all tiers, both engines."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    props = "[" + ", ".join(
        "'" + p_.replace("'", "''") + "'" for p_ in BADJSON_PROPS
    ) + "]"
    n = len(BADJSON_PROPS)
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
                  SELECT event_id, ts, user_id, event_type, value,
                         CASE WHEN hash(event_id || 'bj') % 4 = 0 THEN
                           {props}[CAST(1 + hash(event_id || 'bjp') % {n} AS BIGINT)]
                         ELSE props END AS props
                  FROM '{src}/events.parquet'
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


def build_orphans(src: str, dst: str) -> str:
    """Referential-integrity breaks (r9) — a lake's joins meet orphan keys
    constantly (late dims, deleted parents, fat-fingered ids):

    - events: ~10% of user_id retargeted beyond the customer key space
      (every user-dim join sees dangling event rows);
    - lineitem: ~5% of l_orderkey to a nonexistent order, ~5% of
      l_partkey/l_suppkey orphaned (TPC-H join chains lose rows);
    - orders: ~5% of o_custkey orphaned (customer rollups);
    - customer: ~10% of c_nationkey -> 99 (no such nation: the
      dim-chain region joins drop them).

    Expectation: inner joins drop orphans IDENTICALLY on both engines
    (shared SQL), so this probe is a mechanical check that no operator
    assumes integrity via a driver-side lookup (dict KeyError class) or
    an outer-join asymmetry."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
                  SELECT event_id, ts,
                         CASE WHEN hash(event_id || 'ou') % 10 = 0
                              THEN user_id + 10000000 ELSE user_id END AS user_id,
                         event_type, value, props
                  FROM '{src}/events.parquet'
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "lineitem":
            con.execute(
                f"""COPY (
                  SELECT
                    CASE WHEN hash(l_orderkey || l_linenumber || 'oo') % 20 = 0
                         THEN l_orderkey + 100000000 ELSE l_orderkey END AS l_orderkey,
                    CASE WHEN hash(l_orderkey || l_linenumber || 'op') % 20 = 7
                         THEN l_partkey + 100000000 ELSE l_partkey END AS l_partkey,
                    CASE WHEN hash(l_orderkey || l_linenumber || 'os') % 20 = 13
                         THEN l_suppkey + 100000000 ELSE l_suppkey END AS l_suppkey,
                    * EXCLUDE (l_orderkey, l_partkey, l_suppkey)
                  FROM '{src}/lineitem.parquet'
                ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
            )
        elif t == "orders":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN hash(o_orderkey || 'oc') % 20 = 0
                         THEN o_custkey + 100000000 ELSE o_custkey END AS o_custkey)
                  FROM '{src}/orders.parquet'
                ) TO '{dst}/orders.parquet' (FORMAT PARQUET)"""
            )
        elif t == "customer":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN hash(c_custkey || 'on') % 10 = 0
                         THEN 99 ELSE c_nationkey END AS c_nationkey)
                  FROM '{src}/customer.parquet'
                ) TO '{dst}/customer.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


def build_giantdoc(src: str, dst: str) -> str:
    """Degenerate document SIZES (r9): one ~200 KB highly-repetitive
    document (~35k tokens of one repeated sentence) and one 100 KB
    single-token document join the corpus. The 4 MB probe version of this
    fixture found DuckDB's list-slice-in-lambda going QUADRATIC (88 GB
    RSS) in four oracles — all rewritten to O(1) element accesses — and
    proved every Spark kernel linear (PLANS.md r9). The standing fixture
    stays at ~35k tokens because packed_chunk_bins' RECURSIVE pack oracle
    is quadratic in chunks-per-doc by construction (~1.1k chunks ≈ 10 s;
    the 22k chunks of a 4 MB doc exceed any sweep budget — the OPERATOR
    is linear, measured 10.4 s on the 4 MB doc)."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    big = ("the quick brown fox jumps over the lazy dog and keeps going "
           * 3500)[:200_000]
    one_token = "x" * 100_000
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (
                  SELECT doc_id, text, lang, source, n_chars
                  FROM '{src}/documents.parquet'
                  UNION ALL SELECT 900001, ?, 'en', 'giant', length(?)
                  UNION ALL SELECT 900002, ?, 'en', 'giant', length(?)
                ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""",
                [big, big, one_token, one_token],
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


def build_nullts(src: str, dst: str) -> str:
    """~10% of events lose their TIMESTAMP entirely (r8) — the one edge
    the base NULL sweep deliberately avoids (ts is an ordering/join
    column). Contract exercised: a row with no event time has no time
    bucket, no session, no watermark horizon, and can neither anchor nor
    answer an as-of probe — Spark's window()/session_window()/watermark
    operators drop such rows natively; every time-windowed oracle states
    it with ts IS NOT NULL; DuckDB's ASOF JOIN is bypassed for NULL
    probes (its NULL handling is engine-private — it matched a NULL
    anchor to the LATEST row). First run found 9 divergences in 4
    classes, all fixed in-round."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
                  SELECT event_id,
                         CASE WHEN hash(event_id || 'nts') % 10 = 0
                              THEN NULL ELSE ts END AS ts,
                         user_id, event_type, value, props
                  FROM '{src}/events.parquet'
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


def build_nullkeys(src: str, dst: str) -> str:
    """NULL identity/entity keys in events (r8): ~8% of user_id (the
    entity key — windows, sessions, joins, stateful streaming) and a
    DISJOINT-ish ~5% of event_id (the tiebreak/dedup identity) go NULL.
    First run found 5 divergences in 4 classes, all fixed in-round:
    applyInPandasWithState KILLED the stream emitting a NULL group key
    through a non-nullable output field; dropDuplicatesWithinWatermark's
    NULL = NULL equality collapsed every NULL-key row into one (now:
    full-row-hash identity, the batch ingest's contract); a NULL
    tiebreak id NULLed the OHLC oracles' arithmetic arg_min key (row
    skipped) while Spark's struct key ranked it (now: COALESCE(-1) both
    sides); and a USING(event_id) oracle self-join silently dropped
    NULL-id error rows a plain filter keeps."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
                  SELECT CASE WHEN hash(event_id || 'nid') % 20 = 0
                              THEN NULL ELSE event_id END AS event_id,
                         ts,
                         CASE WHEN hash(event_id || 'nuk') % 12 = 0
                              THEN NULL ELSE user_id END AS user_id,
                         event_type, value, props
                  FROM '{src}/events.parquet'
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


def build_timewarp(src: str, dst: str) -> str:
    """Epoch-edge timestamps a 100 TB archive WILL contain: ~10% of events
    re-timed to pre-1970 (negative epoch micros), exactly epoch 0, epoch
    -1 µs, and far-future (+200 y) instants; ~10% of orders (and their
    date-bearing lineitem columns) shifted 60 years before 1970. Probes
    floor-vs-truncate integer division on negative epochs (DuckDB's `//`
    and BIGINT casts truncate toward zero; Spark's window()/floor()
    floor), day-bucketing, session gaps, as-of ordering, range frames and
    watermark arithmetic across the 1970 boundary. Keys intact."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
                  SELECT event_id,
                         CASE WHEN hash(event_id || 'tw') % 10 = 0 THEN
                           CASE hash(event_id || 'twp') % 5
                             WHEN 0 THEN ts - INTERVAL 100 YEAR
                             WHEN 1 THEN TIMESTAMP '1970-01-01 00:00:00'
                             WHEN 2 THEN TIMESTAMP '1969-12-31 23:59:59.999999'
                             WHEN 3 THEN ts + INTERVAL 200 YEAR
                             ELSE TIMESTAMP '1969-07-20 20:17:40'
                           END
                         ELSE ts END AS ts,
                         user_id, event_type, value, props
                  FROM '{src}/events.parquet'
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "orders":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN hash(o_orderkey || 'tw') % 10 = 0
                         THEN o_orderdate - INTERVAL 60 YEAR
                         ELSE o_orderdate END AS o_orderdate)
                  FROM '{src}/orders.parquet'
                ) TO '{dst}/orders.parquet' (FORMAT PARQUET)"""
            )
        elif t == "lineitem":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN hash(l_orderkey || 'tw') % 10 = 0
                         THEN l_shipdate - INTERVAL 60 YEAR
                         ELSE l_shipdate END AS l_shipdate)
                  FROM '{src}/lineitem.parquet'
                ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


def build_extreme(src: str, dst: str) -> str:
    """Domain-edge values, keys intact: unicode/empty/metachar document
    text (n_chars kept consistent), signed-zero / magnitude-edge event
    values, unicode-and-escape JSON props, and zero-norm / tiny-norm /
    huge-norm embedding vectors. ~10-15% of rows per table touched."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    texts = "[" + ", ".join(
        "'" + t.replace("'", "''") + "'" for t in EXTREME_TEXTS
    ) + "]"
    props = "[" + ", ".join(
        "'" + p.replace("'", "''") + "'" for p in EXTREME_PROPS
    ) + "]"
    for t in TABLES:
        if t == "documents":
            con.execute(
                f"""COPY (
                  SELECT doc_id,
                         CASE WHEN hash(doc_id || 'xt') % 8 = 0 THEN
                           {texts}[CAST(1 + hash(doc_id || 'pick') % 11 AS BIGINT)]
                         ELSE text END AS text,
                         lang, source,
                         CASE WHEN hash(doc_id || 'xt') % 8 = 0 THEN
                           length({texts}[CAST(1 + hash(doc_id || 'pick') % 11 AS BIGINT)])
                         ELSE n_chars END AS n_chars
                  FROM '{src}/documents.parquet'
                ) TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
            )
        elif t == "events":
            con.execute(
                f"""COPY (
                  SELECT event_id, ts, user_id, event_type,
                         CASE WHEN hash(event_id || 'xv') % 10 = 0 THEN
                           CASE hash(event_id || 'vp') % 5
                             WHEN 0 THEN CAST('-0.0' AS DOUBLE)
                             WHEN 1 THEN CAST('-98765.432109' AS DOUBLE)
                             WHEN 2 THEN CAST('999999999999.25' AS DOUBLE)
                             WHEN 3 THEN CAST('1e-6' AS DOUBLE)
                             ELSE CAST('0.0' AS DOUBLE)
                           END
                         ELSE value END AS value,
                         CASE WHEN hash(event_id || 'xp') % 12 = 0 THEN
                           {props}[CAST(1 + hash(event_id || 'pp') % 5 AS BIGINT)]
                         ELSE props END AS props
                  FROM '{src}/events.parquet'
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "embeddings":
            con.execute(
                f"""COPY (
                  SELECT vec_id,
                         CASE hash(vec_id || 'xe') % 20
                           WHEN 0 THEN list_transform(
                             embedding, x -> CAST(0.0 AS FLOAT))
                           WHEN 1 THEN list_transform(
                             embedding, x -> CAST(x * 1e-20 AS FLOAT))
                           WHEN 2 THEN list_transform(
                             embedding, x -> CAST(x * 1e9 AS FLOAT))
                           ELSE embedding
                         END AS embedding,
                         label
                  FROM '{src}/embeddings.parquet'
                ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


def build_skew(src: str, dst: str) -> str:
    """Pathological KEY SKEW a 100 TB corpus WILL contain — one bot user,
    one mega-order, one boilerplate template, one duplicated embedding:

    - events: ~60% of rows retargeted to ONE hot user_id (keeps event ids
      and values; creates duplicate (user, ts) instants inside the hot
      user, so every per-user window/session/asof exercises its id
      tiebreak under mass ties, and per-user aggregates see one group
      holding most of the table);
    - lineitem: ~40% of rows retargeted to ONE hot (l_orderkey,
      l_suppkey, l_partkey) that already exists — the orders/part/
      supplier joins stay referentially intact but funnel through a
      single join key (the AQE-skew / salting shape);
    - documents: ~50% of docs get a shared boilerplate sentence appended —
      one white-hot shingle/minhash band bucket (LSH candidate explosion
      is quadratic IN THE BUCKET; the exact-Jaccard oracle must still
      agree after the flood);
    - embeddings: ~30% of vectors replaced by ONE shared vector — ANN
      buckets, k-means assignment ties, and near-dup components all
      collapse onto a single centroid (argmin/argmax tie policy, giant
      connected component);
    - customer: ~80% of customers moved to ONE hot nation (region rollup
      group skew through two broadcast joins).

    Every oracle recomputes on the same skewed parquet, so the hash gate
    checks CORRECTNESS under skew; runtime staying bounded is the scale
    check (a candidate-pair or window materialization that is quadratic
    in a key's row count shows up here as a hang, not a hash diff)."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    hot = {
        "user": con.execute(
            f"SELECT min(user_id) FROM '{src}/events.parquet'"
        ).fetchone()[0],
        "order": con.execute(
            f"SELECT min(l_orderkey) FROM '{src}/lineitem.parquet'"
        ).fetchone()[0],
        "supp": con.execute(
            f"SELECT min(l_suppkey) FROM '{src}/lineitem.parquet'"
        ).fetchone()[0],
        "part": con.execute(
            f"SELECT min(l_partkey) FROM '{src}/lineitem.parquet'"
        ).fetchone()[0],
        "nation": con.execute(
            f"SELECT min(c_nationkey) FROM '{src}/customer.parquet'"
        ).fetchone()[0],
    }
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
                  SELECT event_id, ts,
                         CASE WHEN event_id % 5 < 3 THEN {hot['user']}
                              ELSE user_id END AS user_id,
                         event_type, value, props
                  FROM '{src}/events.parquet'
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "lineitem":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN l_linenumber % 5 < 2 THEN {hot['order']}
                         ELSE l_orderkey END AS l_orderkey,
                    CASE WHEN l_linenumber % 5 < 2 THEN {hot['supp']}
                         ELSE l_suppkey END AS l_suppkey,
                    CASE WHEN l_linenumber % 5 < 2 THEN {hot['part']}
                         ELSE l_partkey END AS l_partkey)
                  FROM '{src}/lineitem.parquet'
                ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
            )
        elif t == "documents":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN doc_id % 2 = 0 THEN text ||
                      ' subscribe to our newsletter terms of service apply all rights reserved'
                         ELSE text END AS text)
                  FROM '{src}/documents.parquet'
                ) TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
            )
        elif t == "embeddings":
            con.execute(
                f"""COPY (
                  SELECT vec_id,
                         CASE WHEN vec_id % 10 < 3 THEN (
                             SELECT embedding
                             FROM '{src}/embeddings.parquet'
                             ORDER BY vec_id LIMIT 1)
                              ELSE embedding END AS embedding,
                         label
                  FROM '{src}/embeddings.parquet'
                ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
            )
        elif t == "customer":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN c_custkey % 5 < 4 THEN {hot['nation']}
                         ELSE c_nationkey END AS c_nationkey)
                  FROM '{src}/customer.parquet'
                ) TO '{dst}/customer.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


def build_skewhot(src: str, dst: str) -> str:
    """EXTREME single-key skew (r10, VERDICT r9 item 7) — one key owning
    half-or-more of its table through the join / window / streaming
    tiers, plus a DEGENERATE identical-prefix document block that drives
    the r10 block-frequency caps for real:

    - events: ~80% of rows retargeted to ONE hot user_id — every
      per-user window, session, asof, streaming-stateful and
      streaming-dedup tier funnels through a single group/state key;
    - lineitem: ~50% of rows retargeted to ONE existing l_orderkey
      (ONLY the orderkey — unlike --skew's triple retarget, this isolates
      the orders join: one SMJ key owning half the fact table, the AQE
      skew-split shape);
    - orders: ~50% of orders retargeted to ONE existing o_custkey (the
      customer-side join + per-customer windows see one hot key);
    - documents: ~30% of docs get a shared 40-char PREFIX — one
      white-hot editdist prefix block (>> the 64 cap => dropped + the
      overflow companions go non-empty under the hash gate) and
      white-hot leading shingles (>> the shingle cap);
    - embeddings and the dimension tables pass through unchanged.

    Every oracle recomputes on the same skewed parquet: correctness
    under extreme skew is the hash gate; boundedness is the scale check;
    the plan-shape half (AQE skew=true split + salted-join partitioning)
    lives in tests/test_scale_patterns.py::test_aqe_skew_join_engages /
    test_salted_join_spreads_hot_key."""
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    hot_user = con.execute(
        f"SELECT min(user_id) FROM '{src}/events.parquet'"
    ).fetchone()[0]
    hot_order = con.execute(
        f"SELECT min(l_orderkey) FROM '{src}/lineitem.parquet'"
    ).fetchone()[0]
    hot_cust = con.execute(
        f"SELECT min(o_custkey) FROM '{src}/orders.parquet'"
    ).fetchone()[0]
    prefix = "all rights reserved subscribe today "  # 37 chars, tokenizes
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
                  SELECT event_id, ts,
                         CASE WHEN event_id % 5 < 4 THEN {hot_user}
                              ELSE user_id END AS user_id,
                         event_type, value, props
                  FROM '{src}/events.parquet'
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "lineitem":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN l_linenumber % 2 = 0 THEN {hot_order}
                         ELSE l_orderkey END AS l_orderkey)
                  FROM '{src}/lineitem.parquet'
                ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
            )
        elif t == "orders":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN o_orderkey % 2 = 0 THEN {hot_cust}
                         ELSE o_custkey END AS o_custkey)
                  FROM '{src}/orders.parquet'
                ) TO '{dst}/orders.parquet' (FORMAT PARQUET)"""
            )
        elif t == "documents":
            con.execute(
                f"""COPY (
                  SELECT doc_id,
                         CASE WHEN doc_id % 10 < 3 THEN '{prefix}' || text
                              ELSE text END AS text,
                         lang, source,
                         CASE WHEN doc_id % 10 < 3
                              THEN n_chars + length('{prefix}')
                              ELSE n_chars END AS n_chars
                  FROM '{src}/documents.parquet'
                ) TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    return dst


def build_tieflood(src: str, dst: str) -> str:
    """Tie-flood (r11, VERDICT r10 item 5) — duplicate values across every
    ORDERING column so ranking, top-k, argmin/argmax, window order keys,
    quantile cutpoints and similarity distances all hit massive ties, and
    only a deterministic tie-break keeps the two engines hash-equal:

    - events: value collapsed to THREE distinct values (keyed on
      event_id so it stays deterministic and NULL-composable), ts
      truncated to the hour — top-k by value, percentiles/deciles,
      OHLC arg_min/arg_max, and every ORDER BY ts window sees floods
      of exact ties at identical instants;
    - lineitem: l_extendedprice collapsed to four values keyed on
      l_partkey, l_shipdate truncated to month — revenue top-k and
      date-ordered windows tie;
    - orders: o_totalprice collapsed to three values, o_orderdate
      truncated to month;
    - part: p_retailprice collapsed to three values (argmin/argmax
      part-price ties);
    - customer/supplier: acctbal collapsed to three values;
    - documents: every 7th doc's text replaced by one of THREE fixed
      sentences — identical token counts, quality scores, fingerprints,
      minhash signatures and TF-IDF vectors across large groups (dedup
      canonical selection and top-terms must break ties on ids);
    - embeddings: every 5th vector replaced by ONE shared existing
      vector — identical cosine/LSH/PQ distances flood every top-k
      rerank (the ANN tie-break gate).

    All transforms preserve NULLs (CASE ... IS NULL), so the class
    composes with the NULL/skew fixtures per the r8 composition policy.
    """
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    con = duckdb.connect()
    texts = (
        "the quick brown fox jumps over the lazy dog again and again",
        "all work and no play makes data a dull corpus to train on",
        "pack my box with five dozen liquor jugs for the evaluation",
    )
    t0, t1, t2 = texts
    for t in TABLES:
        if t == "events":
            con.execute(
                f"""COPY (
                  SELECT event_id,
                         date_trunc('hour', ts) AS ts,
                         user_id, event_type,
                         CASE WHEN value IS NULL THEN NULL
                              ELSE (COALESCE(event_id, 0) % 3) * CAST(100 AS DOUBLE) + 50
                         END AS value,
                         props
                  FROM '{src}/events.parquet'
                ) TO '{dst}/events.parquet' (FORMAT PARQUET)"""
            )
        elif t == "lineitem":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN l_extendedprice IS NULL THEN NULL
                         ELSE (l_partkey % 4) * CAST(1000 AS DOUBLE) + 100
                    END AS l_extendedprice,
                    date_trunc('month', l_shipdate) AS l_shipdate)
                  FROM '{src}/lineitem.parquet'
                ) TO '{dst}/lineitem.parquet' (FORMAT PARQUET)"""
            )
        elif t == "orders":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN o_totalprice IS NULL THEN NULL
                         ELSE (o_orderkey % 3) * CAST(1000 AS DOUBLE) + 500
                    END AS o_totalprice,
                    date_trunc('month', o_orderdate) AS o_orderdate)
                  FROM '{src}/orders.parquet'
                ) TO '{dst}/orders.parquet' (FORMAT PARQUET)"""
            )
        elif t == "part":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN p_retailprice IS NULL THEN NULL
                         ELSE (p_partkey % 3) * CAST(10 AS DOUBLE) + 1
                    END AS p_retailprice)
                  FROM '{src}/part.parquet'
                ) TO '{dst}/part.parquet' (FORMAT PARQUET)"""
            )
        elif t == "customer":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN c_acctbal IS NULL THEN NULL
                         ELSE (c_custkey % 3) * CAST(500 AS DOUBLE)
                    END AS c_acctbal)
                  FROM '{src}/customer.parquet'
                ) TO '{dst}/customer.parquet' (FORMAT PARQUET)"""
            )
        elif t == "supplier":
            con.execute(
                f"""COPY (
                  SELECT * REPLACE (
                    CASE WHEN s_acctbal IS NULL THEN NULL
                         ELSE (s_suppkey % 3) * CAST(500 AS DOUBLE)
                    END AS s_acctbal)
                  FROM '{src}/supplier.parquet'
                ) TO '{dst}/supplier.parquet' (FORMAT PARQUET)"""
            )
        elif t == "documents":
            con.execute(
                f"""COPY (
                  SELECT doc_id,
                         CASE WHEN text IS NULL THEN NULL
                              WHEN doc_id % 7 = 0 THEN
                                CASE doc_id % 3 WHEN 0 THEN '{t0}'
                                                WHEN 1 THEN '{t1}'
                                                ELSE '{t2}' END
                              ELSE text END AS text,
                         lang, source,
                         CASE WHEN text IS NULL THEN n_chars
                              WHEN doc_id % 7 = 0 THEN
                                length(CASE doc_id % 3 WHEN 0 THEN '{t0}'
                                                       WHEN 1 THEN '{t1}'
                                                       ELSE '{t2}' END)
                              ELSE n_chars END AS n_chars
                  FROM '{src}/documents.parquet'
                ) TO '{dst}/documents.parquet' (FORMAT PARQUET)"""
            )
        elif t == "embeddings":
            con.execute(
                f"""COPY (
                  WITH shared AS (
                    -- modal-length pick, not a hardcoded dim (review
                    -- r11): a dim change or composed ragged source must
                    -- still yield a shared TIE vector, not silent NULLs
                    SELECT embedding AS sv FROM '{src}/embeddings.parquet'
                    WHERE embedding IS NOT NULL
                      AND len(embedding) = (
                        SELECT mode(len(embedding))
                        FROM '{src}/embeddings.parquet'
                        WHERE embedding IS NOT NULL)
                    ORDER BY vec_id LIMIT 1
                  )
                  SELECT vec_id,
                         CASE WHEN embedding IS NULL THEN NULL
                              WHEN vec_id % 5 = 0 THEN (SELECT sv FROM shared)
                              ELSE embedding END AS embedding,
                         label
                  FROM '{src}/embeddings.parquet'
                ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)"""
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}/{t}.parquet') "
                f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
            )
    # the shared-vector flood must actually have happened (review r11:
    # an empty 'shared' CTE would silently turn the ANN tie-break class
    # into NULL injection and still sweep green)
    n_src, n_shared = con.execute(
        f"""SELECT
              (SELECT count(*) FROM '{src}/embeddings.parquet'
               WHERE embedding IS NOT NULL AND vec_id % 5 = 0),
              (SELECT count(DISTINCT embedding::VARCHAR)
               FROM '{dst}/embeddings.parquet'
               WHERE embedding IS NOT NULL AND vec_id % 5 = 0)"""
    ).fetchone()
    assert n_src == 0 or n_shared == 1, (
        f"tieflood shared-embedding flood failed: {n_shared} distinct"
    )
    return dst


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    dups = "--dups" in sys.argv[1:]
    empty = "--empty" in sys.argv[1:]
    extreme = "--extreme" in sys.argv[1:]
    timewarp = "--timewarp" in sys.argv[1:]
    nullts = "--nullts" in sys.argv[1:]
    nullkeys = "--nullkeys" in sys.argv[1:]
    skew = "--skew" in sys.argv[1:]
    skewhot = "--skewhot" in sys.argv[1:]
    uniws = "--uniws" in sys.argv[1:]
    ragged = "--ragged" in sys.argv[1:]
    badjson = "--badjson" in sys.argv[1:]
    orphans = "--orphans" in sys.argv[1:]
    giantdoc = "--giantdoc" in sys.argv[1:]
    tieflood = "--tieflood" in sys.argv[1:]
    src = args[0] if args else "/root/testdata/sf0.001"
    default_dst = (
        "/tmp/duptest_sf" if dups else
        "/tmp/emptytest_sf" if empty else
        "/tmp/extremetest_sf" if extreme else
        "/tmp/timewarptest_sf" if timewarp else
        "/tmp/nulltstest_sf" if nullts else
        "/tmp/nullkeystest_sf" if nullkeys else
        "/tmp/skewtest_sf" if skew else
        "/tmp/skewhottest_sf" if skewhot else
        "/tmp/uniwstest_sf" if uniws else
        "/tmp/raggedtest_sf" if ragged else
        "/tmp/badjsontest_sf" if badjson else
        "/tmp/orphantest_sf" if orphans else
        "/tmp/gianttest_sf" if giantdoc else
        "/tmp/tieflood_sf" if tieflood else "/tmp/nulltest_sf"
    )
    dst = args[1] if len(args) > 1 else default_dst
    builder = (
        build_dups if dups else build_empty if empty else
        build_extreme if extreme else
        build_timewarp if timewarp else
        build_nullts if nullts else
        build_nullkeys if nullkeys else
        build_skew if skew else
        build_skewhot if skewhot else
        build_uniws if uniws else
        build_ragged if ragged else
        build_badjson if badjson else
        build_orphans if orphans else
        build_giantdoc if giantdoc else
        build_tieflood if tieflood else build
    )
    print("wrote", builder(src, dst))

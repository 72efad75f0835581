"""Snapshot diffing — CDC rows from two table versions.

The reference has no change capture (its incrementality is file-level,
reference: pipeline/assets/ingest.py:217-231); at warehouse scale the
standard need is the inverse of ingestion: given two snapshots of a keyed
table (e.g. two ``SnapshotTable`` versions), emit the row-level changes
between them — inserts, deletes, and updates — so downstream consumers can
merge incrementally instead of rescanning.

Semantics (Delta's ``table_changes`` shape, minus the engine):
- key present only in ``new``           -> ``insert``
- key present only in ``old``           -> ``delete``
- key in both, any tracked column differs (null-safe) -> ``update``
- identical rows are NOT emitted.
- a NULL-keyed row has no identity: it can never be an ``update``.
  NULL-keyed rows diff as a row-level MULTISET difference — identical
  copies net out (review r6: the plain key join never matched them, so
  every unchanged NULL-keyed row emitted a phantom delete+insert pair on
  every diff, violating the invariant above); surplus copies emit as
  insert/delete.

Plan shape: ONE full-outer sort-merge/shuffle join on the key — the only
data-sized exchange; per-column null-safe comparisons happen in the join's
projection, no row hashing (hashing would be engine-private and would also
false-positive on float formatting). At 100 TB both sides shuffle once on
the same key; if snapshots are written bucketed by the key
(sources/bucketing), the exchange disappears entirely.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str] | None = None,
    null_keys: str = "multiset",
) -> DataFrame:
    """Row-level changes old -> new. Output: key columns, ``change``
    ('insert' | 'delete' | 'update'), then ``old_<c>``/``new_<c>`` for every
    compared column.

    ``null_keys`` picks the NULL-key contract:
    - ``"multiset"`` (default): NULL-keyed rows diff as a row-level
      multiset (module docstring) — correct for arbitrary inputs, at the
      cost of two extra IS NULL-filtered aggregate subtrees in the plan.
    - ``"absent"``: the caller asserts keys are never NULL (primary
      keys); both sides get a defensive pushed-to-scan IS NOT NULL filter
      and the multiset branch is omitted — the single-join plan the
      module docstring's scale shape describes. Measured: the multiset
      branch cost the CDC bench row +0.4 s at sf0.1 for rows that cannot
      exist on a key column (review r6)."""
    if null_keys not in ("multiset", "absent"):
        raise ValueError(f"null_keys must be multiset|absent, got {null_keys!r}")
    if not keys:
        # plan-time guard (review r7): the reduce() over key nullness
        # raised an opaque TypeError, and a bypass would degrade the key
        # join to a cross join — same explicit-ValueError convention as
        # range_join's window_seconds / salted_join's n_salts
        raise ValueError(
            "diff_snapshots needs at least one key column (compare_cols=[]"
            " is the presence-only mode; keys=[] has no meaning)"
        )
    # `is not None`, not falsy-or (review r5): an explicit [] means a
    # presence-only diff (inserts/deletes, no update detection) — the
    # falsy idiom silently substituted every non-key column
    from functools import reduce
    from operator import or_

    cols = (
        compare_cols
        if compare_cols is not None
        else [c for c in new.columns if c not in keys]
    )
    # Reserved-name guard (review r7, same class as asof_join_backward's
    # r5 fix): the output claims `change` / old_<c> / new_<c>, and the
    # join stage claims _ok_/_nk_/_o_present/_n_present scratch names —
    # a key or compared column colliding with any of them silently
    # yields duplicate/ambiguous output columns far from the cause.
    claimed = {"change", "_o_present", "_n_present"}
    claimed |= {f"old_{c}" for c in cols} | {f"new_{c}" for c in cols}
    claimed |= {f"_ok_{k}" for k in keys} | {f"_nk_{k}" for k in keys}
    bad = sorted(claimed & set(keys))
    if bad:
        raise ValueError(
            f"key column(s) {bad} collide with diff_snapshots' output/"
            "scratch names (change, old_*/new_*, _ok_*/_nk_*, *_present);"
            " rename them before diffing"
        )
    # NULL-keyed rows bypass the key join entirely (they have no identity
    # to join on — see module docstring): multiset-diff them row-wise, so
    # identical copies net out instead of churning delete+insert pairs.
    def _null_key(df: DataFrame) -> Column:
        return reduce(or_, (F.col(k).isNull() for k in keys))

    if null_keys == "absent":
        old = old.filter(~_null_key(old))
        new = new.filter(~_null_key(new))
        return _diff_keyed(old, new, keys, cols)
    old_nulls = old.filter(_null_key(old)).select(*keys, *cols)
    new_nulls = new.filter(_null_key(new)).select(*keys, *cols)
    null_deletes = old_nulls.exceptAll(new_nulls).select(
        *keys,
        F.lit("delete").alias("change"),
        *[F.col(c).alias(f"old_{c}") for c in cols],
        *[F.lit(None).cast(old.schema[c].dataType).alias(f"new_{c}") for c in cols],
    )
    null_inserts = new_nulls.exceptAll(old_nulls).select(
        *keys,
        F.lit("insert").alias("change"),
        *[F.lit(None).cast(new.schema[c].dataType).alias(f"old_{c}") for c in cols],
        *[F.col(c).alias(f"new_{c}") for c in cols],
    )
    old = old.filter(~_null_key(old))
    new = new.filter(~_null_key(new))
    keyed = _diff_keyed(old, new, keys, cols)
    return keyed.unionByName(null_deletes).unionByName(null_inserts)


def _diff_keyed(
    old: DataFrame, new: DataFrame, keys: list[str], cols: list[str]
) -> DataFrame:
    """The keyed (non-NULL-key) full-outer-join diff — ONE data-sized
    exchange, comparisons in the projection."""
    # Per-side presence markers: classification must NOT key off key-column
    # nullness — a literal TRUE is NULL after the full outer join exactly
    # when the side is absent (with NULL keys now split out above, this is
    # belt-and-braces rather than load-bearing).
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"old_{c}") for c in cols],
        F.lit(True).alias("_o_present"),
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"new_{c}") for c in cols],
        F.lit(True).alias("_n_present"),
    )
    cond = None
    for k in keys:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")

    changed: Column = F.lit(False)
    for c in cols:
        # null-safe inequality: engine-neutral, no hashing/formatting
        changed = changed | ~F.col(f"old_{c}").eqNullSafe(F.col(f"new_{c}"))
    change = (
        F.when(F.col("_o_present").isNull(), F.lit("insert"))
        .when(F.col("_n_present").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    return (
        joined.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(
            *[
                F.coalesce(f"_ok_{k}", f"_nk_{k}").alias(k)
                for k in keys
            ],
            "change",
            *[F.col(f"old_{c}") for c in cols],
            *[F.col(f"new_{c}") for c in cols],
        )
    )


def diff_snapshots_oracle_sql(
    old_sql: str, new_sql: str, keys: list[str], cols: list[str],
    null_keys: str = "multiset",
) -> str:
    """DuckDB twin of diff_snapshots for oracle checking. Supports the
    presence-only mode (cols=[]) the engine twin supports — the old
    renderer emitted 'WHEN  THEN' / 'OR ()' syntax errors for it (review
    r6) — and mirrors the NULL-key contract: the multiset branch, or the
    ``"absent"`` single-join form with the same defensive IS NOT NULL
    filters as the engine twin."""
    if null_keys not in ("multiset", "absent"):
        raise ValueError(f"null_keys must be multiset|absent, got {null_keys!r}")
    key_join = " AND ".join(f"o.{k} = n.{k}" for k in keys)
    key_out = ", ".join(f"COALESCE(o.{k}, n.{k}) AS {k}" for k in keys)
    diff = (
        " OR ".join(f"(o.{c} IS DISTINCT FROM n.{c})" for c in cols)
        if cols
        else "FALSE"  # presence-only: nothing to compare, never 'update'
    )
    old_out = "".join(f", o.{c} AS old_{c}" for c in cols)
    new_out = "".join(f", n.{c} AS new_{c}" for c in cols)
    nn = " AND ".join(f"{k} IS NOT NULL" for k in keys)
    any_null = " OR ".join(f"{k} IS NULL" for k in keys)
    plain = ", ".join([*keys, *cols]) or "*"
    null_old_out = "".join(f", {c} AS old_{c}" for c in cols)
    null_old_nulls = "".join(f", NULL AS old_{c}" for c in cols)
    null_new_out = "".join(f", {c} AS new_{c}" for c in cols)
    null_new_nulls = "".join(f", NULL AS new_{c}" for c in cols)
    key_cols = ", ".join(keys)
    if null_keys == "absent":
        return f"""
WITH o AS (SELECT *, TRUE AS _o_present FROM ({old_sql}) WHERE {nn}),
     n AS (SELECT *, TRUE AS _n_present FROM ({new_sql}) WHERE {nn})
SELECT {key_out},
       CASE WHEN o._o_present IS NULL THEN 'insert'
            WHEN n._n_present IS NULL THEN 'delete'
            WHEN {diff} THEN 'update' END AS change
       {old_out}{new_out}
FROM o FULL OUTER JOIN n ON {key_join}
WHERE (o._o_present IS NULL) OR (n._n_present IS NULL) OR ({diff})
"""
    # presence markers mirror diff_snapshots: side-absence, not key nullness
    return f"""
WITH o AS (SELECT *, TRUE AS _o_present FROM ({old_sql}) WHERE {nn}),
     n AS (SELECT *, TRUE AS _n_present FROM ({new_sql}) WHERE {nn}),
     o_null AS (SELECT {plain} FROM ({old_sql}) WHERE {any_null}),
     n_null AS (SELECT {plain} FROM ({new_sql}) WHERE {any_null})
SELECT {key_out},
       CASE WHEN o._o_present IS NULL THEN 'insert'
            WHEN n._n_present IS NULL THEN 'delete'
            WHEN {diff} THEN 'update' END AS change
       {old_out}{new_out}
FROM o FULL OUTER JOIN n ON {key_join}
WHERE (o._o_present IS NULL) OR (n._n_present IS NULL) OR ({diff})
UNION ALL
SELECT {key_cols}, 'delete' AS change{null_old_out}{null_new_nulls}
FROM (SELECT {plain} FROM o_null EXCEPT ALL SELECT {plain} FROM n_null)
UNION ALL
SELECT {key_cols}, 'insert' AS change{null_old_nulls}{null_new_out}
FROM (SELECT {plain} FROM n_null EXCEPT ALL SELECT {plain} FROM o_null)
"""


def change_deltas(
    changes: DataFrame, group_col: str, measure_col: str
) -> DataFrame:
    """CDC rows -> signed per-group contributions for incremental rollup
    maintenance: a delete contributes (-1, -old_measure) to the OLD row's
    group, an insert (+1, +new_measure) to the NEW row's group, an update
    both (which also handles group-key churn — the two contributions land
    on different groups when the key column itself changed). Output:
    (group, d_count, d_measure).

    Plan shape (r11, guide §2.4): ONE pass over ``changes`` exploding a
    per-row contribution array. The previous two-filtered-projections
    union made the WHOLE ``changes`` subtree (for diff_snapshots input:
    the full-outer diff join, its sorts and its filter) a branch of a
    Union — Catalyst reuses the exchanges but re-executes the join per
    branch, so the diff ran twice per maintenance call (observed in the
    r11 plan capture: two FullOuter SortMergeJoins, codegen stages 8 and
    13, over ReusedExchange inputs). The explode form evaluates the diff
    once; downstream grouped sums are exact decimal/long, so contribution
    ORDER cannot change results — the same associativity argument
    maintain_rollup already relies on."""
    # measure type comes from the old side; the new side carries the same
    # column type by diff construction (old_/new_ projections of one
    # schema), so the struct element types below agree.
    old_contrib = F.struct(
        F.col(f"old_{group_col}").alias(group_col),
        F.lit(-1).cast("long").alias("d_count"),
        (-F.col(f"old_{measure_col}")).alias("d_measure"),
    )
    new_contrib = F.struct(
        F.col(f"new_{group_col}").alias(group_col),
        F.lit(1).cast("long").alias("d_count"),
        F.col(f"new_{measure_col}").alias("d_measure"),
    )
    contribs = (
        F.when(F.col("change") == "delete", F.array(old_contrib))
        .when(F.col("change") == "insert", F.array(new_contrib))
        .when(F.col("change") == "update", F.array(old_contrib, new_contrib))
        # any other change label contributed to NEITHER side of the old
        # union — an empty array explodes to zero rows, preserving that
        .otherwise(F.array())
    )
    return changes.select(F.explode(contribs).alias("_c")).select(
        F.col(f"_c.{group_col}").alias(group_col),
        F.col("_c.d_count").alias("d_count"),
        F.col("_c.d_measure").alias("d_measure"),
    )


def maintain_rollup(
    base_rollup: DataFrame,
    changes: DataFrame,
    group_col: str,
    count_col: str = "n",
    sum_col: str = "total",
    measure_col: str | None = None,
) -> DataFrame:
    """Incremental materialized-view maintenance: fold CDC deltas into an
    existing (group, count, sum) rollup WITHOUT rescanning the base table.
    Groups whose count drops to zero disappear (exactly as a recompute
    would drop them).

    The algebra only works for mergeable aggregates (count/sum/avg — NOT
    exact distinct, which is why the reference full-refreshes its distinct-
    bearing tables, SURVEY.md §4 OPT5); sums must be carried in exact
    decimal so (base + deltas) is associative and lands bit-identical to a
    direct recompute of the new snapshot — that equality is what the
    catalog query's oracle asserts.

    At 100 TB: the rollup is |groups|-sized, the deltas |changes|-sized —
    maintenance cost is independent of the base table entirely.

    Shape (r4): deltas pre-aggregate to |groups| rows, then fold into the
    base via ONE null-safe full-outer join + coalesced decimal adds. The
    r3 union-then-groupBy form made the base rollup and the delta subtree
    two branches of one union, which Spark executes SERIALLY (measured 2x
    the slower branch — the union-of-aggregates trap); the join form runs
    them as independent stages (0.66 -> 0.55 s at sf0.1, values
    bit-identical: decimal addition is associative either way). The join
    is null-safe (eqNullSafe) because a NULL group key must merge across
    the two sides exactly as the union's groupBy merged it."""
    from .aggregates import MEASURE_DECIMAL

    measure_col = measure_col or sum_col
    # Cast BOTH sides to the exact-decimal type up front: type-coercion of
    # decimal with double would widen to double and silently reintroduce
    # float-order nondeterminism. (Pass a decimal-typed base sum — e.g.
    # exact_sum without the double cast — for bit-exact parity with a
    # direct recompute.)
    deltas = (
        change_deltas(changes, group_col, measure_col)
        .groupBy(group_col)
        .agg(
            F.sum("d_count").alias("_d_count"),
            F.sum(F.col("d_measure").cast(MEASURE_DECIMAL)).alias("_d_sum"),
        )
        .withColumnRenamed(group_col, "_d_group")
    )
    base = base_rollup.select(
        group_col,
        F.col(count_col).cast("long").alias(count_col),
        F.col(sum_col).cast(MEASURE_DECIMAL).alias(sum_col),
    )
    zero_c = F.lit(0).cast("long")
    zero_s = F.lit(0).cast(MEASURE_DECIMAL)
    return (
        base.join(
            deltas,
            F.col(group_col).eqNullSafe(F.col("_d_group")),
            "full_outer",
        )
        .select(
            F.coalesce(F.col(group_col), F.col("_d_group")).alias(group_col),
            (
                F.coalesce(F.col(count_col), zero_c)
                + F.coalesce(F.col("_d_count"), zero_c)
            ).alias(count_col),
            (
                F.coalesce(F.col(sum_col), zero_s)
                + F.coalesce(F.col("_d_sum"), zero_s)
            )
            .cast("double")
            .alias(sum_col),
        )
        .filter(F.col(count_col) > 0)
    )

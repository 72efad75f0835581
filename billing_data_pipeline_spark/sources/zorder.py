"""Z-order (Morton-curve) clustering for multi-column row-group pruning.

Sorted clustering (``write_hive_partitioned_sorted``) makes parquet min-max
stats selective on ONE leading column; a filter on any other column still
reads every file. Interleaving the bits of several columns' bucket ranks
into one Morton key and range-partitioning + sorting by it gives every
interleaved column *partially* narrow per-file ranges — the standard lake
layout for "prune on either predicate" at 100 TB (the same layout Delta's
OPTIMIZE ZORDER BY produces; built here from pure column expressions:
min/max scaling, shifts, masks — all whole-stage codegen, one range
shuffle).

Bucket ranks are min-max scaled, so one pre-pass aggregate computes the
bounds and broadcasts them into the scaling expression; no sampling, no
RNG, no skew sensitivity beyond what range partitioning already handles.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(col: Column, mn: Column, mx: Column, bits: int) -> Column:
    """Scale ``col`` into an integer bucket rank in [0, 2^bits)."""
    span = mx.cast("double") - mn.cast("double")
    scaled = F.floor(
        (col.cast("double") - mn.cast("double")) / span * F.lit(float(2**bits))
    )
    rank = F.least(F.lit(2**bits - 1), F.greatest(F.lit(0), scaled))
    return F.when(span <= 0, F.lit(0)).otherwise(rank).cast("long")


def zorder_key(cols: list[Column], bounds: list[tuple[Column, Column]], bits: int = 8) -> Column:
    """Morton key: bit j of column k lands at position j*n_cols + k.

    ``n_cols * bits`` must fit the 63 value bits of a signed long: bit 63
    is the sign (rows with it set would sort FIRST and invert the curve's
    top) and Java shifts wrap mod 64 (>= 64 silently collides distinct
    bucket bits) — both silent layout corruptions, so over-wide requests
    raise instead (review r4)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"zorder_key: {n} cols x {bits} bits = {n * bits} bits "
            "exceeds the 63 value bits of a signed long — lower `bits` "
            f"(max {63 // n} for {n} columns)"
        )
    ranks = [_bucket(c, mn, mx, bits) for c, (mn, mx) in zip(cols, bounds)]
    parts = [
        F.shiftleft(F.shiftright(rank, j).bitwiseAND(F.lit(1)), j * n + k)
        for k, rank in enumerate(ranks)
        for j in range(bits)
    ]
    return reduce(lambda a, b: a.bitwiseOR(b), parts)


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int,
    bits: int = 8,
) -> None:
    """Cluster ``df`` on the Morton curve of ``cols`` and write ``n_files``
    parquet files, each covering a compact z-range (⇒ compact min-max
    ranges on EVERY interleaved column). ONE aggregate pre-pass for
    bounds, collected to the driver and injected as literals (review r7:
    the old crossJoin(broadcast(bounds_row)) form re-executed the full
    min/max scan in EVERY job that evaluated the plan — at least twice,
    for repartitionByRange's sampling pass and the write); one range
    shuffle, in-partition sort — nothing here is local-mode-specific."""
    # Numeric/temporal columns only (review r7): _bucket min-max scales
    # through a double cast, which on a string column raises
    # CAST_INVALID_INPUT mid-shuffle under ANSI — or, ANSI off, nulls to
    # bucket 0 so the column SILENTLY contributes nothing to the layout
    # while the caller believes it is covered.
    for c in cols:
        dt = df.schema[c].dataType.typeName()
        if dt not in (
            "byte", "short", "integer", "long", "float", "double",
            "timestamp", "timestamp_ntz",
        ) and not dt.startswith("decimal"):
            raise TypeError(
                f"zorder_write: column {c!r} has type {dt} — the Morton "
                "bucket rank needs a numeric or timestamp column (hash "
                "or dictionary-encode strings into an int column first; "
                "cast dates to timestamps)"
            )
    row = df.agg(
        *[f(c).alias(f"{c}_{tag}") for c in cols for tag, f in (("mn", F.min), ("mx", F.max))]
    ).first()
    key = zorder_key(
        [F.col(c) for c in cols],
        [(F.lit(row[f"{c}_mn"]), F.lit(row[f"{c}_mx"])) for c in cols],
        bits,
    )
    (
        df.withColumn("_z", key)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )

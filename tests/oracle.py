"""Local replica of the driver's DuckDB-oracle comparison.

Runs a catalog query on Spark and its oracle SQL on DuckDB over the same
parquet, then compares row count, column names, and order-insensitive
values (columns sorted by name, rows sorted by all columns).
"""

from __future__ import annotations

import duckdb
import pandas as pd



def duckdb_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    from billing_data_pipeline_spark.sources.tables import (
        duckdb_connect as _connect,
    )

    return _connect(sf_dir)


def _canonical(df: pd.DataFrame) -> pd.DataFrame:
    import datetime as dt

    df = df.copy()
    df.columns = [c.lower() for c in df.columns]
    df = df[sorted(df.columns)]
    for c in df.columns:
        # Spark DATE columns arrive as object dtype holding datetime.date;
        # DuckDB's arrive as datetime64 — normalize both to datetime64.
        if df[c].dtype == object:
            nonnull = df[c].dropna()
            if len(nonnull) and all(
                isinstance(v, (dt.date, dt.datetime)) for v in nonnull.head(100)
            ):
                df[c] = pd.to_datetime(df[c])
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            col = df[c]
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col.astype("datetime64[us]")
    if len(df.columns):
        # sort on ROUNDED float keys: a last-ulp cross-engine difference on
        # a tied row must not swap the positional alignment the rtol-based
        # compare depends on (values themselves stay unrounded)
        keyed = df.copy()
        for c in keyed.columns:
            if pd.api.types.is_float_dtype(keyed[c]):
                # round to 9 SIGNIFICANT digits (absolute round(9) still
                # swaps last-ulp ties above ~4e6 where 1 ulp > 1e-9)
                keyed[c] = keyed[c].map(
                    lambda x: x if pd.isna(x) else float(f"{x:.9e}")
                )
        df = df.loc[
            keyed.sort_values(by=list(keyed.columns), kind="mergesort").index
        ]
    return df.reset_index(drop=True)


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str) -> None:
    con = duckdb_connect(sf_dir)
    try:
        expected = con.execute(oracle_sql).fetchdf()
    finally:
        con.close()
    actual = spark_df.toPandas()

    assert len(actual) == len(expected), (
        f"row count mismatch: spark={len(actual)} oracle={len(expected)}"
    )
    a_cols = sorted(c.lower() for c in actual.columns)
    e_cols = sorted(c.lower() for c in expected.columns)
    assert a_cols == e_cols, f"column mismatch: spark={a_cols} oracle={e_cols}"

    a = _canonical(actual)
    e = _canonical(expected)
    pd.testing.assert_frame_equal(
        a, e, check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9
    )

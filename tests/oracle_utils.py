"""Local replica of the driver's correctness gate: run the Spark query and
the DuckDB oracle on the same parquet dir, then compare row count, column
names, and values (order-insensitive, columns sorted by name) — strict
equality, because the queries are designed to be bit-deterministic
(exact DECIMAL math; see kinesis_spark/queries/__init__.py).
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

from kinesis_spark.io import TABLES

FLOAT_ATOL = 1e-9  # slack for value comparison diagnostics only


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).fetchdf()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1).copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.decode("latin1") if isinstance(v, (bytes, bytearray)) else v
            )
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(spark_df, oracle_df: pd.DataFrame, name: str = "") -> None:
    got = _normalize(spark_df.toPandas())
    want = _normalize(oracle_df)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch spark={list(got.columns)} oracle={list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count spark={len(got)} oracle={len(want)}"
    for c in got.columns:
        gk, wk = got[c].dtype.kind, want[c].dtype.kind
        assert gk == wk, (
            f"{name}.{c}: dtype kind mismatch spark={got[c].dtype} oracle={want[c].dtype} "
            "(align widths: e.g. DuckDB SUM(int)→HUGEINT vs Spark BIGINT)"
        )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g):
            ok = (
                (g.isna() & w.isna())
                | (g.values == w.values)
            )
            if not ok.all():
                bad = np.where(~ok)[0][:5]
                close = np.allclose(g.fillna(0), w.fillna(0), atol=FLOAT_ATOL, rtol=1e-12)
                raise AssertionError(
                    f"{name}.{c}: {len(np.where(~ok)[0])} value mismatches "
                    f"(first rows {bad.tolist()}: spark={g.iloc[bad].tolist()} "
                    f"oracle={w.iloc[bad].tolist()}); within atol? {close}"
                )
        else:
            eq = g.fillna("\0NULL").values == w.fillna("\0NULL").values \
                if g.dtype == object else (g.isna() & w.isna()) | (g.values == w.values)
            if not np.asarray(eq).all():
                bad = np.where(~np.asarray(eq))[0][:5]
                raise AssertionError(
                    f"{name}.{c}: mismatches at rows {bad.tolist()}: "
                    f"spark={g.iloc[bad].tolist()} oracle={w.iloc[bad].tolist()}"
                )

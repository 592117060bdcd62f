"""Local mirror of the driver's DuckDB-oracle comparison.

Runs a Spark query and its oracle SQL side by side, normalizes both to
pandas (columns sorted by name, rows sorted by all columns, floats
rounded), and asserts row-count + column-name + value equality.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

from ksql_query_tutorial_spark.tables import TABLES


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con.execute(sql).df()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            col = df[c]
            if getattr(col.dt, "tz", None) is not None:
                col = col.dt.tz_convert("UTC").dt.tz_localize(None)
            df[c] = col
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def assert_matches_oracle(spark_df, oracle_sql: str, sf_dir: str, name: str = "?"):
    got = normalize(spark_df.toPandas())
    want = normalize(run_oracle(oracle_sql, sf_dir))
    assert len(got) == len(want), (
        f"{name}: row count {len(got)} != oracle {len(want)}"
    )
    assert list(got.columns) == list(want.columns), (
        f"{name}: columns {list(got.columns)} != oracle {list(want.columns)}"
    )
    for c in got.columns:
        g, w = got[c], want[c]
        if pd.api.types.is_float_dtype(g) or pd.api.types.is_float_dtype(w):
            g = pd.to_numeric(g, errors="coerce").astype(float)
            w = pd.to_numeric(w, errors="coerce").astype(float)
            bad = ~(
                (g.isna() & w.isna())
                | (g.sub(w).abs() <= 1e-6 + 1e-6 * w.abs())
            )
        else:
            bad = ~((g.isna() & w.isna()) | (g == w))
        if bad.any():
            i = bad.idxmax()
            raise AssertionError(
                f"{name}: column {c} mismatch at row {i}: "
                f"spark={g.iloc[i]!r} oracle={w.iloc[i]!r} "
                f"({int(bad.sum())} mismatched rows)"
            )


def duckdb_float_check(g: float, w: float) -> bool:
    return (math.isnan(g) and math.isnan(w)) or abs(g - w) <= 1e-6 + 1e-6 * abs(w)

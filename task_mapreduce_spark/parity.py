"""Local replica of the driver's DuckDB-oracle correctness check.

Runs a registered Spark query and its oracle SQL side-by-side, sorts
columns by name, canonicalizes row order, and compares values exactly.
Exact comparison is deliberate: the driver hashes values, so we engineer
bit-identical results (see functions/exact.py) rather than relying on a
tolerance the driver may not apply.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import duckdb

from task_mapreduce_spark.registry import ORACLES, QUERIES
from task_mapreduce_spark.tables import TABLE_NAMES, path_of


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{path_of(sf_dir, t)}')"
        )
    return con


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1).copy()
    for c in pdf.columns:
        dt = pdf[c].dtype
        if pd.api.types.is_integer_dtype(dt):
            pdf[c] = pdf[c].astype("int64")
        elif pd.api.types.is_float_dtype(dt):
            pdf[c] = pdf[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(dt):
            pdf[c] = pd.to_datetime(pdf[c]).dt.tz_localize(None)
        elif dt == object:
            # dates and decimals arrive as objects from one engine or the
            # other; stringify anything non-scalar-simple for stable sort.
            pdf[c] = pdf[c].map(lambda v: None if v is None else str(v))
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), ignore_index=True, na_position="last")
    return pdf


def compare_frames(spark_pdf: pd.DataFrame, oracle_pdf: pd.DataFrame, key: str) -> list[str]:
    errs: list[str] = []
    a, b = _canon(spark_pdf), _canon(oracle_pdf)
    if len(a) != len(b):
        return [f"{key}: row count {len(a)} vs oracle {len(b)}"]
    if list(a.columns) != list(b.columns):
        return [f"{key}: columns {list(a.columns)} vs oracle {list(b.columns)}"]
    for c in a.columns:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype("float64")
            bv = bv.astype("float64")
            same = (av == bv) | (np.isnan(av) & np.isnan(bv))
            if not same.all():
                bad = int((~same).sum())
                diff = np.nanmax(np.abs(av - bv))
                errs.append(f"{key}.{c}: {bad} float mismatches, max|Δ|={diff:.3e}")
        else:
            same = (pd.Series(av) == pd.Series(bv)) | (pd.isna(av) & pd.isna(bv))
            if not same.all():
                bad = int((~same).sum())
                i = int(np.argmax(~same.to_numpy()))
                errs.append(
                    f"{key}.{c}: {bad} mismatches, first at row {i}: {av[i]!r} vs {bv[i]!r}"
                )
    return errs


def check_key(spark, con, key: str, sf_dir: str) -> list[str]:
    df = QUERIES[key](spark, sf_dir)
    sql = ORACLES.get(key)
    spark_pdf = df.toPandas()
    if sql is None:
        # rows-only keys must still produce data — zero rows is a failure
        return [] if len(spark_pdf) > 0 else [f"{key}: rows-only check got 0 rows"]
    oracle_pdf = con.execute(sql).fetchdf()
    return compare_frames(spark_pdf, oracle_pdf, key)

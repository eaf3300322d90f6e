"""Self-check harness that mimics the driver's correctness gate:
runs every registered query in Spark AND its DuckDB oracle on the same
parquet tables, then compares row count, column names, and
order-insensitive values (exact — floats included, since the engine's
determinism rules are designed to make them bit-identical).

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.caching import (
    release_cached,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.plans.queries import QUERIES
from esgi_4iabd2_sparkstreaming_groupe13_spark.schemas import TESTDATA_TABLES
from esgi_4iabd2_sparkstreaming_groupe13_spark.session import get_spark


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_pdf.columns) != sorted(duck_pdf.columns):
        problems.append(
            f"columns: spark={sorted(spark_pdf.columns)} duck={sorted(duck_pdf.columns)}"
        )
        return problems
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount: spark={len(spark_pdf)} duck={len(duck_pdf)}")
    s, d = canon(spark_pdf), canon(duck_pdf)
    if len(s) == len(d):
        for col in s.columns:
            sv, dv = s[col], d[col]
            try:
                if sv.dtype.kind == "f" or dv.dtype.kind == "f":
                    ok = (
                        (sv.isna() & dv.isna()) | (sv == dv)
                    ).all()
                else:
                    ok = sv.astype(object).where(~sv.isna(), None).equals(
                        dv.astype(object).where(~dv.isna(), None)
                    )
            except Exception as ex:  # dtype mismatch etc.
                problems.append(f"col {col}: compare error {ex}")
                continue
            if not ok:
                diffs = (sv != dv) & ~(sv.isna() & dv.isna())
                idx = diffs[diffs].index[:3].tolist()
                examples = [(col, i, sv[i], dv[i]) for i in idx]
                problems.append(f"col {col}: value mismatch, e.g. {examples}")
    return problems


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="oracle_check")
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_skip = 0
    for spec in QUERIES:
        if only and spec.name not in only:
            continue
        if spec.oracle is None:
            print(f"SKIP  {spec.name} (rows-only)")
            n_skip += 1
            continue
        try:
            spark_pdf = spec.fn(spark, sf_dir).toPandas()
            duck_pdf = con.execute(spec.oracle).df()
            problems = compare(spec.name, spark_pdf, duck_pdf)
        except Exception as ex:
            problems = [f"exception: {type(ex).__name__}: {str(ex)[:300]}"]
        finally:
            release_cached()  # drop any operator-tracked persists
        if problems:
            n_fail += 1
            print(f"FAIL  {spec.name}")
            for p in problems:
                print(f"      {p}")
        else:
            n_pass += 1
            print(f"PASS  {spec.name} ({len(spark_pdf)} rows)")

    print(f"\n{n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

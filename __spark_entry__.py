"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's busiest-
locations computation, SURVEY.md §7 M1) at sf0.001; ``queries()`` /
``oracle_sql()`` expose the full declared registry from
``esgi_4iabd2_sparkstreaming_groupe13_spark.plans.queries`` — one entry per
implemented operator family of SURVEY.md §2 + M4 extensions, each
DuckDB-oracle-checked where SQL-expressible.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from esgi_4iabd2_sparkstreaming_groupe13_spark.operators.ordering import busiest_keys
from esgi_4iabd2_sparkstreaming_groupe13_spark.plans.queries import (
    oracle_sql_map,
    query_map,
)
from esgi_4iabd2_sparkstreaming_groupe13_spark.sources.batch import load_table

SF_SMOKE_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: count-by-key + top-k desc — the reference's
    busiest-locations query shape (``StreamProcessor.scala:44-55`` +
    ``taxi_dashboard.py:174``) on the lineitem stand-in."""
    lineitem = load_table(spark, SF_SMOKE_DIR, "lineitem")
    return busiest_keys(lineitem, "l_suppkey", 20)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return query_map()


def oracle_sql() -> dict[str, str]:
    return oracle_sql_map()


def py_oracles() -> dict[str, Callable]:
    """Python reference checkers for the four queries DuckDB cannot
    express (iterative BPE train, binary feature extraction, k-means
    model, approximate IVF search): ``checker(spark_result_pandas_df,
    sf_dir) -> list[str]`` — empty list means pass. The driver's SQL
    gate still records these as rows-only; ``scripts/oracle_check.py``
    runs them as real pass/fail."""
    from esgi_4iabd2_sparkstreaming_groupe13_spark.plans.py_oracles import (
        PY_ORACLES,
    )

    return dict(PY_ORACLES)

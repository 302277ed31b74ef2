"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship transcript pipeline at sf0.001;
``queries()``/``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 plus the training-data operators, each paired with a
DuckDB-runnable oracle (rows-only where noted in entry_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full parse+enrich+route per-turn output at sf0.001."""
    from logboost_spark.entry_queries import t_pipeline_full

    return t_pipeline_full(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from logboost_spark.entry_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from logboost_spark.entry_queries import build_oracles

    return build_oracles()

"""Combine sink (S9): per-directory union with name-based alignment.

Reference (helpers/helpers.go:765-847): merges all CSVs in an output dir
into one; the first file's header is the master, later files' columns
are matched by (fuzzy) name, unmatched dropped, and a ``SourceFile``
column is appended. In Spark this entire 105-LoC machine is
``unionByName(allowMissingColumns=True)`` + ``input_file_name()``.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..semantics import SOURCE_FILE_COL


def combine(dfs: list[DataFrame]) -> DataFrame:
    """Union mixed-schema frames by column name (missing → null)."""
    return reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), dfs)


def combine_files(spark, paths: list[str], fmt: str = "parquet") -> DataFrame:
    """Combine files with a SourceFile provenance column."""
    dfs = [
        getattr(spark.read, fmt)(p).withColumn(SOURCE_FILE_COL, F.input_file_name())
        for p in paths
    ]
    return combine(dfs)


def fuzzy_resolve(df: DataFrame, target: str) -> str | None:
    """F5 header matching (helpers/helpers.go:921-930): equality or
    substring containment, quotes stripped."""
    for name in df.columns:
        clean = name.replace('"', "")
        if clean == target or target in clean:
            return name
    return None

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


def combine_files(spark, paths: list[str], fmt: str = "parquet", **options) -> DataFrame:
    """Combine files with a SourceFile provenance column.

    ``fmt="csv"`` routes through the S3 LazyQuotes reader (header row,
    PERMISSIVE, multiLine, doubled-quote escape) so per-file quirks match
    the single-file path."""

    def _read(p: str) -> DataFrame:
        if fmt == "csv":
            from ..sources.readers import read_csv

            return read_csv(spark, p, **options)
        return getattr(spark.read.options(**options), fmt)(p)

    dfs = [_read(p).withColumn(SOURCE_FILE_COL, F.input_file_name()) for p in paths]
    return combine(dfs)


def combine_master(dfs: list[DataFrame]) -> DataFrame:
    """Reference combine semantics (helpers/helpers.go:765-847): the FIRST
    frame's header is the master; later frames are projected onto it via
    fuzzy name resolution (quote-strip equality, else substring —
    helpers.go:921-930), unresolved master columns become null, and
    columns absent from the master header are DROPPED. ``combine`` is the
    keep-everything variant (unionByName)."""
    master = dfs[0].columns
    out = [dfs[0]]
    for df in dfs[1:]:
        cols = []
        for target in master:
            src = fuzzy_resolve(df, target)
            cols.append(
                F.col(f"`{src}`").alias(target) if src is not None
                else F.lit(None).cast("string").alias(target)
            )
        out.append(df.select(*cols))
    return reduce(lambda a, b: a.unionByName(b), out)


def fuzzy_resolve(df: DataFrame, target: str) -> str | None:
    """F5 header matching (helpers/helpers.go:921-930): equality or
    substring containment, quotes stripped."""
    for name in df.columns:
        clean = name.replace('"', "")
        if clean == target or target in clean:
            return name
    return None

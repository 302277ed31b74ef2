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
    frame's header is the master; later frames are projected onto it by
    mapping each SECONDARY header into the master list
    (compareHeaders→FindTargetIndexInSlice, helpers.go:988-996/921-930:
    quote-stripped MASTER name equals or CONTAINS the secondary name,
    first master match wins). resortRecord (helpers.go:1000-1009) writes
    secondary values into a zero-valued record in secondary order, so
    when two secondary columns land on the same master slot the LAST one
    wins, and unmatched master slots keep Go's zero value "" (empty
    string, not NULL). Secondary columns that match nothing are DROPPED.
    ``combine`` is the keep-everything variant (unionByName)."""
    from pyspark.sql.types import StringType

    master = dfs[0].columns
    mtypes = {f.name: f.dataType for f in dfs[0].schema.fields}
    out = [dfs[0]]
    for df in dfs[1:]:
        slot: dict[int, str] = {}
        for sec in df.columns:
            for j, m in enumerate(master):
                clean = m.replace('"', "")
                if clean == sec or sec in clean:
                    slot[j] = sec  # last secondary write wins per master slot
                    break  # first master match wins per secondary column
        cols = []
        for j, target in enumerate(master):
            dt = mtypes[target]
            if j in slot:
                cols.append(F.col(f"`{slot[j]}`").cast(dt).alias(target))
            elif isinstance(dt, StringType):
                cols.append(F.lit("").alias(target))
            else:
                # "" is not expressible in a non-string master column; typed
                # NULL preserves the first frame's schema (the reference is
                # all-CSV-strings, so this branch has no Go analog).
                cols.append(F.lit(None).cast(dt).alias(target))
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

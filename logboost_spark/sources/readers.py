"""File sources. Spark reads .gz transparently (S2 is free); these wrap
the reference's reader quirks.

* CSV with LazyQuotes (helpers/helpers.go:113-118) → PERMISSIVE mode.
* Line-text (S4) → spark.read.text.
* Multi-line JSON (P4) → multiLine reader + explode, replacing the
  rune-by-rune brace tokenizer (parse_json_multi.go:94-156).
* CSV with an embedded JSON blob column (-jsoncol, parse_csv.go:55-67).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def read_csv(spark, path: str, **options) -> DataFrame:
    opts = {"header": "true", "mode": "PERMISSIVE", "multiLine": "true", "escape": '"'}
    opts.update(options)
    return spark.read.options(**opts).csv(path)


def read_text(spark, path: str) -> DataFrame:
    return spark.read.text(path).withColumnRenamed("value", "line")


def read_jsonl(spark, path: str, **options) -> DataFrame:
    return spark.read.options(**options).json(path)


def read_multiline_json(spark, path: str, records_field: str = "Records") -> DataFrame:
    """CloudTrail-style {"Records":[...]} → one row per record."""
    df = spark.read.option("multiLine", "true").json(path)
    return df.select(F.explode(F.col(records_field)).alias("record")).select("record.*")


def expand_json_column(df: DataFrame, json_col: str, keys: list[str]) -> DataFrame:
    """P1 embedded-JSON expansion: pull named keys out of a JSON blob
    column into top-level columns (parse_csv.go:55-67,155-174)."""
    out = df
    for k in keys:
        out = out.withColumn(k, F.get_json_object(F.col(json_col), f"$.{k}"))
    return out

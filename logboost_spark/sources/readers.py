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


def read_iis_w3c(spark, path: str) -> DataFrame:
    """IIS/W3C file source: the ``#Fields:`` directive (searched in the
    first 8 lines, parse_iis_w3c.go:15-54) names the columns; comma after
    ``#Fields`` = IIS style, space = W3C. Directive/comment lines (#
    prefix) are skipped; each data row splits into one column per field.

    The header probe is a driver-side read of ≤8 lines (metadata, like
    any schema inference); the data scan is fully distributed and rows
    whose field count mismatches the header are dropped, mirroring the
    reference's per-row guard (parse_iis_w3c.go:101-108).
    """
    lines = spark.read.text(path)
    head = [r.value for r in lines.limit(8).collect()]
    fields_line = next(
        (l for l in head if l.lower().startswith("#fields:")), None
    )
    if fields_line is None:
        raise ValueError(f"{path}: no #Fields directive in the first 8 lines")
    field_data = fields_line.split("#Fields:", 1)[-1].strip()
    iis_style = len(fields_line.split(" ")) == 2  # one space → comma-delimited
    headers = field_data.split(",") if iis_style else field_data.split(" ")
    delim = "," if iis_style else " "
    data = lines.filter(~F.col("value").startswith("#"))
    parts = F.split(F.col("value"), delim)
    data = data.filter(F.size(parts) == len(headers))
    return data.select(
        *[F.get(parts, i).alias(h) for i, h in enumerate(headers)]
    )


def expand_json_column(df: DataFrame, json_col: str, keys: list[str]) -> DataFrame:
    """P1 embedded-JSON expansion: pull named keys out of a JSON blob
    column into top-level columns (parse_csv.go:55-67,155-174)."""
    out = df
    for k in keys:
        out = out.withColumn(k, F.get_json_object(F.col(json_col), f"$.{k}"))
    return out

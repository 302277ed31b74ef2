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


# --- S1: directory discovery (reference findLogsToProcess) -------------------

LOG_EXTS = (".csv", ".log", ".txt")


def find_logs_to_process(
    input_dir: str, getall: bool = False, exts: tuple[str, ...] = LOG_EXTS
) -> list[str]:
    """Recursive log-file discovery (reference main.go:144-171): walk the
    tree collecting files whose extension is .csv/.log/.txt — their .gz
    variants included (Spark reads gzip transparently, S2) — and with
    ``getall`` EVERY file regardless of extension (the -getall
    fall-through). Deterministic sorted order."""
    import os

    out = []
    for root, _dirs, files in os.walk(input_dir):
        for fn in files:
            base = fn[:-3] if fn.endswith(".gz") else fn
            if getall or base.lower().endswith(tuple(exts)):
                out.append(os.path.join(root, fn))
    return sorted(out)


def read_log_directory(spark, input_dir: str, getall: bool = False) -> DataFrame:
    """Mixed log directory → transcript-shaped frame
    (conv_id, turn_idx, ts, role, tool, text).

    The reference's per-file model (one goroutine set and one output per
    input file, main.go:487) maps to: conv_id = the file's basename (so
    per-sink outputs keep file provenance and the salted route shuffle
    spreads big files), turn_idx = the row's sequence inside its file.
    CSV files go through the LazyQuotes reader and each row becomes a
    JSON text blob (IP/indicator extraction scans it like any text);
    .log/.txt are line sources. Gzip handled transparently.

    Scale note: per-file sequence numbers need a per-file window — hot
    only if a single FILE dominates the input, which mirrors the
    reference's own per-file serialization; the north-star table path
    (parquet/Iceberg transcripts) never uses this reader.
    """
    from pyspark.sql import Window

    from ..semantics import SOURCE_FILE_COL

    paths = find_logs_to_process(input_dir, getall=getall)
    if not paths:
        raise ValueError(f"{input_dir}: no log files found (getall={getall})")

    def is_csv(p: str) -> bool:
        return p.endswith(".csv") or p.endswith(".csv.gz")

    frames = []
    csvs = [p for p in paths if is_csv(p)]
    if csvs:
        from ..operators.combine import combine_files

        c = combine_files(spark, csvs, fmt="csv")
        data_cols = [x for x in c.columns if x != SOURCE_FILE_COL]
        frames.append(
            c.select(
                F.col(SOURCE_FILE_COL),
                F.to_json(F.struct(*data_cols)).alias("text"),
            )
        )
    others = [p for p in paths if not is_csv(p)]
    if others:
        t = spark.read.text(others).withColumn(SOURCE_FILE_COL, F.input_file_name())
        frames.append(t.select(F.col(SOURCE_FILE_COL), F.col("value").alias("text")))

    from ..operators.combine import combine

    df = combine(frames)
    conv = F.regexp_extract(F.col(SOURCE_FILE_COL), r"([^/]+?)(?:\.gz)?$", 1)
    w = Window.partitionBy(SOURCE_FILE_COL).orderBy(F.monotonically_increasing_id())
    return df.select(
        conv.alias("conv_id"),
        (F.row_number().over(w) - 1).alias("turn_idx"),
        F.lit(None).cast("timestamp").alias("ts"),
        F.lit("log").alias("role"),
        F.lit("none").alias("tool"),
        F.col("text"),
    )

"""End-to-end pipeline: parse → (date filter) → enrich → route → sinks → agg.

The Spark shape of the reference's per-file goroutine pipeline
(main.go:487 → enrichLogs → processFile → Parse* → ProcessRecords →
enrichRecord → ListenOnWriteChannel): one declarative plan, Catalyst
schedules everything, the three goroutine tiers collapse into partition
parallelism (SURVEY.md §3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.goformat import go_layout_to_jvm
from ..operators.enrich import enrich
from ..parsers.formats import parse_stage
from .checkpoint import write_routed
from .route import route_stage


def date_filter(
    df: DataFrame,
    date_col: str,
    go_layout: str | None,
    start: str,
    end: str,
) -> DataFrame:
    """F1 semantics (helpers/helpers.go:253-265): keep start ≤ ts ≤ end
    (inclusive both ends); rows whose timestamp fails to parse are KEPT."""
    col = F.col(date_col)
    ts = (
        F.to_timestamp(col)
        if go_layout is None
        else F.try_to_timestamp(col.cast("string"), F.lit(go_layout_to_jvm(go_layout)))
    )
    keep = ts.isNull() | ts.between(F.lit(start).cast("timestamp"), F.lit(end).cast("timestamp"))
    return df.filter(keep)


def run_pipeline(
    spark,
    transcripts: DataFrame,
    lookups: dict[str, DataFrame],
    out_dir: str,
    start: str | None = None,
    end: str | None = None,
    resume: bool = False,
    n_groups: int = 8,
    partitions_per_group: int | None = None,
    do_parse: bool = True,
    **enrich_flags,
) -> list[dict]:
    """Full run; returns the lineage manifest entries written."""
    df = transcripts
    if start is not None and end is not None:
        df = date_filter(df, "ts", None, start, end)
    if do_parse:
        df = parse_stage(df)
    df = enrich(df, lookups, **enrich_flags)
    routed = route_stage(df)
    return write_routed(
        routed,
        out_dir,
        n_groups=n_groups,
        resume=resume,
        partitions_per_group=partitions_per_group,
    )

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
    raw_fallthrough: bool = True,
    stage_barrier: bool = False,
    group_col_name: str | None = None,
    kv_separator: str = "=",
    kv_delimiter: str = ",",
    full_parse: bool = False,
    **enrich_flags,
) -> list[dict]:
    """Full run; returns the lineage manifest entries written.

    ``stage_barrier`` localCheckpoints the routed frame so group jobs
    share one upstream computation — measured NET-NEGATIVE (3-4×) for
    this pipeline: materializing wide map-typed rows costs more than
    recomputing the codegen'd stages, same lesson as write_routed's
    reuse_plan. Default off; the enrich-internal extraction barrier
    (cheap, slim rows) stays on.
    """
    df = transcripts
    if start is not None and end is not None:
        df = date_filter(df, "ts", None, start, end)
    # ORDER MATTERS: enrichment's broadcast joins re-copy every row per
    # operator; carrying the parse stage's map<string,string> column
    # through them measured ~16× slower than enriching slim rows.
    # Parse AFTER enrich so the fields map is materialized once, right
    # before the single routed shuffle.
    df = enrich(df, lookups, **enrich_flags)
    if do_parse:
        df = parse_stage(df, kv_separator=kv_separator, kv_delimiter=kv_delimiter)
        if not raw_fallthrough:
            # reference main.go:442: content with no recognized parser is
            # processed as raw ONLY under -getall/-rawtxt; otherwise it is
            # skipped (per-file there, per-line in this engine's model)
            df = df.filter(F.col("format") != "raw")
        if full_parse:
            # -fullparse (main.go:56): project the fields map to one
            # column per key seen ANYWHERE in the input — the key-union
            # aggregation is the distributed twin of the reference's
            # first full-file scan (parsers/extra_keys.deep_keys)
            from ..parsers.extra_keys import full_project

            df = full_project(df)
    routed = route_stage(df)
    if stage_barrier:
        routed = routed.localCheckpoint(eager=False)
    return write_routed(
        routed,
        out_dir,
        n_groups=n_groups,
        resume=resume,
        partitions_per_group=partitions_per_group,
        group_col_name=group_col_name,
    )

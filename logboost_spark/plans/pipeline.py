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
    # BYTE-DIET SHAPE (guide §2.3/§8, SURVEY §1.1): the per-group salted
    # exchange moves only the raw columns + the slim extraction output
    # (_ip/_cls/_join keys ≈ 30 B/row); the broadcast join pyramid, the
    # fields map and every lb_* sentinel string are computed AFTER the
    # shuffle, directly above each group's write — measured ~40% fewer
    # shuffle bytes and the exchange doubles as the codegen barrier the
    # old extraction localCheckpoint provided (fusing the extraction
    # regexes with the join stage measured 3-20× slower). Every
    # post-shuffle op is per-row deterministic, so output rows are
    # identical; ORDER STILL MATTERS: parse after enrich so the
    # map<string,string> never rides a join's row copy.
    from ..operators.enrich import enrich_extract, enrich_joins

    if full_parse and not do_parse:
        raise ValueError(
            "full_parse=True requires do_parse=True: the -fullparse "
            "projection is over the parsed fields map (ADVICE r06)"
        )
    extract_kw = {
        k: enrich_flags.pop(k)
        for k in ("text_col", "ip_col_name", "json_col_name")
        if k in enrich_flags
    }
    enrich_flags.pop("barrier", None)  # the salted exchange IS the barrier here

    def prepare() -> DataFrame:
        # called once per commit-group job: overlapping jobs must NOT
        # share driver-side expression tree instances (write_routed's
        # routed_factory contract — shared trees bleed values cross-row
        # under concurrent execution)
        return enrich_extract(df, **extract_kw)

    prepared = prepare()
    full_keys: list[str] | None = None
    if do_parse and full_parse:
        # -fullparse (main.go:56): one column per key seen ANYWHERE in
        # the input. The key union must be GLOBAL (a per-group union
        # would give groups different schemas), so run the two-pass
        # aggregation over the whole input up front — fields depend only
        # on text, so this prunes to a text-only scan (the reference's
        # first full-file scan, parsers/extra_keys.deep_keys).
        from ..parsers.extra_keys import deep_keys

        keyed = parse_stage(df, kv_separator=kv_separator, kv_delimiter=kv_delimiter)
        if not raw_fallthrough:
            keyed = keyed.filter(F.col("format") != "raw")
        full_keys = deep_keys(keyed)

    def finish(part: DataFrame) -> DataFrame:
        out = enrich_joins(part, lookups, **enrich_flags)
        if do_parse:
            out = parse_stage(
                out, kv_separator=kv_separator, kv_delimiter=kv_delimiter
            )
            if not raw_fallthrough:
                # reference main.go:442: content with no recognized
                # parser is processed as raw ONLY under -getall/-rawtxt;
                # otherwise it is skipped (per-file there, per-line in
                # this engine's model)
                out = out.filter(F.col("format") != "raw")
            if full_keys is not None:
                from ..parsers.extra_keys import shallow_project

                out = shallow_project(out, full_keys)
        return route_stage(out)

    factory = prepare
    if stage_barrier:
        # a shared checkpoint is the POINT of stage_barrier — group jobs
        # must read the one materialization, so they run sequentially
        # (no per-job fresh trees)
        prepared = prepared.localCheckpoint(eager=False)
        factory = None
    return write_routed(
        prepared,
        out_dir,
        n_groups=n_groups,
        resume=resume,
        partitions_per_group=partitions_per_group,
        group_col_name=group_col_name,
        post_shuffle=finish,
        routed_factory=factory,
    )

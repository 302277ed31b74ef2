"""spark-submit entry point — the CLI face of the engine.

Mirrors the reference's flag surface (main.go:24-105) on Spark terms:

    spark-submit --py-files logboost_spark.zip main.py \
        --input  /path/to/transcripts_parquet_or_iceberg \
        --output /path/to/sinks \
        --startdate 2023-06-01 --enddate 2023-06-02 \
        --ipcol lb_src --jsoncol AuditData \
        --no-ti --no-dns --no-whois --no-idb \
        --groups 16 --resume --combine

Reference-flag mapping: -logdir→--input, -outputdir→--output,
-startdate/-enddate/-datecol/-dateformat→same names, -useti/-usedns/
-usewhois/-useidb→--no-* inverses (enrichments default ON here),
-ipcol/-jsoncol→same, -combine→--combine, -separator/-delimiter→
--kvseparator/--kvdelimiter, -fullparse→--fullparse,
-summarizeti/-tifeeds/-ip→same names (report modes). Concurrency knobs
(-maxgoperfile/-batchsize/-concurrentfiles/-writebuffer) have no
equivalent: Spark's scheduler owns parallelism.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="logboost_spark pipeline")
    p.add_argument(
        "--input",
        default=None,
        help="transcript table path (parquet), or with --input-format logs a "
        "directory of raw .csv/.log/.txt(.gz) files (recursive discovery, "
        "reference findLogsToProcess main.go:144-171); required unless a "
        "report flag (--summarizeti/--tifeeds/--ip) is used",
    )
    p.add_argument(
        "--input-format",
        choices=["parquet", "logs"],
        default="parquet",
        help="'logs' = recursive mixed-file discovery + per-file readers",
    )
    p.add_argument(
        "--getall",
        action="store_true",
        help="with --input-format logs: take EVERY discovered file "
        "regardless of extension AND process unrecognized content as raw "
        "(reference -getall)",
    )
    p.add_argument(
        "--rawtxt",
        action="store_true",
        help="with --input-format logs: keep extension-filtered discovery "
        "but process content with no recognized format as a raw line "
        "(reference -rawtxt, main.go:43,442); without this or --getall, "
        "unrecognized content is skipped",
    )
    p.add_argument("--output", default=None,
                   help="sink root directory (required unless a report flag is used)")
    p.add_argument("--startdate", default=None)
    p.add_argument("--enddate", default=None)
    p.add_argument("--datecol", default="ts")
    p.add_argument("--dateformat", default=None, help="Go layout (translated to JVM)")
    p.add_argument("--ipcol", default=None)
    p.add_argument("--jsoncol", default=None)
    p.add_argument("--no-ti", action="store_true")
    p.add_argument("--no-dns", action="store_true")
    p.add_argument("--no-whois", action="store_true")
    p.add_argument("--no-idb", action="store_true")
    p.add_argument("--no-parse", action="store_true")
    p.add_argument(
        "--kvseparator",
        default="=",
        help="KV separator between key and value (reference -separator, "
        "main.go:33; e.g. ':' for 'k1:v1;k2:v2' logs)",
    )
    p.add_argument(
        "--kvdelimiter",
        default=",",
        help="KV delimiter between pairs (reference -delimiter, main.go:34; "
        "e.g. ';' for 'k1:v1;k2:v2' logs)",
    )
    p.add_argument(
        "--fullparse",
        action="store_true",
        help="scan the whole input for the key union and project the parsed "
        "fields map to one column per key (reference -fullparse, main.go:56); "
        "without it sinks keep the fields map column",
    )
    p.add_argument(
        "--buildti",
        action="store_true",
        help="TI-build entry point (reference -buildti, main.go:503-515 → "
        "BuildThreatDB): ingest every *.txt feed under --feeddir (feed_name "
        "= file stem, category = containing subdir, else 'unknown') into "
        "--output/ti.parquet, then print the summary report",
    )
    p.add_argument(
        "--updateti",
        action="store_true",
        help="like --buildti but insert-or-ignore MERGES into an existing "
        "--output/ti.parquet (reference -updateti)",
    )
    p.add_argument("--feeddir", default=None, help="feed directory for --buildti/--updateti")
    p.add_argument(
        "--summarizeti",
        action="store_true",
        help="report mode: print distinct-indicator count of the TI table as "
        "JSON and exit (reference -summarizeti, main.go:547-555)",
    )
    p.add_argument(
        "--tifeeds",
        action="store_true",
        help="report mode: print per-feed indicator counts as JSON and exit "
        "(reference -tifeeds, main.go:557-565)",
    )
    p.add_argument(
        "--ip",
        default=None,
        help="ad-hoc mode: extract and print the first public (else first) IP "
        "from the given string via the pipeline's F2 extraction, then exit "
        "(reference -ip, main.go:588-598)",
    )
    p.add_argument("--groups", type=int, default=8, help="commit groups (resume units)")
    p.add_argument(
        "--group-col",
        default=None,
        help="source partition column holding pmod(xxhash64(conv_id), --groups) "
        "(Iceberg bucket layout) — enables per-group partition PRUNING at the scan",
    )
    p.add_argument(
        "--intelfile",
        default=None,
        help="local text file of custom indicators to merge into the TI "
        "table before enrichment (reference -intelfile, main.go:516-545; "
        "requires --intelname and --inteltype)",
    )
    p.add_argument("--intelname", default=None, help="feed name/tag for --intelfile")
    p.add_argument("--inteltype", default=None, help="category label for --intelfile")
    p.add_argument("--resume", action="store_true")
    p.add_argument(
        "--stream",
        action="store_true",
        help="run the pipeline as a Structured Streaming availableNow drain "
        "(foreachBatch enrichment, checkpointed per-sink parquet) instead of "
        "the batch group-committed writer; parquet input only",
    )
    p.add_argument("--combine", action="store_true", help="write combined union of all sinks")
    p.add_argument("--cores", type=int, default=None, help="local[N] cores (tests only)")
    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    from logboost_spark.session import get_spark
    from logboost_spark.fixtures.lookups import build_lookup_dfs
    from logboost_spark.functions.goformat import go_layout_to_jvm  # noqa: F401
    from logboost_spark.plans.pipeline import run_pipeline, date_filter
    from logboost_spark.plans.checkpoint import read_sinks, sink_counts

    report_mode = args.summarizeti or args.tifeeds or args.ip is not None
    ti_build_mode = args.buildti or args.updateti
    if ti_build_mode and (args.feeddir is None or args.output is None):
        print("--buildti/--updateti require --feeddir and --output", file=sys.stderr)
        return 2
    if not report_mode and not ti_build_mode and (args.input is None or args.output is None):
        print("--input and --output are required", file=sys.stderr)
        return 2
    if args.stream and args.input_format != "parquet":
        print("--stream requires --input-format parquet", file=sys.stderr)
        return 2
    if args.fullparse and (args.stream or args.no_parse):
        # fail loudly instead of silently writing the fields-map schema
        # the user asked to have projected away (round-6 self-review)
        print("--fullparse requires the batch parse path "
              "(not --stream / --no-parse)", file=sys.stderr)
        return 2
    spark = get_spark(app_name="logboost_spark_cli", cores=args.cores)
    if args.ip is not None:
        # reference main.go:588-598: validate/extract via the SAME F2
        # extraction the pipeline uses (RegexFirstPublicIPFromString),
        # echo the IP, exit; invalid input is an error
        from logboost_spark.functions.ip import ip_extract_stage

        row = ip_extract_stage(
            spark.createDataFrame([(args.ip,)], "text string")
        ).select("_ip", "_cls").first()
        if row["_cls"] == "noip":
            print(f"Invalid IP Address: {args.ip}", file=sys.stderr)
            return 2
        print(row["_ip"])
        return 0
    if ti_build_mode:
        # reference BuildThreatDB (threatIntel.go:117-156): per feed file,
        # IngestFile line semantics (comment/blank skip, first IPv4,
        # private filter, insert-or-ignore). HTTP download is replaced by
        # the local --feeddir per the offline design (SURVEY §1.4); the
        # SQLite star schema is the flat (ip, feed_name, category) table.
        import glob

        from logboost_spark.operators.ti_build import build_ti_table, summarize_ti

        feed_files = sorted(
            glob.glob(os.path.join(args.feeddir, "**", "*.txt"), recursive=True)
        )
        if not feed_files:
            print(f"no *.txt feeds under {args.feeddir}", file=sys.stderr)
            return 2
        feeds = []
        for path in feed_files:
            name = os.path.splitext(os.path.basename(path))[0]
            parent = os.path.dirname(os.path.abspath(path))
            cat = (
                os.path.basename(parent)
                if parent != os.path.abspath(args.feeddir)
                else "unknown"
            )
            feeds.append(
                (name, cat, spark.read.text(path).withColumnRenamed("value", "line"))
            )
        ti = build_ti_table(spark, feeds)
        out_path = os.path.join(args.output, "ti.parquet")
        if args.updateti and os.path.exists(out_path):
            ti = (
                spark.read.parquet(out_path)
                .unionByName(ti)
                .dropDuplicates(["ip", "feed_name", "category"])
            )
        # materialize before overwriting a path the plan may read from
        ti = ti.localCheckpoint(eager=True)
        ti.write.mode("overwrite").parquet(out_path)
        n_rows = ti.count()
        n_ips = summarize_ti(ti).first()["distinct_ips"]
        print(json.dumps({
            "ti_path": out_path, "feeds_ingested": len(feeds),
            "rows": n_rows, "distinct_ips": n_ips,
        }))
        return 0
    # shallow copy of the base tables only: build_lookup_dfs returns the
    # per-session shared dict (it doubles as the derived-table cache,
    # tuple-keyed); the --intelfile path below replaces "ti", which must
    # neither leak into other callers nor reuse a combined-lookup cache
    # built from the pristine TI table
    lookups = {k: v for k, v in build_lookup_dfs(spark).items() if isinstance(k, str) and not k.startswith("_")}
    intel_flags = [args.intelfile, args.intelname, args.inteltype]
    if any(intel_flags):
        if not all(intel_flags):
            # reference main.go:107-108: the three flags travel together
            print("Must use --intelfile, --intelname and --inteltype together",
                  file=sys.stderr)
            return 2
        from logboost_spark.operators.ti_build import ingest_intel_lines

        custom = ingest_intel_lines(
            spark.read.text(args.intelfile).withColumnRenamed("value", "line"),
            args.intelname,
            args.inteltype,
        )
        lookups["ti"] = lookups["ti"].unionByName(custom).dropDuplicates(
            ["ip", "feed_name", "category"]
        )
    if args.summarizeti:
        # reference -summarizeti (main.go:547-555 → SummarizeThreatDB):
        # distinct indicator count over the TI table (+ any --intelfile)
        from logboost_spark.operators.ti_build import summarize_ti, ti_category_counts

        n = summarize_ti(lookups["ti"]).first()["distinct_ips"]
        cats = {
            r.category: r.cnt for r in ti_category_counts(lookups["ti"]).collect()
        }
        print(json.dumps({"distinct_ips": n, "category_counts": cats},
                         sort_keys=True))
        return 0
    if args.tifeeds:
        # reference -tifeeds (main.go:557-565 → SummarizeThreatFeeds)
        from logboost_spark.operators.ti_build import ti_feed_listing

        feeds = [
            {"feed_name": r.feed_name, "distinct_ips": r.distinct_ips,
             "rows": r.rows}
            for r in ti_feed_listing(lookups["ti"])
            .orderBy("feed_name").collect()
        ]
        print(json.dumps({"feeds": feeds}))
        return 0
    if args.input_format == "logs":
        from logboost_spark.sources.readers import read_log_directory

        transcripts = read_log_directory(spark, args.input, getall=args.getall)
    else:
        transcripts = spark.read.parquet(args.input)
    if args.startdate and args.enddate:
        transcripts = date_filter(
            transcripts, args.datecol, args.dateformat, args.startdate, args.enddate
        )
    if args.stream:
        from logboost_spark.plans.streaming import stream_pipeline

        # the stream path re-reads args.input inside the streaming source,
        # so the batch date_filter above never applies — feed the SAME
        # filter into each micro-batch via the pre_enrich hook
        pre = None
        if args.startdate and args.enddate:
            def pre(df):  # noqa: E306
                return date_filter(
                    df, args.datecol, args.dateformat, args.startdate, args.enddate
                )

        stream_pipeline(
            spark,
            args.input,
            lookups,
            args.output,
            do_parse=not args.no_parse,
            pre_enrich=pre,
            kv_separator=args.kvseparator,
            kv_delimiter=args.kvdelimiter,
            use_ti=not args.no_ti,
            use_dns=not args.no_dns,
            use_whois=not args.no_whois,
            use_idb=not args.no_idb,
            ip_col_name=args.ipcol,
            json_col_name=args.jsoncol,
        )
        # streaming writes no group manifests — count from the data itself
        from pyspark.sql import functions as F
        from pyspark.errors import AnalysisException

        try:
            streamed = spark.read.parquet(os.path.join(args.output, "data"))
        except AnalysisException:
            # every micro-batch emptied (e.g. a date window matching no
            # rows): the sink holds no part files, so schema inference
            # fails — report zero counts like the batch path does
            print(json.dumps({"streamed": True, "sink_counts": {}}))
            return 0
        counts = {
            r.sink: r.cnt
            for r in streamed.groupBy("sink")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        if args.combine:
            streamed.withColumn(
                "SourceFile", F.input_file_name()
            ).write.mode("overwrite").parquet(os.path.join(args.output, "combined"))
        print(json.dumps({"streamed": True, "sink_counts": counts}))
        return 0
    manifests = run_pipeline(
        spark,
        transcripts,
        lookups,
        args.output,
        resume=args.resume,
        n_groups=args.groups,
        group_col_name=args.group_col,
        do_parse=not args.no_parse,
        kv_separator=args.kvseparator,
        kv_delimiter=args.kvdelimiter,
        full_parse=args.fullparse,
        raw_fallthrough=(
            args.input_format != "logs" or args.getall or args.rawtxt
        ),
        use_ti=not args.no_ti,
        use_dns=not args.no_dns,
        use_whois=not args.no_whois,
        use_idb=not args.no_idb,
        ip_col_name=args.ipcol,
        json_col_name=args.jsoncol,
    )
    counts = sink_counts(spark, args.output)
    if args.combine:
        from pyspark.sql import functions as F

        read_sinks(spark, args.output).withColumn(
            "SourceFile", F.input_file_name()
        ).write.mode("overwrite").parquet(os.path.join(args.output, "combined"))
    print(json.dumps({"groups_written": len(manifests), "sink_counts": counts}))
    return 0


if __name__ == "__main__":
    sys.exit(main())

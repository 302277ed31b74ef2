"""The enrichment stage: LogBoost's ``enrichRecord`` as broadcast joins.

Reference flow (helpers/helpers.go:295-480): extract IP from the row →
classify (none / invalid / private / public) → for public IPs, look up
geo-ASN, geo-city, threat intel (+ datacenter-ASN merge), reverse DNS,
TLD, WHOIS (domain + IP), Shodan InternetDB — appending the fixed
``lb_*`` column suffix with string sentinels on each miss path.

Spark shape: ONE pass over the fact table with
  * two prefix-bucketed broadcast range joins (geo ASN / city),
  * five broadcast hash left joins (ti, dns_ptr, whois_domain, whois_ip,
    shodan_idb),
  * one ``isin`` literal membership test (dc ASN — ~800 values),
  * one Arrow-batched pandas UDF (public-suffix TLD parse).
No fact-side shuffle anywhere; every lookup side broadcasts. Private /
no-IP rows carry null join keys, so they fall through every join for
free and get sentinel-filled at the end (the reference's early-exit,
expressed declaratively).

Sentinel matrix (see semantics.py for the ragged-row normalization note):
  no IP found / unparseable  → lb_IP="NoIP", every enrich col "NoIP"
  private IP                 → lb_IP=ip,    every enrich col "PVT"
  public, geo miss           → ""           (helpers/helpers.go:373-389)
  public, TI miss            → none/0/none  (helpers/threatIntel.go:403)
  public, DNS miss           → "none"/"none" (helpers/helpers.go:499-509)
  public, WHOIS/IDB miss     → "err"×4/×8/×5 (lookup attempted, no data)
  public, DNS hit but TLD=none → domain-WHOIS "NA"×4 (helpers.go:469-473)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.ip import ip_extract_stage
from ..functions.tld import tld_of
from ..semantics import (
    DNS_FIELDS,
    GEO_FIELDS,
    IDB_FIELDS,
    THREAT_FIELDS,
    WHOIS_DOMAIN_FIELDS,
    WHOIS_IP_FIELDS,
)
from .geo_join import flatten_intervals, merge_disjoint_interval_tables, range_lookup_join

_DC_CATEGORY = "dc"
_DC_FEED = "internal datacenter list"


def ti_by_ip(ti: DataFrame) -> DataFrame:
    """Pre-aggregate (ip, feed_name, category) rows to one row per IP,
    with the output strings FULLY precomputed lookup-side.

    Mirrors CheckIPinTI's dedupe+sort (helpers/threatIntel.go:381-423,
    helpers/helpers.go:1111-1122): both lists sorted, distinct; the feed
    count is the number of distinct feeds. Done once on the tiny lookup
    side, so the fact-side join stays 1:1 (no row explosion).

    Besides the plain joined strings, the datacenter-ASN variants
    (category/feed lists with the DC entry merged in, helpers.go:448-455)
    are also precomputed here: the fact side then just picks a string by
    the per-row ``_is_dc`` flag instead of running
    array_sort∘array_distinct∘concat∘array_join on EVERY row — per-row
    output-expression work measured as the marginal cost of enrich.
    """
    base = ti.groupBy("ip").agg(
        F.array_sort(F.collect_set("category")).alias("_c"),
        F.array_sort(F.collect_set("feed_name")).alias("_f"),
    )
    dc_c = F.array_sort(
        F.array_distinct(F.concat(F.col("_c"), F.array(F.lit(_DC_CATEGORY))))
    )
    dc_f = F.array_sort(
        F.array_distinct(F.concat(F.col("_f"), F.array(F.lit(_DC_FEED))))
    )
    return base.select(
        "ip",
        F.array_join("_c", "|").alias("_ti_cats_str"),
        F.array_join("_f", "|").alias("_ti_feeds_str"),
        F.size("_f").cast("string").alias("_ti_nfeeds_str"),
        F.array_join(dc_c, "|").alias("_ti_cats_dc_str"),
        F.array_join(dc_f, "|").alias("_ti_feeds_dc_str"),
        F.size(dc_f).cast("string").alias("_ti_nfeeds_dc_str"),
    )


def enrich_extract(
    df: DataFrame,
    text_col: str = "text",
    ip_col_name: str | None = None,
    json_col_name: str | None = None,
) -> DataFrame:
    """Phase 1 of enrich: IP extraction + join-key columns.

    Appends ``_ip``/``_cls`` (ip_extract_stage) plus the public-only
    join keys ``_join_ip`` (string) and ``_join_v4`` (int form). This is
    the only part of enrich that reads ``text``; everything downstream
    (enrich_joins) references these slim attributes — which is what lets
    the pipeline shuffle extraction output instead of formatted rows.
    """
    df = ip_extract_stage(
        df, text_col, ip_col_name=ip_col_name, json_col_name=json_col_name
    )
    pub = F.col("_cls") == "pub"
    df = df.withColumn("_join_ip", F.when(pub, F.col("_ip")))
    return df.withColumn("_join_v4", F.when(pub, F.col("_v4l"))).drop("_v4l")


def enrich(
    df: DataFrame,
    lookups: dict[str, DataFrame],
    text_col: str = "text",
    use_ti: bool = True,
    use_dns: bool = True,
    use_whois: bool = True,
    use_idb: bool = True,
    dc_asn_numbers: list[int] | None = None,
    ip_col_name: str | None = None,
    json_col_name: str | None = None,
    barrier: bool = True,
) -> DataFrame:
    """Append the lb_* enrichment suffix. Flags mirror -useti/-usedns/
    -usewhois/-useidb (+ -ipcol/-jsoncol source precedence); column
    order is fixed (vars/vars.go:51-56).

    ``barrier`` cuts the plan lineage between the extraction stage and
    the join pyramid with a lazy localCheckpoint: the Catalyst analyzer
    otherwise re-walks the big extraction expression trees once per
    join, superlinearly — measured 20s → 120s → minutes of pure
    driver time as joins accumulate. The barrier also materializes the
    extraction once, so multi-action consumers (the per-group commit
    jobs) don't recompute it. On a cluster with unreliable local disks
    prefer `spark.checkpoint.dir` + .checkpoint(), or stage the
    extraction to a table. (run_pipeline no longer uses the barrier: its
    per-group salted exchange sits between extraction and the joins and
    materializes the slim extraction output as shuffle files instead.)

    CONTRACT: every stage here is deterministic over its input rows
    (broadcast lookups are fixed tables; no sampling, no wall-clock
    reads, no monotonically_increasing_id). The streaming sink's
    exactly-once replay (plans/streaming.stream_pipeline) depends on
    this — a nondeterministic enrichment would silently weaken the
    crash-rerun guarantee from identical-content to same-cardinality.
    """
    df = enrich_extract(
        df, text_col, ip_col_name=ip_col_name, json_col_name=json_col_name
    )
    if barrier:
        df = df.localCheckpoint(eager=False)
    return enrich_joins(
        df,
        lookups,
        use_ti=use_ti,
        use_dns=use_dns,
        use_whois=use_whois,
        use_idb=use_idb,
        dc_asn_numbers=dc_asn_numbers,
    )


def enrich_joins(
    df: DataFrame,
    lookups: dict[str, DataFrame],
    use_ti: bool = True,
    use_dns: bool = True,
    use_whois: bool = True,
    use_idb: bool = True,
    dc_asn_numbers: list[int] | None = None,
) -> DataFrame:
    """Phase 2 of enrich: broadcast join pyramid + lb_* output columns.

    Expects the enrich_extract columns (``_ip``/``_cls``/``_join_ip``/
    ``_join_v4``) as real attributes on ``df``.
    """
    pub = F.col("_cls") == "pub"

    # --- geo (J1/J2): ONE prefix-bucketed broadcast range join ----------
    # geo_asn + geo_city are outer-merged into a single disjoint interval
    # table (segments carry asn attrs, city attrs, or both), so the fact
    # table is range-joined — and its rows re-copied — once instead of
    # twice. Row-for-row identical to two sequential left joins
    # (merge_disjoint_interval_tables docstring). The merged table is a
    # PRECOMPUTED lookup (`geo_merged`, built offline with the other
    # dimension fixtures — build_lookup_dfs / tools/build_fixtures.py):
    # a full GeoLite2-City table is ~3M intervals, so merging it through
    # the driver per session would be minutes of serial time. The
    # fallback below exists only for callers that hand-roll a lookups
    # dict; it selects attrs BY NAME (column order must not matter) and
    # caches per-dict (single-session assumption, like every lookup DF).
    if "geo_merged" not in lookups:
        a_rows = flatten_intervals(
            [
                tuple(r)
                for r in lookups["geo_asn"]
                .select("net_start", "net_end", "asn_org", "asn_number")
                .collect()
            ]
        )
        b_rows = flatten_intervals(
            [
                tuple(r)
                for r in lookups["geo_city"]
                .select("net_start", "net_end", "country", "city")
                .collect()
            ]
        )
        lookups["geo_merged"] = df.sparkSession.createDataFrame(
            merge_disjoint_interval_tables(a_rows, b_rows, n_a=2, n_b=2),
            "net_start bigint, net_end bigint, asn_org string, "
            "asn_number bigint, country string, city string",
        )
    df = range_lookup_join(
        df,
        F.col("_join_v4"),
        lookups["geo_merged"],
        ["asn_org", "asn_number", "country", "city"],
        prefix="_g_",
    )

    # --- datacenter ASN membership (J4): literal set, codegen'd ---------
    if dc_asn_numbers is None:
        if "_dc_asn_numbers" not in lookups:
            lookups["_dc_asn_numbers"] = [r[0] for r in lookups["dc_asn"].collect()]
        dc_asn_numbers = lookups["_dc_asn_numbers"]
    df = df.withColumn(
        "_is_dc", F.coalesce(F.col("_g_asn_number").isin(dc_asn_numbers), F.lit(False))
    )

    out_cols = [*df.columns]

    def _sentinel(col, noip="NoIP", pvt="PVT"):
        return (
            F.when(F.col("_cls") == "noip", F.lit(noip))
            .when(F.col("_cls") == "pvt", F.lit(pvt))
            .otherwise(col)
        )

    # --- geo output columns ---------------------------------------------
    geo_out = [
        _sentinel(F.col("_ip"), noip="NoIP", pvt=None).alias("lb_IP"),
        _sentinel(F.coalesce(F.col("_g_asn_org"), F.lit(""))).alias("lb_ASN"),
        _sentinel(
            F.coalesce(F.col("_g_asn_number").cast("string"), F.lit(""))
        ).alias("lb_ASN_Number"),
        _sentinel(F.coalesce(F.col("_g_country"), F.lit(""))).alias("lb_Country"),
        _sentinel(F.coalesce(F.col("_g_city"), F.lit(""))).alias("lb_City"),
    ]
    # lb_IP on the PVT path carries the extracted private IP (helpers.go:349)
    geo_out[0] = (
        F.when(F.col("_cls") == "noip", F.lit("NoIP"))
        .otherwise(F.col("_ip"))
        .alias("lb_IP")
    )

    # --- ONE broadcast join for every ip-keyed lookup --------------------
    # TI (J3), DNS (J5), IP-WHOIS (J8) and IDB (J9) all key on _join_ip.
    # The lookups are dimension-sized with unique ip keys, so pre-joining
    # them full-outer on the lookup side (key union) and LEFT-joining the
    # fact table ONCE is row-for-row identical to the sequential left
    # joins. Wall-clock parity locally (whole-stage codegen already fused
    # the consecutive probes into one row build), but: one broadcast to
    # ship instead of four, a shallower analyzed plan, and one probe per
    # row instead of four — which matters whenever codegen fusion breaks
    # (stage too wide, method split) or on executors where four separate
    # broadcast relations would each hold memory.
    ip_lookups: list[DataFrame] = []
    if use_ti:
        ip_lookups.append(ti_by_ip(lookups["ti"]).withColumnRenamed("ip", "_ipk"))
    if use_dns:
        dp_src = lookups["dns_ptr"]
        if "domains_joined" in dp_src.columns and "tld" in dp_src.columns:
            # fixture-precomputed columns (tools/build_fixtures.py runs
            # the SAME parse_psl_domain): no per-action ArrowEvalPython,
            # the dns lookup side stays all-JVM
            dp = dp_src.select(
                F.col("ip").alias("_ipk"),
                F.col("domains_joined").alias("_domains_str"),
                F.col("tld").alias("_tld_lk"),
            )
        else:
            dp = dp_src.select(
                F.col("ip").alias("_ipk"),
                # pipe-join precomputed lookup-side (dimension rows), not
                # per fact row
                F.array_join("domains", "|").alias("_domains_str"),
                # TLD parse on the LOOKUP side (dimension-sized): the
                # fact table never touches Python — the pandas UDF runs
                # once per PTR record before the broadcast. (Fact-side
                # `when` branches would be hoisted by Spark and run on
                # EVERY row.)
                tld_of(F.get(F.col("domains"), 0)).alias("_tld_lk"),
            )
        ip_lookups.append(dp)
    if use_whois:
        ip_lookups.append(
            lookups["whois_ip"].select(
                F.col("ip").alias("_ipk"),
                *[
                    F.col(c).alias(f"_wi_{c}")
                    for c in ["cidr", "netname", "nettype", "org", "created", "updated", "country", "parent"]
                ],
            )
        )
    if use_idb:
        ip_lookups.append(
            lookups["shodan_idb"].select(
                F.col("ip").alias("_ipk"),
                F.array_join("cpes", "|").alias("_idb_cpes"),
                F.array_join("hostnames", "|").alias("_idb_hostnames"),
                F.array_join(F.transform("ports", lambda x: x.cast("string")), "|").alias(
                    "_idb_ports"
                ),
                F.array_join("tags", "|").alias("_idb_tags"),
                F.array_join("vulns", "|").alias("_idb_vulns"),
            )
        )
    if ip_lookups:
        # key union + left joins rather than chained full_outer: full
        # outer can't broadcast (it would plan lookup-side SortMergeJoins);
        # left joins of dimension-sized frames stay BroadcastHashJoin all
        # the way down, keeping the whole enrich plan shuffle-free.
        #
        # The combined table is MATERIALIZED once per (lookups dict,
        # flags): without this every Spark ACTION (each per-group commit
        # job, every bench rep) re-ran the lookup-side pre-join — two
        # aggregation exchanges, a union-distinct, and the tld_of
        # ArrowEvalPython (spawning Python workers) — measured as tens of
        # seconds of mostly-idle stage time per pipeline run (guide §1.1:
        # the time was going to broadcast builds, not the fact scan).
        # Dimension-sized (~1k rows), so the one-time driver collect is
        # the same pattern as the precomputed geo_merged fixture; the
        # re-created 1-partition frame makes every later broadcast build
        # a single trivial task.
        cache_key = ("_combined_ip", use_ti, use_dns, use_whois, use_idb)
        if cache_key not in lookups:
            keys = ip_lookups[0].select("_ipk")
            for lk in ip_lookups[1:]:
                keys = keys.union(lk.select("_ipk"))
            combined = keys.distinct()
            for lk in ip_lookups:
                combined = combined.join(F.broadcast(lk), "_ipk", "left")
            # session-temp parquet round-trip, NOT createDataFrame(rows):
            # a rows-list frame scans through a pickled Python RDD and
            # would re-pay a Python worker on every later broadcast
            # build; the parquet read-back is a trivial JVM scan.
            # Dimension-only data, removed at interpreter exit.
            import atexit
            import shutil
            import tempfile

            d = tempfile.mkdtemp(prefix="lb_combined_lookup_")
            atexit.register(shutil.rmtree, d, ignore_errors=True)
            combined.coalesce(1).write.mode("overwrite").parquet(d)
            lookups[cache_key] = df.sparkSession.read.parquet(d)
        combined = lookups[cache_key]
        df = df.join(
            F.broadcast(combined), df["_join_ip"] == combined["_ipk"], "left"
        ).drop("_ipk")

    # --- threat intel (J3+J4+A1) -----------------------------------------
    ti_out = []
    if use_ti:
        # every array op happened lookup-side in ti_by_ip; per fact row
        # this is just a flag-picked string coalesce. Semantics preserved:
        # dc + ti-hit → merged lists; dc + no-hit → the DC entry alone
        # (old code's concat-with-empty path); no-dc + no-hit → none/0.
        is_dc = F.col("_is_dc")
        ti_out = [
            _sentinel(
                F.when(
                    is_dc, F.coalesce(F.col("_ti_cats_dc_str"), F.lit(_DC_CATEGORY))
                ).otherwise(F.coalesce(F.col("_ti_cats_str"), F.lit("none")))
            ).alias("lb_ThreatCategories"),
            _sentinel(
                F.when(
                    is_dc, F.coalesce(F.col("_ti_nfeeds_dc_str"), F.lit("1"))
                ).otherwise(F.coalesce(F.col("_ti_nfeeds_str"), F.lit("0")))
            ).alias("lb_ThreatFeedCount"),
            _sentinel(
                F.when(
                    is_dc, F.coalesce(F.col("_ti_feeds_dc_str"), F.lit(_DC_FEED))
                ).otherwise(F.coalesce(F.col("_ti_feeds_str"), F.lit("none")))
            ).alias("lb_ThreatFeeds"),
        ]

    # --- DNS + TLD (J5+J6) ------------------------------------------------
    dns_out = []
    if use_dns:
        df = df.withColumn("_tld", F.when(pub, F.col("_tld_lk")))
        dns_out = [
            _sentinel(
                F.coalesce(F.col("_domains_str"), F.lit("none"))
            ).alias("lb_Domains"),
            _sentinel(F.coalesce(F.col("_tld"), F.lit("none"))).alias("lb_TLD"),
        ]

    # --- WHOIS domain (J7) -------------------------------------------------
    wd_out = []
    if use_whois and use_dns:
        wd = lookups["whois_domain"].select(
            F.col("domain").alias("_wd_domain"),
            F.col("created").alias("_wd_created"),
            F.col("updated").alias("_wd_updated"),
            F.col("country").alias("_wd_country"),
            F.col("org").alias("_wd_org"),
        )
        has_domain = F.col("_tld").isNotNull() & (F.col("_tld") != "none")
        df = df.join(
            F.broadcast(wd),
            F.when(has_domain, F.col("_tld")) == wd["_wd_domain"],
            "left",
        )
        # valid domain + lookup miss → "err" (live lookup failed);
        # no domain at all → "NA" (lookup skipped, helpers.go:469-473)
        for src, name in zip(
            ["_wd_created", "_wd_updated", "_wd_country", "_wd_org"],
            WHOIS_DOMAIN_FIELDS,
        ):
            wd_out.append(
                _sentinel(
                    F.when(~has_domain, F.lit("NA")).otherwise(
                        F.coalesce(F.col(src), F.lit("err"))
                    )
                ).alias(name)
            )

    # --- WHOIS IP (J8) -------------------------------------------------------
    wi_out = []
    if use_whois:
        for src, name in zip(
            ["cidr", "netname", "nettype", "org", "created", "updated", "country", "parent"],
            WHOIS_IP_FIELDS,
        ):
            wi_out.append(
                _sentinel(F.coalesce(F.col(f"_wi_{src}"), F.lit("err"))).alias(name)
            )

    # --- Shodan InternetDB (J9) ----------------------------------------------
    idb_out = []
    if use_idb:
        for src, name in zip(
            ["cpes", "hostnames", "ports", "tags", "vulns"], IDB_FIELDS
        ):
            idb_out.append(
                _sentinel(F.coalesce(F.col(f"_idb_{src}"), F.lit("err"))).alias(name)
            )

    keep = [c for c in out_cols if not c.startswith("_") and c != "domains"]
    return df.select(
        *keep,
        F.col("_cls").alias("lb_class"),
        *geo_out,
        *ti_out,
        *dns_out,
        *wd_out,
        *wi_out,
        *idb_out,
    )



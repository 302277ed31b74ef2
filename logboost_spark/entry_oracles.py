"""DuckDB oracle SQL builders for the driver's correctness gate.

Each function returns an ANSI-SQL string DuckDB can run against the
driver's pre-registered views (region nation customer supplier part
orders lineitem events documents embeddings) plus this repo's committed
fixture parquet (transcripts + lookup tables, read by absolute path).

The transcript-pipeline oracles re-implement the reference semantics
*in SQL from scratch* — independent of the Spark engine's column
expressions — sharing only the regex PATTERNS (so both sides tokenize
identically; the logic is separate).
"""

from __future__ import annotations

import os

from .functions.ip import IPV4_RE, IPV6_RE, STRICT_V6_RE
from .functions.hashing import MERSENNE_P, minhash_params
from .functions.textfns import LANG_MARKERS, STOPWORDS
from .fixtures.transcripts import fixture_path

DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
LOOKUP_DIR = os.path.join(DATA_DIR, "lookups")

TRANSCRIPTS_001 = fixture_path("sf0.01")  # driver correctness runs at sf=0.01


def _lk(name: str) -> str:
    return f"read_parquet('{os.path.join(LOOKUP_DIR, name + '.parquet')}')"


# --- IP predicate fragments (mirror helpers/network.go:124-142) -------------


def _o(x: str, i: int) -> str:
    return f"TRY_CAST(string_split({x},'.')[{i}] AS INT)"


def sql_priv4(x: str) -> str:
    o1, o2, o3 = _o(x, 1), _o(x, 2), _o(x, 3)
    return (
        f"({o1}=127 OR {o1}=10 OR ({o1}=172 AND {o2} BETWEEN 16 AND 31)"
        f" OR ({o1}=192 AND {o2}=168) OR ({o1}=192 AND {o2}=0 AND ({o3}=0 OR {o3}=2))"
        f" OR ({o1}=169 AND {o2}=254) OR {o1} BETWEEN 224 AND 239 OR {o1}=255"
        f" OR {x}='0.0.0.0')"
    )


def sql_priv6(x: str) -> str:
    return (
        f"(lower({x}) IN ('::1','::') OR regexp_matches(lower({x}),'^fe[89ab]')"
        f" OR regexp_matches(lower({x}),'^f[cd]') OR lower({x}) LIKE 'ff%'"
        f" OR lower({x}) LIKE '64:ff9b:1:%')"
    )


def sql_priv(x: str) -> str:
    return f"(CASE WHEN contains({x},':') THEN {sql_priv6(x)} ELSE {sql_priv4(x)} END)"


def sql_ip4_int(x: str) -> str:
    # TRY_CAST: join predicates are evaluated eagerly on every row (no
    # short-circuit), so IPv6 values must become NULL, not a cast error
    return (
        f"(TRY_CAST(string_split({x},'.')[1] AS BIGINT)*16777216"
        f" + TRY_CAST(string_split({x},'.')[2] AS BIGINT)*65536"
        f" + TRY_CAST(string_split({x},'.')[3] AS BIGINT)*256"
        f" + TRY_CAST(string_split({x},'.')[4] AS BIGINT))"
    )


def transcript_cls_cte(path: str | None = None) -> str:
    """Shared CTE chain: transcripts → extracted ip → lb_class."""
    p = path or TRANSCRIPTS_001
    return f"""
WITH tr AS (SELECT * FROM read_parquet('{p}')),
x AS (SELECT conv_id, turn_idx, role, tool, ts, text,
        regexp_extract_all(text, '({IPV4_RE})', 1) AS v4s,
        regexp_extract(text, '({IPV6_RE})', 1) AS v6raw
      FROM tr),
e AS (SELECT *, COALESCE(list_filter(v4s, q -> NOT {sql_priv4('q')})[1], v4s[1],
        CASE WHEN v6raw <> '' THEN v6raw END) AS ip FROM x),
cls AS (SELECT *, CASE
        WHEN ip IS NULL THEN 'noip'
        WHEN contains(ip,':') AND NOT regexp_matches(ip, '{STRICT_V6_RE}') THEN 'noip'
        WHEN {sql_priv('ip')} THEN 'pvt' ELSE 'pub' END AS lb_class
      FROM e)"""


def enriched_cte(path: str | None = None) -> str:
    """cls → full lb_* columns via lookup parquet joins (SQL oracle of the
    enrichment stage)."""
    geo_asn, geo_city, ti, dns = _lk("geo_asn"), _lk("geo_city"), _lk("ti"), _lk("dns_ptr")
    ipint = sql_ip4_int("c.ip")
    return (
        transcript_cls_cte(path)
        + f""",
ti_by_ip AS (SELECT ip,
      list_sort(list(DISTINCT category)) AS cats,
      list_sort(list(DISTINCT feed_name)) AS feeds
    FROM {ti} GROUP BY ip),
joined AS (
  SELECT c.*, ga.asn_org, ga.asn_number, ga.is_dc, gc.country, gc.city,
         t.cats AS ti_cats, t.feeds AS ti_feeds, d.domains_joined, d.tld
  FROM cls c
  LEFT JOIN {geo_asn} ga ON c.lb_class='pub' AND NOT contains(c.ip,':')
       AND {ipint} BETWEEN ga.net_start AND ga.net_end
  LEFT JOIN {geo_city} gc ON c.lb_class='pub' AND NOT contains(c.ip,':')
       AND {ipint} BETWEEN gc.net_start AND gc.net_end
  LEFT JOIN ti_by_ip t ON c.lb_class='pub' AND c.ip = t.ip
  LEFT JOIN {dns} d ON c.lb_class='pub' AND c.ip = d.ip
),
merged AS (
  SELECT *,
    CASE WHEN COALESCE(is_dc, FALSE)
         THEN list_sort(list_distinct(list_append(COALESCE(ti_cats, []::VARCHAR[]), 'dc')))
         ELSE ti_cats END AS mcats,
    CASE WHEN COALESCE(is_dc, FALSE)
         THEN list_sort(list_distinct(list_append(COALESCE(ti_feeds, []::VARCHAR[]), 'internal datacenter list')))
         ELSE ti_feeds END AS mfeeds
  FROM joined
),
enr AS (
  SELECT conv_id, turn_idx, role, tool, ts, text, lb_class,
    CASE WHEN lb_class='noip' THEN 'NoIP' ELSE ip END AS lb_IP,
    CASE lb_class WHEN 'noip' THEN 'NoIP' WHEN 'pvt' THEN 'PVT'
         ELSE COALESCE(asn_org,'') END AS lb_ASN,
    CASE lb_class WHEN 'noip' THEN 'NoIP' WHEN 'pvt' THEN 'PVT'
         ELSE COALESCE(CAST(asn_number AS VARCHAR),'') END AS lb_ASN_Number,
    CASE lb_class WHEN 'noip' THEN 'NoIP' WHEN 'pvt' THEN 'PVT'
         ELSE COALESCE(country,'') END AS lb_Country,
    CASE lb_class WHEN 'noip' THEN 'NoIP' WHEN 'pvt' THEN 'PVT'
         ELSE COALESCE(city,'') END AS lb_City,
    CASE lb_class WHEN 'noip' THEN 'NoIP' WHEN 'pvt' THEN 'PVT'
         WHEN 'pub' THEN CASE WHEN mfeeds IS NULL OR len(mfeeds)=0 THEN 'none'
              ELSE array_to_string(mcats,'|') END END AS lb_ThreatCategories,
    CASE lb_class WHEN 'noip' THEN 'NoIP' WHEN 'pvt' THEN 'PVT'
         WHEN 'pub' THEN CASE WHEN mfeeds IS NULL OR len(mfeeds)=0 THEN '0'
              ELSE CAST(len(mfeeds) AS VARCHAR) END END AS lb_ThreatFeedCount,
    CASE lb_class WHEN 'noip' THEN 'NoIP' WHEN 'pvt' THEN 'PVT'
         WHEN 'pub' THEN CASE WHEN mfeeds IS NULL OR len(mfeeds)=0 THEN 'none'
              ELSE array_to_string(mfeeds,'|') END END AS lb_ThreatFeeds,
    CASE lb_class WHEN 'noip' THEN 'NoIP' WHEN 'pvt' THEN 'PVT'
         ELSE COALESCE(domains_joined,'none') END AS lb_Domains,
    CASE lb_class WHEN 'noip' THEN 'NoIP' WHEN 'pvt' THEN 'PVT'
         ELSE COALESCE(tld,'none') END AS lb_TLD
  FROM merged
),
routed AS (
  SELECT *, CASE
      WHEN lb_class='pub' AND lb_ThreatFeeds <> 'none' THEN 'threat'
      WHEN lb_class='pvt' THEN 'internal'
      WHEN lb_class='noip' THEN 'noip'
      WHEN role='tool' OR tool<>'none' THEN 'tool_activity'
      ELSE 'general' END AS sink
  FROM enr
)"""
    )


# --- dedup/text fragments ---------------------------------------------------


def sql_md5_long(x: str) -> str:
    return f"(('0x' || substr(md5({x}),1,15))::BIGINT)"


def sql_tokens(x: str, distinct: bool = True) -> str:
    base = f"string_split_regex(lower(trim({x})), '\\s+')"
    return f"list_distinct({base})" if distinct else base


def minhash_select_terms(hv: str = "hv", k: int = 8) -> list[str]:
    return [
        f"min((({a}*({hv}%{MERSENNE_P})+{b}))%{MERSENNE_P}) AS mh{i}"
        for i, (a, b) in enumerate(minhash_params(k))
    ]


def lang_score_sql(text: str, words: list[str]) -> str:
    arr = "[" + ",".join(f"'{w}'" for w in words) + "]"
    return f"len(list_filter({sql_tokens(text, False)}, t -> list_contains({arr}, t)))"


def lang_id_sql(text: str) -> str:
    """Marker-vote language id — same tie-breaking as functions.textfns."""
    expr = "'und'"
    best = "0"
    for code, words in sorted(LANG_MARKERS.items()):
        s = lang_score_sql(text, words)
        expr = f"CASE WHEN {s} > {best} THEN '{code}' ELSE {expr} END"
        best = f"greatest({s}, {best})"
    return expr


STOPWORD_ARR = "[" + ",".join(f"'{w}'" for w in STOPWORDS) + "]"

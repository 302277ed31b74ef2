"""Materialize the committed deterministic fixtures:

* data/transcripts_sf{0.001,0.01,0.1}.parquet — seeded transcript tables
* data/lookups/*.parquet — the enrichment dimension tables, in the
  flattened form the DuckDB oracle SQL joins against.

Byte-stable: re-running produces identical files (pure function of the
seed; no RNG state, no timestamps).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.parquet as pq

from logboost_spark.fixtures import lookups as L
from logboost_spark.fixtures import transcripts as TR

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data")
LOOK = os.path.join(OUT, "lookups")
os.makedirs(LOOK, exist_ok=True)

for sf in TR.FIXTURE_SIZES:
    p = TR.materialize_fixture(sf)
    print("transcripts", sf, "->", p)


def write(name: str, cols: dict):
    table = pa.table(cols)
    pq.write_table(table, os.path.join(LOOK, f"{name}.parquet"))
    print("lookup", name, table.num_rows, "rows")


ga = L.geo_asn_rows()
write(
    "geo_asn",
    {
        "net_start": [r[0] for r in ga],
        "net_end": [r[1] for r in ga],
        "asn_org": [r[2] for r in ga],
        "asn_number": [r[3] for r in ga],
        "is_dc": [r[3] in set(L.DC_ASN_NUMBERS) for r in ga],
    },
)
gc = L.geo_city_rows()
write(
    "geo_city",
    {
        "net_start": [r[0] for r in gc],
        "net_end": [r[1] for r in gc],
        "country": [r[2] for r in gc],
        "city": [r[3] for r in gc],
    },
)
# The merged disjoint ASN+City interval table (the ONE range-join side the
# engine uses, enrich.py J1/J2) is itself an offline deterministic build:
# at real GeoLite2 size (~3M intervals) this runs here once, never in the
# per-session driver.
from logboost_spark.operators.geo_join import (  # noqa: E402
    flatten_intervals,
    merge_disjoint_interval_tables,
)

gm = merge_disjoint_interval_tables(
    flatten_intervals(ga), flatten_intervals(gc), n_a=2, n_b=2
)
write(
    "geo_merged",
    {
        "net_start": [r[0] for r in gm],
        "net_end": [r[1] for r in gm],
        "asn_org": [r[2] for r in gm],
        "asn_number": [r[3] for r in gm],
        "country": [r[4] for r in gm],
        "city": [r[5] for r in gm],
    },
)
ti = L.ti_rows()
write(
    "ti",
    {"ip": [r[0] for r in ti], "feed_name": [r[1] for r in ti], "category": [r[2] for r in ti]},
)
dp = L.dns_ptr_rows()
write(
    "dns_ptr",
    {
        "ip": [r[0] for r in dp],
        "domains": [r[1] for r in dp],
        "domains_joined": ["|".join(r[1]) for r in dp],
        "tld": [L.parse_psl_domain(r[1][0]) for r in dp],
    },
)
wd = L.whois_domain_rows()
write(
    "whois_domain",
    {
        "domain": [r[0] for r in wd],
        "created": [r[1] for r in wd],
        "updated": [r[2] for r in wd],
        "country": [r[3] for r in wd],
        "org": [r[4] for r in wd],
    },
)
wi = L.whois_ip_rows()
write(
    "whois_ip",
    {
        k: [r[i] for r in wi]
        for i, k in enumerate(
            ["ip", "cidr", "netname", "nettype", "org", "created", "updated", "country", "parent"]
        )
    },
)
# Array form — matches the engine's lookup schema (build_lookup_dfs);
# the DuckDB oracle pipe-joins with array_to_string in SQL.
idb = L.shodan_idb_rows()
write(
    "shodan_idb",
    {
        "ip": [r[0] for r in idb],
        "cpes": [list(r[1]) for r in idb],
        "hostnames": [list(r[2]) for r in idb],
        "ports": [[int(p) for p in r[3]] for r in idb],
        "tags": [list(r[4]) for r in idb],
        "vulns": [list(r[5]) for r in idb],
    },
)
write("dc_asn", {"asn_number": list(L.DC_ASN_NUMBERS)})
print("DONE")

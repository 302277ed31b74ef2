"""Seeded transcript-table generator (the pipeline's fact table).

Schema per BASELINE.json input_hint:
    conv_id string, turn_idx int, role string, text string, tool string,
    ts timestamp

``text`` embeds one log-shaped line per turn, drawn from the reference's
12 documented formats (FIXTURES.md §3) with a deterministic IP class mix:
~70% public IPv4, ~10% IPv6-only, ~10% private-only, ~10% no IP.
Conversation sizes are heavy-tailed (≈20% of turns land in 17 hot
conversations) so skew handling is actually exercised.

Two implementations of the SAME function id → row:

* :func:`gen_pandas` — pure Python/pandas, used as the test oracle and to
  materialize small committed fixtures.
* :func:`gen_spark` — pure Spark column expressions over ``spark.range``
  (zero Python in the loop), used to generate bench-scale inputs fully in
  parallel. ``tests/test_fixtures.py`` asserts both emit identical rows.

Everything derives from the row id via fixed integer arithmetic — no RNG
state, so any slice is reproducible independently.
"""

from __future__ import annotations

import datetime as _dt
import os

from .lookups import PRIVATE_V4_POOL, PUBLIC_V4_POOL, PUBLIC_V6_POOL

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["bash", "browser", "search", "none"]

BASE_EPOCH = int(_dt.datetime(2023, 6, 1, tzinfo=_dt.timezone.utc).timestamp())

# Templates: printf-style, args always (ip: %s, k: %d) in this order.
# One per reference parser format (FIXTURES.md §3). No extra IPv4
# literals anywhere (they would hijack the first-IP extraction).
TEMPLATES = [
    # 0 CLF common (parsers/parse_clf.go:16)
    '%s - frank [10/Oct/2023:13:55:36 -0700] "GET /page%d HTTP/1.0" 200 2326',
    # 1 CLF combined (parsers/parse_clf.go:17)
    '%s - alice [10/Oct/2023:13:55:36 -0700] "POST /item%d HTTP/1.1" 503 144 "http://ref.example.com/start" "Mozilla/5.0"',
    # 2 syslog generic (parsers/parse_syslog.go:18)
    "Jun 27 18:19:37 ip-gw-7 systemd[1]: Started session for %s unit %d",
    # 3 syslog RFC3164 (parsers/parse_syslog.go:16)
    "<6>Sep 14 14:12:51 %s su: 'su root' failed on tty%d",
    # 4 syslog RFC5424 (parsers/parse_syslog.go:17)
    "<34>1 2023-10-11T22:14:15.003Z %s appproc - ID%d - event recorded",
    # 5 CEF (parsers/parse_cef.go:22-24)
    "CEF:0|SecVendor|ThreatMgr|1.0|100|detected|5|src=%s dhost=db-core act=blocked cnt=%d",
    # 6 KV (parsers/parse_kv.go:18, README.md:337)
    'timestamp="Jun 12 2023 00:00:00.000", source=srv%d, ip=%s, action=allow',
    # 7 JSON line (parsers/parse_json.go)
    '{"type":"accesslog","remoteIP":"%s","elapsed":%d,"nested":{"k":"v"},"ok":true}',
    # 8 multi-line JSON / CloudTrail (parsers/parse_json_multi.go:23)
    '{"Records":[{"eventName":"Login","sourceIPAddress":"%s","requestID":%d}]}',
    # 9 IIS/W3C (parsers/parse_iis_w3c.go:15-54)
    "#Fields: date time c-ip cs-method sc-status\n2023-06-01 00:00:00 %s M%d 200",
    # 10 Azure-audit JSON blob, ClientIP probed by regex (vars/vars.go:14)
    '{"CreationTime":"2023-06-01T00:00:00","ClientIP":"%s","Operation":"Op%d","Workload":"Exchange"}',
    # 11 raw (parsers/parse_raw.go)
    "free text noise %d with address %s embedded in prose",
]

# templates where k precedes ip in the arg list (printf arg order differs)
_K_FIRST = {6, 11}

N_FORMATS = len(TEMPLATES)


def _ip_for(i: int) -> str:
    """IP class mix: c∈0-6 public v4, 7 → IPv6, 8 → private v4, 9 → none."""
    c = (i * 104729) % 10
    j = (i * 31337) % 1024
    if c <= 6:
        return PUBLIC_V4_POOL[j]
    if c == 7:
        return PUBLIC_V6_POOL[j % 256]
    if c == 8:
        return PRIVATE_V4_POOL[j % 256]
    return "nohost"


def _conv_raw(i: int) -> int:
    h = (i * 2654435761) % 1000
    return (i % 17) if h < 200 else 1_000_000 + i // 40


def row_for(i: int) -> dict:
    """The single source of truth: row id → row (Python form)."""
    fmt = (i * 7919) % N_FORMATS
    ip = _ip_for(i)
    k = i % 1000
    args = (k, ip) if fmt in _K_FIRST else (ip, k)
    return {
        "conv_raw": _conv_raw(i),
        "conv_id": f"conv-{_conv_raw(i):08d}",
        "role": ROLES[(i * 13) % 4],
        "text": TEMPLATES[fmt] % args,
        "tool": TOOLS[(i * 29) % 4],
        "ts": _dt.datetime.utcfromtimestamp(BASE_EPOCH + i),
        "_id": i,
    }


def gen_pandas(n: int):
    """Oracle generator: n rows → pandas DataFrame (small scales only)."""
    import pandas as pd

    rows = [row_for(i) for i in range(n)]
    df = pd.DataFrame(rows)
    df["turn_idx"] = df.groupby("conv_raw").cumcount().astype("int32")
    return df[["conv_id", "turn_idx", "role", "text", "tool", "ts"]].copy()


def gen_spark(spark, n: int):
    """Same function, as pure column expressions over spark.range(n).

    Scales linearly with executors; the only shuffle is the dense
    per-conversation turn_idx (row_number window), which a real ingest
    would get for free from the source ordering.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    pub = F.array(*[F.lit(s) for s in PUBLIC_V4_POOL])
    pv6 = F.array(*[F.lit(s) for s in PUBLIC_V6_POOL])
    prv = F.array(*[F.lit(s) for s in PRIVATE_V4_POOL])
    roles = F.array(*[F.lit(s) for s in ROLES])
    tools = F.array(*[F.lit(s) for s in TOOLS])

    i = F.col("id")
    c = (i * 104729) % 10
    j = (i * 31337) % 1024
    ip = (
        F.when(c <= 6, F.element_at(pub, (j + 1).cast("int")))
        .when(c == 7, F.element_at(pv6, ((j % 256) + 1).cast("int")))
        .when(c == 8, F.element_at(prv, ((j % 256) + 1).cast("int")))
        .otherwise(F.lit("nohost"))
    )
    k = (i % 1000).cast("int")
    fmt = (i * 7919) % N_FORMATS
    texts = [
        F.format_string(t, k, ip) if n_t in _K_FIRST else F.format_string(t, ip, k)
        for n_t, t in enumerate(TEMPLATES)
    ]
    h = (i * 2654435761) % 1000
    conv_raw = F.when(h < 200, i % 17).otherwise(F.lit(1_000_000) + F.floor(i / 40))

    df = (
        spark.range(n)
        .select(
            i.alias("_id"),
            conv_raw.alias("conv_raw"),
            F.format_string("conv-%08d", conv_raw).alias("conv_id"),
            F.element_at(roles, ((i * 13) % 4 + 1).cast("int")).alias("role"),
            F.element_at(F.array(*texts), (fmt + 1).cast("int")).alias("text"),
            F.element_at(tools, ((i * 29) % 4 + 1).cast("int")).alias("tool"),
            F.timestamp_seconds(F.lit(BASE_EPOCH) + i).alias("ts"),
        )
    )
    w = Window.partitionBy("conv_raw").orderBy("_id")
    return df.withColumn("turn_idx", (F.row_number().over(w) - 1).cast("int")).select(
        "conv_id", "turn_idx", "role", "text", "tool", "ts"
    )


# ---------------------------------------------------------------------------
# Materialized fixture files (committed; read by __spark_entry__ oracles)
# ---------------------------------------------------------------------------

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "data")

#: rows per driver scale factor — sized so sf0.01 exercises every format ×
#: ip-class × lookup-hit combination while staying small on disk.
FIXTURE_SIZES = {"sf0.001": 2_000, "sf0.01": 50_000, "sf0.1": 200_000}


def fixture_path(sf: str) -> str:
    return os.path.join(FIXTURE_DIR, f"transcripts_{sf}.parquet")


def sf_from_dir(sf_dir: str) -> str:
    base = os.path.basename(os.path.normpath(sf_dir))
    return base if base in FIXTURE_SIZES else "sf0.01"


def materialize_fixture(sf: str) -> str:
    """Write (once) the committed parquet fixture for a scale factor."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    path = fixture_path(sf)
    if os.path.exists(path):
        return path
    os.makedirs(FIXTURE_DIR, exist_ok=True)
    pdf = gen_pandas(FIXTURE_SIZES[sf])
    table = pa.Table.from_pandas(pdf, preserve_index=False).cast(
        pa.schema(
            [
                ("conv_id", pa.string()),
                ("turn_idx", pa.int32()),
                ("role", pa.string()),
                ("text", pa.string()),
                ("tool", pa.string()),
                ("ts", pa.timestamp("us")),
            ]
        )
    )
    pq.write_table(table, path)
    return path

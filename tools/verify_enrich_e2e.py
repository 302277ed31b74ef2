"""End-to-end verification drive: public API of logboost_spark in a fresh
process — generate transcripts, enrich via broadcast joins, compare every
cell against the pure-Python oracle; then probe edge inputs."""
import sys

sys.path.insert(0, "/root/repo")

from logboost_spark.session import get_spark
from logboost_spark.fixtures import transcripts as TR
from logboost_spark.fixtures.lookups import build_lookup_dfs
from logboost_spark.operators.enrich import enrich
from logboost_spark import oracle as O
import pandas as pd
from pyspark.sql import functions as F

spark = get_spark(cores=8)

# --- main drive: 4000 generated turns, full 28-column enrichment ---------
N = 4000
pdf = TR.gen_pandas(N)
sdf = spark.createDataFrame(pdf)
lk = build_lookup_dfs(spark)
eng = enrich(sdf, lk).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
base = pdf.sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)
ora = pd.DataFrame([O.enrich_text(t) for t in base["text"]])

bad = 0
for c in ora.columns:
    neq = eng[c].astype(str) != ora[c].astype(str)
    if neq.any():
        bad += int(neq.sum())
        print(f"MISMATCH col={c} n={int(neq.sum())}")
print(f"MAIN: {N} rows x {len(ora.columns)} cols, mismatched cells = {bad}")
print("class dist:", eng["lb_class"].value_counts().to_dict())

# sample of enriched output for the report
sample = eng[eng.lb_class == "pub"][
    ["text", "lb_IP", "lb_ASN", "lb_Country", "lb_ThreatFeeds", "lb_Domains", "lb_TLD"]
].head(3)
for _, r in sample.iterrows():
    print("SAMPLE:", r["text"][:60], "|", r["lb_IP"], "|", r["lb_ASN"], "|", r["lb_Country"], "|", r["lb_ThreatFeeds"], "|", r["lb_TLD"])

# --- probes: adversarial inputs through the same public surface -----------
probes = [
    ("", "empty string"),
    (None, "NULL text"),
    ("   \t  ", "whitespace only"),
    ("ip 8.8.8.8 " * 500, "5.5k-char line, 500 repeated IPs"),
    ("999.999.999.999 then fe80::zzz then 10.0.0.5", "garbage + malformed v6 + private"),
    ("0.0.0.0 and 255.255.255.255 only", "special privates only"),
    ("deadbeef:cafe:babe:face:feed:f00d:dead:beef", "valid-but-unknown v6"),
    ("«🦀» unicode 8.8.4.4 emoji", "unicode around IP"),
]
pdfp = pd.DataFrame({"conv_id": ["p"] * len(probes), "turn_idx": range(len(probes)),
                     "role": ["user"] * len(probes), "text": [p[0] for p in probes],
                     "tool": ["none"] * len(probes),
                     "ts": pd.Timestamp("2023-06-01")})
sp = spark.createDataFrame(pdfp)
ep = enrich(sp, lk).toPandas().sort_values("turn_idx").reset_index(drop=True)
pbad = 0
for i, (txt, label) in enumerate(probes):
    o = O.enrich_text(txt) if txt is not None else None
    got = (ep.loc[i, "lb_class"], ep.loc[i, "lb_IP"])
    if txt is None:
        ok = got[0] == "noip"
        want = ("noip", "NoIP")
    else:
        want = (o["lb_class"], o["lb_IP"])
        ok = got == want
    pbad += 0 if ok else 1
    print(f"PROBE {'OK ' if ok else 'BAD'} [{label}] -> class={got[0]} ip={got[1]} (oracle: {want})")
print(f"PROBES mismatched: {pbad}")
print("VERIFY_E2E_DONE", "PASS" if bad == 0 and pbad == 0 else "FAIL")

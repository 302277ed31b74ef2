# REPL scratch: engine enrich vs pure-Python oracle on generated transcripts
import importlib, sys
for m in list(sys.modules):
    if m.startswith("logboost_spark"):
        del sys.modules[m]
from logboost_spark.fixtures import transcripts as TR
from logboost_spark.fixtures.lookups import build_lookup_dfs
from logboost_spark.operators.enrich import enrich
from logboost_spark import oracle as O
import pandas as pd
from pyspark.sql import functions as F

N = 3000
pdf = TR.gen_pandas(N)
sdf = spark.createDataFrame(pdf)
lk = build_lookup_dfs(spark)
eng = enrich(sdf, lk).toPandas().sort_values(["conv_id", "turn_idx"]).reset_index(drop=True)

ora_rows = [O.enrich_text(t) for t in pdf.sort_values(["conv_id", "turn_idx"])["text"]]
ora = pd.DataFrame(ora_rows).reset_index(drop=True)

cols = [c for c in ora.columns]
mismatch_total = 0
for c in cols:
    neq = (eng[c].astype(str) != ora[c].astype(str))
    if neq.any():
        mismatch_total += int(neq.sum())
        print("COL MISMATCH", c, int(neq.sum()))
        idx = neq[neq].index[:5]
        base = pdf.sort_values(["conv_id","turn_idx"]).reset_index(drop=True)
        for i in idx:
            print("  text:", repr(base.loc[i, "text"])[:140])
            print("  engine:", repr(eng.loc[i, c]), " oracle:", repr(ora.loc[i, c]))
print("TOTAL MISMATCHED CELLS:", mismatch_total)
print("class dist:", eng["lb_class"].value_counts().to_dict())
print("ENRICH_SMOKE_DONE")

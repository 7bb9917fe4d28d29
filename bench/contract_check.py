"""Local replica of the driver's correctness gate: run each queries()
entry and its oracle_sql() via DuckDB at sf0.01; compare rows, schema
(column names), and a value hash after sorting columns by name and rows
by all columns.  NOTE: canon() hashes raw float64 bits with NO rounding —
float columns must be pre-rounded identically in BOTH the Spark query and
the oracle SQL, or the hash will spuriously mismatch."""
import sys, json, hashlib
sys.path.insert(0, '/root/repo')
import duckdb, pandas as pd, numpy as np

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return hashlib.sha256(pd.util.hash_pandas_object(df, index=False).values.tobytes()).hexdigest()

import os
import __spark_entry__ as e
from boltspark.engine.session import get_session
# default 32 to match the driver's local[32] — the round-3 red was a
# parallelism-sensitive fixture that only failed at the driver's width
spark = get_session("contract", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
spark.sparkContext.setLogLevel("ERROR")

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

qs = e.queries()
oracles = e.oracle_sql()
only = sys.argv[1:] or list(qs)
results = {}
for name in only:
    fn = qs[name]
    try:
        sdf = fn(spark, SF).toPandas()
        if name not in oracles:
            results[name] = {"spark_rows": len(sdf), "err": "no_oracle"}
            print(f"{name}: rows={len(sdf)} (no oracle)")
            continue
        odf = con.execute(oracles[name]).df()
        rows = len(sdf) == len(odf)
        schema = sorted(sdf.columns) == sorted(odf.columns)
        h = canon(sdf) == canon(odf) if rows and schema else False
        results[name] = {"rows_match": rows, "schema_match": schema, "hash_match": h,
                         "spark_rows": len(sdf), "oracle_rows": len(odf)}
        flag = "OK" if (rows and schema and h) else "MISMATCH"
        print(f"{name}: {flag} rows {len(sdf)}/{len(odf)} schema={schema} hash={h}")
        if not (rows and schema and h):
            print("  spark cols:", list(sdf.dtypes.items()))
            print("  oracle cols:", list(odf.dtypes.items()))
            print(sdf.head(3)); print(odf.head(3))
    except Exception as ex:
        results[name] = {"err": repr(ex)[:300]}
        print(f"{name}: ERROR {repr(ex)[:300]}")
spark.stop()
bad = [k for k,v in results.items() if not v.get("hash_match") and v.get("err") != "no_oracle"]
print("\nFAILING:", bad if bad else "none")

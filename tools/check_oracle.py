#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, compare to the Verify parquet dump
(columns sorted by name, exact value compare). Dev tool only — the shipped
Scala library does not depend on it."""
import sys, json, glob, os
import duckdb, pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"

con = duckdb.connect()
# bounded resources: at the sf1 tier some mirrors build multi-GB
# intermediates, and an unbounded duckdb (threads = all cores, memory =
# 80% RAM) intermittently dies with allocator/thread errors when run
# back-to-back with Spark JVMs; these caps make the gate deterministic
con.execute("SET threads TO 4")
con.execute("SET memory_limit = '48GB'")
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    # testdata tables are single files; generated tiers (GenSf) are
    # Spark-written parquet DIRECTORIES — glob their part files
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    # events.ts: testdata is TIMESTAMP(NANOS), which duckdb 1.0 reads as a
    # us-truncated TIMESTAMP; GenSf tiers carry raw int64 nanos (Spark 4
    # can't write NANOS). make_timestamp(ns // 1000) is the identical
    # truncation, so both shapes present the same view type and values.
    if name == "events":
        t = con.execute(f"SELECT typeof(ts) FROM '{src}' LIMIT 1").fetchone()[0]
        if t == "BIGINT":
            con.execute(f"CREATE VIEW events AS SELECT * REPLACE "
                        f"(make_timestamp(ts // 1000) AS ts) FROM '{src}'")
            continue
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = bad = 0
for name, sql in sorted(oracle.items()):
    d = f"{out_dir}/{name}"
    if not os.path.isdir(d):
        print(f"FAIL {name}: no spark output"); bad += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{d}/*.parquet"))])
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); bad += 1; continue
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    k = duck_df[sorted(duck_df.columns)].reset_index(drop=True)
    if list(s.columns) != list(k.columns):
        print(f"FAIL {name}: schema {list(s.columns)} vs {list(k.columns)}"); bad += 1; continue
    if len(s) != len(k):
        print(f"FAIL {name}: rows {len(s)} vs {len(k)}"); bad += 1; continue
    # exact string compare per cell (mirrors hash compare)
    def canon(df):
        return df.astype(str)
    cs, ck = canon(s), canon(k)
    neq = (cs != ck).any(axis=1)
    if neq.any():
        i = neq.idxmax()
        print(f"FAIL {name}: first diff row {i}:\n  spark {cs.iloc[i].to_dict()}\n  duck  {ck.iloc[i].to_dict()}")
        bad += 1; continue
    print(f"ok   {name} ({len(s)} rows)"); ok += 1
print(f"\n{ok} ok / {bad} fail / {len(oracle)} total")
sys.exit(1 if bad else 0)

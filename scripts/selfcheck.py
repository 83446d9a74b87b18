#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: compare graft.Verify's
parquet dumps against the oracle SQL run in DuckDB over the same tables.

Usage: python3 scripts/selfcheck.py [verify_outdir] [sf_dir]
(run `sbt "runMain graft.Verify <sf_dir> <verify_outdir>"` first)

NOTE: driver-side tooling only (duckdb/pandas are not dependencies of the
engine itself) — this is a development aid mirroring CORRECTNESS_r{N}.json.
"""
import duckdb, pandas as pd, numpy as np, sys, json, os

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/graft_verify"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad = [], []
for name in sorted(oracle):
    sql = oracle[name]
    problems = []
    try:
        spark_df = con.execute(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
    except Exception as e:
        bad.append((name, [f"spark result unreadable: {e}"]))
        continue
    try:
        duck_df = con.execute(sql).df()
    except Exception as e:
        bad.append((name, [f"oracle SQL failed: {e}"]))
        continue
    sd = spark_df[sorted(spark_df.columns)]
    dd = duck_df[sorted(duck_df.columns)]
    if list(sd.columns) != list(dd.columns):
        problems.append(f"cols: spark={list(sd.columns)} duck={list(dd.columns)}")
    elif len(sd) != len(dd):
        problems.append(f"rows: spark={len(sd)} duck={len(dd)}")
    else:
        s2 = sd.sort_values(by=list(sd.columns)).reset_index(drop=True)
        d2 = dd.sort_values(by=list(dd.columns)).reset_index(drop=True)
        if [str(t) for t in s2.dtypes] != [str(t) for t in d2.dtypes]:
            problems.append(f"dtypes(warn): spark={list(map(str, s2.dtypes))} duck={list(map(str, d2.dtypes))}")
        for c in s2.columns:
            a, b = s2[c], d2[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    eq = (a.astype(float).fillna(np.inf) == b.astype(float).fillna(np.inf))
                else:
                    eq = (a.fillna("\0N") == b.fillna("\0N")) if a.dtype == object else (a == b) | (a.isna() & b.isna())
                n_bad = int((~eq).sum())
                if n_bad:
                    i = (~eq).idxmax()
                    problems.append(f"values[{c}]: {n_bad} mismatches, first at row {i}: spark={a[i]!r} duck={b[i]!r}")
            except Exception as e:
                problems.append(f"compare[{c}] error: {e}")
    hard = [p for p in problems if not p.startswith("dtypes(warn)")]
    if hard:
        bad.append((name, problems))
    else:
        ok.append((name, problems))

for name, p in ok:
    print(f"OK   {name}" + (f"  [{p[0]}]" if p else ""))
for name, p in bad:
    print(f"FAIL {name}")
    for line in p:
        print(f"     {line}")
print(f"\n{len(ok)} ok / {len(bad)} fail / {len(oracle)} total")
sys.exit(1 if bad else 0)

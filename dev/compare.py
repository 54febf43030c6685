#!/usr/bin/env python3
"""Local stand-in for the driver's t2 gate: run after `graft.Verify`
dumps query results, compare each result parquet against its DuckDB
oracle (schema via DESCRIBE, then EXCEPT ALL in both directions,
columns sorted by name).

Iterates the DECLARED keys of oracle_sql.json (not just existing output
dirs), so a query that errored inside Verify shows up as FAIL instead of
silently vanishing. Also reports Verify's _failures.json marker.

Usage: python3 dev/compare.py [sf_dir] [verify_out]
"""
import json, sys, glob, os
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    # Harness tables are single files; DataScale output (Spark writes)
    # are directories of part files.
    path = f"{sf}/{t}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
try:
    markers = json.load(open(f"{out}/_failures.json"))
except Exception:
    markers = {}

out_dirs = {os.path.basename(d.rstrip("/")) for d in glob.glob(f"{out}/*/")}
fails, passes, noracle = [], [], []

for name, msg in markers.items():
    fails.append((name, f"verify-time failure: {msg}"))

for name in sorted(set(oracle) | out_dirs):
    if name in markers:
        continue
    if name not in out_dirs:
        fails.append((name, "declared in oracle_sql.json but no output dir"))
        continue
    qdir = f"{out}/{name}"
    if not glob.glob(f"{qdir}/*.parquet"):
        fails.append((name, "no parquet output"))
        continue
    spark_rel = f"read_parquet('{qdir}/*.parquet')"
    n_spark = con.sql(f"SELECT count(*) FROM {spark_rel}").fetchone()[0]
    if name not in oracle:
        noracle.append((name, n_spark))
        continue
    try:
        osql = oracle[name]
        s_schema = sorted((r[0], r[1]) for r in con.sql(
            f"DESCRIBE SELECT * FROM {spark_rel}").fetchall())
        o_schema = sorted((r[0], r[1]) for r in con.sql(
            f"DESCRIBE SELECT * FROM ({osql})").fetchall())
        if s_schema != o_schema:
            fails.append((name, f"schema spark={s_schema} oracle={o_schema}"))
            continue
        cols = [c for c, _ in s_schema]
        sel = ", ".join(f'"{c}"' for c in cols)
        n_oracle = con.sql(f"SELECT count(*) FROM ({osql})").fetchone()[0]
        d1 = con.sql(f"(SELECT {sel} FROM {spark_rel}) EXCEPT ALL "
                     f"(SELECT {sel} FROM ({osql}))").fetchmany(3)
        d2 = con.sql(f"(SELECT {sel} FROM ({osql})) EXCEPT ALL "
                     f"(SELECT {sel} FROM {spark_rel})").fetchmany(3)
        if d1 or d2 or n_spark != n_oracle:
            fails.append((name, f"rows spark={n_spark} oracle={n_oracle} "
                                f"spark_only={d1} oracle_only={d2}"))
        else:
            passes.append((name, n_spark))
    except Exception as e:
        fails.append((name, f"oracle error: {e}"))

for n, c in passes:
    print(f"PASS  {n}  ({c} rows)")
for n, c in noracle:
    print(f"NO-ORACLE  {n}  ({c} rows)")
for n, msg in fails:
    print(f"FAIL  {n}  {msg[:400]}")
print(f"\n{len(passes)} pass, {len(noracle)} rows-only, {len(fails)} fail")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Oracle-cost ledger: time every declared DuckDB oracle at sf0.01 and
gate the totals — the bench-watchdog discipline applied to the driver's
verify phase (t2). The q146 lesson was a single unmeasured query
DNF-ing the bench; an unmeasured EXPENSIVE ORACLE can DNF the driver's
verify the same way, and nothing else tracks that cost.

Reads oracle_sql.json from a Verify output dir (the SQL is the ledger
subject; the Spark parquet next to it is not needed), times each oracle
with a per-query budget, writes dev/ORACLE_BUDGET.json sorted
most-expensive-first, and exits 1 if any oracle exceeds PER_QUERY_SEC
or the suite exceeds TOTAL_SEC.

Usage: python3 dev/oracle_budget.py [sf_dir] [verify_out]
"""
import json, sys, os, time
import duckdb

PER_QUERY_SEC = 75.0   # the 512-merge BPE oracles are ~55s each (measured,
                       # accepted r11); anything past 75s needs restructuring
TOTAL_SEC = 900.0      # the whole-suite replay must stay under 15 min

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split():
    path = f"{sf}/{t}.parquet"
    if os.path.isdir(path):
        path = f"{path}/*.parquet"
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
times, errors = {}, {}
for name in sorted(oracle):
    t0 = time.time()
    try:
        con.sql(f"SELECT count(*) FROM ({oracle[name]})").fetchone()
        times[name] = round(time.time() - t0, 3)
    except Exception as e:
        errors[name] = str(e)[:200]

total = sum(times.values())
ledger = {"total_sec": round(total, 1),
          "per_query_budget_sec": PER_QUERY_SEC,
          "total_budget_sec": TOTAL_SEC,
          "n": len(times),
          "queries": dict(sorted(times.items(), key=lambda kv: -kv[1])),
          "errors": errors}
json.dump(ledger, open("dev/ORACLE_BUDGET.json", "w"), indent=1)

over = [(n, t) for n, t in times.items() if t > PER_QUERY_SEC]
for n, t in sorted(times.items(), key=lambda kv: -kv[1])[:15]:
    print(f"{t:8.2f}s  {n}")
print(f"\ntotal {total:.1f}s over {len(times)} oracles "
      f"(budget: {PER_QUERY_SEC}s/query, {TOTAL_SEC}s total)")
for n, t in over:
    print(f"OVER-BUDGET  {n}: {t:.1f}s > {PER_QUERY_SEC}s")
for n, e in errors.items():
    print(f"ERROR  {n}: {e}")
if total > TOTAL_SEC:
    print(f"FAIL: total {total:.1f}s > {TOTAL_SEC}s")
sys.exit(1 if over or errors or total > TOTAL_SEC else 0)

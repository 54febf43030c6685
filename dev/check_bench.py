#!/usr/bin/env python3
"""Perf-regression gate: diff a full-bench JSON against the committed
per-query baseline (dev/PERF_BASELINE.json).

The r11 lesson: a monotone in-suite cost creep on untouched queries was
visible across four committed full runs but nothing flagged it — this
script is the PlanSpec discipline applied to time. Run it after every
full bench; update the baseline deliberately (--update), never silently.

Exit 1 on:
  - any shared query slower than RATIO x baseline AND ABS s absolute
    slack (both gates: sub-100ms queries jitter past any pure ratio);
  - shared-window total (queries present in BOTH files) > TOTAL_RATIO x;
  - COVERAGE: the run declares a query the baseline lacks (the r13
    verdict's silent hole — q203/q204 passed CORRECTNESS but their
    sf0.1 regressions were invisible). A query being NEW is a failure,
    not a notice: add its row with --update, or pass --allow-new while
    iterating mid-wave. SPARK_GRAFT_ONLY subset runs are auto-exempt
    (a subset can't witness baseline coverage either way, and `gone`
    names are expected there).

A run with run_quality > 1.5 is machine-contention-suspect: findings
are reported but the exit code is forced 0 (re-run instead of chasing
phantoms). Coverage failures are NEVER noise-excused.

Host calibration: Bench emits `calib_sec` (fixed-seed CPU-bound kernel
timed at run start). When both the run and the baseline carry it, the
gate also prints the host-normalized shared-window ratio
(raw_ratio / (calib_run / calib_base)) — r13's sf10 comparisons needed
narrative ("this box is 1.5-2x slower") to interpret; the scalar makes
it arithmetic. Thresholds still apply to the RAW ratio: normalization
is for interpretation, not for excusing a slow run on a fast box.

Usage: python3 dev/check_bench.py BENCH.json [--baseline F] [--update]
       [--sf10] [--allow-new]

--sf10: gate a 100x-scale run against dev/PERF_BASELINE_sf10.json.
The sf10 gate exists to catch SCALE-SHAPE regressions (a row going
super-linear shows as 5-20x, like q69's pre-auto-k 178 s), not 30%%
drift: cross-round sf10 absolutes are host-confounded (r13 measured
the untouched q40 float kernel at 1.5-2x r12's time on that round's
box), so thresholds are 2.5x ratio / 5 s abs / 1.5x total. The
noisy-run escape is also disabled in this mode: run_quality saturates
at ~1.6 for a 170-query sf10 suite even on a verified-idle box
(inter-query teardown/GC gaps scale with data), so rq > 1.5 is the
EXPECTED value there, not a contention marker.
"""
import json, sys, os

RATIO, ABS, TOTAL_RATIO = 1.5, 0.15, 1.10

args = [a for a in sys.argv[1:] if not a.startswith("--")]
bench_path = args[0]
base_path = "dev/PERF_BASELINE.json"
sf10 = "--sf10" in sys.argv
if sf10:
    base_path = "dev/PERF_BASELINE_sf10.json"
    RATIO, ABS, TOTAL_RATIO = 2.5, 5.0, 1.50
if "--baseline" in sys.argv:
    base_path = sys.argv[sys.argv.index("--baseline") + 1]
update = "--update" in sys.argv
allow_new = "--allow-new" in sys.argv

bench = json.load(open(bench_path))
queries = {k: v for k, v in bench["queries"].items() if v is not None}
quality = bench.get("run_quality", 0.0)
calib = bench.get("calib_sec")

if update:
    payload = {"queries": queries, "run_quality": quality,
               "source": os.path.basename(bench_path)}
    if calib is not None:
        payload["calib_sec"] = calib
    json.dump(payload, open(base_path, "w"), indent=1, sort_keys=True)
    print(f"baseline updated from {bench_path} "
          f"({len(queries)} queries, run_quality {quality:.2f}"
          + (f", calib {calib:.2f}s" if calib is not None else "") + ")")
    sys.exit(0)

base_doc = json.load(open(base_path))
base = base_doc["queries"]
base_calib = base_doc.get("calib_sec")
shared = sorted(set(base) & set(queries))
new = sorted(set(queries) - set(base))
gone = sorted(set(base) - set(queries))
# A subset run (SPARK_GRAFT_ONLY) can't witness coverage: most baseline
# keys read as `gone`. Bench emits an explicit "subset" marker (and
# "n_errors"); key the exemption on it. The structural fallback (far
# fewer run queries than baseline keys) only applies to pre-marker
# JSONs, and never to a run whose queries were nulled by errors or
# timeouts — a watchdog-gutted FULL run must not silently slip the
# coverage gate.
if "subset" in bench:
    subset_run = bool(bench["subset"])
else:
    nulled = sum(1 for v in bench["queries"].values() if v is None)
    subset_run = nulled == 0 and len(queries) < len(base) * 0.9

slow = []
for q in shared:
    b, t = base[q], queries[q]
    if t > b * RATIO and t - b > ABS:
        slow.append((q, b, t))
tot_b = sum(base[q] for q in shared)
tot_t = sum(queries[q] for q in shared)

for q, b, t in sorted(slow, key=lambda x: x[1] - x[2]):
    print(f"SLOW  {q}: {b:.2f}s -> {t:.2f}s ({t/b:.2f}x)")
for q in new:
    tag = "NEW " if (allow_new or subset_run) else "MISS"
    print(f"{tag}  {q}: {queries[q]:.2f}s (not in baseline)")
for q in gone:
    print(f"GONE  {q}: in baseline, absent from this run"
          + (" [subset run]" if subset_run else ""))

ratio = tot_t / tot_b if tot_b else 0.0
norm = ""
if calib and base_calib:
    host = calib / base_calib
    norm = (f", host {host:.3f}x (calib {base_calib:.2f}s -> {calib:.2f}s)"
            f", host-normalized {ratio / host:.3f}x")
print(f"\nshared window: {len(shared)} queries, "
      f"baseline {tot_b:.1f}s -> this run {tot_t:.1f}s "
      f"({ratio:.3f}x), run_quality {quality:.2f}{norm}")

coverage_fail = bool(new) and not allow_new and not subset_run
if coverage_fail:
    print(f"FAIL: baseline lacks {len(new)} declared "
          f"quer{'y' if len(new) == 1 else 'ies'} — regressions there are "
          f"invisible; add rows with --update or pass --allow-new")
perf_fail = bool(slow) or tot_t > tot_b * TOTAL_RATIO
if perf_fail and quality > 1.5 and not sf10:
    print("NOISY RUN (run_quality > 1.5): findings reported, exit forced 0 "
          "— re-run on a quiet machine before acting on them")
    perf_fail = False
elif tot_t > tot_b * TOTAL_RATIO:
    print(f"FAIL: total creep {tot_t/tot_b:.3f}x > {TOTAL_RATIO}x")
sys.exit(1 if (perf_fail or coverage_fail) else 0)

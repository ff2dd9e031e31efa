#!/usr/bin/env python3
"""Full-surface external baseline (r8 verdict item 5): time EVERY oracle
SQL statement in DuckDB at a given scale factor, so bench-vs-baseline is
demonstrable for the whole oracle-backed inventory, not just the core 18
of BASELINE.md.

Usage:
  python3 tools/baseline_full.py <verify_out_dir> [sf_dir] [bench_json]

- <verify_out_dir>: a graft.Verify output dir (its oracle_sql.json is the
  query list — the same statements the correctness gate runs).
- [sf_dir]: parquet table root (default /root/testdata/sf0.1).
- [bench_json]: a BENCH_FULL_r*.json to compute per-query Spark/DuckDB
  ratios against (optional).

Timing matches BASELINE.md's protocol: best of 2 runs (first warms the
page cache), wall-clock around full materialization (fetchall). Emits
BASELINE_FULL.json (machine) and a markdown table on stdout (paste into
BASELINE_FULL.md). Driver-side python deps only (duckdb) — not used by
the Scala build.
"""
import duckdb, json, sys, time

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/v1'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.1'
bench_path = sys.argv[3] if len(sys.argv) > 3 else None

con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))

times, rows = {}, {}
for name, sql in sorted(oracle.items()):
    best = None
    for _ in range(2):
        t0 = time.perf_counter()
        r = con.sql(sql).fetchall()
        dt = time.perf_counter() - t0
        best = dt if best is None else min(best, dt)
    times[name] = best
    rows[name] = len(r)

total = sum(times.values())
result = {'metric': 'oracle_total', 'value': total, 'unit': 'sec',
          'sf': sf, 'engine': f'duckdb {duckdb.__version__}',
          'protocol': 'best-of-2, fetchall materialization',
          'queries': times, 'rows': rows}
with open('BASELINE_FULL.json', 'w') as f:
    json.dump(result, f, indent=1, sort_keys=True)

bench = None
if bench_path:
    bench = json.load(open(bench_path))['queries']

print(f"| query | duckdb s | spark s | ratio | rows |")
print(f"| --- | --- | --- | --- | --- |")
flagged = []
for name in sorted(times):
    d = times[name]
    if bench and name in bench:
        s = bench[name]
        ratio = s / d if d > 0 else float('inf')
        if ratio > 2.0:
            flagged.append((name, d, s, ratio))
        print(f"| {name} | {d:.3f} | {s:.3f} | {ratio:.2f}x | {rows[name]} |")
    else:
        print(f"| {name} | {d:.3f} | — | — | {rows[name]} |")
if bench:
    covered = [n for n in times if n in bench]
    st = sum(bench[n] for n in covered)
    dt = sum(times[n] for n in covered)
    print(f"\nTOTAL over {len(covered)} oracle queries: "
          f"duckdb {dt:.2f} s, spark {st:.2f} s, ratio {st/dt:.2f}x")
    print(f"queries over 2x their own oracle time: {len(flagged)}")
    for name, d, s, r in sorted(flagged, key=lambda x: -x[3]):
        print(f"  {name}: {d:.3f} s vs {s:.3f} s = {r:.2f}x")

#!/usr/bin/env python3
"""Regenerate BASELINE_FULL.md's per-query table from the committed
anchors + a bench record, WITHOUT re-running the DuckDB sweep (the
committed BASELINE_FULL.json is the min-merged anchor record; re-running
baseline_full.py to get a table would print a single fresh window
instead).

Usage: tools/baseline_table.py [BASELINE_FULL.json] [BENCH_FULL.json]

Prints the markdown table (query | duckdb s | spark s | ratio | rows) to
stdout, plus summary counts used by the md prose. Driver-side tooling
only (python3 stdlib); not part of the library.
"""
import json
import sys

base = json.load(open(sys.argv[1] if len(sys.argv) > 1
                      else 'BASELINE_FULL.json'))
bench = json.load(open(sys.argv[2] if len(sys.argv) > 2
                       else 'BENCH_FULL_r17.json'))
bq = bench['queries']
anchors = base['queries']
rows = base.get('rows', {})

print('| query | duckdb s | spark s | ratio | rows |')
print('| --- | --- | --- | --- | --- |')
total_d = total_s = 0.0
n_le = n_gt2 = n_gt2_floor = 0
for q in sorted(anchors):
    d = anchors[q]
    s = bq.get(q)
    total_d += d
    r = rows.get(q, '')
    if s is None:
        print(f'| {q} | {d:.3f} | — | — | {r} |')
        continue
    total_s += s
    ratio = s / d
    if s <= d:
        n_le += 1
    if ratio > 2:
        n_gt2 += 1
        if s < 0.8:
            n_gt2_floor += 1
    print(f'| {q} | {d:.3f} | {s:.3f} | {ratio:.2f}x | {r} |')
print()
print(f'SUMMARY anchors={len(anchors)} duckdb_total={total_d:.2f} '
      f'spark_total_same_set={total_s:.2f} '
      f'ratio={total_s / total_d:.3f} spark_le_duckdb={n_le} '
      f'gt2x={n_gt2} gt2x_under_0.8s={n_gt2_floor}')
nq = [q for q in bq if q not in anchors]
print(f'no-oracle benched: {len(nq)}; full bench total '
      f'{sum(bq.values()):.2f} over {len(bq)}')
weak = [(q, bq[q], bq[q] / anchors[q]) for q in anchors
        if q in bq and bq[q] / anchors[q] > 2 and bq[q] >= 0.75]
print('weak (>2x own anchor AND >=0.75s):',
      [(q, round(t, 2), round(r, 1)) for q, t, r in sorted(weak)])

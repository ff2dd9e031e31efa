#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (SURVEY.md §5.1).

Usage: python3 tools/diff_local.py [verify_out_dir] [sf_dir]

Runs each oracle_sql.json statement in DuckDB over the same parquet tables
Verify read, and compares against the per-query parquet Verify wrote:
column-name sets, row counts, exact value multiset (EXCEPT ALL both ways),
and schema types (warn only). Since every query ends in a total ORDER BY,
multiset equality + identical ORDER BY implies identical row order.

Driver-side python deps only (duckdb/pyarrow) — not used by the Scala build.
"""
import duckdb, json, sys

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/v1'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        ours = con.sql(f"select * from '{out}/{name}/*.parquet'").arrow()
        theirs = con.sql(sql).arrow()
        cols = sorted(ours.column_names)
        if cols != sorted(theirs.column_names):
            fails.append((name, f"cols {cols} vs {sorted(theirs.column_names)}"))
            continue
        o, e = ours.select(cols), theirs.select(cols)
        if o.schema != e.schema:
            print(f"WARN {name}: schema {o.schema} vs {e.schema}".replace('\n', ' '))
        if o.num_rows != e.num_rows:
            fails.append((name, f"rows {o.num_rows} vs {e.num_rows}"))
            continue
        con.register('ours_t', o)
        con.register('orac_t', e)
        d1 = con.sql("select count(*) from (select * from ours_t except all "
                     "select * from orac_t)").fetchone()[0]
        d2 = con.sql("select count(*) from (select * from orac_t except all "
                     "select * from ours_t)").fetchone()[0]
        con.unregister('ours_t')
        con.unregister('orac_t')
        if d1 or d2:
            fails.append((name, f"value diff: {d1} ours-only / {d2} oracle-only rows"))
        else:
            print(f"OK   {name} ({o.num_rows} rows)")
    except Exception as ex:
        fails.append((name, f"ERROR {ex}"))
for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"{len(oracle) - len(fails)}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)

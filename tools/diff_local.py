#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate (SURVEY.md §5.1).

Usage: python3 tools/diff_local.py [verify_out_dir] [sf_dir]

Two layers per oracle query (r17 — the r16 lesson was that one layer is
not enough):

1. DuckDB EXCEPT ALL value-multiset diff (the original check). This
   implicit-casts across representations, so it proves VALUES only.
2. A pandas mirror of the driver's actual protocol: read the Spark
   parquet with pandas/pyarrow, the oracle side with .df(), sort columns
   by name, sort_values over all columns (the driver's q_pca_project
   crash site), and hash (dtype, repr(value)) per column. This layer
   catches what EXCEPT ALL cannot: boundary-type splits (Spark parquet
   DECIMAL → pandas object-Decimal vs DuckDB numeric — the r16
   q_shingle_df hash FAIL) and driver-unhashable Array/Map/Struct
   columns (the r16 q_pca_project err).

Plus: every query directory in the dump — including the no-oracle
rows-only ones — gets the pandas load + sort_values probe, so a
driver-crashing output shape can't hide behind "no oracle".

Driver-side python deps only (duckdb/pyarrow/pandas) — not used by the
Scala build.
"""
import duckdb, hashlib, json, os, sys
import pandas as pd

out = sys.argv[1] if len(sys.argv) > 1 else '/tmp/v1'
sf = sys.argv[2] if len(sys.argv) > 2 else '/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
          'lineitem', 'events', 'documents', 'embeddings']:
    con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []


def canon(df):
    """Dtype-canonicalize the way the driver plausibly does: widths
    unify (int*->int64, float32->float64), temporals stringify (parquet
    date32 loads as object-date while DuckDB .df() gives datetime64),
    but REPRESENTATION classes (object-Decimal vs numeric, arrays) stay
    distinct — those are exactly the driver-visible defects."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        dt = df[c].dtype
        if pd.api.types.is_bool_dtype(dt):
            df[c] = df[c].astype('bool')
        elif pd.api.types.is_integer_dtype(dt):
            df[c] = df[c].astype('int64')
        elif pd.api.types.is_float_dtype(dt):
            df[c] = df[c].astype('float64')
        elif pd.api.types.is_datetime64_any_dtype(dt):
            df[c] = df[c].astype('datetime64[us]').astype(str)
        elif dt == object and df[c].notna().any() and df[c].map(
                lambda v: v is None or type(v).__name__ in
                ('date', 'datetime', 'Timestamp')).all():
            df[c] = pd.to_datetime(df[c]).astype('datetime64[us]').astype(str)
    return df


def frame_hash(df):
    """Driver-style value hash: sort_values over every column (crashes on
    unhashable cells, as the driver does), then md5 over per-column
    (name, dtype, repr(value)) — dtype in the hash is what makes an
    object-Decimal column split from numeric even when values match."""
    cols = list(df.columns)
    df = df.sort_values(by=cols).reset_index(drop=True)
    h = hashlib.md5()
    for c in cols:
        h.update(f'{c}|{df[c].dtype}|'.encode())
        for v in df[c].to_numpy():
            h.update(repr(v).encode())
        h.update(b';')
    return h.hexdigest()


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
            continue
        # layer 2: the driver-faithful pandas hash
        try:
            hs = frame_hash(canon(pd.read_parquet(f'{out}/{name}')))
            ho = frame_hash(canon(con.sql(sql).df()))
        except Exception as ex:
            fails.append((name, f"DRIVER-MIRROR ERR (unhashable/unsortable "
                                f"output shape?): {ex}"))
            continue
        if hs != ho:
            fails.append((name, "DRIVER-MIRROR hash split (values equal per "
                                "EXCEPT ALL -> boundary representation "
                                "defect: decimal/dtype)"))
        else:
            print(f"OK   {name} ({o.num_rows} rows, mirror-hash ok)")
    except Exception as ex:
        fails.append((name, f"ERROR {ex}"))

# rows-only probe: every dumped query dir (incl. no-oracle) must survive
# the driver's pandas load + sort path.
rows_only = [d for d in sorted(os.listdir(out))
             if os.path.isdir(f'{out}/{d}') and d not in oracle]
for name in rows_only:
    try:
        df = canon(pd.read_parquet(f'{out}/{name}'))
        frame_hash(df)
        print(f"OK   {name} ({len(df)} rows, rows-only load+sort ok)")
    except Exception as ex:
        fails.append((name, f"ROWS-ONLY driver-load ERR: {ex}"))

for name, msg in fails:
    print(f"FAIL {name}: {msg}")
print(f"{len(oracle) - sum(1 for n, _ in fails if n in oracle)}/{len(oracle)} "
      f"oracle queries match; {len(rows_only)} rows-only outputs probed")
sys.exit(1 if fails else 0)

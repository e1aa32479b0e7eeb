import duckdb, json, glob, sys, os
outdir = sys.argv[1]; sfdir = sys.argv[2]
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.sql(f"create view {t} as select * from read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    pq = f'{outdir}/{name}'
    if not os.path.isdir(pq):
        print(f'{name}: MISSING spark output'); fails.append(name); continue
    try:
        got = con.sql(f"select * from read_parquet('{pq}/*.parquet')").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f'{name}: ORACLE ERROR {e}'); fails.append(name); continue
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f'{name}: SCHEMA MISMATCH {gc} vs {ec}'); fails.append(name); continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    e = exp[ec].sort_values(ec).reset_index(drop=True)
    if len(g) != len(e):
        print(f'{name}: ROWS {len(g)} vs {len(e)}'); fails.append(name); continue
    # exact compare incl. dtype-insensitive for ints
    ok = True
    for c in gc:
        import pandas as pd
        a, b = g[c], e[c]
        if a.dtype.kind in 'fc' or b.dtype.kind in 'fc':
            eq = (a.astype(float).values == b.astype(float).values)
        else:
            eq = (a.astype(object).values == b.astype(object).values)
        if not eq.all():
            bad = (~eq).nonzero()[0][:3]
            print(f'{name}: VALUE MISMATCH col={c} rows={bad.tolist()}')
            for i in bad: print('   got:', g.iloc[i].to_dict(), '\n   exp:', e.iloc[i].to_dict())
            ok = False; break
    if ok: print(f'{name}: OK ({len(g)} rows)')
    else: fails.append(name)
print('FAILED:', fails if fails else 'none')

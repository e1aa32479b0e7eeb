#!/usr/bin/env python3
"""Per-oracle DuckDB timing harness (builder-side budget tool).

Usage: oracle_time.py <outDir> <sfDir> [onlyCsv]
Runs each oracle SQL from <outDir>/oracle_sql.json against the sfDir
parquet views, compares against the Spark dump exactly like the
driver's check, and prints per-query seconds sorted descending plus
the total. Used to keep the suite inside the driver's check window.
"""
import duckdb, json, sys, os, time
outdir, sfdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(',')) if len(sys.argv) > 3 else None
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem',
          'events','documents','embeddings']:
    con.sql(f"create view {t} as select * from read_parquet('{sfdir}/{t}.parquet')")
oracle = json.load(open(f'{outdir}/oracle_sql.json'))
fails, times = [], {}
for name, sql in sorted(oracle.items()):
    if only and name not in only: continue
    pq = f'{outdir}/{name}'
    t0 = time.time()
    if not os.path.isdir(pq):
        print(f'{name}: MISSING spark output'); fails.append(name); continue
    try:
        got = con.sql(f"select * from read_parquet('{pq}/*.parquet')").df()
        exp = con.sql(sql).df()
    except Exception as e:
        print(f'{name}: ORACLE ERROR {e}'); fails.append(name)
        times[name] = time.time() - t0
        continue
    times[name] = time.time() - t0
    gc, ec = sorted(got.columns), sorted(exp.columns)
    if gc != ec:
        print(f'{name}: SCHEMA MISMATCH {gc} vs {ec}'); fails.append(name); continue
    g = got[gc].sort_values(gc).reset_index(drop=True)
    e = exp[ec].sort_values(ec).reset_index(drop=True)
    if len(g) != len(e):
        print(f'{name}: ROWS {len(g)} vs {len(e)}'); fails.append(name); continue
    ok = True
    for c in gc:
        a, b = g[c], e[c]
        if a.dtype.kind in 'fc' or b.dtype.kind in 'fc':
            eq = (a.astype(float).values == b.astype(float).values)
        else:
            eq = (a.astype(object).values == b.astype(object).values)
        if not eq.all():
            bad = (~eq).nonzero()[0][:3]
            print(f'{name}: VALUE MISMATCH col={c} rows={bad.tolist()}')
            for i in bad:
                print('   got:', g.iloc[i].to_dict(), '\n   exp:', e.iloc[i].to_dict())
            ok = False; break
    if not ok: fails.append(name)
for name, sec in sorted(times.items(), key=lambda kv: -kv[1]):
    print(f'{sec:8.1f}s  {name}')
print(f'TOTAL: {sum(times.values()):.1f}s over {len(times)} oracles')
print('FAILED:', fails if fails else 'none')

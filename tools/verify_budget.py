#!/usr/bin/env python3
"""Verification-budget recorder (VERDICT r4 'what's wrong' #2).

Runs the driver-shaped correctness gate end to end at the gated SF —
the Spark Verify dump, then the DuckDB oracle diff — and records the
wall-clock split plus a fingerprint of the oracle-SQL surface into
VERIFY_BUDGET.json at the repo root. VerifyBudgetSpec goes red when

  * the recorded total exceeds the budget ceiling, or
  * the oracle surface changed since the last recording (fingerprint
    mismatch -> the measurement is stale and must be re-run).

Usage: tools/verify_budget.py [sfDir] [outDir]
Defaults: /root/testdata/sf0.01, /tmp/verify_budget_dump
"""
import hashlib
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
OUT = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_budget_dump'


def oracle_fingerprint(oracle):
    """sha256 over the sorted (name, sql) pairs with the dump-dir
    binding normalized away, so the same surface fingerprints the same
    regardless of outDir."""
    h = hashlib.sha256()
    for name in sorted(oracle):
        sql = oracle[name].replace(os.path.abspath(OUT), '{{GRAFT_OUT}}')
        h.update(name.encode())
        h.update(b'\x00')
        h.update(sql.encode())
        h.update(b'\x01')
    return h.hexdigest()


def host_control_mops():
    """Single-thread fixed-work LCG loop (~1-2 s) — a Spark-free probe
    of the host grant, same idea as Bench's in-run hw_ceiling control.
    The gate's wall-clock swings with the hypervisor grant on minute
    scales (measured: identical oracle surface read 573.5 s in one
    window and 666.7 s in the next); recording the control before and
    after lets a red budget reading be attributed to the window
    instead of the suite."""
    n, x = 0, 1234567891011
    t0 = time.perf_counter()
    while n < 3_000_000:
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        n += 1
    return round(n / (time.perf_counter() - t0) / 1e6, 2)


def main():
    ctl_before = host_control_mops()
    t0 = time.time()
    r = subprocess.run(
        ['sbt', '-batch', f'runMain graft.Verify {SF} {OUT}'],
        cwd=REPO, capture_output=True, text=True, timeout=3600)
    spark_secs = time.time() - t0
    # a parallel-phase failure that the sequential retry pass later
    # dumped successfully is fine — only queries whose LAST event is a
    # failure are fatal
    state = {}
    for ln in r.stderr.splitlines():
        if ln.startswith('[verify] ') and ' failed: ' in ln:
            state[ln.split()[1]] = ln
        elif ln.startswith('[verify] ') and ' ok in ' in ln:
            state.pop(ln.split()[1], None)
    if r.returncode != 0 or state:
        print(r.stdout[-3000:], r.stderr[-3000:])
        sys.exit(f'Verify dump failed (exit {r.returncode}): '
                 f'{list(state.values())[:5]}')

    import duckdb
    con = duckdb.connect()
    for t in ['region', 'nation', 'customer', 'supplier', 'part', 'orders',
              'lineitem', 'events', 'documents', 'embeddings']:
        con.sql(f"create view {t} as "
                f"select * from read_parquet('{SF}/{t}.parquet')")
    oracle = json.load(open(f'{OUT}/oracle_sql.json'))
    t1 = time.time()
    times, failed = {}, []
    for name, sql in sorted(oracle.items()):
        q0 = time.time()
        try:
            got = con.sql(
                f"select * from read_parquet('{OUT}/{name}/*.parquet')").df()
            exp = con.sql(sql).df()
        except Exception as e:
            failed.append(f'{name}: {e}')
            times[name] = time.time() - q0
            continue
        times[name] = time.time() - q0
        gc, ec = sorted(got.columns), sorted(exp.columns)
        if gc != ec or len(got) != len(exp):
            failed.append(f'{name}: shape {gc}/{len(got)} vs {ec}/{len(exp)}')
            continue
        g = got[gc].sort_values(gc).reset_index(drop=True)
        e = exp[ec].sort_values(ec).reset_index(drop=True)
        for c in gc:
            a, b = g[c], e[c]
            if a.dtype.kind in 'fc' or b.dtype.kind in 'fc':
                eq = a.astype(float).values == b.astype(float).values
            else:
                eq = a.astype(object).values == b.astype(object).values
            if not eq.all():
                failed.append(f'{name}: values col={c}')
                break
    duckdb_secs = time.time() - t1

    budget = {
        'host_control_mops_before': ctl_before,
        'host_control_mops_after': host_control_mops(),
        'sf': SF,
        'recorded_utc': time.strftime('%Y-%m-%dT%H:%M:%SZ', time.gmtime()),
        'spark_dump_secs': round(spark_secs, 1),
        'duckdb_oracle_secs': round(duckdb_secs, 1),
        'total_secs': round(spark_secs + duckdb_secs, 1),
        'n_queries': len(json.load(open(f'{OUT}/oracle_sql.json'))),
        'n_oracles': len(times),
        'failed': failed,
        'slowest_oracles': dict(
            sorted(times.items(), key=lambda kv: -kv[1])[:12]),
        'oracle_fingerprint': oracle_fingerprint(oracle),
    }
    path = os.path.join(REPO, 'VERIFY_BUDGET.json')
    with open(path, 'w') as f:
        json.dump(budget, f, indent=2, sort_keys=True)
        f.write('\n')
    print(json.dumps(budget, indent=2, sort_keys=True))
    print(f'wrote {path}')
    if failed:
        sys.exit(f'ORACLE FAILURES: {failed}')


if __name__ == '__main__':
    main()

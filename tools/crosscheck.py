#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle
SQL in DuckDB over the sfDir parquet tables and compare against the
parquet that graft.Verify dumped. Sorts columns by name, sorts rows,
compares values (exact for ints/strings, tiny-eps report for floats).

Usage: tools/crosscheck.py [sfDir] [verifyOut] [timesJson]

The optional third arg writes per-query DuckDB oracle seconds (one
cold-ish pass, the compare run itself) to a JSON file — the growth
audit across SFs reads these.
"""
import json, sys, glob, os, time
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
times_path = sys.argv[3] if len(sys.argv) > 3 else None
times = {}

con = duckdb.connect()
# explicit full-width threading: at sf10 some oracle plans are
# minutes-long and the default can under-thread in container envs
con.execute(f"SET threads TO {os.cpu_count()}")
# the compare sorts rows, so insertion order is irrelevant — and
# preserving it roughly doubles DuckDB's spill footprint on the
# 100M-row window sorts at sf10 (observed: disk-full at 72 GB)
con.execute("SET preserve_insertion_order=false")
for f in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(f)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
# GRAFT_QUERIES: comma-separated subset filter, for sharding a big-SF
# crosscheck across parallel processes (the sf10 DuckDB pass is hours
# single-file; the cheap ~130 queries shard to minutes). GRAFT_MEM:
# optional DuckDB memory_limit per shard so N parallel shards cannot
# overcommit the box (each defaults to 80% of RAM).
subset = os.environ.get("GRAFT_QUERIES")
if subset:
    keep = set(subset.split(","))
    missing = keep - set(oracles)
    if missing:
        sys.exit(f"GRAFT_QUERIES names unknown queries: {sorted(missing)}")
    oracles = {q: s for q, s in oracles.items() if q in keep}
if os.environ.get("GRAFT_MEM"):
    # interpolated into SQL inside quotes — validate the shape first so
    # a typo'd value fails with a clear message, not a DuckDB parse error
    import re as _re
    _mem = os.environ["GRAFT_MEM"]
    if not _re.fullmatch(r"\d+(\.\d+)?\s*[KMGT]i?B", _mem, _re.IGNORECASE):
        sys.exit(f"GRAFT_MEM must be a memory size like 24GB, got {_mem!r}")
    con.execute(f"SET memory_limit='{_mem}'")
# parallel shards MUST NOT share a spill directory: DuckDB's default
# temp_directory is cwd/.tmp, and two processes there delete each
# other's duckdb_temp_storage files mid-query (observed: IOException
# killing a shard outright and an IO read error failing a query)
if os.environ.get("GRAFT_TMP"):
    if "'" in os.environ["GRAFT_TMP"]:
        sys.exit("GRAFT_TMP must not contain single quotes")
    os.makedirs(os.environ["GRAFT_TMP"], exist_ok=True)
    con.execute(f"SET temp_directory='{os.environ['GRAFT_TMP']}'")
fails = 0
for qname in sorted(oracles):
    sql = oracles[qname]
    pdir = f"{out}/{qname}"
    files = sorted(glob.glob(f"{pdir}/*.parquet"))
    if not files:
        print(f"FAIL {qname}: no spark output", flush=True);  fails += 1;  continue
    # read EVERY part file: Verify coalesces to 1 today, but if that
    # ever changes a files[0] read would silently diff a row subset
    got = pd.concat([pq.read_table(f).to_pandas() for f in files],
                    ignore_index=True)
    try:
        t0 = time.perf_counter()
        exp = con.sql(sql).df()
        times[qname] = round(time.perf_counter() - t0, 3)
    except Exception as e:
        print(f"FAIL {qname}: oracle error {e}", flush=True);  fails += 1;  continue
    gcols, ecols = sorted(got.columns), sorted(exp.columns)
    if gcols != ecols:
        print(f"FAIL {qname}: cols spark={gcols} duck={ecols}", flush=True);  fails += 1;  continue
    g = got[gcols].sort_values(gcols).reset_index(drop=True)
    e = exp[ecols].sort_values(ecols).reset_index(drop=True)
    if len(g) != len(e):
        print(f"FAIL {qname}: rows spark={len(g)} duck={len(e)}", flush=True);  fails += 1;  continue
    bad = []
    for c in gcols:
        gv, ev = g[c], e[c]
        # the driver's hash compare stringifies values, so an int64
        # on one side vs float64 on the other (e.g. DuckDB HUGEINT
        # from SUM(int) surfacing as float) hashes "1" vs "1.0" —
        # treat kind mismatch as failure instead of casting it away
        if (gv.dtype.kind in 'iu') != (ev.dtype.kind in 'iu'):
            bad.append(f"{c}: dtype spark={gv.dtype} duck={ev.dtype}")
            continue
        if gv.dtype.kind == 'f' or ev.dtype.kind == 'f':
            gv2 = gv.astype(float); ev2 = ev.astype(float)
            neq = ~((gv2 == ev2) | (gv2.isna() & ev2.isna()))
            if neq.any():
                i = neq.idxmax()
                bad.append(f"{c}[{i}]: spark={gv2[i]!r} duck={ev2[i]!r} d={abs(gv2[i]-ev2[i])}")
        else:
            neq = ~((gv.astype(str) == ev.astype(str)) | (gv.isna() & ev.isna()))
            if neq.any():
                i = neq.idxmax()
                bad.append(f"{c}[{i}]: spark={gv[i]!r} duck={ev[i]!r}")
    if bad:
        print(f"FAIL {qname}: {len(bad)} col diffs; e.g. " + " | ".join(bad[:3]), flush=True)
        fails += 1
    else:
        print(f"OK   {qname} ({len(g)} rows, {len(gcols)} cols)", flush=True)
print(f"\n{len(oracles) - fails}/{len(oracles)} queries match")
if times_path:
    json.dump(times, open(times_path, "w"), indent=0, sort_keys=True)
    print(f"oracle timings -> {times_path}")
sys.exit(1 if fails else 0)

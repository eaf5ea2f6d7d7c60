#!/usr/bin/env python3
"""Compare two graft.Verify dumps frame-for-frame (driver-side
tooling). Same compare discipline as crosscheck.py — sorted columns,
sorted rows, exact values including float bits — but Spark-vs-Spark:
with dump A already DuckDB-crosschecked, A == B proves B's config
profile reproduces the oracle-checked results WITHOUT paying the
DuckDB pass again (at sf10 that pass is hours).

Usage: tools/compare_dumps.py <dumpA> <dumpB>
"""
import sys, glob, os
import pyarrow.parquet as pq
import pandas as pd

a, b = sys.argv[1], sys.argv[2]

def load(out, qname):
    files = sorted(glob.glob(f"{out}/{qname}/*.parquet"))
    if not files:
        return None
    return pd.concat([pq.read_table(f).to_pandas() for f in files],
                     ignore_index=True)

names = sorted(os.path.basename(d) for d in glob.glob(f"{a}/*") if os.path.isdir(d))
fails = 0
for qname in names:
    ga, gb = load(a, qname), load(b, qname)
    if ga is None or gb is None:
        print(f"FAIL {qname}: missing output ({'A' if ga is None else 'B'})")
        fails += 1
        continue
    ca, cb = sorted(ga.columns), sorted(gb.columns)
    if ca != cb:
        print(f"FAIL {qname}: cols A={ca} B={cb}")
        fails += 1
        continue
    fa = ga[ca].sort_values(ca).reset_index(drop=True)
    fb = gb[cb].sort_values(cb).reset_index(drop=True)
    if len(fa) != len(fb):
        print(f"FAIL {qname}: rows A={len(fa)} B={len(fb)}")
        fails += 1
        continue
    bad = []
    for c in ca:
        va, vb = fa[c], fb[c]
        if va.dtype.kind == 'f' or vb.dtype.kind == 'f':
            va2, vb2 = va.astype(float), vb.astype(float)
            neq = ~((va2 == vb2) | (va2.isna() & vb2.isna()))
        else:
            neq = ~((va.astype(str) == vb.astype(str)) | (va.isna() & vb.isna()))
        if neq.any():
            i = neq.idxmax()
            bad.append(f"{c}[{i}]: A={fa[c][i]!r} B={fb[c][i]!r}")
    if bad:
        print(f"FAIL {qname}: {len(bad)} col diffs; e.g. " + " | ".join(bad[:3]))
        fails += 1
    else:
        print(f"OK   {qname} ({len(fa)} rows, {len(ca)} cols)")
print(f"\n{len(names) - fails}/{len(names)} dumps match")
sys.exit(1 if fails else 0)

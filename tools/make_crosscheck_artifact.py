#!/usr/bin/env python3
"""Assemble a CROSSCHECK_*.json summary artifact from a crosscheck.py
log (driver-side tooling). Parses the OK/FAIL lines, counts matches,
and embeds the campaign metadata passed on the command line.

Usage: tools/make_crosscheck_artifact.py <log> <out.json> <what> <sfNote>
"""
import json, re, sys

log, out, what, sf_note = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]

ok, failed = [], []
for line in open(log):
    m = re.match(r"OK\s+(\S+)", line)
    if m:
        ok.append(m.group(1))
        continue
    m = re.match(r"FAIL\s+(\S+)", line)
    if m:
        failed.append({"query": m.group(1), "detail": line.strip()})

summary_ok = None
for line in open(log):
    m = re.match(r"(\d+)/(\d+) queries match", line)
    if m:
        summary_ok = (int(m.group(1)), int(m.group(2)))

artifact = {
    "what": what,
    "sf": sf_note,
    "n_queries": len(ok) + len(failed),
    "n_match": len(ok),
    "failed": failed,
    "log_summary_line": summary_ok and f"{summary_ok[0]}/{summary_ok[1]} queries match",
}
json.dump(artifact, open(out, "w"), indent=1)
print(f"{out}: {len(ok)} ok, {len(failed)} failed")

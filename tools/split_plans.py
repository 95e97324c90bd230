#!/usr/bin/env python3
"""Split a `graft.Plans` dump into per-query plan files.

Usage: tools/run.sh graft.Plans > /tmp/plans.md
       python3 tools/split_plans.py /tmp/plans.md plans/r16 _after

Writes plans/r16/<query>_<suffix>.txt for every `## <query>` section whose
body is a fenced plan (the evidence format OPTIMIZATION_r16.md cites).
"""
import re
import sys
import pathlib

src, outdir, suffix = sys.argv[1], pathlib.Path(sys.argv[2]), sys.argv[3]
outdir.mkdir(parents=True, exist_ok=True)
text = pathlib.Path(src).read_text()
sections = re.split(r"^## ", text, flags=re.M)[1:]
n = 0
for sec in sections:
    name = sec.split("\n", 1)[0].strip()
    if not re.fullmatch(r"[a-z0-9_]+", name):
        continue  # narrative sections (dv_delete_cost etc.) keep out of per-query files
    body = "## " + sec.rstrip() + "\n"
    if "== Physical Plan ==" not in body:
        continue
    (outdir / f"{name}{suffix}.txt").write_text(body)
    n += 1
print(f"wrote {n} plan files to {outdir}")

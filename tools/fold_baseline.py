#!/usr/bin/env python3
"""Fold one or more bench runs' per-query times into
tools/bench_baseline.json: carried queries keep min(existing, runs);
queries NEW to the baseline get min(runs). Queries whose PLAN changed
this round should be listed in --replace so their baseline is the new
plan's minimum across the given runs (not polluted by the old plan's
faster/slower history).

Usage: python3 tools/fold_baseline.py BENCH1.json [BENCH2.json ...]
           [--replace q_a,q_b]
Each BENCH file: two JSON lines (per_query + summary) as printed by
graft.Bench, or a single {"per_query": ...} object.
"""
import json
import sys

# r15 (ADVICE): parse BOTH forms — `--replace=q_a,q_b` and the
# two-token `--replace q_a,q_b` the usage string documents (the bare
# form used to strip the flag but then open q_a,q_b as a bench file).
args = []
replace = set()
argv = sys.argv[1:]
i = 0
while i < len(argv):
    a = argv[i]
    if a.startswith("--replace="):
        replace |= set(a.split("=", 1)[1].split(","))
    elif a == "--replace":
        if i + 1 >= len(argv):
            sys.exit("--replace needs a comma-separated query list")
        replace |= set(argv[i + 1].split(","))
        i += 1
    else:
        args.append(a)
    i += 1

runs = []
for f in args:
    txt = open(f).read().strip().split("\n")
    for line in txt:
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if "per_query" in d:
            runs.append(d["per_query"])

base_path = "tools/bench_baseline.json"
base = json.load(open(base_path))
q = base["queries"]

names = set(q) | set().union(*[set(r) for r in runs])
for name in sorted(names):
    vals = [r[name] for r in runs if name in r and r[name] >= 0]
    if not vals:
        continue
    if name in replace or name not in q:
        q[name] = round(min(vals), 3)
    else:
        q[name] = round(min([q[name]] + vals), 3)

json.dump(base, open(base_path, "w"), indent=1)
print(f"folded {len(runs)} runs into {base_path}: {len(q)} queries")

#!/usr/bin/env python3
"""Split two PLANS.md snapshots into plans/<round>/<query>_{before,after}.txt
for the queries a round touched.

Usage: python3 tools/split_plans.py <before.md> <after.md> <outdir> <regex>
"""
import re, sys, os

before, after, outdir, pat = sys.argv[1:5]
rx = re.compile(pat)
os.makedirs(outdir, exist_ok=True)

def entries(path):
    out, name, buf = {}, None, []
    for line in open(path):
        m = re.match(r"^## (\S+)\s*$", line)
        if m:
            if name: out[name] = "".join(buf)
            name, buf = m.group(1), []
        elif name:
            buf.append(line)
    if name: out[name] = "".join(buf)
    return out

b, a = entries(before), entries(after)
n = 0
for q in sorted(set(b) | set(a)):
    if not rx.search(q):
        continue
    for tag, src in (("before", b), ("after", a)):
        body = src.get(q)
        if body is None:
            continue
        with open(f"{outdir}/{q}_{tag}.txt", "w") as f:
            f.write(f"# {q} ({tag})\n{body}")
        n += 1
print(f"wrote {n} files to {outdir}")

#!/usr/bin/env python3
"""Summarize a Spark event log: per-job wall time grouped by call site.

Usage: python3 tools/joblog.py /tmp/spark-events/<app-id> [top_n]

Prints total job count, summed job wall time, and the top call sites by
summed duration — the measurement harness for guide §1 (where do the
seconds of a many-job fixture actually go).
"""
import json, sys, collections

path = sys.argv[1]
top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40

starts = {}
jobs = []  # (duration_ms, callsite, desc, njobstages, ntasks)
stage_tasks = {}
with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            props = e.get("Properties") or {}
            cs = props.get("callSite.short", "?")
            desc = props.get("spark.job.description", "")
            nstages = len(e.get("Stage Infos", []))
            ntasks = sum(s.get("Number of Tasks", 0) for s in e.get("Stage Infos", []))
            starts[jid] = (e["Submission Time"], cs, desc, nstages, ntasks)
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in starts:
                t0, cs, desc, nstages, ntasks = starts.pop(jid)
                jobs.append((e["Completion Time"] - t0, cs, desc, nstages, ntasks))

print(f"jobs: {len(jobs)}  total job wall: {sum(j[0] for j in jobs)/1000:.2f}s")
by_cs = collections.defaultdict(lambda: [0, 0, 0])
for dur, cs, desc, nstages, ntasks in jobs:
    k = cs
    by_cs[k][0] += dur
    by_cs[k][1] += 1
    by_cs[k][2] += ntasks
for cs, (dur, n, ntasks) in sorted(by_cs.items(), key=lambda kv: -kv[1][0])[:top_n]:
    print(f"{dur/1000:8.2f}s  n={n:4d} tasks={ntasks:5d}  {cs}")

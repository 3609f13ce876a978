#!/usr/bin/env python3
"""Summarize a Spark event log per job-description label.

Usage: evlog_profile.py <eventlog-file> [--jobs]

For each distinct job description (Bench labels jobs "<query> pass=<n>"),
prints: number of jobs, wall span (first job submit -> last job end), sum of
job durations, sum of executor task time (executorRunTime), driver gap
(span - sum of job durations = time no job of this label was running,
i.e. driver-side work between actions), and shuffle bytes.
"""
import json, sys, collections

path = sys.argv[1]
show_jobs = "--jobs" in sys.argv

jobs = {}          # jobId -> dict
stage_to_job = {}  # stageId -> jobId
stages = collections.defaultdict(lambda: {"task_ms": 0, "sh_read": 0,
                                          "sh_write": 0, "tasks": 0,
                                          "gc_ms": 0, "input": 0})

with open(path) as f:
    for line in f:
        try:
            e = json.loads(line)
        except json.JSONDecodeError:
            continue
        ev = e.get("Event")
        if ev == "SparkListenerJobStart":
            jid = e["Job ID"]
            desc = e.get("Properties", {}).get("spark.job.description", "")
            jobs[jid] = {"desc": desc, "t0": e["Submission Time"], "t1": None}
            for sid in e.get("Stage IDs", []):
                stage_to_job[sid] = jid
        elif ev == "SparkListenerJobEnd":
            jid = e["Job ID"]
            if jid in jobs:
                jobs[jid]["t1"] = e["Completion Time"]
        elif ev == "SparkListenerTaskEnd":
            sid = e["Stage ID"]
            m = e.get("Task Metrics") or {}
            s = stages[sid]
            s["task_ms"] += m.get("Executor Run Time", 0)
            s["gc_ms"] += m.get("JVM GC Time", 0)
            s["tasks"] += 1
            s["sh_read"] += (m.get("Shuffle Read Metrics") or {}).get(
                "Remote Bytes Read", 0) + (m.get("Shuffle Read Metrics") or {}).get(
                "Local Bytes Read", 0)
            s["sh_write"] += (m.get("Shuffle Write Metrics") or {}).get(
                "Shuffle Bytes Written", 0)
            s["input"] += (m.get("Input Metrics") or {}).get("Bytes Read", 0)

by_desc = collections.defaultdict(list)
for jid, j in jobs.items():
    by_desc[j["desc"]].append((jid, j))

rows = []
for desc, js in by_desc.items():
    t0 = min(j["t0"] for _, j in js)
    t1 = max(j["t1"] or j["t0"] for _, j in js)
    jobdur = sum((j["t1"] or j["t0"]) - j["t0"] for _, j in js)
    task_ms = sh_r = sh_w = gc = inp = ntasks = 0
    for sid, jid in stage_to_job.items():
        if jobs[jid]["desc"] == desc and sid in stages:
            s = stages[sid]
            task_ms += s["task_ms"]; sh_r += s["sh_read"]
            sh_w += s["sh_write"]; gc += s["gc_ms"]
            inp += s["input"]; ntasks += s["tasks"]
    rows.append((t1 - t0, desc, len(js), jobdur, task_ms, ntasks,
                 sh_w, gc, inp, t0, js))

rows.sort(reverse=True)
print(f"{'span_s':>7} {'njobs':>5} {'jobdur_s':>8} {'gap_s':>6} "
      f"{'task_s':>7} {'ntask':>5} {'shW_MB':>7} {'gc_s':>5} {'in_MB':>6}  desc")
for span, desc, nj, jobdur, task_ms, ntasks, sh_w, gc, inp, t0, js in rows[:80]:
    print(f"{span/1e3:7.2f} {nj:5d} {jobdur/1e3:8.2f} {(span-jobdur)/1e3:6.2f} "
          f"{task_ms/1e3:7.2f} {ntasks:5d} {sh_w/1e6:7.1f} {gc/1e3:5.2f} "
          f"{inp/1e6:6.1f}  {desc[:60]}")
    if show_jobs:
        for jid, j in sorted(js, key=lambda x: x[1]["t0"]):
            d = ((j["t1"] or j["t0"]) - j["t0"]) / 1e3
            print(f"    job {jid}: {d:6.2f}s start+{(j['t0']-t0)/1e3:6.2f}s")

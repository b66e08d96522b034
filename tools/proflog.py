#!/usr/bin/env python3
"""Parse a Spark event log into a per-job-group (query) cost breakdown.

Usage: proflog.py <eventlog file> [top_n]

Emits, per job description (graft.Bench labels jobs with the query
name), the number of jobs, summed job wall-clock, task time, shuffle
bytes, spill, and the number of stages/tasks — the §1/§2 numbers the
optimization guide asks for before touching anything.
"""
import json, sys, collections

path = sys.argv[1]
top = int(sys.argv[2]) if len(sys.argv) > 2 else 40

jobs = {}              # jobId -> dict
stage_to_job = {}      # stageId -> jobId
stages = {}            # stageId -> dict

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
        elif ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            # StageCompleted fires once per stage ATTEMPT (r20 ADVICE):
            # counting attempt > 0 double-counts retried stages. Attempt 0
            # alone keeps per-query numbers comparable across retry noise.
            if si.get("Stage Attempt ID", 0) != 0:
                continue
            sid = si["Stage ID"]
            st = stages.setdefault(sid, collections.Counter())
            st["n_tasks"] += si.get("Number of Tasks", 0)
            sub = si.get("Submission Time")
            com = si.get("Completion Time")
            if sub and com:
                st["stage_ms"] += com - sub
        elif ev == "SparkListenerTaskEnd":
            if e.get("Stage Attempt ID", 0) != 0:
                continue
            reason = (e.get("Task End Reason") or {}).get("Reason")
            if reason is not None and reason != "Success":
                continue  # failed/killed task metrics would skew task_ms
            sid = e["Stage ID"]
            st = stages.setdefault(sid, collections.Counter())
            m = e.get("Task Metrics") or {}
            st["task_ms"] += m.get("Executor Run Time", 0)
            st["gc_ms"] += m.get("JVM GC Time", 0)
            st["result_ser_ms"] += m.get("Result Serialization Time", 0)
            st["deser_ms"] += m.get("Executor Deserialize Time", 0)
            sr = m.get("Shuffle Read Metrics") or {}
            st["shuf_read_b"] += sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0)
            st["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
            sw = m.get("Shuffle Write Metrics") or {}
            st["shuf_write_b"] += sw.get("Shuffle Bytes Written", 0)
            st["spill_b"] += m.get("Memory Bytes Spilled", 0)
            inp = m.get("Input Metrics") or {}
            st["input_b"] += inp.get("Bytes Read", 0)
            out = m.get("Output Metrics") or {}
            st["output_b"] += out.get("Bytes Written", 0)

# Bench runs queries sequentially, so a job not carrying a bench label
# ("p<pass>:<query>") belongs to the most recent bench-labeled job's
# query: streaming foreachBatch jobs carry multi-line "id = <uuid>"
# descriptions, broadcast/subquery jobs submitted from the SQL execution
# thread pool carry call-site descriptions — both run strictly inside
# their gate's bracket of labeled jobs.
import bisect, re
is_bench = lambda d: re.match(r"p\d+:", d or "") is not None
labeled = sorted((j["t0"], j["desc"]) for j in jobs.values()
                 if is_bench(j["desc"]))
for j in jobs.values():
    if not is_bench(j["desc"]):
        i = bisect.bisect_right(labeled, (j["t0"], chr(0x10FFFF))) - 1
        j["desc"] = labeled[i][1] if i >= 0 else "<warmup>"

groups = collections.defaultdict(collections.Counter)
for jid, j in jobs.items():
    g = groups[j["desc"] or "<unlabeled>"]
    g["n_jobs"] += 1
    if j["t1"]:
        g["job_wall_ms"] += j["t1"] - j["t0"]
for sid, st in stages.items():
    jid = stage_to_job.get(sid)
    desc = jobs.get(jid, {}).get("desc", "") or "<unlabeled>"
    g = groups[desc]
    for k, v in st.items():
        g[k] += v
    g["n_stages"] += 1

rows = sorted(groups.items(), key=lambda kv: -kv[1]["job_wall_ms"])
hdr = ("query", "jobs", "stages", "tasks", "wall_ms", "task_ms", "gc_ms",
       "fetchw_ms", "in_MB", "shufW_MB", "shufR_MB", "out_MB", "spill_MB")
print(("%-34s" + "%9s" * (len(hdr) - 1)) % hdr)
for desc, g in rows[:top]:
    print(("%-34s" + "%9d" * 8 + "%9.1f" * 4) % (
        desc[:34], g["n_jobs"], g["n_stages"], g["n_tasks"],
        g["job_wall_ms"], g["task_ms"], g["gc_ms"], g["fetch_wait_ms"],
        g["input_b"] / 1e6, g["shuf_write_b"] / 1e6, g["shuf_read_b"] / 1e6,
        g["output_b"] / 1e6, g["spill_b"] / 1e6))
total_wall = sum(g["job_wall_ms"] for g in groups.values())
print("TOTAL job wall: %.1f s over %d jobs in %d groups" % (
    total_wall / 1e3, sum(g["n_jobs"] for g in groups.values()), len(groups)))

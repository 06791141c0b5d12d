"""Parse a Spark event log into a per-leg job/stage cost breakdown.

The bench labels every leg's jobs with ``setJobDescription("leg:<name>:…")``
(guide §1.5), so the event log carries the attribution the local-mode UI
(disabled in the bench session) would otherwise show. Usage:

    SPARK_CONF_DIR with spark.eventLog.enabled=true → run bench.py →
    python tools/stage_profile.py /tmp/spark-events/<app-id> [leg-substr]

Prints, per leg occurrence (cold / sweepN): job count, wall clock from
first job submit to last job end, and the top stages by duration with
task-time / GC / shuffle-read/write / input bytes — the §7.1 "which stage
is slow and why" table without a live UI.
"""

from __future__ import annotations

import json
import sys
from collections import defaultdict


def main() -> None:
    path = sys.argv[1]
    want = sys.argv[2] if len(sys.argv) > 2 else ""

    # stage id -> aggregated task metrics
    stage_tasks: dict[int, dict[str, float]] = defaultdict(
        lambda: defaultdict(float)
    )
    stage_info: dict[int, dict] = {}
    # job id -> (desc, submit_ts, end_ts, [stage ids])
    jobs: dict[int, dict] = {}

    with open(path) as f:
        for line in f:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            et = ev.get("Event")
            if et == "SparkListenerJobStart":
                desc = (ev.get("Properties") or {}).get(
                    "spark.job.description"
                ) or "(none)"
                jobs[ev["Job ID"]] = {
                    "desc": desc,
                    "submit": ev.get("Submission Time", 0),
                    "end": None,
                    "stages": [
                        s["Stage ID"] for s in ev.get("Stage Infos", [])
                    ],
                }
            elif et == "SparkListenerJobEnd":
                if ev["Job ID"] in jobs:
                    jobs[ev["Job ID"]]["end"] = ev.get("Completion Time", 0)
            elif et == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stage_info[si["Stage ID"]] = {
                    "name": si.get("Stage Name", ""),
                    "tasks": si.get("Number of Tasks", 0),
                    "submit": si.get("Submission Time"),
                    "complete": si.get("Completion Time"),
                }
            elif et == "SparkListenerTaskEnd":
                m = ev.get("Task Metrics") or {}
                sid = ev["Stage ID"]
                t = stage_tasks[sid]
                t["run_ms"] += m.get("Executor Run Time", 0)
                t["gc_ms"] += m.get("JVM GC Time", 0)
                t["deser_ms"] += m.get("Executor Deserialize Time", 0)
                t["result_ser_ms"] += m.get("Result Serialization Time", 0)
                sr = m.get("Shuffle Read Metrics") or {}
                t["shuffle_read"] += sr.get("Remote Bytes Read", 0) + sr.get(
                    "Local Bytes Read", 0
                )
                t["fetch_wait_ms"] += sr.get("Fetch Wait Time", 0)
                sw = m.get("Shuffle Write Metrics") or {}
                t["shuffle_write"] += sw.get("Shuffle Bytes Written", 0)
                im = m.get("Input Metrics") or {}
                t["input_bytes"] += im.get("Bytes Read", 0)

    # group jobs by description
    by_desc: dict[str, list[dict]] = defaultdict(list)
    for jid in sorted(jobs):
        by_desc[jobs[jid]["desc"]].append(jobs[jid])

    for desc in by_desc:
        if want and want not in desc:
            continue
        js = by_desc[desc]
        submits = [j["submit"] for j in js if j["submit"]]
        ends = [j["end"] for j in js if j["end"]]
        wall = (max(ends) - min(submits)) / 1000 if submits and ends else 0
        sids = sorted({s for j in js for s in j["stages"] if s in stage_info})
        print(f"\n== {desc}  jobs={len(js)} wall={wall:.2f}s stages={len(sids)}")
        rows = []
        for sid in sids:
            si = stage_info[sid]
            dur = (
                (si["complete"] - si["submit"]) / 1000
                if si.get("submit") and si.get("complete")
                else 0.0
            )
            t = stage_tasks.get(sid, {})
            rows.append((dur, sid, si, t))
        rows.sort(reverse=True)
        for dur, sid, si, t in rows[:12]:
            name = si["name"].split("\n")[0][:70]
            print(
                f"  stage {sid:4d} {dur:7.2f}s tasks={si['tasks']:3d} "
                f"taskT={t.get('run_ms', 0) / 1000:7.1f}s "
                f"gc={t.get('gc_ms', 0) / 1000:5.1f}s "
                f"in={t.get('input_bytes', 0) / 1e6:8.1f}MB "
                f"sr={t.get('shuffle_read', 0) / 1e6:7.1f}MB "
                f"sw={t.get('shuffle_write', 0) / 1e6:7.1f}MB  {name}"
            )


if __name__ == "__main__":
    main()

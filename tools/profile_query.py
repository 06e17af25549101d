"""Per-job time attribution for one registry query (guide §1: measure
first). Runs the query with the Spark event log enabled, then parses the
log into a per-job table: wall time, task time, shuffle bytes, and the
job group/description — so a multi-second query can be decomposed into
its actual jobs (index writes, materializations, screens, aggregates)
instead of guessed at from code.

Usage: python tools/profile_query.py <query> [sf_dir] [--runs N]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import sdc_spark.plans.all  # noqa: F401
from sdc_spark.plans.registry import QUERIES
from sdc_spark.session import get_spark


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    name = args[0]
    sf_dir = args[1] if len(args) > 1 else "/root/testdata/sf0.1"
    runs = 1
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=")[1])

    evdir = tempfile.mkdtemp(prefix="sdc_evlog_")
    spark = get_spark(
        f"profile_{name}",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evdir,
            "spark.eventLog.compress": "false",
        },
    )
    fn = QUERIES[name]
    # warm run (JIT/codegen), mirroring bench.py methodology
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    spark.sparkContext.setJobDescription(None)

    t0 = time.time()
    for _ in range(runs):
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    wall = (time.time() - t0) / runs
    app_id = spark.sparkContext.applicationId
    spark.stop()

    # parse the event log (Spark 4 rolling format: a directory of files)
    path = os.path.join(evdir, app_id)
    if not os.path.exists(path):
        cand = [os.path.join(evdir, d) for d in os.listdir(evdir)]
        path = max(cand, key=os.path.getmtime)
    if os.path.isdir(path):
        files = sorted(
            os.path.join(path, f)
            for f in os.listdir(path)
            if f.startswith("events_")
        )
    else:
        files = [path]

    def lines():
        for fp in files:
            with open(fp) as f:
                yield from f

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    if True:
        for line in lines():
            ev = json.loads(line)
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "start": ev["Submission Time"],
                    "desc": props.get("spark.job.description", "")[:90],
                    "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                }
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["end"] = ev["Completion Time"]
            elif e == "SparkListenerStageCompleted":
                si = ev["Stage Info"]
                stages[si["Stage ID"]] = {
                    "name": si["Stage Name"].split("\n")[0][:70],
                    "tasks": si["Number of Tasks"],
                    "ms": si.get("Completion Time", 0) - si.get("Submission Time", 0),
                }

    print(f"\n=== {name}: {wall:.2f}s/run (x{runs} timed, after warm) ===")
    total_ms = 0
    # attribute inter-job gaps (driver-side work: planning, catalog, commit)
    prev_end = None
    ordered = sorted(jobs.items(), key=lambda kv: kv[1]["start"])
    gap_ms = 0
    for jid, j in ordered:
        if "end" not in j:
            continue
        ms = j["end"] - j["start"]
        total_ms += ms
        gap = 0
        if prev_end is not None:
            gap = max(0, j["start"] - prev_end)
            gap_ms += gap
        prev_end = j["end"]
        stg = ", ".join(
            f"{stages[s]['tasks']}t/{stages[s]['ms']}ms:{stages[s]['name'][:40]}"
            for s in j["stages"]
            if s in stages
        )
        print(
            f"job {jid:>3} {ms:>6} ms  gap {gap:>5} ms  "
            f"{j['desc'] or '-':<40} [{stg}]"
        )
    n = max(1, runs + 1)
    print(f"jobs total {total_ms} ms over {len(ordered)} jobs (warm+timed), "
          f"inter-job driver gaps {gap_ms} ms")
    print(f"event log: {path}")


if __name__ == "__main__":
    main()

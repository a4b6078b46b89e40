#!/usr/bin/env python
"""Per-JOB wall/callsite breakdown for one registry query.

joblog_probe.py aggregates a query's whole event-log delta; this probe
keeps the per-job granularity — (job id, callsite, wall ms, tasks,
executor CPU ms) — so a multi-action row (the intake loops run ~15
driver actions per micro-batch) shows WHICH action the time goes to.

Usage: python scripts/job_breakdown.py <query> [query ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _log_file(log_dir: str) -> Path:
    # Newest entry by mtime (ADVICE r9): a rolled log dir or a stray
    # second app log would otherwise be picked arbitrarily. Probe-only
    # caveat: tasks of stages shared across jobs are attributed to the
    # first job seen.
    files = sorted(
        (f for f in Path(log_dir).iterdir() if not f.name.startswith(".")),
        key=lambda f: f.stat().st_mtime,
    )
    entry = files[-1]
    if entry.is_dir():
        evs = sorted(f for f in entry.iterdir() if f.name.startswith("events_"))
        return evs[-1]
    return entry


def breakdown(path: Path, offset: int) -> list[dict]:
    jobs: dict[int, dict] = {}
    stage_to_job: dict[int, int] = {}
    with open(path) as fh:
        fh.seek(offset)
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                jid = ev["Job ID"]
                props = ev.get("Properties") or {}
                jobs[jid] = {
                    "job": jid,
                    "callsite": props.get("callSite.short", ""),
                    "desc": props.get("spark.job.description", ""),
                    "t0": ev.get("Submission Time", 0),
                    "t1": 0,
                    "tasks": 0,
                    "cpu_ms": 0,
                }
                for sid in ev.get("Stage IDs", []):
                    stage_to_job[sid] = jid
            elif e == "SparkListenerStageCompleted":
                si = ev.get("Stage Info") or {}
                jid = stage_to_job.get(si.get("Stage ID"))
                if jid in jobs and not jobs[jid]["callsite"]:
                    jobs[jid]["callsite"] = (si.get("Stage Name") or "")[:80]
            elif e == "SparkListenerJobEnd":
                jid = ev["Job ID"]
                if jid in jobs:
                    jobs[jid]["t1"] = ev.get("Completion Time", 0)
            elif e == "SparkListenerTaskEnd":
                jid = stage_to_job.get(ev.get("Stage ID"))
                if jid in jobs:
                    jobs[jid]["tasks"] += 1
                    m = ev.get("Task Metrics") or {}
                    jobs[jid]["cpu_ms"] += (
                        m.get("Executor CPU Time", 0) // 1_000_000
                    )
    out = []
    for j in jobs.values():
        j["wall_ms"] = max(0, j["t1"] - j["t0"])
        del j["t0"], j["t1"]
        out.append(j)
    return sorted(out, key=lambda j: j["job"])


def main() -> None:
    names = sys.argv[1:]
    if "SPARK_GRAFT_INITIAL_PARTITIONS" not in os.environ:
        total = sum(f.stat().st_size for f in Path(SF_DIR).glob("*.parquet"))
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        os.environ["SPARK_GRAFT_INITIAL_PARTITIONS"] = str(
            max(cpus, min(8 * cpus, total // (64 << 20) + 1))
        )
    log_dir = tempfile.mkdtemp(prefix="sparklog-")
    from quantlab_data_pipeline_spark.queries import SPARK_QUERIES
    from quantlab_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="job-breakdown",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    spark.range(1).write.format("noop").mode("overwrite").save()
    lf = _log_file(log_dir)
    for name in names:
        offset = lf.stat().st_size
        import time

        t0 = time.perf_counter()
        SPARK_QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        rows = breakdown(lf, offset)
        print(f"=== {name}: wall {wall:.1f}s, {len(rows)} jobs")
        # gaps between jobs = driver-side time (planning, catalog, FS ops)
        total_job_ms = sum(r["wall_ms"] for r in rows)
        print(
            f"    sum(job wall) {total_job_ms/1000:.1f}s; "
            f"driver/gap {wall - total_job_ms/1000:.1f}s"
        )
        for r in sorted(rows, key=lambda r: -r["wall_ms"])[:25]:
            print(
                f"    {r['wall_ms']:7d} ms  tasks={r['tasks']:4d} "
                f"cpu={r['cpu_ms']:6d} ms  {r['callsite'][:60]}"
            )
    spark.stop()
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Deterministic work-metrics probe for one registry query.

Runs ONE noop-sink execution of each named query in a fresh session
with the Spark event log enabled, then parses the log and reports
metrics that do not depend on wall-clock noise: job/stage/task counts,
bytes read from storage, shuffle read/write bytes, and executor
run/CPU time. This is the before/after evidence channel for the
optimization round on a host with heavy CPU steal (wall seconds swing
20x on identical code; bytes and task counts cannot).

Usage: python scripts/joblog_probe.py <query> [query ...]
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
    files = [f for f in Path(log_dir).iterdir() if not f.name.startswith(".")]
    assert len(files) == 1, files
    entry = files[0]
    if entry.is_dir():
        # Spark 4 rolling event log: eventlog_v2_<app>/events_N_<app>
        evs = sorted(f for f in entry.iterdir() if f.name.startswith("events_"))
        assert evs, list(entry.iterdir())
        return evs[-1]
    return entry


def summarize(path: Path, offset: int) -> dict[str, int]:
    """Aggregate events appended after ``offset`` (the event log is one
    append-only file per application; per-query metrics are the delta
    between two offsets)."""
    agg = {
        "jobs": 0,
        "stages": 0,
        "tasks": 0,
        "input_bytes": 0,
        "shuffle_read_bytes": 0,
        "shuffle_write_bytes": 0,
        "executor_run_ms": 0,
        "executor_cpu_ms": 0,
    }
    with open(path) as fh:
        fh.seek(offset)
        for line in fh:
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            e = ev.get("Event")
            if e == "SparkListenerJobStart":
                agg["jobs"] += 1
            elif e == "SparkListenerStageCompleted":
                agg["stages"] += 1
            elif e == "SparkListenerTaskEnd":
                agg["tasks"] += 1
                m = ev.get("Task Metrics") or {}
                agg["executor_run_ms"] += m.get("Executor Run Time", 0)
                agg["executor_cpu_ms"] += (
                    m.get("Executor CPU Time", 0) // 1_000_000
                )
                agg["input_bytes"] += (m.get("Input Metrics") or {}).get(
                    "Bytes Read", 0
                )
                srm = m.get("Shuffle Read Metrics") or {}
                agg["shuffle_read_bytes"] += srm.get(
                    "Remote Bytes Read", 0
                ) + srm.get("Local Bytes Read", 0)
                agg["shuffle_write_bytes"] += (
                    m.get("Shuffle Write Metrics") or {}
                ).get("Shuffle Bytes Written", 0)
    return agg


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
        app_name="joblog-probe",
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": log_dir,
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        },
    )
    # touch the session once so the event-log file exists
    spark.range(1).write.format("noop").mode("overwrite").save()
    lf = _log_file(log_dir)
    out = {}
    for name in names:
        offset = lf.stat().st_size
        spark.sparkContext.setJobDescription(f"joblog:{name}")
        SPARK_QUERIES[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        out[name] = summarize(lf, offset)
        print(name, json.dumps(out[name]), file=sys.stderr)
    print(json.dumps({"sf_dir": SF_DIR, "metrics": out}))
    spark.stop()
    shutil.rmtree(log_dir, ignore_errors=True)


if __name__ == "__main__":
    main()

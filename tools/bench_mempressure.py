"""Memory-pressure / spill rehearsal: the memory analog of BENCH_SKEW.

The 100 TB operational claim under test: when partitions outgrow the
executor heap, the engine DEGRADES (sort-based aggregation fallback,
shuffle spill to disk, AQE re-plan) instead of DYING. BENCH.json runs
with a memory-sized heap; this tool re-runs the heaviest queries of the
corpus (the BENCH_SCALE battery) at sf0.1 under a deliberately small
driver heap — default 4g for a workload that normally enjoys ~48g —
and records per-query completion plus the actual spill counters
(memoryBytesSpilled / diskBytesSpilled) from Spark's event log.

Done = every query completes; the artifact names which operators
spilled and by how much. A query that needed zero spill under 4g is
also evidence (its working set was already partition-bounded).

Metrics plumbing: a Python SparkListener needs a py4j callback server;
instead the session writes a JSON event log (spark.eventLog), each
query runs inside its own job group, and the log is parsed after
spark.stop(): JobStart events map job-group -> stage ids, TaskEnd
events carry per-task 'Memory Bytes Spilled' / 'Disk Bytes Spilled'.

Usage: SPARK_GRAFT_DRIVER_MEM=4g python tools/bench_mempressure.py
           [--sf-dir /root/testdata/sf0.1] [--out BENCH_MEMPRESSURE.json]
Run SERIALLY (one JVM, timings embedded). The driver-mem override is
read by session.get_spark; the tool refuses to run with a heap >= 8g
so the artifact can't silently record an unpressured run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_scale import HEAVY  # noqa: E402

EVENTLOG_DIR = "/tmp/spark_graft_eventlog"


def _apps(log_dir: str) -> list[list[Path]]:
    """Event-log files grouped per application, oldest app first.

    Spark 4 writes an ``eventlog_v2_<appid>`` DIRECTORY of rolling
    ``events_N_*`` part files (plus an appstatus marker); older
    releases write a single flat file. A run that rebuilds its session
    after a dead SparkContext leaves MULTIPLE apps in log_dir — all are
    parsed (stage ids restart per app, so each app gets its own
    stage->group map; job-group names are globally unique here)."""
    apps = []
    for entry in sorted(Path(log_dir).glob("*"), key=lambda p: p.stat().st_mtime):
        if entry.is_dir():
            # sort by the NUMERIC rolling index, not lexicographically:
            # events_10_* must come after events_9_*, or TaskEnd events
            # can be scanned before the JobStart that maps their stage
            def _idx(p: Path) -> tuple:
                parts = p.name.split("_")
                try:
                    return (int(parts[1]), p.name)
                except (IndexError, ValueError):
                    return (1 << 30, p.name)
            apps.append(sorted(
                (p for p in entry.iterdir() if p.name.startswith("events_")),
                key=_idx,
            ))
        else:
            apps.append([entry])
    return apps


def _parse_eventlog(log_dir: str) -> dict[str, dict]:
    """Aggregate task metrics per job group across all apps in log_dir."""
    agg: dict[str, dict] = defaultdict(
        lambda: {"memoryBytesSpilled": 0, "diskBytesSpilled": 0,
                 "peakExecutionMemory": 0, "n_tasks": 0, "n_stages": 0}
    )
    for files in _apps(log_dir):
        stage_to_group: dict[int, str] = {}
        for path in files:
            with open(path) as fh:
                _scan_events(fh, stage_to_group, agg)
    return dict(agg)


def _scan_events(fh, stage_to_group, agg) -> None:
    for line in fh:
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerJobStart":
            group = (ev.get("Properties") or {}).get("spark.jobGroup.id")
            if not group:
                continue
            for sid in ev.get("Stage IDs", []):
                stage_to_group[sid] = group
        elif kind == "SparkListenerStageCompleted":
            sid = ev["Stage Info"]["Stage ID"]
            group = stage_to_group.get(sid)
            if group:
                agg[group]["n_stages"] += 1
        elif kind == "SparkListenerTaskEnd":
            group = stage_to_group.get(ev.get("Stage ID"))
            m = ev.get("Task Metrics") or {}
            if not group or not m:
                continue
            a = agg[group]
            a["memoryBytesSpilled"] += m.get("Memory Bytes Spilled", 0)
            a["diskBytesSpilled"] += m.get("Disk Bytes Spilled", 0)
            a["peakExecutionMemory"] = max(
                a["peakExecutionMemory"], m.get("Peak Execution Memory", 0)
            )
            a["n_tasks"] += 1


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parent.parent / "BENCH_MEMPRESSURE.json"))
    args = ap.parse_args()

    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "")
    gig = driver_mem.rstrip("gG")
    if not (gig.isdigit() and int(gig) < 8):
        sys.exit("set SPARK_GRAFT_DRIVER_MEM to a small heap (e.g. 4g) — "
                 "a big-heap run would record no memory pressure")

    import shutil

    shutil.rmtree(EVENTLOG_DIR, ignore_errors=True)
    os.makedirs(EVENTLOG_DIR, exist_ok=True)

    from etl_process_spark.queries import QUERIES
    from etl_process_spark.session import get_spark

    def fresh_session():
        return get_spark(
            "bench_mempressure",
            extra_conf={
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{EVENTLOG_DIR}",
                "spark.eventLog.compress": "false",
            },
        )

    spark = fresh_session()

    results: dict[str, dict] = {}
    def _context_dead(s) -> bool:
        # the probe itself raises (py4j connection error) if the JVM was
        # kernel-OOM-killed rather than the context stopped — any
        # exception means "dead, rebuild"
        try:
            return s.sparkContext._jsc.sc().isStopped()
        except Exception:  # noqa: BLE001
            return True

    for name in HEAVY:
        if _context_dead(spark):
            # a previous query OOM-killed the whole context (that IS
            # its recorded result) — rebuild so the rest of the battery
            # still runs; the parser merges event logs across apps
            spark.stop()
            spark = fresh_session()
        sc = spark.sparkContext
        # setLocalProperty, not setJobGroup/clearJobGroup: PySpark 4
        # removed SparkContext.clearJobGroup, and the property is what
        # JobStart events actually carry
        sc.setLocalProperty("spark.jobGroup.id", name)
        start = time.perf_counter()
        try:
            n = QUERIES[name].builder(spark, args.sf_dir).count()
            results[name] = {"completed": True, "rows": n,
                             "sec": round(time.perf_counter() - start, 2)}
        except Exception as exc:  # noqa: BLE001 — the artifact records OOMs
            results[name] = {
                "completed": False,
                "sec": round(time.perf_counter() - start, 2),
                "error": f"{type(exc).__name__}: {exc}"[:300],
            }
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)
        print(f"{name}: {results[name]}", flush=True)

    spark.stop()  # flush + close the event log before parsing
    metrics = _parse_eventlog(EVENTLOG_DIR)
    for name, res in results.items():
        m = metrics.get(name)
        if m:
            res.update(m)

    summary = {
        "driver_mem": driver_mem,
        "sf_dir": args.sf_dir,
        "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
        "n_queries": len(results),
        "n_completed": sum(1 for r in results.values() if r.get("completed")),
        "n_spilled": sum(
            1 for r in results.values()
            if r.get("memoryBytesSpilled", 0) + r.get("diskBytesSpilled", 0) > 0
        ),
        "note": ("spill counters summed over all tasks of the query's job "
                 "group; peakExecutionMemory is the max single-task peak. "
                 "completed=true under a ~10x-undersized heap is the "
                 "degrade-not-die claim, made measurable."),
        "queries": results,
    }
    Path(args.out).write_text(json.dumps(summary, indent=1) + "\n")
    print(f"wrote {args.out}: {summary['n_completed']}/{summary['n_queries']} "
          f"completed, {summary['n_spilled']} spilled")


if __name__ == "__main__":
    main()

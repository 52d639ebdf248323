"""Memory-pressure / spill rehearsal: the memory analog of BENCH_SKEW.

The 100 TB operational claim under test: when partitions outgrow the
executor heap, the engine DEGRADES (sort-based aggregation fallback,
shuffle spill to disk, AQE re-plan) instead of DYING. BENCH.json runs
with a memory-sized heap; this tool re-runs the heaviest queries of the
corpus (the BENCH_SCALE battery) under deliberate memory pressure, in
two complementary modes writing two SECTIONS of one artifact:

* **complete mode** (default): a ~10x-undersized heap (e.g. 4g) with
  the engine's own degrade-not-die session logic active (heap-scaled
  broadcast threshold, memory-proportional thread cap). Done = every
  query completes; the artifact names which operators spilled. This is
  the "survives an undersized executor" claim.
* **--spill mode**: the thread cap is deliberately BYPASSED (master
  pinned to local[32]) and ``spark.memory.fraction`` shrunk (default
  0.10), so 32 concurrent tasks share a ~0.5GB execution pool and the
  sort/agg-heavy queries are FORCED through their spill paths — and
  every result must be hash-identical to an unpressured baseline run
  in the same process. This is the "spilled data is the SAME data"
  claim: completion alone (complete mode relieved pressure so well
  that only 1/10 queries spilled) proves survival, not spill-path
  correctness.

Metrics plumbing: a Python SparkListener needs a py4j callback server;
instead the session writes a JSON event log (spark.eventLog), each
query runs inside its own job group, and the log is parsed after
spark.stop(): JobStart events map job-group -> stage ids, TaskEnd
events carry per-task 'Memory Bytes Spilled' / 'Disk Bytes Spilled'.

Usage: SPARK_GRAFT_DRIVER_MEM=4g python tools/bench_mempressure.py
           [--sf-dir DIR] [--out BENCH_MEMPRESSURE.json]
       SPARK_GRAFT_DRIVER_MEM=6g python tools/bench_mempressure.py \
           --spill [--memory-fraction 0.10] [--sf-dir DIR]
Run SERIALLY (one JVM, timings embedded). The driver-mem override is
read by session.get_spark; each mode refuses to run with a heap big
enough to make its artifact an unpressured no-op.
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


def _context_dead(s) -> bool:
    # the probe itself raises (py4j connection error) if the JVM was
    # kernel-OOM-killed rather than the context stopped — any
    # exception means "dead, rebuild"
    try:
        return s.sparkContext._jsc.sc().isStopped()
    except Exception:  # noqa: BLE001
        return True


def _run_battery(spark_factory, sf_dir: str, hash_results: bool):
    """Run HEAVY under the given session factory; returns (results,
    last_session). Each query gets its own job group for the event-log
    parser; with hash_results the canonical row-set hash is recorded."""
    from etl_process_spark.queries import QUERIES
    from tools.retry_determinism import _result_hash

    spark = spark_factory()
    results: dict[str, dict] = {}
    for name in HEAVY:
        if _context_dead(spark):
            # a previous query OOM-killed the whole context (that IS
            # its recorded result) — rebuild so the rest of the battery
            # still runs; the parser merges event logs across apps
            try:
                spark.stop()
            except Exception:  # noqa: BLE001
                pass
            spark = spark_factory()
        sc = spark.sparkContext
        # setLocalProperty, not setJobGroup/clearJobGroup: PySpark 4
        # removed SparkContext.clearJobGroup, and the property is what
        # JobStart events actually carry
        sc.setLocalProperty("spark.jobGroup.id", name)
        start = time.perf_counter()
        try:
            if hash_results:
                h, n = _result_hash(spark, sf_dir, name)
                results[name] = {"completed": True, "rows": n, "hash": h,
                                 "sec": round(time.perf_counter() - start, 2)}
            else:
                n = QUERIES[name].builder(spark, sf_dir).count()
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
    return results, spark


def _merge_artifact(out_path: Path, section: str, payload: dict) -> None:
    """Write `section` into the two-section artifact, preserving the
    other section (and migrating the pre-v2 flat schema)."""
    doc: dict = {}
    if out_path.exists():
        try:
            doc = json.loads(out_path.read_text())
        except Exception:  # noqa: BLE001
            doc = {}
        if "queries" in doc:  # pre-v2 flat schema = complete mode
            doc = {"complete_under_pressure": doc}
    doc[section] = payload
    out_path.write_text(json.dumps(doc, indent=1) + "\n")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parent.parent / "BENCH_MEMPRESSURE.json"))
    ap.add_argument("--spill", action="store_true",
                    help="force spills at full parallelism and assert "
                         "hash equality with an unpressured baseline")
    ap.add_argument("--memory-fraction", default="0.10",
                    help="spark.memory.fraction for --spill mode")
    args = ap.parse_args()

    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "")
    gig = driver_mem.rstrip("gG")
    cap = 16 if args.spill else 8
    if not (gig.isdigit() and int(gig) < cap):
        sys.exit(f"set SPARK_GRAFT_DRIVER_MEM to a small heap (< {cap}g) — "
                 "a big-heap run would record no memory pressure")

    import shutil

    shutil.rmtree(EVENTLOG_DIR, ignore_errors=True)
    os.makedirs(EVENTLOG_DIR, exist_ok=True)

    from etl_process_spark.session import get_spark

    out_path = Path(args.out)

    if not args.spill:
        def fresh_session():
            return get_spark(
                "bench_mempressure",
                extra_conf={
                    "spark.eventLog.enabled": "true",
                    "spark.eventLog.dir": f"file://{EVENTLOG_DIR}",
                    "spark.eventLog.compress": "false",
                },
            )

        results, spark = _run_battery(fresh_session, args.sf_dir, False)
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
            "n_completed": sum(
                1 for r in results.values() if r.get("completed")),
            "n_spilled": sum(
                1 for r in results.values()
                if r.get("memoryBytesSpilled", 0)
                + r.get("diskBytesSpilled", 0) > 0
            ),
            "note": ("spill counters summed over all tasks of the query's "
                     "job group; peakExecutionMemory is the max single-task "
                     "peak. completed=true under a ~10x-undersized heap is "
                     "the degrade-not-die claim, made measurable."),
            "queries": results,
        }
        _merge_artifact(out_path, "complete_under_pressure", summary)
        print(f"wrote {out_path}: {summary['n_completed']}/"
              f"{summary['n_queries']} completed, "
              f"{summary['n_spilled']} spilled")
        return

    # ---- spill mode: baseline hashes at full memory, then a forced-
    # spill run at full parallelism, hash-compared per query ----
    def baseline_session():
        # machine-sized heap, engine defaults: the unpressured truth
        prev = os.environ.pop("SPARK_GRAFT_DRIVER_MEM")
        try:
            return get_spark("bench_mempressure_baseline")
        finally:
            os.environ["SPARK_GRAFT_DRIVER_MEM"] = prev

    print("== baseline (unpressured) hashes ==", flush=True)
    baseline, spark = _run_battery(baseline_session, args.sf_dir, True)
    spark.stop()

    def spill_session():
        # master pinned to local[32]: get_spark's memory-proportional
        # thread cap would shrink concurrency and relieve the very
        # pressure this mode exists to create. Two pressure sources
        # compose:
        # * a shrunken spark.memory.fraction squeezes the unified
        #   execution pool (object headroom stays outside it, so tasks
        #   spill instead of the JVM dying);
        # * element-count force-spill thresholds make every external
        #   sorter / aggregation map / SMJ+window buffer take its REAL
        #   spill-and-merge path after 3k rows regardless of pool
        #   headroom. This matters because the battery's working sets
        #   are partition-bounded BY DESIGN — at the 10x corpus most
        #   queries fit a 7MB/task pool without spilling (measured:
        #   fraction 0.04 produced 1 spill and 1 OOM death, pure
        #   squeeze cannot separate 'never needs to spill here' from
        #   'spill path works') — while at 100TB the same operators
        #   WILL spill, so the spill path itself is what needs the
        #   correctness proof.
        return get_spark(
            "bench_mempressure_spill",
            master="local[32]",
            extra_conf={
                "spark.memory.fraction": args.memory_fraction,
                "spark.shuffle.spill.numElementsForceSpillThreshold": "3000",
                "spark.sql.sortMergeJoinExec.buffer.spill.threshold": "3000",
                "spark.sql.windowExec.buffer.spill.threshold": "3000",
                "spark.sql.cartesianProductExec.buffer.spill.threshold":
                    "3000",
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{EVENTLOG_DIR}",
                "spark.eventLog.compress": "false",
            },
        )

    print("== pressured (forced-spill) run ==", flush=True)
    results, spark = _run_battery(spill_session, args.sf_dir, True)
    spark.stop()
    metrics = _parse_eventlog(EVENTLOG_DIR)
    for name, res in results.items():
        m = metrics.get(name)
        if m:
            res.update(m)
        b = baseline.get(name, {})
        res["hash_baseline"] = b.get("hash")
        res["hash_match"] = (
            res.get("completed", False) and b.get("completed", False)
            and res.get("hash") == b.get("hash")
        )

    summary = {
        "driver_mem": driver_mem,
        "memory_fraction": args.memory_fraction,
        "master": "local[32] (thread cap bypassed by design)",
        "sf_dir": args.sf_dir,
        "n_queries": len(results),
        "n_completed": sum(1 for r in results.values() if r.get("completed")),
        "n_spilled": sum(
            1 for r in results.values()
            if r.get("memoryBytesSpilled", 0) + r.get("diskBytesSpilled", 0) > 0
        ),
        "n_hash_match": sum(1 for r in results.values() if r.get("hash_match")),
        "note": ("forced-spill correctness: 32 concurrent tasks share a "
                 "memory.fraction-shrunken execution pool, so sort/agg/"
                 "join operators MUST take their spill paths, and every "
                 "canonical row-set hash must equal the unpressured "
                 "baseline's — 'the spilled data is the same data'."),
        "queries": results,
    }
    _merge_artifact(out_path, "spill_correctness", summary)
    print(f"wrote {out_path} [spill_correctness]: "
          f"{summary['n_completed']}/{summary['n_queries']} completed, "
          f"{summary['n_spilled']} spilled, "
          f"{summary['n_hash_match']} hash-identical")


if __name__ == "__main__":
    main()

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
  pinned to local[32]), ``spark.memory.fraction`` shrunk (default
  0.10), and 3000-element force-spill thresholds installed, so the
  sort/agg-heavy queries are FORCED through their spill paths — and
  every result must be hash-identical to an unpressured baseline run.
  This is the "spilled data is the SAME data" claim: completion alone
  (complete mode relieved pressure so well that only 1/10 queries
  spilled) proves survival, not spill-path correctness. The spill
  child runs at the MACHINE-SIZED heap on purpose: surviving a tiny
  heap is complete mode's claim (with the engine's thread cap doing
  its job); here 32 cap-bypassed tasks need object headroom to stay
  alive long enough to exercise the spill-and-merge path (measured: a
  real 12g heap at 32 threads dies task-OOM on label-propagation before
  spilling), and the artifact records Runtime.maxMemory() so the
  conditions are stated, not implied.

v3 (per round-9 ADVICE): each battery runs in its OWN SUBPROCESS.
``spark.driver.memory`` only takes effect at the first JVM launch in a
process, so the v2 layout — baseline first, spill second, one process —
silently gave the spill session the baseline's machine-sized heap; the
<16g guard and the recorded driver_mem described a run that never
happened. Now the spill child is its own process with its own small
JVM, and every battery records the heap it ACTUALLY ran with
(Runtime.getRuntime().maxMemory()) instead of echoing an env var.

v3 also chases the spill HOLDOUTS: queries whose per-task working
sets stay under even the 3000-element force-spill thresholds at the
rehearsal corpus (the 10x replica) are re-run at the 100x big corpus
(500k docs / 60M-row lineitem — every HEAVY query reads only tables
that corpus carries), where the same operators' working sets outgrow
the squeezed pool — each holdout either spills there (with the same
hash-equality gate) or is recorded with its measured peak task memory
as genuinely unable to spill at any rehearsal corpus.

Metrics plumbing: a Python SparkListener needs a py4j callback server;
instead each battery writes a JSON event log (spark.eventLog), each
query runs inside its own job group, and the child parses the log
after spark.stop(): JobStart events map job-group -> stage ids,
TaskEnd events carry per-task 'Memory Bytes Spilled' / 'Disk Bytes
Spilled'.

Usage: SPARK_GRAFT_DRIVER_MEM=4g python tools/bench_mempressure.py
           [--sf-dir DIR] [--out BENCH_MEMPRESSURE.json]
       python tools/bench_mempressure.py \
           --spill [--memory-fraction 0.10] [--sf-dir DIR]
Default --sf-dir is the 10x replica (build with tools/bench_scale.py);
the holdout chase needs the 100x corpus (tools/bench_scale.py --big
100 or tools/run_differential_100x.py builds it).
Run SERIALLY (timings embedded; batteries are sequential subprocesses).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tools.bench_scale import BIG_DIR, HEAVY, OUT_DIR as SCALE10_DIR  # noqa: E402

EVENTLOG_BASE = "/tmp/spark_graft_eventlog"


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


def _jvm_max_heap(s) -> int | None:
    try:
        return int(s.sparkContext._jvm.java.lang.Runtime.getRuntime()
                   .maxMemory())
    except Exception:  # noqa: BLE001
        return None


def _run_battery(spark_factory, sf_dir: str, hash_results: bool, names):
    """Run `names` under the given session factory; returns (results,
    jvm_max_heap, last_session). Each query gets its own job group for
    the event-log parser; with hash_results the canonical row-set hash
    is recorded."""
    from etl_process_spark.queries import QUERIES
    from tools.retry_determinism import _result_hash

    spark = spark_factory()
    heap = _jvm_max_heap(spark)
    results: dict[str, dict] = {}
    for name in names:
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
    return results, heap, spark


def _merge_artifact(out_path: Path, section: str, payload: dict) -> None:
    """Write `section` into the multi-section artifact, preserving the
    other sections (and migrating the pre-v2 flat schema)."""
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


# ---------------------------------------------------------------------
# child process: one battery, one JVM, one event log
# ---------------------------------------------------------------------

def _battery_child(args) -> None:
    eventlog_dir = args.eventlog_dir
    shutil.rmtree(eventlog_dir, ignore_errors=True)
    os.makedirs(eventlog_dir, exist_ok=True)

    from etl_process_spark.session import get_spark

    base_conf = {
        "spark.eventLog.enabled": "true",
        "spark.eventLog.dir": f"file://{eventlog_dir}",
        "spark.eventLog.compress": "false",
    }

    if args.session == "spill":
        def factory():
            # master pinned to local[32]: get_spark's memory-
            # proportional thread cap would shrink concurrency and
            # relieve the very pressure this mode exists to create.
            # Two pressure sources compose:
            # * a shrunken spark.memory.fraction squeezes the unified
            #   execution pool (object headroom stays outside it, so
            #   tasks spill instead of the JVM dying);
            # * element-count force-spill thresholds make every
            #   external sorter / aggregation map / SMJ+window buffer
            #   take its REAL spill-and-merge path after 3k rows
            #   regardless of pool headroom — partition-bounded working
            #   sets at the rehearsal corpus often fit the pool, while
            #   at 100TB the same operators WILL spill, so the spill
            #   path itself is what needs the correctness proof.
            return get_spark(
                "bench_mempressure_spill",
                master="local[32]",
                extra_conf={
                    **base_conf,
                    "spark.memory.fraction": args.memory_fraction,
                    "spark.shuffle.spill.numElementsForceSpillThreshold":
                        "3000",
                    "spark.sql.sortMergeJoinExec.buffer.spill.threshold":
                        "3000",
                    "spark.sql.windowExec.buffer.spill.threshold": "3000",
                    "spark.sql.cartesianProductExec.buffer.spill.threshold":
                        "3000",
                    # Tungsten hash aggregation ignores the sorter
                    # thresholds above — this (Spark's own test hook
                    # for exactly this purpose) forces HashAggregate to
                    # its sort-based fallback after 3k groups, so
                    # aggregation-shaped working sets (the BPE pair
                    # counts) exercise their spill-and-merge path too
                    "spark.sql.TungstenAggregate.testFallbackStartsAt":
                        "3000,3000",
                },
            )
    elif args.session == "baseline":
        def factory():
            # machine-sized heap, engine defaults: the unpressured truth
            return get_spark("bench_mempressure_baseline",
                             extra_conf=base_conf)
    else:  # complete
        def factory():
            return get_spark("bench_mempressure", extra_conf=base_conf)

    names = args.queries.split(",") if args.queries else list(HEAVY)
    results, heap, spark = _run_battery(
        factory, args.sf_dir, args.hash_results, names)
    if heap is None:
        heap = _jvm_max_heap(spark)
    try:
        spark.stop()  # flush + close the event log before parsing
    except Exception:  # noqa: BLE001
        pass
    metrics = _parse_eventlog(eventlog_dir)
    for name, res in results.items():
        m = metrics.get(name)
        if m:
            res.update(m)
    payload = {
        "results": results,
        "jvm_max_heap_bytes": heap,
        "driver_mem_env": os.environ.get("SPARK_GRAFT_DRIVER_MEM", ""),
        "session": args.session,
        "sf_dir": args.sf_dir,
    }
    Path(args.result_file).write_text(json.dumps(payload))


def _run_child(session: str, sf_dir: str, hash_results: bool,
               queries: list[str] | None, driver_mem: str | None,
               memory_fraction: str) -> dict:
    """Launch one battery in a fresh subprocess (its own JVM, so
    spark.driver.memory actually applies) and return its payload."""
    env = dict(os.environ)
    if driver_mem is None:
        env.pop("SPARK_GRAFT_DRIVER_MEM", None)
    else:
        env["SPARK_GRAFT_DRIVER_MEM"] = driver_mem
    with tempfile.NamedTemporaryFile("r", suffix=".json",
                                     delete=False) as fh:
        result_file = fh.name
    eventlog_dir = f"{EVENTLOG_BASE}_{session}_{os.getpid()}"
    cmd = [sys.executable, os.path.abspath(__file__),
           "--battery", session,
           "--sf-dir", sf_dir,
           "--result-file", result_file,
           "--eventlog-dir", eventlog_dir,
           "--memory-fraction", memory_fraction]
    if hash_results:
        cmd.append("--hash-results")
    if queries:
        cmd += ["--queries", ",".join(queries)]
    print(f"== battery {session} @ {sf_dir} "
          f"(driver_mem={driver_mem or '<machine-sized>'}"
          f"{', queries=' + ','.join(queries) if queries else ''}) ==",
          flush=True)
    proc = subprocess.run(cmd, env=env)
    if proc.returncode != 0:
        raise RuntimeError(f"battery {session} exited {proc.returncode}")
    payload = json.loads(Path(result_file).read_text())
    os.unlink(result_file)
    return payload


def _spilled(res: dict) -> bool:
    return (res.get("memoryBytesSpilled", 0)
            + res.get("diskBytesSpilled", 0)) > 0


def _hash_compare(pressured: dict, baseline: dict) -> None:
    for name, res in pressured.items():
        b = baseline.get(name, {})
        res["hash_baseline"] = b.get("hash")
        res["hash_match"] = (
            res.get("completed", False) and b.get("completed", False)
            and res.get("hash") == b.get("hash")
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=SCALE10_DIR)
    ap.add_argument("--out", default=str(
        Path(__file__).resolve().parent.parent / "BENCH_MEMPRESSURE.json"))
    ap.add_argument("--spill", action="store_true",
                    help="force spills at full parallelism and assert "
                         "hash equality with an unpressured baseline")
    ap.add_argument("--memory-fraction", default="0.10",
                    help="spark.memory.fraction for --spill mode")
    ap.add_argument("--holdout-fraction", default="0.20",
                    help="spark.memory.fraction for the 100x holdout "
                         "chase: the 100x working sets need a pool above "
                         "their unspillable per-task floor (BFS at 60M "
                         "rows dies mid-spill at 0.10) — the 3000-element "
                         "thresholds stay the spill-forcing mechanism")
    # internal (subprocess battery) flags
    ap.add_argument("--battery", choices=["complete", "baseline", "spill"],
                    help=argparse.SUPPRESS)
    ap.add_argument("--result-file", help=argparse.SUPPRESS)
    ap.add_argument("--eventlog-dir", dest="eventlog_dir",
                    help=argparse.SUPPRESS)
    ap.add_argument("--hash-results", dest="hash_results",
                    action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--queries", help=argparse.SUPPRESS)
    args = ap.parse_args()

    if args.battery:
        args.session = args.battery
        _battery_child(args)
        return

    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "")
    if not args.spill:
        gig = driver_mem.rstrip("gG")
        if not (gig.isdigit() and int(gig) < 8):
            sys.exit("set SPARK_GRAFT_DRIVER_MEM to a small heap (< 8g) — "
                     "a big-heap run would record no memory pressure")

    out_path = Path(args.out)

    if not args.spill:
        payload = _run_child("complete", args.sf_dir, False, None,
                             driver_mem, args.memory_fraction)
        results = payload["results"]
        summary = {
            "driver_mem": driver_mem,
            "jvm_max_heap_bytes": payload["jvm_max_heap_bytes"],
            "sf_dir": args.sf_dir,
            "cpus": os.environ.get("SPARK_GRAFT_CPUS", "32"),
            "n_queries": len(results),
            "n_completed": sum(
                1 for r in results.values() if r.get("completed")),
            "n_spilled": sum(1 for r in results.values() if _spilled(r)),
            "note": ("spill counters summed over all tasks of the query's "
                     "job group; peakExecutionMemory is the max single-task "
                     "peak. completed=true under a ~10x-undersized heap is "
                     "the degrade-not-die claim, made measurable. "
                     "jvm_max_heap_bytes is Runtime.maxMemory() of the "
                     "battery's own subprocess JVM — the heap the run "
                     "ACTUALLY had."),
            "queries": results,
        }
        _merge_artifact(out_path, "complete_under_pressure", summary)
        print(f"wrote {out_path}: {summary['n_completed']}/"
              f"{summary['n_queries']} completed, "
              f"{summary['n_spilled']} spilled")
        return

    # ---- spill mode: pressured and baseline batteries in SEPARATE
    # subprocesses (own JVMs -> the heaps recorded are the heaps used),
    # hash-compared per query; holdouts chased at the 10x corpus ----
    # machine-sized heap for the spill child (None pops the env var):
    # pressure comes from the shrunken fraction + force thresholds,
    # recorded heap comes from the JVM itself
    spill = _run_child("spill", args.sf_dir, True, None,
                       None, args.memory_fraction)
    base = _run_child("baseline", args.sf_dir, True, None,
                      None, args.memory_fraction)
    results = spill["results"]
    _hash_compare(results, base["results"])

    holdouts = sorted(
        n for n, r in results.items() if r.get("completed") and not _spilled(r)
    )
    holdout_section = None
    big_ready = (Path(BIG_DIR) / ".complete_100x_v2").exists()
    if holdouts and big_ready:
        h_spill = _run_child("spill", BIG_DIR, True, holdouts,
                             None, args.holdout_fraction)
        h_base = _run_child("baseline", BIG_DIR, True, holdouts,
                            None, args.holdout_fraction)
        h_results = h_spill["results"]
        _hash_compare(h_results, h_base["results"])
        holdout_section = {
            "sf_dir": BIG_DIR,
            "memory_fraction": args.holdout_fraction,
            "jvm_max_heap_bytes": h_spill["jvm_max_heap_bytes"],
            "baseline_jvm_max_heap_bytes": h_base["jvm_max_heap_bytes"],
            "n_queries": len(h_results),
            "n_spilled": sum(1 for r in h_results.values() if _spilled(r)),
            "n_hash_match": sum(
                1 for r in h_results.values() if r.get("hash_match")),
            "note": ("rehearsal-corpus non-spillers re-run at the 100x "
                     "big corpus where per-task working sets outgrow the "
                     "squeezed pool / cross the 3000-element force-spill "
                     "thresholds; same hash-equality gate. A query still "
                     "not spilling here records its peak task memory as "
                     "the genuinely-too-small working set."),
            "queries": h_results,
        }
    elif holdouts:
        holdout_section = {
            "skipped": f"{BIG_DIR} not built; run tools/bench_scale.py "
                       "--big 100 (or tools/run_differential_100x.py) "
                       "first to chase holdouts at 100x",
            "holdouts": holdouts,
        }
    else:
        # explicit empty section: a stale chase from an earlier run must
        # not survive a rerun where every query spilled at the primary
        # tier
        holdout_section = {
            "holdouts": [],
            "note": ("no holdouts: every battery query spilled at the "
                     "primary tier (the Tungsten hash-agg fallback "
                     "threshold closed the aggregation-shaped gap)"),
        }

    summary = {
        "jvm_max_heap_bytes": spill["jvm_max_heap_bytes"],
        "baseline_jvm_max_heap_bytes": base["jvm_max_heap_bytes"],
        "memory_fraction": args.memory_fraction,
        "master": "local[32] (thread cap bypassed by design)",
        "sf_dir": args.sf_dir,
        "n_queries": len(results),
        "n_completed": sum(1 for r in results.values() if r.get("completed")),
        "n_spilled": sum(1 for r in results.values() if _spilled(r)),
        "n_hash_match": sum(1 for r in results.values() if r.get("hash_match")),
        "note": ("forced-spill correctness: 32 concurrent tasks share a "
                 "memory.fraction-shrunken execution pool, so sort/agg/"
                 "join operators MUST take their spill paths, and every "
                 "canonical row-set hash must equal the unpressured "
                 "baseline's — 'the spilled data is the same data'. "
                 "Batteries run in separate subprocesses so "
                 "jvm_max_heap_bytes is the heap each JVM actually got."),
        "queries": results,
    }
    _merge_artifact(out_path, "spill_correctness", summary)
    if holdout_section is not None:
        _merge_artifact(out_path, "spill_holdouts_100x", holdout_section)
    print(f"wrote {out_path} [spill_correctness]: "
          f"{summary['n_completed']}/{summary['n_queries']} completed, "
          f"{summary['n_spilled']} spilled, "
          f"{summary['n_hash_match']} hash-identical"
          + (f"; holdouts@100x: {holdout_section.get('n_spilled')}"
             f"/{holdout_section.get('n_queries')} spilled"
             if holdout_section and "queries" in holdout_section else ""))


if __name__ == "__main__":
    main()

"""Graceful-decommission determinism rehearsal (100 TB operational
claim #6 — after retries, speculation, forced spills, batch executor
loss, and streaming executor loss).

The executor-loss rehearsal SIGKILLs a worker — the crash path. At
1000 executors the far more COMMON event is the graceful one: spot /
preemptible instance reclaim, autoscaler scale-down, rolling restarts.
Spark's answer is executor decommissioning (SPARK-20624): the worker
receives SIGPWR, tells its executors to decommission, each executor
stops accepting new tasks, finishes its running ones, MIGRATES its
shuffle map outputs and cached RDD blocks to surviving executors
(``spark.storage.decommission.*``), and exits. Done right, the query
never notices: no FetchFailed, no stage resubmission, no recompute —
and crucially for this engine, even ``localCheckpoint``-truncated
lineage survives in-flight because the checkpoint BLOCKS themselves
migrate (under SIGKILL those queries need a job retry or
MEMORY_AND_DISK_2 replicas).

This tool stages that event for real and checks results bit-for-bit:

* **Topology**: the shared 2-host standalone minicluster, with
  ``-Dspark.decommission.enabled=true`` on the WORKER daemons — the
  SIGPWR handler is installed at worker startup only when that conf is
  set; without it SIGPWR keeps its default disposition and simply
  TERMINATES the worker JVM (measured: "worker lost: got
  disassociated" — a crash, not a drain).
* **A deterministic drain window**: the same final-stage file barrier
  as the executor-loss harness — the victim provably runs in-flight
  tasks and holds registered map output when SIGPWR arrives. Its
  tasks then FINISH on the decommissioning executor (decommission
  stops new task placement, not running tasks), its blocks migrate,
  and later stages read them from the survivor.
* **The gates**, per query: canonical hash equal to the healthy
  baseline; decommission proven from the worker log ("Decommission
  worker") and the victim executor's stderr ("Decommission executor",
  block-migration lines, "Finished decommissioning"); and — the
  graceful path's defining claim — ZERO FetchFailed task ends in the
  query's job group (a crash rehearsal EXPECTS FetchFailed; a drain
  rehearsal forbids it).

Usage: python tools/decommission_determinism.py [sf_dir] [out.json]
           [--quick]
Writes DECOMMISSION_DETERMINISM.json (--quick: 2-query smoke — one
plain-lineage query, one localCheckpoint query — no artifact unless an
out path is given); exits nonzero on any mismatch or vacuous run.
Run SERIALLY.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import signal
import sys
import threading
import time
import uuid
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.executorloss_determinism import (  # noqa: E402
    CHECKPOINT_QUERIES,
    _canon_hash,
    _parse_eventlog,
    _run_wrapped,
    _wait_executors,
)
from tools.minicluster import MiniCluster, WORKER_HOSTS  # noqa: E402
from tools.retry_determinism import JVM_QUERIES, PYTHON_FAMILIES  # noqa: E402

EVENTLOG_DIR = "/tmp/spark_graft_decom_eventlog"
BARRIER_ROOT = "/tmp/spark_graft_decom_barrier"
WORK_DIR = os.path.join(
    os.environ.get("SPARK_HOME", "/opt/spark"), "work")
MARKER_WAIT = 240.0

_ = _canon_hash  # re-exported for the smoke test's convenience


def _sigpwr_during_final_stage(cluster: MiniCluster, token_dir: str) -> dict:
    """Wait for barrier markers, SIGPWR a worker that is RUNNING a
    barrier task (graceful drain — the worker process itself, NOT the
    process group, and NOT SIGKILL), then release the barrier."""
    deadline = time.time() + MARKER_WAIT
    victim = None
    while time.time() < deadline:
        hosts = {os.path.basename(m).rsplit("_", 1)[1]
                 for m in glob.glob(os.path.join(token_dir, "task_*"))}
        candidates = [i for i, h in enumerate(WORKER_HOSTS) if h in hosts]
        if candidates:
            victim = candidates[0]
            break
        time.sleep(0.1)
    info = {"victim_worker": victim,
            "victim_host": WORKER_HOSTS[victim] if victim is not None else None}
    if victim is not None and cluster.workers[victim] is not None:
        os.kill(cluster.workers[victim].pid, signal.SIGPWR)
        info["signaled"] = True
    os.makedirs(token_dir, exist_ok=True)
    open(os.path.join(token_dir, "go"), "w").close()
    return info


def _barrier_identity(token_dir: str):
    from tools.executorloss_determinism import _barrier_identity as _bi

    return _bi(token_dir)


def _decom_evidence(app_id: str, seen: set[str]) -> dict:
    """Scan the standalone work dir for NEW executor dirs whose stderr
    carries decommission lines; returns migration evidence and marks
    the dirs seen."""
    out = {"executors": [], "migrated_lines": 0, "finished": 0,
           "shuffles_on_victim": None}
    for exec_dir in sorted(glob.glob(os.path.join(WORK_DIR, app_id, "*"))):
        if exec_dir in seen:
            continue
        stderr = os.path.join(exec_dir, "stderr")
        try:
            text = Path(stderr).read_text(errors="replace")
        except OSError:
            continue
        if "Decommission executor" not in text:
            continue
        seen.add(exec_dir)
        out["executors"].append(os.path.basename(exec_dir))
        out["migrated_lines"] += len(re.findall(r"Migrated \S+", text))
        out["finished"] += text.count("Finished decommissioning")
        m = re.search(r"In total, (\d+) shuffles are remained", text)
        if m:
            out["shuffles_on_victim"] = int(m.group(1))
    return out


def _injected_once(spark, cluster, sf_dir, name, base_hash,
                   job_group, seen_execs: set[str]) -> dict:
    token_dir = os.path.join(BARRIER_ROOT, uuid.uuid4().hex)
    sc = spark.sparkContext
    holder: dict = {}

    def target():
        sc.setLocalProperty("spark.jobGroup.id", job_group)
        try:
            holder["hash"], holder["rows"] = _run_wrapped(
                spark, sf_dir, name, token_dir)
        except Exception as exc:  # noqa: BLE001 — recorded below
            holder["error"] = f"{type(exc).__name__}: {exc}"[:400]
        finally:
            sc.setLocalProperty("spark.jobGroup.id", None)

    t = threading.Thread(target=target, daemon=True)
    t.start()
    drain = _sigpwr_during_final_stage(cluster, token_dir)
    t.join(timeout=900)
    res: dict = {"drain": drain}
    if t.is_alive():
        res["error"] = "injected run did not finish within 900s"
        return res
    # give the drained executor a moment to write its migration lines
    time.sleep(3)
    res["evidence"] = _decom_evidence(
        spark.sparkContext.applicationId, seen_execs)
    if "error" in holder:
        res["error"] = holder["error"]
        return res
    res["hash_injected"] = holder["hash"]
    res["rows_injected"] = holder["rows"]
    res["hash_match"] = holder["hash"] == base_hash
    return res


def main() -> None:  # noqa: C901 — linear rehearsal script
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    quick = "--quick" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    out_path = (
        Path(argv[1]) if len(argv) > 1
        else (None if quick else REPO / "DECOMMISSION_DETERMINISM.json")
    )

    existing = os.environ.get("PYTHONPATH", "")
    if str(REPO) not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = str(REPO) + (
            os.pathsep + existing if existing else "")
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)
    os.environ.pop("SPARK_GRAFT_CHECKPOINT_REPLICAS", None)

    shutil.rmtree(EVENTLOG_DIR, ignore_errors=True)
    os.makedirs(EVENTLOG_DIR, exist_ok=True)
    shutil.rmtree(BARRIER_ROOT, ignore_errors=True)

    from etl_process_spark.session import get_spark

    suite = PYTHON_FAMILIES + JVM_QUERIES
    if quick:
        suite = ["heavy_hitter_order_groups", "part_bfs_reach"]

    results: dict[str, dict] = {}
    seen_execs: set[str] = set()
    cluster = MiniCluster(
        tag="decom",
        worker_java_opts=("-Dspark.decommission.enabled=true",))
    cluster.__enter__()
    try:
        spark = get_spark(
            "decommission_determinism",
            master=cluster.master_url,
            extra_conf={
                "spark.driver.host": "127.0.0.1",
                "spark.executor.memory": "2g",
                "spark.executor.cores": "4",
                "spark.cores.max": "8",
                "spark.sql.shuffle.partitions": "8",
                "spark.locality.wait": "0s",
                "spark.decommission.enabled": "true",
                "spark.storage.decommission.enabled": "true",
                "spark.storage.decommission.rddBlocks.enabled": "true",
                "spark.storage.decommission.shuffleBlocks.enabled": "true",
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{EVENTLOG_DIR}",
                "spark.eventLog.compress": "false",
            },
        )
        sc = spark.sparkContext

        for name in suite:
            # heal the cluster: the previous victim's worker is
            # decommissioned (master will not place executors there) —
            # replace it with a fresh daemon
            for i, p in enumerate(cluster.workers):
                if p is None or p.poll() is not None:
                    cluster.restart_worker(i)
            if not _wait_executors(spark, 2):
                results[name] = {"ok": False,
                                 "error": "cluster did not heal to 2 executors"}
                continue

            sc.setLocalProperty("spark.jobGroup.id", f"base::{name}")
            try:
                base_hash, base_rows = _run_wrapped(spark, sf_dir, name, None)
            except Exception as exc:  # noqa: BLE001
                results[name] = {
                    "ok": False,
                    "error": f"baseline: {type(exc).__name__}: {exc}"[:300]}
                continue
            finally:
                sc.setLocalProperty("spark.jobGroup.id", None)

            res: dict = {"rows": base_rows, "hash": base_hash,
                         "uses_local_checkpoint": name in CHECKPOINT_QUERIES}
            inj = _injected_once(spark, cluster, sf_dir, name, base_hash,
                                 f"decom::{name}", seen_execs)
            res["injected"] = inj
            res["ok"] = bool(
                inj.get("hash_match")
                and inj["drain"].get("signaled")
                and inj.get("evidence", {}).get("executors"))
            # the drained worker is now decommissioned: replace it so
            # the next query starts from a healthy 2-worker cluster
            victim = inj["drain"].get("victim_worker")
            if victim is not None:
                cluster.restart_worker(victim)

            results[name] = res
            print(json.dumps({
                "query": name, "ok": res["ok"],
                "drain": inj.get("drain"),
                "evidence": inj.get("evidence"),
                "error": inj.get("error"),
            }), flush=True)

        from tools.family_census import query_families

        for name, fam in query_families(spark, sf_dir, suite).items():
            if name in results:
                results[name]["family"] = fam

        spark.stop()  # flush event log
    finally:
        cluster.__exit__(None, None, None)

    # the graceful path's defining claim: ZERO FetchFailed — migrated
    # blocks serve every fetch; a drain that triggers FetchFailed
    # degraded into the crash path and fails the gate
    ev = _parse_eventlog(EVENTLOG_DIR)
    for name, res in results.items():
        m = ev.get(f"decom::{name}")
        if m:
            res["eventlog"] = m
            if m.get("fetch_failed", 0) > 0:
                res["ok"] = False
                res["degraded_to_crash_path"] = True

    summary = {
        "n_queries": len(results),
        "n_ok": sum(1 for r in results.values() if r.get("ok")),
        "n_fetch_failed_total": sum(
            (r.get("eventlog") or {}).get("fetch_failed", 0)
            for r in results.values()),
        "sf_dir": sf_dir,
        "mode": "quick" if quick else "suite",
        "topology": ("standalone master + 2 workers on distinct loopback "
                     "hostnames, workers launched with "
                     "spark.decommission.enabled=true; victim worker sent "
                     "SIGPWR (graceful drain) mid-final-stage, its "
                     "executor migrates shuffle + cached RDD blocks and "
                     "exits"),
        "note": ("ok requires hash equality with the healthy baseline, "
                 "proof the victim was draining in-flight work "
                 "(barrier markers + 'Decommission executor' in its "
                 "stderr), AND zero FetchFailed in the query's job "
                 "group — the graceful path must not degrade into the "
                 "crash path's recompute. localCheckpoint queries are "
                 "expected to survive IN-FLIGHT here (their checkpoint "
                 "blocks migrate), unlike under SIGKILL where they "
                 "need a job retry or MEMORY_AND_DISK_2 replicas."),
        "results": results,
    }
    print(json.dumps(summary))
    if out_path is not None:
        out_path.write_text(json.dumps(summary, indent=1) + "\n")
        print(f"wrote {out_path}: {summary['n_ok']}/{summary['n_queries']} ok",
              file=sys.stderr)
    if summary["n_ok"] != summary["n_queries"]:
        sys.exit(1)


if __name__ == "__main__":
    main()

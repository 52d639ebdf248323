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
           [--quick | --tier10x]
Writes DECOMMISSION_DETERMINISM.json (--quick: 2-query smoke — one
plain-lineage query, one localCheckpoint query — no artifact unless an
out path is given); exits nonzero on any mismatch or vacuous run.
Run SERIALLY.

--tier10x: drain rehearsal for the 4 heaviest suite queries against
the decorrelated 10x replica (see executorloss_determinism --tier10x),
8g executors / 32 shuffle partitions; results merge into the artifact
under ``tier_10x`` with the same zero-FetchFailed + migration gates.
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
    TIER10X_CONF,
    TIER10X_QUERIES,
    TIER10X_SF_DIR,
    _canon_hash,
    _parse_eventlog,
    _run_wrapped,
    _wait_executors,
    merge_tier_leg,
)
from tools.minicluster import MiniCluster, WORKER_HOSTS  # noqa: E402
from tools.retry_determinism import JVM_QUERIES, PYTHON_FAMILIES  # noqa: E402

EVENTLOG_DIR = "/tmp/spark_graft_decom_eventlog"
BARRIER_ROOT = "/tmp/spark_graft_decom_barrier"
def _work_dir() -> str:
    """Worker work dir under the SAME spark home the daemons run from.

    MiniCluster launches workers via pyspark.find_spark_home, so evidence
    (executor stderr, migration logs) lands under that home's work/ —
    resolving from $SPARK_HOME with a hardcoded fallback read the wrong
    tree on pip-installed pyspark where SPARK_HOME is unset.
    """
    from pyspark.find_spark_home import _find_spark_home

    return os.path.join(_find_spark_home(), "work")


WORK_DIR = _work_dir()
MARKER_WAIT = 240.0
JOIN_TIMEOUT = 900.0

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
    t.join(timeout=JOIN_TIMEOUT)
    res: dict = {"drain": drain}
    if t.is_alive():
        res["error"] = f"injected run did not finish within {JOIN_TIMEOUT:.0f}s"
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


# ---------------------------------------------------------------------------
# Fallback-storage leg (--fallback): the scale-down-to-zero corner.
#
# The suite leg proves migration when a SURVIVING executor has room. The
# remaining unexercised recovery corner is an autoscaler draining the
# LAST executor holding a stage's map outputs: no peer exists, so the
# only way the blocks survive is ``spark.storage.decommission.
# fallbackStorage.path`` (SPARK-33545) — the decommissioning executor
# uploads its shuffle files to a shared filesystem URI, the driver
# rewrites their locations to the reserved "fallback" block manager, and
# executors that appear LATER read them from there. Rehearsed literally:
#
#   1. one live worker runs the whole query up to the barrier-pinned
#      final stage (all map output on it);
#   2. SIGPWR that worker — zero executors remain; with no peer, blocks
#      can only land in fallback storage (watched on disk);
#   3. only then start the second worker: the rest of the final stage
#      runs on a fresh executor whose every shuffle fetch for the
#      drained stage is served from fallback files.
#
# Gates per query: hash equality with the healthy baseline, fallback
# files actually present on disk during recovery, decommission evidence
# in the victim's stderr, and zero FetchFailed in the query's job group.
# RDD blocks cannot use fallback storage (shuffle-only by design), so
# the leg runs non-localCheckpoint queries — one per injection family.
# ---------------------------------------------------------------------------

FALLBACK_QUERIES = [
    "image_decode_stats",         # mapInPandas family
    "heavy_hitter_order_groups",  # grouped applyInPandas family
    "simhash_dup_pairs",          # jvm_only family, shuffle-heavy self-join
]
FALLBACK_STORE = "/tmp/spark_graft_fallback_storage"
MIGRATION_WAIT = 120.0  # drain-to-fallback upload bound


def _scan_fallback_store() -> dict:
    files = [p for p in Path(FALLBACK_STORE).rglob("*") if p.is_file()]
    return {
        "n_files": len(files),
        "bytes": sum(p.stat().st_size for p in files),
        "sample": sorted(
            str(p.relative_to(FALLBACK_STORE)) for p in files)[:8],
    }


def _injected_fallback(spark, cluster, sf_dir, name, base_hash,
                       job_group, seen_execs: set[str]) -> dict:
    """One scale-down-to-zero drain: barrier on the only worker, SIGPWR
    it, wait for the fallback upload to land on disk, then bring up the
    OTHER worker to finish the query from fallback reads."""
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

    before = _scan_fallback_store()
    t = threading.Thread(target=target, daemon=True)
    t.start()
    drain = _sigpwr_during_final_stage(cluster, token_dir)
    res: dict = {"drain": drain, "fallback_before": before}
    victim = drain.get("victim_worker")
    if victim is None:
        res["error"] = "no barrier marker appeared — nothing to drain"
        return res
    # zero-executor window: wait until the drained executor's shuffle
    # files appear in fallback storage (growth then quiescence), bounded
    deadline = time.time() + MIGRATION_WAIT
    last = before["n_files"]
    stable_since = None
    while time.time() < deadline:
        now = _scan_fallback_store()["n_files"]
        if now > before["n_files"]:
            if now == last and stable_since and time.time() - stable_since > 3:
                break
            if now != last:
                stable_since = time.time()
            last = now
        time.sleep(0.5)
    res["fallback_during"] = _scan_fallback_store()
    res["fallback_grew"] = res["fallback_during"]["n_files"] > before["n_files"]
    # only NOW does a replacement executor exist anywhere
    other = 1 - victim
    cluster.restart_worker(other)
    t.join(timeout=JOIN_TIMEOUT)
    if t.is_alive():
        res["error"] = f"injected run did not finish within {JOIN_TIMEOUT:.0f}s"
        return res
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


def run_fallback_leg(sf_dir: str, out_path: Path | None) -> None:
    """--fallback entry point; merges a ``fallback_leg`` key into the
    artifact."""
    from tools.faultlab import setup_env

    setup_env()
    os.environ.pop("SPARK_GRAFT_CHECKPOINT_REPLICAS", None)

    shutil.rmtree(EVENTLOG_DIR, ignore_errors=True)
    os.makedirs(EVENTLOG_DIR, exist_ok=True)
    shutil.rmtree(BARRIER_ROOT, ignore_errors=True)
    shutil.rmtree(FALLBACK_STORE, ignore_errors=True)
    os.makedirs(FALLBACK_STORE, exist_ok=True)

    from etl_process_spark.session import get_spark

    results: dict[str, dict] = {}
    seen_execs: set[str] = set()
    cluster = MiniCluster(
        tag="decomfb",
        worker_java_opts=("-Dspark.decommission.enabled=true",))
    cluster.__enter__()
    try:
        # exactly ONE executor's worth of cores: the query must live
        # entirely on the victim until the zero-executor window
        spark = get_spark(
            "decommission_fallback",
            master=cluster.master_url,
            extra_conf={
                "spark.driver.host": "127.0.0.1",
                "spark.executor.memory": "2g",
                "spark.executor.cores": "4",
                "spark.cores.max": "4",
                "spark.sql.shuffle.partitions": "8",
                "spark.locality.wait": "0s",
                "spark.decommission.enabled": "true",
                "spark.storage.decommission.enabled": "true",
                "spark.storage.decommission.shuffleBlocks.enabled": "true",
                "spark.storage.decommission.rddBlocks.enabled": "true",
                "spark.storage.decommission.fallbackStorage.path":
                    f"file://{FALLBACK_STORE}/",
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{EVENTLOG_DIR}",
                "spark.eventLog.compress": "false",
            },
        )
        sc = spark.sparkContext

        for name in FALLBACK_QUERIES:
            # steady state: worker 0 FRESH (a drained worker's JVM stays
            # alive in decommissioned state and the master will never
            # place executors there again — an is-it-dead check is not
            # enough, the daemon must be replaced), worker 1 DOWN (so
            # the single executor provably lands on 0 with no peer)
            cluster.restart_worker(0)
            if cluster.workers[1] is not None:
                cluster.kill_worker(1)
            if not _wait_executors(spark, 1):
                results[name] = {"ok": False,
                                 "error": "single-worker cluster not ready"}
                continue

            sc.setLocalProperty("spark.jobGroup.id", f"fbbase::{name}")
            base_holder: dict = {}

            def _baseline(n=name, h=base_holder):
                try:
                    h["hash"], h["rows"] = _run_wrapped(spark, sf_dir, n, None)
                except Exception as exc:  # noqa: BLE001
                    h["error"] = f"{type(exc).__name__}: {exc}"[:300]

            # bounded: with zero usable executors a submitted job starves
            # FOREVER (no scheduler timeout) — a hung baseline must fail
            # the query, not wedge the whole leg
            bt = threading.Thread(target=_baseline, daemon=True)
            bt.start()
            bt.join(timeout=JOIN_TIMEOUT)
            sc.setLocalProperty("spark.jobGroup.id", None)
            if bt.is_alive():
                sc.cancelAllJobs()
                results[name] = {
                    "ok": False,
                    "error": f"baseline hung past {JOIN_TIMEOUT:.0f}s "
                             "(no usable executor?)"}
                continue
            if "error" in base_holder:
                results[name] = {"ok": False,
                                 "error": f"baseline: {base_holder['error']}"}
                continue
            base_hash, base_rows = base_holder["hash"], base_holder["rows"]

            res: dict = {"rows": base_rows, "hash": base_hash}
            inj = _injected_fallback(spark, cluster, sf_dir, name, base_hash,
                                     f"fallback::{name}", seen_execs)
            res["injected"] = inj
            res["ok"] = bool(
                inj.get("hash_match")
                and inj["drain"].get("signaled")
                and inj.get("fallback_grew")
                and inj.get("evidence", {}).get("executors"))
            results[name] = res
            print(json.dumps({
                "query": name, "ok": res["ok"],
                "fallback_files": (inj.get("fallback_during") or {}).get("n_files"),
                "fallback_bytes": (inj.get("fallback_during") or {}).get("bytes"),
                "drain": inj.get("drain"), "error": inj.get("error"),
            }), flush=True)

        spark.stop()  # flush event log
    finally:
        cluster.__exit__(None, None, None)

    ev = _parse_eventlog(EVENTLOG_DIR)
    for name, res in results.items():
        m = ev.get(f"fallback::{name}")
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
        "mode": "fallback_storage",
        "topology": ("standalone master + ONE live worker; victim SIGPWRed "
                     "while holding ALL map output with ZERO surviving "
                     "executors (scale-down-to-zero), shuffle files "
                     "uploaded to spark.storage.decommission."
                     "fallbackStorage.path; a replacement worker started "
                     "only after the upload landed finishes the query "
                     "from fallback reads"),
        "note": ("ok requires hash equality with the healthy baseline, "
                 "fallback files observed ON DISK during the "
                 "zero-executor window, decommission evidence in the "
                 "victim's stderr, and zero FetchFailed in the query's "
                 "job group."),
        "results": results,
    }
    print(json.dumps(summary))
    if out_path is not None:
        merge_tier_leg(out_path, summary, key="fallback_leg")
        print(f"wrote {out_path} fallback_leg: "
              f"{summary['n_ok']}/{summary['n_queries']} ok", file=sys.stderr)
    if summary["n_ok"] != summary["n_queries"]:
        sys.exit(1)


def main() -> None:  # noqa: C901 — linear rehearsal script
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    quick = "--quick" in sys.argv
    tier10x = "--tier10x" in sys.argv
    if "--fallback" in sys.argv:
        run_fallback_leg(
            argv[0] if argv else "/root/testdata/sf0.01",
            Path(argv[1]) if len(argv) > 1
            else REPO / "DECOMMISSION_DETERMINISM.json")
        return
    sf_dir = argv[0] if argv else (
        TIER10X_SF_DIR if tier10x else "/root/testdata/sf0.01")
    if tier10x:
        global MARKER_WAIT, JOIN_TIMEOUT
        MARKER_WAIT = 900.0
        JOIN_TIMEOUT = 2700.0
    out_path = (
        Path(argv[1]) if len(argv) > 1
        else (None if quick else REPO / "DECOMMISSION_DETERMINISM.json")
    )

    from tools.faultlab import setup_env

    setup_env()
    os.environ.pop("SPARK_GRAFT_CHECKPOINT_REPLICAS", None)

    shutil.rmtree(EVENTLOG_DIR, ignore_errors=True)
    os.makedirs(EVENTLOG_DIR, exist_ok=True)
    shutil.rmtree(BARRIER_ROOT, ignore_errors=True)

    from etl_process_spark.session import get_spark

    suite = PYTHON_FAMILIES + JVM_QUERIES
    if quick:
        suite = ["heavy_hitter_order_groups", "part_bfs_reach"]
    elif tier10x:
        suite = TIER10X_QUERIES

    results: dict[str, dict] = {}
    seen_execs: set[str] = set()
    cluster = MiniCluster(
        tag="decom",
        # tier-10x executors are 8g: the worker daemon must offer it
        memory="10g" if tier10x else "3g",
        worker_java_opts=("-Dspark.decommission.enabled=true",))
    cluster.__enter__()
    try:
        conf = {
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
        }
        if tier10x:
            conf.update(TIER10X_CONF)
        spark = get_spark(
            "decommission_determinism",
            master=cluster.master_url,
            extra_conf=conf,
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

        census_dir = "/root/testdata/sf0.001" if tier10x else sf_dir
        for name, fam in query_families(spark, census_dir, suite).items():
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
        "mode": "tier_10x" if tier10x else ("quick" if quick else "suite"),
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
        if tier10x:
            merge_tier_leg(out_path, summary)
        else:
            out_path.write_text(json.dumps(summary, indent=1) + "\n")
        print(f"wrote {out_path}: {summary['n_ok']}/{summary['n_queries']} ok",
              file=sys.stderr)
    if summary["n_ok"] != summary["n_queries"]:
        sys.exit(1)


if __name__ == "__main__":
    main()

"""Stateful STREAMING under executor loss (100 TB operational claim #5
— after batch retries, speculation, forced spills, and batch
executor loss).

The restart suite (tests/test_streaming.py) proves streaming queries
recover when the QUERY is killed and restarted from its checkpoint.
This rehearsal proves the OTHER routine failure: a WORKER (and the
executor holding state-store instances, shuffle blocks, and in-flight
sink files) SIGKILLed MID-MICRO-BATCH while the query keeps running.
Recovery is a genuinely different path than restart: the driver's
streaming engine re-runs the failed batch's tasks on the surviving
executor, which must reload state from the checkpoint's
snapshot+delta files (HDFS-backed provider) or RocksDB changelog, and
the file sink's ``_spark_metadata`` log must fence out any partial
output files the dead executor had already written.

Mechanism:

* **A real 2-host standalone cluster** (tools/minicluster.py, shared
  with the speculation and batch executor-loss rehearsals): worker
  death takes real state-store and shuffle state with it.
* **A 12-micro-batch backlog**: the sf0.001 events table split into
  12 time-ordered files with pinned strictly-increasing mtimes,
  streamed with ``maxFilesPerTrigger=1`` + ``Trigger.AvailableNow``.
  Batch composition is WAL-pinned, so a kill cannot change batch
  boundaries — only which executor (re)computes them.
* **A mid-run kill**: the driver polls ``lastProgress`` and SIGKILLs
  one worker's whole process group as soon as batch
  ``KILL_AFTER_BATCH`` completes — several batches of state updates
  exist (the victim's state-store instances are warm and LOADED), and
  ≥ 7 batches remain, so the kill always lands mid-query.
* **The gate**: canonical hash (queries/differential canonicalization
  — the same one every other determinism artifact uses) of the parquet
  sink's committed output must equal a healthy-cluster baseline run's,
  AND the run is vacuous (ok=false) unless the worker died
  (``killed``) and ≥ 1 batch completed AFTER the kill
  (``batches_after_kill``). App-level ``SparkListenerExecutorRemoved``
  events from the event log are recorded as independent proof the
  cluster really lost an executor.

Suite — one query per state mechanism / provider combination:

| query | state mechanism | provider |
|---|---|---|
| tumbling_counts      | JVM windowed agg state      | HDFS-backed |
| dedup_stream         | dropDuplicates keyed state  | RocksDB |
| sessionize_stream    | applyInPandasWithState (Python state tuple) | HDFS-backed |
| sessionize_stream_tws| transformWithStateInPandas (named state + timers) | RocksDB (required) |
| stream_stream_join   | time-bounded left-outer join (two sources, 4-store join state, watermark-driven unmatched-row emission) | HDFS-backed |

Usage: python tools/streaming_executorloss.py [out.json] [--quick]
           [--drain] [--big]
Writes STREAMING_EXECUTORLOSS.json (--quick runs tumbling + legacy
sessionizer only and does NOT overwrite the artifact unless an out
path is given); exits nonzero on any mismatch or vacuous run.
Run SERIALLY (kill timing shares the host with the batches).

``--big`` is the backlog tier the round-10 verdict asked for: sf0.01
events (10x the rows per micro-batch), the kill moved to batch 5 so
several batches of state history exist, RocksDB CHANGELOG checkpointing
enabled, and ``minDeltasForSnapshot`` raised past the batch count so NO
full snapshot ever exists — recovery must replay the entire
delta/changelog chain from batch 0 on the surviving executor instead of
loading one recent snapshot. Results merge into the artifact under a
``tier_sf0.01`` key with the same gates.

``--drain`` swaps the SIGKILL for Spark's graceful decommission
(SIGPWR to a worker launched with ``spark.decommission.enabled``):
the executor stops taking tasks, finishes its in-flight micro-batch
work, migrates blocks, and exits — the spot-reclaim path for a
long-running streaming job. Same gates, separate artifact
(STREAMING_DECOMMISSION.json), plus an app-level FetchFailed count
that must be zero.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.faultlab import (  # noqa: E402
    canon_hash as _canon_hash,
    eventlog_counts as _eventlog_counts_shared,
    setup_env,
    wait_executors as _wait_executors,
)
from tools.minicluster import MiniCluster, WORKER_HOSTS  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
ROOT = "/tmp/spark_graft_stream_exloss"
INBOX = f"{ROOT}/inbox"
EVENTLOG_DIR = f"{ROOT}/eventlog"
N_CHUNKS = 12
KILL_AFTER_BATCH = 2     # kill once this batchId has a progress event
AWAIT_SECS = 600


def _set_big_tier() -> None:
    """Re-point the module at the sf0.01 backlog (its own inbox/eventlog
    roots so the sf0.001 artifacts are untouched) and move the kill deep
    enough into the run that a multi-batch state history exists."""
    global SF_DIR, ROOT, INBOX, EVENTLOG_DIR, KILL_AFTER_BATCH, AWAIT_SECS
    SF_DIR = "/root/testdata/sf0.01"
    ROOT = "/tmp/spark_graft_stream_exloss_big"
    INBOX = f"{ROOT}/inbox"
    EVENTLOG_DIR = f"{ROOT}/eventlog"
    KILL_AFTER_BATCH = 5
    AWAIT_SECS = 1200


# --big: no snapshot may ever be written (minDeltasForSnapshot > batch
# count), so post-kill state reload MUST replay the full delta /
# RocksDB-changelog chain from batch 0 — the non-trivial-recovery
# regime; changelog checkpointing ON so RocksDB writes per-batch
# changelogs instead of full SST uploads
BIG_TIER_CONF = {
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled":
        "true",
    "spark.sql.streaming.stateStore.minDeltasForSnapshot": "50",
}
ROCKSDB = ("org.apache.spark.sql.execution.streaming.state."
           "RocksDBStateStoreProvider")
PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


def _suite() -> list[dict]:
    """Each entry's ``build`` takes a ZERO-ARG stream factory (a fresh
    ``read_event_stream`` over the inbox per call) so multi-source
    queries — the stream-stream join reads the inbox twice — get as
    many independent sources as they need."""
    from pyspark.sql import functions as F

    from etl_process_spark.streaming import (
        sessionize_stream,
        tumbling_counts,
    )
    from etl_process_spark.streaming.joins import time_bounded_join_stream
    from etl_process_spark.streaming.sources import dedup_stream
    from etl_process_spark.streaming.stateful import sessionize_stream_tws

    def _ss_join(mk):
        def split(df, kind, idc, tsc):
            return df.filter(F.col("event_type") == kind).select(
                "user_id",
                F.col("event_id").alias(idc),
                F.col("ts").alias(tsc),
            )

        # left_outer: matched rows emit on arrival, unmatched lefts
        # only when the watermark PROVES no match can arrive — so the
        # kill exercises both join-state lookup and watermark-driven
        # state eviction/emission on the recovered store
        return time_bounded_join_stream(
            split(mk(), "click", "click_id", "c_ts"),
            split(mk(), "view", "view_id", "v_ts"),
            key="user_id", left_ts="c_ts", right_ts="v_ts",
            watermark="48 hours", within="24 hours", how="left_outer",
        )

    return [
        {"name": "tumbling_counts",
         "build": lambda mk: tumbling_counts(mk(), watermark="0 seconds"),
         "provider": "hdfs", "mechanism": "windowed aggregation state"},
        {"name": "dedup_stream",
         "build": lambda mk: dedup_stream(mk(), ["event_id"],
                                          watermark="60 days"),
         "provider": "rocksdb", "mechanism": "dropDuplicates keyed state"},
        {"name": "sessionize_stream",
         "build": lambda mk: sessionize_stream(mk(), gap_seconds=1800),
         "provider": "hdfs",
         "mechanism": "applyInPandasWithState (Python state tuple)"},
        {"name": "sessionize_stream_tws",
         "build": lambda mk: sessionize_stream_tws(mk(), gap_seconds=1800),
         "provider": "rocksdb",
         "mechanism": "transformWithStateInPandas (named state + timers)"},
        {"name": "stream_stream_join",
         "build": _ss_join,
         "provider": "hdfs",
         "mechanism": ("stream-stream time-bounded left-outer join "
                       "(two sources, 4-store join state, "
                       "watermark-driven unmatched-row emission)")},
    ]


def _build_inbox(spark) -> int:
    """Split sf0.001 events into N_CHUNKS time-ordered single-file
    parquets with strictly increasing mtimes (file-source arrival
    order = event-time order, the restart tests' convention)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from etl_process_spark.queries.registry import tbl

    if Path(INBOX, f"events_{N_CHUNKS - 1:02d}.parquet").exists():
        return N_CHUNKS
    shutil.rmtree(INBOX, ignore_errors=True)
    os.makedirs(INBOX)
    ev = tbl(spark, SF_DIR, "events")
    # deterministic split: rank by (ts, event_id) then ntile
    w = Window.orderBy("ts", "event_id")
    ranked = ev.withColumn("__tile", F.ntile(N_CHUNKS).over(w))
    now = time.time()
    for i in range(1, N_CHUNKS + 1):
        stage = f"{ROOT}/chunk_{i}"
        (ranked.filter(F.col("__tile") == i).drop("__tile")
               .coalesce(1).write.mode("overwrite").parquet(stage))
        src = next(Path(stage).glob("part-*.parquet"))
        dst = Path(INBOX) / f"events_{i - 1:02d}.parquet"
        shutil.copy(src, dst)
        os.utime(dst, (now + 10 * i,) * 2)
        shutil.rmtree(stage)
    return N_CHUNKS


def _state_file_census(ckpt: str) -> dict:
    """File-type census of a checkpoint's state store — the --big tier's
    replay evidence: with minDeltasForSnapshot past the batch count, the
    history must be (nearly) all .delta / .changelog files, so post-kill
    reload provably replays a chain instead of loading one snapshot."""
    census: dict[str, int] = {}
    for p in Path(ckpt, "state").rglob("*"):
        if p.is_file():
            suffix = p.suffix or p.name
            census[suffix] = census.get(suffix, 0) + 1
    return census


def _progress_evidence(query) -> list[dict]:
    out = []
    for p in query.recentProgress:
        state = p.get("stateOperators") or []
        out.append({
            "batchId": p.get("batchId"),
            "numInputRows": p.get("numInputRows"),
            "stateRowsUpdated": sum(
                s.get("numRowsUpdated", 0) for s in state),
        })
    return out


def _run_leg(spark, spec: dict, leg: str,
             kill_cb=None) -> dict:
    """One streaming run to a parquet sink; returns hash/rows/progress.
    kill_cb(batch_at_kill_dict) is invoked once batch KILL_AFTER_BATCH
    has a progress event."""
    from etl_process_spark.streaming.sources import read_event_stream

    name = spec["name"]
    out_dir = f"{ROOT}/{name}/{leg}/out"
    ckpt = f"{ROOT}/{name}/{leg}/ckpt"
    shutil.rmtree(f"{ROOT}/{name}/{leg}", ignore_errors=True)

    def mk_stream():
        return read_event_stream(spark, INBOX, max_files_per_trigger=1)

    df = spec["build"](mk_stream)
    q = (df.writeStream.format("parquet").outputMode("append")
           .option("path", out_dir)
           .option("checkpointLocation", ckpt)
           .trigger(availableNow=True).start())
    res: dict = {}
    try:
        if kill_cb is not None:
            deadline = time.time() + AWAIT_SECS
            killed_at = None
            while time.time() < deadline and q.isActive:
                p = q.lastProgress
                if p and p.get("batchId", -1) >= KILL_AFTER_BATCH:
                    killed_at = p["batchId"]
                    res["kill"] = kill_cb()
                    res["batch_at_kill"] = killed_at
                    break
                time.sleep(0.05)
            if killed_at is None:
                # distinguish "finished too fast" from "died": a failed
                # query also drops isActive, and reporting that as a
                # kill-window miss would mask the real streaming error
                exc = q.exception()
                if exc is not None:
                    res["error"] = f"query failed before kill: {str(exc)[:400]}"
                else:
                    res["error"] = "query finished before the kill window"
                return res
        if not q.awaitTermination(AWAIT_SECS):
            res["error"] = f"query still active after {AWAIT_SECS}s"
            q.stop()
            return res
        exc = q.exception()
        if exc is not None:
            res["error"] = str(exc)[:400]
            return res
        res["progress"] = _progress_evidence(q)
        res["final_batch"] = max(
            (p["batchId"] for p in res["progress"]
             if p["batchId"] is not None), default=None)
        res["state_files"] = _state_file_census(ckpt)
    finally:
        if q.isActive:
            q.stop()
    result = spark.read.parquet(out_dir)
    rows = [tuple(r) for r in result.collect()]
    res["rows"] = len(rows)
    res["hash"] = _canon_hash(result.columns, rows)
    return res


_eventlog_counts = _eventlog_counts_shared


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    quick = "--quick" in sys.argv
    drain = "--drain" in sys.argv
    big = "--big" in sys.argv
    if big:
        _set_big_tier()
    default_out = ("STREAMING_DECOMMISSION.json" if drain
                   else "STREAMING_EXECUTORLOSS.json")
    out_path = (
        Path(argv[0]) if argv
        else (None if quick else REPO / default_out)
    )

    setup_env()
    # TWS executors import google.protobuf in their Python workers;
    # the vendored shim must be on PYTHONPATH BEFORE the cluster's
    # worker daemons capture the environment (executors inherit the
    # WORKER's env on standalone, not the driver's)
    from etl_process_spark.vendor import ensure_protobuf

    ensure_protobuf()

    shutil.rmtree(EVENTLOG_DIR, ignore_errors=True)
    os.makedirs(EVENTLOG_DIR, exist_ok=True)

    from etl_process_spark.session import get_spark

    suite = _suite()
    if quick:
        keep = {"tumbling_counts", "sessionize_stream"}
        suite = [s for s in suite if s["name"] in keep]

    results: dict[str, dict] = {}
    cluster = MiniCluster(
        tag="stream_drain" if drain else "stream_exloss",
        worker_java_opts=(
            ("-Dspark.decommission.enabled=true",) if drain else ()),
    )
    cluster.__enter__()
    try:
        conf = {
            "spark.driver.host": "127.0.0.1",
            "spark.executor.memory": "2g",
            "spark.executor.cores": "4",
            "spark.cores.max": "8",
            "spark.sql.shuffle.partitions": "8",
            "spark.locality.wait": "0s",
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVENTLOG_DIR}",
            "spark.eventLog.compress": "false",
        }
        if drain:
            conf.update({
                "spark.decommission.enabled": "true",
                "spark.storage.decommission.enabled": "true",
                "spark.storage.decommission.rddBlocks.enabled": "true",
                "spark.storage.decommission.shuffleBlocks.enabled": "true",
            })
        if big:
            conf.update(BIG_TIER_CONF)
        spark = get_spark(
            "streaming_decommission" if drain else "streaming_executorloss",
            master=cluster.master_url,
            extra_conf=conf,
        )
        _build_inbox(spark)
        victim = 0
        for spec in suite:
            name = spec["name"]
            provider = ROCKSDB if spec["provider"] == "rocksdb" else None
            saved = spark.conf.get(PROVIDER_KEY, None)
            if provider:
                spark.conf.set(PROVIDER_KEY, provider)
            try:
                if not _wait_executors(spark, 2):
                    raise RuntimeError("cluster did not reach 2 executors")
                base = _run_leg(spark, spec, "baseline")
                if "error" in base:
                    results[name] = {"ok": False, "baseline": base}
                    continue

                def _kill(i=victim):
                    if drain:
                        import signal as _sig

                        os.kill(cluster.workers[i].pid, _sig.SIGPWR)
                        return {"victim_worker": i,
                                "victim_host": WORKER_HOSTS[i],
                                "killed": True, "kind": "sigpwr_drain"}
                    cluster.kill_worker(i)
                    return {"victim_worker": i,
                            "victim_host": WORKER_HOSTS[i], "killed": True,
                            "kind": "sigkill"}

                inj = _run_leg(spark, spec, "injected", kill_cb=_kill)
                cluster.restart_worker(victim)
                victim = 1 - victim
                ok = (
                    "error" not in inj
                    and inj.get("kill", {}).get("killed")
                    and inj.get("final_batch") is not None
                    and inj["final_batch"] > inj["batch_at_kill"]
                    and inj.get("hash") == base["hash"]
                )
                results[name] = {
                    "ok": bool(ok),
                    "provider": spec["provider"],
                    "mechanism": spec["mechanism"],
                    "rows": base["rows"],
                    "hash": base["hash"],
                    "baseline_batches": base.get("final_batch"),
                    "injected": {
                        k: inj.get(k)
                        for k in ("kill", "batch_at_kill", "final_batch",
                                  "rows", "hash", "error", "state_files")
                        if inj.get(k) is not None
                    },
                    "batches_after_kill": (
                        (inj.get("final_batch") or 0)
                        - (inj.get("batch_at_kill") or 0)
                        if "error" not in inj else None),
                    "hash_match": inj.get("hash") == base["hash"],
                    "state_rows_updated_injected": sum(
                        p["stateRowsUpdated"]
                        for p in inj.get("progress", [])),
                }
                print(json.dumps({name: results[name]["ok"],
                                  "batches_after_kill":
                                      results[name]["batches_after_kill"]}),
                      flush=True)
            finally:
                if provider:
                    if saved is None:
                        spark.conf.unset(PROVIDER_KEY)
                    else:
                        spark.conf.set(PROVIDER_KEY, saved)
        counts = _eventlog_counts(EVENTLOG_DIR)
    finally:
        try:
            spark.stop()
        except Exception:  # noqa: BLE001 — teardown best-effort
            pass
        cluster.__exit__(None, None, None)

    if drain and counts["fetch_failed"] > 0:
        # the graceful path must not degrade into the crash path
        for r in results.values():
            r["ok"] = False
        print(f"DRAIN DEGRADED: {counts['fetch_failed']} FetchFailed",
              file=sys.stderr)

    summary = {
        "n_queries": len(results),
        "n_ok": sum(1 for r in results.values() if r["ok"]),
        "executors_removed_total": counts["executors_removed"],
        "fetch_failed_total": counts["fetch_failed"],
        "injection": "sigpwr_drain" if drain else "sigkill",
        "n_microbatches": N_CHUNKS,
        "kill_after_batch": KILL_AFTER_BATCH,
        "sf_dir": SF_DIR,
        "tier": "sf0.01" if big else "sf0.001",
        "tier_conf": BIG_TIER_CONF if big else None,
        "mode": "quick" if quick else "suite",
        "topology": ("standalone master + 2 workers on distinct loopback "
                     "hostnames; victim worker "
                     + ("sent SIGPWR (graceful decommission: executor "
                        "drains in-flight work, migrates blocks, exits)"
                        if drain else
                        "SIGKILLed as a process group")
                     + " once micro-batch %d completed, query left "
                       "RUNNING (no restart)" % KILL_AFTER_BATCH),
        "note": ("ok requires: worker "
                 + ("drained" if drain else "killed")
                 + " mid-run, >=1 micro-batch completed AFTER the "
                 "injection on the surviving executor (state reloaded "
                 "from checkpoint snapshot+delta / RocksDB changelog), "
                 "and the parquet sink's committed output "
                 "(_spark_metadata-fenced) canonical-hash-equal to a "
                 "healthy-cluster baseline run."
                 + (" Drain additionally requires zero FetchFailed "
                    "app-wide." if drain else "")),
        "results": results,
    }
    print(json.dumps(summary))
    if out_path is not None:
        if big:
            from tools.executorloss_determinism import merge_tier_leg

            merge_tier_leg(out_path, summary, key="tier_sf0.01")
        else:
            out_path.write_text(json.dumps(summary, indent=1) + "\n")
        print(f"wrote {out_path}: {summary['n_ok']}/{summary['n_queries']} ok",
              file=sys.stderr)
    if summary["n_ok"] != summary["n_queries"]:
        sys.exit(1)


if __name__ == "__main__":
    main()

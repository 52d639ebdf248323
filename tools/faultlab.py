"""Shared core of the fault-rehearsal harnesses (round-10 ADVICE item:
"extract the evidence-collection and hash-gate core").

The rehearsal family — speculation, batch executor loss, graceful
decommission (+ fallback storage), streaming executor loss / drain —
shares one skeleton: run a healthy baseline, inject a real fault at a
deterministic point, and gate on (a) canonical-hash equality with the
baseline and (b) machine-parsed recovery evidence so a vacuous run
(query never depended on the victim) cannot pass. This module hosts the
topology-agnostic primitives; ``tools/minicluster.py`` hosts the
topology. A new rehearsal should be a <150-line script over these.

Primitives:

* ``canon_hash``       — md5 over the SAME row canonicalization the
                         DuckDB differential uses, so every artifact's
                         hash gate means the same thing.
* ``barrier_identity`` / ``run_wrapped`` — the deterministic injection
                         window: an identity mapInPandas whose first
                         attempt announces its host and blocks on a
                         driver-written go-file.
* ``wait_executors``   — block until the driver sees n live executors.
* ``parse_eventlog_groups`` — per-job-group FetchFailed / resubmitted
                         stage & task / executor-lost counts (the
                         recovery-evidence side of the gate).
* ``eventlog_counts``  — app-level executor-removed / FetchFailed
                         totals (the streaming harnesses' variant).
* ``merge_tier_leg``   — attach a tier/fallback leg to an artifact
                         without disturbing the base suite's results.
* ``setup_env``        — the PYTHONPATH / PYSPARK_PYTHON boilerplate
                         every rehearsal needs before touching Spark.
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

BARRIER_TIMEOUT = 180.0  # tasks proceed on their own past this: no deadlock


def setup_env() -> None:
    """Repo on PYTHONPATH (executors unpickle module-referenced
    functions) and the driver's interpreter for the workers."""
    existing = os.environ.get("PYTHONPATH", "")
    if str(REPO) not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = str(REPO) + (
            os.pathsep + existing if existing else "")
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)


def canon_hash(columns, rows) -> str:
    """Canonical result hash — identical recipe to the differential's
    value hash (queries/differential._rows_to_canonical), so rehearsal
    gates and oracle gates are comparing the same bytes."""
    from etl_process_spark.queries.differential import _rows_to_canonical

    canon = _rows_to_canonical(columns, rows)
    h = hashlib.md5()
    for r in canon:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def barrier_identity(token_dir: str, timeout: float | None = None):
    """Identity mapInPandas whose FIRST attempt announces its host and
    blocks until the driver writes ``<token_dir>/go``. Later attempts
    (post-fault reruns) find go already present and stream through."""
    limit = BARRIER_TIMEOUT if timeout is None else timeout

    def fn(it):
        from pyspark import TaskContext

        tc = TaskContext.get()
        os.makedirs(token_dir, exist_ok=True)
        host = os.environ.get("SPARK_LOCAL_HOSTNAME", "unknown")
        pid = tc.partitionId() if tc else -1
        att = tc.attemptNumber() if tc else -1
        open(os.path.join(token_dir, f"task_{pid}_{att}_{host}"), "w").close()
        go = os.path.join(token_dir, "go")
        deadline = time.time() + limit
        while not os.path.exists(go) and time.time() < deadline:
            time.sleep(0.1)
        yield from it

    return fn


def run_wrapped(spark, sf_dir: str, name: str,
                token_dir: str | None) -> tuple[str, int]:
    """Build registry query ``name``, wrap the FINAL frame with an
    identity mapInPandas (barrier-gated when token_dir is given, plain
    otherwise so baseline and injected runs share the same plan
    boundary), collect, canonical-hash."""
    from etl_process_spark.queries import QUERIES

    df = QUERIES[name].builder(spark, sf_dir)
    if token_dir is not None:
        fn = barrier_identity(token_dir)
    else:
        def fn(it):
            yield from it
    wrapped = df.mapInPandas(fn, df.schema)
    rows = [tuple(r) for r in wrapped.collect()]
    return canon_hash(df.columns, rows), len(rows)


def wait_executors(spark, n: int, timeout: float = 90.0) -> bool:
    """Block until the driver sees n live executors (registered block
    managers minus the driver's own)."""
    deadline = time.time() + timeout
    sc = spark.sparkContext
    while time.time() < deadline:
        try:
            if sc._jsc.sc().getExecutorMemoryStatus().size() >= n + 1:
                return True
        except Exception:  # noqa: BLE001 — transient RPC during recovery
            pass
        time.sleep(0.5)
    return False


def parse_eventlog_groups(log_dir: str) -> dict[str, dict]:
    """Per-job-group recovery evidence: FetchFailed task ends,
    re-submitted stage attempts, resubmitted map tasks, executor-lost
    task failures. App-level executor-removed count under the '' key.
    Handles both rolling event-log dirs and single files."""
    agg: dict[str, dict] = defaultdict(
        lambda: {"fetch_failed": 0, "resubmitted_stages": 0,
                 "resubmitted_tasks": 0, "executor_lost_tasks": 0,
                 "n_tasks": 0})
    removed = 0

    def _idx(p: Path) -> tuple:
        parts = p.name.split("_")
        try:
            return (int(parts[1]), p.name)
        except (IndexError, ValueError):
            return (1 << 30, p.name)

    apps: list[list[Path]] = []
    for entry in sorted(Path(log_dir).glob("*"), key=lambda p: p.stat().st_mtime):
        if entry.is_dir():
            apps.append(sorted(
                (p for p in entry.iterdir() if p.name.startswith("events_")),
                key=_idx))
        else:
            apps.append([entry])
    for files in apps:
        stage_to_group: dict[int, str] = {}
        for path in files:
            with open(path) as fh:
                for line in fh:
                    try:
                        ev = json.loads(line)
                    except json.JSONDecodeError:
                        continue
                    kind = ev.get("Event")
                    if kind == "SparkListenerJobStart":
                        group = (ev.get("Properties") or {}).get(
                            "spark.jobGroup.id")
                        if not group:
                            continue
                        for sid in ev.get("Stage IDs", []):
                            stage_to_group[sid] = group
                    elif kind == "SparkListenerStageSubmitted":
                        si = ev.get("Stage Info") or {}
                        group = stage_to_group.get(si.get("Stage ID"))
                        if group and si.get("Stage Attempt ID", 0) > 0:
                            agg[group]["resubmitted_stages"] += 1
                    elif kind == "SparkListenerTaskEnd":
                        group = stage_to_group.get(ev.get("Stage ID"))
                        if not group:
                            continue
                        agg[group]["n_tasks"] += 1
                        reason = (ev.get("Task End Reason") or {}).get("Reason")
                        if reason == "FetchFailed":
                            agg[group]["fetch_failed"] += 1
                        elif reason == "ExecutorLostFailure":
                            agg[group]["executor_lost_tasks"] += 1
                        elif reason == "Resubmitted":
                            # map task whose finished output died with
                            # the executor — the literal resubmission
                            agg[group]["resubmitted_tasks"] += 1
                    elif kind == "SparkListenerExecutorRemoved":
                        removed += 1
    out = dict(agg)
    out[""] = {"executors_removed": removed}
    return out


def eventlog_counts(log_dir: str) -> dict:
    """App-level totals only — the streaming harnesses' cheap variant
    (streaming jobs don't run under per-query job groups)."""
    removed = fetch_failed = 0
    for entry in Path(log_dir).glob("**/*"):
        if not entry.is_file():
            continue
        try:
            with open(entry) as fh:
                for line in fh:
                    compact = line.replace(" ", "")
                    if '"Event":"SparkListenerExecutorRemoved"' in compact:
                        removed += 1
                    if '"Reason":"FetchFailed"' in compact:
                        fetch_failed += 1
        except (OSError, UnicodeDecodeError):
            continue
    return {"executors_removed": removed, "fetch_failed": fetch_failed}


def merge_tier_leg(out_path: Path, summary: dict, key: str = "tier_10x") -> None:
    """Attach a tier leg to an existing artifact without disturbing the
    base suite's results (read-modify-write; creates the file if the
    base suite has never run)."""
    doc: dict = {}
    if out_path.exists():
        try:
            doc = json.loads(out_path.read_text())
        except json.JSONDecodeError:
            doc = {}
    doc[key] = summary
    out_path.write_text(json.dumps(doc, indent=1) + "\n")

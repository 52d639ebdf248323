"""Speculative-execution determinism rehearsal (100 TB operational claim).

``tools/retry_determinism.py`` proves results are bit-identical when a
task FAILS and is re-run. This tool covers the OTHER routine cluster
event: ``spark.speculation=true``, where a straggling task gets a
DUPLICATE attempt launched while the original is still running, and the
two race to commit — the path that bites non-idempotent output commits,
accumulator-driven logic, and any operator whose result depends on
which attempt of the same partition wins.

Mechanism — three parts:

* **A real multi-HOST cluster.** Speculation needs more than a
  non-local master: the scheduler refuses to place a speculative copy
  on a host that already runs an attempt of the task
  (TaskSetManager.dequeueTaskHelper's ``!hasAttemptOnHost`` guard), so
  ``local-cluster[2,...]`` — two executors, ONE host — marks tasks
  speculatable and then never launches a copy (observed: "Marking task
  0 ... as speculatable" with zero speculative TaskStarts). The tool
  therefore launches a REAL standalone master plus two workers pinned
  to distinct loopback hostnames (SPARK_LOCAL_HOSTNAME=127.0.0.2 /
  127.0.0.3 — the whole 127/8 block is the loopback interface on
  Linux), giving the scheduler a genuinely different "host" to place
  duplicates on. Workers launched via raw ``java`` need
  SPARK_SCALA_VERSION set explicitly (normally load-spark-env.sh's
  job; without it executor launch dies with "Cannot find any build
  directories").
* **Injected stragglers.** The same monkeypatch surfaces as the retry
  harness (mapInPandas / grouped & cogrouped applyInPandas for Python
  families, a scan-identity wrap for JVM queries), but the guard
  SLEEPS instead of raising: attempt 0 of every third partition sleeps
  ``SLEEP_SEC`` while its siblings finish in well under
  ``multiplier x median``. The speculative duplicate runs the guard
  with ``attemptNumber() > 0``, skips the sleep, finishes first and
  wins the commit; the original is killed mid-sleep ("another attempt
  succeeded") — the stage completes at speculation latency, not at
  SLEEP_SEC.
* **Proof the race actually happened, per query.** Two independent
  counters: (a) an accumulator incremented when the hooked operator
  runs with ``attemptNumber() > 0`` — no task ever FAILS in this
  rehearsal (the guard only sleeps), so attempt>0 can only be a
  speculative duplicate, and Spark applies accumulator updates from
  the first SUCCESSFUL attempt, which here is the duplicate; (b) the
  JSON event log, where every ``SparkListenerTaskStart``'s Task Info
  carries ``Speculative: true|false`` — counted per job group, along
  with ``TaskKilled`` ends (the losing attempts). A query whose
  injected run produced zero speculative attempts is recorded
  ok=false (vacuous, same rule as the retry harness).

Each query runs twice in the same session — baseline (no stragglers;
fast uniform tasks don't speculate) and injected — and the
canonicalized sorted row sets (differential._rows_to_canonical, the
hash the DuckDB gate uses) must be IDENTICAL.

Usage: python tools/speculation_determinism.py [sf_dir] [out.json]
           [--quick]
Writes SPECULATION_DETERMINISM.json (full 12-query suite; --quick runs
a 2-query smoke and does NOT overwrite the artifact unless an out path
is given); exits nonzero on any mismatch or vacuous run. Run SERIALLY —
stragglers are timed against their siblings' medians, so a loaded
machine skews speculatability, never correctness.
"""

from __future__ import annotations

import functools
import inspect
import json
import os
import shutil
import sys
import time
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.retry_determinism import (  # noqa: E402
    JVM_QUERIES,
    PYTHON_FAMILIES,
    _result_hash,
)
from tools.family_census import query_families  # noqa: E402
from tools.minicluster import MASTER_HOST, MiniCluster, WORKER_HOSTS  # noqa: E402

SLEEP_EVERY = 3    # partitions with pid % SLEEP_EVERY == 0 straggle
SLEEP_SEC = 20.0   # straggler sleep; must dwarf multiplier x median
EVENTLOG_DIR = "/tmp/spark_graft_spec_eventlog"

_SPEC_ACC = None  # accumulator: hooked-operator runs with attempt > 0


def _straggle_first_attempt(fn):
    """Wrap a pandas-UDF-shaped function so attempt 0 of every
    SLEEP_EVERY-th partition sleeps long enough to be speculated.
    Exact positional arity preserved (pyspark.worker dispatches grouped
    / cogrouped functions on ``len(getfullargspec(f).args)``)."""
    acc = _SPEC_ACC

    def guard():
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is None:
            return
        if tc.attemptNumber() > 0:
            # no task ever fails in this rehearsal -> attempt>0 IS a
            # speculative duplicate reaching the hooked operator
            if acc is not None:
                acc.add(1)
        elif tc.partitionId() % SLEEP_EVERY == 0:
            time.sleep(SLEEP_SEC)

    try:
        n = len(inspect.getfullargspec(fn).args)
    except TypeError:
        n = 1
    if n == 3:
        def wrapped(key, left, right):
            guard()
            return fn(key, left, right)
    elif n == 2:
        def wrapped(a, b):
            guard()
            return fn(a, b)
    else:
        def wrapped(it):
            guard()
            return fn(it)
    return functools.wraps(fn)(wrapped)


class _Straggler:
    """Install the straggler hooks (same surfaces as retry's _Injector:
    the MIXINS, because the DataFrame subclass delegates by explicit
    attribute reference and would shadow a base-class patch)."""

    def __init__(self, wrap_scans: bool, wrap_sql: bool = False):
        self.wrap_scans = wrap_scans
        self.wrap_sql = wrap_sql

    def __enter__(self):
        from pyspark.sql import DataFrameReader, SparkSession
        from pyspark.sql.pandas.group_ops import (
            PandasCogroupedOps,
            PandasGroupedOpsMixin,
        )
        from pyspark.sql.pandas.map_ops import PandasMapOpsMixin

        self._orig = {
            "map": PandasMapOpsMixin.mapInPandas,
            "grouped": PandasGroupedOpsMixin.applyInPandas,
            "cogrouped": PandasCogroupedOps.applyInPandas,
            "parquet": DataFrameReader.parquet,
            "sql": SparkSession.sql,
        }
        orig = self._orig

        def map_in_pandas(df, func, schema, *a, **kw):
            return orig["map"](df, _straggle_first_attempt(func), schema, *a, **kw)

        def grouped_apply(g, func, schema):
            return orig["grouped"](g, _straggle_first_attempt(func), schema)

        def cogrouped_apply(cg, func, schema):
            return orig["cogrouped"](cg, _straggle_first_attempt(func), schema)

        PandasMapOpsMixin.mapInPandas = map_in_pandas
        PandasGroupedOpsMixin.applyInPandas = grouped_apply
        PandasCogroupedOps.applyInPandas = cogrouped_apply

        if self.wrap_scans:

            def parquet(reader, *paths, **options):
                df = orig["parquet"](reader, *paths, **options)

                def identity(it):
                    yield from it

                return orig["map"](df, _straggle_first_attempt(identity), df.schema)

            DataFrameReader.parquet = parquet

        if self.wrap_sql:

            def sql(session, *a, **kw):
                df = orig["sql"](session, *a, **kw)

                def identity(it):
                    yield from it

                return orig["map"](df, _straggle_first_attempt(identity), df.schema)

            SparkSession.sql = sql
        return self

    def __exit__(self, *exc):
        from pyspark.sql import DataFrameReader, SparkSession
        from pyspark.sql.pandas.group_ops import (
            PandasCogroupedOps,
            PandasGroupedOpsMixin,
        )
        from pyspark.sql.pandas.map_ops import PandasMapOpsMixin

        PandasMapOpsMixin.mapInPandas = self._orig["map"]
        PandasGroupedOpsMixin.applyInPandas = self._orig["grouped"]
        PandasCogroupedOps.applyInPandas = self._orig["cogrouped"]
        DataFrameReader.parquet = self._orig["parquet"]
        SparkSession.sql = self._orig["sql"]
        return False


def _parse_speculation_eventlog(log_dir: str) -> dict[str, dict]:
    """Per-job-group speculative TaskStart / killed-attempt counts.
    Rolling part files ordered by their NUMERIC index (events_10_*
    after events_9_*)."""
    agg: dict[str, dict] = defaultdict(
        lambda: {"speculative_started": 0, "killed_attempts": 0, "n_tasks": 0}
    )

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
                key=_idx,
            ))
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
                    elif kind == "SparkListenerTaskStart":
                        group = stage_to_group.get(ev.get("Stage ID"))
                        info = ev.get("Task Info") or {}
                        if not group:
                            continue
                        agg[group]["n_tasks"] += 1
                        if info.get("Speculative"):
                            agg[group]["speculative_started"] += 1
                    elif kind == "SparkListenerTaskEnd":
                        group = stage_to_group.get(ev.get("Stage ID"))
                        reason = ev.get("Task End Reason") or {}
                        if group and reason.get("Reason") == "TaskKilled":
                            agg[group]["killed_attempts"] += 1
    return dict(agg)


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    quick = "--quick" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    out_path = (
        Path(argv[1]) if len(argv) > 1
        else (None if quick else REPO / "SPECULATION_DETERMINISM.json")
    )

    # workers/executors are separate processes whose Python workers
    # inherit os.environ, not this process' sys.path
    existing = os.environ.get("PYTHONPATH", "")
    if str(REPO) not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = str(REPO) + (
            os.pathsep + existing if existing else "")
    os.environ.setdefault("PYSPARK_PYTHON", sys.executable)

    shutil.rmtree(EVENTLOG_DIR, ignore_errors=True)
    os.makedirs(EVENTLOG_DIR, exist_ok=True)

    from etl_process_spark.session import get_spark

    if quick:
        plan = [(PYTHON_FAMILIES[0], False), (JVM_QUERIES[0], True)]
    else:
        plan = [(q, False) for q in PYTHON_FAMILIES] + [
            (q, True) for q in JVM_QUERIES
        ]

    results: dict[str, dict] = {}
    failures = 0
    with MiniCluster(tag="spec") as master_url:
        spark = get_spark(
            "speculation_determinism",
            master=master_url,
            extra_conf={
                "spark.driver.host": MASTER_HOST,
                "spark.executor.memory": "2g",
                "spark.executor.cores": "4",
                "spark.cores.max": "8",
                "spark.sql.shuffle.partitions": "8",
                "spark.locality.wait": "0s",
                "spark.speculation": "true",
                # check often; speculate once 20% of a stage's tasks
                # are done (the default 0.75 can never be reached when
                # 1/3 of the partitions straggle)
                "spark.speculation.interval": "100ms",
                "spark.speculation.quantile": "0.2",
                "spark.speculation.multiplier": "1.5",
                # single-task stages (tiny sf0.01 scans, global merges)
                # have no sibling median to compare against — the
                # duration threshold lets their stragglers speculate
                # too (applies to stages with <= one executor's slots)
                "spark.speculation.task.duration.threshold": "5s",
                "spark.eventLog.enabled": "true",
                "spark.eventLog.dir": f"file://{EVENTLOG_DIR}",
                "spark.eventLog.compress": "false",
            },
        )
        global _SPEC_ACC
        _SPEC_ACC = spark.sparkContext.accumulator(0)
        sc = spark.sparkContext

        for name, wrap_scans in plan:
            sc.setLocalProperty("spark.jobGroup.id", f"base::{name}")
            try:
                base_hash, base_rows = _result_hash(spark, sf_dir, name)
            except Exception as exc:  # noqa: BLE001
                results[name] = {
                    "ok": False,
                    "error": f"baseline: {type(exc).__name__}: {exc}"[:300],
                }
                failures += 1
                continue
            finally:
                sc.setLocalProperty("spark.jobGroup.id", None)

            def _speculated(wrap_sql: bool) -> dict:
                before = _SPEC_ACC.value
                sc.setLocalProperty("spark.jobGroup.id", f"spec::{name}")
                try:
                    with _Straggler(wrap_scans=wrap_scans, wrap_sql=wrap_sql):
                        spec_hash, spec_rows = _result_hash(spark, sf_dir, name)
                finally:
                    sc.setLocalProperty("spark.jobGroup.id", None)
                speculated = _SPEC_ACC.value - before
                label = "sql" if wrap_sql else (
                    "scan" if wrap_scans else "python_stage")
                return {
                    # provisional: finalized after the event log is
                    # parsed (a speculative duplicate that LOST the
                    # commit race to its original still proves the race
                    # ran — it just never updates the accumulator,
                    # whose adds only survive from winning attempts)
                    "ok": spec_hash == base_hash and speculated > 0,
                    "hash_match": spec_hash == base_hash,
                    "rows": base_rows,
                    "rows_speculated": spec_rows,
                    "hash": base_hash,
                    "hash_speculated": spec_hash,
                    "speculative_attempts_at_operator": speculated,
                    "injection": label,
                }

            try:
                res = _speculated(wrap_sql=False)
                if res["speculative_attempts_at_operator"] == 0 and wrap_scans:
                    # builder reads via SQL path-table syntax (bypasses
                    # DataFrameReader.parquet) — straggle the final stage
                    res = _speculated(wrap_sql=True)
                ok = res["ok"]
            except Exception as exc:  # noqa: BLE001 — record, keep going
                ok = False
                res = {"ok": False,
                       "error": f"{type(exc).__name__}: {exc}"[:300],
                       "injection": "scan" if wrap_scans else "python_stage"}
            failures += 0 if ok else 1
            results[name] = res
            print(json.dumps({"query": name, **res}), flush=True)

        # stamp each suite member with the injection FAMILY it stands
        # in for — observed from its builder (tools/family_census),
        # not asserted from memory — so a future corpus addition with
        # a new Python-stage family visibly falls outside this suite
        fams = query_families(spark, sf_dir, [q for q, _ in plan])
        for name, fam in fams.items():
            if name in results:
                results[name]["family"] = fam

        spark.stop()  # flush the event log before parsing

    spec_log = _parse_speculation_eventlog(EVENTLOG_DIR)
    for name, res in results.items():
        m = spec_log.get(f"spec::{name}")
        if m:
            res["eventlog"] = m
        # finalize: speculation is proven by EITHER counter — the
        # accumulator (duplicate ran the hooked operator AND won) or
        # the event log's speculative TaskStarts (a duplicate was
        # launched and raced, even if the original won). hash equality
        # is non-negotiable either way.
        if not res.get("ok") and res.get("hash_match"):
            if (m or {}).get("speculative_started", 0) > 0:
                res["ok"] = True
    failures = sum(1 for r in results.values() if not r.get("ok"))

    coverage: dict[str, list[str]] = {}
    for name, res in results.items():
        for fam in res.get("family", []):
            coverage.setdefault(fam, []).append(name)
    summary = {
        "n_queries": len(results),
        "n_ok": len(results) - failures,
        "sleep_every": SLEEP_EVERY,
        "sleep_sec": SLEEP_SEC,
        "family_coverage": coverage,
        "topology": (f"standalone master {MASTER_HOST} (dynamic port) + "
                     f"workers on {WORKER_HOSTS} (distinct loopback "
                     "hostnames so speculative copies can cross 'hosts')"),
        "sf_dir": sf_dir,
        "mode": "quick" if quick else "suite",
        "note": ("ok requires hash_speculated == hash AND a proven "
                 "speculative race: either the accumulator (>0 means a "
                 "duplicate ran the hooked operator and WON — no task "
                 "ever fails here, so attempt>0 is speculation by "
                 "construction) or the event log's speculative "
                 "TaskStarts (a duplicate launched and raced even if "
                 "the original won). killed_attempts counts the losing "
                 "side of each race."),
        "results": results,
    }
    if out_path is not None:
        out_path.write_text(json.dumps(summary, indent=1) + "\n")
        print(f"wrote {out_path}: {summary['n_ok']}/{summary['n_queries']} ok",
              flush=True)
    else:
        print(json.dumps(summary), flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

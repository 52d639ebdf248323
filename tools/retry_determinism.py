"""Task-retry determinism rehearsal (100 TB operational claim #2).

At cluster scale, task retries and speculative duplicates are routine:
a 1000-executor job WILL lose tasks to preemption, OOM-kills and node
failures, and Spark recovers by re-running them from lineage / shuffle
blocks. The engine's determinism claims (md5 sampling gates, pinned
tie-breaks, exact-integer boundaries, order-exact Arrow blocks) imply
the recomputed result is bit-identical — this tool TESTS that instead
of assuming it.

Mechanism: a fresh SparkSession with ``master=local[8, 3]`` (the second
slot is ``spark.task.maxFailures`` — local mode defaults to 1, where
any task failure kills the job). Two injection surfaces:

* **Python stages** (the paths where ordering bugs would hide): the
  tool monkeypatches ``DataFrame.mapInPandas``, ``GroupedData.
  applyInPandas`` and ``PandasCogroupedOps.applyInPandas`` so every
  user function raises on its FIRST attempt in every third partition
  (``TaskContext.attemptNumber() == 0 and partitionId % 3 == 0``).
  This fails the exact task that runs the media decode / Arrow kNN
  cogroup / Misra-Gries logic; the retry re-reads its input split or
  shuffle blocks and must reproduce the same Arrow batches.
* **JVM queries** (no Python boundary to hook): the tool wraps
  ``DataFrameReader.parquet`` to append a fail-once identity
  ``mapInPandas`` over every scan, so first attempts of scan-stage
  tasks fail and the whole lineage above the retried split recomputes.

Each query runs twice at sf0.01 — baseline (no injection) and injected
— and the canonicalized sorted row sets (differential._rows_to_canonical,
the same canonicalization the DuckDB gate hashes) must be IDENTICAL.
A pass means a retried task cannot flip a sample gate, reorder a
tie-break, or shift a floating-point reduction enough to change any
emitted value.

Known scope limit (documented, not hidden): injected failures occur in
stages containing the hooked operator (scan stages for JVM queries,
the Python stage itself for Python families). Post-shuffle JVM-only
stages never fail first-attempt here; their retry path is the same
shuffle-block re-read Spark uses for the covered stages.

Usage: python tools/retry_determinism.py [sf_dir] — prints one JSON
line per query and a final summary JSON; exits nonzero on any mismatch.
Invoked by tests/test_retry_determinism.py as a subprocess (the shared
test session runs plain local[4] and cannot retry tasks).

``--all [out.json]`` runs the WHOLE registered corpus instead of the
12-query suite, with BOTH injection surfaces active at once (scan
identity wrap + Python-stage hooks), and writes the summary as a JSON
artifact (default RETRY_DETERMINISM.json) — the corpus-wide form of
the claim, refreshed per round like the differentials.
"""

from __future__ import annotations

import functools
import hashlib
import inspect
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

FAIL_EVERY = 3  # partitions with pid % FAIL_EVERY == 0 fail attempt 0

# set in main(); counts retry attempts that ran through a hooked
# operator, so the harness can PROVE injection happened (a query whose
# injected run never retried would be vacuously "deterministic")
_RETRY_ACC = None

# one query per Python-stage family + determinism-sensitive JVM queries
PYTHON_FAMILIES = [
    "image_decode_stats",        # mapInPandas PNG decode over scan
    "image_phash_dup_pairs",     # decode-once checkpoint + LSH join
    "audio_feature_stats",       # WAV decode
    "video_phash_dup_pairs",     # packed-PNG frame decode + temporal vote
    "margin_bitext_pairs",       # cell-cogrouped Arrow kNN (numpy blocks)
    "heavy_hitter_order_groups", # Misra-Gries partial sketches
]
JVM_QUERIES = [
    "tokenizer_bpe_deep_merges", # iterative delta BPE (driver loop)
    "part_bfs_reach",            # frontier BFS (localCheckpoint rounds)
    "neardup_clusters_star",     # alternating star CC
    "balanced_lang_sample",      # md5 sampling gate (retry-stability claim)
    "leakage_safe_split",        # md5 split assignment
    "simhash_dup_pairs",         # banded near-dup join
]


def _fail_first_attempt(fn):
    """Wrap a pandas-UDF-shaped function so its task fails on attempt 0
    of every FAIL_EVERY-th partition. The wrapper must preserve the
    original POSITIONAL ARITY — pyspark.worker dispatches grouped /
    cogrouped functions on ``len(getfullargspec(f).args)``, which a
    ``*args`` wrapper would report as 0 — so an exact-arity wrapper is
    generated per original signature."""
    acc = _RETRY_ACC

    def guard():
        from pyspark import TaskContext

        tc = TaskContext.get()
        if tc is not None and tc.partitionId() % FAIL_EVERY == 0:
            if tc.attemptNumber() == 0:
                raise RuntimeError(
                    f"injected first-attempt failure pid={tc.partitionId()}"
                )
            if acc is not None:
                acc.add(1)  # a retry attempt reached the hooked operator

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


class _Injector:
    """Context manager installing the failure hooks.

    ``wrap_sql`` covers builders that read through SQL path-table
    syntax (``FROM parquet.`...```), which never touches
    DataFrameReader.parquet: the SparkSession.sql RESULT gains a
    fail-once identity, so the injected failure lands in the query's
    FINAL stage and the retry re-reads shuffle blocks — the
    post-shuffle-stage analog of the scan-stage injection."""

    def __init__(self, wrap_scans: bool, wrap_sql: bool = False):
        self.wrap_scans = wrap_scans
        self.wrap_sql = wrap_sql

    def __enter__(self):
        # Patch the MIXINS, not pyspark.sql.DataFrame: the classic
        # DataFrame subclass defines its own mapInPandas that delegates
        # to ``PandasMapOpsMixin.mapInPandas(self, ...)`` by explicit
        # attribute reference, so a patch on the base class is shadowed
        # and never fires (observed: media queries ran injection-free).
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
            return orig["map"](df, _fail_first_attempt(func), schema, *a, **kw)

        def grouped_apply(g, func, schema):
            return orig["grouped"](g, _fail_first_attempt(func), schema)

        def cogrouped_apply(cg, func, schema):
            return orig["cogrouped"](cg, _fail_first_attempt(func), schema)

        PandasMapOpsMixin.mapInPandas = map_in_pandas
        PandasGroupedOpsMixin.applyInPandas = grouped_apply
        PandasCogroupedOps.applyInPandas = cogrouped_apply

        if self.wrap_scans:

            def parquet(reader, *paths, **options):
                df = orig["parquet"](reader, *paths, **options)

                def identity(it):
                    yield from it

                # plain mapInPandas here — the monkeypatched one above
                # would double-wrap, which is harmless but noisy
                return orig["map"](df, _fail_first_attempt(identity), df.schema)

            DataFrameReader.parquet = parquet

        if self.wrap_sql:

            def sql(session, *a, **kw):
                df = orig["sql"](session, *a, **kw)

                def identity(it):
                    yield from it

                return orig["map"](df, _fail_first_attempt(identity), df.schema)

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


def _result_hash(spark, sf_dir: str, name: str) -> tuple[str, int]:
    from etl_process_spark.queries import QUERIES
    from etl_process_spark.queries.differential import _rows_to_canonical

    df = QUERIES[name].builder(spark, sf_dir)
    rows = [tuple(r) for r in df.collect()]
    canon = _rows_to_canonical(df.columns, rows)
    h = hashlib.md5()
    for r in canon:
        h.update("\x1f".join(r).encode())
        h.update(b"\x1e")
    return h.hexdigest(), len(rows)


def main() -> None:
    argv = [a for a in sys.argv[1:] if not a.startswith("--")]
    run_all = "--all" in sys.argv
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    out_path = Path(argv[1]) if len(argv) > 1 else (
        Path(__file__).resolve().parent.parent / "RETRY_DETERMINISM.json"
    )

    from etl_process_spark.session import get_spark

    # local[8, 3]: 8 worker threads, tasks retried up to 3 attempts —
    # the injector fails only attempt 0, so every injected task
    # succeeds on its first retry with headroom left
    spark = get_spark(
        "retry_determinism",
        master="local[8, 3]",
        extra_conf={"spark.sql.shuffle.partitions": "8"},
    )
    global _RETRY_ACC
    _RETRY_ACC = spark.sparkContext.accumulator(0)

    if run_all:
        from etl_process_spark.queries import QUERIES

        # corpus-wide artifact mode: both surfaces at once — every scan
        # gains a fail-once identity AND every Python stage fails its
        # first attempt in the sampled partitions
        plan = [(q, True) for q in sorted(QUERIES)]
    else:
        plan = [(q, False) for q in PYTHON_FAMILIES] + [
            (q, True) for q in JVM_QUERIES
        ]

    def _drop_session_state() -> None:
        """Bench-equivalent hygiene between queries: drop every
        persisted block AND the CacheManager's plan registrations.
        Operators that ``persist()`` a partitioned intermediate (CC/LPA
        sym since r12) register its logical plan session-wide; a later
        query building the IDENTICAL plan would silently read the
        earlier query's cache, so its injected run launches no scan
        task and the retry pass goes vacuous (observed: neardup_clusters
        after cluster_canonical_docs — retried_tasks 0 with correct
        rows). clearCache() removes the plan registrations;
        unpersisting the RDDs alone would not."""
        spark.catalog.clearCache()
        for jrdd in spark.sparkContext._jsc.getPersistentRDDs().values():
            jrdd.unpersist(True)

    results: dict[str, dict] = {}
    failures = 0
    for name, wrap_scans in plan:
        _drop_session_state()
        base_hash, base_rows = _result_hash(spark, sf_dir, name)

        def _injected(wrap_sql: bool) -> dict:
            _drop_session_state()  # injected run must recompute everything
            before = _RETRY_ACC.value
            with _Injector(wrap_scans=wrap_scans, wrap_sql=wrap_sql):
                inj_hash, inj_rows = _result_hash(spark, sf_dir, name)
            retried = _RETRY_ACC.value - before
            # retried == 0 would make the pass vacuous — fail loudly
            label = "sql" if wrap_sql else (
                "scan" if wrap_scans else "python_stage")
            return {
                "ok": inj_hash == base_hash and retried > 0,
                "rows": base_rows,
                "rows_injected": inj_rows,
                "hash": base_hash,
                "hash_injected": inj_hash,
                "retried_tasks": retried,
                "injection": label,
            }

        try:
            res = _injected(wrap_sql=False)
            if res["retried_tasks"] == 0:
                # builder never touched a hooked surface (e.g. SQL
                # path-table scans bypass DataFrameReader.parquet) —
                # inject via the SQL-result surface instead, which
                # fails the FINAL stage's first attempts
                res = _injected(wrap_sql=True)
            ok = res["ok"]
        except Exception as exc:  # noqa: BLE001 — record, keep going
            ok = False
            res = {"ok": False, "error": f"{type(exc).__name__}: {exc}"[:300],
                   "injection": "scan" if wrap_scans else "python_stage"}
        failures += 0 if ok else 1
        results[name] = res
        print(json.dumps({"query": name, **res}), flush=True)

    summary = {"n_queries": len(results), "n_ok": len(results) - failures,
               "fail_every": FAIL_EVERY, "sf_dir": sf_dir,
               "mode": "all" if run_all else "suite",
               "results": results}
    if run_all:
        out_path.write_text(json.dumps(summary, indent=1) + "\n")
        print(f"wrote {out_path}: {summary['n_ok']}/{summary['n_queries']} ok",
              flush=True)
    else:
        print(json.dumps(summary), flush=True)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()

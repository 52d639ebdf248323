"""Census of Python-stage injection families across the query corpus.

The retry rehearsal covers the whole corpus, but the speculation and
executor-loss rehearsals run a 12-query representative suite on a real
standalone cluster — each suite member STANDS IN for an injection
family (the distinct surfaces where a racing duplicate / lost executor
touches Python-produced data):

* ``mapInPandas``               — Arrow batch streams (media decode)
* ``applyInPandas_grouped``     — grouped Arrow blocks (sketch partials)
* ``applyInPandas_cogrouped``   — cogrouped Arrow blocks (kNN cells)
* ``jvm_only``                  — no Python stage at all (scan / sql
                                  injection surfaces)

This module OBSERVES the families instead of asserting them from
memory: a recorder hook on the three pandas mixins runs each query's
BUILDER (driver-side plan construction — iterative builders execute
their small rounds, so run it at a small sf) and records which
surfaces fired. The suite tools stamp the observed family per query
into their artifacts, and tests/test_speculation_determinism.py
asserts every family observed anywhere in the corpus has at least one
suite member — so a future corpus addition that introduces a NEW
Python-stage family visibly falls outside the rehearsed set instead
of silently inheriting its coverage claim.

Usage: python tools/family_census.py [sf_dir]   (prints the corpus
census as JSON; default /root/testdata/sf0.001)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SURFACES = ("mapInPandas", "applyInPandas_grouped", "applyInPandas_cogrouped")


class _Recorder:
    """Context manager: record which pandas surfaces are used while
    building DataFrames (no failure injection — observation only)."""

    def __init__(self):
        self.seen: set[str] = set()

    def __enter__(self):
        from pyspark.sql.pandas.group_ops import (
            PandasCogroupedOps,
            PandasGroupedOpsMixin,
        )
        from pyspark.sql.pandas.map_ops import PandasMapOpsMixin

        self._orig = {
            "map": PandasMapOpsMixin.mapInPandas,
            "grouped": PandasGroupedOpsMixin.applyInPandas,
            "cogrouped": PandasCogroupedOps.applyInPandas,
        }
        orig, seen = self._orig, self.seen

        def map_in_pandas(df, func, schema, *a, **kw):
            seen.add("mapInPandas")
            return orig["map"](df, func, schema, *a, **kw)

        def grouped_apply(g, func, schema):
            seen.add("applyInPandas_grouped")
            return orig["grouped"](g, func, schema)

        def cogrouped_apply(cg, func, schema):
            seen.add("applyInPandas_cogrouped")
            return orig["cogrouped"](cg, func, schema)

        PandasMapOpsMixin.mapInPandas = map_in_pandas
        PandasGroupedOpsMixin.applyInPandas = grouped_apply
        PandasCogroupedOps.applyInPandas = cogrouped_apply
        return self

    def __exit__(self, *exc):
        from pyspark.sql.pandas.group_ops import (
            PandasCogroupedOps,
            PandasGroupedOpsMixin,
        )
        from pyspark.sql.pandas.map_ops import PandasMapOpsMixin

        PandasMapOpsMixin.mapInPandas = self._orig["map"]
        PandasGroupedOpsMixin.applyInPandas = self._orig["grouped"]
        PandasCogroupedOps.applyInPandas = self._orig["cogrouped"]
        return False


def query_families(spark, sf_dir: str, names) -> dict[str, list[str]]:
    """Observed Python surfaces per query (builder-time census);
    ``["jvm_only"]`` when the builder touches none."""
    from etl_process_spark.queries import QUERIES

    out: dict[str, list[str]] = {}
    for name in names:
        rec = _Recorder()
        with rec:
            QUERIES[name].builder(spark, sf_dir)
        out[name] = sorted(rec.seen) if rec.seen else ["jvm_only"]
    return out


def corpus_census(spark, sf_dir: str) -> dict:
    """Families per query for the WHOLE corpus + the family universe."""
    from etl_process_spark.queries import QUERIES

    fams = query_families(spark, sf_dir, sorted(QUERIES))
    universe = sorted({f for v in fams.values() for f in v})
    return {"universe": universe, "queries": fams}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from etl_process_spark.session import get_spark

    spark = get_spark("family_census", master="local[4]",
                      extra_conf={"spark.sql.shuffle.partitions": "4"})
    census = corpus_census(spark, sf_dir)
    counts: dict[str, int] = {}
    for v in census["queries"].values():
        for f in v:
            counts[f] = counts.get(f, 0) + 1
    print(json.dumps({"universe": census["universe"], "counts": counts,
                      "n_queries": len(census["queries"])}, indent=1))


if __name__ == "__main__":
    main()

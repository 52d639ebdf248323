"""Quickstart: the five surfaces of the engine in one runnable script.

    python examples/quickstart.py [sf_dir] [workdir]

1. SQL       — register views, run plain spark.sql (the reference's habit).
2. DataFrame — the same query Catalyst-planned from the API.
3. Warehouse — SCD2 dimension maintenance in the table catalog
               (atomic version swap, time travel).
4. Curation  — near-duplicate detection over the documents table.
5. Streaming — the SAME rollup logic on a file stream, exactly-once.

Each section prints a small result; `tests/test_quickstart.py` runs the
whole script as its regression, so the example can never rot.
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import SparkSession, functions as F


def run(spark: SparkSession, sf_dir: str, workdir: str) -> dict:
    out: dict = {}

    # 1. SQL surface ------------------------------------------------------
    from etl_process_spark.sql import register_testdata_views

    register_testdata_views(spark, sf_dir)
    top = spark.sql(
        """
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders GROUP BY o_orderpriority ORDER BY n_orders DESC LIMIT 3
        """
    )
    out["sql_top_priorities"] = [tuple(r) for r in top.collect()]

    # 2. The same thing via the DataFrame API -----------------------------
    df_top = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
        .orderBy(F.col("n_orders").desc())
        .limit(3)
    )
    out["df_top_priorities"] = [tuple(r) for r in df_top.collect()]
    assert out["sql_top_priorities"] == out["df_top_priorities"]

    # 3. Warehouse: SCD2 history with atomic version swap -----------------
    from etl_process_spark.operators.scd2 import scd2_current, scd2_init, scd2_merge
    from etl_process_spark.sources.tables import TableCatalog

    cat = TableCatalog(spark, f"{workdir}/warehouse")
    day1 = spark.createDataFrame(
        [(1, "alice", "gold"), (2, "bob", "silver")], "id long, name string, tier string"
    )
    cat.overwrite("customers_hist", scd2_init(day1, "id", ["name", "tier"],
                                              effective_from=F.lit("2024-01-01")))
    day2 = spark.createDataFrame(
        [(1, "alice", "platinum"), (3, "cara", "gold")], "id long, name string, tier string"
    )
    cat.overwrite(
        "customers_hist",
        scd2_merge(cat.read("customers_hist"), day2, "id", ["name", "tier"],
                   new_effective_from=F.lit("2024-01-02"),
                   changed_effective_from=F.lit("2024-01-02")),
    )
    hist = cat.read("customers_hist")
    out["scd2_versions"] = hist.count()          # 4: alice x2, bob, cara
    out["scd2_current"] = scd2_current(hist).count()  # 3 open versions
    out["time_travel_v0"] = cat.read_version("customers_hist", 0).count()  # 2

    # 4. Curation: near-duplicate pairs over documents --------------------
    from etl_process_spark.operators.dedup import allpairs_jaccard

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = allpairs_jaccard(docs, "text", "doc_id")
    out["neardup_pairs"] = pairs.count()

    # 5. Streaming: the same rollup on a file stream, exactly-once --------
    from etl_process_spark.streaming.windows import tumbling_counts

    inbox = Path(workdir) / "inbox"
    inbox.mkdir(parents=True, exist_ok=True)
    # tbl() pins events.ts to session-zone TIMESTAMP (raw driver parquet
    # reads as TIMESTAMP_NTZ, which watermarks reject)
    from etl_process_spark.queries.registry import tbl

    ev = tbl(spark, sf_dir, "events").limit(2000)
    ev.coalesce(1).write.mode("overwrite").parquet(str(inbox / "batch0"))
    stream = (
        spark.readStream.schema(ev.schema)
        .parquet(str(inbox / "batch0"))
    )
    q = (
        tumbling_counts(stream, window_duration="6 hours", watermark="0 seconds")
        .writeStream.format("memory").queryName("quickstart_rollup")
        .outputMode("append")
        .option("checkpointLocation", f"{workdir}/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out["stream_windows"] = spark.table("quickstart_rollup").count()
    return out


def main() -> None:
    from etl_process_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    workdir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp()
    spark = get_spark("quickstart")
    for k, v in run(spark, sf_dir, workdir).items():
        print(f"{k}: {v}")


if __name__ == "__main__":
    main()

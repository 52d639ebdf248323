"""Warehouse table catalog — parquet-backed named tables.

The reference's warehouse is 16 Postgres tables (main.ddl:1-137). Here each
table is a parquet directory under a root, read/written through one catalog
object so every stage shares the same paths and write discipline.

Write discipline (SURVEY §7 "hard parts" (a)): Spark cannot atomically
overwrite a directory it is concurrently reading (it would truncate its own
input). ``overwrite`` therefore writes to a fresh versioned directory and
flips a pointer file — write-temp-then-swap — which also gives readers
snapshot isolation between runs, the parity analog of the reference's
per-script transactional commit (transaction.py:113).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


class TableCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _pointer(self, name: str) -> str:
        return os.path.join(self.root, f"{name}.version.json")

    def _current_dir(self, name: str) -> str | None:
        ptr = self._pointer(name)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            return json.load(fh)["dir"]

    def exists(self, name: str) -> bool:
        return self._current_dir(name) is not None

    def read(self, name: str) -> DataFrame:
        d = self._current_dir(name)
        if d is None:
            raise FileNotFoundError(f"table {name} not initialized under {self.root}")
        return self.spark.read.parquet(d)

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Atomic table rewrite: write new version dir, then flip pointer."""
        old = self._current_dir(name)
        version = 0 if old is None else int(os.path.basename(old).rsplit("_v", 1)[1]) + 1
        new_dir = os.path.join(self.root, f"{name}_v{version}")
        df.write.mode("overwrite").parquet(new_dir)
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"dir": new_dir}, fh)
        os.replace(tmp, self._pointer(name))

    def append(self, name: str, df: DataFrame) -> None:
        """Append sink (reference S8, INSERT...SELECT)."""
        d = self._current_dir(name)
        if d is None:
            self.overwrite(name, df)
        else:
            df.write.mode("append").parquet(d)

    def write_bucketed(
        self,
        name: str,
        df: DataFrame,
        bucket_cols: list[str],
        n_buckets: int,
        sort_cols: list[str] | None = None,
    ) -> None:
        """Bucketed (and optionally sorted) table — the co-located join path.

        Two tables bucketed on the same key with the same bucket count join
        WITHOUT a shuffle (each bucket pair joins locally); bucket-sorted
        data also skips the sort of a sort-merge join. This is the standing
        answer for a fact table joined repeatedly on one key at 100 TB: pay
        the shuffle once at write time, never again at read time.

        Bucketing metadata lives in the session catalog (``saveAsTable``
        with an explicit path — Spark does not read bucket layout from bare
        parquet directories).
        """
        writer = (
            df.write.mode("overwrite")
            .format("parquet")
            .bucketBy(n_buckets, *bucket_cols)
            .option("path", os.path.join(self.root, f"{name}__bucketed"))
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.saveAsTable(name)

    def read_bucketed(self, name: str) -> DataFrame:
        """Read a bucketed table through the catalog (keeps bucket info)."""
        return self.spark.table(name)

    def write_partitioned(
        self, name: str, df: DataFrame, partition_cols: list[str]
    ) -> None:
        """Hive-style partitioned table (dt=.../ directories) with the same
        versioned-pointer atomicity as ``overwrite``.

        Partition pruning is the cluster-scale form of the reference's
        driver-side file skipping (S5/transaction.py:51 — don't read files
        ≤ watermark): a predicate on the partition column eliminates whole
        directories at planning time, so a daily incremental query over a
        100 TB fact table reads one day's files, not all of them. Choose
        coarse, low-cardinality keys (a date, a tenant) — one directory and
        ≥1 file per value; a high-cardinality partition key degenerates
        into millions of tiny files and kills the scan.
        """
        old = self._current_dir(name)
        version = 0 if old is None else int(os.path.basename(old).rsplit("_v", 1)[1]) + 1
        new_dir = os.path.join(self.root, f"{name}_v{version}")
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(new_dir)
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"dir": new_dir}, fh)
        os.replace(tmp, self._pointer(name))

    def write_sorted(
        self, name: str, df: DataFrame, sort_cols: list[str], n_files: int
    ) -> None:
        """Range-partitioned, sorted-within-file layout (data clustering).

        ``repartitionByRange`` gives each output file a DISJOINT value
        range of ``sort_cols`` (sampled range boundaries, one shuffle);
        ``sortWithinPartitions`` orders rows inside each file, so every
        parquet row group carries tight min/max statistics. A predicate
        on the sort column then skips whole files and row groups at scan
        time — the storage-layout half of predicate pushdown, and the
        difference between reading 100 TB and reading the one date range
        a query asks for. This is the write-side complement of
        ``write_partitioned``: partitioning prunes by directory on
        coarse keys; sorted layout prunes by stats on continuous ones
        (timestamps, prices) where per-value directories are infeasible.
        """
        self.overwrite(
            name,
            df.repartitionByRange(n_files, *sort_cols).sortWithinPartitions(
                *sort_cols
            ),
        )

    def compact(
        self,
        name: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        cluster_by: list[str] | None = None,
    ) -> int:
        """Rewrite a table into ~target-sized files; returns the new file
        count.

        Append sinks (S8) and streaming sinks accrete small files; at scale
        a scan's task count — and the namenode's metadata load — is
        file-bound, so periodic compaction is standing maintenance for any
        append table. Sizing uses the CURRENT on-disk bytes (true post-
        compression size), not row counts; the rewrite reuses the
        versioned-pointer swap, so readers see either the old or the new
        layout, never a mix.

        ``cluster_by`` re-CLUSTERS while compacting (the OPTIMIZE ...
        ZORDER BY maintenance verb): files get disjoint sort-key ranges
        + in-file order, so the rewrite that was already being paid for
        file-count hygiene also restores stats-based data skipping that
        appends erode — pass a Z-order key (operators/zorder.py) to
        cluster on two dimensions at once.
        """
        d = self._current_dir(name)
        if d is None:
            raise FileNotFoundError(f"table {name} not initialized under {self.root}")
        total = sum(
            os.path.getsize(os.path.join(dirpath, f))
            for dirpath, _, files in os.walk(d)
            for f in files
            if f.endswith(".parquet")
        )
        n_files = max(1, -(-total // int(target_file_bytes)))
        cur = self.read(name)
        if cluster_by:
            self.overwrite(
                name,
                cur.repartitionByRange(n_files, *cluster_by)
                .sortWithinPartitions(*cluster_by),
            )
            new_dir = self._current_dir(name)
            return sum(
                1
                for dirpath, _, files in os.walk(new_dir)
                for f in files
                if f.endswith(".parquet")
            )
        self.overwrite(name, cur.repartition(n_files))
        new_dir = self._current_dir(name)
        return sum(
            1
            for dirpath, _, files in os.walk(new_dir)
            for f in files
            if f.endswith(".parquet")
        )

    def versions(self, name: str) -> list[int]:
        """All retained version numbers of a table, oldest first.

        ``overwrite``/``compact`` never delete prior version directories —
        each rewrite is a full snapshot, so history is retained for free.
        """
        import re

        pat = re.compile(rf"^{re.escape(name)}_v(\d+)$")
        out = sorted(
            int(m.group(1))
            for d in os.listdir(self.root)
            if (m := pat.match(d)) and os.path.isdir(os.path.join(self.root, d))
        )
        return out

    def read_version(self, name: str, version: int) -> DataFrame:
        """Time travel: read a specific retained snapshot of a table.

        The lakehouse pattern in miniature — an auditor re-runs last
        week's fraud report against the dimension table AS IT WAS, without
        restoring backups. (SCD2 gives row-level history inside a version;
        this gives table-level history across rewrites.)
        """
        d = os.path.join(self.root, f"{name}_v{version}")
        if not os.path.isdir(d):
            raise FileNotFoundError(
                f"table {name} has no version {version}; have {self.versions(name)}"
            )
        return self.spark.read.parquet(d)

    def vacuum(self, name: str, keep_last: int = 2) -> list[int]:
        """Drop all but the newest ``keep_last`` version directories;
        returns the dropped version numbers. The live pointer target is
        never dropped. Retention is the storage-cost counterweight to
        ``read_version`` — history is snapshots, so old versions cost
        full-table storage until vacuumed."""
        import shutil

        if keep_last < 1:
            raise ValueError("keep_last must be >= 1")
        live = self._current_dir(name)
        vs = self.versions(name)
        dropped = []
        for v in vs[:-keep_last] if keep_last < len(vs) else []:
            d = os.path.join(self.root, f"{name}_v{v}")
            if d == live:
                continue
            shutil.rmtree(d)
            dropped.append(v)
        return dropped

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

    def _read_pointer(self, name: str) -> dict | None:
        ptr = self._pointer(name)
        if not os.path.exists(ptr):
            return None
        with open(ptr) as fh:
            return json.load(fh)

    def _write_pointer(self, name: str, payload: dict) -> None:
        tmp = self._pointer(name) + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(payload, fh)
        os.replace(tmp, self._pointer(name))

    def _current_dirs(self, name: str) -> list[str] | None:
        p = self._read_pointer(name)
        if p is None:
            return None
        return p["dirs"] if "dirs" in p else [p["dir"]]

    def _current_dir(self, name: str) -> str | None:
        ds = self._current_dirs(name)
        if ds is None:
            return None
        if len(ds) != 1:
            raise ValueError(
                f"table {name} is a segment log ({len(ds)} segments); "
                "compact it before using single-directory operations"
            )
        return ds[0]

    def exists(self, name: str) -> bool:
        return self._current_dirs(name) is not None

    def read(self, name: str) -> DataFrame:
        ds = self._current_dirs(name)
        if ds is None:
            raise FileNotFoundError(f"table {name} not initialized under {self.root}")
        return self.spark.read.parquet(*ds)

    def _next_version(self, name: str) -> int:
        vs = self.versions(name)
        return (vs[-1] + 1) if vs else 0

    def overwrite(self, name: str, df: DataFrame) -> None:
        """Atomic table rewrite: write new version dir, then flip pointer.

        If the table was a segment log, the rewrite consolidates it back
        to one directory; committed segment ids stay acknowledged via
        ``compacted_through`` so ``has_segment`` (the streaming replay
        guard) still reports them as applied.
        """
        old = self._read_pointer(name) or {}
        new_dir = os.path.join(self.root, f"{name}_v{self._next_version(name)}")
        df.write.mode("overwrite").parquet(new_dir)
        payload: dict = {"dir": new_dir}
        seg_ids = [int(s) for s in old.get("segments", {})]
        thru = max([old.get("compacted_through", -1), *seg_ids] or [-1])
        if thru >= 0:
            payload["compacted_through"] = thru
        self._write_pointer(name, payload)

    def append_segment(self, name: str, df: DataFrame, segment_id: int) -> None:
        """Append-only log write: persist ``df`` as segment ``segment_id``
        and commit it with one atomic pointer swap — O(segment) bytes
        written per call instead of ``overwrite``'s O(table) rewrite.

        Idempotent per segment id: a replayed (crashed-and-rerun) epoch
        rewrites the same segment directory with the same deterministic
        content and re-commits the same pointer, so a crash at any step
        leaves either the old pointer (orphan dir, rewritten on replay)
        or the new one (segment fully visible). Readers see the union of
        all committed segments through ``read``. Periodic ``compact``
        (or ``overwrite``) folds the log back to one directory.
        """
        old = self._read_pointer(name)
        seg_dir = os.path.join(self.root, f"{name}_seg{int(segment_id):08d}")
        df.write.mode("overwrite").parquet(seg_dir)
        if old is None:
            payload: dict = {"dirs": [seg_dir], "segments": {str(int(segment_id)): seg_dir}}
        else:
            dirs = old["dirs"] if "dirs" in old else [old["dir"]]
            segments = dict(old.get("segments", {}))
            segments[str(int(segment_id))] = seg_dir
            if seg_dir not in dirs:
                dirs = dirs + [seg_dir]
            payload = {"dirs": dirs, "segments": segments}
            if "compacted_through" in old:
                payload["compacted_through"] = old["compacted_through"]
        self._write_pointer(name, payload)

    def has_segment(self, name: str, segment_id: int) -> bool:
        """True iff ``segment_id`` was committed (directly, or subsumed by
        a later compaction) — the streaming sink's epoch-replay guard."""
        p = self._read_pointer(name)
        if p is None:
            return False
        sid = int(segment_id)
        if sid <= p.get("compacted_through", -1):
            return True
        return str(sid) in p.get("segments", {})

    def segment_count(self, name: str) -> int:
        p = self._read_pointer(name) or {}
        return len(p.get("dirs", []))

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
        new_dir = os.path.join(self.root, f"{name}_v{self._next_version(name)}")
        df.write.mode("overwrite").partitionBy(*partition_cols).parquet(new_dir)
        self._write_pointer(name, {"dir": new_dir})

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
        ds = self._current_dirs(name)
        if ds is None:
            raise FileNotFoundError(f"table {name} not initialized under {self.root}")
        total = sum(
            os.path.getsize(os.path.join(dirpath, f))
            for d in ds
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
        live = set(self._current_dirs(name) or [])
        vs = self.versions(name)
        dropped = []
        for v in vs[:-keep_last] if keep_last < len(vs) else []:
            d = os.path.join(self.root, f"{name}_v{v}")
            if d in live:
                continue
            shutil.rmtree(d)
            dropped.append(v)
        return dropped

"""Dated-inbox file protocol (reference S5/S9/O1).

The reference discovers input files by glob, parses the load date out of the
``DDMMYYYY`` filename segment, processes them oldest-first, skips files at or
below the watermark, and archives each processed file to
``archive/<name>.backup`` (py_scripts/transaction.py:26-28,49-51,88).

This is the batch analog of a streaming source's offset tracking; the
date-skip is the file-level partition-pruning analog — files the watermark
excludes are never handed to ``spark.read`` at all.
"""

from __future__ import annotations

import datetime as dt
import glob
import os
import re
from dataclasses import dataclass

_DATE_RE = re.compile(r"(\d{8})")


def parse_file_date(path: str) -> dt.date:
    """``transactions_01012021.txt`` -> date(2021, 1, 1) (DDMMYYYY)."""
    name = os.path.basename(path)
    m = _DATE_RE.search(name)
    if not m:
        raise ValueError(f"no DDMMYYYY date in filename: {name}")
    raw = m.group(1)
    return dt.date(int(raw[4:8]), int(raw[2:4]), int(raw[0:2]))


@dataclass
class DatedInbox:
    """Discover, order, filter and archive dated input files."""

    directory: str
    pattern: str  # e.g. "transactions_*.txt"

    def discover(self, after: dt.date | None = None) -> list[tuple[dt.date, str]]:
        """(date, path) pairs sorted oldest-first, strictly after `after`.

        Oldest-first ordering is load-bearing for SCD2 correctness — versions
        must be applied in event order (reference transaction.py:28 sorts by
        the filename date re-sliced to YYYYMMDD).
        """
        found = []
        for path in glob.glob(os.path.join(self.directory, self.pattern)):
            d = parse_file_date(path)
            if after is None or d > after:
                found.append((d, path))
        return sorted(found)

    def archive(self, path: str) -> str:
        """Move a processed file to ``archive/<name>.backup`` (S9)."""
        archive_dir = os.path.join(self.directory, "archive")
        os.makedirs(archive_dir, exist_ok=True)
        dest = os.path.join(archive_dir, os.path.basename(path) + ".backup")
        os.rename(path, dest)
        return dest

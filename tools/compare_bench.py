"""Diff two bench recordings query-by-query.

Usage:
  python tools/compare_bench.py                  # BENCH.json vs git HEAD's
  python tools/compare_bench.py OLD.json NEW.json

Prints regressions (slower) and wins (faster) beyond a 1.3x band plus
queries present on only one side — the review loupe for "did this round
get faster or slower, and where".
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _load(src: str) -> dict[str, float]:
    if src == "HEAD":
        txt = subprocess.run(
            ["git", "-C", str(ROOT), "show", "HEAD:BENCH.json"],
            capture_output=True, text=True,
        ).stdout
    else:
        txt = Path(src).read_text()
    d = json.loads(txt)
    return d.get("queries", d)


def main() -> None:
    if len(sys.argv) >= 3:
        old, new = _load(sys.argv[1]), _load(sys.argv[2])
        labels = (sys.argv[1], sys.argv[2])
    else:
        old, new = _load("HEAD"), _load(str(ROOT / "BENCH.json"))
        labels = ("HEAD:BENCH.json", "BENCH.json")
    both = sorted(set(old) & set(new))
    rows = [(new[q] / old[q] if old[q] else float("inf"), q) for q in both]
    total_old = sum(old[q] for q in both)
    total_new = sum(new[q] for q in both)
    print(f"{labels[0]} -> {labels[1]}")
    print(f"shared {len(both)} queries: {total_old:.1f}s -> {total_new:.1f}s "
          f"({total_new / total_old:.2f}x)")
    for title, sel in (
        ("slower >1.3x", [r for r in rows if r[0] > 1.3]),
        ("faster >1.3x", [r for r in rows if r[0] < 1 / 1.3]),
    ):
        sel.sort(reverse=(title.startswith("slower")))
        print(f"\n{title}: {len(sel)}")
        for ratio, q in sel[:15]:
            print(f"  {q}: {old[q]:.2f}s -> {new[q]:.2f}s ({ratio:.2f}x)")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"\nremoved: {', '.join(only_old)}")
    if only_new:
        print(f"\nadded ({len(only_new)}): "
              + ", ".join(f"{q} ({new[q]:.2f}s)" for q in only_new))


if __name__ == "__main__":
    main()

"""Deep-BPE delta-trainer decay evidence (round 5, VERDICT item 2).

The delta trainer's pitch is that per-round work is O(affected rows),
which SHRINKS as merges rarify — the asymmetry that makes a 50k-merge
tokenizer trainable at 100 TB. This tool runs the trainer at a
production-ish round count over sf0.1 and records the per-round
affected-stream-row count (the quantity that bounds each round's delta
shuffle), then asserts the decay:

* round 1 (the most frequent pair in the corpus) is the maximum, and
* the trailing third of rounds averages well below the leading third.

Run serially (bench-contention discipline):
    python tools/bench_bpe_decay.py [sf_dir] [rounds]
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    sys.path.insert(0, "/root/repo")
    from etl_process_spark.operators.text import bpe_merge_rounds_delta
    from etl_process_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 24
    spark = get_spark("bpe-decay")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    affected: list[int] = []
    t0 = time.time()
    merges = bpe_merge_rounds_delta(
        docs, "text", rounds=rounds, affected_counts=affected
    ).collect()
    wall = time.time() - t0

    assert len(merges) == rounds
    assert len(affected) == rounds - 1  # no delta after the final round
    third = max(1, len(affected) // 3)
    lead = sum(affected[:third]) / third
    trail = sum(affected[-third:]) / third
    out = {
        "sf_dir": sf_dir,
        "rounds": rounds,
        "wall_sec": round(wall, 1),
        "affected_per_round": affected,
        "lead_third_avg": round(lead, 1),
        "trail_third_avg": round(trail, 1),
        "decay_ratio": round(trail / lead, 4) if lead else None,
    }
    print(json.dumps(out))
    assert affected[0] == max(affected), (
        "round 1 should touch the most rows (it merges the corpus-wide "
        f"most frequent pair): {affected}"
    )
    assert trail < 0.7 * lead, (
        f"per-round affected rows did not decay (lead {lead} -> trail "
        f"{trail}): the O(affected) claim needs re-examination"
    )


if __name__ == "__main__":
    main()

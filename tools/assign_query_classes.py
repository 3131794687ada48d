#!/usr/bin/env python3
"""Assign each benched query a workload CLASS for per-class host
normalization (VERDICT r13 item 2).

The r13 adjudication proved host drift is workload-class-shaped:
between the two committed baseline generations, scan-bound queries
moved ~1.0x while hash/expression-bound queries moved 1.4-2.1x — a
single scalar host_factor can mask a real scan-class regression on an
expression-slow host. The calibrator trio spans the classes, so each
query is normalized by ITS class's calibrator factor.

Assignment is EMPIRICAL, not hand-judged: each query's observed
cross-generation drift ratio (current BENCH_BASELINE.json vs the
pre-rotation baseline kept in git) is matched to the NEAREST (in log
space) calibrator drift anchor:

    scan       q1_pricing_summary   1.046x
    shuffle    q18_large_orders     1.198x
    expression cms_heavy_hitters    2.068x

Queries absent from either snapshot, or too small for a stable ratio
(< 0.3 s in either generation — sub-noise-band, and the regression
contract ignores baselines <= 0.5 s anyway), stay unassigned and the
contract falls back to the scalar geomean factor for them.

Usage: python tools/assign_query_classes.py [old_ref] > then commits
bench_query_classes.json at the repo root. Regenerate only when the
baseline rotates to a new host generation.
"""

from __future__ import annotations

import json
import math
import subprocess
import sys

OLD_REF = sys.argv[1] if len(sys.argv) > 1 else "25cc5bd"
ANCHORS = {"scan": 1.046, "shuffle": 1.198, "expression": 2.068}
MIN_SECONDS = 0.3


def main() -> None:
    cur = json.load(open("BENCH_BASELINE.json"))["queries"]
    old = json.loads(
        subprocess.run(
            ["git", "show", f"{OLD_REF}:BENCH_BASELINE.json"],
            capture_output=True,
            text=True,
            check=True,
        ).stdout
    )["queries"]
    classes: dict[str, str] = {}
    for name, cur_t in cur.items():
        old_t = old.get(name)
        if not cur_t or not old_t or cur_t < MIN_SECONDS or old_t < MIN_SECONDS:
            continue
        ratio = cur_t / old_t
        classes[name] = min(
            ANCHORS, key=lambda c: abs(math.log(ratio) - math.log(ANCHORS[c]))
        )
    out = {
        "method": "nearest log-space cross-generation drift anchor",
        "old_ref": OLD_REF,
        "anchors": ANCHORS,
        "min_seconds": MIN_SECONDS,
        "classes": dict(sorted(classes.items())),
    }
    with open("bench_query_classes.json", "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=False)
        fh.write("\n")
    from collections import Counter

    print(Counter(classes.values()), f"assigned={len(classes)}")


if __name__ == "__main__":
    main()

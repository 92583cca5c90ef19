"""Merge tools/scale_table.py measurement lines (one JSON object per
(op, scale) run, possibly re-measured — LAST line per key wins unless
an earlier one is strictly faster AND was taken at lower load) into
the sf0.1 -> sf1 ratio table for BASELINE.md.

Usage: python tools/scale_report.py /tmp/scale_lines.jsonl [--md]
"""

from __future__ import annotations

import argparse
import json


def merge(path: str) -> dict[str, dict[str, float]]:
    best: dict[tuple[str, str], dict] = {}
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        rec = json.loads(line)
        key = (rec["op"], rec["scale"])
        cur = best.get(key)
        # min-of-all-runs: re-measures exist precisely because earlier
        # readings were contended, so keep the fastest
        if cur is None or rec["sec"] < cur["sec"]:
            best[key] = rec
    out: dict[str, dict[str, float]] = {}
    for (op, scale), rec in best.items():
        out.setdefault(op, {})[scale] = rec["sec"]
        out[op][f"{scale}_load"] = round(rec["load"], 1)
    for op, v in out.items():
        if "sf01" in v and "sf1" in v and v["sf01"] > 0:
            v["ratio"] = round(v["sf1"] / v["sf01"], 1)
        if "sf01" in v and "sf3" in v and v["sf01"] > 0:
            # the r5 extra decade: 30x data; proportional = 30
            v["ratio30"] = round(v["sf3"] / v["sf01"], 1)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("path")
    ap.add_argument("--md", action="store_true")
    args = ap.parse_args()
    ops = merge(args.path)
    if args.md:
        print("| op | sf0.1 (s) | sf1 (s) | ratio (10x data) |")
        print("|---|---|---|---|")
        for op, v in sorted(ops.items()):
            print(
                f"| {op} | {v.get('sf01', '?')} | {v.get('sf1', '?')} "
                f"| **{v.get('ratio', '?')}x** |"
            )
    else:
        print(json.dumps(ops, indent=1, sort_keys=True))


if __name__ == "__main__":
    main()

"""Summarize a training JSONL log into a markdown learning-curve table.

Usage: python scripts/curve.py runs/r3p1.jsonl [--every 1]

Prints one row per eval entry (rows that carry eval_return), plus a final
best/last summary. Used to record learning curves in docs/PERF.md.
"""

from __future__ import annotations

import argparse
import json


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--every", type=int, default=1,
                    help="print every k-th eval row")
    args = ap.parse_args()

    rows = []
    with open(args.log) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(json.loads(line))

    evals = [r for r in rows if "eval_return" in r]
    if not evals:
        print("no eval rows found")
        return

    print("| update | env steps | eval return (mean ± std) | min / max | "
          "tiles % | ep len |")
    print("|---|---|---|---|---|---|")
    for r in evals[:: args.every]:
        print(
            f"| {r.get('update', '?')} | {r.get('steps', 0):,} "
            f"| {r['eval_return']:+.1f} ± {r.get('eval_return_std', 0):.1f} "
            f"| {r.get('eval_return_min', 0):+.1f} / "
            f"{r.get('eval_return_max', 0):+.1f} "
            f"| {100 * r.get('eval_tiles_frac', 0):.1f} "
            f"| {r.get('eval_len', 0):.0f} |"
        )
    best = max(evals, key=lambda r: r["eval_return"])
    last = evals[-1]
    print(
        f"\nbest: {best['eval_return']:+.1f} at update {best.get('update')} "
        f"({best.get('steps', 0):,} env steps); "
        f"last: {last['eval_return']:+.1f} at update {last.get('update')}"
    )


if __name__ == "__main__":
    main()

"""Full-episode parity sweep vs the reference (VERDICT round-1 #4).

Runs oracle/episodes.py's reference-vs-engine comparison over a grid of
seeds x num_agents x directions, each episode driven to its natural end
(done or the 1000-step TimeLimit) by the deterministic follower, and writes
one JSONL row per episode plus a markdown summary table.

    python scripts/parity_sweep.py --out docs/parity_sweep.jsonl \
        --seeds 20 --agents 1 2 4 --max-steps 1000

CPU-pinned (parity harness; the reference runs on CPU float64). Expect
~10-20 s per episode pair; the full default grid is ~2 h of wall-clock —
run it in the background and use --seeds/--agents/--max-steps to scope.
"""

import argparse
import json
import sys
import time

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from multi_car_racing_tpu.oracle import episodes as ep  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/parity_sweep.jsonl")
    ap.add_argument("--seeds", type=int, default=20)
    ap.add_argument("--agents", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--directions", nargs="+", default=["CCW", "CW"])
    ap.add_argument("--max-steps", type=int, default=1000)
    args = ap.parse_args()

    rows = []
    with open(args.out, "w") as f:
        for n in args.agents:
            for d in args.directions:
                for s in range(args.seeds):
                    t0 = time.time()
                    row = ep.compare_episode(
                        n, seed=100 + s, gseed=200 + s, direction=d,
                        max_steps=args.max_steps,
                    )
                    row["wall_s"] = round(time.time() - t0, 1)
                    rows.append(row)
                    f.write(json.dumps(row) + "\n")
                    f.flush()
                    print(
                        f"n={n} {d} seed={100+s}: done {row['ref_done']}=="
                        f"{row['our_done']} tiles {row['ref_tiles']}~"
                        f"{row['our_tiles']} total_drift {row['total_drift']:.2e} "
                        f"step_err {row['max_step_err_post0']:.2e} "
                        f"({row['wall_s']}s)"
                    )

    # Markdown summary by (agents, direction).
    print("\n| agents | dir | episodes | done match | tiles match | "
          "max total drift | max per-step err (post-t0) |")
    print("|---|---|---|---|---|---|---|")
    for n in args.agents:
        for d in args.directions:
            grp = [r for r in rows
                   if r["num_agents"] == n and r["direction"] == d]
            if not grp:
                continue
            dm = sum(r["ref_done"] == r["our_done"] for r in grp)
            tm = sum(r["ref_tiles"] == r["our_tiles"] for r in grp)
            print(
                f"| {n} | {d} | {len(grp)} | {dm}/{len(grp)} | "
                f"{tm}/{len(grp)} | "
                f"{max(r['total_drift'] for r in grp):.2e} | "
                f"{max(r['max_step_err_post0'] for r in grp):.2e} |"
            )


if __name__ == "__main__":
    main()

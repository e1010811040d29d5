"""Widened chaos-floor evidence for docs/PARITY.md §2 (round-5 item 8).

The N>=2 parity claim is "engine-vs-reference drift is within ~2x the
reference's OWN self-divergence under a 0.1 mm nudge". Round 4 supported
that with 10 seeds, CCW only. This sweep widens it to 30+ seeds x both
directions for BOTH measurements on the same (seed, gseed, direction)
grid, and prints paired statistics with bootstrap 95% CIs:

    python scripts/chaos_floor.py --out docs/parity_selfchaos.jsonl \
        --seeds 32 --agents 2 4

CPU-pinned (the reference runs on CPU float64). Self-divergence runs the
reference twice per row; the engine comparison replays the same recorded
actions through the engine — budget a few seconds per row at n=2 and
~2x that at n=4.
"""

import argparse
import json
import sys
import time

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", ".jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, ".")

from multi_car_racing_tpu.oracle import episodes as ep  # noqa: E402


def bootstrap_ci(x, stat=np.mean, n=2000, seed=0):
    x = np.asarray(x, np.float64)
    rng = np.random.default_rng(seed)
    vals = np.sort([stat(rng.choice(x, x.size, replace=True))
                    for _ in range(n)])
    return float(vals[int(0.025 * n)]), float(vals[int(0.975 * n)])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="docs/parity_selfchaos.jsonl")
    ap.add_argument("--engine-out", default="docs/parity_enginedrift.jsonl")
    ap.add_argument("--seeds", type=int, default=32)
    ap.add_argument("--agents", type=int, nargs="+", default=[2, 4])
    ap.add_argument("--directions", nargs="+", default=["CCW", "CW"])
    ap.add_argument("--perturb", type=float, default=1e-4)
    ap.add_argument("--max-steps", type=int, default=1000)
    args = ap.parse_args()

    # Resume-safe: rows already on disk (from a previous partial run) are
    # kept and skipped — the sweep can be relaunched after a crash.
    import os

    def load(path):
        rows = []
        if os.path.exists(path):
            with open(path) as f:
                rows = [json.loads(ln) for ln in f if ln.strip()]
        return rows

    self_rows, eng_rows = load(args.out), load(args.engine_out)
    have_self = {(r["num_agents"], r["direction"], r["seed"])
                 for r in self_rows}
    have_eng = {(r["num_agents"], r["direction"], r["seed"])
                for r in eng_rows}
    with open(args.out, "a") as fs, open(args.engine_out, "a") as fe:
        for n in args.agents:
            for d in args.directions:
                for s in range(args.seeds):
                    seed, gseed = 100 + s, 200 + s
                    if (n, d, seed) in have_self and (n, d, seed) in have_eng:
                        continue
                    if (n, d, seed) not in have_self:
                        t0 = time.time()
                        row = ep.reference_self_divergence(
                            n, seed, gseed, d, max_steps=args.max_steps,
                            perturb=args.perturb,
                        )
                        row["wall_s"] = round(time.time() - t0, 1)
                        self_rows.append(row)
                        fs.write(json.dumps(row) + "\n")
                        fs.flush()
                    if (n, d, seed) not in have_eng:
                        t0 = time.time()
                        erow = ep.compare_episode(
                            n, seed=seed, gseed=gseed, direction=d,
                            max_steps=args.max_steps,
                        )
                        erow["wall_s"] = round(time.time() - t0, 1)
                        eng_rows.append(erow)
                        fe.write(json.dumps(erow) + "\n")
                        fe.flush()
                    print(f"n={n} {d} seed={seed}: done", flush=True)

    print("\n## Chaos floor vs engine drift "
          f"({args.seeds} seeds x {args.directions}, perturb "
          f"{args.perturb:g})")
    print("| agents | dir | self drift mean [95% CI] | self paired "
          "return diff | engine drift mean [95% CI] | engine paired "
          "diff | drift ratio |")
    print("|---|---|---|---|---|---|---|")
    for n in args.agents:
        for d in args.directions:
            sg = [r for r in self_rows
                  if r["num_agents"] == n and r["direction"] == d]
            eg = [r for r in eng_rows
                  if r["num_agents"] == n and r["direction"] == d]
            sdr = np.array([r["total_drift"] for r in sg])
            edr = np.array([r["total_drift"] for r in eg])
            spd = np.array([sum(r["pert_return"]) - sum(r["ref_return"])
                            for r in sg])
            epd = np.array([sum(r["our_return"]) - sum(r["ref_return"])
                            for r in eg])
            slo, shi = bootstrap_ci(sdr)
            elo, ehi = bootstrap_ci(edr)
            ratio = edr.mean() / max(sdr.mean(), 1e-9)
            print(
                f"| {n} | {d} | {sdr.mean():.0f} [{slo:.0f}, {shi:.0f}] | "
                f"{spd.mean():+.0f} ± {spd.std():.0f} | "
                f"{edr.mean():.0f} [{elo:.0f}, {ehi:.0f}] | "
                f"{epd.mean():+.0f} ± {epd.std():.0f} | {ratio:.2f}x |"
            )


if __name__ == "__main__":
    main()

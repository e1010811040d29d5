"""Full-episode parity vs the reference (VERDICT round-1 #4).

The reference env is driven to its natural episode end (done or the
1000-step TimeLimit, init:8) by the deterministic follower in
oracle/episodes.py; the recorded actions replay open-loop through the
engine. Contract: same termination step, same tile-visit counts, cumulative
return drift < 1e-3, per-step reward error < 1e-5 after the spawn step.

The broad sweep (>=20 seeds x {1,2,4} agents x both directions) runs via
scripts/parity_sweep.py and is recorded in docs/PARITY.md; this in-suite
test keeps one full-length episode under CI.
"""

from multi_car_racing_tpu.oracle import episodes as ep


def test_full_episode_parity_one_agent():
    row = ep.compare_episode(1, 11, 5)
    assert row["steps"] == 1000  # ran to the TimeLimit under the follower
    assert row["ref_done"] == row["our_done"]
    assert row["ref_tiles"] == row["our_tiles"]
    assert row["cum_drift"] < 1e-3, row
    assert row["max_step_err_post0"] < 1e-5, row


def test_full_episode_parity_two_agents_cw():
    row = ep.compare_episode(2, 7, 3, direction="CW", max_steps=500)
    assert row["ref_done"] == row["our_done"]
    assert row["ref_tiles"] == row["our_tiles"]
    # Per-car returns are tie-break-sensitive in multi-agent episodes: when
    # two cars reach a fresh tile within a step of each other, sub-tolerance
    # trajectory noise can flip which is "first visitor", moving the bonus
    # *split* between cars (first = 1000/T, second = half that, mcr:117-120)
    # without changing the sum. The invariants: total return across cars
    # (measured drift ~1e-5 over 500 steps) and per-car tile counts.
    assert row["total_drift"] < 1e-3, row


def test_full_episode_parity_two_agents_full_length():
    """A contact-free 2-agent episode to the full 1000-step TimeLimit
    (VERDICT round-3 #4: past the old 500-step cap). Seed chosen from the
    docs/PARITY.md sweep where the followers' lanes never touch — with a
    car-car contact the comparison is bounded by the reference's own
    Lyapunov divergence instead (docs/PARITY.md section 2)."""
    row = ep.compare_episode(2, 112, 212, direction="CCW", max_steps=1000)
    assert row["steps"] == 1000
    assert row["ref_done"] == row["our_done"]
    assert row["ref_tiles"] == row["our_tiles"]
    assert row["total_drift"] < 1e-3, row
    assert row["max_step_err_post0"] < 1e-5, row


def test_four_agent_prefix_parity():
    """Four agents, pre-contact prefix (every full-length 4-agent episode in
    the sweep hits car-car contact; the 100-step prefix on this seed does
    not). Per-car step rewards may differ by a bonus-split quarter when two
    cars co-visit a tile (documented tie-break, README "Parity contract");
    the conserved quantities are the TOTAL return and per-car tile counts."""
    row = ep.compare_episode(4, 113, 213, direction="CCW", max_steps=100)
    assert row["ref_done"] == row["our_done"]
    assert row["ref_tiles"] == row["our_tiles"]
    assert row["total_drift"] < 1e-3, row

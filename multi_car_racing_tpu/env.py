"""Environment core: EnvState pytree + pure reset/step functions.

Functional equivalent of ``MultiCarRacing`` (mcr:125-509): everything the
reference does through mutable Python objects and Box2D callbacks is a
fixed-shape state transition here, batchable over thousands of envs with
``vmap`` and compiled end-to-end with ``jit``.

Step order preserves the reference's (mcr:410-509 + Box2D internals):
  1. apply controls (steer/gas/brake setters)
  2. tire forces from *lagged* tile contacts (Box2D collides at the start of
     world.Step, so friction sees the previous step's overlap)
  3. contact pass on current positions: tile-visit rewards (the
     FrictionDetector logic, mcr:80-123), friction mask for the next step,
     render color flattening
  4. constraint solve + integration (world_step)
  5. post-step analysis: -0.1 step cost, backward/on-grass flags,
     all-tiles-visited / off-playfield termination (mcr:433-508)

Simultaneous first-visits of one tile by several cars are tie-broken by
car id (lowest id counts as the earlier visitor). The reference inherits
Box2D's contact-manager processing order here, which varies by seed
(SURVEY.md §7 hard part 5); this deterministic rule is the documented
divergence, exercised mainly for the two spawn tiles.
"""

from __future__ import annotations

from functools import lru_cache, partial
import os

import jax
import jax.numpy as jnp
import numpy as np

from . import config as Cfg
from . import config as C
from .struct import pytree_dataclass
from .track.common import Track, pack_track, spawn_poses
from .physics import collide, overlap, tire, world
from .render import particles
from .physics.state import CarState, apply_controls, create_cars


@pytree_dataclass
class EnvState:
    cars: CarState
    track: Track
    wheel_on_road: jnp.ndarray     # (N, 4) bool — lagged tile contact per wheel
    visited: jnp.ndarray           # (N, MT) bool — per-car visited tiles
    tile_touched: jnp.ndarray      # (MT,) bool — any-fixture contact (render)
    reward: jnp.ndarray            # (N,) cumulative score (mcr:145)
    prev_reward: jnp.ndarray       # (N,)
    tile_visited_count: jnp.ndarray  # (N,) int32
    driving_backward: jnp.ndarray  # (N,) bool
    driving_on_grass: jnp.ndarray  # (N,) bool
    direction_cw: jnp.ndarray      # () bool — episode direction is CW
    t: jnp.ndarray                 # () f32 sim time
    steps: jnp.ndarray             # () int32 steps since reset
    done: jnp.ndarray              # () bool
    contacts: collide.ContactState  # car-car contact warm-start carry
    skid: particles.SkidState      # render-only tire-mark trails


def _episode_start(cars: CarState, track: Track, direction_cw, num_agents: int) -> EnvState:
    mt = track.max_tiles
    f32 = track.xy.dtype
    return EnvState(
        cars=cars,
        track=track,
        wheel_on_road=jnp.zeros((num_agents, 4), bool),
        visited=jnp.zeros((num_agents, mt), bool),
        tile_touched=jnp.zeros((mt,), bool),
        reward=jnp.zeros((num_agents,), f32),
        prev_reward=jnp.zeros((num_agents,), f32),
        tile_visited_count=jnp.zeros((num_agents,), jnp.int32),
        driving_backward=jnp.zeros((num_agents,), bool),
        driving_on_grass=jnp.zeros((num_agents,), bool),
        direction_cw=jnp.asarray(direction_cw, bool),
        t=jnp.asarray(0.0, f32),
        steps=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False, bool),
        contacts=collide.init_contact_state(num_agents, f32),
        skid=particles.init(num_agents, f32),
    )


def _contact_pass(state: EnvState, exact_hull_touch: bool = False):
    """The Collide() equivalent; returns (wheel_on_road (N,4), car_tile
    (N,MT), touched (MT,)).

    Wheel-tile overlap (what drives friction and rewards) is the exact SAT
    test, dense over padded tiles in tiles-last layout (overlap.py). The
    render-only "touched" flag additionally includes hull-tile contact; by
    default the hull contribution is approximated by the hull *center* being
    inside a tile (a grazing hull corner can miss — affects only the 0.01
    color dither of that tile). ``exact_hull_touch`` switches to the full
    8-fixture SAT for golden-image comparisons."""
    wheel_ov = overlap.wheel_tile_overlap(state.cars, state.track)   # (N,4,MT)
    wheel_on_road = wheel_ov.any(-1)
    car_tile = wheel_ov.any(1)                                       # (N, MT)
    if exact_hull_touch:
        fv, fn = overlap.car_fixture_world_geometry(state.cars)
        hull_ov = overlap.fixtures_vs_quads(fv, fn, state.track.quad)[:, 0:4]
        touched = (car_tile | hull_ov.any(1)).any(0)
    else:
        hull_in = overlap.point_in_quads_T(
            state.cars.hull_origin, state.track.quad_T
        )
        touched = (car_tile | hull_in).any(0)
    return wheel_on_road, car_tile, touched


def _visit_rewards(state: EnvState, car_tile: jnp.ndarray, num_agents: int):
    """FrictionDetector begin-contact bookkeeping (mcr:110-120), batched.

    reward += (1 - past_visitors / num_agents) * 1000 / len(track)
    for each first visit, with car-id ordering for same-step ties.
    """
    new = car_tile & ~state.visited & state.track.valid[None, :]   # (N, MT)
    prev_count = jnp.sum(state.visited, axis=0)                    # (MT,)
    rank = jnp.cumsum(new, axis=0) - new.astype(jnp.int32)         # exclusive, (N, MT)
    past = prev_count[None, :] + rank
    factor = 1.0 - past.astype(state.reward.dtype) / num_agents
    tile_bonus = 1000.0 / state.track.n_tiles.astype(state.reward.dtype)
    bonus = jnp.sum(new * factor, axis=1) * tile_bonus
    visited = state.visited | new
    count = state.tile_visited_count + jnp.sum(new, axis=1, dtype=jnp.int32)
    state = state.replace(
        reward=state.reward + bonus, visited=visited, tile_visited_count=count
    )
    return state, bonus


@lru_cache(maxsize=None)
def _make_track_pass(num_agents: int, solver: str, exact_hull_touch: bool):
    """The fused per-step track stage (contact SAT + visit rewards + render
    flattening + post-step nearest/on-grass) with a batching rule.

    Unbatched calls (gym facade, parity tests) run the round-1 XLA ops
    unchanged. Under ``vmap`` on TPU the whole stage dispatches to the
    fused Pallas sweep (physics/track_engine.py) — one VMEM-resident pass
    over the track tables instead of three separate HBM sweeps. Arguments:
    (track, pre_cars, post_origin, visited, tile_touched); ``pre_cars`` is
    the pre-solve pose (Box2D collides at the start of world.Step), while
    nearest/on-grass use the post-solve ``post_origin`` (mcr:446-495)."""
    from jax import custom_batching
    from .parallel import mesh as pmesh
    from .physics import track_engine
    from .physics.state import wheel_forward_side

    n = num_agents

    def _single(track, pre_cars, post_origin, visited, tile_touched):
        wheel_ov = overlap.wheel_tile_overlap(pre_cars, track)   # (N,4,MT)
        wheel_on_road = wheel_ov.any(-1)
        car_tile = wheel_ov.any(1)                               # (N, MT)
        if exact_hull_touch:
            fv, fn = overlap.car_fixture_world_geometry(pre_cars)
            hull_ov = overlap.fixtures_vs_quads(fv, fn, track.quad)[:, 0:4]
            touched = (car_tile | hull_ov.any(1)).any(0)
        else:
            hull_in = overlap.point_in_quads_T(
                pre_cars.hull_origin, track.quad_T
            )
            touched = (car_tile | hull_in).any(0)

        f32 = track.xy.dtype
        new = car_tile & ~visited & track.valid[None, :]
        prev_count = jnp.sum(visited, axis=0)
        rank = jnp.cumsum(new, axis=0) - new.astype(jnp.int32)
        past = prev_count[None, :] + rank
        factor = 1.0 - past.astype(f32) / n
        tile_bonus = 1000.0 / track.n_tiles.astype(f32)
        bonus = jnp.sum(new * factor, axis=1) * tile_bonus
        new_visited = visited | new
        cnt = jnp.sum(new, axis=1, dtype=jnp.int32)

        d2 = jnp.sum(
            jnp.square(post_origin[:, None, :] - track.xy[None, :, :]), axis=-1
        )
        d2 = jnp.where(track.valid[None, :], d2, jnp.inf)
        nearest = jnp.argmin(d2, axis=1)
        onehot = jnp.arange(track.max_tiles)[None, :] == nearest[:, None]
        nearest_beta = jnp.sum(
            jnp.where(onehot, track.beta[None, :], 0.0), axis=1
        )
        in_road = overlap.point_in_quads_T(post_origin, track.quad_T)
        in_curb = overlap.point_in_quads_T(post_origin, track.curb_quad_T)
        on_grass = ~(in_road.any(-1) | in_curb.any(-1))
        return (
            wheel_on_road, new_visited, bonus, cnt,
            tile_touched | touched, nearest_beta, on_grass,
        )

    @custom_batching.custom_vmap
    def track_pass(track, pre_cars, post_origin, visited, tile_touched):
        return _single(track, pre_cars, post_origin, visited, tile_touched)

    @track_pass.def_vmap
    def _rule(axis_size, in_batched, track, pre_cars, post_origin, visited,
              tile_touched):
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        track, pre_cars, post_origin, visited, tile_touched = (
            jax.tree_util.tree_map(bcast, arg, flags)
            for arg, flags in zip(
                (track, pre_cars, post_origin, visited, tile_touched),
                in_batched,
            )
        )
        am = pmesh.ambient_mesh()
        if am is not None and axis_size % am.size != 0:
            am = None
        mode = solver
        if mode == "auto":
            # Measured (TPU v5e, 4096x2 envs, scanned rollout): the v1 fused
            # track kernel (fori_loop over 32 envs/program, (8, MT) ops) is
            # instruction-issue bound and LOSES to XLA's fused sweeps —
            # 6.42 vs 5.60 ms/step — so auto keeps XLA until the
            # envs-on-sublanes kernel wins. Override with MCR_TRACK_PASS.
            mode = "xla"
        # Trace-time dev override for A/B timing of just this stage
        # (the physics mega-kernel keeps its own mode).
        mode = os.environ.get("MCR_TRACK_PASS", mode)
        if mode in ("pallas", "pallas2") and not exact_hull_touch:
            interpret = jax.default_backend() != "tpu"
            fn = (track_engine.track_pass_batched_v2 if mode == "pallas2"
                  else track_engine.track_pass_batched)

            def call(track, pre_cars, post_origin, visited, tile_touched):
                forw, side = wheel_forward_side(pre_cars)
                return fn(
                    track.quad_T, track.quad_ax_T, track.quad_lo,
                    track.quad_hi, track.curb_quad_T, track.xy, track.beta,
                    track.valid, track.n_tiles,
                    pre_cars.wheel_c, forw, side, pre_cars.hull_origin,
                    post_origin, visited, tile_touched,
                    num_agents=n, interpret=interpret,
                )

            if am is not None:
                call = pmesh.shard_leading(call, am)
            out = call(track, pre_cars, post_origin, visited, tile_touched)
        else:
            out = jax.vmap(_single)(
                track, pre_cars, post_origin, visited, tile_touched
            )
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return track_pass


@lru_cache(maxsize=None)
def _make_solver(num_agents: int, velocity_iters: int, position_iters: int,
                 solver: str):
    """Physics stage (tire model + Collide pass + constraint solve) with a
    batching rule.

    Unbatched calls (the gym facade's single env) run the XLA pipeline
    (physics/{tire,collide,world}.py). Under ``vmap`` — every batched
    rollout — the rule dispatches the WHOLE batch to the fused Pallas
    mega-kernel (physics/pallas_world.py): the tire model, the
    b2CollidePolygons manifolds, and the 240 sequential Gauss-Seidel solve
    iterations all stay VMEM-resident in one program instead of paying
    per-op dispatch + HBM round-trips (18 ms -> ~4 ms per step at 4096x2
    envs). Under a multi-device mesh (``jax.set_mesh``), the kernel runs
    per-shard via ``shard_map`` with the env batch split on the leading
    axis; without an ambient mesh, multi-device falls back to the XLA
    pipeline (GSPMD partitions it)."""
    from jax import custom_batching
    from .parallel import mesh as pmesh
    from .physics import pallas_world, world as pworld

    n = num_agents

    def _single(cars, lagged_on_road, contact_state):
        cars, force, motor, skid_flag = tire.tire_step(cars, lagged_on_road)
        if n > 1:
            man = collide.collide(cars, n)
            bundle = collide.make_bundle(man, contact_state, cars, n)
            new_cars, new_bundle = pworld.world_step(
                cars, force, motor,
                velocity_iters=velocity_iters, position_iters=position_iters,
                contacts=bundle,
            )
            new_cs = collide.ContactState(
                normal_imp=new_bundle.normal_imp,
                tangent_imp=new_bundle.tangent_imp,
                ids=man.ids,
            )
        else:
            new_cars = pworld.world_step(
                cars, force, motor,
                velocity_iters=velocity_iters, position_iters=position_iters,
            )
            new_cs = contact_state
        return new_cars, skid_flag, new_cs

    @custom_batching.custom_vmap
    def solve(cars, lagged_on_road, contact_state):
        return _single(cars, lagged_on_road, contact_state)

    @solve.def_vmap
    def _rule(axis_size, in_batched, cars, lagged_on_road, contact_state):
        # Leaves that are constants w.r.t. the vmapped axis (e.g. the zero
        # initial velocities inside a vmapped reset) arrive unbatched —
        # broadcast them so the whole batch is axis-0 uniform.
        def bcast(x, b):
            return x if b else jnp.broadcast_to(x[None], (axis_size,) + x.shape)

        cars, lagged_on_road, contact_state = (
            jax.tree_util.tree_map(bcast, arg, flags)
            for arg, flags in zip(
                (cars, lagged_on_road, contact_state), in_batched
            )
        )
        am = pmesh.ambient_mesh()
        if am is not None and axis_size % am.size != 0:
            # shard_map needs even shards; GSPMD (XLA path) handles ragged
            # batches itself.
            am = None
        mode = solver
        if mode == "auto":
            on_tpu = jax.default_backend() == "tpu"
            mode = (
                "pallas"
                if on_tpu and (jax.device_count() == 1 or am is not None)
                else "xla"
            )
        if mode == "pallas":
            interpret = jax.default_backend() != "tpu"
            # Contact partition (pallas_world.step_physics_batched): gather
            # up to cap broadphase-positive envs into a compact sub-batch for
            # the full collide kernel, run everyone else joints-only — exact
            # at any cap (lax.cond falls back to the full kernel when the
            # broadphase finds more near envs). Default cap = shard/4 for
            # 2-agent batches (measured cap sweep peaked at E/4 with ~20-25%
            # of envs broadphase-positive under random actions — docs/
            # PERF.md "Contact partition"). 4-agent batches measure 38%
            # mean / 51% max near under random actions (scripts/
            # bench_extras.py near4), so their default cap is E/2 — the
            # full N=4 kernel is so much costlier (MM=288 manifold rows)
            # that halving its batch still pays. Override with
            # MCR_PARTITION_CAP (0 disables).
            shard_e = axis_size // (am.size if am is not None else 1)
            cap = 0
            cap2 = 0
            pair_cap = 0
            coupled_cap = 0
            if shard_e >= 2048:
                if n == 2:
                    cap = shard_e // 4
                    # Second tier for policy-driven pack traffic (~52%
                    # broadphase-near measured with the trained 2-agent
                    # checkpoint): overflowing E/4 partitions at E/2
                    # instead of falling back to the full kernel on all E
                    # (docs/PERF.md "Policy-driven workload").
                    cap2 = shard_e // 2
                elif n >= 3:
                    # Env-level partition at E/2 — the MEASURED round-5
                    # winner. The pair-level partition (route near car
                    # PAIRS through the 2-car kernel) was projected to cut
                    # routing work ~5x, but on hardware it LOSES to the
                    # plain env partition at both N=3 (310k vs 418k) and
                    # N=4 (232k vs 253k env-steps/s at E=4096): the
                    # flattened (mm*E)/(N*E) pair gathers cost more than
                    # the kernel work they save (docs/PERF.md round-5
                    # note). Pair partitioning stays available via
                    # MCR_PAIR_CAP/MCR_COUPLED_CAP for re-measurement.
                    cap = shard_e // 2
            cap = int(os.environ.get("MCR_PARTITION_CAP", cap))
            cap2 = int(os.environ.get("MCR_PARTITION_CAP2", cap2))
            pair_cap = int(os.environ.get("MCR_PAIR_CAP", pair_cap))
            coupled_cap = int(os.environ.get("MCR_COUPLED_CAP", coupled_cap))

            def kernel_call(cars, lagged_on_road, contact_state):
                new_cars, skid, new_cs = pallas_world.step_physics_batched(
                    cars, lagged_on_road, contact_state, n,
                    velocity_iters=velocity_iters,
                    position_iters=position_iters,
                    interpret=interpret,
                    partition_cap=cap,
                    partition_cap2=cap2,
                    pair_partition_cap=pair_cap,
                    coupled_cap=coupled_cap,
                )
                if n == 1:
                    new_cs = contact_state
                return new_cars, skid, new_cs

            if am is not None:
                kernel_call = pmesh.shard_leading(kernel_call, am)
            out = kernel_call(cars, lagged_on_road, contact_state)
        else:
            out = jax.vmap(_single)(cars, lagged_on_road, contact_state)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return solve


def _physics_and_contacts(state: EnvState, cfg: Cfg.EnvConfig):
    """Stages 2-4: contact pass + rewards on pre-step poses, then the fused
    physics stage (tire forces from the lagged mask, car-car manifolds,
    constraint solve + integration)."""
    num_agents = cfg.num_agents
    lagged_on_road = state.wheel_on_road

    # Tile overlap uses only positions, which the tire stage never moves —
    # run it first so the physics stage is one fused call.
    wheel_on_road, car_tile, touched = _contact_pass(state, cfg.exact_hull_touch)
    state, bonus = _visit_rewards(state, car_tile, num_agents)

    solve = _make_solver(
        num_agents, cfg.velocity_iters, cfg.position_iters, cfg.solver
    )
    cars, skid_flag, new_cs = solve(state.cars, lagged_on_road, state.contacts)

    if cfg.track_skid:
        # Trails record the tire-model positions/flags (cd:232-249):
        # pre-solve wheel positions, post-tire skid flags.
        state = state.replace(
            skid=particles.update(
                state.skid, state.cars.wheel_c, skid_flag, lagged_on_road
            )
        )

    return state.replace(
        cars=cars,
        contacts=new_cs,
        wheel_on_road=wheel_on_road,
        tile_touched=state.tile_touched | touched,
        t=state.t + C.DT,
        steps=state.steps + 1,
    ), bonus


def _post_step(state: EnvState, cfg: Cfg.EnvConfig, gain: jnp.ndarray,
               nearest_beta: jnp.ndarray, on_grass: jnp.ndarray):
    """Stage 5 (mcr:433-508): step cost, backward/grass flags, termination.

    ``gain`` is this step's reward delta before the step cost (tile bonuses
    plus any bonus carried over from the reset spawn tick). The reference
    computes ``step_reward = reward - prev_reward`` on the float64 cumulative
    (mcr:443); doing that subtraction on a float32 cumulative of magnitude
    ~500 quantizes every step reward to the cumulative's ulp (~6e-5) and
    drifts the summed return by ~5e-3 per 1000 steps (measured) — computing
    it directly from the small per-step quantities keeps each step reward
    exact while the cumulative stays bit-identical (reward = prev + gain
    either way).

    ``nearest_beta``/``on_grass`` come from the fused track pass
    (_make_track_pass), evaluated on this (post-solve) pose."""
    n = cfg.num_agents
    f32 = state.reward.dtype
    reward = state.reward - 0.1
    step_reward = gain - jnp.asarray(0.1, f32)

    # --- per-car backward analysis (mcr:446-495).
    vel = state.cars.hull_v
    speed = jnp.linalg.norm(vel, axis=-1)
    car_angle = jnp.where(
        speed > 0.5, -jnp.arctan2(vel[:, 0], vel[:, 1]), state.cars.hull_a
    )
    car_angle = jnp.mod(car_angle + 2 * jnp.pi, 2 * jnp.pi)

    origin = state.cars.hull_origin                               # (N, 2)
    desired = nearest_beta + jnp.where(
        state.direction_cw, jnp.pi, 0.0
    ).astype(f32)
    desired = jnp.mod(desired + 2 * jnp.pi, 2 * jnp.pi)
    diff = jnp.abs(desired - car_angle)
    diff = jnp.where(diff > jnp.pi, jnp.abs(diff - 2 * jnp.pi), diff)
    backward = diff > C.BACKWARD_THRESHOLD
    step_reward = step_reward - jnp.where(backward, C.K_BACKWARD * diff, 0.0)

    # --- termination (mcr:498-507).
    finished = jnp.any(state.tile_visited_count == state.track.n_tiles)
    off = (jnp.abs(origin[:, 0]) > C.PLAYFIELD) | (jnp.abs(origin[:, 1]) > C.PLAYFIELD)
    step_reward = jnp.where(off, jnp.asarray(-100.0, f32), step_reward)
    # Sticky across steps: the reference episode is over at the first done —
    # batched mode keeps stepping until the autoreset pass, and a car that
    # drifts back on-field must not resurrect the episode.
    done = state.done | finished | jnp.any(off)

    state = state.replace(
        reward=reward,
        prev_reward=reward,
        driving_backward=backward,
        driving_on_grass=on_grass,
        done=done,
    )
    return state, step_reward, done


def reset_from_parts(
    cfg: Cfg.EnvConfig,
    track: Track,
    car_order: jnp.ndarray,      # (N,) int32
    direction_cw,
) -> EnvState:
    """Build the post-reset state: spawn cars on the grid, then run the
    reference's ``step(None)`` — one physics tick with no controls, during
    which spawn-tile visits pay their bonuses (mcr:408, measured in SURVEY.md
    §2.5)."""
    n = cfg.num_agents
    # Spawn pose math (device version of track.common.spawn_poses).
    order = jnp.asarray(car_order, jnp.int32)
    line = order // 2
    side = (2 * (order % 2) - 1).astype(track.xy.dtype)
    idx = jnp.mod(-line * C.LINE_SPACING, track.n_tiles)
    angle = track.beta[idx] + jnp.where(direction_cw, -jnp.pi, 0.0).astype(track.xy.dtype)
    norm_theta = angle - jnp.pi / 2
    pos = track.xy[idx] + C.LATERAL_SPACING * jnp.stack(
        [jnp.sin(norm_theta) * side, jnp.cos(norm_theta) * side], axis=-1
    )
    cars = create_cars(pos, angle)
    state = _episode_start(cars, track, direction_cw, n)
    # step(None): physics + contacts only — no action, no reward stage. The
    # spawn-tile bonuses land in state.reward but not prev_reward, so the
    # first real step's carry term surfaces them (mcr:408; SURVEY.md §2.5).
    state, _ = _physics_and_contacts(state, cfg)
    return state


def step(cfg: Cfg.EnvConfig, state: EnvState, action: jnp.ndarray):
    """One env step. ``action`` is (N, 3): (steer, gas, brake) per car.

    Returns (state', step_reward (N,), done ()). Observations are produced
    separately (see obs.py / render) so physics-only rollouts pay nothing.
    """
    # Reward accrued but not yet reported: nonzero only right after reset
    # (spawn-tile bonuses paid during the step(None) tick). Both operands are
    # small there, so the f32 subtraction is exact to ~1e-6; on every other
    # step reward == prev_reward and the carry is exactly zero.
    carry = state.reward - state.prev_reward
    pre_cars = apply_controls(state.cars, jnp.asarray(action, state.reward.dtype))
    lagged = state.wheel_on_road

    # Physics first (tire forces use the LAGGED contact mask — Box2D collides
    # at the start of world.Step), then ONE fused track pass: the SAT/reward
    # stages read the pre-solve pose, nearest/on-grass the post-solve pose,
    # so the ordering swap is exact w.r.t. the reference's step.
    solve = _make_solver(
        cfg.num_agents, cfg.velocity_iters, cfg.position_iters, cfg.solver
    )
    new_cars, skid_flag, new_cs = solve(pre_cars, lagged, state.contacts)

    skid = state.skid
    if cfg.track_skid:
        skid = particles.update(skid, pre_cars.wheel_c, skid_flag, lagged)

    track_pass = _make_track_pass(cfg.num_agents, cfg.solver, cfg.exact_hull_touch)
    (wheel_on_road, visited, bonus, cnt, tile_touched, nearest_beta,
     on_grass) = track_pass(
        state.track, pre_cars, new_cars.hull_origin,
        state.visited, state.tile_touched,
    )

    state = state.replace(
        cars=new_cars,
        contacts=new_cs,
        skid=skid,
        wheel_on_road=wheel_on_road,
        visited=visited,
        tile_touched=tile_touched,
        reward=state.reward + bonus,
        tile_visited_count=state.tile_visited_count + cnt,
        t=state.t + C.DT,
        steps=state.steps + 1,
    )
    return _post_step(state, cfg, bonus + carry, nearest_beta, on_grass)


def device_reset(cfg: Cfg.EnvConfig, key) -> EnvState:
    """Fully on-device reset: threefry track generation + episode params +
    spawn tick. Statistically equivalent to the reference; use host_reset for
    bit-parity harnesses.

    If every bounded generation retry failed (probability ~0.06^12 per reset;
    the reference retries forever, mcr:359-364), the returned state is marked
    terminated (done, steps=max) so it never contributes transitions: batched
    training autoresets it from the (host-verified) pool before stepping, and
    episode accounting sees a zero-length episode instead of silently training
    on the clamped degenerate track (VERDICT round 1, weak #5)."""
    from .track import device as tdev

    kt, ke = jax.random.split(key)
    track, ok = tdev.generate_track(
        kt, cfg.max_tiles, cfg.max_track_points, cfg.max_track_retries
    )
    direction_cw, order = tdev.episode_params(ke, cfg)
    state = reset_from_parts(cfg, track, order, direction_cw)
    return state.replace(
        done=state.done | ~ok,
        steps=jnp.where(
            ok, state.steps, jnp.asarray(cfg.max_episode_steps, jnp.int32)
        ),
    )


def make_track_pool(cfg: Cfg.EnvConfig, key, pool_size: int):
    """Generate a stacked pool of tracks on device (for cheap batched
    autoreset: drawing from the pool replaces per-step regeneration, whose
    cost under jit would be paid by every env every step)."""
    from .track import device as tdev

    keys = jax.random.split(key, pool_size)
    tracks, oks = jax.vmap(
        lambda k: tdev.generate_track(
            k, cfg.max_tiles, cfg.max_track_points, cfg.max_track_retries
        )
    )(keys)
    return tracks, oks


def make_track_pool_checked(cfg: Cfg.EnvConfig, key, pool_size: int,
                            max_rounds: int = 8):
    """Host-checked pool construction: re-draw any entry whose bounded
    generation failed, raising after ``max_rounds`` full re-draws instead of
    ever returning a degenerate clamped track (VERDICT round 1, weak #5).
    Eager (pulls the ok flags to host) — for init paths, not jit bodies."""
    tracks, oks = make_track_pool(cfg, key, pool_size)
    oks = np.asarray(oks)
    for _ in range(max_rounds):
        if oks.all():
            return tracks
        key, sub = jax.random.split(key)
        fresh, fresh_ok = make_track_pool(cfg, sub, pool_size)
        keep = jnp.asarray(oks)

        def sel(old, new):
            mask = keep.reshape((pool_size,) + (1,) * (old.ndim - 1))
            return jnp.where(mask, old, new)

        tracks = jax.tree_util.tree_map(sel, tracks, fresh)
        oks = oks | np.asarray(fresh_ok)
    if not oks.all():
        raise RuntimeError(
            f"track pool: {int((~oks).sum())}/{pool_size} entries still "
            f"failed generation after {max_rounds} re-draw rounds "
            f"(cfg.max_track_retries={cfg.max_track_retries})"
        )
    return tracks


def reset_done_envs(cfg: Cfg.EnvConfig, state, pool, key):
    """Replace done (or time-limited) envs in a batched EnvState with fresh
    episodes drawn from the track pool. Call between rollout chunks — done
    envs keep stepping harmlessly inside a chunk, exactly like the raw
    reference env does after completion.

    state: EnvState batched over E. pool: stacked Track (P, ...).
    """
    from .track import device as tdev

    E = state.reward.shape[0]
    pool_size = jax.tree_util.tree_leaves(pool)[0].shape[0]
    k_idx, k_ep = jax.random.split(key)
    idx = jax.random.randint(k_idx, (E,), 0, pool_size)
    tracks = jax.tree_util.tree_map(lambda x: x[idx], pool)
    ep_keys = jax.random.split(k_ep, E)
    dirs, orders = jax.vmap(lambda k: tdev.episode_params(k, cfg))(ep_keys)
    fresh = jax.vmap(lambda t, o, d: reset_from_parts(cfg, t, o, d))(
        tracks, orders, dirs
    )
    needs = state.done | (state.steps >= cfg.max_episode_steps)

    def sel(new, old):
        mask = needs.reshape((E,) + (1,) * (new.ndim - 1))
        return jnp.where(mask, new, old)

    return jax.tree_util.tree_map(sel, fresh, state)


def host_reset(cfg: Cfg.EnvConfig, seed=None, global_stream=None, np_rng=None):
    """Host-path reset: bit-parity MT19937 track generation + the reference's
    global-stream episode draws, then the device-side spawn tick.

    Returns (EnvState, info dict with the raw track for tooling)."""
    from . import seeding
    from .track import host as track_host

    if np_rng is None:
        np_rng, _ = seeding.np_random(seed)
    if global_stream is None:
        global_stream = seeding.GlobalStream()

    if cfg.use_random_direction:
        direction = global_stream.direction()
    else:
        direction = cfg.direction
    order = global_stream.car_order(cfg.num_agents)

    pts, border, retries = track_host.generate_track_fast(np_rng)
    track = pack_track(pts, border, max_tiles=cfg.max_tiles)
    state = reset_from_parts(cfg, track, jnp.asarray(order), direction == "CW")
    return state, {"n_tiles": len(pts), "retries": retries, "direction": direction}

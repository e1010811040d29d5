"""Car-car polygon contacts (manifolds + impulse solver).

Placeholder for the collision milestone: hull-hull and cross-car wheel-hull
contacts (the only non-sensor contacts in the game — wheel/wheel pairs are
masked out by category bits, cd:108-109, and own-car wheel/hull pairs are
joint-connected). Implemented in the multi-car physics milestone.
"""

from __future__ import annotations


def init_velocity_and_warm_start(vel, contacts):
    raise NotImplementedError("car-car contacts arrive with the multi-car milestone")


def solve_velocity(vel, contacts):
    raise NotImplementedError


def solve_position(pos, contacts):
    raise NotImplementedError

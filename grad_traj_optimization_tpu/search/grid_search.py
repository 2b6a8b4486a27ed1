"""Batched grid path search by wavefront value iteration.

TPU-native replacement for the reference's 26-connected grid A*
(a_star.{h,cpp}): instead of a sequential priority queue, the cost-to-go
field is computed by **parallel Bellman relaxation** — each sweep relaxes
every voxel against its 26 neighbors simultaneously (one shifted-add +
min per offset, pure VPU work), iterated until fixpoint.  At convergence
the field equals the Dijkstra distances, so the greedy descent path is a
shortest grid path — same output contract as the reference, including:

* clearance gating: voxels with EDT distance < 0.4 m are obstacles
  (a_star.cpp:233 ``neighborPtr->distance < 0.4``);
* 26-connectivity with Euclidean step costs sqrt(dx^2+dy^2+dz^2)
  (a_star.cpp:241-243);
* the returned path is cell-center coordinates goal..start reversed
  (a_star.cpp:276-283).

A whole batch of (map, start, goal) scenarios vmaps; the reference plans
one at a time.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

INF = jnp.inf

#: the 26 neighbor offsets and their Euclidean step costs (in cells)
_OFFSETS = np.array(
    [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
        if (dx, dy, dz) != (0, 0, 0)
    ],
    dtype=np.int32,
)
_STEP_COST = np.linalg.norm(_OFFSETS, axis=1).astype(np.float32)


class GridPlan(NamedTuple):
    path: jnp.ndarray      # (max_len, 3) world coordinates, padded with goal
    length: jnp.ndarray    # () number of valid path points
    reached: jnp.ndarray   # () bool: start connected to goal
    cost_to_go: jnp.ndarray  # (nx, ny, nz) converged Dijkstra field
    converged: jnp.ndarray = True  # () bool: value iteration hit fixpoint


def _shift(g, off, fill):
    """g shifted by ``off`` with out-of-grid cells = fill."""
    pads = []
    slices = []
    for d in range(3):
        o = int(off[d])
        pads.append((max(o, 0), max(-o, 0)))
        n = g.shape[d]
        slices.append(slice(max(-o, 0), max(-o, 0) + n))
    gp = jnp.pad(g, pads, constant_values=fill)
    return gp[tuple(slices)]


def cost_to_go(blocked, goal_idx, max_sweeps: int | None = None):
    """Dijkstra cost-to-go field (in cell units) by value iteration.

    The while_loop exits at the fixpoint, so ``max_sweeps`` is only a
    runaway bound; its default is the cell count — the true worst case
    for a shortest path (a maze path can visit nearly every cell), where
    the old fixed 1024 silently truncated long serpentine corridors.
    Returns (field, converged); an unconverged field underestimates
    nothing but may leave reachable cells at the sentinel value.

    Args:
      blocked: (nx, ny, nz) bool.
      goal_idx: (3,) int goal cell.
    """
    if max_sweeps is None:
        nx, ny, nz = blocked.shape
        max_sweeps = nx * ny * nz + 8
    big = jnp.float32(1e18)
    g0 = jnp.full(blocked.shape, big, jnp.float32)
    g0 = g0.at[goal_idx[0], goal_idx[1], goal_idx[2]].set(0.0)
    g0 = jnp.where(blocked, big, g0)

    offs = [tuple(o) for o in _OFFSETS]
    costs = _STEP_COST

    def sweep(g):
        best = g
        for off, c in zip(offs, costs):
            best = jnp.minimum(best, _shift(g, off, big) + c)
        return jnp.where(blocked, big, best)

    def cond(state):
        g, prev_change, it = state
        return jnp.logical_and(prev_change, it < max_sweeps)

    def body(state):
        g, _, it = state
        # a "macro sweep" of 8 relaxations between convergence checks
        g2 = g
        for _ in range(8):
            g2 = sweep(g2)
        changed = jnp.any(g2 < g - 1e-6)
        return g2, changed, it + 8

    g, changed, _ = jax.lax.while_loop(
        cond, body, (g0, jnp.asarray(True), jnp.asarray(0))
    )
    return g, jnp.logical_not(changed)


def extract_path(g, start_idx, origin, resolution, max_len: int = 512):
    """Greedy steepest-descent walk on the cost-to-go field.

    Returns world-coordinate cell centers from start to goal (padded by
    repeating the final point).
    """
    big = jnp.float32(1e18)
    offs = jnp.asarray(_OFFSETS)  # (26, 3)
    costs = jnp.asarray(_STEP_COST)
    shape = jnp.asarray(g.shape)

    def step(idx, _):
        nbr = idx[None, :] + offs  # (26, 3)
        ok = jnp.all((nbr >= 0) & (nbr < shape[None, :]), axis=1)
        gn = jnp.where(
            ok,
            g[
                jnp.clip(nbr[:, 0], 0, shape[0] - 1),
                jnp.clip(nbr[:, 1], 0, shape[1] - 1),
                jnp.clip(nbr[:, 2], 0, shape[2] - 1),
            ],
            big,
        )
        here = g[idx[0], idx[1], idx[2]]
        # follow the neighbor consistent with the Dijkstra relaxation
        score = gn + costs
        k = jnp.argmin(score)
        done = here <= 0.0
        nxt = jnp.where(done, idx, nbr[k])
        return nxt, nxt

    _, cells = jax.lax.scan(step, start_idx, None, length=max_len - 1)
    cells = jnp.concatenate([start_idx[None, :], cells], axis=0)
    coords = (cells.astype(jnp.float32) + 0.5) * resolution + origin
    gv = g[cells[:, 0], cells[:, 1], cells[:, 2]]
    valid = jnp.concatenate(
        [jnp.ones(1, bool), gv[:-1] > 0.0]
    )  # points up to (and including) first goal hit
    length = jnp.sum(valid.astype(jnp.int32))
    return coords, length


@functools.partial(jax.jit, static_argnames=("clearance", "max_len"))
def plan(
    dist_grid,
    origin,
    resolution,
    start,
    goal,
    clearance: float = 0.4,
    max_len: int = 512,
) -> GridPlan:
    """Plan a shortest clearance-respecting grid path from start to goal.

    Args:
      dist_grid: (nx, ny, nz) EDT distance field [m].
      start, goal: (3,) world positions.
    """
    origin = jnp.asarray(origin, jnp.float32)
    res = jnp.asarray(resolution, jnp.float32)
    blocked = dist_grid < clearance
    shape = jnp.asarray(dist_grid.shape)

    def to_idx(p):
        i = jnp.floor((jnp.asarray(p, jnp.float32) - origin) / res)
        return jnp.clip(i.astype(jnp.int32), 0, shape - 1)

    si, gi = to_idx(start), to_idx(goal)
    # never block the endpoints themselves (the reference implicitly seeds
    # the start regardless of clearance)
    blocked = blocked.at[si[0], si[1], si[2]].set(False)
    blocked = blocked.at[gi[0], gi[1], gi[2]].set(False)

    g, converged = cost_to_go(blocked, gi)
    path, length = extract_path(g, si, origin, res, max_len)
    reached = g[si[0], si[1], si[2]] < 1e17
    return GridPlan(path=path, length=length, reached=reached,
                    cost_to_go=g, converged=converged)

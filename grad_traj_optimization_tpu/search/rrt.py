"""Safe-ball informed RRT* seeding (host-side utility).

Rebuild of the reference ``rrtPathFinder`` (path_finder.{h,cpp}) and the
simpler ``rrgPathFinder`` capability: nodes are safe balls (center +
clearance radius), sampling is goal-biased and — once a solution exists —
restricted to the informed prolate spheroid, edges require overlapping
safe balls (which guarantees the straight segment between centers is
collision-free), and RRT* rewiring keeps the tree asymptotically optimal.
The output is the waypoint path plus per-node radii — the safe corridor
the reference feeds downstream (path_finder.cpp:806-887).

Deliberate deviations (SURVEY.md section 2 row 11): sampling-based search
is a poor fit for the TPU hot path, so this runs on host NumPy as a
*seeding utility*; clearance radii come from the EDT grid instead of a
PCL k-d tree over raw points (the EDT is already built for the
optimizer); the reference's incremental tree-repair machinery
(resetRoot/treeRepair/ReConnect, path_finder.cpp:1065-1554) is covered by
the receding-horizon loop in replan.py, which replans from scratch at
TPU solve rates instead of patching a stale tree.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class RRTResult:
    path: np.ndarray        # (K, 3) waypoints start..goal
    radii: np.ndarray       # (K,) safe-ball radius per waypoint
    reached: bool
    cost: float             # path length
    n_nodes: int


def _dist_at(dist_grid, origin, resolution, p):
    g = dist_grid.shape
    idx = np.floor((p - origin) / resolution).astype(int)
    if np.any(idx < 0) or np.any(idx >= np.asarray(g)):
        return -1.0
    return float(dist_grid[idx[0], idx[1], idx[2]])


def plan(
    dist_grid,
    origin,
    resolution,
    start,
    goal,
    max_iters: int = 2000,
    steer_len: float = 1.5,
    min_radius: float = 0.3,
    goal_bias: float = 0.15,
    radius_margin: float | None = None,
    seed: int = 0,
) -> RRTResult:
    """Grow a safe-ball RRT* from start toward goal.

    Args:
      dist_grid: (nx, ny, nz) EDT distance field (NumPy or JAX array).
      min_radius: minimum (shrunk) clearance for a node to be admitted.
      radius_margin: subtracted from the EDT value to get the safe-ball
        radius (reference: radius = nearest-obstacle distance - 0.15,
        rrgPathFinder.cpp:96-110).  The cell-center EDT overestimates
        clearance to the obstacle *region* by up to res*sqrt(3)/2, so the
        default is max(0.15, 0.87 * resolution) — without it, overlapping
        balls can tunnel through one-cell-thick walls.
    """
    dist_grid = np.asarray(dist_grid)
    origin = np.asarray(origin, dtype=np.float64)
    start = np.asarray(start, dtype=np.float64)
    goal = np.asarray(goal, dtype=np.float64)
    size = np.asarray(dist_grid.shape) * resolution
    rng = np.random.default_rng(seed)
    if radius_margin is None:
        radius_margin = max(0.15, 0.87 * resolution)

    r0 = _dist_at(dist_grid, origin, resolution, start) - radius_margin
    centers = [start]
    radii = [max(r0, min_radius)]
    parents = [-1]
    costs = [0.0]

    best_goal_node = -1
    best_cost = np.inf
    c_min = np.linalg.norm(goal - start)

    def sample():
        if rng.random() < goal_bias:
            return goal.copy()
        if np.isfinite(best_cost):
            # informed prolate spheroid (path_finder.cpp:420-478)
            c_best = best_cost
            center = 0.5 * (start + goal)
            a1 = (goal - start) / max(c_min, 1e-9)
            # rotation to ellipsoid frame: use a1 as first axis
            r1 = c_best / 2.0
            r23 = np.sqrt(max(c_best**2 - c_min**2, 1e-9)) / 2.0
            while True:
                u = rng.normal(size=3)
                u /= np.linalg.norm(u)
                u *= rng.random() ** (1 / 3)
                # stretch in the a1 frame
                basis = _frame(a1)
                p = center + basis @ (np.array([r1, r23, r23]) * u)
                if np.all(p > origin) and np.all(p < origin + size):
                    return p
        return origin + rng.random(3) * size

    for _ in range(max_iters):
        x = sample()
        c_arr = np.asarray(centers)
        d2 = np.sum((c_arr - x) ** 2, axis=1)
        near = int(np.argmin(d2))
        dn = np.sqrt(d2[near])
        if dn < 1e-9:
            continue
        x = c_arr[near] + (x - c_arr[near]) * min(1.0, steer_len / dn)

        r = _dist_at(dist_grid, origin, resolution, x) - radius_margin
        if r < min_radius:
            continue

        # candidate parents: safe-ball overlap within rewire radius
        rr = np.asarray(radii)
        d = np.sqrt(np.sum((c_arr - x) ** 2, axis=1))
        connectable = d <= rr + r
        if not connectable.any():
            continue
        cand_costs = np.asarray(costs) + d
        cand_costs[~connectable] = np.inf
        parent = int(np.argmin(cand_costs))
        new_cost = float(cand_costs[parent])
        if not np.isfinite(new_cost):
            continue

        centers.append(x)
        radii.append(r)
        parents.append(parent)
        costs.append(new_cost)
        i_new = len(centers) - 1

        # rewire neighbors through the new node (path_finder.cpp:592-705)
        improve = connectable & (np.asarray(costs[:-1]) > new_cost + d)
        for j in np.nonzero(improve)[0]:
            parents[j] = i_new
            costs[j] = new_cost + d[j]

        # goal reachable from the new ball?
        dg = np.linalg.norm(goal - x)
        if dg <= r and new_cost + dg < best_cost:
            best_cost = new_cost + dg
            best_goal_node = i_new

    if best_goal_node < 0:
        return RRTResult(
            path=np.asarray([start]), radii=np.asarray([radii[0]]),
            reached=False, cost=np.inf, n_nodes=len(centers),
        )

    chain = [best_goal_node]
    while parents[chain[-1]] >= 0:
        chain.append(parents[chain[-1]])
    chain.reverse()
    path = np.asarray([centers[i] for i in chain] + [goal])
    rads = np.asarray(
        [radii[i] for i in chain]
        + [
            max(
                _dist_at(dist_grid, origin, resolution, goal)
                - radius_margin,
                min_radius,
            )
        ]
    )
    return RRTResult(
        path=path, radii=rads, reached=True, cost=best_cost,
        n_nodes=len(centers),
    )


def corridor_waypoints(
    result: RRTResult,
    rdp_epsilon: float = 0.4,
    min_bos: float = 0.3,
):
    """RDP-simplify an RRT* path, carrying the safe-ball radii along.

    The reference's RRT* output is consumed downstream as a corridor —
    waypoints plus per-node clearance radii (path_finder.cpp:806-887,
    tracePath/getPath return (Path, Radius)).  This is the rebuild's
    consumer hookup: the kept waypoints seed the QP, and each kept
    node's radius becomes that waypoint's position-bound half-width
    (penalty.bounds ``bos``), so the optimizer's interior waypoints
    cannot leave their safe balls.

    Returns (waypoints (K, 3), bos_wp (K,)).  ``min_bos`` floors the
    half-widths so a tight ball still leaves the optimizer room to
    polish.
    """
    from grad_traj_optimization_tpu.search import rdp

    if not result.reached:
        raise ValueError("corridor_waypoints needs a reached RRTResult")
    wps, idx = rdp.simplify(result.path, rdp_epsilon, return_index=True)
    bos_wp = np.maximum(np.asarray(result.radii)[idx], min_bos)
    return wps, bos_wp


def _frame(a1):
    """Orthonormal frame with first axis a1."""
    e = np.array([1.0, 0.0, 0.0])
    if abs(a1 @ e) > 0.9:
        e = np.array([0.0, 1.0, 0.0])
    b = np.cross(a1, e)
    b /= np.linalg.norm(b)
    c = np.cross(a1, b)
    return np.stack([a1, b, c], axis=1)

"""Benchmark/evaluation harness.

Rebuild of the reference's compare2/compare22 measurement flow
(src/compare2.cpp:85-342): run front-end search and back-end optimization
over a stream of (map, start, goal) cases and log per-case
``solve_time, traj_time, acc_cost`` plus jerk and the monotone
cost-vs-iteration curve (reference getCostCurve,
grad_traj_optimizer.cpp:438-447).  Instead of hard-coded text files and a
ROS /finish_test handshake, results are returned as structured records
(and optionally dumped to JSON lines).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np
import jax
import jax.numpy as jnp

from grad_traj_optimization_tpu.config import OptimizerConfig
from grad_traj_optimization_tpu.core import poly
from grad_traj_optimization_tpu import solver as solve_mod
from grad_traj_optimization_tpu.search import grid_search, rdp


@dataclasses.dataclass
class CaseRecord:
    """One benchmark case (compare2.cpp logs :219-231, 296-321)."""

    case_id: int
    frontend_time_s: float      # search wall time ('time in search')
    backend_time_s: float       # optimization wall time
    traj_time_s: float          # trajectory duration sum(T)
    traj_length_m: float
    acc_cost: float             # front-end metric (polynomial_traj:94-106)
    jerk: float                 # back-end metric (polynomial_traj:108-138)
    cost_curve: list            # monotone best-cost envelope
    status: int
    frontend_ok: bool = True    # a search connected start to goal
    via_fallback: bool = False  # grid search failed; exact host A* used

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        d["cost_curve"] = [round(float(x), 6) for x in self.cost_curve]
        return json.dumps(d)


def _search_front(dist_grid, origin, resolution, start, goal, clearance):
    """Front-end search with exact-host-A* fallback.

    Runs the jitted wavefront search (grid_search.plan); when it reports
    no connection (e.g. the clearance threshold seals a gap the
    kinodynamic expansion could thread), retries with the exact host
    kinodynamic A* (native.kino_search, the faithful reference
    algorithm, kinodynamic_astar.cpp:17-315) instead of optimizing a
    garbage polyline.  Returns (path (N,3), t_front_s, ok, via_fallback).
    """
    t0 = time.perf_counter()
    plan = grid_search.plan(
        dist_grid, origin, resolution, np.asarray(start),
        np.asarray(goal), clearance=clearance,
    )
    jax.block_until_ready(plan.path)
    ok = bool(plan.reached)
    via_fallback = False
    path = np.asarray(plan.path)[: max(int(plan.length), 2)]
    if not ok:
        from grad_traj_optimization_tpu import native

        if native.available():
            s6 = np.concatenate([np.asarray(start, np.float64), np.zeros(3)])
            g6 = np.concatenate([np.asarray(goal, np.float64), np.zeros(3)])
            fpos, _, _, ftimes, freached = native.kino_search(
                np.asarray(dist_grid, np.float32),
                np.asarray(origin, np.float32), float(resolution),
                s6, g6, margin=clearance / 2.0,
            )
            if freached and len(fpos) >= 2:
                ok = via_fallback = True
                path = np.asarray(fpos, np.float64)
    t_front = time.perf_counter() - t0
    if not ok:
        # both searches failed: degrade to the straight chord so the
        # record still carries a solve (status reports the truth)
        path = np.stack(
            [np.asarray(start, np.float64), np.asarray(goal, np.float64)]
        )
    return path, t_front, ok, via_fallback


def _resample_polyline(pts, n):
    """Arc-length resample a polyline to exactly n points (ends kept)."""
    pts = np.asarray(pts, np.float64)
    seg = np.linalg.norm(np.diff(pts, axis=0), axis=1)
    s = np.concatenate([[0.0], np.cumsum(seg)])
    si = np.linspace(0.0, s[-1], n)
    return np.stack(
        [np.interp(si, s, pts[:, k]) for k in range(3)], axis=-1
    )


def run_case(
    case_id,
    dist_grid,
    origin,
    resolution,
    start,
    goal,
    cfg: OptimizerConfig = OptimizerConfig(),
    rdp_epsilon: float = 0.4,
    clearance: float = 0.4,
    steps=(2,),
    n_waypoints: int | None = None,
    warm_compile: bool = False,
) -> CaseRecord:
    """Front-end (wavefront search + RDP waypoints) then back-end solve.

    ``n_waypoints``: resample the RDP polyline to a fixed waypoint count
    so every case of a suite reuses ONE compiled solve.  With the
    default (None, reference-faithful variable counts) each distinct
    count pays its own jit compile — fine for a handful of cases,
    dominant for large suites.

    ``warm_compile``: run the solve once untimed first so
    ``backend_time_s`` is warm execution only — use this when the cost
    curve's wall-time axis matters (write_compare2_logs), since a
    compile-inclusive total would stretch the per-iteration times.
    """
    origin = jnp.asarray(origin, jnp.float32)

    path, t_front, front_ok, via_fallback = _search_front(
        dist_grid, origin, resolution, start, goal, clearance
    )
    waypoints = rdp.simplify(path, rdp_epsilon)
    if len(waypoints) < 3:
        waypoints = np.stack(
            [path[0], 0.5 * (path[0] + path[-1]), path[-1]]
        )
    if n_waypoints is not None:
        waypoints = _resample_polyline(waypoints, n_waypoints)

    scn = solve_mod.Scenario(
        dist=dist_grid,
        origin=origin,
        resolution=jnp.asarray(resolution, jnp.float32),
        waypoints=jnp.asarray(waypoints, jnp.float32),
    )
    if warm_compile:
        jax.block_until_ready(
            solve_mod.solve(scn, cfg=cfg, steps=steps, record_trace=True)
        )
    t0 = time.perf_counter()
    sol = solve_mod.solve(scn, cfg=cfg, steps=steps, record_trace=True)
    jax.block_until_ready(sol)
    t_back = time.perf_counter() - t0

    return CaseRecord(
        case_id=case_id,
        frontend_time_s=t_front,
        backend_time_s=t_back,
        traj_time_s=float(jnp.sum(sol.T)),
        traj_length_m=float(poly.length(sol.coeff, sol.T)),
        acc_cost=float(poly.acc_cost(sol.coeff, sol.T)),
        jerk=float(poly.jerk_cost(sol.coeff, sol.T)),
        cost_curve=list(np.asarray(sol.cost_trace)),
        status=int(sol.status),
        frontend_ok=front_ok,
        via_fallback=via_fallback,
    )


def run_case_rrt(
    case_id,
    dist_grid,
    origin,
    resolution,
    start,
    goal,
    cfg: OptimizerConfig = OptimizerConfig(),
    rdp_epsilon: float = 0.4,
    rrt_iters: int = 2000,
    seed: int = 0,
    steps=(2,),
    min_bos: float = 0.3,
) -> CaseRecord:
    """RRT* front-end with corridor-bounded back-end refinement.

    The reference pipeline this rebuilds: rrtPathFinder produces
    waypoints + per-node safe-ball radii (path_finder.cpp:806-887);
    the corridor drives the optimizer's per-waypoint position bounds
    (penalty.bounds ``bos``) instead of the scalar ``cfg.bos``, so the
    refined trajectory's interior waypoints stay in the safe tube the
    search certified.  Raises if the RRT* cannot reach the goal
    (sampling search has no meaningful partial result to refine).
    """
    from grad_traj_optimization_tpu.search import rrt

    origin = jnp.asarray(origin, jnp.float32)
    t0 = time.perf_counter()
    res_rrt = rrt.plan(
        np.asarray(dist_grid), np.asarray(origin), float(resolution),
        np.asarray(start, np.float64), np.asarray(goal, np.float64),
        max_iters=rrt_iters, seed=seed,
    )
    if not res_rrt.reached:
        raise RuntimeError(
            f"RRT* failed to reach the goal in {rrt_iters} iterations"
        )
    waypoints, bos_wp = rrt.corridor_waypoints(
        res_rrt, rdp_epsilon, min_bos=min_bos
    )
    t_front = time.perf_counter() - t0

    scn = solve_mod.Scenario(
        dist=dist_grid,
        origin=origin,
        resolution=jnp.asarray(resolution, jnp.float32),
        waypoints=jnp.asarray(waypoints, jnp.float32),
    )
    t0 = time.perf_counter()
    sol = solve_mod.solve(
        scn, cfg=cfg, steps=steps, record_trace=True,
        bos_wp=jnp.asarray(bos_wp, jnp.float32),
    )
    jax.block_until_ready(sol)
    t_back = time.perf_counter() - t0

    return CaseRecord(
        case_id=case_id,
        frontend_time_s=t_front,
        backend_time_s=t_back,
        traj_time_s=float(jnp.sum(sol.T)),
        traj_length_m=float(poly.length(sol.coeff, sol.T)),
        acc_cost=float(poly.acc_cost(sol.coeff, sol.T)),
        jerk=float(poly.jerk_cost(sol.coeff, sol.T)),
        cost_curve=list(np.asarray(sol.cost_trace)),
        status=int(sol.status),
        frontend_ok=True,
    )


def run_suite_batched(
    cases,
    cfg: OptimizerConfig = OptimizerConfig(),
    rdp_epsilon: float = 0.4,
    clearance: float = 0.4,
    steps=(2,),
    n_waypoints: int = 6,
    out_path: str | None = None,
):
    """Run a suite with ONE batched back-end solve.

    The per-case front-end (wavefront + RDP) stays a host loop, but all
    back-end refinements stack into a single ``solve_batch`` — the
    framework's native shape.  Cases must share one grid shape; RDP
    waypoints are arc-length resampled to ``n_waypoints`` so the batch
    is rectangular.  ``backend_time_s`` in each record is the batch
    wall time amortized per case (the honest per-case number for a
    throughput-oriented deployment; use :func:`run_case` for isolated
    latencies).
    """
    t_fronts, wps, dists, origins, ress = [], [], [], [], []
    front_oks, fallbacks = [], []
    for dist_grid, origin, resolution, start, goal in cases:
        origin = jnp.asarray(origin, jnp.float32)
        path, t_front, front_ok, via_fallback = _search_front(
            dist_grid, origin, resolution, start, goal, clearance
        )
        t_fronts.append(t_front)
        front_oks.append(front_ok)
        fallbacks.append(via_fallback)
        waypoints = rdp.simplify(path, rdp_epsilon)
        if len(waypoints) < 3:
            waypoints = np.stack(
                [path[0], 0.5 * (path[0] + path[-1]), path[-1]]
            )
        wps.append(_resample_polyline(waypoints, n_waypoints))
        dists.append(dist_grid)
        origins.append(np.asarray(origin))
        ress.append(float(resolution))

    batch = solve_mod.Scenario(
        dist=jnp.stack(dists),
        origin=jnp.asarray(np.stack(origins), jnp.float32),
        resolution=jnp.asarray(np.asarray(ress), jnp.float32),
        waypoints=jnp.asarray(np.stack(wps), jnp.float32),
    )
    t0 = time.perf_counter()
    sols = solve_mod.solve_batch(
        batch, cfg=cfg, steps=steps, record_trace=True
    )
    jax.block_until_ready(sols)
    t_back = (time.perf_counter() - t0) / max(len(cases), 1)

    records = []
    for i in range(len(cases)):
        sol = jax.tree.map(lambda x: x[i], sols)
        rec = CaseRecord(
            case_id=i,
            frontend_time_s=t_fronts[i],
            backend_time_s=t_back,
            traj_time_s=float(jnp.sum(sol.T)),
            traj_length_m=float(poly.length(sol.coeff, sol.T)),
            acc_cost=float(poly.acc_cost(sol.coeff, sol.T)),
            jerk=float(poly.jerk_cost(sol.coeff, sol.T)),
            cost_curve=list(np.asarray(sol.cost_trace)),
            status=int(sol.status),
            frontend_ok=front_oks[i],
            via_fallback=fallbacks[i],
        )
        records.append(rec)
        if out_path:
            with open(out_path, "a") as f:
                f.write(rec.to_json() + "\n")
    return records


def run_suite(cases, out_path: str | None = None, **kwargs):
    """Run a list of (dist, origin, resolution, start, goal) cases.

    Returns the records; optionally appends JSON lines to ``out_path``
    (the structured replacement for compare2's front2.txt/back2.txt).
    """
    records = []
    for i, (dist, origin, res, start, goal) in enumerate(cases):
        rec = run_case(i, dist, origin, res, start, goal, **kwargs)
        records.append(rec)
        if out_path:
            with open(out_path, "a") as f:
                f.write(rec.to_json() + "\n")
    return records


def summarize(records):
    """Aggregate statistics across a suite."""
    def pct(xs, q):
        return float(np.percentile(np.asarray(xs), q))

    fe = [r.frontend_time_s for r in records]
    be = [r.backend_time_s for r in records]
    return {
        "n_cases": len(records),
        "n_ok": sum(1 for r in records if r.status == 0),
        "n_frontend_ok": sum(1 for r in records if r.frontend_ok),
        "n_via_fallback": sum(1 for r in records if r.via_fallback),
        "frontend_p50_ms": pct(fe, 50) * 1e3,
        "frontend_p95_ms": pct(fe, 95) * 1e3,
        "backend_p50_ms": pct(be, 50) * 1e3,
        "backend_p95_ms": pct(be, 95) * 1e3,
        "mean_jerk": float(np.mean([r.jerk for r in records])),
        "mean_acc_cost": float(np.mean([r.acc_cost for r in records])),
        "mean_traj_time_s": float(
            np.mean([r.traj_time_s for r in records])
        ),
    }


def write_compare2_logs(records, front_path: str, back_path: str):
    """Emit reference-format benchmark logs for drop-in comparison.

    Replicates the exact line formats of compare2.cpp:
      front2.txt (:215-231):
        ``test2:<n>solve_time:<s>,traj_time:<s>,acc_cost:<c>``
      back2.txt (:296-321):
        ``test2:<n>,jerk:<j>,time:<t0>;<t1>;...,cost:<c0>;<c1>;...``
    where the cost curve is the monotone best-cost envelope per iteration.
    The reference records per-NLopt-callback wall times; here every
    iteration of the fixed-budget descent executes identical work (one
    fused cost+gradient evaluation — no line search, no early exit), so
    the wall axis is the measured solve wall time divided uniformly per
    iteration.  For time-to-quality comparisons against C++ logs, run
    the cases with ``run_case(..., warm_compile=True)`` so the measured
    time excludes the one-off jit compile.
    """
    with open(front_path, "a") as f:
        for r in records:
            f.write(
                f"test2:{r.case_id + 1}solve_time:{r.frontend_time_s}"
                f",traj_time:{r.traj_time_s},acc_cost:{r.acc_cost}\n"
            )
    with open(back_path, "a") as f:
        for r in records:
            n = max(len(r.cost_curve), 1)
            dt = r.backend_time_s / n
            times = ";".join(str((i + 1) * dt) for i in range(n))
            costs = ";".join(str(float(c)) for c in r.cost_curve)
            f.write(
                f"test2:{r.case_id + 1},jerk:{r.jerk}"
                f",time:{times},cost:{costs}\n"
            )

"""End-to-end trajectory solve: Scenario batch -> Solution batch.

The reference pipeline (src/opti_node.cpp:47-147) is an object graph:
``GradTrajOptimizer`` holding an ``SDFMap``, NLopt callbacks, mutable
coefficient state.  Here the whole thing is one pure function::

    solve(scenario, ...) -> Solution

jitted once per (grid shape, waypoint count, config) and scaled with
``vmap`` over scenarios and ``jax.sharding`` over a device mesh
(see :mod:`grad_traj_optimization_tpu.parallel`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from grad_traj_optimization_tpu.config import MapConfig, OptimizerConfig
from grad_traj_optimization_tpu.core import poly, qp
from grad_traj_optimization_tpu.fields import sdf
from grad_traj_optimization_tpu.opt import descent, penalty

STATUS_OK = 0
STATUS_DIVERGED = 1  # NaN/Inf appeared (per-scenario failure detection)


class Scenario(NamedTuple):
    """One trajectory-planning problem instance (a pytree).

    dist: (nx, ny, nz) distance field in meters.
    origin: (3,) map origin.
    resolution: () voxel size.
    waypoints: (m+1, 3) path to seed from.
    """

    dist: jnp.ndarray
    origin: jnp.ndarray
    resolution: jnp.ndarray
    waypoints: jnp.ndarray


class Solution(NamedTuple):
    coeff: jnp.ndarray       # (m, 3, 6) ascending-power coefficients
    T: jnp.ndarray           # (m,) segment times
    cost: jnp.ndarray        # () final cost
    cost_trace: jnp.ndarray  # (total iters,) monotone cost envelope
    n_accept: jnp.ndarray    # () accepted descent iterations
    dp: jnp.ndarray          # (3, 3m-3) optimized free derivatives
    status: jnp.ndarray      # () STATUS_*


def make_scenario(
    waypoints,
    obstacle_points,
    map_cfg: MapConfig,
    valid_mask=None,
    dist=None,
) -> Scenario:
    """Build a Scenario, rasterizing + EDT-transforming obstacles.

    (Reference flow: initSDFMap + updateSDFMap, grad_traj_optimizer.cpp:
    112-126.)  Pass ``dist`` directly to reuse a prebuilt field.
    """
    origin = jnp.asarray(map_cfg.origin, dtype=jnp.float32)
    res = jnp.asarray(map_cfg.resolution, dtype=jnp.float32)
    if dist is None:
        occ = sdf.rasterize(
            jnp.asarray(obstacle_points, dtype=jnp.float32),
            origin,
            map_cfg.resolution,
            map_cfg.grid_shape,
            valid_mask=valid_mask,
        )
        dist = sdf.edt(occ, map_cfg.resolution)
    return Scenario(
        dist=dist,
        origin=origin,
        resolution=res,
        waypoints=jnp.asarray(waypoints, dtype=jnp.float32),
    )


def _solve_field(
    field: penalty.Field,
    grid_shape: tuple[int, int, int],
    waypoints,
    cfg: OptimizerConfig,
    steps: tuple[int, ...],
    record_trace: bool,
) -> Solution:
    wp = waypoints
    T = qp.allocate_times(wp, cfg.mean_v, cfg.init_time)
    Df, dp0 = qp.straight_line_d(wp)
    dep = qp.build_dep(T)
    ctx = penalty.build_ctx(T, Df, cfg, dep=dep)
    num_dp = dp0.shape[1]
    lb, ub = penalty.bounds(wp, num_dp, cfg, dtype=wp.dtype)

    dp = dp0
    traces = []
    n_acc = jnp.zeros((), jnp.int32)
    cost = jnp.zeros(())
    for step in steps:
        cag = functools.partial(
            penalty.cost_and_grad,
            ctx=ctx,
            field=field,
            grid_shape=grid_shape,
            cfg=cfg,
            step=step,
        )
        co = functools.partial(
            penalty.cost_only,
            ctx=ctx,
            field=field,
            grid_shape=grid_shape,
            cfg=cfg,
            step=step,
        )
        iters = cfg.iters_step1 if step == 1 else cfg.iters_step2
        res = descent.minimize(
            cag, co, dp, lb, ub, iters, cfg, record_trace=record_trace
        )
        dp, cost = res.dp, res.cost
        n_acc = n_acc + res.n_accept
        traces.append(res.cost_trace)

    coeff = qp.coeff_from_d(Df, dp, T)
    bad = jnp.logical_not(
        jnp.isfinite(cost) & jnp.all(jnp.isfinite(dp))
    )
    status = jnp.where(bad, STATUS_DIVERGED, STATUS_OK).astype(jnp.int32)
    # failure recovery: fall back to the (always finite) seed on divergence
    dp_safe = jnp.where(bad, dp0, dp)
    coeff = jnp.where(bad, qp.coeff_from_d(Df, dp0, T), coeff)
    return Solution(
        coeff=coeff,
        T=T,
        cost=cost,
        cost_trace=jnp.concatenate(traces) if traces else jnp.zeros((0,)),
        n_accept=n_acc,
        dp=dp_safe,
        status=status,
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "steps", "record_trace")
)
def solve(
    scenario: Scenario,
    cfg: OptimizerConfig = OptimizerConfig(),
    steps: tuple[int, ...] = (2,),
    record_trace: bool = True,
) -> Solution:
    """Solve one scenario.

    ``steps`` follows the reference two-step schedule
    (grad_traj_optimizer.cpp:128-148, 413-415): step 1 optimizes collision
    only (ws = 0), step 2 the full cost.  The active demo (opti_node.cpp:
    104) runs only step 2; pass ``steps=(1, 2)`` for the full schedule.
    """
    field, grid_shape = penalty.make_field(
        scenario.dist, scenario.origin, scenario.resolution
    )
    return _solve_field(
        field, grid_shape, scenario.waypoints, cfg, steps, record_trace
    )


@functools.partial(
    jax.jit, static_argnames=("cfg", "steps", "record_trace")
)
def solve_batch(
    scenarios: Scenario,
    cfg: OptimizerConfig = OptimizerConfig(),
    steps: tuple[int, ...] = (2,),
    record_trace: bool = False,
) -> Solution:
    """Solve a batch: every leaf of ``scenarios`` has a leading batch axis.

    To share one map across the whole batch, pass ``dist`` with leading
    dimension 1 (other leaves batched normally) — the single grid is
    closed over, not copied.

    The distance grids are flattened into ONE buffer closed over by the
    vmapped body; each lane indexes its slab by offset.  This keeps the
    hot trilinear lookup a single flat gather instead of a per-scenario
    batched gather (orders of magnitude slower on TPU).
    """
    B = scenarios.waypoints.shape[0]
    grid_shape = scenarios.dist.shape[1:]

    # fast path: fused Pallas lookup — opt-in (lookup_mode="fused")
    # until its Mosaic lowering is validated on every target generation
    if cfg.lookup_mode == "fused":
        from grad_traj_optimization_tpu.ops import trilinear_pallas as tp

        m = scenarios.waypoints.shape[1] - 1
        if tp.supports(grid_shape, m * cfg.n_samples):
            return solve_batch_fused(
                scenarios, cfg=cfg, steps=steps, record_trace=record_trace
            )

    nvox = grid_shape[0] * grid_shape[1] * grid_shape[2]
    flat_all = scenarios.dist.reshape(-1)
    shared = scenarios.dist.shape[0] == 1
    if shared:
        bases = jnp.zeros((B,), jnp.int32)  # shared map
    else:
        bases = jnp.arange(B, dtype=jnp.int32) * nvox
    shared_grid = scenarios.dist[0] if shared else None

    def one(base, grid, origin, resolution, waypoints):
        field = penalty.Field(
            flat=flat_all, base=base, origin=origin,
            resolution=resolution,
            grid=shared_grid if shared else grid,
        )
        return _solve_field(
            field, grid_shape, waypoints, cfg, steps, record_trace
        )

    grids = (
        jnp.zeros((B, 0)) if shared else scenarios.dist
    )  # dummy when shared (closed over instead)
    return jax.vmap(one)(
        bases, grids, scenarios.origin, scenarios.resolution,
        scenarios.waypoints,
    )


def evaluate_solution(sol: Solution, n: int = 400):
    """Reference-style evaluation metrics (opti_node.cpp:136-142)."""
    length = poly.length(sol.coeff, sol.T, n)
    jerk = poly.jerk_cost(sol.coeff, sol.T)
    mean_v, max_v = poly.mean_max_speed(sol.coeff, sol.T, n)
    mean_a, max_a = poly.mean_max_acc(sol.coeff, sol.T, n)
    return {
        "time_sum": jnp.sum(sol.T),
        "length": length,
        "jerk": jerk,
        "mean_v": mean_v,
        "max_v": max_v,
        "mean_a": mean_a,
        "max_a": max_a,
        "cost": sol.cost,
    }


@functools.partial(
    jax.jit, static_argnames=("cfg", "steps", "record_trace", "interpret")
)
def solve_batch_fused(
    scenarios: Scenario,
    cfg: OptimizerConfig = OptimizerConfig(),
    steps: tuple[int, ...] = (2,),
    record_trace: bool = False,
    interpret: bool = False,
) -> Solution:
    """Batch-first solve using the fused Pallas trilinear kernel.

    Produces the same iterates as :func:`solve_batch` (per-scenario BB
    steps and acceptance), but evaluates the whole batch's distance-field
    lookups in one fused kernel with the grid slab resident in VMEM —
    the fast path on TPU.  Requires per-scenario grids (no shared-map
    shortcut) with nx, ny <= 128 and m * n_samples <= 256.
    """
    wp = scenarios.waypoints  # (B, m+1, 3)
    B = wp.shape[0]
    T = jax.vmap(lambda w: qp.allocate_times(w, cfg.mean_v, cfg.init_time))(
        wp
    )
    Df, dp0 = jax.vmap(qp.straight_line_d)(wp)
    bctx = penalty.build_ctx_batch(T, Df, cfg)
    num_dp = dp0.shape[2]
    lb, ub = jax.vmap(
        lambda w: penalty.bounds(w, num_dp, cfg, dtype=w.dtype)
    )(wp)

    grids = scenarios.dist
    if grids.shape[0] == 1 and B > 1:
        grids = jnp.broadcast_to(grids, (B,) + grids.shape[1:])

    # hoist the kernel grid-layout prep out of the iteration loop
    gp = None
    if cfg.lookup_mode in ("auto", "fused"):
        from grad_traj_optimization_tpu.ops import trilinear_pallas as tp

        m_seg = wp.shape[1] - 1
        if tp.supports(grids.shape[1:], m_seg * cfg.n_samples):
            gp = tp.prep_grids(grids)

    dp = dp0
    traces = []
    n_acc = jnp.zeros((B,), jnp.int32)
    cost = jnp.zeros((B,))
    for step in steps:
        cag = functools.partial(
            penalty.cost_and_grad_batch,
            bctx=bctx,
            grids=grids,
            origin=scenarios.origin,
            resolution=scenarios.resolution,
            cfg=cfg,
            step=step,
            interpret=interpret,
            gp=gp,
        )
        iters = cfg.iters_step1 if step == 1 else cfg.iters_step2
        res = descent.minimize_batch(
            cag, dp, lb, ub, iters, cfg, record_trace=record_trace
        )
        dp, cost = res.dp, res.cost
        n_acc = n_acc + res.n_accept
        traces.append(res.cost_trace)

    coeff = jax.vmap(qp.coeff_from_d)(Df, dp, T)
    bad = jnp.logical_not(
        jnp.isfinite(cost) & jnp.all(jnp.isfinite(dp), axis=(1, 2))
    )
    status = jnp.where(bad, STATUS_DIVERGED, STATUS_OK).astype(jnp.int32)
    coeff_seed = jax.vmap(qp.coeff_from_d)(Df, dp0, T)
    bm = bad[:, None, None]
    dp_safe = jnp.where(bm, dp0, dp)
    coeff = jnp.where(bad[:, None, None, None], coeff_seed, coeff)
    return Solution(
        coeff=coeff,
        T=T,
        cost=cost,
        cost_trace=(
            jnp.concatenate(traces, axis=1) if traces
            else jnp.zeros((B, 0))
        ),
        n_accept=n_acc,
        dp=dp_safe,
        status=status,
    )

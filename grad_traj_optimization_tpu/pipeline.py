"""One-call batched planning pipeline: search -> seed -> raced refine.

The production composition of the framework's stages (the reference's
compare2 two-stage flow, compare2.cpp:168-321, at TPU batch scale):

1. :func:`search.kinodynamic.search_batch_adaptive` — batched beam
   search with the wider/deeper retry ladder over unreached lanes
   (optionally a SECOND search arm with the hybrid A*'s 1 s primitives,
   the round-5 tail lever from BEAM_VS_EXACT.md);
2. :func:`search.kinodynamic.resample_knots_batch` — exact cubic-
   Hermite resample to one fixed knot shape;
3. :func:`solver.solve_kino_batch_race` — the seed-duration race
   (refine under each stretch, keep the per-lane winner by cost).

Chip-measured at B=1024 (bench.py): 705 searches/s single-arm, the
honest retry pipeline at 360 solves/s (991/1024 reached AND
converged), the 2-stretch race at 298 solves/s improving 832/1024
lanes over the single-arm refine.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from grad_traj_optimization_tpu import solver as solve_mod
from grad_traj_optimization_tpu.config import OptimizerConfig
from grad_traj_optimization_tpu.search import kinodynamic


@dataclasses.dataclass(frozen=True)
class PlanBatchResult:
    solution: solve_mod.Solution   # per-lane winner of the race
    search: kinodynamic.KinoResult  # merged (retry-included) search
    reached: np.ndarray            # (B,) search reached the goal
    ok: np.ndarray                 # (B,) reached AND refine converged
    n_retried: int                 # lanes re-searched by the ladder
    arm: np.ndarray | None         # (B,) 0 = base beam, 1 = long-tau


def plan_batch(
    dists,
    origins,
    resolution: float,
    starts,
    goals,
    obstacle_pred=None,
    start_times=None,
    cfg: OptimizerConfig = OptimizerConfig(),
    n_waypoints: int = 6,
    beam: int = 64,
    max_iters: int = 16,
    retries: int = 1,
    stretches: tuple[float, ...] = (1.0, 1.2),
    long_tau_arm: bool = False,
    max_tau: float = 0.5,
    **search_kw,
) -> PlanBatchResult:
    """Plan a batch of missions end to end on device.

    Args mirror :func:`kinodynamic.search_batch_adaptive` plus the
    refine knobs; ``stretches`` races seed durations per lane
    (``(1.0,)`` disables the race), ``long_tau_arm`` adds a second
    search with 1 s primitives and keeps, per lane, the lower-cost
    refined arm (reached arms preferred).
    """
    dists = jnp.asarray(dists)
    origins = jnp.asarray(origins, jnp.float32)
    B = np.shape(starts)[0]
    ress = jnp.full((B,), resolution, jnp.float32)
    origins_b = jnp.broadcast_to(origins, (B, 3)) if (
        origins.ndim == 1
    ) else origins

    def run_arm(mt):
        r, n_re, _ = kinodynamic.search_batch_adaptive(
            dists, origins_b, resolution, starts, goals,
            obstacle_pred=obstacle_pred, start_times=start_times,
            beam=beam, max_iters=max_iters, retries=retries,
            max_tau=mt, **search_kw,
        )
        p, v, a, t = kinodynamic.resample_knots_batch(
            r.pos, r.vel, r.acc, r.times, n_waypoints
        )
        sol = solve_mod.solve_kino_batch_race(
            dists, origins_b, ress, p, v, a, t,
            stretches=stretches, cfg=cfg,
        )
        return r, sol, n_re

    r0, s0, n_re = run_arm(max_tau)
    arm = None
    if long_tau_arm and abs(max_tau - 1.0) > 1e-6:
        r1, s1, _ = run_arm(1.0)
        # per-lane winner: reached AND finite-cost arms preferred,
        # then lower cost.  Keys must stay NaN-free — an additive
        # penalty (1e9 + NaN = NaN) would make every comparison False
        # and silently keep a broken base arm over a good long-tau one
        big = jnp.asarray(1e18, s0.cost.dtype)
        b_key = jnp.where(
            r0.reached & jnp.isfinite(s0.cost), s0.cost, big
        )
        l_key = jnp.where(
            r1.reached & jnp.isfinite(s1.cost), s1.cost, big
        )
        take = l_key < b_key

        def sel(x, y):
            t = take.reshape((-1,) + (1,) * (x.ndim - 1))
            return jnp.where(t, y, x)

        s0 = jax.tree.map(sel, s0, s1)
        # search results may differ in knot count between arms — align
        # before the same per-lane select
        r0a, r1a = kinodynamic._align_knot_counts(r0, r1)
        r0 = kinodynamic.KinoResult(*(
            sel(a, b) for a, b in zip(r0a, r1a)
        ))
        arm = np.asarray(take).astype(np.int32)

    reached = np.asarray(r0.reached)
    ok = reached & (np.asarray(s0.status) == 0)
    return PlanBatchResult(
        solution=s0, search=r0, reached=reached, ok=ok,
        n_retried=int(n_re), arm=arm,
    )

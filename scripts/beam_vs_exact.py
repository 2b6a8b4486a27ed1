"""Beam-vs-exact front-end quality gate.

The TPU front-end replaces the reference's sequential priority-queue
kinodynamic A* (kinodynamic_astar.cpp:17-315) with a fixed-iteration
batched beam search (search/kinodynamic.py).  SURVEY.md section 7 set the
parity gate on the *final optimized* trajectory: the beam only needs to
land the seed in the same homotopy class as the exact search, because
the penalty back-end does the polishing.

This script measures that claim on a suite of random pillar+wall maps:

* success rate of the exact host A* (native.kino_search — the faithful
  reference algorithm) vs the beam (same margin/limits),
* on cases where both succeed: ratio of the BACK-END-REFINED penalty
  objectives, trajectory times and jerks from each seed.

Run: python scripts/beam_vs_exact.py [n_cases] — writes a table to
stdout and records the suite in BEAM_VS_EXACT.md at the repo root.
The conservative regression thresholds live in tests/test_search.py
(test_beam_vs_exact_gate).
"""

from __future__ import annotations

import functools
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def _force_cpu():
    import jax

    # NOTE: do NOT query jax.default_backend() first — that call
    # INITIALIZES the backend (axon/TPU on this host), after which the
    # config update raises and the whole suite silently runs over the
    # remote-TPU tunnel.
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized (e.g. under pytest conftest)


def make_case(rng, map_cfg=None):
    """One random search problem: pillars + a gap wall, start/goal in
    free space on opposite sides of the wall (fixtures.random_search_case)."""
    from grad_traj_optimization_tpu import fixtures

    return fixtures.random_search_case(rng, map_cfg=map_cfg)


def refine_cost(dist, origin, res, pos, vel, acc, times, cfg,
                retime: str = "search", **retime_kw):
    """Hermite seed -> penalty refinement -> (final step-2 cost, T_sum,
    jerk).  Mirrors replan._refine_kino but returns the objective.

    ``retime``: segment-duration re-allocation applied AFTER the knot
    resample (kinodynamic.retime_knots) — "search" keeps the search
    durations (reference setKinoPath semantics)."""
    import jax.numpy as jnp

    from grad_traj_optimization_tpu.core import poly, qp
    from grad_traj_optimization_tpu.opt import descent, penalty
    from grad_traj_optimization_tpu import replan
    from grad_traj_optimization_tpu.search import kinodynamic

    pos, vel, acc, times = replan._resample_knots(
        pos, vel, acc, times, 6
    )
    if retime != "search":
        times = kinodynamic.retime_knots(
            pos, vel, times, mode=retime, **retime_kw
        )
    T = jnp.asarray(times, jnp.float32)
    Df, dp0 = qp.kino_d(
        jnp.asarray(pos, jnp.float32), jnp.asarray(vel, jnp.float32),
        jnp.asarray(acc, jnp.float32),
    )
    dep = qp.build_dep(T)
    ctx = penalty.build_ctx(T, Df, cfg, dep=dep)
    lb, ub = penalty.bounds(jnp.asarray(pos, jnp.float32),
                            dp0.shape[1], cfg)
    field, grid_shape = penalty.make_field(
        dist, jnp.asarray(origin, jnp.float32), res
    )
    cag = functools.partial(
        penalty.cost_and_grad, ctx=ctx, field=field,
        grid_shape=grid_shape, cfg=cfg, step=2,
    )
    co = functools.partial(
        penalty.cost_only, ctx=ctx, field=field, grid_shape=grid_shape,
        cfg=cfg, step=2,
    )
    r = descent.minimize(cag, co, dp0, lb, ub, cfg.iters_step2, cfg,
                         record_trace=False)
    coeff = qp.coeff_from_d(Df, r.dp, T)
    return (
        float(r.cost), float(np.sum(times)),
        float(poly.jerk_cost(coeff, T)),
    )


def run_suite(n_cases: int, seed: int = 0, kino_iters: int = 30,
              beam: int = 64, margin: float = 0.2, verbose: bool = True,
              exact: str = "kino", beam_max_tau: float = 0.5,
              retime: str = "search", retries: int = 0,
              shot_mode: int = 0, search_kw: dict | None = None,
              long_tau_arm: bool = False):
    """Returns the aggregate stats dict (and prints a per-case line).

    ``exact`` picks the host oracle the beam is gated against:
    "kino" = native.kino_search (compare22's front-end,
    kinodynamic_astar.cpp:17-315); "hybrid" = native.hybrid_search
    (compare2's front-end, hybrid_astar.cpp:219-446, with its
    setParameterAuto params: max_tau=1, w_time=10, lambda_heu=5,
    horizon=50 and hard-coded 0.2 m clearance; ``shot_mode=1``
    switches its one-shot to the free-end-vel family,
    hybrid_astar.cpp:969-1021).

    ``retime``: beam-seed duration re-allocation before refinement
    (kinodynamic.retime_knots).  ``retries``: adaptive beam widening
    rounds on failure (kinodynamic.search_adaptive).
    """
    _force_cpu()
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import native
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.search import kinodynamic

    rng = np.random.default_rng(seed)
    cfg = OptimizerConfig(iters_step2=40)
    n_exact = n_beam = n_both = n_valid = n_retried = 0
    ratios_cost, ratios_time, ratios_jerk = [], [], []
    for case in range(n_cases):
        c = make_case(rng)
        if c is None:
            continue
        dist, origin, res, start, goal = c
        n_valid += 1
        s6 = np.concatenate([start, np.zeros(3)])
        g6 = np.concatenate([goal, np.zeros(3)])

        if exact == "hybrid":
            ph = native.hybrid_search(
                np.asarray(dist), origin, res, s6, g6, margin=margin,
                max_vel=3.0, max_acc=2.0, shot_mode=shot_mode,
            )
            ok_e = ph[4] == native.HYBRID_REACH_END and len(ph[3]) >= 1
            pe = (*ph[:4], ok_e)
        else:
            pe = native.kino_search(
                np.asarray(dist), origin, res, s6, g6, margin=margin,
                max_vel=3.0, max_acc=2.0, max_tau=0.5, goal_r=1e9,
            )
            ok_e = bool(pe[4])
        kb, _n_retry = kinodynamic.search_adaptive(
            dist, jnp.asarray(origin, jnp.float32), res,
            s6.astype(np.float32), g6.astype(np.float32),
            margin=margin, max_vel=3.0, max_acc=2.0,
            max_iters=kino_iters, beam=beam, max_tau=beam_max_tau,
            retries=retries, **(search_kw or {}),
        )
        n_retried += _n_retry
        kb2 = None
        if long_tau_arm and abs(beam_max_tau - 1.0) > 1e-6:
            # round-5 VERDICT item 8: a STRUCTURALLY different second
            # search arm with the hybrid A*'s long primitives
            # (hybrid_astar.cpp:8-24 hard-codes max_tau = 1 s) joins
            # the per-case race — probing whether the p90 tail vs the
            # hybrid is basin-limited or primitive-length-limited
            kb2_r, _ = kinodynamic.search_adaptive(
                dist, jnp.asarray(origin, jnp.float32), res,
                s6.astype(np.float32), g6.astype(np.float32),
                margin=margin, max_vel=3.0, max_acc=2.0,
                max_iters=kino_iters, beam=beam, max_tau=1.0,
                retries=retries, **(search_kw or {}),
            )
            if bool(kb2_r.reached):
                kb2 = kb2_r
        ok_b = bool(kb.reached) or kb2 is not None
        n_exact += ok_e
        n_beam += ok_b
        line = f"case {case}: exact={ok_e} beam={ok_b}"
        if ok_e and ok_b:
            n_both += 1
            ce, te, je = refine_cost(
                dist, origin, res, pe[0], pe[1], pe[2], pe[3], cfg
            )
            seeds = []
            if bool(kb.reached):
                seeds.append((
                    np.asarray(kb.pos), np.asarray(kb.vel),
                    np.asarray(kb.acc), np.asarray(kb.times),
                ))
            if kb2 is not None:
                seeds.append((
                    np.asarray(kb2.pos), np.asarray(kb2.vel),
                    np.asarray(kb2.acc), np.asarray(kb2.times),
                ))
            arms = (
                [a for a in retime[5:].split(",")]
                if retime.startswith("race:") else [retime]
            )
            # race every (search seed) x (retime arm) refinement and
            # keep the lowest cost per case (on TPU all arms ride one
            # batched kernel; measured in scripts/ab_beam_retime.py)
            cb = tb = jb = None
            for knots_b in seeds:
                for arm in arms:
                    mode, _, sarg = arm.partition(":")
                    kw = {"stretch": float(sarg)} if sarg else {}
                    ca_, ta_, ja_ = refine_cost(
                        dist, origin, res, *knots_b, cfg,
                        retime=mode, **kw,
                    )
                    if cb is None or ca_ < cb:
                        cb, tb, jb = ca_, ta_, ja_
            ratios_cost.append(cb / max(ce, 1e-9))
            ratios_time.append(tb / max(te, 1e-9))
            ratios_jerk.append(jb / max(je, 1e-9))
            line += (f" cost_ratio={cb / max(ce, 1e-9):.3f}"
                     f" time_ratio={tb / max(te, 1e-9):.3f}")
        if verbose:
            print(line, flush=True)

    def gm(xs):
        return float(np.exp(np.mean(np.log(np.maximum(xs, 1e-9))))) if xs else float("nan")

    stats = {
        "n_cases": n_valid,
        "exact_success": n_exact,
        "beam_success": n_beam,
        "both_success": n_both,
        "cost_ratio_geomean": gm(ratios_cost),
        "cost_ratio_p90": float(np.percentile(ratios_cost, 90)) if ratios_cost else float("nan"),
        "time_ratio_geomean": gm(ratios_time),
        "jerk_ratio_geomean": gm(ratios_jerk),
        "kino_iters": kino_iters,
        "beam": beam,
        "beam_max_tau": beam_max_tau,
        "exact_arm": exact,
        "retime": retime,
        "retries": retries,
        "n_retried": n_retried,
        "time_ratio_p90": (
            float(np.percentile(ratios_time, 90)) if ratios_time
            else float("nan")
        ),
    }
    return stats


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    retime = "race:search,stretch:1.2"
    stats_k = run_suite(n, retime=retime, retries=2)
    print(stats_k)
    stats_h = run_suite(n, exact="hybrid", retime=retime, retries=2)
    print(stats_h)
    stats_hf = run_suite(
        n, exact="hybrid", retime=retime, retries=2, shot_mode=1
    )
    print(stats_hf)
    lines = [
        "# Beam-vs-exact front-end quality (SURVEY.md section 7 parity gate)",
        "",
        "The TPU front-end is a fixed-iteration batched beam",
        "(search/kinodynamic.py); the reference ships TWO sequential",
        "front-ends it consolidates: the kinodynamic A* (compare22,",
        "kinodynamic_astar.cpp:17-315) and the hybrid A* (compare2,",
        "hybrid_astar.cpp:219-446).  Both are ported exactly to the host",
        "engine (native.kino_search / native.hybrid_search, f64) and the",
        "beam is gated against EACH on the same random pillar+wall case",
        "distribution.  Ratios compare the BACK-END-REFINED penalty",
        "objective from each seed (beam / exact) on cases where both",
        "front-ends succeed.",
        "",
        "Round-4 front-end config (ab_beam_retime.py A/B, 50 cases):",
        "adaptive beam retry (one 2x-widen round on failure,",
        "kinodynamic.search_adaptive) + a seed-level DURATION RACE",
        "(refine the search-duration and stretch:1.2 retimes, keep the",
        "lower cost per case — duration is free at seeding,",
        "PolyKinoGeneration takes Time as input, qp_generator.cpp:",
        "23-154; on TPU both arms ride one batched kernel).",
        "",
        "## vs kinodynamic A* (compare22 front-end)",
        "",
        "| metric | value |",
        "|---|---|",
    ] + [f"| {k} | {v} |" for k, v in stats_k.items()] + [
        "",
        "## vs hybrid A* (compare2 front-end, setParameterAuto params)",
        "",
        "| metric | value |",
        "|---|---|",
    ] + [f"| {k} | {v} |" for k, v in stats_h.items()] + [
        "",
        "## vs hybrid A* with the free-end-vel one-shot (shot_mode=1,",
        "freeEndVelShot hybrid_astar.cpp:969-1021 — present in the",
        "reference but unwired from searchPath)",
        "",
        "| metric | value |",
        "|---|---|",
    ] + [f"| {k} | {v} |" for k, v in stats_hf.items()] + [
        "",
        "Interpretation: the hybrid front-end's long (max_tau = 1 s)",
        "primitives seed slower, longer-duration trajectories whose",
        "refined PENALTY cost is lower (duration relaxes the smoothness",
        "term).  The round-4 duration race closes the geomean gap",
        "(~1.0 vs the round-3 1.13) while still flying ~11% faster and",
        "~3x smoother than the hybrid's seeds; the residual p90 tail is",
        "BASIN-limited (seeds land in different homotopy/duration",
        "structures on a few maps), the same structural limit measured",
        "for the solver tail in round 3.  Bounds live in",
        "tests/test_search.py::test_beam_vs_hybrid_exact_gate.",
    ]
    with open("BEAM_VS_EXACT.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote BEAM_VS_EXACT.md")


if __name__ == "__main__":
    main()

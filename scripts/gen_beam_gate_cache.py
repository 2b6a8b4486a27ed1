"""Generate the pinned beam-quality gate cache (VERDICT r4 item 6).

Runs BOTH exact host oracles (native.kino_search — compare22's
front-end, kinodynamic_astar.cpp:17-315; native.hybrid_search —
compare2's, hybrid_astar.cpp:219-446) on the pinned 25-case fixture
suite and caches their refined objectives to
``tests/data/beam_gate_oracle.npz``.  The native engine is
deterministic, so the cache is stable; the CI gate
(tests/test_search.py::test_beam_quality_pinned_gate) then runs ONLY
the batched beam + refine (seconds, one compile) and asserts the
recorded quality bounds against the cached oracle numbers — a
regression from gm 0.9 to 1.4 now fails CI instead of hiding behind
the loose 12-case subsample bound.

Run: python scripts/gen_beam_gate_cache.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from scripts.beam_vs_exact import _force_cpu, make_case, refine_cost

N_CASES = 25
SEED = 0
MARGIN = 0.2
REFINE_ITERS = 40


def main():
    _force_cpu()
    from grad_traj_optimization_tpu import native
    from grad_traj_optimization_tpu.config import OptimizerConfig

    assert native.available(), "native engine required to build the cache"
    cfg = OptimizerConfig(iters_step2=REFINE_ITERS)
    rng = np.random.default_rng(SEED)

    rows = {k: [] for k in (
        "ok_kino", "cost_kino", "time_kino", "jerk_kino",
        "ok_hybrid", "cost_hybrid", "time_hybrid", "jerk_hybrid",
    )}
    n = 0
    while n < N_CASES:
        c = make_case(rng)
        if c is None:
            continue
        n += 1
        dist, origin, res, start, goal = c
        s6 = np.concatenate([start, np.zeros(3)])
        g6 = np.concatenate([goal, np.zeros(3)])

        pk = native.kino_search(
            np.asarray(dist), origin, res, s6, g6, margin=MARGIN,
            max_vel=3.0, max_acc=2.0, max_tau=0.5, goal_r=1e9,
        )
        ok_k = bool(pk[4])
        if ok_k:
            ck, tk, jk = refine_cost(
                dist, origin, res, pk[0], pk[1], pk[2], pk[3], cfg
            )
        else:
            ck = tk = jk = np.nan
        rows["ok_kino"].append(ok_k)
        rows["cost_kino"].append(ck)
        rows["time_kino"].append(tk)
        rows["jerk_kino"].append(jk)

        ph = native.hybrid_search(
            np.asarray(dist), origin, res, s6, g6, margin=MARGIN,
            max_vel=3.0, max_acc=2.0, shot_mode=0,
        )
        ok_h = ph[4] == native.HYBRID_REACH_END and len(ph[3]) >= 1
        if ok_h:
            ch, th, jh = refine_cost(
                dist, origin, res, ph[0], ph[1], ph[2], ph[3], cfg
            )
        else:
            ch = th = jh = np.nan
        rows["ok_hybrid"].append(ok_h)
        rows["cost_hybrid"].append(ch)
        rows["time_hybrid"].append(th)
        rows["jerk_hybrid"].append(jh)
        print(
            f"case {n-1}: kino ok={ok_k} cost={ck} | "
            f"hybrid ok={ok_h} cost={ch}",
            flush=True,
        )

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tests", "data", "beam_gate_oracle.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    np.savez(
        out,
        seed=SEED, n_cases=N_CASES, margin=MARGIN,
        refine_iters=REFINE_ITERS,
        **{k: np.asarray(v) for k, v in rows.items()},
    )
    print("wrote", out)


if __name__ == "__main__":
    main()

"""A/B: beam-seed duration re-allocation + adaptive beam retry.

Round-3 VERDICT diagnosis: the beam-vs-hybrid refined-penalty gap
(geomean 1.13, BEAM_VS_EXACT.md table 2) is DURATION allocation — the
hybrid A*'s 1 s primitives seed slower plans whose refined smoothness
term is cheaper, and segment times come from the seed.  Duration is
free to change at seeding (PolyKinoGeneration takes Time as an input,
qp_generator.cpp:23-154), so this script measures retime modes
(kinodynamic.retime_knots) applied to the beam's knots before
refinement, against BOTH exact front-ends on one case set, plus the
effect of one adaptive beam-widening retry on the 4% failure rate.

Run: python scripts/ab_beam_retime.py [n_cases] [--modes a,b,...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from beam_vs_exact import _force_cpu, make_case, refine_cost  # noqa: E402


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    modes = ["search", "mean_v", "stretch:1.2", "stretch:1.4",
             "pontryagin"]
    for a in sys.argv[2:]:
        if a.startswith("--modes"):
            modes = a.split("=", 1)[1].split(",")
    _force_cpu()
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import native
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.search import kinodynamic

    rng = np.random.default_rng(0)
    cfg = OptimizerConfig(iters_step2=40)
    rows = {m: {"ck": [], "ch": [], "tk": [], "th": [], "jh": []}
            for m in modes}
    n_valid = n_beam0 = n_beam_retry = n_k = n_h = 0
    for case in range(n):
        c = make_case(rng)
        if c is None:
            continue
        dist, origin, res, start, goal = c
        n_valid += 1
        s6 = np.concatenate([start, np.zeros(3)])
        g6 = np.concatenate([goal, np.zeros(3)])
        pk = native.kino_search(
            np.asarray(dist), origin, res, s6, g6, margin=0.2,
            max_vel=3.0, max_acc=2.0, max_tau=0.5, goal_r=1e9,
        )
        ph = native.hybrid_search(
            np.asarray(dist), origin, res, s6, g6, margin=0.2,
            max_vel=3.0, max_acc=2.0,
        )
        ok_k = bool(pk[4])
        ok_h = ph[4] == native.HYBRID_REACH_END and len(ph[3]) >= 1
        n_k += ok_k
        n_h += ok_h
        kb, n_retry = kinodynamic.search_adaptive(
            dist, jnp.asarray(origin, jnp.float32), res,
            s6.astype(np.float32), g6.astype(np.float32),
            margin=0.2, max_vel=3.0, max_acc=2.0, max_iters=30,
            beam=64, retries=1,
        )
        ok_b = bool(kb.reached)
        n_beam0 += ok_b and n_retry == 0
        n_beam_retry += ok_b
        if not (ok_b and ok_k and ok_h):
            print(f"case {case}: beam={ok_b}(retry {n_retry}) "
                  f"kino={ok_k} hybrid={ok_h}", flush=True)
            continue
        ce, te, _ = refine_cost(dist, origin, res, *pk[:4], cfg)
        chh, th, jhh = refine_cost(dist, origin, res, *ph[:4], cfg)
        for m in modes:
            mode, _, sarg = m.partition(":")
            kw = {"stretch": float(sarg)} if sarg else {}
            cb, tb, jb = refine_cost(
                dist, origin, res, np.asarray(kb.pos),
                np.asarray(kb.vel), np.asarray(kb.acc),
                np.asarray(kb.times), cfg, retime=mode, **kw,
            )
            rows[m]["ck"].append(cb / max(ce, 1e-9))
            rows[m]["ch"].append(cb / max(chh, 1e-9))
            rows[m]["tk"].append(tb / max(te, 1e-9))
            rows[m]["th"].append(tb / max(th, 1e-9))
            rows[m]["jh"].append(jb / max(jhh, 1e-9))
        print(f"case {case}: ok (retry {n_retry})", flush=True)

    def gm(xs):
        return round(float(np.exp(np.mean(np.log(np.maximum(xs, 1e-9))))), 3) if xs else None

    def p90(xs):
        return round(float(np.percentile(xs, 90)), 3) if xs else None

    print(json.dumps({
        "n_valid": n_valid, "kino_ok": n_k, "hybrid_ok": n_h,
        "beam_ok_no_retry": n_beam0, "beam_ok_with_retry": n_beam_retry,
    }))
    def report(name, r):
        print(json.dumps({
            "mode": name,
            "vs_kino_cost_gm": gm(r["ck"]), "vs_kino_cost_p90": p90(r["ck"]),
            "vs_hybrid_cost_gm": gm(r["ch"]),
            "vs_hybrid_cost_p90": p90(r["ch"]),
            "vs_kino_time_gm": gm(r["tk"]),
            "vs_hybrid_time_gm": gm(r["th"]),
            "vs_hybrid_jerk_gm": gm(r["jh"]),
        }))

    for m in modes:
        report(m, rows[m])

    # best-of-two retime RACE (the framework's dual-race pattern applied
    # at the seeding level): refine both retimes, keep the lower cost
    # per case — on TPU the second arm rides the same batched kernel
    for a, b in [(x, y) for x in modes for y in modes if x < y]:
        ra, rb = rows[a], rows[b]
        if not ra["ch"]:
            continue
        pick = np.asarray(ra["ch"]) <= np.asarray(rb["ch"])
        combo = {
            k: list(np.where(pick, np.asarray(ra[k]), np.asarray(rb[k])))
            for k in ra
        }
        report(f"race({a},{b})", combo)


if __name__ == "__main__":
    main()

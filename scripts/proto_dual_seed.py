"""Prototype: dual-seed racing + phase-1 rescue for the min-snap tail.

proto_descent_variants.py showed: min-snap seeding reaches the
production final cost by iter ~18 at median but ~25% of lanes land in
worse basins; nonmonotone acceptance is a uniform free win.  Here:

  * per-lane min over {straight-line seed, min-snap seed} runs at
    equal split budgets (2 x K evals total) vs production bb@100
  * min-snap seed with a collision-only phase 1 (does it rescue the
    tail lanes that start deep in collision?)

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/proto_dual_seed.py [B]
"""

import functools
import json
import sys
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

from proto_descent_variants import variant_minimize


def main():
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures, solver as solve_mod
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.core import qp
    from grad_traj_optimization_tpu.fields import sdf
    from grad_traj_optimization_tpu.opt import penalty
    from grad_traj_optimization_tpu.ops import trilinear_pallas as tp

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    N_WP = 7
    ITERS = 100
    cfg = OptimizerConfig()

    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        B, n_waypoints=N_WP, seed=42, max_obstacle_points=4096
    )
    grid = map_cfg.grid_shape
    origin = jnp.asarray(map_cfg.origin, jnp.float32)
    res = map_cfg.resolution

    @jax.jit
    def build_fields(pts, valid):
        occ = jax.vmap(
            lambda p, v: sdf.rasterize(p, origin, res, grid, valid_mask=v)
        )(pts.astype(jnp.float32), valid)
        return sdf.edt_batch(occ, res)

    dist = build_fields(jnp.asarray(pts, jnp.float32), jnp.asarray(valid))
    _ = float(dist[0, 0, 0, 0])
    print(f"fields built: {dist.shape}", flush=True)

    scns = solve_mod.Scenario(
        dist=dist,
        origin=jnp.broadcast_to(origin, (B, 3)),
        resolution=jnp.full((B,), res, jnp.float32),
        waypoints=jnp.asarray(wps, jnp.float32),
    )

    wp = scns.waypoints
    T = jax.vmap(lambda w: qp.allocate_times(w, cfg.mean_v, cfg.init_time))(
        wp
    )
    Df, dp0 = jax.vmap(qp.straight_line_d)(wp)
    bctx = penalty.build_ctx_batch(T, Df, cfg)
    num_dp = dp0.shape[2]
    lb, ub = jax.vmap(
        lambda w: penalty.bounds(w, num_dp, cfg, dtype=w.dtype)
    )(wp)
    gp = tp.prep_grids(scns.dist)

    @jax.jit
    def minsnap_seed(Df, Rpp, Rfp, lb, ub):
        diag = jnp.sqrt(jnp.clip(
            jnp.diagonal(Rpp, axis1=1, axis2=2), 1e-30))
        si = 1.0 / diag
        rs = Rpp * si[:, :, None] * si[:, None, :]
        rhs = -jnp.einsum(
            "bxf,bfp->bxp", Df, Rfp,
            precision=jax.lax.Precision.HIGHEST,
        ) * si[:, None, :]
        z = jnp.linalg.solve(
            rs[:, None].repeat(3, axis=1), rhs[..., None]
        )[..., 0] * si[:, None, :]
        return jnp.clip(z, lb, ub)

    dp0_ms = minsnap_seed(Df, bctx.dep.Rpp, bctx.dep.Rfp, lb, ub)
    _ = float(jnp.sum(dp0_ms))

    @functools.partial(jax.jit, static_argnames=("window", "steps"))
    def run(dp_init, lb, ub, bctx, grids, origin, resolution, gp,
            window, steps):
        def make_cag(step):
            return functools.partial(
                penalty.cost_and_grad_batch,
                bctx=bctx, grids=grids, origin=origin,
                resolution=resolution, cfg=cfg, step=step, gp=gp,
            )
        dp = dp_init
        traces = []
        for step, iters in steps:
            dp, best_c, n_acc, tr = variant_minimize(
                make_cag(step), dp, lb, ub, iters, cfg, rule="bb2",
                window=window,
            )
            traces.append(tr)
        # final-phase full-cost trace is the comparable envelope
        return dp, best_c, traces[-1]

    common = (lb, ub, bctx, scns.dist, scns.origin, scns.resolution, gp)

    # production baseline
    _, base_c, base_tr = run(dp0, *common, window=1, steps=((2, ITERS),))
    base_c = np.asarray(base_c)
    print(
        json.dumps({
            "variant": "base_bb2@100",
            "geomean": float(np.exp(np.mean(np.log(base_c)))),
        }), flush=True,
    )

    def stats(name, c, evals):
        ratio = np.asarray(c) / base_c
        print(json.dumps({
            "variant": name,
            "evals": evals,
            "gm": round(float(np.exp(np.mean(np.log(ratio)))), 4),
            "p50": round(float(np.median(ratio)), 4),
            "p95": round(float(np.percentile(ratio, 95)), 3),
            "p99": round(float(np.percentile(ratio, 99)), 3),
            "max": round(float(np.max(ratio)), 2),
            ">1.02": round(float(np.mean(ratio > 1.02)), 4),
            ">1.05": round(float(np.mean(ratio > 1.05)), 4),
            ">1.2": round(float(np.mean(ratio > 1.2)), 4),
        }), flush=True)

    # single-seed nonmono8 traces (full budget each, cut at k later)
    _, st_c, st_tr = run(dp0, *common, window=8, steps=((2, ITERS),))
    _, ms_c, ms_tr = run(dp0_ms, *common, window=8, steps=((2, ITERS),))
    st_tr = np.asarray(st_tr)
    ms_tr = np.asarray(ms_tr)
    stats("straight_nm8@100", st_c, 100)
    stats("ms_nm8@100", ms_c, 100)

    # dual-seed racing at equal-split budgets: total evals 2k
    for k in (25, 30, 40, 50, 100):
        comb = np.minimum(st_tr[:, k - 1], ms_tr[:, k - 1])
        stats(f"dual_nm8@{k}+{k}", comb, 2 * k)
    # asymmetric splits (ms converges faster at median)
    for ks, km in ((60, 40), (70, 30), (40, 60)):
        comb = np.minimum(st_tr[:, ks - 1], ms_tr[:, km - 1])
        stats(f"dual_nm8@st{ks}+ms{km}", comb, ks + km)

    # phase-1 rescue of the ms tail: collision-only shaping first
    for it1, it2 in ((20, 80), (40, 60), (20, 40)):
        _, c_p, tr_p = run(
            dp0_ms, *common, window=8, steps=((1, it1), (2, it2))
        )
        stats(f"ms_nm8_phase1@{it1}+{it2}", c_p, it1 + it2)
        tr_p = np.asarray(tr_p)
        # and its dual with straight-line at matching total budget
        k_st = min(ITERS, it1 + it2)
        comb = np.minimum(st_tr[:, k_st - 1], tr_p[:, -1])
        stats(f"dual_st{k_st}+msP1_{it1}_{it2}", comb, k_st + it1 + it2)


if __name__ == "__main__":
    main()

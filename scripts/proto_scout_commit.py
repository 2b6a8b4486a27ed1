"""Evaluate scout-then-commit seed racing from full per-seed traces.

Policy: run BOTH seeds k iterations (2k evals), commit to the per-lane
winner by cost@k, spend the remaining budget continuing it; at a total
budget of E evals the winner reaches its own trace position E - k.
Because a continued run IS the full run's prefix, policy quality is
computable exactly from two full traces — no new descent code needed.

Reports, per scout length k and total budget E: the committed-choice
agreement with the oracle (winner at 100), and cost ratios vs the
production monotone bb@100 baseline.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/proto_scout_commit.py [B]
"""

import functools
import json
import sys

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

    @functools.partial(jax.jit, static_argnames=("window",))
    def run(dp_init, lb, ub, bctx, grids, origin, resolution, gp,
            window):
        cag = functools.partial(
            penalty.cost_and_grad_batch,
            bctx=bctx, grids=grids, origin=origin,
            resolution=resolution, cfg=cfg, step=2, gp=gp,
        )
        return variant_minimize(
            cag, dp_init, lb, ub, ITERS, cfg, rule="bb2", window=window,
        )

    common = (lb, ub, bctx, scns.dist, scns.origin, scns.resolution, gp)
    _, base_c, _, _ = run(dp0, *common, window=1)
    base_c = np.asarray(base_c)
    _, _, _, st_tr = run(dp0, *common, window=8)
    _, _, _, ms_tr = run(dp0_ms, *common, window=8)
    st_tr, ms_tr = np.asarray(st_tr), np.asarray(ms_tr)

    def stats(name, c, evals):
        ratio = c / base_c
        print(json.dumps({
            "variant": name,
            "evals": evals,
            "gm": round(float(np.exp(np.mean(np.log(ratio)))), 4),
            "p50": round(float(np.median(ratio)), 4),
            "p95": round(float(np.percentile(ratio, 95)), 3),
            "p99": round(float(np.percentile(ratio, 99)), 3),
            "max": round(float(np.max(ratio)), 2),
            ">1.05": round(float(np.mean(ratio > 1.05)), 4),
            ">1.2": round(float(np.mean(ratio > 1.2)), 4),
        }), flush=True)

    oracle = (ms_tr[:, -1] < st_tr[:, -1])  # True = ms wins at 100
    print(json.dumps({
        "ms_wins_at_100": round(float(np.mean(oracle)), 4)
    }), flush=True)

    for k in (5, 10, 15, 20, 30):
        pick_ms = ms_tr[:, k - 1] < st_tr[:, k - 1]
        agree = float(np.mean(pick_ms == oracle))
        # total budget E evals: scout 2k, continue winner to E - k
        for E in (60, 80, 100):
            if E - k - 1 >= ITERS or E <= 2 * k:
                continue
            cost = np.where(
                pick_ms, ms_tr[:, E - k - 1], st_tr[:, E - k - 1]
            )
            stats(f"scout{k}_E{E} (agree={agree:.3f})", cost, E)
        # regret vs oracle choice at full length
        cost_or = np.where(oracle, ms_tr[:, -1], st_tr[:, -1])
        cost_pk = np.where(pick_ms, ms_tr[:, -1], st_tr[:, -1])
        reg = cost_pk / cost_or
        print(json.dumps({
            "k": k, "agree": round(agree, 4),
            "choice_regret_gm": round(
                float(np.exp(np.mean(np.log(reg)))), 4),
            "choice_regret_p99": round(float(np.percentile(reg, 99)), 3),
        }), flush=True)


if __name__ == "__main__":
    main()

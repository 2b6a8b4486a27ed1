"""Prototype sweep: convergence-per-iteration levers for the BB descent.

Follow-up to proto_precond.py (smoothness-metric preconditioning: dead
end — 4-15x worse, see CLAUDE.md).  Tests cheap variants of the BB
loop, all at the same per-iteration cost (one fused cost+grad eval):

  * BB step forms: BB2 (production), BB1, alternating, ABBmin
  * larger lr_max (the clip may be binding)
  * nonmonotone acceptance (Grippo window, best-iterate tracking)
  * min-snap closed-form seed (dp0 = -Rpp^-1 Rfp^T df: the reference's
    own type-1 init, qp_generator.cpp:242-315) vs straight-line seed

Metrics vs the production bb@100 final cost, read off monotone
best-cost envelopes.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/proto_descent_variants.py [B]
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


def variant_minimize(cag, dp0, lb, ub, iters, cfg, rule="bb2",
                     window=1, lr_max=None):
    """Generalized minimize_batch: BB step form + nonmonotone window.

    window=1 reproduces the production monotone rule exactly (for
    rule='bb2', lr_max=cfg.lr_max).  Returns the BEST-iterate dp/cost
    and the monotone best-cost envelope.
    """
    import jax
    import jax.numpy as jnp

    lr_hi = cfg.lr_max if lr_max is None else lr_max
    dp0 = jnp.clip(jnp.asarray(dp0), lb, ub)
    B = dp0.shape[0]

    def body(state, it):
        dp, grad, lr, scale, hist, hptr, best_c, best_dp, n_acc = state
        step = (lr * scale)[:, None, None]
        cand = jnp.clip(dp - step * grad, lb, ub)
        c2, g2 = cag(cand)
        ref = jnp.max(hist, axis=1)  # nonmonotone reference cost
        accept = c2 < ref
        am = accept[:, None, None]

        s = cand - dp
        y = g2 - grad
        sy = jnp.sum(s * y, axis=(1, 2))
        ss = jnp.sum(s * s, axis=(1, 2))
        yy = jnp.sum(y * y, axis=(1, 2))
        bb1 = jnp.abs(ss) / jnp.maximum(jnp.abs(sy), 1e-20)
        bb2 = jnp.abs(sy) / jnp.maximum(yy, 1e-20)
        if rule == "bb2":
            lr_new = bb2
        elif rule == "bb1":
            lr_new = bb1
        elif rule == "alt":
            lr_new = jnp.where((it % 2) == 0, bb2, bb1)
        elif rule == "abbmin":
            # adaptive BB: bb2 when the pair is well-conditioned for it
            lr_new = jnp.where(bb2 / jnp.maximum(bb1, 1e-20) < 0.8,
                               bb2, bb1)
        else:
            raise ValueError(rule)
        lr_new = jnp.clip(lr_new, cfg.lr_min, lr_hi)
        lr = jnp.where(accept, lr_new, lr)
        scale = jnp.where(accept, 1.0, scale * cfg.lr_shrink)
        scale = jnp.maximum(scale, 1e-8)

        # nonmonotone history ring (window=1 -> plain monotone)
        hist = jnp.where(
            accept[:, None]
            & (jnp.arange(hist.shape[1])[None, :] == hptr[:, None]),
            c2[:, None], hist,
        )
        hptr = jnp.where(accept, (hptr + 1) % hist.shape[1], hptr)

        improved = c2 < best_c
        best_dp = jnp.where(improved[:, None, None], cand, best_dp)
        best_c = jnp.where(improved, c2, best_c)

        dp = jnp.where(am, cand, dp)
        grad = jnp.where(am, g2, grad)
        n_acc = n_acc + accept.astype(jnp.int32)
        return (dp, grad, lr, scale, hist, hptr, best_c, best_dp,
                n_acc), best_c

    c0, g0 = cag(dp0)
    gn = jnp.sqrt(jnp.sum(g0 * g0, axis=(1, 2)))
    lr0 = cfg.lr0 / (gn + 1e-12)
    hist = jnp.broadcast_to(c0[:, None], (B, window))
    init = (
        dp0, g0, lr0, jnp.ones((B,), dp0.dtype), hist,
        jnp.zeros((B,), jnp.int32), c0, dp0, jnp.zeros((B,), jnp.int32),
    )
    (dp, _, _, _, _, _, best_c, best_dp, n_acc), trace = jax.lax.scan(
        body, init, jnp.arange(iters)
    )
    return best_dp, best_c, n_acc, jnp.moveaxis(trace, 0, 1)


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

    # min-snap seed: dp* = -Rpp^-1 Rfp^T df per axis (Jacobi-equilibrated)
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

    @functools.partial(jax.jit, static_argnames=("rule", "window",
                                                 "lr_max"))
    def run(dp_init, lb, ub, bctx, grids, origin, resolution, gp,
            rule, window, lr_max):
        cag = functools.partial(
            penalty.cost_and_grad_batch,
            bctx=bctx, grids=grids, origin=origin,
            resolution=resolution, cfg=cfg, step=2, gp=gp,
        )
        return variant_minimize(
            cag, dp_init, lb, ub, ITERS, cfg, rule=rule, window=window,
            lr_max=lr_max,
        )

    variants = [
        ("base_bb2", dp0, "bb2", 1, None),
        ("bb2_lrmax100", dp0, "bb2", 1, 100.0),
        ("bb1", dp0, "bb1", 1, None),
        ("alt", dp0, "alt", 1, None),
        ("abbmin", dp0, "abbmin", 1, None),
        ("nonmono4", dp0, "bb2", 4, None),
        ("nonmono8", dp0, "bb2", 8, None),
        ("ms_seed_bb2", dp0_ms, "bb2", 1, None),
        ("ms_seed_nonmono4", dp0_ms, "bb2", 4, None),
        ("ms_seed_abbmin", dp0_ms, "abbmin", 1, None),
    ]

    cost_base = None
    for name, dpi, rule, window, lrm in variants:
        t0 = time.perf_counter()
        _, best_c, n_acc, tr = run(
            dpi, lb, ub, bctx, scns.dist, scns.origin, scns.resolution,
            gp, rule=rule, window=window, lr_max=lrm,
        )
        tr = np.asarray(tr)
        best_c = np.asarray(best_c)
        dt = time.perf_counter() - t0
        if cost_base is None:
            cost_base = best_c
        out = {
            "variant": name,
            "t_s": round(dt, 1),
            "n_accept_p50": int(np.median(np.asarray(n_acc))),
            "geomean_cost": float(np.exp(np.mean(np.log(best_c)))),
        }
        for k in (40, 50, 60, 80, 100):
            ratio = tr[:, k - 1] / cost_base
            out[f"r@{k}"] = {
                "gm": round(float(np.exp(np.mean(np.log(ratio)))), 4),
                "p95": round(float(np.percentile(ratio, 95)), 3),
                "p99": round(float(np.percentile(ratio, 99)), 3),
                "max": round(float(np.max(ratio)), 2),
                ">1.05": round(float(np.mean(ratio > 1.05)), 4),
            }
        reach = tr <= cost_base[:, None] * 1.001
        any_r = reach.any(axis=1)
        first = np.where(any_r, reach.argmax(axis=1) + 1, ITERS + 1)
        out["iters_to_base"] = {
            "p50": int(np.percentile(first, 50)),
            "p90": int(np.percentile(first, 90)),
            "p99": int(np.percentile(first, 99)),
            "never": round(float(np.mean(~any_r)), 4),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

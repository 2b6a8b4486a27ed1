"""Prototype: preconditioned BB descent (smoothness-Hessian metric).

Compares the production BB rule against a Levenberg-Marquardt-damped
preconditioned variant ("pbb") on the bench's random-scenario
distribution, via the per-iteration fused-lookup path (identical cost
function, record_trace=True so the monotone envelope gives cost-at-k
for every k in one run).

Direction:  z = V diag(1/(lam + mu*mean(lam))) V^T grad,
            Rpp = V diag(lam) V^T   (precomputed once per scenario)
mu adapts per scenario: shrink on accept, grow on reject, so lanes
where the smoothness metric misfits the collision-dominated landscape
degrade gracefully to plain gradient/BB behavior (the safeguard the
earlier prototype lacked: fixed-metric pbb had a p95 33x cost tail).

Run on the real chip (single process, tunnel rules):
    python scripts/proto_precond.py [B]
"""

import json
import sys
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def pbb_minimize_batch(cag, dp0, lb, ub, iters, cfg, V, lam,
                       mu0=0.1, mu_grow=4.0, mu_shrink=0.5,
                       mu_min=1e-8, mu_max=1e8, adapt=True):
    import jax
    import jax.numpy as jnp

    dp0 = jnp.clip(jnp.asarray(dp0), lb, ub)
    B = dp0.shape[0]
    lam = jnp.maximum(lam, 0.0)                    # (B, P) eigh PSD floor
    lbar = jnp.mean(lam, axis=1)                   # (B,)

    def precond(g, mu):
        # z = V diag(1/(lam + mu*lbar)) V^T g ; g (B, 3, P)
        gV = jnp.einsum("bpi,bxp->bxi", V, g)
        gV = gV / (lam[:, None, :] + (mu * lbar)[:, None, None])
        return jnp.einsum("bpi,bxi->bxp", V, gV)

    def body(state, _):
        dp, grad, lr, scale, mu, cost, n_acc = state
        z = precond(grad, mu)
        step = (lr * scale)[:, None, None]
        cand = jnp.clip(dp - step * z, lb, ub)
        c2, g2 = cag(cand)
        accept = c2 < cost
        am = accept[:, None, None]

        z2 = precond(g2, mu)
        s = cand - dp
        y = z2 - z
        sy = jnp.sum(s * y, axis=(1, 2))
        yy = jnp.sum(y * y, axis=(1, 2))
        lr_bb = jnp.clip(
            jnp.abs(sy) / jnp.maximum(yy, 1e-20), cfg.lr_min, cfg.lr_max
        )
        lr = jnp.where(accept, lr_bb, lr)
        scale = jnp.where(accept, 1.0, scale * cfg.lr_shrink)
        scale = jnp.maximum(scale, 1e-8)
        if adapt:
            mu = jnp.where(
                accept,
                jnp.maximum(mu * mu_shrink, mu_min),
                jnp.minimum(mu * mu_grow, mu_max),
            )
        dp = jnp.where(am, cand, dp)
        grad = jnp.where(am, g2, grad)
        cost = jnp.where(accept, c2, cost)
        n_acc = n_acc + accept.astype(jnp.int32)
        return (dp, grad, lr, scale, mu, cost, n_acc), cost

    c0, g0 = cag(dp0)
    mu = jnp.full((B,), mu0, dp0.dtype)
    z0 = precond(g0, mu)
    zn = jnp.sqrt(jnp.sum(z0 * z0, axis=(1, 2)))
    lr_init = cfg.lr0 / (zn + 1e-12)
    init = (
        dp0, g0, lr_init, jnp.ones((B,), dp0.dtype), mu, c0,
        jnp.zeros((B,), jnp.int32),
    )
    (dp, _, _, _, mu, cost, n_acc), trace = jax.lax.scan(
        body, init, None, length=iters
    )
    return dp, cost, n_acc, jnp.moveaxis(trace, 0, 1), mu


def main():
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures, solver as solve_mod
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.core import qp
    from grad_traj_optimization_tpu.fields import sdf
    from grad_traj_optimization_tpu.opt import descent, penalty
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

    # ---- shared solve machinery (mirrors solve_batch_fused prep) ----
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

    import functools

    # eigendecomposition of Rpp (once per scenario)
    lam, V = jnp.linalg.eigh(bctx.dep.Rpp)  # (B,P), (B,P,P)
    _ = float(lam[0, 0])
    print(
        f"Rpp eig range: lam_min={float(jnp.min(lam)):.3e} "
        f"lam_max={float(jnp.max(lam)):.3e}", flush=True,
    )

    # ---- baseline: production bb, trace recorded ----
    # NOTE: all big arrays are jit ARGUMENTS — closed-over arrays get
    # baked into the HLO as constants and blow the remote-compile
    # request size on the tunnel (HTTP 413).
    @jax.jit
    def run_bb(dp0, lb, ub, bctx, grids, origin, resolution, gp):
        cag = functools.partial(
            penalty.cost_and_grad_batch,
            bctx=bctx, grids=grids, origin=origin,
            resolution=resolution, cfg=cfg, step=2, gp=gp,
        )
        r = descent.minimize_batch(
            cag, dp0, lb, ub, ITERS, cfg, record_trace=True
        )
        return r.dp, r.cost, r.n_accept, r.cost_trace

    t0 = time.perf_counter()
    _, cost_bb, nacc_bb, tr_bb = run_bb(
        dp0, lb, ub, bctx, scns.dist, scns.origin, scns.resolution, gp
    )
    cost_bb = np.asarray(cost_bb)
    tr_bb = np.asarray(tr_bb)
    print(f"bb done in {time.perf_counter()-t0:.1f}s "
          f"(incl compile); geomean cost "
          f"{np.exp(np.mean(np.log(cost_bb))):.4f}", flush=True)

    variants = [
        ("pbb_mu0.1", dict(mu0=0.1, adapt=True)),
        ("pbb_mu0.01", dict(mu0=0.01, adapt=True)),
        ("pbb_mu1.0", dict(mu0=1.0, adapt=True)),
        ("pbb_fixed1e-6", dict(mu0=1e-6, adapt=False)),  # unsafeguarded
    ]

    def trace_stats(name, tr):
        """Per-variant convergence report vs the bb@100 baseline."""
        out = {"variant": name}
        # cost at selected budgets (monotone envelope -> direct read)
        for k in (30, 40, 50, 60, 80, 100):
            ratio = tr[:, k - 1] / cost_bb
            out[f"ratio@{k}"] = {
                "geomean": float(np.exp(np.mean(np.log(ratio)))),
                "p50": float(np.median(ratio)),
                "p95": float(np.percentile(ratio, 95)),
                "p99": float(np.percentile(ratio, 99)),
                "max": float(np.max(ratio)),
                "frac>1.05": float(np.mean(ratio > 1.05)),
            }
        # first iteration reaching the bb final cost
        reach = tr <= cost_bb[:, None] * 1.001
        any_reach = reach.any(axis=1)
        first = np.where(any_reach, reach.argmax(axis=1) + 1, ITERS + 1)
        out["iters_to_bb_final"] = {
            "p50": int(np.percentile(first, 50)),
            "p90": int(np.percentile(first, 90)),
            "p99": int(np.percentile(first, 99)),
            "frac_never": float(np.mean(~any_reach)),
        }
        print(json.dumps(out), flush=True)
        return out

    # bb's own self-convergence for context
    trace_stats("bb_self", tr_bb)

    for name, kw in variants:
        @functools.partial(jax.jit, static_argnames=("kwk",))
        def run_p(dp0, lb, ub, bctx, grids, origin, resolution, gp,
                  V, lam, kwk):
            cag = functools.partial(
                penalty.cost_and_grad_batch,
                bctx=bctx, grids=grids, origin=origin,
                resolution=resolution, cfg=cfg, step=2, gp=gp,
            )
            return pbb_minimize_batch(
                cag, dp0, lb, ub, ITERS, cfg, V, lam, **dict(kwk)
            )

        t0 = time.perf_counter()
        _, cost_p, nacc_p, tr_p, mu_f = run_p(
            dp0, lb, ub, bctx, scns.dist, scns.origin, scns.resolution,
            gp, V, lam, kwk=tuple(sorted(kw.items())),
        )
        tr_p = np.asarray(tr_p)
        cost_p = np.asarray(cost_p)
        dt = time.perf_counter() - t0
        print(
            f"{name}: {dt:.1f}s, n_accept p50="
            f"{int(np.median(np.asarray(nacc_p)))}, final mu p50="
            f"{float(np.median(np.asarray(mu_f))):.2e}", flush=True,
        )
        trace_stats(name, tr_p)


if __name__ == "__main__":
    main()

"""Chip A/B: collision-quadrature coarseness vs throughput/quality.

The reference samples the collision line integral at a fixed 30 points
per segment (grad_traj_optimizer.cpp:351-353) — the parity configs keep
that.  The lookup work (the solve's dominant cost) scales linearly with
the sample count, so a coarser quadrature is a throughput lever like
TURBO: this script measures solves/s AND solution quality for
n_samples in {30, 20, 15, 10}, where quality is each arm's final dp
re-scored under the FULL 30-sample objective (so coarser arms can't
grade their own homework).

One JSON line per arm.  Run on the real chip.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures
    from grad_traj_optimization_tpu import solver as solve_mod
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.fields import sdf
    from grad_traj_optimization_tpu.opt import penalty

    BATCH = 1024
    base_cfg = OptimizerConfig()

    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        BATCH, n_waypoints=7, seed=42, max_obstacle_points=4096
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
        origin=jnp.broadcast_to(origin, (BATCH, 3)),
        resolution=jnp.full((BATCH,), res, jnp.float32),
        waypoints=jnp.asarray(wps, jnp.float32),
    )

    # the 30-sample referee: re-score any arm's dp under the full
    # quadrature (mxu lookup — one evaluation, cost negligible)
    import functools

    # grids/waypoints MUST be traced args, not closure constants — a
    # closure bakes them into the HLO and overflows the tunnel's
    # remote-compile request limit (HTTP 413; see CLAUDE.md)
    @functools.partial(jax.jit, static_argnames=("cfg",))
    def rescore(dp_b, sc, cfg):
        from grad_traj_optimization_tpu.core import qp

        T_b = jax.vmap(
            lambda w: qp.allocate_times(w, cfg.mean_v, cfg.init_time)
        )(sc.waypoints)
        Df_b, _ = jax.vmap(qp.straight_line_d)(sc.waypoints)
        bctx = penalty.build_ctx_batch(T_b, Df_b, cfg)
        c, _ = penalty.cost_and_grad_batch(
            dp_b, bctx, sc.dist, sc.origin, sc.resolution,
            dataclasses.replace(cfg, lookup_mode="mxu"), step=2,
        )
        return c

    results = {}
    for ns in (30, 20, 15, 10):
        cfg = dataclasses.replace(base_cfg, n_samples=ns)
        run = lambda: solve_mod.solve_batch(
            scns, cfg=cfg, steps=(2,), record_trace=False
        )
        s = run()
        _ = float(jnp.sum(s.cost))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run().cost))
            ts.append(time.perf_counter() - t0)
        c30 = np.asarray(rescore(s.dp, scns, base_cfg))
        results[ns] = (min(ts), c30, np.asarray(s.status))
        line = {
            "n_samples": ns,
            "solves_per_s": round(BATCH / min(ts), 1),
            "n_ok": int((np.asarray(s.status) == 0).sum()),
        }
        if 30 in results:
            ratio = c30 / results[30][1]
            keep = np.isfinite(ratio) & (ratio > 0)
            line["cost30_geomean_ratio"] = round(
                float(np.exp(np.mean(np.log(ratio[keep])))), 4
            )
            line["cost30_p99_ratio"] = round(
                float(np.percentile(ratio[keep], 99)), 3
            )
            line["n_excluded"] = int((~keep).sum())
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()

"""Chip measurement: the dual-seed quality-vs-throughput FRONTIER.

Round-1/2 landed two points (TURBO 70+30, TURBO_FAST 30+30).  This
sweep maps the frontier across step-2 budgets so deployments can pick a
point: for each (straight-line-arm iters, min-snap-arm iters) the
per-lane best of the two seeds is compared against the
reference-faithful config's final costs from the same run.

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

    BATCH = 1024
    ref_cfg = OptimizerConfig()
    arms = [
        ("dual 30+30 (TURBO_FAST)", 30, 30),
        ("dual 40+30", 40, 30),
        ("dual 50+30", 50, 30),
        ("dual 60+30", 60, 30),
        ("dual 70+30 (TURBO)", 70, 30),
        ("dual 50+50", 50, 50),
    ]

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

    def measure(cfg):
        run = lambda: solve_mod.solve_batch(
            scns, cfg=cfg, steps=(2,), record_trace=False
        )
        sols = run()
        _ = float(jnp.sum(sols.cost))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run().cost))
            ts.append(time.perf_counter() - t0)
        return min(ts), np.asarray(sols.cost), np.asarray(sols.status)

    t_ref, c_ref, st_ref = measure(ref_cfg)
    print(json.dumps({
        "config": "reference 100 evals",
        "solves_per_s": round(BATCH / t_ref, 1),
        "n_ok": int((st_ref == 0).sum()),
    }), flush=True)

    for label, st_it, ms_it in arms:
        cfg = dataclasses.replace(
            ref_cfg, accept_window=8, seed_mode="dual",
            iters_step2=st_it, dual_ms_iters=ms_it,
        )
        t, c, st = measure(cfg)
        ratio = c / np.maximum(c_ref, 1e-9)
        keep = np.isfinite(ratio) & (ratio > 0)
        print(json.dumps({
            "config": label,
            "evals": st_it + ms_it,
            "solves_per_s": round(BATCH / t, 1),
            "n_ok": int((st == 0).sum()),
            "cost_geomean_ratio": round(
                float(np.exp(np.mean(np.log(ratio[keep])))), 4
            ),
            "cost_p95_ratio": round(float(np.quantile(ratio[keep], 0.95)), 3),
            "cost_p99_ratio": round(float(np.quantile(ratio[keep], 0.99)), 3),
            "n_excluded": int((~keep).sum()),
        }), flush=True)


if __name__ == "__main__":
    main()

"""Chip measurement: a faster-budget turbo point (dual 30+30 evals).

Compares, at B=1024 on the bench distribution:
  ref   — reference-faithful config (100 evals, monotone)
  turbo — TURBO_CONFIG (dual seed 70+30, nonmonotone, 100 evals)
  fast  — dual seed 30+30, nonmonotone (60 evals)
reporting throughput and final-cost ratios vs ref.
"""

import dataclasses
import json
import time

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures
    from grad_traj_optimization_tpu import solver as solve_mod
    from grad_traj_optimization_tpu.config import (
        OptimizerConfig, TURBO_CONFIG,
    )
    from grad_traj_optimization_tpu.fields import sdf

    BATCH = 1024
    cfgs = {
        "ref": OptimizerConfig(),
        "turbo": TURBO_CONFIG,
        "fast": dataclasses.replace(
            TURBO_CONFIG, iters_step2=30, dual_ms_iters=30
        ),
    }

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

    costs = {}
    for name, cfg in cfgs.items():
        run = lambda: solve_mod.solve_batch(
            scns, cfg=cfg, steps=(2,), record_trace=False
        )
        sols = run()
        _ = float(jnp.sum(sols.cost))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run().cost))
            times.append(time.perf_counter() - t0)
        t = min(times)
        costs[name] = np.asarray(sols.cost)
        print(json.dumps({
            "config": name, "solves_per_s": round(BATCH / t, 1),
            "n_ok": int(np.sum(np.asarray(sols.status) == 0)),
        }), flush=True)

    for name in ("turbo", "fast"):
        ratio = costs[name] / np.maximum(costs["ref"], 1e-9)
        print(json.dumps({
            "config": name,
            "cost_geomean_ratio": float(np.exp(np.mean(np.log(ratio)))),
            "cost_p95_ratio": float(np.quantile(ratio, 0.95)),
            "cost_p99_ratio": float(np.quantile(ratio, 0.99)),
        }), flush=True)


if __name__ == "__main__":
    main()

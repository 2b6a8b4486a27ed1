"""Chip A/B: whole-descent kernel dynamic z-window widths.

Times descend_fused at B=1024 (same scenario distribution as bench.py)
for zwin in {0 (off), 2, 3} chunks, and cross-checks outputs against
the full-depth path.  One JSON line per arm.  Run on the real chip.
"""

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
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.fields import sdf
    from grad_traj_optimization_tpu.ops import solve_pallas as sk

    BATCH = 1024
    cfg = OptimizerConfig()

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
    kargs, _extras = solve_mod.kernel_inputs(scns, cfg)
    phases = ((2, cfg.iters_step2),)

    outs = {}
    for zwin in (0, 2, 3):
        # descend_fused is itself jitted; an argless jit wrapper here
        # would bake kargs (incl. all grids) into the HLO as constants
        # and overflow the tunnel's remote-compile request limit.
        run = lambda: sk.descend_fused(*kargs, phases, cfg, zwin=zwin)
        o = run()
        _ = float(jnp.sum(o[1]))  # compile + host-read sync
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run()[1]))
            times.append(time.perf_counter() - t0)
        t = min(times)
        outs[zwin] = o
        print(json.dumps({
            "zwin": zwin, "t_s": round(t, 4),
            "solves_per_s": round(BATCH / t, 1),
        }), flush=True)

    dp_f, cost_f = np.asarray(outs[0][0]), np.asarray(outs[0][1])
    for zwin in (2, 3):
        dp_t, cost_t = np.asarray(outs[zwin][0]), np.asarray(outs[zwin][1])
        rel = np.abs(cost_t - cost_f) / np.maximum(np.abs(cost_f), 1e-6)
        print(json.dumps({
            "zwin": zwin,
            "cost_rel_p50": float(np.median(rel)),
            "cost_rel_p99": float(np.quantile(rel, 0.99)),
            "cost_rel_max": float(rel.max()),
            "dp_absmax": float(np.abs(dp_t - dp_f).max()),
        }), flush=True)


if __name__ == "__main__":
    main()

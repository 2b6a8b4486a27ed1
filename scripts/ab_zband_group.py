"""Round-5 probe: can grouping samples by shared z-band ACROSS the
batch speed the solver lookup? (VERDICT r4 weak #7 / next #4.)

Structural setup: the whole-descent kernel runs ONE scenario per grid
instance, loads its grid block to VMEM once, and fits its dynamic
z-window offset per iteration (traced, chip-measured free in r3).
Cross-lane z-band grouping could therefore only help if the compiled
program's throughput depended on cross-lane z structure at all —
e.g. through some cross-instance memory effect.

This script measures that directly: identical bench scenarios except
the waypoint altitudes are (a) IDENTICAL across all lanes (every
kernel instance fits the same z-band each iteration — the best case
any batch-level regrouping could construct) vs (b) RANDOMIZED per
lane across the full z extent (maximally divergent bands).  If the
rates tie, batch-level z-band grouping has no addressable cost on
this kernel architecture and the reshape is retired.

Run ON CHIP: PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/ab_zband_group.py [batch]
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures
    from grad_traj_optimization_tpu import solver as solve_mod
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.fields import sdf

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    cfg = OptimizerConfig()
    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        B, n_waypoints=7, seed=42, max_obstacle_points=4096
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

    dist = build_fields(
        jax.device_put(jnp.asarray(pts, jnp.float32)),
        jax.device_put(jnp.asarray(valid)),
    )
    _ = float(dist[0, 0, 0, 0])
    print(f"# fields built, B={B}", flush=True)

    rng = np.random.default_rng(9)
    wps_same = np.asarray(wps).copy()
    wps_same[..., 2] = 2.0  # identical constant altitude, all lanes
    wps_rand = np.asarray(wps).copy()
    # per-lane constant altitude scattered over the full z extent
    # (still per-lane-constant so the per-iteration window FIT rate is
    # identical; only the CROSS-LANE band positions diverge)
    wps_rand[..., 2] = rng.uniform(0.8, 4.2, size=(B, 1))

    def measure(name, w):
        scns = solve_mod.Scenario(
            dist=dist,
            origin=jnp.broadcast_to(origin, (B, 3)),
            resolution=jnp.full((B,), res, jnp.float32),
            waypoints=jnp.asarray(w, jnp.float32),
        )
        run = lambda: solve_mod.solve_batch(
            scns, cfg=cfg, steps=(2,), record_trace=False
        )
        s = run()
        _ = float(jnp.sum(s.cost))
        ts = []
        for _i in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run().cost))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({
            "arm": name, "solves_per_s": round(B / min(ts), 1),
            "wall_s": round(min(ts), 3),
        }), flush=True)

    measure("z_identical_lanes", wps_same)
    measure("z_randomized_lanes", wps_rand)
    # and the stock bench waypoints (mixed 1.5-3.0 m) for reference
    measure("z_bench_default", np.asarray(wps))
    print("# done", flush=True)


if __name__ == "__main__":
    main()

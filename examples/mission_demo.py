"""Full-mission demo: batched search -> seed -> raced refine.

Reproduces the reference's compare2 two-stage flow (compare2.cpp:
168-321: kinodynamic front-end search, then gradient refinement) as one
batched `plan_batch` call — the production planning ladder (adaptive
beam search with retries, exact Hermite reseeding, the seed-duration
race, and the exact host-A* fallback rung when the native engine is
built) — and exports the first mission as the time-swept animation
(display.h:57-158 analogue).

Run: python examples/mission_demo.py [out_dir] [batch]
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gtop_mission"
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    os.makedirs(out_dir, exist_ok=True)

    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import (
        OptimizerConfig, fixtures, native, plan_batch, viz,
    )
    from grad_traj_optimization_tpu import solver as solve_mod
    from grad_traj_optimization_tpu.fields import sdf

    print(f"device: {jax.devices()[0]}")

    # random box-obstacle missions (the bench scenario family): start at
    # the first corridor waypoint, goal at the last, zero end velocities
    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        batch, n_waypoints=7, seed=7, max_obstacle_points=2048
    )
    origin = jnp.asarray(map_cfg.origin, jnp.float32)
    res = map_cfg.resolution

    t0 = time.perf_counter()
    occ = jax.vmap(
        lambda p, v: sdf.rasterize(
            p, origin, res, map_cfg.grid_shape, valid_mask=v
        )
    )(jnp.asarray(pts, jnp.float32), jnp.asarray(valid))
    dists = sdf.edt_batch(occ, res)
    jax.block_until_ready(dists)
    print(f"{batch} distance fields {map_cfg.grid_shape}: "
          f"{time.perf_counter() - t0:.1f}s (incl. compile)")

    starts = np.concatenate(
        [wps[:, 0], np.zeros((batch, 3))], axis=1
    ).astype(np.float32)
    goals = np.concatenate(
        [wps[:, -1], np.zeros((batch, 3))], axis=1
    ).astype(np.float32)

    t0 = time.perf_counter()
    result = plan_batch(
        dists, np.broadcast_to(np.asarray(origin), (batch, 3)), res,
        starts, goals, cfg=OptimizerConfig(),
        host_fallback=native.available(),
    )
    wall = time.perf_counter() - t0
    costs = np.asarray(result.solution.cost)
    print(
        f"plan_batch: {wall:.1f}s (incl. compile) — "
        f"reached {int(result.reached.sum())}/{batch}, "
        f"ok {int(result.ok.sum())}/{batch}, "
        f"retried {result.n_retried}, "
        f"host-recovered {result.n_host_fallback}"
    )
    print("refined costs:", np.round(costs, 1))

    # animate the first successful mission (search knots as the marker
    # waypoints; obstacles from that lane's distance field)
    lane = int(np.argmax(result.ok)) if result.ok.any() else 0
    sol = jax.tree.map(lambda x: x[lane], result.solution)
    scn = solve_mod.Scenario(
        dist=dists[lane],
        origin=origin,
        resolution=jnp.asarray(res, jnp.float32),
        waypoints=jnp.asarray(result.search.pos[lane]),
    )
    gif = os.path.join(out_dir, "mission.gif")
    try:
        viz.animate_trajectory(sol, scn, path=gif, fps=10, speedup=2.0)
        print("animation:", gif)
    except Exception as e:  # matplotlib/pillow optional
        print("animation skipped:", e)


if __name__ == "__main__":
    main()

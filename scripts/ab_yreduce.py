"""Chip A/B: attacks on the lookup's y-reduction VPU floor.

The round-1 kernel attribution put ~3.7 of 6.84 us/scenario-iter in the
per-sample 2-hot lane reductions (the y contraction of X against wyn /
wyd) — the largest single cost in the whole solve.  Two structural
levers are measurable without changing the math (all variants are
bitwise-identical in interpret mode, see tests):

* ``win_zc``: the dynamic z-window's chunk granularity decoupled from
  the full-depth layout chunking — a (zwin=2, win_zc=4) window
  processes 8 z-cells instead of 10, shrinking X (and the x-dot) by
  20% when the samples' z-band fits, at the price of more full-depth
  fallbacks.
* ``yred="mxu"``: VPU does only the weight multiplies; the 128-lane
  sums ride the MXU as a stacked block-diagonal HIGHEST f32 dot
  (6 passes — expected to lose unless MXU/VPU overlap hides it; run to
  get the number either way).

One JSON line per arm.  Run on the real chip.
"""

import itertools
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

    arms = [
        # (label, zwin, win_zc, yred)
        ("baseline zwin2x5", 2, None, "vpu"),
        ("win 2x4=8", 2, 4, "vpu"),
        ("win 3x3=9", 3, 3, "vpu"),
        ("win 2x3=6", 2, 3, "vpu"),
        ("win 3x4=12", 3, 4, "vpu"),
        ("yred mxu zwin2x5", 2, None, "mxu"),
        ("yred mxu 2x4", 2, 4, "mxu"),
    ]
    outs = {}
    for label, zwin, win_zc, yred in arms:
        # descend_fused is itself jitted; an argless jit wrapper here
        # would bake kargs into HLO constants (tunnel HTTP 413).
        run = lambda: sk.descend_fused(
            *kargs, phases, cfg, zwin=zwin, win_zc=win_zc, yred=yred
        )
        try:
            o = run()
            _ = float(jnp.sum(o[1]))
        except Exception as e:
            print(json.dumps({"arm": label, "error": repr(e)[:200]}),
                  flush=True)
            continue
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _ = float(jnp.sum(run()[1]))
            times.append(time.perf_counter() - t0)
        t = min(times)
        outs[label] = o
        print(json.dumps({
            "arm": label, "t_s": round(t, 4),
            "solves_per_s": round(BATCH / t, 1),
        }), flush=True)

    base = outs.get("baseline zwin2x5")
    if base is not None:
        cost_f = np.asarray(base[1])
        for label, o in outs.items():
            if label == "baseline zwin2x5":
                continue
            rel = np.abs(np.asarray(o[1]) - cost_f) / np.maximum(
                np.abs(cost_f), 1e-6
            )
            print(json.dumps({
                "arm": label,
                "cost_rel_p50": float(np.median(rel)),
                "cost_rel_p99": float(np.quantile(rel, 0.99)),
            }), flush=True)


if __name__ == "__main__":
    main()

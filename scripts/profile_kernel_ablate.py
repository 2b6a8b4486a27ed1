"""Attribute the whole-descent kernel's per-iteration time by ablation.

Runs descend_fused at bench shapes (B=1024, 7 waypoints, 100x100x25
grid, 100 iters) with individual kernel pieces replaced by same-shape
cheap stand-ins (see ops/solve_pallas.descend_fused ``ablate``), and
reports wall-time deltas vs the full kernel: delta(piece) ~= what that
piece costs per solve.

Stand-ins keep the data dependence chain, so the compiler cannot
dead-code the rest of the iteration, but they are NOT free — read the
deltas as lower bounds on each piece's cost.

    python scripts/profile_kernel_ablate.py [B] [--interpret]

--interpret runs tiny shapes through the Pallas interpreter on CPU:
a smoke test that every ablation variant still compiles/executes
(run this BEFORE the TPU run — a failed remote TPU compile wedges the
tunnel for ~10 minutes).
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


ABLATIONS = [
    frozenset(),                 # full kernel (baseline)
    frozenset({"trace"}),
    frozenset({"graddots"}),
    frozenset({"exp"}),
    frozenset({"sqrt"}),
    frozenset({"yreduce"}),
    frozenset({"xdot"}),
    frozenset({"xdot", "yreduce"}),
    frozenset({"lookup"}),       # whole trilinear lookup gone
    frozenset({"qpdots"}),
    frozenset({"lookup", "qpdots", "graddots"}),  # descent skeleton
]


def main():
    import jax
    import jax.numpy as jnp

    interpret = "--interpret" in sys.argv
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    B = int(args[0]) if args else (4 if interpret else 1024)

    if interpret:
        jax.config.update("jax_platforms", "cpu")

    from grad_traj_optimization_tpu import fixtures, solver as solve_mod
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.fields import sdf
    from grad_traj_optimization_tpu.ops import solve_pallas as sk

    cfg = OptimizerConfig()
    n_wp = 3 if interpret else 7
    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        B, n_waypoints=n_wp, seed=42, max_obstacle_points=4096
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
    scns = solve_mod.Scenario(
        dist=dist,
        origin=jnp.broadcast_to(origin, (B, 3)),
        resolution=jnp.full((B,), res, jnp.float32),
        waypoints=jnp.asarray(wps, jnp.float32),
    )
    kargs, _ = solve_mod.kernel_inputs(scns, cfg)
    phases = ((2, 2 if interpret else cfg.iters_step2),)
    iters = phases[0][1]

    results = {}
    t_full = None
    for ab in ABLATIONS:
        name = "+".join(sorted(ab)) or "full"
        try:
            run = lambda: sk.descend_fused(
                *kargs, phases, cfg, interpret=interpret, ablate=ab
            )
            out = run()
            _ = float(jnp.sum(out[1]))  # host-read sync barrier
            if interpret:
                ok = bool(np.all(np.isfinite(np.asarray(out[0]))))
                print(f"{name}: ran, finite={ok}", flush=True)
                continue
            times = []
            for _i in range(3):
                t0 = time.perf_counter()
                _ = float(jnp.sum(run()[1]))
                times.append(time.perf_counter() - t0)
            t = min(times)
            results[name] = t
            if not ab:
                t_full = t
            delta_ms = (t_full - t) * 1e3 if t_full else 0.0
            per_iter_us = (
                (t_full - t) / iters / B * 1e6 if t_full else 0.0
            )
            print(
                json.dumps(
                    {
                        "ablate": name,
                        "wall_s": round(t, 4),
                        "saved_ms": round(delta_ms, 2),
                        "saved_us_per_scen_iter": round(per_iter_us, 3),
                        "solves_per_s": round(B / t, 1),
                    }
                ),
                flush=True,
            )
        except Exception as e:  # keep going; report the failure
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)

    if t_full and results:
        print(
            json.dumps(
                {
                    "summary_us_per_scen_iter": {
                        k: round((t_full - v) / iters / B * 1e6, 3)
                        for k, v in results.items()
                        if k != "full"
                    },
                    "full_us_per_scen_iter": round(
                        t_full / iters / B * 1e6, 3
                    ),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()

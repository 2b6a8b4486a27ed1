"""On-chip time breakdown of the fused batched solve + EDT compile audit.

Part 1 — solve_batch_fused at B=1024: wall time at two iteration budgets
separates per-iteration cost from fixed overhead; raw fused-kernel calls
(amortized) give the lookup share of each iteration.

Part 2 — 512^3 EDT: times .lower() and .compile() per stage (binary
z-pass, min-plus y, min-plus x) to find where the ~222 s compile goes.

One process, incremental JSON output, generous timeout (see CLAUDE.md
tunnel rules).
"""

import json
import time
import traceback

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def part1():
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures
    from grad_traj_optimization_tpu import solver as solve_mod
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.fields import sdf
    from grad_traj_optimization_tpu.ops import trilinear_pallas as tp

    BATCH = 1024
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

    def sync(s):
        return float(jnp.sum(s.cost))

    for iters in (100, 50):
        # pin the per-iteration fused path: "auto" now dispatches to the
        # whole-descent kernel, which this decomposition is not about
        cfg = OptimizerConfig(iters_step2=iters, lookup_mode="fused")
        run = lambda: solve_mod.solve_batch(
            scns, cfg=cfg, steps=(2,), record_trace=False
        )
        sync(run())
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run())
            times.append(time.perf_counter() - t0)
        print(
            json.dumps(
                {"probe": f"solve_iters_{iters}", "wall_s": round(min(times), 4)}
            ),
            flush=True,
        )

    # raw fused kernel: amortized over K queued calls, one sync
    gp = tp.prep_grids(dist)
    S = 6 * 30
    pos = jnp.asarray(
        np.random.default_rng(0).uniform(-8, 8, (BATCH, S, 3)), jnp.float32
    )
    d, _ = tp.trilinear_fused_prepped(
        gp, grid, scns.origin, scns.resolution, pos
    )
    _ = float(jnp.sum(d))
    K = 40
    t0 = time.perf_counter()
    last = None
    for _ in range(K):
        last, _ = tp.trilinear_fused_prepped(
            gp, grid, scns.origin, scns.resolution, pos
        )
    _ = float(jnp.sum(last))
    per_call_ms = (time.perf_counter() - t0) / K * 1e3
    print(
        json.dumps(
            {"probe": "fused_kernel_amortized_ms", "ms": round(per_call_ms, 3)}
        ),
        flush=True,
    )


def part2():
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu.fields import sdf
    from grad_traj_optimization_tpu.ops import edt_pallas

    n = 512
    occ_np = (np.random.default_rng(0).random((n, n, n)) < 0.001).astype(
        np.float32
    )
    occ = jax.device_put(jnp.asarray(occ_np))

    def timed_compile(name, fn, arg_shape, arg=None):
        try:
            lowered = jax.jit(fn).lower(
                jax.ShapeDtypeStruct(arg_shape, jnp.float32)
            )
            t0 = time.perf_counter()
            compiled = lowered.compile()
            t_c = time.perf_counter() - t0
            rec = {"probe": f"compile_{name}", "compile_s": round(t_c, 2)}
            if arg is not None:
                t0 = time.perf_counter()
                out = compiled(arg)
                out.block_until_ready()
                _ = float(out.reshape(-1)[0])
                rec["warm1_s"] = round(time.perf_counter() - t0, 3)
            print(json.dumps(rec), flush=True)
            return compiled
        except Exception:
            print(
                json.dumps({"probe": name, "error": traceback.format_exc()}),
                flush=True,
            )
            return None

    timed_compile(
        "nearest_sq_z", lambda o: sdf._nearest_sq_1d(o, axis=2),
        (n, n, n), occ,
    )
    timed_compile(
        "minplus_y", lambda f: edt_pallas.minplus_axis(f, axis=1),
        (n, n, n), occ,
    )
    timed_compile(
        "minplus_lines_flat",
        lambda f: edt_pallas.minplus_lines(f),
        (n * n, n), None,
    )
    timed_compile(
        "edt_full", lambda o: sdf.edt(o, 0.2), (n, n, n), occ,
    )


if __name__ == "__main__":
    print(json.dumps({"start": True}), flush=True)
    try:
        part1()
    except Exception:
        print(json.dumps({"part1_error": traceback.format_exc()}), flush=True)
    part2()
    print(json.dumps({"done": True}), flush=True)

"""On-chip A/B of distance-lookup strategies for the batched solver.

Times full ``solve_batch`` (mxu lookup) vs ``solve_batch_fused`` (fused
Pallas lookup), each at HIGHEST and HIGH matmul precision, at B=1024 on
the real chip — one process, one host-read sync per measurement
(block_until_ready under-synchronizes on the tunnel; see CLAUDE.md).

Prints one JSON line per variant as soon as it is measured, so a late
remote-compile failure cannot lose earlier results.  Run backgrounded
with a generous timeout.
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


def sample_positions(coeff, T, n=40):
    """Host-side dense position samples from (B, m, 3, 6) ascending-power
    coefficients — the parity yardstick between lookup variants."""
    coeff = np.asarray(coeff, np.float64)
    T = np.asarray(T, np.float64)
    B, m, _, _ = coeff.shape
    ts = T[:, :, None] * (np.arange(1, n + 1) / n)[None, None, :]  # (B,m,n)
    pw = ts[..., None] ** np.arange(6)  # (B, m, n, 6)
    return np.einsum("bmnj,bmxj->bmnx", pw, coeff)


def main():
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures
    from grad_traj_optimization_tpu import solver as solve_mod
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.fields import sdf

    print(json.dumps({"devices": str(jax.devices())}), flush=True)

    BATCH = 1024
    N_WP = 7
    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        BATCH, n_waypoints=N_WP, seed=42, max_obstacle_points=4096
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
    print(json.dumps({"fields_built": True}), flush=True)

    scns = solve_mod.Scenario(
        dist=dist,
        origin=jnp.broadcast_to(origin, (BATCH, 3)),
        resolution=jnp.full((BATCH,), res, jnp.float32),
        waypoints=jnp.asarray(wps, jnp.float32),
    )

    def sync(s):
        return float(jnp.sum(s.cost))

    ref_pos = {}

    def measure(name, fn, reps=3):
        try:
            sols = fn()
            sync(sols)  # compile + warm
            times = []
            for _ in range(reps):
                t0 = time.perf_counter()
                sync(fn())
                times.append(time.perf_counter() - t0)
            t = min(times)
            rec = {
                "variant": name,
                "batch_wall_s": round(t, 4),
                "solves_per_s": round(BATCH / t, 1),
                "mean_cost": round(float(jnp.mean(sols.cost)), 6),
                "n_status_ok": int(jnp.sum(sols.status == 0)),
                "times": [round(x, 4) for x in times],
            }
            pos = sample_positions(sols.coeff, sols.T)
            if not ref_pos:
                ref_pos["pos"] = pos
            else:
                dev = np.linalg.norm(pos - ref_pos["pos"], axis=-1)
                rec["max_pos_dev_m"] = float(dev.max())
                rec["p99_pos_dev_m"] = float(np.quantile(dev, 0.99))
            print(json.dumps(rec), flush=True)
            return sols
        except Exception:
            print(
                json.dumps({"variant": name, "error": traceback.format_exc()}),
                flush=True,
            )
            return None

    def run(mode, prec):
        cfg = OptimizerConfig(lookup_mode=mode, lookup_precision=prec)
        if mode == "fused":
            return lambda: solve_mod.solve_batch_fused(
                scns, cfg=cfg, steps=(2,), record_trace=False
            )
        return lambda: solve_mod.solve_batch(
            scns, cfg=cfg, steps=(2,), record_trace=False
        )

    def run_kernel():
        cfg = OptimizerConfig()
        return lambda: solve_mod.solve_batch_kernel(
            scns, cfg=cfg, steps=(2,)
        )

    # order: most important first.  NOTE: there is no "fused_high"
    # variant — the fused kernels gate on lookup_precision="highest"
    # (their bf16-plane accuracy is independent of dot precision) and
    # "fused" + "high" degrades to the mxu path by design.
    measure("mxu_highest", run("mxu", "highest"))
    measure("fused_highest", run("fused", "highest"))
    measure("whole_descent_kernel", run_kernel())
    measure("mxu_high", run("mxu", "high"))
    print(json.dumps({"done": True}), flush=True)


if __name__ == "__main__":
    main()

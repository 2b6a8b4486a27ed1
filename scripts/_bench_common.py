"""Shared scaffolding for the chip A/B scripts.

Keeps the measurement protocol in ONE place: the bench scenario batch
(random_scenarios seed 42, device-resident EDT build), start/goal
assembly, and the sync-barrier timing rule (a float() host read — the
tunnel under-synchronizes block_until_ready, CLAUDE.md rule 2).
"""

from __future__ import annotations

import json
import time

import numpy as np


def build_bench_batch(B: int, seed: int = 42, n_waypoints: int = 7):
    """Bench-shaped batch: (dist, origins_b, res, starts, goals)."""
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures
    from grad_traj_optimization_tpu.fields import sdf

    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        B, n_waypoints=n_waypoints, seed=seed,
        max_obstacle_points=4096,
    )
    grid = map_cfg.grid_shape
    origin = jnp.asarray(map_cfg.origin, jnp.float32)
    res = map_cfg.resolution

    @jax.jit
    def build_fields(pts, valid):
        occ = jax.vmap(
            lambda p, v: sdf.rasterize(p, origin, res, grid,
                                       valid_mask=v)
        )(pts.astype(jnp.float32), valid)
        return sdf.edt_batch(occ, res)

    dist = build_fields(
        jax.device_put(jnp.asarray(pts, jnp.float32)),
        jax.device_put(jnp.asarray(valid)),
    )
    _ = float(dist[0, 0, 0, 0])
    starts = np.concatenate(
        [np.asarray(wps)[:, 0], np.zeros((B, 3))], axis=1
    ).astype(np.float32)
    goals = np.concatenate(
        [np.asarray(wps)[:, -1], np.zeros((B, 3))], axis=1
    ).astype(np.float32)
    origins_b = np.broadcast_to(np.asarray(origin), (B, 3))
    return dist, origins_b, res, starts, goals, wps


def timed_arm(name: str, run, sync, B: int, reps: int = 3, **extra):
    """Measure `run` (reps, min) with `sync(result)` as the barrier;
    prints and returns one JSON record."""
    try:
        r = run()
        first = sync(r)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(run())
            ts.append(time.perf_counter() - t0)
        out = {
            "arm": name, "per_s": round(B / min(ts), 1),
            "wall_s": round(min(ts), 3), **extra,
        }
        if first is not None:
            out["sync0"] = first
    except Exception as e:  # noqa: BLE001 — record the arm's failure
        out = {"arm": name, "error": repr(e)[:200], **extra}
    print(json.dumps(out), flush=True)
    return out

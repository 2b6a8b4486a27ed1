"""Chip A/B: exact cell-boundary cropping on the opti_node demo map.

VERDICT r2 item 2: the reference's own 200x200x25 map (opti_node.cpp:61)
ran at 496 solves/s uncropped — 2.8x below the 100x100x25 bench shape —
because the kernel pads x/y to 128-lane multiples (256x256 effective).
The round-2 origin-shift crop recovered 920/s but drifted quality (f32
origin perturbation -> basin flips, p99 cost ratio 1.5).

Round 3 makes the crop EXACT (solver.crop_scenarios: global-frame
coordinate arithmetic + integer cell offset into the kernel's one-hot
lane selection).  This script measures, on the real chip:

* full-grid vs exact-crop throughput on the opti_node shared-map suite
  (256 jittered waypoint sets, the bench.py workload),
* BITWISE parity of the optimized free derivatives between the two.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_crop_exact.py
Prints one JSON line per arm + a parity line.
"""

from __future__ import annotations

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

    from grad_traj_optimization_tpu import fixtures as fx
    from grad_traj_optimization_tpu import solver as solve_mod
    from grad_traj_optimization_tpu.config import OptimizerConfig

    cfg = OptimizerConfig()
    o_cfg, o_obss, o_wp = fx.opti_node_scenario()
    o_scn = solve_mod.make_scenario(o_wp, o_obss, o_cfg)
    BO = 256
    rng = np.random.default_rng(3)
    o_wps = np.stack([
        o_wp + np.concatenate(
            [rng.uniform(-0.3, 0.3, (len(o_wp), 2)),
             np.zeros((len(o_wp), 1))], 1,
        )
        for _ in range(BO)
    ])
    batch = solve_mod.Scenario(
        dist=o_scn.dist[None],
        origin=jnp.broadcast_to(o_scn.origin, (BO, 3)),
        resolution=jnp.broadcast_to(o_scn.resolution, (BO,)),
        waypoints=jnp.asarray(o_wps, jnp.float32),
    )
    cropped = solve_mod.crop_scenarios(batch, cfg)
    print(
        json.dumps({
            "full_grid": list(batch.dist.shape[1:]),
            "crop_grid": list(cropped.dist.shape[1:]),
            "offset": np.asarray(cropped.grid_offset)[0].tolist(),
        }),
        flush=True,
    )

    def sync(s):
        return float(jnp.sum(s.cost))

    results = {}
    sols = {}
    # the full arm must disable round-4 auto-crop or it silently
    # measures the cropped program too
    import dataclasses as _dc

    cfg_full = _dc.replace(cfg, auto_crop=False)
    for name, scns in (("full", batch), ("crop", cropped)):
        cfg_arm = cfg_full if name == "full" else cfg
        run = lambda: solve_mod.solve_batch(
            scns, cfg=cfg_arm, steps=(2,), record_trace=False
        )
        s = run()
        sync(s)  # compile + warm
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(run())
            times.append(time.perf_counter() - t0)
        t = min(times)
        sols[name] = s
        results[name] = {
            "solves_per_s": round(BO / t, 1),
            "n_ok": int(jnp.sum(s.status == 0)),
        }
        print(json.dumps({"arm": name, **results[name]}), flush=True)

    dp_f = np.asarray(sols["full"].dp)
    dp_c = np.asarray(sols["crop"].dp)
    c_f = np.asarray(sols["full"].cost)
    c_c = np.asarray(sols["crop"].cost)
    bitwise = np.all(dp_f == dp_c, axis=(1, 2))
    ratio = c_c / c_f
    print(
        json.dumps({
            "parity": {
                "bitwise_dp_lanes": int(bitwise.sum()),
                "lanes": int(len(bitwise)),
                "max_abs_dp_diff": float(np.abs(dp_f - dp_c).max()),
                "cost_ratio_geomean": float(
                    np.exp(np.mean(np.log(ratio)))
                ),
                "cost_ratio_p99": float(np.percentile(ratio, 99)),
            },
            "speedup": round(
                results["crop"]["solves_per_s"]
                / results["full"]["solves_per_s"], 3
            ),
        }),
        flush=True,
    )


if __name__ == "__main__":
    main()

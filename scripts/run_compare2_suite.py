"""Run a compare2-style benchmark suite end to end.

The reference's compare2 node (src/compare2.cpp:85-342) consumes maps
and start/goal pairs from an external benchmark package and logs
``solve_time, traj_time, acc_cost`` + jerk + cost curves to front2.txt /
back2.txt.  This driver reproduces that flow self-contained: random
pillar+wall maps, the wavefront front-end + RDP waypoints, the penalty
back-end, JSONL records, a summary table, and the exact-format
front2/back2 logs for drop-in comparison against C++ runs.

Run: python scripts/run_compare2_suite.py [n_cases] [out_dir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    n_cases = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gtop_compare2"
    os.makedirs(out_dir, exist_ok=True)

    import jax.numpy as jnp

    from grad_traj_optimization_tpu import harness
    from grad_traj_optimization_tpu.config import COMPARE2_CONFIG, MapConfig
    from grad_traj_optimization_tpu.fields import sdf

    map_cfg = MapConfig(
        origin=(-8.0, -8.0, 0.0), resolution=0.25,
        map_size=(16.0, 16.0, 5.0),
    )
    rng = np.random.default_rng(11)
    cases = []
    while len(cases) < n_cases:
        pts = []
        for _ in range(rng.integers(5, 10)):
            cx, cy = rng.uniform(-5, 5, size=2)
            sx, sy = rng.uniform(0.4, 1.4, size=2)
            for x in np.arange(cx - sx / 2, cx + sx / 2 + 1e-9, 0.25):
                for y in np.arange(cy - sy / 2, cy + sy / 2 + 1e-9, 0.25):
                    for z in np.arange(0.05, 5.0, 0.25):
                        pts.append((x, y, z))
        occ = sdf.rasterize(
            jnp.asarray(np.asarray(pts), jnp.float32),
            jnp.asarray(map_cfg.origin, jnp.float32),
            map_cfg.resolution, map_cfg.grid_shape,
        )
        dist = sdf.edt(occ, map_cfg.resolution)
        dn = np.asarray(dist)

        def free(ylo, yhi):
            for _ in range(50):
                p = np.array([
                    rng.uniform(-6, 6), rng.uniform(ylo, yhi),
                    rng.uniform(1.0, 3.5),
                ])
                i = np.floor(
                    (p - np.asarray(map_cfg.origin)) / map_cfg.resolution
                ).astype(int)
                if dn[i[0], i[1], i[2]] > 0.6:
                    return p
            return None

        s, g = free(-6.5, -3.0), free(3.0, 6.5)
        if s is None or g is None:
            continue
        cases.append((dist, map_cfg.origin, map_cfg.resolution, s, g))

    records = harness.run_suite(
        cases,
        out_path=os.path.join(out_dir, "cases.jsonl"),
        cfg=COMPARE2_CONFIG,
        n_waypoints=6,          # one compiled solve for the whole suite
        warm_compile=True,      # wall-calibrated cost-curve time axes
    )
    summary = harness.summarize(records)
    harness.write_compare2_logs(
        records,
        os.path.join(out_dir, "front2.txt"),
        os.path.join(out_dir, "back2.txt"),
    )
    print(json.dumps(summary, indent=2))
    print(f"wrote {out_dir}/cases.jsonl, front2.txt, back2.txt")


if __name__ == "__main__":
    main()

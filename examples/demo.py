"""End-to-end demo: the reference opti_node scenario on this framework.

Reproduces the workflow of the reference demo (src/opti_node.cpp:47-147):
build the two-wall map, EDT-transform it, seed 11 waypoints, refine with
the penalty optimizer, print the evaluation metrics, and export the scene
(npz + optional PNG) in place of the rviz markers.

Run: python examples/demo.py [out_dir]
"""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main():
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gtop_demo"
    os.makedirs(out_dir, exist_ok=True)

    import jax

    from grad_traj_optimization_tpu import (
        OptimizerConfig, fixtures, make_scenario, solve, viz,
    )
    from grad_traj_optimization_tpu import solver as solve_mod

    print(f"device: {jax.devices()[0]}")
    map_cfg, obstacles, waypoints = fixtures.opti_node_scenario()

    t0 = time.perf_counter()
    scn = make_scenario(waypoints, obstacles, map_cfg)
    jax.block_until_ready(scn.dist)
    print(f"distance field ({map_cfg.grid_shape}): "
          f"{time.perf_counter() - t0:.1f}s (incl. compile)")

    cfg = OptimizerConfig()
    t0 = time.perf_counter()
    sol = solve(scn, cfg=cfg, steps=(2,))
    cost = float(sol.cost)
    print(f"solve: {time.perf_counter() - t0:.1f}s (incl. compile), "
          f"final cost {cost:.1f}, accepted iters {int(sol.n_accept)}")

    metrics = {
        k: round(float(v), 3)
        for k, v in solve_mod.evaluate_solution(sol).items()
    }
    print("metrics:", metrics)

    npz = viz.export_npz(os.path.join(out_dir, "scene.npz"), sol, scn)
    print("scene exported:", npz)
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ax = viz.plot_topdown(sol, scn)
        ax.figure.savefig(os.path.join(out_dir, "topdown.png"), dpi=130)
        ax2 = viz.plot_cost_curve(sol)
        ax2.figure.savefig(os.path.join(out_dir, "cost_curve.png"), dpi=130)
        print("plots:", os.path.join(out_dir, "topdown.png"))
    except Exception as e:  # matplotlib optional
        print("plots skipped:", e)


if __name__ == "__main__":
    main()

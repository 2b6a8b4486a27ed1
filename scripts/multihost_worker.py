"""One process of a multi-process (multi-host-shaped) solve.

Usage: python scripts/multihost_worker.py <process_id> <num_processes>
       <coordinator_port> [batch_per_process]

Each process brings up jax.distributed against a localhost coordinator,
exposes 4 virtual CPU devices, contributes its local slice of a global
scenario batch (mesh.global_scenarios), and runs the data-parallel
sharded solve.  Global psum-style reductions (mesh.convergence_stats)
must agree across processes; process 0 prints them as one JSON line.

This is the jax.distributed bring-up path of parallel/mesh.py exercised
for real — the reference has no distributed story at all (SURVEY.md §2:
its only IPC is ROS pub/sub).
"""

import json
import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=4"
)


def main():
    pid = int(sys.argv[1])
    nproc = int(sys.argv[2])
    port = int(sys.argv[3])
    b_local = int(sys.argv[4]) if len(sys.argv) > 4 else 4

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import numpy as np
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import fixtures
    from grad_traj_optimization_tpu import solver as solve_mod
    from grad_traj_optimization_tpu.config import OptimizerConfig
    from grad_traj_optimization_tpu.fields import sdf
    from grad_traj_optimization_tpu.parallel import mesh as pmesh

    assert len(jax.devices()) == 4 * nproc, jax.devices()
    assert len(jax.local_devices()) == 4

    # deterministic global problem; each process keeps its own rows
    B = b_local * nproc
    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        B, n_waypoints=5, seed=11, max_obstacle_points=1024
    )
    sl = slice(pid * b_local, (pid + 1) * b_local)
    origin = jnp.asarray(map_cfg.origin, jnp.float32)
    res = map_cfg.resolution
    occ = jax.vmap(
        lambda p, v: sdf.rasterize(
            p, origin, res, map_cfg.grid_shape, valid_mask=v
        )
    )(jnp.asarray(pts[sl], jnp.float32), jnp.asarray(valid[sl]))
    dist_local = np.asarray(sdf.edt_batch(occ, res))

    local = solve_mod.Scenario(
        dist=dist_local,
        origin=np.broadcast_to(np.asarray(map_cfg.origin, np.float32),
                               (b_local, 3)),
        resolution=np.full((b_local,), res, np.float32),
        waypoints=np.asarray(wps[sl], np.float32),
    )

    m = pmesh.make_mesh(n_space=1)
    scns = pmesh.global_scenarios(local, m)
    cfg = OptimizerConfig(iters_step1=5, iters_step2=15)
    sols = pmesh.sharded_solve(scns, m, cfg=cfg)
    stats = pmesh.convergence_stats(sols)
    out = {
        "process": pid,
        "n_devices": len(jax.devices()),
        "n_ok": float(stats["n_ok"]),
        "mean_cost": float(stats["mean_cost"]),
        "mean_accept": float(stats["mean_accept"]),
    }
    # every process computes the global stats; process 0 reports
    if pid == 0:
        print("RESULT " + json.dumps(out), flush=True)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

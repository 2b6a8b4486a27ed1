from grad_traj_optimization_tpu.parallel import mesh, edt_sharded  # noqa: F401

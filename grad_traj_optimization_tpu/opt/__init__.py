from grad_traj_optimization_tpu.opt import descent, penalty  # noqa: F401

from grad_traj_optimization_tpu.reference_impl import golden  # noqa: F401

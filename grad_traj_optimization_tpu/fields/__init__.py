from grad_traj_optimization_tpu.fields import sdf  # noqa: F401

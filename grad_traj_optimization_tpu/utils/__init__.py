from grad_traj_optimization_tpu.utils import profiling  # noqa: F401

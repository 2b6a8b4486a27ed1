from grad_traj_optimization_tpu.core import poly, qp  # noqa: F401

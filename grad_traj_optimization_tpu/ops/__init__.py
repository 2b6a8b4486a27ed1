from grad_traj_optimization_tpu.ops import edt_pallas  # noqa: F401

from grad_traj_optimization_tpu.search import (  # noqa: F401
    grid_search,
    kinodynamic,
    predictor,
    rdp,
    rrt,
)

"""512^3 sharded-EDT stress on the 8-device virtual CPU mesh.

BASELINE.md's stress row demands the 512^3 grid (537 MB f32) through the
SHARDED transform (parallel/edt_sharded.py: x-axis sharded over the
mesh's "space" axis, ring-ppermute min-plus x-pass).  This script runs
it end-to-end on the 8-virtual-device CPU mesh and cross-checks a
random subsample of cells against the native C++ Felzenszwalb engine
(exact oracle; a full single-device JAX rerun would double the ~7 min
O(n^2)-per-line CPU cost for no extra coverage).

Run: python scripts/stress_edt_sharded.py [n=512]
Prints one JSON line; the number lands in SCALING.md's stress row.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    n_dev = 8
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_dev}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from grad_traj_optimization_tpu import native
    from grad_traj_optimization_tpu.parallel import edt_sharded
    from grad_traj_optimization_tpu.parallel import mesh as pmesh

    m = pmesh.make_mesh(n_data=1, n_space=n_dev, devices=jax.devices())
    rng = np.random.default_rng(0)
    occ = (rng.random((n, n, n)) < 5e-4).astype(np.float32)
    res = 0.2

    t0 = time.perf_counter()
    d = edt_sharded.edt_sharded(jnp.asarray(occ), res, m)
    d.block_until_ready()
    t_total = time.perf_counter() - t0

    # oracle: native C++ exact Felzenszwalb (multithreaded)
    t0 = time.perf_counter()
    d_ref = native.edt(occ, res)
    t_native = time.perf_counter() - t0

    # subsample cross-check (full copy-off of the sharded array is fine,
    # but elementwise compare of 134M cells in NumPy is the slow part)
    idx = rng.integers(0, n, size=(200000, 3))
    dv = np.asarray(d[idx[:, 0], idx[:, 1], idx[:, 2]])
    rv = d_ref[idx[:, 0], idx[:, 1], idx[:, 2]]
    max_err = float(np.max(np.abs(dv - rv)))

    print(
        json.dumps({
            "grid": [n, n, n],
            "n_devices": n_dev,
            "sharded_edt_s": round(t_total, 1),
            "native_edt_s": round(t_native, 2),
            "subsample_max_abs_err_m": max_err,
            "n_checked": int(len(idx)),
        }),
        flush=True,
    )
    assert max_err < 1e-3, max_err


if __name__ == "__main__":
    main()

"""Chip A/B: windowed incremental ESDF update vs full recompute.

Measures sdf.edt_update (the region-limited analogue of the reference's
setUpdateRange windowed sweep, sdf_map.cpp:244-262, :311-364) against a
full EDT rebuild at the two scales that matter: the reference's own
200x200x25 demo map and the 512^3 stress grid.  The incremental "add"
mode is EXACT (bitwise vs the full recompute, tests/test_sdf.py); this
script verifies equality on chip and reports the speedup for a
24^3-cell obstacle-appearance edit.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/ab_edt_update.py
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def bench_one(name, shape, res, box, margin_cells):
    import jax
    import jax.numpy as jnp

    from grad_traj_optimization_tpu.fields import sdf

    rng = np.random.default_rng(0)
    occ0 = (rng.random(shape) < 3e-4).astype(np.float32)
    occ0_d = jax.device_put(jnp.asarray(occ0))

    edt_fn = jax.jit(lambda o: sdf.edt(o, res))
    d0 = edt_fn(occ0_d)
    _ = float(d0[0, 0, 0])
    reps = []
    for _i in range(3):
        t0 = time.perf_counter()
        _ = float(edt_fn(occ0_d)[0, 0, 0])
        reps.append(time.perf_counter() - t0)
    t_full = min(reps)

    # the edit: a handful of occupied cells appearing inside the box
    lo = tuple((s - b) // 2 for s, b in zip(shape, box))
    hi = tuple(l + b for l, b in zip(lo, box))
    occ1 = occ0.copy()
    for p in rng.integers(lo, hi, size=(8, 3)):
        occ1[tuple(p)] = 1.0
    occ1_d = jax.device_put(jnp.asarray(occ1))

    d_full = edt_fn(occ1_d)
    _ = float(d_full[0, 0, 0])

    upd = jax.jit(
        lambda d, o: sdf.edt_update(
            d, o, res, lo, hi, mode="add", out_margin=margin_cells
        )
    )
    d_inc = upd(d0, occ1_d)
    _ = float(d_inc[0, 0, 0])
    reps = []
    for _i in range(5):
        t0 = time.perf_counter()
        _ = float(upd(d0, occ1_d)[0, 0, 0])
        reps.append(time.perf_counter() - t0)
    t_inc = min(reps)

    exact = bool(jnp.all(d_inc == d_full)) if margin_cells is None else (
        # margined window: exact wherever the margin covers influence
        bool(jnp.max(jnp.abs(d_inc - d_full)) == 0.0)
    )
    row = {
        "map": name,
        "full_edt_s": round(t_full, 4),
        "edt_update_s": round(t_inc, 4),
        "speedup": round(t_full / t_inc, 1),
        "box": list(box),
        "out_margin_cells": margin_cells,
        "bitwise_exact": exact,
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    import jax

    print(json.dumps({"device": str(jax.devices()[0])}), flush=True)
    # the reference demo shape: whole-grid influence (unconditionally
    # exact) and a 64-cell margined window
    bench_one("opti_node_200x200x25", (200, 200, 25), 0.2, (24, 24, 12),
              None)
    bench_one("opti_node_200x200x25", (200, 200, 25), 0.2, (24, 24, 12),
              64)
    # 512^3: margined window (whole-grid influence at 512^3 pays a
    # 512-wide min-plus per line — the window is the point)
    bench_one("stress_512", (512, 512, 512), 0.1, (24, 24, 24), 64)
    bench_one("stress_512", (512, 512, 512), 0.1, (24, 24, 24), 128)


if __name__ == "__main__":
    main()

"""Space-time distance oracle: static EDT + moving-obstacle boxes.

Rebuild of the reference ``EDTEnvironment`` (edt_environment.{h,cpp}),
the bridge that makes the kinodynamic front-end dynamic-obstacle aware:
the distance at (pos, t) is the minimum of the static field and the
distance to every predicted axis-aligned box at time t.

Semantics replicated:

* box distance = || clamp-to-face residual || (edt_environment.cpp:26-60:
  per-axis 0 inside the slab else distance to the nearer face);
* the trilinear variant evaluates min(static, boxes) at the 8 corner
  *cell centers* and interpolates that blended field
  (edt_environment.cpp:75-122) — replicated by blending per-corner;
* ``time < 0`` disables the dynamic part (evaluateCoarseEDT,
  edt_environment.cpp:124-136).

Everything is batched over query points AND obstacles (vmap over the box
axis replaces the reference's per-box loop).
"""

from __future__ import annotations

import jax.numpy as jnp

from grad_traj_optimization_tpu.fields import sdf
from grad_traj_optimization_tpu.search.predictor import (
    ObjPrediction,
    predict_position,
)


def dist_to_boxes(pos, time, pred: ObjPrediction):
    """Distance from query points to each predicted box at ``time``.

    Args:
      pos: (..., 3); time: scalar or broadcastable to pos[..., 0].
    Returns:
      (..., n_obj).
    """
    centers = predict_position(pred, time)  # (..., n_obj, 3)
    half = 0.5 * pred.scale  # (n_obj, 3)
    res = jnp.abs(pos[..., None, :] - centers) - half
    res = jnp.maximum(res, 0.0)
    return jnp.linalg.norm(res, axis=-1)


def min_dist_to_boxes(pos, time, pred: ObjPrediction):
    """min over boxes (edt_environment.cpp:62-73; 1e7 when no boxes)."""
    if pred.poly.shape[0] == 0:
        return jnp.full(pos.shape[:-1], 1e7, pos.dtype)
    return jnp.min(dist_to_boxes(pos, time, pred), axis=-1)


def evaluate_coarse(dist_grid, origin, resolution, pos, time,
                    pred: ObjPrediction | None = None):
    """Nearest-cell space-time distance (evaluateCoarseEDT).

    ``time < 0`` (or pred None) -> static only.
    """
    d1 = sdf.distance_at(dist_grid, origin, resolution, pos)
    if pred is None:
        return d1
    t = jnp.asarray(time)
    d2 = min_dist_to_boxes(pos, t, pred)
    return jnp.where(t < 0.0, d1, jnp.minimum(d1, d2))


def evaluate_with_grad(dist_grid, origin, resolution, pos, time,
                       pred: ObjPrediction | None = None):
    """Trilinear space-time distance + gradient (evaluateEDTWithGrad).

    The blended field min(static, boxes) is evaluated at the 8 surrounding
    cell centers and trilinearly interpolated, exactly as the reference —
    so the gradient accounts for moving obstacles through the interpolated
    corner values.
    """
    pos = jnp.asarray(pos)
    origin = jnp.asarray(origin, dtype=pos.dtype)
    res = jnp.asarray(resolution, dtype=pos.dtype)

    pos_m = pos - 0.5 * res
    idx = sdf.pos_to_index(pos_m, origin, res)
    idx_pos = (idx.astype(pos.dtype) + 0.5) * res + origin
    diff = (pos - idx_pos) / res

    vals = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                corner_idx = idx + jnp.asarray([dx, dy, dz], idx.dtype)
                corner_pos = (
                    corner_idx.astype(pos.dtype) + 0.5
                ) * res + origin
                d1 = sdf._gather_clamped(
                    dist_grid,
                    corner_idx[..., 0],
                    corner_idx[..., 1],
                    corner_idx[..., 2],
                )
                if pred is not None:
                    t = jnp.asarray(time)
                    d2 = min_dist_to_boxes(corner_pos, t, pred)
                    d1 = jnp.where(t < 0.0, d1, jnp.minimum(d1, d2))
                vals.append(d1)
    v = [[[vals[4 * x + 2 * y + z] for z in (0, 1)] for y in (0, 1)]
         for x in (0, 1)]
    dx_, dy_, dz_ = diff[..., 0], diff[..., 1], diff[..., 2]

    v00 = (1 - dx_) * v[0][0][0] + dx_ * v[1][0][0]
    v01 = (1 - dx_) * v[0][0][1] + dx_ * v[1][0][1]
    v10 = (1 - dx_) * v[0][1][0] + dx_ * v[1][1][0]
    v11 = (1 - dx_) * v[0][1][1] + dx_ * v[1][1][1]
    v0 = (1 - dy_) * v00 + dy_ * v10
    v1 = (1 - dy_) * v01 + dy_ * v11
    d = (1 - dz_) * v0 + dz_ * v1

    gz = (v1 - v0) / res
    gy = ((1 - dz_) * (v10 - v00) + dz_ * (v11 - v01)) / res
    gx = (
        (1 - dz_) * (1 - dy_) * (v[1][0][0] - v[0][0][0])
        + (1 - dz_) * dy_ * (v[1][1][0] - v[0][1][0])
        + dz_ * (1 - dy_) * (v[1][0][1] - v[0][0][1])
        + dz_ * dy_ * (v[1][1][1] - v[0][1][1])
    ) / res
    return d, jnp.stack([gx, gy, gz], axis=-1)

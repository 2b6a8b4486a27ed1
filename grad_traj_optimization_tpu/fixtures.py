"""Golden scenario fixtures ported from the reference demos.

The reference has no automated tests; its de-facto golden scenarios are
the fixed maps/waypoints embedded in the demo drivers.  These generators
reproduce them exactly:

* :func:`opti_node_scenario` — src/opti_node.cpp:60-97: 40x40x5 m map at
  0.2 m resolution, two wall obstacles, 11 fixed waypoints.
* :func:`text_input_scenario` — launch/text_input.launch:4-79 +
  src/example_text_input.cpp:28-70: 20x20x5 m map at 0.1 m, nine 5x5-cell
  pillars up to z=3.5, 8 waypoints.
* :func:`random_scenarios` — the 'random-map scenario' benchmark config:
  sampled box obstacles + randomized waypoints, batched.
"""

from __future__ import annotations

import numpy as np

from grad_traj_optimization_tpu.config import MapConfig


def _frange_grid(starts_stops_steps):
    """Cartesian product of float ranges (start, stop_inclusive, step)."""
    axes = []
    for start, stop, step in starts_stops_steps:
        n = int(np.floor((stop - start) / step + 1e-9)) + 1
        axes.append(start + step * np.arange(n))
    g = np.meshgrid(*axes, indexing="ij")
    return np.stack([a.ravel() for a in g], axis=-1)


def opti_node_scenario():
    """Returns (map_cfg, obstacle_points (N,3), waypoints (11,3))."""
    map_cfg = MapConfig(
        origin=(-20.0, -20.0, 0.0), resolution=0.2, map_size=(40.0, 40.0, 5.0)
    )
    # wall 1: x in [0.05, 3.0] step .2, y in [2.05, 2.7] step .2,
    #         z in [0.05, 5.0] step .2   (opti_node.cpp:66-71)
    wall1 = _frange_grid([(0.05, 3.0, 0.2), (2.05, 2.7, 0.2), (0.05, 5.0, 0.2)])
    # wall 2: x from 0.05 DOWN to -3.0 step .2 (16 values: 0.05..-2.95),
    #         y from -2.05 down to -2.7, z as wall 1 (opti_node.cpp:73-78)
    x2 = 0.05 - 0.2 * np.arange(16)
    y2 = -2.05 - 0.2 * np.arange(4)
    z2 = 0.05 + 0.2 * np.arange(25)
    g2 = np.meshgrid(x2, y2, z2, indexing="ij")
    wall2 = np.stack([a.ravel() for a in g2], axis=-1)
    obss = np.concatenate([wall1, wall2], axis=0)

    waypoints = np.array(
        [
            [0, -5, 2],
            [1, -4, 2],
            [1, -3, 2],
            [1, -2, 2],
            [1, -1, 2],
            [0, 0, 2],
            [-1, 1, 2],
            [-1, 2, 2],
            [-1, 3, 2],
            [-1, 4, 2],
            [0, 5, 2],
        ],
        dtype=np.float64,
    )
    return map_cfg, obss, waypoints


def text_input_scenario():
    """Returns (map_cfg, obstacle_points, waypoints (8,3))."""
    map_cfg = MapConfig(
        origin=(-10.0, -10.0, 0.0), resolution=0.1, map_size=(20.0, 20.0, 5.0)
    )
    res = map_cfg.resolution
    pillars_xy = np.array(
        [
            [-2.0, 2.0], [0.0, 2.0], [2.0, 2.0],
            [-2.0, 0.0], [0.0, 0.0], [2.0, 0.0],
            [-2.0, -2.0], [0.0, -2.0], [2.0, -2.0],
        ]
    )
    th = 2  # example_text_input.cpp:60-70
    pts = []
    zs = np.arange(0.0, 3.5, res)
    for cx, cy in pillars_xy:
        for mm in range(-th, th + 1):
            for nn in range(-th, th + 1):
                for z in zs:
                    pts.append((cx + mm * res, cy + nn * res, z))
    obss = np.array(pts)

    waypoints = np.array(
        [
            [1.0, 3.0, 2.0],
            [-0.7, 2.6, 2.0],
            [-0.7, 1.4, 2.0],
            [0.7, 0.6, 2.0],
            [0.7, -0.6, 2.0],
            [-0.7, -1.4, 2.0],
            [-0.7, -2.6, 2.0],
            [0.7, -3.0, 3.0],
        ]
    )
    return map_cfg, obss, waypoints


def random_search_case(rng, map_cfg=None, n_pillars=(4, 9),
                       gap_walls=(1, 3), clearance: float = 0.6):
    """One random SEARCH problem: pillar map (+ optional gap walls
    across y=0), EDT field, and free-space start/goal on opposite sides.

    Shared by the front-end benchmark scripts (beam-vs-exact quality
    gate, compare2-style suites).  Returns
    ``(dist, origin, resolution, start, goal)`` or None when no free
    start/goal was found (degenerate map — caller retries).
    """
    import jax.numpy as jnp

    from grad_traj_optimization_tpu.fields import sdf

    if map_cfg is None:
        map_cfg = MapConfig(
            origin=(-8.0, -8.0, 0.0), resolution=0.25,
            map_size=(16.0, 16.0, 5.0),
        )
    res = map_cfg.resolution
    zmax = map_cfg.map_size[2]
    ext = min(-map_cfg.origin[0], -map_cfg.origin[1]) - 2.0
    pts = []
    for _ in range(rng.integers(*n_pillars)):
        cx, cy = rng.uniform(-ext, ext, size=2)
        sx, sy = rng.uniform(0.4, 1.4, size=2)
        for x in np.arange(cx - sx / 2, cx + sx / 2 + 1e-9, res):
            for y in np.arange(cy - sy / 2, cy + sy / 2 + 1e-9, res):
                for z in np.arange(0.05, zmax, res):
                    pts.append((x, y, z))
    if gap_walls is not None:
        gaps = []
        for _ in range(rng.integers(*gap_walls)):
            gx = rng.uniform(-ext, ext)
            gw = rng.uniform(1.2, 2.0)
            gaps.append((gx - gw / 2, gx + gw / 2))
        x0 = map_cfg.origin[0]
        for x in np.arange(x0, x0 + map_cfg.map_size[0], res):
            if any(lo < x < hi for lo, hi in gaps):
                continue
            for z in np.arange(0.05, zmax, res):
                pts.append((x, 0.0, z))

    origin = jnp.asarray(map_cfg.origin, jnp.float32)
    occ = sdf.rasterize(
        jnp.asarray(np.asarray(pts), jnp.float32), origin, res,
        map_cfg.grid_shape,
    )
    dist = sdf.edt(occ, res)
    dist_np = np.asarray(dist)

    def free_point(ylo, yhi):
        for _ in range(100):
            p = np.array([
                rng.uniform(-ext - 1, ext + 1), rng.uniform(ylo, yhi),
                rng.uniform(1.0, min(3.5, zmax - 0.5)),
            ])
            i = np.floor(
                (p - np.asarray(map_cfg.origin)) / res
            ).astype(int)
            shape = map_cfg.grid_shape
            i = np.clip(i, 0, np.asarray(shape) - 1)
            if dist_np[i[0], i[1], i[2]] > clearance:
                return p
        return None

    start = free_point(-ext - 0.5, -2.0)
    goal = free_point(2.0, ext + 0.5)
    if start is None or goal is None:
        return None
    return dist, np.asarray(map_cfg.origin), res, start, goal


def random_scenarios(
    n: int,
    n_waypoints: int = 7,
    n_boxes: int = 8,
    seed: int = 0,
    map_cfg: MapConfig | None = None,
    max_obstacle_points: int = 4096,
):
    """Batch of random box-obstacle maps + corridor waypoints.

    Returns (map_cfg, obstacle_points (n, P, 3), valid (n, P),
    waypoints (n, n_waypoints, 3)).  Obstacle point lists are padded to a
    fixed P with out-of-map sentinels so the batch is rectangular.
    """
    if map_cfg is None:
        map_cfg = MapConfig(
            origin=(-10.0, -10.0, 0.0),
            resolution=0.2,
            map_size=(20.0, 20.0, 5.0),
        )
    rng = np.random.default_rng(seed)
    res = map_cfg.resolution
    P = max_obstacle_points
    all_pts = np.full((n, P, 3), 1e6, dtype=np.float64)  # out-of-map pad
    valid = np.zeros((n, P), dtype=bool)
    all_wps = np.zeros((n, n_waypoints, 3))

    for i in range(n):
        pts = []
        for _ in range(n_boxes):
            cx, cy = rng.uniform(-6, 6, size=2)
            sx, sy = rng.uniform(0.4, 1.6, size=2)
            h = rng.uniform(2.0, 5.0)
            xs = np.arange(cx - sx / 2, cx + sx / 2 + 1e-9, res)
            ys = np.arange(cy - sy / 2, cy + sy / 2 + 1e-9, res)
            zs = np.arange(0.05, h, res)
            g = np.stack(
                np.meshgrid(xs, ys, zs, indexing="ij"), axis=-1
            ).reshape(-1, 3)
            pts.append(g)
        pts = np.concatenate(pts, axis=0)
        if len(pts) > P:
            pts = pts[rng.choice(len(pts), P, replace=False)]
        all_pts[i, : len(pts)] = pts
        valid[i, : len(pts)] = True

        # waypoints: straight-ish corridor with lateral jitter, kept off
        # the floor/ceiling
        y = np.linspace(-7.0, 7.0, n_waypoints)
        x = rng.uniform(-1.5, 1.5, size=n_waypoints)
        z = rng.uniform(1.5, 3.0, size=n_waypoints)
        all_wps[i] = np.stack([x, y, z], axis=-1)

    return map_cfg, all_pts, valid, all_wps


def random_scenarios_device(key, n: int, n_waypoints: int = 7,
                            n_boxes: int = 8,
                            map_cfg: MapConfig | None = None):
    """Device-side random scenario batch: occupancy + waypoints from a
    JAX PRNG key, no host generation or obstacle-point transfer.

    The box distribution mirrors :func:`random_scenarios` (random-map
    benchmark config): ``n_boxes`` axis-aligned pillars of 0.4-1.6 m
    footprint and 2-5 m height in the central 12x12 m, plus a jittered
    straight corridor of waypoints.  Boxes rasterize by direct voxel
    coordinate comparison — a dense (n, nx, ny, nz) mask per box,
    accumulated over the small box count — so a pod-scale Monte-Carlo
    never ships point lists over the host link.

    Returns (occupancy (n, nx, ny, nz) f32, waypoints (n, n_wp, 3) f32).
    Build distances with ``sdf.edt_batch(occ, map_cfg.resolution)``.
    """
    import jax
    import jax.numpy as jnp

    if map_cfg is None:
        map_cfg = MapConfig(
            origin=(-10.0, -10.0, 0.0),
            resolution=0.2,
            map_size=(20.0, 20.0, 5.0),
        )
    nx, ny, nz = map_cfg.grid_shape
    res = map_cfg.resolution
    origin = jnp.asarray(map_cfg.origin, jnp.float32)

    kc, ks, kh, kx, kz = jax.random.split(key, 5)
    centers = jax.random.uniform(
        kc, (n, n_boxes, 2), minval=-6.0, maxval=6.0
    )
    sizes = jax.random.uniform(
        ks, (n, n_boxes, 2), minval=0.4, maxval=1.6
    )
    heights = jax.random.uniform(
        kh, (n, n_boxes), minval=2.0, maxval=5.0
    )

    # voxel-center coordinates per axis
    cx = origin[0] + (jnp.arange(nx, dtype=jnp.float32) + 0.5) * res
    cy = origin[1] + (jnp.arange(ny, dtype=jnp.float32) + 0.5) * res
    cz = origin[2] + (jnp.arange(nz, dtype=jnp.float32) + 0.5) * res

    # every box is a ground-based pillar, so their union is exactly a
    # per-(x, y) max-height field: one full-volume comparison instead of
    # one 3-D mask per box (the full-volume traffic dominates)
    inx = (
        (cx[None, None, :] >= (centers[..., 0] - sizes[..., 0] / 2)[..., None])
        & (cx[None, None, :] <= (centers[..., 0] + sizes[..., 0] / 2)[..., None])
    )  # (n, n_boxes, nx)
    iny = (
        (cy[None, None, :] >= (centers[..., 1] - sizes[..., 1] / 2)[..., None])
        & (cy[None, None, :] <= (centers[..., 1] + sizes[..., 1] / 2)[..., None])
    )  # (n, n_boxes, ny)
    cover_h = (
        inx[:, :, :, None]
        & iny[:, :, None, :]
    ).astype(jnp.float32) * heights[:, :, None, None]  # (n, nb, nx, ny)
    H = jnp.max(cover_h, axis=1)  # (n, nx, ny) pillar height per column
    occ = (cz[None, None, None, :] <= H[..., None]).astype(jnp.float32)

    y = jnp.linspace(-7.0, 7.0, n_waypoints)
    wx = jax.random.uniform(
        kx, (n, n_waypoints), minval=-1.5, maxval=1.5
    )
    wz = jax.random.uniform(
        kz, (n, n_waypoints), minval=1.5, maxval=3.0
    )
    wps = jnp.stack(
        [wx, jnp.broadcast_to(y[None], (n, n_waypoints)), wz], axis=-1
    )
    return occ, wps

"""Native C++ engine vs the JAX path and the float64 golden oracle."""

import numpy as np
import jax.numpy as jnp
import pytest

from grad_traj_optimization_tpu import native
from grad_traj_optimization_tpu import solver as solve_mod
from grad_traj_optimization_tpu.config import MapConfig, OptimizerConfig
from grad_traj_optimization_tpu.core import poly
from grad_traj_optimization_tpu.fields import sdf

from conftest import gap_wall_map

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)


def test_native_edt_matches_jax():
    rng = np.random.default_rng(3)
    occ = (rng.random((40, 30, 12)) < 0.06).astype(np.float32)
    d_native = native.edt(occ, 0.25)
    d_jax = np.asarray(sdf.edt(jnp.asarray(occ), 0.25))
    np.testing.assert_allclose(d_native, d_jax, atol=1e-5)


def test_native_trilinear_matches_jax():
    rng = np.random.default_rng(4)
    occ = (rng.random((20, 20, 10)) < 0.08).astype(np.float32)
    dist = native.edt(occ, 0.2)
    origin = np.array([-1.0, -1.0, 0.0], np.float32)
    q = rng.uniform(-1.5, 3.5, size=(500, 3)).astype(np.float32)
    dn, gn = native.trilinear(dist, origin, 0.2, q)
    dj, gj = sdf.distance_and_gradient(
        jnp.asarray(dist), jnp.asarray(origin), 0.2, jnp.asarray(q)
    )
    np.testing.assert_allclose(dn, np.asarray(dj), atol=1e-5)
    np.testing.assert_allclose(gn, np.asarray(gj), atol=1e-4)


def test_native_solve_matches_jax_solve():
    """Same deterministic algorithm in f64 (C++) and f32 (JAX): sampled
    positions must agree within the 1e-3 parity budget."""
    map_cfg = MapConfig(
        origin=(-5.0, -5.0, 0.0), resolution=0.25, map_size=(10.0, 10.0, 4.0)
    )
    pts = []
    for x in np.arange(-2.0, 2.0, map_cfg.resolution):
        for z in np.arange(0.1, 4.0, map_cfg.resolution):
            if abs(x) > 0.6:
                pts.append((x, 0.0, z))
    obss = np.array(pts)
    wp = np.array(
        [
            [0.0, -3.0, 2.0],
            [0.3, -1.5, 2.0],
            [0.0, 0.0, 2.0],
            [-0.3, 1.5, 2.0],
            [0.0, 3.0, 2.0],
        ]
    )
    cfg = OptimizerConfig(iters_step1=10, iters_step2=25)

    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(2,), record_trace=False)

    coeff_n, times_n, cost_n = native.solve(
        np.asarray(scn.dist), map_cfg.origin, map_cfg.resolution, wp, cfg,
        steps=(2,),
    )
    np.testing.assert_allclose(times_n, np.asarray(sol.T), rtol=1e-5)

    ts = np.linspace(1e-3, times_n.sum() - 1e-3, 150)
    pos_j = np.asarray(
        poly.evaluate(sol.coeff, sol.T, jnp.asarray(ts, jnp.float32))
    )
    edges = np.cumsum(times_n)
    pos_n = np.zeros((len(ts), 3))
    for i, t in enumerate(ts):
        s = min(int(np.searchsorted(edges, t, side="right")), len(times_n) - 1)
        tl = t - (edges[s - 1] if s > 0 else 0.0)
        basis = np.array([tl**j for j in range(6)])
        pos_n[i] = coeff_n[s] @ basis
    dev = np.abs(pos_j - pos_n).max()
    assert dev < 1e-3, f"native/JAX positional deviation {dev}"
    assert abs(cost_n - float(sol.cost)) / max(abs(cost_n), 1.0) < 5e-3


def test_native_solve_va_penalties_match_jax():
    """Velocity/acceleration penalties on: the C++ f64 home must produce
    the same trajectory as the JAX path (lockstep rule, all four homes)."""
    map_cfg = MapConfig(
        origin=(-5.0, -5.0, 0.0), resolution=0.25, map_size=(10.0, 10.0, 4.0)
    )
    pts = []
    for x in np.arange(-2.0, 2.0, map_cfg.resolution):
        for z in np.arange(0.1, 4.0, map_cfg.resolution):
            if abs(x) > 0.6:
                pts.append((x, 0.0, z))
    obss = np.array(pts)
    wp = np.array(
        [
            [0.0, -3.0, 2.0],
            [0.3, -1.5, 2.0],
            [0.0, 0.0, 2.0],
            [-0.3, 1.5, 2.0],
            [0.0, 3.0, 2.0],
        ]
    )
    # click-launch scales (v0=2.5, a0=3.5): binding but gentle enough
    # that the f32 and f64 descents stay in one basin; tighter v0/a0
    # make the exponential landscape chaotic across precisions
    cfg = OptimizerConfig(
        iters_step2=25, alpha_v=0.1, v0=2.5, alpha_a=0.1, a0=3.5
    )

    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(2,), record_trace=False)
    coeff_n, times_n, cost_n = native.solve(
        np.asarray(scn.dist), map_cfg.origin, map_cfg.resolution, wp, cfg,
        steps=(2,),
    )
    ts = np.linspace(1e-3, times_n.sum() - 1e-3, 150)
    pos_j = np.asarray(
        poly.evaluate(sol.coeff, sol.T, jnp.asarray(ts, jnp.float32))
    )
    edges = np.cumsum(times_n)
    pos_n = np.zeros((len(ts), 3))
    for i, t in enumerate(ts):
        s = min(int(np.searchsorted(edges, t, side="right")), len(times_n) - 1)
        tl = t - (edges[s - 1] if s > 0 else 0.0)
        basis = np.array([tl**j for j in range(6)])
        pos_n[i] = coeff_n[s] @ basis
    dev = np.abs(pos_j - pos_n).max()
    assert dev < 1e-3, f"native/JAX positional deviation {dev}"
    assert abs(cost_n - float(sol.cost)) / max(abs(cost_n), 1.0) < 5e-3
    # the penalties bind: alphas-off native run lands at a different cost
    _, _, cost_off = native.solve(
        np.asarray(scn.dist), map_cfg.origin, map_cfg.resolution, wp,
        OptimizerConfig(iters_step2=25), steps=(2,),
    )
    assert abs(cost_off - cost_n) / max(abs(cost_n), 1.0) > 1e-4


def test_native_solve_batch_matches_per_case():
    """The threaded batch entry returns bitwise the per-case results
    (gtop_solve is reentrant), for shared and per-scenario grids."""
    map_cfg = MapConfig(
        origin=(-5.0, -5.0, 0.0), resolution=0.25, map_size=(10.0, 10.0, 4.0)
    )
    pts = np.array(
        [(x, 0.0, z)
         for x in np.arange(-2, 2, 0.25)
         for z in np.arange(0.1, 4, 0.25) if abs(x) > 0.6]
    )
    scn = solve_mod.make_scenario(
        np.array([[0.0, -3, 2], [0, 3, 2]]), pts, map_cfg
    )
    dist = np.asarray(scn.dist)
    rng = np.random.default_rng(0)
    base = np.array(
        [[0.0, -3, 2], [0.3, -1.5, 2], [0, 0, 2], [-0.3, 1.5, 2],
         [0, 3, 2]]
    )
    B = 4
    wps = np.stack([
        base + np.concatenate(
            [rng.uniform(-0.1, 0.1, (5, 2)), np.zeros((5, 1))], 1
        )
        for _ in range(B)
    ])
    cfg = OptimizerConfig(iters_step2=10)
    cb, tb, costb = native.solve_batch(
        dist, map_cfg.origin, 0.25, wps, cfg
    )
    for b in range(B):
        c1, t1, cost1 = native.solve(
            dist, map_cfg.origin, 0.25, wps[b], cfg
        )
        np.testing.assert_array_equal(c1, cb[b])
        np.testing.assert_array_equal(t1, tb[b])
        assert cost1 == costb[b]
    # per-scenario grids give the same results when the grids are equal
    cb2, _, costb2 = native.solve_batch(
        np.broadcast_to(dist, (B,) + dist.shape).copy(),
        map_cfg.origin, 0.25, wps, cfg,
    )
    np.testing.assert_array_equal(cb, cb2)
    np.testing.assert_array_equal(costb, costb2)


def test_native_solve_m1_no_free_vars():
    map_cfg = MapConfig(
        origin=(-5.0, -5.0, 0.0), resolution=0.5, map_size=(10.0, 10.0, 4.0)
    )
    dist = np.full(map_cfg.grid_shape, sdf.FREE_DIST, np.float32)
    wp = np.array([[0.0, -2.0, 2.0], [0.0, 2.0, 2.0]])
    cfg = OptimizerConfig()
    coeff, times, cost = native.solve(
        dist, map_cfg.origin, map_cfg.resolution, wp, cfg, steps=(2,)
    )
    assert np.isfinite(coeff).all() and np.isfinite(cost)
    basis0 = np.array([0.0**j for j in range(6)])
    basis0[0] = 1.0
    np.testing.assert_allclose(coeff[0] @ basis0, wp[0], atol=1e-9)


def test_native_kino_search_through_gap():
    origin = np.array([-5.0, -5.0, 0.0])
    res = 0.25
    pts = [
        (x, 0.0, z)
        for x in np.arange(-5, 5, res)
        for z in np.arange(0.1, 4, res)
        if abs(x) > 0.8
    ]
    occ = sdf.rasterize(
        jnp.asarray(np.array(pts), jnp.float32),
        jnp.asarray(origin, jnp.float32), res, (40, 40, 16),
    )
    dist = np.asarray(sdf.edt(occ, res))
    pos, vel, acc, times, reached = native.kino_search(
        dist, origin, res,
        np.array([0, -3, 2, 0, 0.5, 0.0]),
        np.array([0, 3, 2, 0, 0, 0.0]),
    )
    assert reached and len(pos) >= 3
    np.testing.assert_allclose(pos[0], [0, -3, 2], atol=1e-9)
    np.testing.assert_allclose(pos[-1], [0, 3, 2], atol=1e-9)
    # all knots keep the margin
    for p in pos:
        i = np.clip(
            np.floor((p - origin) / res).astype(int), 0, [39, 39, 15]
        )
        assert dist[i[0], i[1], i[2]] > 0.2
    # velocity limits respected at knots
    assert np.abs(vel).max() <= 3.0 + 1e-9


def test_native_kino_search_blocked():
    origin = np.array([-5.0, -5.0, 0.0])
    res = 0.25
    pts = [
        (x, 0.0, z)
        for x in np.arange(-5, 5, res)
        for z in np.arange(0.1, 4, res)
    ]
    occ = sdf.rasterize(
        jnp.asarray(np.array(pts), jnp.float32),
        jnp.asarray(origin, jnp.float32), res, (40, 40, 16),
    )
    dist = np.asarray(sdf.edt(occ, res))
    # margin > cell size: the 10-sample one-shot sweep (reference
    # kinodynamic_astar.cpp:415-446) can quantization-slip through a
    # one-cell wall when margin < resolution
    pos, vel, acc, times, reached = native.kino_search(
        dist, origin, res,
        np.array([0, -3, 2, 0, 0.0, 0.0]),
        np.array([0, 3, 2, 0, 0, 0.0]),
        max_nodes=4000, margin=0.3,
    )
    assert not reached


def test_native_solve_nonmonotone_dual_matches_jax():
    """accept_window > 1 + dual seeding agree between the C++ engine
    (f64) and the JAX path (f32) within the parity budget."""
    map_cfg = MapConfig(
        origin=(-5.0, -5.0, 0.0), resolution=0.25,
        map_size=(10.0, 10.0, 4.0),
    )
    pts = []
    for x in np.arange(-2.0, 2.0, map_cfg.resolution):
        for z in np.arange(0.1, 4.0, map_cfg.resolution):
            if abs(x) > 0.6:
                pts.append((x, 0.0, z))
    obss = np.array(pts)
    wp = np.array(
        [
            [0.0, -3.0, 2.0],
            [0.3, -1.5, 2.0],
            [0.0, 0.0, 2.0],
            [-0.3, 1.5, 2.0],
            [0.0, 3.0, 2.0],
        ]
    )
    cfg = OptimizerConfig(
        iters_step1=6, iters_step2=15, accept_window=4,
        seed_mode="dual", dual_ms_iters=10,
    )
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(2,), record_trace=False)

    coeff_n, times_n, cost_n = native.solve(
        np.asarray(scn.dist), map_cfg.origin, map_cfg.resolution, wp,
        cfg, steps=(2,),
    )
    ts = np.linspace(1e-3, times_n.sum() - 1e-3, 150)
    pos_j = np.asarray(
        poly.evaluate(sol.coeff, sol.T, jnp.asarray(ts, jnp.float32))
    )
    edges = np.cumsum(times_n)
    pos_n = np.zeros((len(ts), 3))
    for i, t in enumerate(ts):
        s = min(
            int(np.searchsorted(edges, t, side="right")),
            len(times_n) - 1,
        )
        tl = t - (edges[s - 1] if s > 0 else 0.0)
        basis = np.array([tl**j for j in range(6)])
        pos_n[i] = coeff_n[s] @ basis
    dev = np.abs(pos_j - pos_n).max()
    assert dev < 1e-3, f"native/JAX positional deviation {dev}"
    assert abs(cost_n - float(sol.cost)) / max(abs(cost_n), 1.0) < 5e-3


def _gap_wall_map(gap_lo=0.8, gap_hi=2.4):
    """Two-cell wall across y=0 with a gap at x in (gap_lo, gap_hi)."""
    return gap_wall_map(gap_lo, gap_hi, thickness_cells=2)


def test_native_hybrid_search_through_gap():
    """Hybrid A* (compare2's front-end, hybrid_astar.cpp:219-446)
    threads the off-center gap and returns REACH_END with a shot-
    completed knot chain."""
    dist, origin, res = _gap_wall_map()
    pos, vel, acc, times, status = native.hybrid_search(
        dist, origin, res,
        np.array([0, -3, 2, 0, 0.0, 0.0]),
        np.array([0, 3, 2, 0, 0, 0.0]),
    )
    assert status == native.HYBRID_REACH_END
    assert len(pos) >= 3 and len(times) == len(pos) - 1
    np.testing.assert_allclose(pos[0], [0, -3, 2], atol=1e-9)
    np.testing.assert_allclose(pos[-1], [0, 3, 2], atol=1e-9)
    assert np.all(times > 0)
    # knot states respect the reference's velocity bound (:612-616)
    assert np.abs(vel).max() <= 3.0 + 1e-9
    # substep clearance was enforced at 0.2 (hybrid_astar.cpp:644):
    # every intermediate knot sits in free space
    for p in pos[1:-1]:
        i = np.clip(
            np.floor((p - origin) / res).astype(int), 0, [39, 39, 15]
        )
        assert dist[i[0], i[1], i[2]] > 0.0


def test_native_hybrid_search_blocked_and_horizon():
    # sealed wall -> NO_PATH
    dist, origin, res = _gap_wall_map(gap_lo=99.0, gap_hi=99.0)
    pos, *_rest, status = native.hybrid_search(
        dist, origin, res,
        np.array([0, -3, 2, 0, 0.0, 0.0]),
        np.array([0, 3, 2, 0, 0, 0.0]),
        max_iters=4000,
    )
    assert status == native.HYBRID_NO_PATH and len(pos) == 0

    # free corridor with a horizon shorter than the goal distance ->
    # REACH_HORIZON with the branch ending near the horizon radius
    free = np.full((300, 40, 16), 10000.0, np.float32)
    pos, vel, acc, times, status = native.hybrid_search(
        free, origin, res,
        np.array([0, -3, 2, 0, 0.0, 0.0]),
        np.array([60, -3, 2, 0, 0, 0.0]),
        horizon=20.0,
    )
    assert status == native.HYBRID_REACH_HORIZON
    assert np.linalg.norm(pos[-1] - [0, -3, 2]) >= 20.0


def test_native_hybrid_init_mode_and_geometric_heu():
    dist, origin, res = _gap_wall_map()
    s = np.array([0, -3, 2, 0, 0.5, 0.0])
    g = np.array([0, 3, 2, 0, 0, 0.0])
    # init-mode first expansion: um = start_acc over 8 durations
    # (hybrid_astar.cpp:1377-1447)
    pos, vel, acc, times, status = native.hybrid_search(
        dist, origin, res, s, g, start_acc=(0.0, 2.0, 0.0), use_init=True
    )
    assert status == native.HYBRID_REACH_END
    # the first segment's acceleration is the start acc and its
    # duration is an init-mode multiple of init_max_tau/8
    np.testing.assert_allclose(acc[0], [0.0, 2.0, 0.0], atol=1e-12)
    assert abs(times[0] / 0.1 - round(times[0] / 0.1)) < 1e-9
    # geometric heuristic modes reach the goal too (:148-186)
    for mode in (1, 2, 3):
        *_o, st = native.hybrid_search(
            dist, origin, res, s, g, heu_mode=mode, max_iters=60000
        )
        assert st == native.HYBRID_REACH_END, mode


def test_native_solve_polish_matches_jax_and_golden():
    """polish_iters (the round-3 dual post-race restart) agrees across
    the JAX path, the f64 golden oracle, and the C++ engine — the
    descent-schedule lockstep rule (CLAUDE.md rule 3)."""
    from grad_traj_optimization_tpu.reference_impl import golden

    map_cfg = MapConfig(
        origin=(-5.0, -5.0, 0.0), resolution=0.25,
        map_size=(10.0, 10.0, 4.0),
    )
    pts = []
    for x in np.arange(-2.0, 2.0, map_cfg.resolution):
        for z in np.arange(0.1, 4.0, map_cfg.resolution):
            if abs(x) > 0.6:
                pts.append((x, 0.0, z))
    obss = np.array(pts)
    wp = np.array(
        [
            [0.0, -3.0, 2.0],
            [0.3, -1.5, 2.0],
            [0.0, 0.0, 2.0],
            [-0.3, 1.5, 2.0],
            [0.0, 3.0, 2.0],
        ]
    )
    cfg = OptimizerConfig(
        iters_step1=6, iters_step2=12, accept_window=4,
        seed_mode="dual", dual_ms_iters=8, dual_ms_window=2,
        polish_iters=6,
    )
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(2,), record_trace=False)
    # polish can only improve on the race winner
    cfg0 = OptimizerConfig(
        iters_step1=6, iters_step2=12, accept_window=4,
        seed_mode="dual", dual_ms_iters=8,
    )
    sol0 = solve_mod.solve(scn, cfg=cfg0, steps=(2,), record_trace=False)
    assert float(sol.cost) <= float(sol0.cost) + 1e-6

    coeff_n, times_n, cost_n = native.solve(
        np.asarray(scn.dist), map_cfg.origin, map_cfg.resolution, wp,
        cfg, steps=(2,),
    )
    gmap = golden.GoldenSDFMap(
        np.asarray(map_cfg.origin), map_cfg.resolution, map_cfg.map_size
    )
    for p_obs in obss:
        gmap.set_occupancy(np.asarray(p_obs, np.float64))
    gmap.update_esdf()
    opt = golden.GoldenOptimizer(gmap, cfg)
    opt.setup(wp)
    dp_g, coeff_g = opt.optimize(steps=(2,))
    cost_g = opt.cost_only(dp_g, 2)

    # C++ vs golden: same f64 algorithm, near-identical
    assert abs(cost_n - cost_g) / max(abs(cost_g), 1.0) < 1e-6
    np.testing.assert_allclose(coeff_n, coeff_g, rtol=1e-5, atol=1e-6)
    # JAX f32 vs f64 oracles within the parity budget
    ts = np.linspace(1e-3, times_n.sum() - 1e-3, 150)
    pos_j = np.asarray(
        poly.evaluate(sol.coeff, sol.T, jnp.asarray(ts, jnp.float32))
    )
    edges = np.cumsum(times_n)
    pos_n = np.zeros((len(ts), 3))
    for i, t in enumerate(ts):
        s = min(
            int(np.searchsorted(edges, t, side="right")),
            len(times_n) - 1,
        )
        tl = t - (edges[s - 1] if s > 0 else 0.0)
        basis = np.array([tl**j for j in range(6)])
        pos_n[i] = coeff_n[s] @ basis
    dev = np.abs(pos_j - pos_n).max()
    assert dev < 1e-3, f"native/JAX positional deviation {dev}"
    assert abs(cost_n - float(sol.cost)) / max(abs(cost_n), 1.0) < 5e-3


def test_native_rrt_corridor_and_repair():
    """Native safe-ball RRT* (gtop_rrt_*): grows a valid overlapping-ball
    corridor through the gap, and a map change (gap moves) repairs the
    tree so the new corridor threads the NEW gap
    (path_finder.cpp:713-804, 1065-1554)."""
    from grad_traj_optimization_tpu.search import rrt as rrt_mod

    dist, origin, res = gap_wall_map(-0.8, 0.8)
    p = native.NativeRRTPlanner(
        dist, origin, res,
        start=np.array([0.0, -3.0, 2.0]), goal=np.array([0.0, 3.0, 2.0]),
        seed=1,
    )
    assert p.grow(2000)
    r = p.result()
    assert r.reached and r.cost >= 6.0 and r.n_nodes > 10
    for a in range(len(r.path) - 1):
        gap = np.linalg.norm(r.path[a + 1] - r.path[a])
        assert gap <= r.radii[a] + r.radii[a + 1] + 1e-9
    for a in range(len(r.path)):
        assert rrt_mod._dist_at(dist, origin, res, r.path[a]) >= 0.29

    # the x=0 gap closes; a new one opens at x in (2.1, 3.9)
    dist_b, _, _ = gap_wall_map(2.1, 3.9, thickness_cells=2)
    if not p.update_map(dist_b, repair_iters=150):
        assert p.grow(2500)
    r2 = p.result()
    assert r2.reached
    for a in range(len(r2.path)):
        assert rrt_mod._dist_at(dist_b, origin, res, r2.path[a]) >= 0.29
    # the corridor crossing of the wall band threads the new gap
    crossed = False
    for a in range(len(r2.path) - 1):
        y0, y1 = r2.path[a][1], r2.path[a + 1][1]
        if y0 < 0.125 <= y1:
            f = (0.125 - y0) / max(y1 - y0, 1e-9)
            x_cross = r2.path[a][0] + f * (r2.path[a + 1][0] - r2.path[a][0])
            assert 1.9 < x_cross < 4.1, f"crossed at x={x_cross}"
            crossed = True
    assert crossed


def test_native_rrt_reset_root_and_unreachable():
    """resetRoot commits advance the tree root (path_finder.cpp:302-375);
    a solid wall reports failure."""
    dist, origin, res = gap_wall_map(-0.8, 0.8)
    p = native.NativeRRTPlanner(
        dist, origin, res,
        start=np.array([0.0, -3.0, 2.0]), goal=np.array([0.0, 3.0, 2.0]),
        seed=3,
    )
    assert p.grow(2000)
    n_before = p.result().n_nodes
    # commit a point partway along the path: either the root advances
    # (nodes behind it are cut) or the terminal commit_end flag raises
    mid = 0.5 * (np.array([0.0, -3.0, 2.0]) + np.array([0.0, 3.0, 2.0]))
    assert p.reset_root(mid)
    r = p.result()
    assert p.commit_end or (r.reached and r.n_nodes <= n_before)

    solid, origin, res = gap_wall_map(1.0, 1.0)  # no gap
    p2 = native.NativeRRTPlanner(
        solid, origin, res,
        start=np.array([0.0, -3.0, 2.0]), goal=np.array([0.0, 3.0, 2.0]),
        seed=2,
    )
    assert not p2.grow(400)
    assert not p2.result().reached


def test_native_free_shot_matches_jax_port():
    """gtop_free_shot is an exact port of getOptimalTime/getShotTrajectory
    (hybrid_astar.cpp:902-967); cross-check coef/T/v1 against the JAX
    port (search.kinodynamic.free_end_vel_shot) on random cases."""
    from grad_traj_optimization_tpu.search import kinodynamic

    rng = np.random.default_rng(7)
    for _ in range(200):
        p0 = rng.uniform(-5, 5, 3)
        p1 = rng.uniform(-5, 5, 3)
        v0 = rng.uniform(-3, 3, 3)
        c_c, T_c, v1_c = native.free_shot(p0, p1, v0, 3.0)
        c_j, T_j, v1_j = kinodynamic.free_end_vel_shot(
            jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
            jnp.asarray(v0, jnp.float32), 3.0,
        )
        # f32 JAX vs f64 C++: tolerance covers the dtype gap
        assert abs(float(T_j) - T_c) < 1e-3 * max(1.0, abs(T_c))
        np.testing.assert_allclose(
            np.asarray(c_j), c_c, rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(v1_j), v1_c, rtol=2e-3, atol=2e-3
        )


def test_native_hybrid_free_end_vel_shot_mode():
    """shot_mode=1 fires the reference's (unwired) freeEndVelShot family
    (hybrid_astar.cpp:969-1021): the goal knot carries the shot's free
    end velocity instead of the fixed zero."""
    dist, origin, res = gap_wall_map(-0.8, 0.8)
    s6 = np.array([0.0, -3.0, 2.0, 0.0, 0.0, 0.0])
    g6 = np.array([0.0, 3.0, 2.0, 0.0, 0.0, 0.0])
    pos0, vel0, _, t0, st0 = native.hybrid_search(
        dist, origin, res, s6, g6, margin=0.2, shot_mode=0
    )
    pos1, vel1, _, t1, st1 = native.hybrid_search(
        dist, origin, res, s6, g6, margin=0.2, shot_mode=1
    )
    assert st0 == native.HYBRID_REACH_END
    assert st1 == native.HYBRID_REACH_END
    # both land the goal; the free-vel variant's end velocity is the
    # shot's v1 (generally nonzero), within the (2.5/3)*max_vel bound
    np.testing.assert_allclose(pos0[-1], g6[:3], atol=1e-9)
    np.testing.assert_allclose(pos1[-1], g6[:3], atol=1e-9)
    np.testing.assert_allclose(vel0[-1], 0.0, atol=1e-12)
    assert np.all(vel1[-1] <= (2.5 / 3.0) * 3.0 + 1e-9)


def test_native_rrt_unreached_result_matches_python_shape():
    """Surface parity: an unreached native planner returns a 1-point
    root path exactly like rrt.RRTPlanner (not an empty array)."""
    from grad_traj_optimization_tpu.search import rrt

    solid, origin, res = gap_wall_map(1.0, 1.0)  # no gap
    start = np.array([0.0, -3.0, 2.0])
    goal = np.array([0.0, 3.0, 2.0])
    pn = native.NativeRRTPlanner(solid, origin, res, start=start,
                                 goal=goal, seed=1)
    pp = rrt.RRTPlanner(solid, origin, res, start=start, goal=goal,
                        seed=1)
    rn, rp = pn.result(), pp.result()
    assert not rn.reached and not rp.reached
    assert rn.path.shape == rp.path.shape == (1, 3)
    np.testing.assert_allclose(rn.path[0], start)
    np.testing.assert_allclose(rn.radii, rp.radii)

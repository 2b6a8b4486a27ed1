"""End-to-end solve: golden parity, batching, fixtures."""

import numpy as np
import jax
import jax.numpy as jnp

from grad_traj_optimization_tpu import fixtures
from grad_traj_optimization_tpu import solver as solve_mod
from grad_traj_optimization_tpu.config import MapConfig, OptimizerConfig
from grad_traj_optimization_tpu.core import poly
from grad_traj_optimization_tpu.fields import sdf
from grad_traj_optimization_tpu.reference_impl import golden


def _small_cfg():
    # small iteration budget keeps the float64 oracle affordable in tests
    return OptimizerConfig(iters_step1=10, iters_step2=25)


def _small_scene():
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
    return map_cfg, obss, wp


def test_solve_end_to_end_matches_float64_oracle():
    """TPU-path f32 solve vs the identical float64 NumPy pipeline: final
    sampled positions within the 1e-3 m tolerance (BASELINE.md)."""
    map_cfg, obss, wp = _small_scene()
    cfg = _small_cfg()

    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(2,))

    gm = golden.GoldenSDFMap(
        map_cfg.origin, map_cfg.resolution, map_cfg.map_size
    )
    for p in obss:
        gm.set_occupancy(p)
    gm.update_esdf()
    gopt = golden.GoldenOptimizer(gm, cfg)
    gopt.setup(wp)
    dp_g, coeff_g = gopt.optimize(steps=(2,))

    # compare sampled positions along the trajectory
    T = np.asarray(sol.T, np.float64)
    ts = np.linspace(1e-3, T.sum() - 1e-3, 200)
    pos_j = np.asarray(poly.evaluate(sol.coeff, sol.T, jnp.asarray(ts, jnp.float32)))

    edges = np.cumsum(T)
    pos_g = np.zeros((len(ts), 3))
    for i, t in enumerate(ts):
        s = int(np.searchsorted(edges, t, side="right"))
        s = min(s, len(T) - 1)
        tl = t - (edges[s - 1] if s > 0 else 0.0)
        basis = np.array([tl**j for j in range(6)])
        pos_g[i] = coeff_g[s] @ basis

    dev = np.abs(pos_j - pos_g).max()
    assert dev < 1e-3, f"positional deviation {dev} m >= 1e-3"


def test_solve_improves_clearance_and_keeps_endpoints():
    map_cfg, obss, wp = _small_scene()
    cfg = _small_cfg()
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(1, 2))

    assert int(sol.status) == solve_mod.STATUS_OK
    assert int(sol.n_accept) > 0
    # monotone cost envelope within each step
    trace = np.asarray(sol.cost_trace)
    s2 = trace[cfg.iters_step1 :]
    assert np.all(np.diff(s2) <= 1e-6)

    # endpoints pinned
    p0 = np.asarray(poly.evaluate(sol.coeff, sol.T, jnp.asarray(0.0)))
    p1 = np.asarray(
        poly.evaluate(sol.coeff, sol.T, jnp.sum(sol.T) - 1e-4)
    )
    np.testing.assert_allclose(p0, wp[0], atol=1e-3)
    np.testing.assert_allclose(p1, wp[-1], atol=2e-2)

    # the optimized trajectory stays clear of the wall and the optimizer
    # made progress (cost strictly below the seed cost)
    pos, _ = poly.sample_uniform(sol.coeff, sol.T, 300)
    d = sdf.distance_at(scn.dist, scn.origin, scn.resolution, pos)
    assert float(jnp.min(d)) > 0.25
    # progress within step 2 (step 1 optimizes a different objective)
    assert float(s2[-1]) < float(s2[0])


def test_solve_batch_matches_single():
    map_cfg, obss, wp = _small_scene()
    cfg = _small_cfg()
    scn = solve_mod.make_scenario(wp, obss, map_cfg)

    wps = np.stack([wp, wp + np.array([0.2, 0.0, 0.1])], axis=0)
    batch = solve_mod.Scenario(
        dist=jnp.broadcast_to(scn.dist, (2,) + scn.dist.shape),
        origin=jnp.broadcast_to(scn.origin, (2, 3)),
        resolution=jnp.broadcast_to(scn.resolution, (2,)),
        waypoints=jnp.asarray(wps, jnp.float32),
    )
    sols = solve_mod.solve_batch(batch, cfg=cfg, steps=(2,))
    single0 = solve_mod.solve(scn, cfg=cfg, steps=(2,), record_trace=False)
    np.testing.assert_allclose(
        np.asarray(sols.coeff[0]), np.asarray(single0.coeff),
        rtol=1e-4, atol=1e-4,
    )
    assert sols.coeff.shape[0] == 2


def test_opti_node_fixture_runs():
    map_cfg, obss, wp = fixtures.opti_node_scenario()
    cfg = OptimizerConfig(iters_step2=30)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(2,), record_trace=False)
    assert int(sol.status) == solve_mod.STATUS_OK
    metrics = solve_mod.evaluate_solution(sol)
    assert float(metrics["length"]) > 9.0  # path spans ~10 m corridor
    assert np.isfinite(float(metrics["jerk"]))


def test_kino_seeding_hits_states():
    from grad_traj_optimization_tpu.core import qp

    rng = np.random.default_rng(9)
    pos = rng.uniform(-3, 3, size=(4, 3)).astype(np.float32)
    vel = rng.uniform(-1, 1, size=(4, 3)).astype(np.float32)
    acc = rng.uniform(-1, 1, size=(4, 3)).astype(np.float32)
    T = np.array([1.0, 1.5, 0.8], np.float32)
    coeff = np.asarray(qp.kino_coeff(pos, vel, acc, T))
    for s in range(3):
        b0 = np.array([0.0**j for j in range(6)])
        b0[0] = 1.0
        bT = np.array([T[s] ** j for j in range(6)])
        np.testing.assert_allclose(coeff[s] @ b0, pos[s], atol=1e-3)
        np.testing.assert_allclose(coeff[s] @ bT, pos[s + 1], atol=1e-3)
        vT = np.asarray(poly.vel_powers(jnp.asarray(T[s])))
        np.testing.assert_allclose(coeff[s] @ vT, vel[s + 1], atol=5e-3)


def test_solve_batch_fused_matches_vmap_path():
    """Batch-first fused-kernel path (interpret mode on CPU) vs the
    vmapped reference path: same iterates within f32 noise."""
    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(
        iters_step1=4, iters_step2=10, lookup_mode="fused"
    )
    cfg_ref = OptimizerConfig(iters_step1=4, iters_step2=10)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    wps = np.stack([wp, wp + np.array([0.15, 0.0, 0.1])], axis=0)
    batch = solve_mod.Scenario(
        dist=jnp.stack([scn.dist, scn.dist]),
        origin=jnp.broadcast_to(scn.origin, (2, 3)),
        resolution=jnp.broadcast_to(scn.resolution, (2,)),
        waypoints=jnp.asarray(wps, jnp.float32),
    )
    s_ref = solve_mod.solve_batch(
        batch, cfg=cfg_ref, steps=(1, 2), record_trace=False
    )
    s_fused = solve_mod.solve_batch_fused(
        batch, cfg=cfg, steps=(1, 2), record_trace=False, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(s_fused.cost), np.asarray(s_ref.cost), rtol=5e-3
    )
    from grad_traj_optimization_tpu.core import poly

    for b in range(2):
        p1, _ = poly.sample_uniform(s_ref.coeff[b], s_ref.T[b], 100)
        p2, _ = poly.sample_uniform(s_fused.coeff[b], s_fused.T[b], 100)
        assert float(jnp.max(jnp.abs(p1 - p2))) < 1e-3


def test_solve_batch_dispatches_to_fused(monkeypatch):
    """solve_batch ROUTES lookup_mode='fused' batches to
    solve_batch_fused (a dispatch-order regression once hid the fused
    path behind the cropped-scenario guard), and cropped scenarios
    raise before any fused dispatch."""
    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(
        iters_step1=4, iters_step2=10, lookup_mode="fused"
    )
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    batch = solve_mod.Scenario(
        dist=scn.dist[None],
        origin=scn.origin[None],
        resolution=scn.resolution[None],
        waypoints=jnp.asarray(wp, jnp.float32)[None],
    )
    import pytest

    class _Routed(Exception):
        pass

    def stub(*a, **k):
        raise _Routed

    monkeypatch.setattr(solve_mod, "solve_batch_fused", stub)
    with pytest.raises(_Routed):
        solve_mod.solve_batch(batch, cfg=cfg, steps=(2,))

    # cropped scenarios (grid_offset set) must hit the kernel-path
    # guard, never the fused dispatch
    cropped = solve_mod.Scenario(
        dist=batch.dist[:, :32, :32, :],
        origin=batch.origin,
        resolution=batch.resolution,
        waypoints=batch.waypoints,
        grid_offset=jnp.zeros((1, 3), jnp.int32),
        grid_full=jnp.asarray([[40, 40, 16]], jnp.int32),
    )
    with pytest.raises(ValueError, match="exact-cropped"):
        solve_mod.solve_batch(cropped, cfg=cfg, steps=(2,))


def test_text_input_fixture_runs_two_step():
    """The legacy text_input scenario (launch/text_input.launch:4-79,
    example_text_input.cpp flow: step 1 then step 2) end to end."""
    from grad_traj_optimization_tpu.config import TEXT_INPUT_CONFIG
    import dataclasses

    map_cfg, obss, wp = fixtures.text_input_scenario()
    cfg = dataclasses.replace(
        TEXT_INPUT_CONFIG, iters_step1=10, iters_step2=20
    )
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(1, 2), record_trace=False)
    assert int(sol.status) == solve_mod.STATUS_OK
    pos, _ = poly.sample_uniform(sol.coeff, sol.T, 300)
    # NOTE: the text_input preset weights smoothness 2000x over collision
    # (ws=200, wc=0.1 — launch/text_input.launch:94-95), so grazing the
    # pillars is cost-optimal by design; the reference demo relied on a
    # separate waypoint-retry mechanic for clearance. Assert what the
    # preset guarantees: a finite, endpoint-pinned, in-map trajectory.
    np.testing.assert_allclose(np.asarray(pos[0]), wp[0], atol=1e-3)
    assert bool(jnp.all(jnp.isfinite(pos)))

    # with the opti_node weighting (wc=5, ws=1) the same scenario clears
    # the pillar grid
    cfg2 = OptimizerConfig(iters_step1=10, iters_step2=30)
    sol2 = solve_mod.solve(scn, cfg=cfg2, steps=(1, 2), record_trace=False)
    pos2, _ = poly.sample_uniform(sol2.coeff, sol2.T, 300)
    d2 = sdf.distance_at(scn.dist, scn.origin, scn.resolution, pos2)
    assert float(jnp.min(d2)) > 0.15


def test_crop_scenarios_matches_full_grid():
    """EXACT cropping (round-3): crop_scenarios keeps the global origin
    and records the integer cell offset; the whole-descent kernel does
    its coordinate arithmetic in the global frame, so cropped solves are
    BITWISE-identical to full-grid solves for in-window trajectories
    (interpret mode; the chip check lives in scripts/ab_crop_exact.py).
    """
    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        6, n_waypoints=5, seed=7, max_obstacle_points=1024
    )
    origin = jnp.asarray(map_cfg.origin, jnp.float32)
    res = map_cfg.resolution
    occ = jax.vmap(
        lambda p, v: sdf.rasterize(
            p, origin, res, map_cfg.grid_shape, valid_mask=v
        )
    )(jnp.asarray(pts, jnp.float32), jnp.asarray(valid))
    dist = sdf.edt_batch(occ, res)
    B = wps.shape[0]
    batch = solve_mod.Scenario(
        dist=dist,
        origin=jnp.broadcast_to(origin, (B, 3)),
        resolution=jnp.full((B,), res, jnp.float32),
        waypoints=jnp.asarray(wps, jnp.float32),
    )
    cfg = _small_cfg()
    cropped = solve_mod.crop_scenarios(batch, cfg)
    assert cropped.dist.shape[1:] != batch.dist.shape[1:]
    assert np.prod(cropped.dist.shape[1:]) < np.prod(batch.dist.shape[1:])
    # exact-crop frame: origin unchanged, offset + full extents recorded
    np.testing.assert_array_equal(
        np.asarray(cropped.origin), np.asarray(batch.origin)
    )
    assert cropped.grid_offset.shape == (B, 3)
    np.testing.assert_array_equal(
        np.asarray(cropped.grid_full),
        np.broadcast_to(np.asarray(batch.dist.shape[1:]), (B, 3)),
    )

    # the crop window must cover waypoints +- (bos + margin), clipped to
    # the map bounds
    off = np.asarray(cropped.grid_offset)
    lo = np.asarray(batch.origin) + off * res
    hi = lo + np.asarray(cropped.dist.shape[1:]) * res
    map_lo = np.asarray(batch.origin)
    map_hi = map_lo + np.asarray(batch.dist.shape[1:]) * res
    want_lo = np.maximum(
        np.asarray(wps).min(1) - cfg.bos - 2.0, map_lo
    )
    want_hi = np.minimum(
        np.asarray(wps).max(1) + cfg.bos + 2.0, map_hi
    )
    assert np.all(lo <= want_lo + res)
    assert np.all(hi >= want_hi - res)

    # solve both through the whole-descent kernel (interpret mode):
    # BITWISE-equal iterates — the cropped-away grid columns would have
    # contributed exact zeros
    s_full = solve_mod.solve_batch_kernel(
        batch, cfg=cfg, steps=(2,), interpret=True
    )
    s_crop = solve_mod.solve_batch_kernel(
        cropped, cfg=cfg, steps=(2,), interpret=True
    )
    assert np.all(np.asarray(s_crop.status) == solve_mod.STATUS_OK)
    np.testing.assert_array_equal(
        np.asarray(s_crop.dp), np.asarray(s_full.dp)
    )
    np.testing.assert_array_equal(
        np.asarray(s_crop.cost), np.asarray(s_full.cost)
    )

    # non-kernel paths must refuse cropped scenarios loudly
    import pytest

    with pytest.raises(ValueError, match="kernel path"):
        solve_mod.solve_batch(cropped, cfg=cfg, steps=(2,))


def test_crop_scenarios_shared_map_union_window():
    """Shared-map batches (dist dim 1) crop to ONE union window so the
    shared-grid kernel path (no per-scenario copies) is preserved."""
    map_cfg, pts, valid, wps = fixtures.random_scenarios(
        4, n_waypoints=5, seed=11, max_obstacle_points=1024
    )
    origin = jnp.asarray(map_cfg.origin, jnp.float32)
    res = map_cfg.resolution
    occ = sdf.rasterize(
        jnp.asarray(pts[0], jnp.float32), origin, res,
        map_cfg.grid_shape, valid_mask=jnp.asarray(valid[0]),
    )
    dist = sdf.edt(occ, res)[None]
    B = wps.shape[0]
    # cluster the waypoints so a union window is meaningfully smaller
    wps = np.asarray(wps) * 0.4
    batch = solve_mod.Scenario(
        dist=dist,
        origin=jnp.broadcast_to(origin, (B, 3)),
        resolution=jnp.full((B,), res, jnp.float32),
        waypoints=jnp.asarray(wps, jnp.float32),
    )
    cfg = _small_cfg()
    cropped = solve_mod.crop_scenarios(batch, cfg)
    assert cropped.dist.shape[0] == 1  # still shared
    off = np.asarray(cropped.grid_offset)
    assert np.all(off == off[0])  # one union window
    s_full = solve_mod.solve_batch_kernel(
        batch, cfg=cfg, steps=(2,), interpret=True
    )
    s_crop = solve_mod.solve_batch_kernel(
        cropped, cfg=cfg, steps=(2,), interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(s_crop.dp), np.asarray(s_full.dp)
    )


def test_solve_batch_kernel_matches_reference_path():
    """Whole-descent Pallas kernel (interpret mode on CPU) vs the
    reference vmap path: identical BB iterate rule, same accept counts,
    trajectories within the parity budget at moderate iteration counts
    (long runs diverge chaotically into equal-quality basins — see
    ops/solve_pallas.py docstring)."""
    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(iters_step1=4, iters_step2=10)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    wps = np.stack([wp, wp + np.array([0.15, 0.0, 0.1])], axis=0)
    batch = solve_mod.Scenario(
        dist=jnp.stack([scn.dist, scn.dist]),
        origin=jnp.broadcast_to(scn.origin, (2, 3)),
        resolution=jnp.broadcast_to(scn.resolution, (2,)),
        waypoints=jnp.asarray(wps, jnp.float32),
    )
    s_ref = solve_mod.solve_batch(
        batch, cfg=cfg, steps=(1, 2), record_trace=True
    )
    s_k = solve_mod.solve_batch_kernel(
        batch, cfg=cfg, steps=(1, 2), interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(s_k.n_accept), np.asarray(s_ref.n_accept)
    )
    # the in-kernel monotone cost envelope matches the JAX path's
    np.testing.assert_allclose(
        np.asarray(s_k.cost_trace), np.asarray(s_ref.cost_trace),
        rtol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(s_k.cost), np.asarray(s_ref.cost), rtol=5e-3
    )
    assert np.all(np.asarray(s_k.status) == solve_mod.STATUS_OK)
    for b in range(2):
        p1, _ = poly.sample_uniform(s_ref.coeff[b], s_ref.T[b], 100)
        p2, _ = poly.sample_uniform(s_k.coeff[b], s_k.T[b], 100)
        assert float(jnp.max(jnp.abs(p1 - p2))) < 1e-3


def test_solve_batch_kernel_exact_gradient_mode():
    """The kernel's exact-gradient static branch (w_dist without the
    reference's extra cd factor) matches the vmap path's exact mode."""
    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(
        iters_step1=3, iters_step2=8, gradient_mode="exact"
    )
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    batch = solve_mod.Scenario(
        dist=scn.dist[None],
        origin=scn.origin[None],
        resolution=scn.resolution[None],
        waypoints=jnp.asarray(wp, jnp.float32)[None],
    )
    s_ref = solve_mod.solve_batch(
        batch, cfg=cfg, steps=(1, 2), record_trace=False
    )
    s_k = solve_mod.solve_batch_kernel(
        batch, cfg=cfg, steps=(1, 2), interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(s_k.n_accept), np.asarray(s_ref.n_accept)
    )
    p1, _ = poly.sample_uniform(s_ref.coeff[0], s_ref.T[0], 100)
    p2, _ = poly.sample_uniform(s_k.coeff[0], s_k.T[0], 100)
    assert float(jnp.max(jnp.abs(p1 - p2))) < 1e-3


def test_solve_batch_kernel_va_penalties():
    """The kernel's velocity/acceleration-penalty branch (aacc chain +
    three-block merged gradient dot) matches the vmap path with the same
    alpha_v/alpha_a scales — and the penalties actually bind (costs
    differ from the alphas-off run)."""
    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(
        iters_step1=3, iters_step2=10, alpha_v=0.1, v0=1.0,
        alpha_a=0.1, a0=1.5,
    )
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    wps = np.stack([wp, wp + np.array([0.15, 0.0, 0.1])], axis=0)
    batch = solve_mod.Scenario(
        dist=jnp.stack([scn.dist, scn.dist]),
        origin=jnp.broadcast_to(scn.origin, (2, 3)),
        resolution=jnp.broadcast_to(scn.resolution, (2,)),
        waypoints=jnp.asarray(wps, jnp.float32),
    )
    s_ref = solve_mod.solve_batch(
        batch, cfg=cfg, steps=(1, 2), record_trace=True
    )
    s_k = solve_mod.solve_batch_kernel(
        batch, cfg=cfg, steps=(1, 2), interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(s_k.n_accept), np.asarray(s_ref.n_accept)
    )
    np.testing.assert_allclose(
        np.asarray(s_k.cost_trace), np.asarray(s_ref.cost_trace),
        rtol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(s_k.cost), np.asarray(s_ref.cost), rtol=5e-3
    )
    for b in range(2):
        p1, _ = poly.sample_uniform(s_ref.coeff[b], s_ref.T[b], 100)
        p2, _ = poly.sample_uniform(s_k.coeff[b], s_k.T[b], 100)
        assert float(jnp.max(jnp.abs(p1 - p2))) < 1e-3
    # velocity-only variant exercises the 2-block w_tvl fold
    cfg_v = OptimizerConfig(iters_step1=3, iters_step2=10, alpha_v=0.1,
                            v0=1.0)
    s_ref_v = solve_mod.solve_batch(
        batch, cfg=cfg_v, steps=(1, 2), record_trace=False
    )
    s_k_v = solve_mod.solve_batch_kernel(
        batch, cfg=cfg_v, steps=(1, 2), interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(s_k_v.n_accept), np.asarray(s_ref_v.n_accept)
    )
    np.testing.assert_allclose(
        np.asarray(s_k_v.cost), np.asarray(s_ref_v.cost), rtol=5e-3
    )
    # the penalties bind: alphas-off kernel run lands at different costs
    cfg_off = OptimizerConfig(iters_step1=3, iters_step2=10)
    s_off = solve_mod.solve_batch_kernel(
        batch, cfg=cfg_off, steps=(1, 2), interpret=True
    )
    assert not np.allclose(
        np.asarray(s_off.cost), np.asarray(s_k.cost), rtol=1e-4
    )


def test_solve_batch_kernel_shared_map():
    """Shared-map batches (dist leading dim 1): every kernel grid
    instance indexes the ONE prepped grid block; outputs must equal the
    broadcast-copies run exactly."""
    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(iters_step1=3, iters_step2=10)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    wps = np.stack(
        [wp, wp + np.array([0.15, 0.0, 0.1]), wp + np.array([-0.1, 0.05, 0.0])],
        axis=0,
    )
    B = 3
    shared = solve_mod.Scenario(
        dist=scn.dist[None],  # leading dim 1
        origin=jnp.broadcast_to(scn.origin, (B, 3)),
        resolution=jnp.broadcast_to(scn.resolution, (B,)),
        waypoints=jnp.asarray(wps, jnp.float32),
    )
    copies = solve_mod.Scenario(
        dist=jnp.broadcast_to(scn.dist, (B,) + scn.dist.shape),
        origin=shared.origin,
        resolution=shared.resolution,
        waypoints=shared.waypoints,
    )
    s_sh = solve_mod.solve_batch_kernel(shared, cfg=cfg, steps=(1, 2),
                                        interpret=True)
    s_cp = solve_mod.solve_batch_kernel(copies, cfg=cfg, steps=(1, 2),
                                        interpret=True)
    np.testing.assert_array_equal(np.asarray(s_sh.cost),
                                  np.asarray(s_cp.cost))
    np.testing.assert_array_equal(np.asarray(s_sh.dp),
                                  np.asarray(s_cp.dp))
    np.testing.assert_array_equal(np.asarray(s_sh.n_accept),
                                  np.asarray(s_cp.n_accept))


def test_solve_batch_kernel_many_waypoints():
    """The kernel's padded sample-row count is derived per call
    (sp_for), so m=10 (300 samples — beyond the old fixed SP=184 cap)
    dispatches through the whole-descent kernel and matches the vmap
    path."""
    from grad_traj_optimization_tpu.ops import solve_pallas as sk

    map_cfg = MapConfig(
        origin=(-10.0, -10.0, 0.0), resolution=0.25,
        map_size=(20.0, 20.0, 5.0),
    )
    rng = np.random.default_rng(0)
    obss = np.array(
        [(x, y, z)
         for cx, cy in rng.uniform(-6, 6, (6, 2))
         for x in np.arange(cx - 0.5, cx + 0.5, 0.25)
         for y in np.arange(cy - 0.5, cy + 0.5, 0.25)
         for z in np.arange(0.05, 5.0, 0.25)]
    )
    y = np.linspace(-7, 7, 11)
    wp = np.stack(
        [rng.uniform(-1.5, 1.5, 11), y, rng.uniform(1.5, 3, 11)], -1
    )
    cfg = OptimizerConfig(iters_step2=10)
    assert sk.supports(map_cfg.grid_shape, 300, 27, cfg)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    batch = solve_mod.Scenario(*jax.tree.map(lambda a: a[None], scn))
    s_ref = solve_mod.solve_batch(batch, cfg=cfg, steps=(2,),
                                  record_trace=False)
    s_k = solve_mod.solve_batch_kernel(batch, cfg=cfg, steps=(2,),
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(s_k.n_accept),
                                  np.asarray(s_ref.n_accept))
    p1, _ = poly.sample_uniform(s_ref.coeff[0], s_ref.T[0], 100)
    p2, _ = poly.sample_uniform(s_k.coeff[0], s_k.T[0], 100)
    assert float(jnp.max(jnp.abs(p1 - p2))) < 1e-3


def test_solve_batch_kernel_multitile_grid():
    """Grids over 128 cells pad to lane-tile multiples (npx/npy = 256):
    the kernel must match the vmap path on a 160x160x12 map."""
    from grad_traj_optimization_tpu.ops import solve_pallas as sk

    map_cfg = MapConfig(
        origin=(-20.0, -20.0, 0.0), resolution=0.25,
        map_size=(40.0, 40.0, 3.0),
    )
    assert map_cfg.grid_shape == (160, 160, 12)
    rng = np.random.default_rng(4)
    obss = np.array(
        [(x, y, z)
         for cx, cy in rng.uniform(-12, 12, (5, 2))
         for x in np.arange(cx - 0.6, cx + 0.6, 0.25)
         for y in np.arange(cy - 0.6, cy + 0.6, 0.25)
         for z in np.arange(0.05, 3.0, 0.25)]
    )
    wp = np.stack(
        [rng.uniform(-2, 2, 5), np.linspace(-14, 14, 5),
         rng.uniform(1.0, 2.0, 5)], -1,
    )
    cfg = OptimizerConfig(iters_step2=6)
    assert sk.supports(map_cfg.grid_shape, 120, 12, cfg)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    batch = solve_mod.Scenario(*jax.tree.map(lambda a: a[None], scn))
    s_ref = solve_mod.solve_batch(batch, cfg=cfg, steps=(2,),
                                  record_trace=False)
    s_k = solve_mod.solve_batch_kernel(batch, cfg=cfg, steps=(2,),
                                       interpret=True)
    np.testing.assert_array_equal(np.asarray(s_k.n_accept),
                                  np.asarray(s_ref.n_accept))
    p1, _ = poly.sample_uniform(s_ref.coeff[0], s_ref.T[0], 100)
    p2, _ = poly.sample_uniform(s_k.coeff[0], s_k.T[0], 100)
    assert float(jnp.max(jnp.abs(p1 - p2))) < 1e-3


def test_va_solve_matches_float64_oracle():
    """End-to-end solve with alpha_v/alpha_a on vs the golden f64 oracle
    running the same descent — the VERDICT item-3 acceptance gate."""
    from grad_traj_optimization_tpu.reference_impl import golden

    map_cfg, obss, wp = _small_scene()
    # click-launch scales: see test_native_solve_va_penalties_match_jax
    cfg = OptimizerConfig(
        iters_step2=40, alpha_v=0.1, v0=2.5, alpha_a=0.1, a0=3.5
    )
    gm = golden.GoldenSDFMap(
        map_cfg.origin, map_cfg.resolution, map_cfg.map_size
    )
    for p in obss:
        gm.set_occupancy(p)
    gm.update_esdf()
    gopt = golden.GoldenOptimizer(gm, cfg)
    gopt.setup(wp)
    dp_g, coeff_g = gopt.optimize(steps=(2,))

    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(2,))
    assert int(sol.status) == solve_mod.STATUS_OK
    T = np.asarray(sol.T, np.float64)
    ts = np.linspace(0.0, T.sum(), 120)
    p_j = np.asarray(poly.evaluate(sol.coeff, sol.T, jnp.asarray(
        ts, jnp.float32)))
    # golden trajectory sampled with the same basis
    p_g = np.asarray(poly.evaluate(
        jnp.asarray(coeff_g, jnp.float32),
        jnp.asarray(gopt.times, jnp.float32),
        jnp.asarray(ts, jnp.float32),
    ))
    assert float(np.max(np.abs(p_j - p_g))) < 1e-3


def test_min_snap_seed_is_smoothness_optimal():
    """qp.min_snap_dp satisfies the QP optimality condition
    Rpp dp* + Rfp^T df = 0 (qp_generator.cpp:242-315)."""
    from grad_traj_optimization_tpu.core import qp

    _, _, wp = _small_scene()
    wp = jnp.asarray(wp, jnp.float32)
    T = qp.allocate_times(wp, 1.8, 0.3)
    Df, _ = qp.straight_line_d(wp)
    dep = qp.build_dep(T)
    dp = qp.min_snap_dp(Df, dep.Rpp, dep.Rfp)
    resid = jnp.einsum("pq,xq->xp", dep.Rpp, dp) + jnp.einsum(
        "fp,xf->xp", dep.Rfp, Df
    )
    scale = float(jnp.max(jnp.abs(jnp.einsum("fp,xf->xp", dep.Rfp, Df))))
    assert float(jnp.max(jnp.abs(resid))) < 1e-3 * max(scale, 1.0)


def test_nonmonotone_min_snap_matches_float64_oracle():
    """accept_window > 1 + min_snap seed: the f32 solve still tracks the
    float64 oracle (same descent decisions) within the parity budget."""
    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(
        iters_step1=6, iters_step2=15, accept_window=4,
        seed_mode="min_snap",
    )
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(2,))

    gm = golden.GoldenSDFMap(
        map_cfg.origin, map_cfg.resolution, map_cfg.map_size
    )
    for p in obss:
        gm.set_occupancy(p)
    gm.update_esdf()
    gopt = golden.GoldenOptimizer(gm, cfg)
    gopt.setup(wp)
    _, coeff_g = gopt.optimize(steps=(2,))

    T = np.asarray(sol.T, np.float64)
    ts = np.linspace(1e-3, T.sum() - 1e-3, 150)
    pos_j = np.asarray(
        poly.evaluate(sol.coeff, sol.T, jnp.asarray(ts, jnp.float32))
    )
    edges = np.cumsum(T)
    pos_g = np.zeros((len(ts), 3))
    for i, t in enumerate(ts):
        s = min(int(np.searchsorted(edges, t, side="right")), len(T) - 1)
        tl = t - (edges[s - 1] if s > 0 else 0.0)
        basis = np.array([tl**j for j in range(6)])
        pos_g[i] = coeff_g[s] @ basis
    dev = np.abs(pos_j - pos_g).max()
    assert dev < 1e-3, f"positional deviation {dev} m >= 1e-3"


def test_dual_seed_matches_float64_oracle():
    """seed_mode='dual': the golden oracle now races both seeds with the
    same budgets (ADVICE round-1 item) — the f32 TURBO-style solve must
    track it within the parity budget."""
    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(
        iters_step1=4, iters_step2=15, accept_window=4,
        seed_mode="dual", dual_ms_iters=8,
    )
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(scn, cfg=cfg, steps=(2,))

    gm = golden.GoldenSDFMap(
        map_cfg.origin, map_cfg.resolution, map_cfg.map_size
    )
    for p in obss:
        gm.set_occupancy(p)
    gm.update_esdf()
    gopt = golden.GoldenOptimizer(gm, cfg)
    gopt.setup(wp)
    _, coeff_g = gopt.optimize(steps=(2,))

    T = np.asarray(sol.T, np.float64)
    ts = np.linspace(1e-3, T.sum() - 1e-3, 150)
    pos_j = np.asarray(
        poly.evaluate(sol.coeff, sol.T, jnp.asarray(ts, jnp.float32))
    )
    edges = np.cumsum(T)
    pos_g = np.zeros((len(ts), 3))
    for i, t in enumerate(ts):
        s = min(int(np.searchsorted(edges, t, side="right")), len(T) - 1)
        tl = t - (edges[s - 1] if s > 0 else 0.0)
        basis = np.array([tl**j for j in range(6)])
        pos_g[i] = coeff_g[s] @ basis
    dev = np.abs(pos_j - pos_g).max()
    assert dev < 1e-3, f"positional deviation {dev} m >= 1e-3"


def test_nonmonotone_kernel_matches_reference_path():
    """The whole-descent kernel's nonmonotone branch (interpret mode)
    reproduces descent.minimize_batch decisions."""
    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(iters_step1=4, iters_step2=10, accept_window=4)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    batch = solve_mod.Scenario(
        dist=scn.dist[None],
        origin=scn.origin[None],
        resolution=scn.resolution[None],
        waypoints=jnp.asarray(wp, jnp.float32)[None],
    )
    s_ref = solve_mod.solve_batch(
        batch, cfg=cfg, steps=(1, 2), record_trace=True
    )
    s_k = solve_mod.solve_batch_kernel(
        batch, cfg=cfg, steps=(1, 2), interpret=True
    )
    np.testing.assert_array_equal(
        np.asarray(s_k.n_accept), np.asarray(s_ref.n_accept)
    )
    np.testing.assert_allclose(
        np.asarray(s_k.cost_trace), np.asarray(s_ref.cost_trace),
        rtol=5e-3,
    )
    p1, _ = poly.sample_uniform(s_ref.coeff[0], s_ref.T[0], 100)
    p2, _ = poly.sample_uniform(s_k.coeff[0], s_k.T[0], 100)
    assert float(jnp.max(jnp.abs(p1 - p2))) < 1e-3


def test_dual_seed_picks_per_lane_best():
    """seed_mode='dual' returns exactly the per-lane better of the two
    arms (reference seed, min-snap seed with its own budget)."""
    import dataclasses

    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(
        iters_step1=4, iters_step2=12, accept_window=4,
        seed_mode="dual", dual_ms_iters=8,
    )
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    wps = np.stack([wp, wp + np.array([0.2, 0.0, 0.1])], axis=0)
    batch = solve_mod.Scenario(
        dist=jnp.stack([scn.dist, scn.dist]),
        origin=jnp.broadcast_to(scn.origin, (2, 3)),
        resolution=jnp.broadcast_to(scn.resolution, (2,)),
        waypoints=jnp.asarray(wps, jnp.float32),
    )
    s_dual = solve_mod.solve_batch(batch, cfg=cfg, steps=(2,))
    cfg_a = dataclasses.replace(cfg, seed_mode="reference")
    cfg_b = dataclasses.replace(
        cfg, seed_mode="min_snap", iters_step2=8
    )
    s_a = solve_mod.solve_batch(batch, cfg=cfg_a, steps=(2,))
    s_b = solve_mod.solve_batch(batch, cfg=cfg_b, steps=(2,))
    best = np.minimum(np.asarray(s_a.cost), np.asarray(s_b.cost))
    np.testing.assert_allclose(np.asarray(s_dual.cost), best, rtol=1e-6)
    for b in range(2):
        src = s_a if s_a.cost[b] <= s_b.cost[b] else s_b
        np.testing.assert_allclose(
            np.asarray(s_dual.coeff[b]), np.asarray(src.coeff[b]),
            rtol=1e-6,
        )
    assert np.all(np.asarray(s_dual.status) == solve_mod.STATUS_OK)


def test_turbo_presets_are_dual_seed():
    """The shipped turbo presets must stay valid configs on the kernel
    path (hashable, dual-seed, within the kernel's support envelope)."""
    from grad_traj_optimization_tpu.config import (
        TURBO_CONFIG, TURBO_FAST_CONFIG,
    )

    for cfg in (TURBO_CONFIG, TURBO_FAST_CONFIG):
        hash(cfg)
        assert cfg.seed_mode == "dual"
        assert cfg.accept_window == 8
        assert cfg.dual_ms_iters > 0
    # the measured budgets: 70+30 (quality) and 30+30 (fast)
    assert TURBO_CONFIG.iters_step2 == 70
    assert TURBO_FAST_CONFIG.iters_step2 == 30


def test_solve_server_microbatching():
    """serving.SolveServer: concurrent submits aggregate into one padded
    batch; per-request Solutions match the direct single-lane solve; the
    shape contract rejects mismatched scenarios."""
    import pytest
    from grad_traj_optimization_tpu import serving

    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(iters_step1=3, iters_step2=8)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    rng = np.random.default_rng(0)
    scns = []
    for _ in range(6):
        w = np.asarray(wp, np.float64).copy()
        w[1:-1, :2] += rng.uniform(-0.1, 0.1, (len(wp) - 2, 2))
        scns.append(
            solve_mod.Scenario(
                dist=scn.dist,  # SAME array -> shared-map batch
                origin=scn.origin,
                resolution=scn.resolution,
                waypoints=jnp.asarray(w, jnp.float32),
            )
        )

    server = serving.SolveServer(cfg=cfg, max_batch=8, max_wait_ms=50.0)
    futs = [server.submit(s) for s in scns]
    sols = [f.result(timeout=120) for f in futs]

    # shape-contract rejection
    wp_bad = np.vstack([wp, wp[-1] + 0.5])
    scn_bad = solve_mod.Scenario(
        dist=scn.dist, origin=scn.origin, resolution=scn.resolution,
        waypoints=jnp.asarray(wp_bad, jnp.float32),
    )
    with pytest.raises(ValueError, match="contract"):
        server.submit(scn_bad)
    server.shutdown()

    st = server.stats.summary()
    assert st["n_requests"] == 6
    assert st["n_batches"] >= 1
    # padded to the 8-bucket when aggregated into one batch
    if st["n_batches"] == 1:
        assert server.stats.n_padded_lanes == 2

    # every served Solution matches its direct single-lane solve
    for s, sol in zip(scns, sols):
        batch1 = solve_mod.Scenario(
            dist=s.dist[None], origin=s.origin[None],
            resolution=s.resolution[None], waypoints=s.waypoints[None],
        )
        ref = solve_mod.solve_batch(
            batch1, cfg=cfg, steps=(2,), record_trace=False
        )
        assert int(sol.status) == 0
        np.testing.assert_allclose(
            np.asarray(sol.coeff), np.asarray(ref.coeff[0]),
            rtol=1e-5, atol=1e-5,
        )


def test_solve_kino_batch_kernel_matches_fallback():
    """The kino-seeded batch (setKinoPath path) must produce the same
    iterates through the whole-descent kernel (T/Df/dp0 overrides,
    interpret mode) as through the vmapped JAX fallback."""
    import numpy as np

    from grad_traj_optimization_tpu import fixtures
    from grad_traj_optimization_tpu.search import kinodynamic as kd

    rng = np.random.default_rng(4)
    cases, seeds = [], []
    # keep only cases whose search REACHES (unreached lanes carry
    # degenerate branch states whose refinement is numerically chaotic
    # on both paths — not a meaningful comparison)
    while len(cases) < 2:
        c = fixtures.random_search_case(rng)
        if c is None:
            continue
        s6 = np.concatenate([c[3], np.zeros(3)]).astype(np.float32)
        g6 = np.concatenate([c[4], np.zeros(3)]).astype(np.float32)
        r1 = kd.search(c[0], jnp.asarray(c[1], jnp.float32), c[2],
                       s6, g6, lookup="gather")
        if bool(r1.reached):
            cases.append(c)
    dists = np.stack([c[0] for c in cases])
    origins = np.stack([c[1] for c in cases]).astype(np.float32)
    res = cases[0][2]
    starts = np.stack(
        [np.concatenate([c[3], np.zeros(3)]) for c in cases]
    ).astype(np.float32)
    goals = np.stack(
        [np.concatenate([c[4], np.zeros(3)]) for c in cases]
    ).astype(np.float32)
    rb = kd.search_batch(dists, origins, res, starts, goals,
                         lookup="gather")
    p6, v6, a6, t6 = kd.resample_knots_batch(
        rb.pos, rb.vel, rb.acc, rb.times, 6
    )
    cfg = OptimizerConfig(iters_step2=4)
    ress = np.full((2,), res, np.float32)
    sol_fb = solve_mod.solve_kino_batch(
        dists, origins, ress, p6, v6, a6, t6, cfg=cfg, steps=(2,)
    )
    T = jnp.asarray(t6, jnp.float32)
    Df, dp0 = jax.vmap(solve_mod.qp.kino_d)(
        jnp.asarray(p6, jnp.float32), jnp.asarray(v6, jnp.float32),
        jnp.asarray(a6, jnp.float32),
    )
    scn = solve_mod.Scenario(
        dist=jnp.asarray(dists), origin=jnp.asarray(origins),
        resolution=jnp.asarray(ress),
        waypoints=jnp.asarray(p6, jnp.float32),
    )
    sol_k = solve_mod.solve_batch_kernel(
        scn, cfg=cfg, steps=(2,), interpret=True, dp0=dp0, T=T, Df=Df
    )
    # same discipline as test_solve_batch_kernel_matches_reference_path:
    # the kernel's bf16 hi/mid grid planes are ~1e-4 m faithful, so
    # compare costs and sampled trajectories at the parity budget
    np.testing.assert_allclose(
        np.asarray(sol_fb.cost), np.asarray(sol_k.cost), rtol=5e-3
    )
    for b in range(2):
        p1, _ = poly.sample_uniform(sol_fb.coeff[b], sol_fb.T[b], 100)
        p2, _ = poly.sample_uniform(sol_k.coeff[b], sol_k.T[b], 100)
        assert float(jnp.max(jnp.abs(p1 - p2))) < 1e-3
    np.testing.assert_array_equal(
        np.asarray(sol_fb.T), np.asarray(sol_k.T)
    )


def test_solve_kino_batch_race_picks_per_lane_winner():
    """Round-5: the batched duration race returns, per lane, the
    lower-cost converged arm (never worse than the 1.0-stretch arm on
    converged lanes)."""
    from grad_traj_optimization_tpu.search import kinodynamic as kd

    rng = np.random.default_rng(4)
    from grad_traj_optimization_tpu import fixtures

    cases = []
    while len(cases) < 3:
        c = fixtures.random_search_case(rng)
        if c is not None:
            cases.append(c)
    dists = np.stack([c[0] for c in cases])
    origins = np.stack([c[1] for c in cases]).astype(np.float32)
    res = cases[0][2]
    starts = np.stack(
        [np.concatenate([c[3], np.zeros(3)]) for c in cases]
    ).astype(np.float32)
    goals = np.stack(
        [np.concatenate([c[4], np.zeros(3)]) for c in cases]
    ).astype(np.float32)
    r = kd.search_batch(dists, origins, res, starts, goals,
                        lookup="gather", max_iters=12, beam=32)
    p6, v6, a6, t6 = kd.resample_knots_batch(r.pos, r.vel, r.acc,
                                             r.times, 6)
    ress = np.full((3,), res, np.float32)
    cfg = OptimizerConfig(iters_step2=15)
    base = solve_mod.solve_kino_batch(
        dists, origins, ress, p6, v6, a6, t6, cfg=cfg, steps=(2,)
    )
    raced = solve_mod.solve_kino_batch_race(
        dists, origins, ress, p6, v6, a6, t6,
        stretches=(1.0, 1.2), cfg=cfg, steps=(2,),
    )
    b_c = np.asarray(base.cost)
    r_c = np.asarray(raced.cost)
    ok = (np.asarray(base.status) == 0) & (np.asarray(raced.status) == 0)
    assert np.all(r_c[ok] <= b_c[ok] + 1e-5)


def test_solve_server_bucket_decomposition():
    """Round-5: a batch between pow2 buckets decomposes into multiple
    groups (less dead-lane padding) and every request still gets its
    own correct Solution."""
    from grad_traj_optimization_tpu import serving

    map_cfg, obss, wp = _small_scene()
    cfg = OptimizerConfig(iters_step1=2, iters_step2=5)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    rng = np.random.default_rng(1)
    n = 6
    scns = []
    for _ in range(n):
        w = np.asarray(wp, np.float64).copy()
        w[1:-1, :2] += rng.uniform(-0.1, 0.1, (len(wp) - 2, 2))
        scns.append(solve_mod.Scenario(
            dist=scn.dist, origin=scn.origin,
            resolution=scn.resolution,
            waypoints=jnp.asarray(w, jnp.float32),
        ))

    # bucket_floor=2 makes n=6 decompose as [4, 2] (vs the single
    # 8-bucket, pad 2) and the 6 queued requests drain as ONE dispatch
    # (max_batch=8) — so the multi-group lane routing in _dispatch
    # (offsets, per-group pads, concatenated download) is what runs
    server = serving.SolveServer(cfg=cfg, max_batch=8,
                                 max_wait_ms=100.0, bucket_floor=2)
    groups = server._bucket_groups(6)
    assert len(groups) >= 2 and sum(groups) >= 6
    futs = [server.submit(s) for s in scns]
    sols = [f.result(timeout=300) for f in futs]
    server.shutdown()
    assert all(int(s.status) == 0 for s in sols)
    # each request's waypoints round-trip correctly (lane routing
    # across groups is the thing under test)
    for s, q in zip(scns, sols):
        direct = solve_mod.solve(
            solve_mod.Scenario(
                dist=scn.dist, origin=scn.origin,
                resolution=scn.resolution, waypoints=s.waypoints,
            ), cfg=cfg, steps=(2,),
        )
        np.testing.assert_allclose(
            np.asarray(q.coeff), np.asarray(direct.coeff), atol=2e-4
        )


def test_mission_server_end_to_end():
    """Round-5 MissionServer: concurrent full-mission requests batch
    through plan_batch; each future resolves with its own refined
    solution + reached/ok flags."""
    from grad_traj_optimization_tpu import serving
    from grad_traj_optimization_tpu import fixtures

    rng = np.random.default_rng(23)
    c = None
    while c is None:
        c = fixtures.random_search_case(rng)
    dist, origin, res, s, g = c[:5]
    cfg = OptimizerConfig(iters_step2=8)
    srv = serving.MissionServer(
        dist, origin, res, cfg=cfg, max_batch=4, max_wait_ms=50.0,
        beam=16, max_iters=10, retries=0, lookup="gather",
        stretches=(1.0,),
    )
    try:
        s6 = np.concatenate([s, np.zeros(3)])
        g6 = np.concatenate([g, np.zeros(3)])
        futs = [srv.submit(s6 + [0, 0.1 * i, 0, 0, 0, 0], g6)
                for i in range(3)]
        outs = [f.result(timeout=300) for f in futs]
    finally:
        srv.shutdown()
    assert sum(o["reached"] for o in outs) >= 2
    for o in outs:
        assert o["solution"].coeff.ndim == 3  # batch axis stripped
    st = srv.stats.summary()
    assert st["n_requests"] == 3

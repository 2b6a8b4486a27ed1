"""RRT* seeding, checkpointing, visualization export."""

import numpy as np
import jax.numpy as jnp

from grad_traj_optimization_tpu import checkpoint, viz
from grad_traj_optimization_tpu import solver as solve_mod
from grad_traj_optimization_tpu.config import MapConfig, OptimizerConfig
from grad_traj_optimization_tpu.fields import sdf
from grad_traj_optimization_tpu.search import rrt

from conftest import gap_wall_map


def _wall_map():
    return gap_wall_map(-0.8, 0.8)


def test_rrt_finds_corridor_through_gap():
    dist, origin, res = _wall_map()
    result = rrt.plan(
        dist, origin, res,
        start=np.array([0.0, -3.0, 2.0]), goal=np.array([0.0, 3.0, 2.0]),
        max_iters=1500, seed=1,
    )
    assert result.reached
    assert result.cost >= 6.0  # at least the straight-line distance
    assert result.n_nodes > 10
    # corridor property: consecutive safe balls overlap
    p, r = result.path, result.radii
    for a in range(len(p) - 1):
        gap = np.linalg.norm(p[a + 1] - p[a])
        assert gap <= r[a] + r[a + 1] + 1e-6
    # every waypoint has clearance
    for a in range(len(p)):
        d = rrt._dist_at(dist, origin, res, p[a])
        assert d >= 0.29


def _gap_wall_map(gap_center_x):
    """A y=0 wall with one gap of half-width 0.8 around gap_center_x."""
    return gap_wall_map(gap_center_x - 0.8, gap_center_x + 0.8)


def test_rrt_incremental_map_update_repairs_tree():
    """RRTpathReEvaluate/ReConnect/treeRepair analogue: a map change that
    closes the flown corridor invalidates the stale branch, and continued
    growth re-routes through the new gap (path_finder.cpp:1065-1554)."""
    dist_a, origin, res = _gap_wall_map(0.0)
    planner = rrt.RRTPlanner(
        dist_a, origin, res,
        start=np.array([0.0, -3.0, 2.0]), goal=np.array([0.0, 3.0, 2.0]),
        seed=1,
    )
    assert planner.grow(1500)
    before = planner.result()
    assert before.reached
    # the original path threads the x=0 gap
    assert np.min(np.abs(before.path[:, 0])) < 0.9

    # wall shifts: the x=0 gap closes, a new one opens at x=3
    dist_b, _, _ = _gap_wall_map(3.0)
    planner.update_map(dist_b, repair_iters=100)
    # stale corridor nodes near (0, 0) must be gone
    for i, c in enumerate(planner.centers):
        if planner.valid[i] and abs(c[1]) < 0.4:
            assert rrt._dist_at(dist_b, origin, res, c) >= 0.29
    if not np.isfinite(planner.best_cost):
        assert planner.grow(2500)
    after = planner.result()
    assert after.reached
    # the repaired path threads the new gap, not the closed one
    crossing = after.path[np.abs(after.path[:, 1]) < 0.8]
    assert crossing.size and np.all(np.abs(crossing[:, 0] - 3.0) < 1.6)
    for a in range(len(after.path) - 1):
        gap = np.linalg.norm(after.path[a + 1] - after.path[a])
        assert gap <= after.radii[a] + after.radii[a + 1] + 1e-6
    for p in after.path:
        assert rrt._dist_at(dist_b, origin, res, p) >= 0.29


def test_rrt_reset_root_commits_and_recasts_costs():
    """resetRoot analogue (path_finder.cpp:302-375): committing a point
    along the best path advances the root, drops the nodes behind it, and
    recasts costs from the new root."""
    dist, origin, res = _gap_wall_map(0.0)
    planner = rrt.RRTPlanner(
        dist, origin, res,
        start=np.array([0.0, -3.0, 2.0]), goal=np.array([0.0, 3.0, 2.0]),
        seed=1,
    )
    assert planner.grow(1500)
    path = planner.result().path
    n_valid_before = int(np.count_nonzero(planner.valid))
    commit = path[1]  # just past the start node, well short of the goal
    assert planner.reset_root(commit)
    assert not planner.commit_end
    assert planner.parents[planner.root] == -1
    assert planner.costs[planner.root] == 0.0
    after = planner.result()
    assert after.reached
    # the new root's ball contains the commit point
    assert (
        np.linalg.norm(after.path[0] - commit)
        < planner.radii[planner.root]
    )
    assert int(np.count_nonzero(planner.valid)) <= n_valid_before
    # committing inside the goal-reaching ball flags terminal state
    planner.reset_root(planner.goal)
    assert planner.commit_end


def test_rrt_update_map_unchanged_keeps_path():
    dist, origin, res = _gap_wall_map(0.0)
    planner = rrt.RRTPlanner(
        dist, origin, res,
        start=np.array([0.0, -3.0, 2.0]), goal=np.array([0.0, 3.0, 2.0]),
        seed=1,
    )
    assert planner.grow(1500)
    cost_before = planner.best_cost
    assert planner.update_map(dist, repair_iters=0)
    assert planner.result().reached
    assert planner.best_cost <= cost_before + 1e-9


def test_rrt_unreachable_reports_failure():
    # a full wall with no gap (empty gap interval)
    dist, origin, res = gap_wall_map(1.0, 1.0)
    result = rrt.plan(
        dist, origin, res,
        start=np.array([0.0, -3.0, 2.0]), goal=np.array([0.0, 3.0, 2.0]),
        max_iters=400, seed=2,
    )
    assert not result.reached


def test_checkpoint_roundtrip(tmp_path):
    map_cfg = MapConfig(
        origin=(-5.0, -5.0, 0.0), resolution=0.5, map_size=(10.0, 10.0, 4.0)
    )
    wp = np.array([[0, -2, 2], [0.5, 0, 2], [0, 2, 2]], np.float32)
    scn = solve_mod.make_scenario(wp, np.zeros((0, 3)), map_cfg)
    sol = solve_mod.solve(
        scn, cfg=OptimizerConfig(iters_step2=5), steps=(2,),
        record_trace=False,
    )
    path = checkpoint.save(str(tmp_path / "sol"), sol)
    restored = checkpoint.restore(path, sol)
    np.testing.assert_allclose(
        np.asarray(restored.coeff), np.asarray(sol.coeff)
    )
    np.testing.assert_allclose(np.asarray(restored.T), np.asarray(sol.T))


def test_viz_export(tmp_path):
    map_cfg = MapConfig(
        origin=(-5.0, -5.0, 0.0), resolution=0.5, map_size=(10.0, 10.0, 4.0)
    )
    wp = np.array([[0, -2, 2], [0.5, 0, 2], [0, 2, 2]], np.float32)
    obss = np.array([[1.0, 0.0, z] for z in np.arange(0.25, 4, 0.5)])
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(
        scn, cfg=OptimizerConfig(iters_step2=5), steps=(2,)
    )
    out = viz.export_npz(str(tmp_path / "scene.npz"), sol, scn)
    data = np.load(out)
    assert data["traj"].shape[1] == 3
    assert len(data["segment_times"]) == 2
    assert data["occupied"].shape[1] == 3
    assert np.isfinite(data["cost_trace"]).all()


def test_graft_entry_compiles():
    """The driver compile-checks entry() — keep it importable and jittable
    (guards against internal API renames breaking the entry point)."""
    import jax

    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert int(out.status) == 0


def test_profiling_helpers():
    from grad_traj_optimization_tpu.utils import profiling

    sw = profiling.Stopwatch()
    with sw.section("a"):
        sum(range(1000))
    with sw.section("a"):
        sum(range(1000))
    rep = sw.report()
    assert rep["a"]["count"] == 2 and rep["a"]["total_s"] >= 0

    import jax.numpy as jnp

    r, t = profiling.sync_time(lambda x: x * 2, jnp.ones((8, 8)), n=2)
    assert t >= 0 and float(r[0, 0]) == 2.0


def test_random_scenarios_device_deterministic_and_bounded():
    import jax
    import jax.numpy as jnp
    from grad_traj_optimization_tpu import fixtures

    occ1, wps1 = fixtures.random_scenarios_device(jax.random.key(3), 4)
    occ2, wps2 = fixtures.random_scenarios_device(jax.random.key(3), 4)
    assert occ1.shape == (4, 100, 100, 25)
    np.testing.assert_array_equal(np.asarray(occ1), np.asarray(occ2))
    np.testing.assert_array_equal(np.asarray(wps1), np.asarray(wps2))
    frac = float(jnp.mean(occ1))
    assert 0.001 < frac < 0.1  # plausible obstacle density
    w = np.asarray(wps1)
    assert w[..., 0].min() >= -1.5 and w[..., 0].max() <= 1.5
    assert w[..., 2].min() >= 1.5 and w[..., 2].max() <= 3.0


def _off_center_gap_map():
    """Wall across y=0, two cells thick, gap only at x in (0.8, 2.4)."""
    return gap_wall_map(0.8, 2.4, thickness_cells=2)


def _traj_min_clearance(dist, origin, res, sol, n=300):
    from grad_traj_optimization_tpu.core import poly

    samples, _ = poly.sample_uniform(sol.coeff, sol.T, n)
    return float(
        jnp.min(
            sdf.distance_at(
                jnp.asarray(dist), jnp.asarray(origin, jnp.float32),
                jnp.asarray(res, jnp.float32), samples,
            )
        )
    )


def test_bounds_per_waypoint():
    """penalty.bounds with a per-waypoint bos array (corridor radii)."""
    from grad_traj_optimization_tpu.opt import penalty

    cfg = OptimizerConfig()
    wp = jnp.asarray(np.random.default_rng(0).uniform(-3, 3, (5, 3)),
                     jnp.float32)
    m = 4
    num_dp = 3 * m - 3
    lb0, ub0 = penalty.bounds(wp, num_dp, cfg)
    lb1, ub1 = penalty.bounds(
        wp, num_dp, cfg, bos=jnp.full((m - 1,), cfg.bos, jnp.float32)
    )
    np.testing.assert_allclose(lb0, lb1)
    np.testing.assert_allclose(ub0, ub1)
    bos = jnp.asarray([0.5, 1.0, 2.0], jnp.float32)
    lb2, ub2 = penalty.bounds(wp, num_dp, cfg, bos=bos)
    half = np.asarray(ub2 - lb2) / 2.0
    for i in range(m - 1):
        np.testing.assert_allclose(half[:, 3 * i], float(bos[i]),
                                   rtol=1e-6)
        np.testing.assert_allclose(half[:, 3 * i + 1], cfg.vos, rtol=1e-6)
        np.testing.assert_allclose(half[:, 3 * i + 2], cfg.aos, rtol=1e-6)


def test_rrt_corridor_solves_where_straight_seed_collides():
    """VERDICT r2 item 6: the RRT* corridor (waypoints + radii) is
    consumed by the solver — the corridor-seeded solve clears a map the
    straight-line seed cannot."""
    from grad_traj_optimization_tpu import harness

    dist, origin, res = _off_center_gap_map()
    start = np.array([0.0, -3.0, 2.0])
    goal = np.array([0.0, 3.0, 2.0])
    cfg = OptimizerConfig(iters_step1=10, iters_step2=40)

    # control: a straight 3-waypoint seed pierces the wall and the
    # penalty descent cannot pull it through the off-center gap
    scn = solve_mod.Scenario(
        dist=jnp.asarray(dist),
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.asarray(res, jnp.float32),
        waypoints=jnp.asarray(
            np.stack([start, 0.5 * (start + goal), goal]), jnp.float32
        ),
    )
    sol_straight = solve_mod.solve(scn, cfg=cfg, steps=(1, 2))
    d_straight = _traj_min_clearance(dist, origin, res, sol_straight)

    rec = harness.run_case_rrt(
        0, jnp.asarray(dist), origin, res, start, goal, cfg=cfg,
        steps=(1, 2), rrt_iters=1500, seed=1,
    )
    assert rec.status == 0 and rec.frontend_ok
    assert rec.traj_length_m > 6.0
    # re-solve to get the Solution for the clearance check
    from grad_traj_optimization_tpu.search import rrt as rrt_mod

    res_rrt = rrt_mod.plan(
        dist, origin, res, start, goal, max_iters=1500, seed=1
    )
    wps, bos_wp = rrt_mod.corridor_waypoints(res_rrt)
    scn_rrt = solve_mod.Scenario(
        dist=jnp.asarray(dist),
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.asarray(res, jnp.float32),
        waypoints=jnp.asarray(wps, jnp.float32),
    )
    sol_rrt = solve_mod.solve(
        scn_rrt, cfg=cfg, steps=(1, 2),
        bos_wp=jnp.asarray(bos_wp, jnp.float32),
    )
    d_rrt = _traj_min_clearance(dist, origin, res, sol_rrt)
    assert d_straight <= 0.05, d_straight   # straight seed collides
    assert d_rrt > 0.15, d_rrt              # corridor seed clears

    # the corridor bounds actually bind: every interior waypoint's
    # optimized position stays within its safe-ball radius
    dp = np.asarray(sol_rrt.dp)  # (3, 3m-3)
    n_int = dp.shape[1] // 3
    for i in range(n_int):
        p_opt = dp[:, 3 * i]
        dev = np.linalg.norm(p_opt - wps[1 + i])
        # axis-aligned box with half-width bos -> inf-norm bound
        assert np.max(np.abs(p_opt - wps[1 + i])) <= bos_wp[1 + i] + 1e-5


def test_solve_batch_bos_wp_matches_single():
    """bos_wp threads identically through solve_batch and solve."""
    dist, origin, res = _off_center_gap_map()
    start = np.array([0.0, -3.0, 2.0])
    goal = np.array([0.0, 3.0, 2.0])
    cfg = OptimizerConfig(iters_step1=4, iters_step2=10)
    wps = np.stack([
        start, [1.5, -1.0, 2.0], [1.5, 1.0, 2.0], goal,
    ]).astype(np.float32)
    bos_wp = np.asarray([1.0, 0.7, 0.9, 1.0], np.float32)
    scn1 = solve_mod.Scenario(
        dist=jnp.asarray(dist),
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.asarray(res, jnp.float32),
        waypoints=jnp.asarray(wps),
    )
    sol1 = solve_mod.solve(
        scn1, cfg=cfg, steps=(2,), bos_wp=jnp.asarray(bos_wp)
    )
    B = 3
    scnB = solve_mod.Scenario(
        dist=jnp.asarray(dist)[None],
        origin=jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (B, 3)),
        resolution=jnp.full((B,), res, jnp.float32),
        waypoints=jnp.broadcast_to(jnp.asarray(wps), (B, 4, 3)),
    )
    solB = solve_mod.solve_batch(
        scnB, cfg=cfg, steps=(2,),
        bos_wp=jnp.broadcast_to(jnp.asarray(bos_wp), (B, 4)),
    )
    np.testing.assert_allclose(
        np.asarray(sol1.dp), np.asarray(solB.dp[1]), rtol=0, atol=1e-6
    )


def test_viz_esdf_layers(tmp_path):
    """Layered ESDF rendering (reference sdf_map.cpp:370-421)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    dist, origin, res = _wall_map()
    ax = viz.plot_esdf_layers(dist, origin, res)
    assert len(ax.get_images()) == 8  # one layer per level
    ax2 = viz.plot_esdf_layers(dist, origin, res, z_slice=8, n_layers=4)
    assert len(ax2.get_images()) == 4
    plt.savefig(tmp_path / "esdf.png")
    plt.close("all")


def test_viz_animate_trajectory(tmp_path):
    """Time-swept trajectory animation (display.h:57-158 analogue):
    gif export + frame-dump fallback both produce output."""
    import matplotlib

    matplotlib.use("Agg")

    map_cfg = MapConfig(
        origin=(-5.0, -5.0, 0.0), resolution=0.5,
        map_size=(10.0, 10.0, 4.0),
    )
    wp = np.array([[0, -2, 2], [0.5, 0, 2], [0, 2, 2]], np.float32)
    obss = np.array([[1.0, 0.0, z] for z in np.arange(0.25, 4, 0.5)])
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    sol = solve_mod.solve(
        scn, cfg=OptimizerConfig(iters_step2=5), steps=(2,)
    )
    gif = tmp_path / "traj.gif"
    viz.animate_trajectory(sol, scn, path=str(gif), fps=5, speedup=4.0,
                           n_samples=60)
    assert gif.exists() and gif.stat().st_size > 0
    frames = viz.animate_trajectory(
        sol, scn, path=str(tmp_path / "frames"), fps=5, speedup=8.0,
        n_samples=60,
    )
    import os

    assert len(os.listdir(tmp_path / "frames")) >= 2


def test_solve_batch_polish_matches_single():
    """The dual post-race polish composes identically through the
    batched and single-scenario solve paths."""
    dist, origin, res = _off_center_gap_map()
    wps = np.stack([
        [0.0, -3.0, 2.0], [1.5, -1.0, 2.0], [1.5, 1.0, 2.0],
        [0.0, 3.0, 2.0],
    ]).astype(np.float32)
    cfg = OptimizerConfig(
        iters_step1=4, iters_step2=10, accept_window=4,
        seed_mode="dual", dual_ms_iters=6, dual_ms_window=2,
        polish_iters=5,
    )
    scn1 = solve_mod.Scenario(
        dist=jnp.asarray(dist),
        origin=jnp.asarray(origin, jnp.float32),
        resolution=jnp.asarray(res, jnp.float32),
        waypoints=jnp.asarray(wps),
    )
    sol1 = solve_mod.solve(scn1, cfg=cfg, steps=(2,), record_trace=False)
    B = 2
    scnB = solve_mod.Scenario(
        dist=jnp.asarray(dist)[None],
        origin=jnp.broadcast_to(jnp.asarray(origin, jnp.float32), (B, 3)),
        resolution=jnp.full((B,), res, jnp.float32),
        waypoints=jnp.broadcast_to(jnp.asarray(wps), (B, 4, 3)),
    )
    solB = solve_mod.solve_batch(
        scnB, cfg=cfg, steps=(2,), record_trace=False
    )
    np.testing.assert_allclose(
        np.asarray(sol1.dp), np.asarray(solB.dp[0]), rtol=0, atol=1e-6
    )
    # polish never hurts: cost <= the raw race at the same arms
    cfg0 = OptimizerConfig(
        iters_step1=4, iters_step2=10, accept_window=4,
        seed_mode="dual", dual_ms_iters=6, dual_ms_window=2,
    )
    sol0 = solve_mod.solve(scn1, cfg=cfg0, steps=(2,), record_trace=False)
    assert float(sol1.cost) <= float(sol0.cost) + 1e-6


def test_rrt_trim_passed_drops_backtracking_waypoints():
    """trim_passed removes corridor nodes behind the vehicle (the
    receding-horizon stall: when no path ball contains the flown state,
    resetRoot cannot advance and the traced corridor pins a waypoint
    BEHIND the vehicle — recorded stall geometry from the full-budget
    native-backend flight)."""
    path = np.array([
        [0.0, -3.0, 2.0], [1.87, -0.87, 1.8], [2.36, -0.52, 1.72],
        [2.75, 0.4, 1.33], [2.34, 0.8, 1.6], [0.86, 2.51, 1.98],
        [0.0, 3.0, 2.0],
    ])
    radii = np.array([2.78, 0.78, 0.57, 0.53, 0.34, 2.03, 2.53])
    pos = np.array([2.92, 0.84, 2.05])  # already through the wall gap
    p2, r2 = rrt.trim_passed(path, radii, pos)
    assert len(p2) == len(r2)
    np.testing.assert_array_equal(p2[-1], path[-1])  # goal kept
    # the passed nodes (up to and including the gap crossing at
    # (2.75, 0.4)) are gone
    assert len(p2) <= 3
    for passed in path[:4]:
        assert not any(np.allclose(passed, q) for q in p2)
    # degenerate short paths pass through untouched (minus the root)
    p3, r3 = rrt.trim_passed(path[:2], radii[:2], pos)
    np.testing.assert_array_equal(p3, path[1:2])

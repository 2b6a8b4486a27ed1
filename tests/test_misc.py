"""RRT* seeding, checkpointing, visualization export."""

import numpy as np
import jax.numpy as jnp

from grad_traj_optimization_tpu import checkpoint, viz
from grad_traj_optimization_tpu import solver as solve_mod
from grad_traj_optimization_tpu.config import MapConfig, OptimizerConfig
from grad_traj_optimization_tpu.fields import sdf
from grad_traj_optimization_tpu.search import rrt


def _wall_map():
    origin = np.array([-5.0, -5.0, 0.0])
    res = 0.25
    pts = []
    for x in np.arange(-5.0, 5.0, res):
        for z in np.arange(0.1, 4.0, res):
            if abs(x) > 0.8:
                pts.append((x, 0.0, z))
    occ = sdf.rasterize(
        jnp.asarray(np.array(pts), jnp.float32),
        jnp.asarray(origin, jnp.float32), res, (40, 40, 16),
    )
    return np.asarray(sdf.edt(occ, res)), origin, res


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


def test_rrt_unreachable_reports_failure():
    origin = np.array([-5.0, -5.0, 0.0])
    res = 0.25
    # a full wall with no gap, EDT rebuilt consistently
    pts = [
        (x, 0.0, z)
        for x in np.arange(-5.0, 5.0, res)
        for z in np.arange(0.1, 4.0, res)
    ]
    occ = sdf.rasterize(
        jnp.asarray(np.array(pts), jnp.float32),
        jnp.asarray(origin, jnp.float32), res, (40, 40, 16),
    )
    dist = np.asarray(sdf.edt(occ, res))
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

"""Pallas kernels in interpreter mode vs the jnp fallbacks."""

import numpy as np
import jax
import jax.numpy as jnp

from grad_traj_optimization_tpu.fields import sdf
from grad_traj_optimization_tpu.ops import edt_pallas


def test_minplus_kernel_matches_fallback():
    rng = np.random.default_rng(0)
    f = rng.uniform(0.0, 400.0, size=(37, 50)).astype(np.float32)
    # sprinkle "no obstacle" sentinels
    f[rng.random(f.shape) < 0.3] = 1e12
    out_k = np.asarray(
        edt_pallas.minplus_lines(jnp.asarray(f), interpret=True)
    )
    out_f = np.asarray(sdf._minplus_parabola_lines(jnp.asarray(f)))
    np.testing.assert_allclose(out_k, out_f, rtol=1e-6, atol=1e-3)


def test_minplus_axis_matches():
    rng = np.random.default_rng(1)
    g = rng.uniform(0.0, 100.0, size=(10, 12, 9)).astype(np.float32)
    out_k = np.asarray(edt_pallas.minplus_axis(jnp.asarray(g), 1,
                                               interpret=True))
    out_f = np.asarray(sdf._minplus_axis(jnp.asarray(g), 1))
    np.testing.assert_allclose(out_k, out_f, rtol=1e-6, atol=1e-3)


def test_trilinear_fused_matches_mxu_per_sample():
    """Direct per-sample parity of the fused Pallas lookup (interpret
    mode) against sdf.trilinear_mxu on a REAL distance field, with
    interior, map-edge (clamped corner), and out-of-map queries.

    Tolerance: the fused kernel stores the grid as bf16 hi/mid planes
    (~2^-17 relative value error — see trilinear_pallas.PLANES); on an
    EDT bounded by the map diameter (~30 m) that is <= ~5e-4 m on d and
    proportionally on gradients (1/res amplification)."""
    import numpy as np
    from grad_traj_optimization_tpu.fields import sdf
    from grad_traj_optimization_tpu.ops import trilinear_pallas as tp

    rng = np.random.default_rng(11)
    nx, ny, nz = 100, 100, 25
    res = 0.2
    origin = jnp.asarray([-10.0, -10.0, 0.0], jnp.float32)
    occ = (rng.random((nx, ny, nz)) < 0.002).astype(np.float32)
    dist = sdf.edt(jnp.asarray(occ), res)  # real EDT incl. FREE caps
    B, S = 3, 180

    interior = rng.uniform(-9.5, 9.5, (B, S - 40, 3)) * [1, 1, 0.25]
    edges = rng.uniform(-10.2, 10.2, (B, 20, 3))  # straddle the faces
    oob = rng.uniform(11.0, 14.0, (B, 20, 3)) * rng.choice(
        [-1.0, 1.0], (B, 20, 3)
    )
    pos = jnp.asarray(
        np.concatenate([interior, edges, oob], axis=1), jnp.float32
    )
    grids = jnp.broadcast_to(dist, (B, nx, ny, nz))
    orgs = jnp.broadcast_to(origin, (B, 3))
    ress = jnp.full((B,), res, jnp.float32)

    gp = tp.prep_grids(grids)
    d_f, g_f = tp.trilinear_fused_prepped(
        gp, (nx, ny, nz), orgs, ress, pos, interpret=True
    )
    d_m, g_m = jax.vmap(lambda g, o, r, p: sdf.trilinear_mxu(g, o, r, p))(
        grids, orgs, ress, pos
    )
    np.testing.assert_allclose(
        np.asarray(d_f), np.asarray(d_m), atol=5e-4, rtol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_m), atol=5e-3, rtol=2e-5
    )
    # out-of-map sentinel semantics are exact
    d_oob = np.asarray(d_f)[:, -20:]
    assert np.all(d_oob == -1.0)
    assert np.all(np.asarray(g_f)[:, -20:] == 0.0)


def test_solve_kernel_variant_lowerings_match():
    """The window-chunk-granularity (win_zc) and MXU-lane-reduce (yred)
    experiment variants are pure lowering changes: interpret-mode
    outputs must be bitwise-identical to the baseline kernel."""
    import numpy as np
    from grad_traj_optimization_tpu import solver as solve_mod
    from grad_traj_optimization_tpu.config import (
        MapConfig, OptimizerConfig,
    )
    from grad_traj_optimization_tpu.ops import solve_pallas as sk

    map_cfg = MapConfig(
        origin=(-4.0, -4.0, 0.0), resolution=0.25,
        map_size=(8.0, 8.0, 6.0),
    )
    obss = np.array(
        [(x, 0.0, z)
         for x in np.arange(-2.0, 2.0, 0.25)
         for z in np.arange(0.1, 6.0, 0.25)
         if abs(x) > 0.5]
    )
    wp = np.array(
        [[0.0, -3.0, 2.0], [0.2, -1.0, 2.4], [0.0, 1.0, 2.0],
         [0.0, 3.0, 2.2]]
    )
    cfg = OptimizerConfig(iters_step2=6)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    batch = solve_mod.Scenario(*jax.tree.map(lambda x: x[None], scn))
    kargs, _ = solve_mod.kernel_inputs(batch, cfg)
    base = sk.descend_fused(*kargs, ((2, 6),), cfg, interpret=True,
                            zwin=2)
    for kw in (dict(zwin=2, win_zc=4), dict(zwin=3, win_zc=3),
               dict(zwin=2, yred="mxu"),
               dict(zwin=2, win_zc=4, yred="mxu")):
        out = sk.descend_fused(*kargs, ((2, 6),), cfg, interpret=True,
                               **kw)
        np.testing.assert_array_equal(np.asarray(out[0]),
                                      np.asarray(base[0]))
        np.testing.assert_array_equal(np.asarray(out[1]),
                                      np.asarray(base[1]))
    # qpfuse reassociates the z matvec into the gradient dot: equal to
    # f32 rounding (not bitwise), same accept sequence
    out = sk.descend_fused(*kargs, ((2, 6),), cfg, interpret=True,
                           zwin=2, qpfuse=True)
    np.testing.assert_array_equal(np.asarray(out[2]),
                                  np.asarray(base[2]))  # n_accept
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(base[0]),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(base[1]),
                               rtol=1e-4)


def test_solve_kernel_zwin_is_exact():
    """Dynamic z-window: excluded columns have identically zero
    z-weights, so the lookup is exact in exact arithmetic (the pure-JAX
    property test below is bitwise, covering both the fitting-window
    and the full-depth-fallback branches).  The compiled kernel may
    reassociate reductions, so whole-solve outputs are compared at the
    standard kernel-vs-path tolerances."""
    import numpy as np
    from grad_traj_optimization_tpu import solver as solve_mod
    from grad_traj_optimization_tpu.config import (
        MapConfig, OptimizerConfig,
    )
    from grad_traj_optimization_tpu.ops import solve_pallas as sk

    map_cfg = MapConfig(
        origin=(-4.0, -4.0, 0.0), resolution=0.25,
        map_size=(8.0, 8.0, 6.0),
    )
    obss = np.array(
        [(x, 0.0, z)
         for x in np.arange(-2.0, 2.0, 0.25)
         for z in np.arange(0.1, 6.0, 0.25)
         if abs(x) > 0.5]
    )
    wp = np.array(
        [[0.0, -3.0, 2.0], [0.2, -1.0, 2.4], [0.0, 1.0, 2.0],
         [0.0, 3.0, 2.2]]
    )
    cfg = OptimizerConfig(iters_step2=8)
    scn = solve_mod.make_scenario(wp, obss, map_cfg)
    batch = jax.tree.map(lambda x: x[None], scn)
    batch = solve_mod.Scenario(*batch)
    kargs, _ = solve_mod.kernel_inputs(batch, cfg)
    out_skip = sk.descend_fused(
        *kargs, ((2, 8),), cfg, interpret=True, zwin=2
    )
    out_full = sk.descend_fused(
        *kargs, ((2, 8),), cfg, interpret=True, zwin=0
    )
    np.testing.assert_allclose(
        np.asarray(out_skip[1]), np.asarray(out_full[1]), rtol=5e-3
    )  # final cost
    np.testing.assert_allclose(
        np.asarray(out_skip[0]), np.asarray(out_full[0]), atol=1e-3
    )  # dp

    # pure-JAX bitwise property test of the skip logic itself
    from grad_traj_optimization_tpu.ops import trilinear_pallas as tp

    gp = kargs[0]
    grid_shape = batch.dist.shape[1:]
    nz = grid_shape[2]
    zc = tp._pick_zc(nz)
    nzp = tp._round_up(nz, zc)
    # full (1, 16) misc layout: [origin(3), res, c_ff, crop offset(3),
    # FULL-map extents(3), pad] — lanes 8:11 MUST hold the grid shape or
    # the in-bounds clips degenerate and the comparison is vacuous
    misc = np.zeros((1, 16), np.float32)
    misc[0, :3] = map_cfg.origin
    misc[0, 3] = map_cfg.resolution
    misc[0, 8:11] = grid_shape
    misc = jnp.asarray(misc)
    rng = np.random.default_rng(0)
    valid = jnp.ones((tp.SP, 1), bool)
    n_fit = 0
    for trial in range(20):
        # alternate narrow z-bands (window fits) and full-range
        # positions (fallback branch)
        zlo, zhi = ((1.0, 2.5) if trial % 2 == 0 else (-0.5, 6.5))
        pos = jnp.asarray(
            rng.uniform(
                [-4.5, -4.5, zlo], [4.5, 4.5, zhi], size=(tp.SP, 3)
            ).astype(np.float32)
        )
        d1, g1 = sk._lookup(gp, pos, misc, grid_shape, nzp, zc,
                            zwin=0, functional=True)
        d2, g2 = sk._lookup(gp, pos, misc, grid_shape, nzp, zc,
                            zwin=2, valid=valid, functional=True)
        n_fit += int(trial % 2 == 0)
        # non-degeneracy guard: a mis-built misc (e.g. zero full-map
        # extents) collapses the lookup to constants and makes the
        # bitwise comparison vacuous
        assert float(np.asarray(d1).std()) > 0.0
        np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))
        np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert n_fit > 0

"""QP seeding layer vs the float64 dense golden construction."""

import numpy as np
import jax.numpy as jnp

from grad_traj_optimization_tpu.core import poly, qp
from grad_traj_optimization_tpu.reference_impl import golden


def rand_times(m, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0.5, 3.0, size=m)


def test_unit_hermite_roundtrip():
    a1 = poly.A1
    assert np.allclose(a1 @ poly.A1INV, np.eye(6), atol=1e-12)


def test_segment_ainv_matches_dense_inverse():
    times = rand_times(5)
    ainv = np.asarray(qp.poly.segment_ainv(jnp.asarray(times)))
    A = golden.mapping_matrix(times)
    dense = np.linalg.inv(A)
    for s in range(5):
        np.testing.assert_allclose(
            ainv[s], dense[6 * s : 6 * s + 6, 6 * s : 6 * s + 6],
            rtol=2e-5, atol=1e-6,
        )


def test_snap_form_matches_dense():
    times = rand_times(4, seed=1)
    msnap = np.asarray(poly.segment_snap_form(jnp.asarray(times)))
    A = golden.mapping_matrix(times)
    Q = golden.snap_hessian(times)
    dense = np.linalg.inv(A).T @ Q @ np.linalg.inv(A)
    for s in range(4):
        blk = dense[6 * s : 6 * s + 6, 6 * s : 6 * s + 6]
        np.testing.assert_allclose(
            msnap[s], blk, rtol=5e-5, atol=1e-5 * np.abs(blk).max()
        )


def test_opt_dmap_matches_reference_ct():
    for m in (2, 3, 7, 10):
        ct = golden.opt_ct(m)
        mine = qp.opt_selection(m)
        np.testing.assert_array_equal(ct, mine)


def test_build_dep_matches_golden():
    times = rand_times(6, seed=2)
    deps = golden.GoldenDeps(times)
    dep = qp.build_dep(jnp.asarray(times))
    # f32 vs f64: small entries of L carry absolute error ~eps * row scale
    np.testing.assert_allclose(
        np.asarray(dep.L), deps.L, rtol=5e-3,
        atol=1e-4 * np.abs(deps.L).max(),
    )
    scale = np.abs(deps.R).max()
    np.testing.assert_allclose(
        np.asarray(dep.R), deps.R, rtol=1e-4, atol=1e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(dep.Rpp), deps.Rpp, rtol=1e-4, atol=1e-4 * scale
    )
    np.testing.assert_allclose(
        np.asarray(dep.Rfp), deps.Rfp, rtol=1e-4, atol=1e-4 * scale
    )


def test_coeff_interpolates_endpoints():
    """Coefficients from (Df, Dp) must hit the waypoints and keep
    C2 continuity at the joints (the whole point of the Hermite basis)."""
    rng = np.random.default_rng(3)
    wp = rng.uniform(-5, 5, size=(6, 3))
    times = rand_times(5, seed=4)
    Df, Dp = qp.straight_line_d(jnp.asarray(wp, dtype=jnp.float32))
    # randomize interior derivatives to a generic point
    Dp = jnp.asarray(rng.uniform(-1, 1, size=Dp.shape), dtype=jnp.float32)
    Dp = Dp.at[:, 0::3].set(jnp.asarray(wp[1:-1].T, dtype=jnp.float32))
    coeff = qp.coeff_from_d(Df, Dp, jnp.asarray(times, dtype=jnp.float32))
    coeff = np.asarray(coeff)

    # endpoint positions per segment
    for s in range(5):
        p0 = coeff[s, :, 0]
        basis = np.array([times[s] ** j for j in range(6)])
        p1 = coeff[s] @ basis
        np.testing.assert_allclose(p0, wp[s], atol=2e-4)
        np.testing.assert_allclose(p1, wp[s + 1], atol=2e-4)

    # C1/C2 continuity at interior joints
    for s in range(4):
        for deriv, basis_fn in ((1, poly.vel_powers), (2, poly.acc_powers)):
            b_end = np.asarray(basis_fn(jnp.asarray(times[s], jnp.float32)))
            b_start = np.asarray(basis_fn(jnp.asarray(0.0, jnp.float32)))
            d_end = coeff[s] @ b_end
            d_start = coeff[s + 1] @ b_start
            np.testing.assert_allclose(d_end, d_start, atol=5e-3)


def test_min_snap_through_waypoints():
    rng = np.random.default_rng(5)
    wp = rng.uniform(-5, 5, size=(7, 3)).astype(np.float32)
    times = rand_times(6, seed=6).astype(np.float32)
    zero = jnp.zeros(3, jnp.float32)
    coeff = qp.min_snap_coeff(wp, zero, zero, zero, zero, times)
    coeff = np.asarray(coeff)
    for s in range(6):
        basis = np.array([times[s] ** j for j in range(6)], dtype=np.float64)
        np.testing.assert_allclose(coeff[s, :, 0], wp[s], atol=1e-3)
        np.testing.assert_allclose(coeff[s] @ basis, wp[s + 1], atol=1e-2)
    # start/end velocity + acceleration are zero
    np.testing.assert_allclose(coeff[0, :, 1], 0.0, atol=1e-3)
    np.testing.assert_allclose(2 * coeff[0, :, 2], 0.0, atol=1e-2)


def test_min_snap_matches_golden_dense_solve():
    """Full comparison of the type-1 solve against a dense float64
    construction following qp_generator.cpp:242-315 verbatim."""
    rng = np.random.default_rng(7)
    wp = rng.uniform(-4, 4, size=(5, 3))
    times = rand_times(4, seed=8)
    m = 4
    num_f, num_p = 2 * m + 4, 2 * m - 2

    idx = qp.minsnap_dmap(m)
    ct = np.zeros((6 * m, num_f + num_p))
    ct[np.arange(6 * m), idx] = 1.0
    A = golden.mapping_matrix(times)
    Q = golden.snap_hessian(times)
    R = ct.T @ np.linalg.inv(A).T @ Q @ np.linalg.inv(A) @ ct
    Rpp = R[num_f:, num_f:]
    Rfp = R[:num_f, num_f:]

    coeffs = np.zeros((m, 3, 6))
    for ax in range(3):
        df = np.zeros(num_f)
        df[0] = wp[0, ax]
        df[3] = wp[1, ax]
        for s in range(1, m):
            df[2 + 2 * s] = wp[s, ax]
            df[3 + 2 * s] = wp[s + 1, ax]
        dp = -np.linalg.solve(Rpp, Rfp.T @ df)
        d = np.concatenate([df, dp])
        D = d[idx]
        P = np.linalg.solve(A, D)
        for s in range(m):
            coeffs[s, ax] = P[6 * s : 6 * s + 6]

    zero = jnp.zeros(3, jnp.float32)
    mine = np.asarray(
        qp.min_snap_coeff(
            wp.astype(np.float32), zero, zero, zero, zero,
            times.astype(np.float32),
        )
    )
    np.testing.assert_allclose(mine, coeffs, rtol=1e-3, atol=2e-3)


def test_allocate_times_quirk():
    wp = np.array([[0, 0, 0], [3, 0, 0], [3, 4, 0], [0, 4, 0]], np.float32)
    t = np.asarray(qp.allocate_times(wp, mean_v=1.5, init_time=0.3))
    np.testing.assert_allclose(t, [3 / 1.5 + 0.3, 4 / 1.5, 3 / 1.5], rtol=1e-6)

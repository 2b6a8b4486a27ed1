"""Pallas kernels in interpreter mode vs the jnp fallbacks."""

import numpy as np
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

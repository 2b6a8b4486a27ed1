"""Fused Pallas TPU kernel for the trilinear distance+gradient lookup.

The distance-field lookup dominates the penalty optimizer.  The three
available XLA formulations all hit a wall on TPU:

* scalar gathers: ~35 ns/element (XLA lowers them element-by-element);
* row gathers: same (per-row dispatch bound);
* dense separable contractions (sdf.trilinear_mxu): fast MXU math but the
  (samples, ny, nz) intermediate round-trips through HBM every iteration
  (~4 GB per evaluation at batch 1024).

This kernel fuses the whole separable contraction per scenario with the
grid slab resident in VMEM:

  for each z-slab (nx, ny) of the scenario's grid:
      t1   = [wx_n; wx_d] @ slab          (MXU, f32)
      r_*  = lane-reductions against wy_n / wy_d        (VPU)
      out += wz_n[z] / wz_d[z] weighted accumulations   (VPU)

so HBM traffic per evaluation is one read of the (padded) grid plus the
small weight tensors — no materialized intermediate.  Results are
numerically identical to sdf.trilinear_mxu (same weights, f32
accumulation).

Shape limits (fallback to trilinear_mxu otherwise): nx <= 128,
ny <= 128, nz such that the padded slab stack fits VMEM (nz <= ~160).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: padded sample capacity per scenario (samples on sublanes)
SP = 256
#: padded x/y extents (MXU tile)
NP = 128


def supports(grid_shape, n_samples: int) -> bool:
    nx, ny, nz = grid_shape
    return nx <= NP and ny <= NP and nz <= 160 and n_samples <= SP


def _kernel(nz: int, wxs_ref, wyn_ref, wyd_ref, wznt_ref, wzdt_ref,
            grid_ref, od_ref, ogx_ref, ogy_ref, ogz_ref):
    """One scenario.  Shapes (leading scenario axis already sliced):
    wxs (2*SP, NP), wy* (SP, NP), wz*t (SP, nz), grid (nz, NP, NP),
    o* (SP, 128) (value lane-broadcast; column 0 read outside)."""
    wxs = wxs_ref[0]
    wyn = wyn_ref[0]
    wyd = wyd_ref[0]
    wznt = wznt_ref[0]  # (SP, nz)
    wzdt = wzdt_ref[0]
    kidx = jax.lax.broadcasted_iota(jnp.int32, (SP, nz), 1)

    def body(z, carry):
        d, gx, gy, gz = carry
        slab = grid_ref[0, z]  # (NP, NP)
        t1 = jnp.dot(
            wxs, slab, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (2*SP, NP)
        t1n = t1[:SP]
        t1d = t1[SP:]
        rn = jnp.sum(t1n * wyn, axis=1, keepdims=True)   # (SP, 1)
        rdy = jnp.sum(t1n * wyd, axis=1, keepdims=True)
        rdx = jnp.sum(t1d * wyn, axis=1, keepdims=True)
        # column z of the wz tables via mask-reduce (dynamic lane slicing
        # is not Mosaic-lowerable at unaligned offsets)
        m = (kidx == z).astype(jnp.float32)
        wzn_z = jnp.sum(wznt * m, axis=1, keepdims=True)  # (SP, 1)
        wzd_z = jnp.sum(wzdt * m, axis=1, keepdims=True)
        return (
            d + wzn_z * rn,
            gx + wzn_z * rdx,
            gy + wzn_z * rdy,
            gz + wzd_z * rn,
        )

    zero = jnp.zeros((SP, 1), jnp.float32)
    d, gx, gy, gz = jax.lax.fori_loop(
        0, nz, body, (zero, zero, zero, zero)
    )
    od_ref[0] = jnp.broadcast_to(d, (SP, 128))
    ogx_ref[0] = jnp.broadcast_to(gx, (SP, 128))
    ogy_ref[0] = jnp.broadcast_to(gy, (SP, 128))
    ogz_ref[0] = jnp.broadcast_to(gz, (SP, 128))


def _weights(i, frac, n, n_pad, dtype):
    """2-hot + derivative weights over a padded axis (clamped corners)."""
    ar = jnp.arange(n_pad, dtype=i.dtype)
    i0 = jnp.clip(i, 0, n - 1)[..., None]
    i1 = jnp.clip(i + 1, 0, n - 1)[..., None]
    h0 = (ar == i0).astype(dtype)
    h1 = (ar == i1).astype(dtype)
    w_n = h0 * (1.0 - frac[..., None]) + h1 * frac[..., None]
    w_d = h1 - h0
    return w_n, w_d


@functools.partial(jax.jit, static_argnames=("interpret",))
def trilinear_fused_batch(grids, origin, resolution, pos,
                          interpret: bool = False):
    """Batched fused lookup.

    Args:
      grids: (B, nx, ny, nz) distance fields.
      origin: (B, 3); resolution: (B,) or scalar.
      pos: (B, S, 3) query positions (S <= 256).
    Returns:
      d (B, S), g (B, S, 3) — same semantics as sdf.trilinear_mxu.
    """
    B, nx, ny, nz = grids.shape
    S = pos.shape[1]
    dtype = pos.dtype
    origin = jnp.broadcast_to(jnp.asarray(origin, dtype), (B, 3))
    res = jnp.broadcast_to(jnp.asarray(resolution, dtype), (B,))

    # ---- weights (cheap elementwise, outside the kernel) ----
    lo = origin[:, None, :] + res[:, None, None] * 1e-4 * 0  # see mask below
    pos_m = pos - 0.5 * res[:, None, None]
    idx = jnp.floor(
        (pos_m - origin[:, None, :]) / res[:, None, None]
    ).astype(jnp.int32)
    idx_pos = (
        (idx.astype(dtype) + 0.5) * res[:, None, None] + origin[:, None, :]
    )
    diff = (pos - idx_pos) / res[:, None, None]

    size = jnp.asarray([nx, ny, nz], dtype) * res[:, None]
    in_lo = pos > (origin + 1e-4)[:, None, :]
    in_hi = pos < (origin + size - 1e-4)[:, None, :]
    ok = jnp.all(in_lo & in_hi, axis=-1)  # (B, S)

    wx_n, wx_d = _weights(idx[..., 0], diff[..., 0], nx, NP, dtype)
    wy_n, wy_d = _weights(idx[..., 1], diff[..., 1], ny, NP, dtype)
    wz_n, wz_d = _weights(idx[..., 2], diff[..., 2], nz, nz, dtype)
    inv_res = (1.0 / res)[:, None, None]

    def pad_s(a):  # pad sample axis to SP
        return jnp.pad(a, ((0, 0), (0, SP - S)) + ((0, 0),) * (a.ndim - 2))

    wxs = jnp.concatenate(
        [pad_s(wx_n), pad_s(wx_d) * inv_res], axis=1
    )  # (B, 2*SP, NP)
    wyn = pad_s(wy_n)
    wyd = pad_s(wy_d) * inv_res
    wznt = pad_s(wz_n)  # (B, SP, nz)
    wzdt = pad_s(wz_d) * inv_res

    gp = jnp.pad(
        jnp.transpose(grids, (0, 3, 1, 2)),
        ((0, 0), (0, 0), (0, NP - nx), (0, NP - ny)),
    )  # (B, nz, NP, NP)

    out = pl.pallas_call(
        functools.partial(_kernel, nz),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 2 * SP, NP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, NP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, NP), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, nz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, SP, nz), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nz, NP, NP), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, SP, 128), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(4)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, SP, 128), jnp.float32)
            for _ in range(4)
        ],
        interpret=interpret,
    )(wxs, wyn, wyd, wznt, wzdt, gp)

    od, ogx, ogy, ogz = out
    d = od[:, :S, 0]
    g = jnp.stack([ogx[:, :S, 0], ogy[:, :S, 0], ogz[:, :S, 0]], axis=-1)
    d = jnp.where(ok, d, -1.0)
    g = jnp.where(ok[..., None], g, 0.0)
    return d, g

"""Fused Pallas TPU kernel for the trilinear distance+gradient lookup.

The distance-field lookup dominates the penalty optimizer.  The XLA
formulations all hit a wall on TPU: scalar and row gathers cost ~35 ns
per element (element-wise lowering), and the dense separable contraction
(sdf.trilinear_mxu) round-trips a (samples, ny, nz) intermediate through
HBM every iteration (~4 GB per evaluation at batch 1024).

This kernel fuses the whole separable contraction per scenario in VMEM,
processing the grid in static z-chunks to bound the Mosaic stack:

    for each z-chunk (ZC cells = ZC*128 lanes) of G (nx, nzp*128):
        X    = [h0x; h1x] @ Gb              (ONE stacked MXU dot; the
                                             x-corner rows of the chunk)
        r{0,1}{n,d} chunk columns = lane reductions of X0/X1 vs wy_n/wy_d
    rn/rdy/rdx = x-fraction blends of the reduced columns          (VPU)
    d/gx/gy/gz = z reductions against wz_n / wz_d                  (VPU)

Stacking both x-corner row sets into one dot matters: the MXU streams M
in 128-row tiles, so two separate 184-row dots each pad to 256 rows
(28% waste) while one 368-row dot pads to 384 (4%).

HBM traffic per evaluation is one read of the padded grid plus small
weight tensors — no materialized intermediate.  The grid layout prep
(transpose + pad) is hoisted into :func:`prep_grids` so the per-iteration
cost is the kernel alone.

Shape limits (fall back to sdf.trilinear_mxu otherwise): samples <=
512 with the padded sample-row count derived per call (sp_for:
8-sublane aligned); x/y extents pad to 128-lane tile multiples
(np_for — the reference's own 200x200x25 demo map fits), with VMEM
bounding the (grid block + X intermediate) footprint (supports()).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: padded sample capacity per scenario (samples on sublanes)
SP = 184
#: the MXU/lane tile all padded x/y extents are multiples of
NP = 128
#: bf16 planes the f32 grid splits into (hi, mid[, lo]).  2 planes are
#: relatively accurate to ~2^-17: <=6e-5 m absolute in the
#: penalty-relevant d < 16 m range (the exponential penalty underflows
#: far earlier), but up to ~0.08 m near the 10000 free-distance cap —
#: do NOT treat raw kernel distances near the cap as f32-faithful.
#: 2 planes cost 2 MXU passes + 2/3 of the grid traffic; 3 planes are
#: exactly f32.
PLANES = 2


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def np_for(n: int) -> int:
    """Padded extent of a grid x/y axis: 128-lane tile multiples (a
    multi-tile extent makes the x contraction a longer K and the y
    reduction a wider lane sweep — supported up to supports()'s VMEM
    bound, so the reference's own 200x200x25 demo map takes the fused
    kernels)."""
    return _round_up(max(n, 1), NP)


def sp_for(n_samples: int) -> int:
    """Padded sample-row count: 8-sublane aligned, at least the
    historical SP=184 floor is NOT forced — smaller batches of samples
    pay proportionally less VPU reduce work."""
    return max(8, _round_up(n_samples, 8))


def _pick_zc(nz: int) -> int:
    """z-cells per in-kernel chunk: prefer large chunks, avoid padding."""
    best, best_pad = 8, _round_up(nz, 8) - nz
    for zc in (8, 7, 6, 5, 4):
        pad = _round_up(nz, zc) - nz
        if pad < best_pad:
            best, best_pad = zc, pad
    return best


def supports(grid_shape, n_samples: int) -> bool:
    nx, ny, nz = grid_shape
    npx, npy = np_for(nx), np_for(ny)
    nzp = _round_up(nz, _pick_zc(nz))
    sp = sp_for(n_samples)
    return (
        n_samples <= 512
        # grid block (x2 pipelining) + the per-chunk X intermediate
        # (a few chunks alive for pipelining) must fit the kernel's
        # 64 MB VMEM budget with headroom for chains and weights
        and PLANES * npx * nzp * npy * 2 * 2
        + 2 * sp * _pick_zc(nz) * npy * 4 * 4
        <= (40 << 20)
    )


def prep_grids(grids):
    """Arrange (B, nx, ny, nz) grids into the kernel layout: column
    c = z * NP + y, z padded to a multiple of the chunk size, and the
    f32 values split into PLANES stacked bf16 planes (hi, mid[, lo])
    along the x/contraction axis -> (B, PLANES*NP, nzp*NP) bf16.  Call
    once per solve.

    Why bf16 planes: the kernel's x contraction is a one-hot SELECTION,
    so every MXU product is exact — the only error is representing the
    f32 grid value as a sum of bf16 planes (hi + mid is accurate to
    ~2^-17 RELATIVE — absolute error grows with the value, see the
    PLANES note; + lo recovers f32 exactly).  A DEFAULT-precision
    bf16 dot over the PLANES-stacked contraction axis costs PLANES MXU
    passes where a HIGHEST f32 dot costs 6 — on the op that dominates
    the whole solve."""
    B, nx, ny, nz = grids.shape
    npx, npy = np_for(nx), np_for(ny)
    nzp = _round_up(nz, _pick_zc(nz))
    g = jnp.transpose(grids, (0, 1, 3, 2))  # (B, nx, nz, ny)
    g = jnp.pad(
        g, ((0, 0), (0, npx - nx), (0, nzp - nz), (0, npy - ny))
    ).reshape(B, npx, nzp * npy)
    planes = []
    rem = g
    for _ in range(PLANES):
        p = rem.astype(jnp.bfloat16)
        planes.append(p)
        rem = rem - p.astype(jnp.float32)
    return jnp.concatenate(planes, axis=1)  # (B, PLANES*npx, nzp*npy)


def lookup_core(grid_ref, wx01, fx_frac, wyn, wyd, wznt, wzdt, wzntx,
                ncell: int, zc: int, col0=0,
                ablate: frozenset = frozenset(),
                functional: bool = False, yred: str = "vpu"):
    """The shared trilinear contraction both Pallas kernels run.

    Args (in-kernel values for ONE scenario):
      grid_ref: the scenario's grid-plane block ref (1, PLANES*NP,
        nzp*NP) bf16, chunk-sliced inside (never fully materialized);
      wx01: (2*SP, PLANES*NP) bf16 — the x-corner one-hot rows [h0; h1]
        tiled per grid plane;
      fx_frac: X interpolation fraction, (SP, 1) or (SP, ncell);
      wyn/wyd: (SP, 1, NP) y interpolation / derivative weights (wyd
        carries 1/res);
      wznt/wzdt/wzntx: (SP, ncell) z weights RELATIVE to ``col0``;
        wzdt carries 1/res and wzntx = wznt/res (for the x derivative
        output);
      ncell: static number of z-cells processed (multiple of zc; the
        full grid's nzp, or a smaller window);
      col0: first z-cell processed — a traced scalar for the dynamic
        z-window (solve_pallas._lookup) or the static 0 default.  Cell
        offsets are NP=128 lanes, so any cell start is lane-aligned.
    Returns d, gx, gy, gz as (SP, 1).

    The x contraction is ONE stacked bf16 matmul per z-chunk at DEFAULT
    precision (every product is an exact one-hot selection, f32
    accumulation; PLANES MXU passes vs 6 for a HIGHEST f32 dot).
    Stacking both corner row sets also avoids M-tile padding waste
    (2 x 184 -> 2 x 256 rows vs 368 -> 384).  X0/X1 are y-reduced
    immediately — in one stacked op per chunk — and the x-fraction
    blend happens on the reduced (SP, ncell) columns (blend and
    reduction commute): a blended (SP, zc, NP) tensor next to X would
    overflow the Mosaic VMEM stack.  The per-chunk bodies are
    UNCONDITIONAL straight-line code so Mosaic can overlap chunk k+1's
    MXU dot with chunk k's VPU y-reduction (a per-chunk pl.when "skip
    dead chunks" variant serialized that pipeline and lost most of its
    savings; lax.cond predicates both branches and was 1.9x slower).

    ``ablate`` (profiling only — WRONG results): "xdot" replaces the
    MXU contraction with a broadcast of the same output shape (NOTE:
    drops the grid read, so its delta includes any non-overlapped grid
    DMA); "yreduce" computes the real lane reductions only for the
    first z-chunk and reuses them (delta ~= (1 - zc/ncell) of the
    y-reduction cost — a lane-slice stand-in measured SLOWER than the
    reduction itself).  Time attribution = full kernel wall time minus
    the ablated variant's."""
    prec = jax.lax.Precision.DEFAULT
    sp = wyn.shape[0]  # padded sample rows (8-aligned, default SP)
    npy = wyn.shape[2]  # padded y extent (lane-tile multiple)
    wyn2 = jnp.concatenate([wyn, wyn], axis=0)  # (2*sp, 1, NP)
    wyd2 = jnp.concatenate([wyd, wyd], axis=0)
    sn_p, sd_p = [], []
    for zb in range(ncell // zc):
        if "xdot" in ablate:
            X = jnp.broadcast_to(
                wx01[:, 0:1, None].astype(jnp.float32),
                (2 * sp, zc, npy),
            )
        elif functional:
            # grid_ref is a plain ARRAY (pure-JAX property tests; an
            # isinstance dispatch can't work — in-kernel ref tracers
            # also pass isinstance(x, jax.Array))
            Gb = jax.lax.dynamic_slice_in_dim(
                grid_ref[0], (col0 + zb * zc) * npy, zc * npy, axis=1
            )
            X = jnp.dot(
                wx01, Gb, preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(2 * sp, zc, npy)
        else:
            Gb = grid_ref[0, :, pl.ds((col0 + zb * zc) * npy, zc * npy)]
            X = jnp.dot(
                wx01, Gb, preferred_element_type=jnp.float32,
                precision=prec,
            ).reshape(2 * sp, zc, npy)
        if "yreduce" in ablate and zb > 0:
            # scalar tap keeps this chunk's X (and its dot) alive
            sn_p.append(sn_p[0] + X[0, 0, 0] * 1e-9)
            sd_p.append(sd_p[0] + X[0, 0, 0] * 1e-9)
            continue
        if yred == "mxu":
            # EXPERIMENT: VPU does only the weight multiplies; the
            # 128-lane sums ride the MXU as one stacked block-diagonal
            # f32 dot per chunk ((4*SP, zc*NP) @ (zc*NP, zc)).  The
            # reduce matrix is exact ones, but a HIGHEST f32 dot costs
            # 6 MXU passes — measured against the VPU lane reduce.
            Xn = (X * wyn2).reshape(2 * sp, zc * npy)
            Xd = (X * wyd2).reshape(2 * sp, zc * npy)
            cols = jax.lax.broadcasted_iota(
                jnp.int32, (zc * npy, zc), 0
            ) // npy
            outs = jax.lax.broadcasted_iota(
                jnp.int32, (zc * npy, zc), 1
            )
            bd = (cols == outs).astype(jnp.float32)
            S = jnp.dot(
                jnp.concatenate([Xn, Xd], axis=0), bd,
                precision=jax.lax.Precision.HIGHEST,
            )  # (4*SP, zc)
            sn_p.append(S[: 2 * sp])
            sd_p.append(S[2 * sp :])
        else:
            sn_p.append(jnp.sum(X * wyn2, axis=2))    # (2*SP, zc)
            sd_p.append(jnp.sum(X * wyd2, axis=2))

    sn = jnp.concatenate(sn_p, axis=1)   # (2*SP, ncell)
    sd = jnp.concatenate(sd_p, axis=1)
    r0n, r1n = sn[:sp], sn[sp:]
    r0d, r1d = sd[:sp], sd[sp:]

    rn = (1.0 - fx_frac) * r0n + fx_frac * r1n
    rdy = (1.0 - fx_frac) * r0d + fx_frac * r1d
    rdx = r1n - r0n

    d = jnp.sum(rn * wznt, axis=1, keepdims=True)    # (SP, 1)
    gz = jnp.sum(rn * wzdt, axis=1, keepdims=True)
    gy = jnp.sum(rdy * wznt, axis=1, keepdims=True)
    gx = jnp.sum(rdx * wzntx, axis=1, keepdims=True)
    return d, gx, gy, gz


def _kernel(nzp: int, zc: int, wx01_ref, fx_ref, wyn_ref,
            wyd_ref, wznt_ref, wzdt_ref, wzntx_ref, grid_ref, o_ref):
    """One scenario of the standalone lookup (see lookup_core).  fx is
    (sp, 1) — one x fraction per sample."""
    sp = fx_ref.shape[1]
    d, gx, gy, gz = lookup_core(
        grid_ref,
        wx01_ref[0],
        fx_ref[0],
        wyn_ref[0][:, None, :],
        wyd_ref[0][:, None, :],
        wznt_ref[0],
        wzdt_ref[0],
        wzntx_ref[0],
        nzp,
        zc,
    )

    # one combined output: lanes [0:32)=d, [32:64)=gx, [64:96)=gy,
    # [96:128)=gz (32-lane broadcast groups; column 0 of each group read
    # outside)
    o_ref[0] = jnp.concatenate(
        [
            jnp.broadcast_to(d, (sp, 32)),
            jnp.broadcast_to(gx, (sp, 32)),
            jnp.broadcast_to(gy, (sp, 32)),
            jnp.broadcast_to(gz, (sp, 32)),
        ],
        axis=1,
    )


def _corner_hots(i, n, n_pad, dtype):
    """One-hot rows of the two clamped corner indices along one axis."""
    ar = jnp.arange(n_pad, dtype=i.dtype)
    i0 = jnp.clip(i, 0, n - 1)[..., None]
    i1 = jnp.clip(i + 1, 0, n - 1)[..., None]
    return (ar == i0).astype(dtype), (ar == i1).astype(dtype)


def _weights(i, frac, n, n_pad, dtype):
    """2-hot + derivative weights over a padded axis (clamped corners)."""
    h0, h1 = _corner_hots(i, n, n_pad, dtype)
    w_n = h0 * (1.0 - frac[..., None]) + h1 * frac[..., None]
    w_d = h1 - h0
    return w_n, w_d


@functools.partial(
    jax.jit, static_argnames=("grid_shape", "interpret", "precision")
)
def trilinear_fused_prepped(gp, grid_shape, origin, resolution, pos,
                            interpret: bool = False,
                            precision: str = "highest"):
    """Batched fused lookup against pre-arranged grids (see prep_grids).

    Args:
      gp: (B, PLANES*NP, nzp*NP) bf16 from :func:`prep_grids`.
      grid_shape: static original (nx, ny, nz).
      origin: (B, 3); resolution: (B,) or scalar; pos: (B, S, 3).
    Returns:
      d (B, S), g (B, S, 3) — same semantics as sdf.trilinear_mxu.
    """
    nx, ny, nz = grid_shape
    B = gp.shape[0]
    S = pos.shape[1]
    dtype = pos.dtype
    origin = jnp.broadcast_to(jnp.asarray(origin, dtype), (B, 3))
    res = jnp.broadcast_to(jnp.asarray(resolution, dtype), (B,))
    if precision != "highest":
        # The kernel's accuracy is set by the bf16 plane split (exact
        # one-hot selection products; ~2^-17 relative value error with
        # PLANES=2), not by dot precision — a "high" variant would
        # change nothing, and Mosaic has no HIGH dot lowering anyway.
        # Callers gate on 'highest' and fall back to mxu otherwise.
        raise NotImplementedError(
            "fused lookup kernel supports precision='highest' only"
        )
    pos_m = pos - 0.5 * res[:, None, None]
    idx = jnp.floor(
        (pos_m - origin[:, None, :]) / res[:, None, None]
    ).astype(jnp.int32)
    idx_pos = (
        (idx.astype(dtype) + 0.5) * res[:, None, None] + origin[:, None, :]
    )
    diff = (pos - idx_pos) / res[:, None, None]

    size = jnp.asarray([nx, ny, nz], dtype) * res[:, None]
    ok = jnp.all(
        (pos > (origin + 1e-4)[:, None, :])
        & (pos < (origin + size - 1e-4)[:, None, :]),
        axis=-1,
    )

    zc = _pick_zc(nz)
    nzp = _round_up(nz, zc)
    npx, npy = np_for(nx), np_for(ny)
    h0x, h1x = _corner_hots(idx[..., 0], nx, npx, dtype)
    wy_n, wy_d = _weights(idx[..., 1], diff[..., 1], ny, npy, dtype)
    wz_n, wz_d = _weights(idx[..., 2], diff[..., 2], nz, nzp, dtype)
    inv_res = (1.0 / res)[:, None, None]

    sp = sp_for(S)

    def pad_s(a):
        return jnp.pad(a, ((0, 0), (0, sp - S)) + ((0, 0),) * (a.ndim - 2))

    # x-corner one-hot rows stacked on the sublane axis and tiled on the
    # contraction axis (one copy per bf16 grid plane):
    # (B, 2*SP, PLANES*NP) bf16 — one-hots are exact in bf16
    wx01 = jnp.tile(
        jnp.concatenate([pad_s(h0x), pad_s(h1x)], axis=1), (1, 1, PLANES)
    ).astype(jnp.bfloat16)
    fx = pad_s(diff[..., 0:1])  # (B, SP, 1): one x fraction per sample
    wyn = pad_s(wy_n)
    wyd = pad_s(wy_d) * inv_res
    wznt = pad_s(wz_n)
    wzdt = pad_s(wz_d) * inv_res
    wzntx = wznt * inv_res  # carries the 1/res of the x derivative

    out = pl.pallas_call(
        functools.partial(_kernel, nzp, zc),
        grid=(B,),
        in_specs=[
            pl.BlockSpec((1, 2 * sp, PLANES * npx), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, npy), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, npy), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, nzp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, nzp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sp, nzp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, PLANES * npx, nzp * npy), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, sp, 128), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, sp, 128), jnp.float32),
        # Mosaic's default 16 MB scoped-VMEM stack is too tight for the
        # pipelined bf16 grid blocks + the f32 X intermediate; the chip
        # has 128 MB VMEM, so give the kernel room.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(wx01, fx, wyn, wyd, wznt, wzdt, wzntx, gp)

    d = out[:, :S, 0]
    g = jnp.stack(
        [out[:, :S, 32], out[:, :S, 64], out[:, :S, 96]], axis=-1
    )
    d = jnp.where(ok, d, -1.0)
    g = jnp.where(ok[..., None], g, 0.0)
    return d, g


def trilinear_fused_batch(grids, origin, resolution, pos,
                          interpret: bool = False):
    """Convenience wrapper: prep + lookup in one call (prefer prepping
    once per solve via prep_grids + trilinear_fused_prepped)."""
    gp = prep_grids(grids)
    return trilinear_fused_prepped(
        gp, grids.shape[1:], origin, resolution, pos, interpret=interpret
    )

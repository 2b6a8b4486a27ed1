"""Whole-descent Pallas TPU kernel: one kernel call = one full solve.

The measured profile of the batched solver (B=1024, v5e) is stark: one
descent iteration costs exactly one fused-lookup kernel call (~14 ms),
much of it HBM traffic + per-call pipeline overhead — dominated by
re-reading each scenario's distance grid every iteration.  The descent
runs ~100 iterations on the SAME grid, so the speed-of-light design
loads the grid into VMEM once per scenario and runs the entire
projected-BB descent (reference back-end: grad_traj_optimizer.cpp:
128-243, NLopt replaced per SURVEY.md §2 row 4) inside the kernel:

    per scenario (one Pallas grid instance):
      VMEM <- grid planes (bf16 hi/mid, see trilinear_pallas.PLANES),
              sampling chains, QP blocks, bounds     [~2 MB, ONCE]
      for phase in steps:                   (static, cfg schedule)
        for it in range(iters):             (lax.fori_loop)
          cand  = clip(dp - step * grad)                      [VPU]
          pos   = A_pos @ [Df; cand]; vel = A_vel @ [...]     [MXU]
          d,g   = trilinear lookup (stacked one-hot bf16 dot) [MXU]
          cost, grad = penalty (smoothness via Rpp dot +
                       collision line integral)               [VPU+MXU]
          BB accept/reject step update                        [VPU]
      out <- dp, cost, n_accept

All per-iteration tensors live in (samples, axis) / (num_dp, axis)
layout so no transposes are ever needed: pos/vel/corner weights keep
samples on sublanes (matching the lookup contraction), and the QP
matvecs contract natural lane dims.  The small QP contractions
(S x ndim, S x P, P x P) run as HIGHEST-precision MXU dots: a VPU
broadcast-reduction variant was measured SLOWER end-to-end (722 vs 803
solves/s at B=1024) — cross-sublane reductions and tiny-op latencies
cost more than the padded dots.

HBM traffic per solve drops from iters x (grid + weights) to ONE read
of grid + chains — two orders of magnitude.

Iterates replicate opt/descent.minimize_batch (BB spectral step,
monotone acceptance) and opt/penalty.cost_and_grad_batch (reference
gradient quirks included) up to f32 rounding: reduction orders differ,
so fragile scenarios may converge to different equal-quality basins
(measured at B=1024: cost-ratio geomean 0.995 vs the per-iteration
path, 8.5%/8.3% of lanes >5% worse/better — the same symmetric spread
every numeric-path variant shows; golden-fixture parity gates).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from grad_traj_optimization_tpu.ops import trilinear_pallas as tp

SP = tp.SP
NP = tp.NP


def supports(grid_shape, n_samples: int, num_dp: int, cfg) -> bool:
    """Kernel applicability: lookup-shape limits + BB rule + P fits."""
    return (
        tp.supports(grid_shape, n_samples)
        and 1 <= num_dp <= 128  # m = 1 (two waypoints) has no free dp
        and cfg.step_rule == "bb"
        and cfg.lookup_precision == "highest"
        and 1 <= cfg.accept_window <= 128  # hist rides one lane vector
    )


def _lookup(grid_ref, pos, misc, grid_shape, nzp, zc,
            ablate: frozenset = frozenset(), zwin: int = 0,
            valid=None, dg_ref=None, functional: bool = False,
            win_zc: int | None = None, yred: str = "vpu"):
    """In-kernel trilinear distance+gradient for pos (SP, 3).

    Same math as trilinear_pallas._kernel, with the one-hot corner
    weights built in-kernel from the sample coordinates (a few VPU
    broadcast-compares instead of ~0.6 MB/scenario of streamed weights).
    Returns d (SP, 1), g (SP, 3); out-of-map -> (-1, 0) (sdf_map.cpp:187).

    ``zwin`` (chunks) > 0 enables the DYNAMIC Z-WINDOW: quadrotor
    trajectories are nearly constant-altitude, so the valid samples'
    z-corner cells usually span a narrow band.  When the band fits a
    zwin*zc-cell window, the contraction runs over just that window at
    a traced cell offset (cell offsets are NP=128 lanes, so any start
    is lane-aligned) with window-relative z weights; otherwise a
    pl.when fallback runs the full-depth lookup.  Both paths are the
    same math over columns whose excluded weights are identically zero
    (adding exact zeros is exact), so results match the full lookup up
    to compiled reduction reassociation — and bitwise in pure JAX.
    ``valid`` (SP, 1) masks padded sample rows out of the band
    computation; ``dg_ref`` ((SP, 4) f32 VMEM scratch) carries the
    pl.when branch outputs.  Both must be given to enable the window
    in-kernel; without ``dg_ref`` a functional jnp.where select is used
    (for property tests).

    ``win_zc`` decouples the WINDOW's chunk granularity from the
    full-depth layout chunking ``zc`` (the grid's column layout is
    uniform in z, so any chunk size slices it): window cells =
    zwin * (win_zc or zc).  ``yred`` selects the y-reduction lowering
    (see lookup_core).
    """
    nx, ny, nz = grid_shape
    npx, npy = tp.np_for(nx), tp.np_for(ny)
    ox = misc[0, 0:1]
    oy = misc[0, 1:2]
    oz = misc[0, 2:3]
    r = misc[0, 3]
    inv_res = 1.0 / r
    # exact-crop frame (solver.crop_scenarios): the grid block is a
    # [off, off+n) cell window of a larger map whose origin ``o`` is
    # UNCHANGED — all index/fraction arithmetic below stays in the
    # GLOBAL frame (bitwise-identical floor/frac splits to the full
    # map) and only the one-hot lane selection subtracts the integer
    # offset.  off = 0 / full = n (the default) reproduces the uncropped
    # arithmetic bitwise.
    offx = misc[0, 5]
    offy = misc[0, 6]
    offz = misc[0, 7]
    nxf = misc[0, 8]   # FULL-map extents (cells, float-encoded ints)
    nyf = misc[0, 9]
    nzf = misc[0, 10]

    sp = pos.shape[0]  # padded sample rows (8-aligned; default SP)
    px, py, pz = pos[:, 0:1], pos[:, 1:2], pos[:, 2:3]

    def win_ok(p, o1, off, ncrop, nfull):
        # in-window test: the reference's 1e-4 margin on TRUE map faces
        # (sdf_map.cpp:55-69); interior crop faces take a HALF-CELL
        # margin so every in-window sample's interpolation corners stay
        # inside the window (the trilinear stencil reaches +-res/2).
        mlo = jnp.where(off == 0.0, 1e-4, 0.5 * r)
        mhi = jnp.where(off + ncrop == nfull, 1e-4, 0.5 * r)
        return (p > o1 + off * r + mlo) & (p < o1 + (off + ncrop) * r - mhi)

    ok = (
        win_ok(px, ox, offx, nx, nxf)
        & win_ok(py, oy, offy, ny, nyf)
        & win_ok(pz, oz, offz, nz, nzf)
    )  # (SP, 1)

    def idx_frac(p, o1):
        pm = p - 0.5 * r
        ixf = jnp.floor((pm - o1) * inv_res)
        fr = (p - ((ixf + 0.5) * r + o1)) * inv_res
        return ixf.astype(jnp.int32), fr

    ix, fxq = idx_frac(px, ox)
    iy, fyq = idx_frac(py, oy)
    iz, fzq = idx_frac(pz, oz)
    offxi = offx.astype(jnp.int32)
    offyi = offy.astype(jnp.int32)
    offzi = offz.astype(jnp.int32)
    nxfi = nxf.astype(jnp.int32)
    nyfi = nyf.astype(jnp.int32)
    nzfi = nzf.astype(jnp.int32)

    def hots(i, nfi, offi, n_lanes):
        # corner clamping against the FULL map (reference getDistance
        # clamp, sdf_map.cpp:166-174), then window-local lane selection
        lanes = jax.lax.broadcasted_iota(jnp.int32, (sp, n_lanes), 1)
        h0 = (lanes == jnp.clip(i, 0, nfi - 1) - offi).astype(jnp.float32)
        h1 = (
            lanes == jnp.clip(i + 1, 0, nfi - 1) - offi
        ).astype(jnp.float32)
        return h0, h1

    h0x, h1x = hots(ix, nxfi, offxi, npx)
    h0y, h1y = hots(iy, nyfi, offyi, npy)

    # stacked bf16 one-hot rows, tiled per grid plane (hi, mid[, lo])
    wx = jnp.concatenate([h0x, h1x], axis=0).astype(jnp.bfloat16)
    wx01 = jnp.concatenate([wx] * tp.PLANES, axis=1)  # (2*SP, PLANES*NP)
    wyn = (h0y * (1.0 - fyq) + h1y * fyq)[:, None, :]  # (SP, 1, NP)
    wyd = ((h1y - h0y) * inv_res)[:, None, :]

    # crop-local z corner cells (full-map clamp, window-local index)
    izc0 = jnp.clip(iz, 0, nzfi - 1) - offzi
    izc1 = jnp.clip(iz + 1, 0, nzfi - 1) - offzi

    def z_lookup(z0, ncell, chunk):
        """Lookup over ncell z-cells starting at (traced) cell z0."""
        # one-hot of the ABSOLUTE-clamped corner cells, window-relative
        lanes = jax.lax.broadcasted_iota(jnp.int32, (sp, ncell), 1)
        h0z = (lanes == izc0 - z0).astype(jnp.float32)
        h1z = (lanes == izc1 - z0).astype(jnp.float32)
        wznt = h0z * (1.0 - fzq) + h1z * fzq  # (SP, ncell)
        wzdt = (h1z - h0z) * inv_res
        return tp.lookup_core(
            grid_ref, wx01, fxq, wyn, wyd, wznt, wzdt, wznt * inv_res,
            ncell, chunk, col0=z0, ablate=ablate, functional=functional,
            yred=yred,
        )

    wzc = win_zc or zc
    win_cells = zwin * wzc
    if not (0 < win_cells < nz) or valid is None:
        d, gx, gy, gz = z_lookup(0, nzp, zc)
    else:
        # band of z-corner cells over VALID samples (padded rows would
        # otherwise drag the window to their garbage positions)
        big = jnp.int32(1 << 20)
        lo = jnp.min(jnp.where(valid, izc0, big))
        hi = jnp.max(jnp.where(valid, izc1, -big))
        z0 = jnp.clip(lo, 0, nz - win_cells)
        fit = hi - z0 <= win_cells - 1

        if dg_ref is None:
            dw = z_lookup(z0, win_cells, wzc)
            df = z_lookup(0, nzp, zc)
            d, gx, gy, gz = [
                jnp.where(fit, a, b) for a, b in zip(dw, df)
            ]
        else:
            @pl.when(fit)
            def _():
                dg_ref[...] = jnp.concatenate(
                    z_lookup(z0, win_cells, wzc), axis=1
                )

            @pl.when(jnp.logical_not(fit))
            def _():
                dg_ref[...] = jnp.concatenate(
                    z_lookup(0, nzp, zc), axis=1
                )

            dgl = dg_ref[...]
            d, gx, gy, gz = (dgl[:, 0:1], dgl[:, 1:2], dgl[:, 2:3],
                             dgl[:, 3:4])

    okf = ok.astype(jnp.float32)
    d = jnp.where(ok, d, -1.0)
    g = jnp.concatenate([gx, gy, gz], axis=1) * okf  # (SP, 3)
    return d, g


def _solve_kernel(grid_shape, nzp, zc, phases, cfg, ablate, zwin,
                  win_zc, yred, qpfuse, *refs):
    """One scenario's complete multi-phase descent.

    ``refs`` is the positional ref pack from pallas_call: 12 inputs
    (13 with the acceleration chain when cfg.alpha_a != 0), 3 outputs,
    then the optional z-window scratch.
    """
    use_a = cfg.alpha_a != 0.0
    use_v = cfg.alpha_v != 0.0
    n_in = 13 if use_a else 12
    if use_a:
        (gp_ref, apos_ref, avel_ref, aacc_ref, tltv_ref, rpp_ref,
         cgt_ref, lbT_ref, ubT_ref, dp0T_ref, dts_ref, dfT_ref,
         misc_ref) = refs[:n_in]
    else:
        (gp_ref, apos_ref, avel_ref, tltv_ref, rpp_ref, cgt_ref,
         lbT_ref, ubT_ref, dp0T_ref, dts_ref, dfT_ref,
         misc_ref) = refs[:n_in]
        aacc_ref = None
    odp_ref, osc_ref, otr_ref = refs[n_in:n_in + 3]
    dg_ref = refs[n_in + 3] if len(refs) > n_in + 3 else None

    HI = jax.lax.Precision.HIGHEST
    apos = apos_ref[0]  # (SP, ndim)
    avel = avel_ref[0]
    tltv = tltv_ref[0]  # (P, 2*SP): [TL^T | TVL^T] stacked on K
    rpp = rpp_ref[0]    # (P, P)
    if qpfuse:
        # iteration-invariant fused operands (hoisted): ONE dot per
        # iteration computes pos AND vel; another computes the full
        # gradient chain AND the smoothness matvec z = Rpp dpT (as two
        # extra N columns) — the small dots' MXU latency, not their
        # MACs, was the measured cost (CLAUDE.md: VPU variant of the
        # QP contractions lost to padded dots; here they ride the
        # SAME padded dots instead)
        apv = jnp.concatenate([apos, avel], axis=0)   # (2*SP, ndim)
        tlr = jnp.concatenate([tltv, rpp], axis=1)    # (P, K2 + P)
    cgt = cgt_ref[0]    # (P, 3)
    lbT = lbT_ref[0]    # (P, 3)
    ubT = ubT_ref[0]
    dfT = dfT_ref[0]    # (6, 3)
    dts = dts_ref[0]    # (SP, 1), zero on padded sample rows
    misc = misc_ref[0]  # (1, 16): [origin, res, c_ff, crop off (3),
    #                                 full extents (3), 0 pad]
    c_ff = misc[0, 4]

    ref_grad = cfg.gradient_mode == "reference"
    valid = dts > 0.0  # (SP, 1); padded sample rows have dt == 0

    def cost_and_grad(dpT, ws, step):
        d_full = jnp.concatenate([dfT, dpT], axis=0)  # (ndim, 3)
        fuse = (
            qpfuse and "qpdots" not in ablate
            and "graddots" not in ablate
            and abs(cfg.w_collision) >= 1e-4
        )
        if not fuse:
            # smoothness: d^T R d + dp-gradient (penalty._smooth)
            z = jnp.dot(rpp, dpT, precision=HI)  # (P, 3)
            cost_s = c_ff + jnp.sum(cgt * dpT) + jnp.sum(dpT * z)
            grad_s = cgt + 2.0 * z

        if abs(cfg.w_collision) < 1e-4:  # reference skips the loop (:346)
            cost = ws * cost_s + cfg.cost_eps
            grad = ws * grad_s
            if ref_grad:
                grad = grad + cfg.grad_eps
            return cost, grad

        # ablate gates: profiling stand-ins of the same output shape
        # that keep the data dependence on the candidate (see
        # descend_fused docstring); results are WRONG under ablation.
        if "qpdots" in ablate:
            sc = 1.0 + jnp.sum(d_full) * 1e-9
            pos = apos[:, 0:3] * sc  # (SP, 3)
            vel = avel[:, 0:3] * sc
        elif fuse:
            pv = jnp.dot(apv, d_full, precision=HI)  # (2*sp_k, 3)
            sp_k = apos.shape[0]
            pos = pv[:sp_k]
            vel = pv[sp_k:]
        else:
            pos = jnp.dot(apos, d_full, precision=HI)  # (SP, 3)
            vel = jnp.dot(avel, d_full, precision=HI)
        if "lookup" in ablate:
            d = 1.0 + jnp.sum(pos, axis=1, keepdims=True) * 1e-3
            g = pos * 1e-3
        else:
            d, g = _lookup(
                gp_ref, pos, misc, grid_shape, nzp, zc, ablate=ablate,
                zwin=zwin, valid=valid, dg_ref=dg_ref, win_zc=win_zc,
                yred=yred,
            )

        if "exp" in ablate:
            cd = cfg.alpha * (1.0 - (d - cfg.d0) / cfg.r)  # (SP, 1)
        else:
            cd = cfg.alpha * jnp.exp(-(d - cfg.d0) / cfg.r)  # (SP, 1)
        gd = -cd / cfg.r
        if "sqrt" in ablate:
            vn = jnp.sum(vel * vel, axis=1, keepdims=True) + cfg.vel_eps
        else:
            vn = jnp.sqrt(jnp.sum(vel * vel, axis=1, keepdims=True)) + (
                cfg.vel_eps
            )
        cost_c = jnp.sum(cd * vn * dts)
        w_dist = gd * cd * vn if ref_grad else gd * vn
        w1 = (w_dist * dts) * g          # (SP, 3)
        w2 = ((cd / vn) * dts) * vel
        P = tltv.shape[0]

        # velocity/acceleration penalties (wv = wa = 1, step 2 only;
        # grad_traj_optimizer.cpp:382-407, :517-535 — see opt/penalty.
        # _va_weights for the two reference-mode quirks replicated)
        va = step == 2 and (use_v or use_a)
        cost_va = 0.0
        if va:
            w_tvl = jnp.zeros_like(vel)  # extra TVL-chain weights
            if use_v:
                cv = cfg.alpha_v * jnp.exp(
                    (jnp.abs(vel) - cfg.v0) / cfg.r_v
                )
                gv = cv / cfg.r_v
                if ref_grad:
                    cfac = cv[:, 2:3]  # stale-cv quirk (last axis)
                else:
                    gv = gv * jnp.sign(vel)
                    cfac = jnp.sum(cv, axis=1, keepdims=True)
                cost_va += jnp.sum(
                    jnp.sum(cv, axis=1, keepdims=True) * vn * dts
                )
                w_tvl += gv * vn + cfac * vel / vn
            if use_a:
                acc = jnp.dot(aacc_ref[0], d_full, precision=HI)
                ca = cfg.alpha_a * jnp.exp(
                    (jnp.abs(acc) - cfg.a0) / cfg.r_a
                )
                ga = ca / cfg.r_a
                if ref_grad:
                    cafac = ca[:, 2:3]
                else:
                    ga = ga * jnp.sign(acc)
                    cafac = jnp.sum(ca, axis=1, keepdims=True)
                cost_va += jnp.sum(
                    jnp.sum(ca, axis=1, keepdims=True) * vn * dts
                )
                w_tvl += cafac * vel / vn
                w_tal = (ga * vn) * dts

        wc = cfg.w_collision
        if "graddots" in ablate:
            grad_c = w1[:P] + w2[:P]  # (P, 3) sublane slice
            grad = ws * grad_s + wc * grad_c
        else:
            # ONE K-stacked dot instead of tlT@w1 + tvlT@w2: the MXU
            # pads K per dot (184 -> 256 twice vs 368 -> 384 once),
            # so merging cuts ~25% of this op's passes — measured
            # ~3.5 us/scenario-iter for the split pair (ablation).
            # wc is folded into the weights so the vel/acc penalty
            # chains (unit weight) can ride the same dot.
            blocks = [wc * w1, wc * w2 + (w_tvl * dts if va else 0.0)]
            if va and use_a:
                blocks.append(w_tal)
            Bk = jnp.concatenate(blocks, axis=0)
            pad_a = tltv.shape[1] - Bk.shape[0]  # unused TAL block
            if pad_a > 0:
                Bk = jnp.concatenate(
                    [Bk, jnp.zeros((pad_a, 3), Bk.dtype)], axis=0
                )
            if fuse:
                # two extra N columns carry z = Rpp dpT through the
                # same padded dot (N 3 -> 6, both under the 128-lane
                # tile): out[:, 0:3] = wc grad_c + 2 ws z, out[:, 3:6]
                # = z for the smoothness cost quadratic
                B = jnp.concatenate(
                    [
                        jnp.concatenate(
                            [Bk, jnp.zeros((Bk.shape[0], 3), Bk.dtype)],
                            axis=1,
                        ),
                        jnp.concatenate(
                            [(2.0 * ws) * dpT, dpT], axis=1
                        ),
                    ],
                    axis=0,
                )
                out = jnp.dot(tlr, B, precision=HI)  # (P, 6)
                z = out[:, 3:6]
                cost_s = c_ff + jnp.sum(cgt * dpT) + jnp.sum(dpT * z)
                grad = ws * cgt + out[:, 0:3]
            else:
                grad = ws * grad_s + jnp.dot(tltv, Bk, precision=HI)

        cost = ws * cost_s + wc * cost_c + cost_va + cfg.cost_eps
        if ref_grad:
            grad = grad + cfg.grad_eps
        return cost, grad

    # --- multi-phase BB descent (port of descent.minimize_batch) ---
    total_iters = sum(it for _, it in phases)
    W = cfg.accept_window
    tr_iota = jax.lax.broadcasted_iota(
        jnp.int32, (1, total_iters), 1
    )
    w_iota = jax.lax.broadcasted_iota(jnp.int32, (1, W), 1)
    trace = jnp.zeros((1, total_iters), jnp.float32)
    dpT = jnp.clip(dp0T_ref[0], lbT, ubT)
    n_acc = jnp.zeros((), jnp.float32)
    cost = jnp.zeros(())
    offset = 0
    for step, iters in phases:
        ws = 0.0 if step == 1 else cfg.w_smooth
        c0, g0 = cost_and_grad(dpT, ws, step)
        gnorm = jnp.sqrt(jnp.sum(g0 * g0))
        lr = cfg.lr0 / (gnorm + 1e-12)
        scale = jnp.ones(())
        cost = c0
        # nonmonotone acceptance state (descent.py semantics): hist of
        # the last W accepted costs on lanes, best iterate carried
        # separately.  W = 1 reproduces the strict monotone rule.
        hist = jnp.full((1, W), c0)
        ptr = jnp.zeros((), jnp.int32)

        def body(it, state, _off=offset, _step=step):
            (dpT, grad, lr, scale, hist, ptr, cost, best_dpT,
             n_acc, trace) = state
            stepsz = lr * scale
            cand = jnp.clip(dpT - stepsz * grad, lbT, ubT)
            c2, g2 = cost_and_grad(cand, ws, _step)
            acc = c2 < jnp.max(hist)
            s = cand - dpT
            y = g2 - grad
            sy = jnp.sum(s * y)
            yy = jnp.sum(y * y)
            lr_bb = jnp.clip(
                jnp.abs(sy) / jnp.maximum(yy, 1e-20),
                cfg.lr_min, cfg.lr_max,
            )
            lr = jnp.where(acc, lr_bb, lr)
            scale = jnp.where(acc, 1.0, scale * cfg.lr_shrink)
            scale = jnp.maximum(scale, 1e-8)
            hist = jnp.where(acc & (w_iota == ptr), c2, hist)
            ptr = jnp.where(acc, jax.lax.rem(ptr + 1, W), ptr)
            imp = c2 < cost
            best_dpT = jnp.where(imp, cand, best_dpT)
            cost = jnp.where(imp, c2, cost)
            dpT = jnp.where(acc, cand, dpT)
            grad = jnp.where(acc, g2, grad)
            n_acc = n_acc + acc.astype(jnp.float32)
            # monotone best-cost envelope (the reference's getCostCurve,
            # grad_traj_optimizer.cpp:438-447) — one masked lane write
            if "trace" not in ablate:
                trace = jnp.where(tr_iota == _off + it, cost, trace)
            return (dpT, grad, lr, scale, hist, ptr, cost, best_dpT,
                    n_acc, trace)

        (dpT, g0, lr, scale, hist, ptr, cost, best_dpT, n_acc,
         trace) = jax.lax.fori_loop(
            0, iters, body,
            (dpT, g0, lr, scale, hist, ptr, cost, dpT, n_acc, trace),
        )
        dpT = best_dpT  # next phase (and outputs) start from the best
        offset += iters

    odp_ref[0] = dpT
    otr_ref[0] = trace
    # pack scalars into lanes (no scatter: Mosaic has no TC lowering)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)
    osc_ref[0] = (
        jnp.where(lane == 0, cost, 0.0)
        + jnp.where(lane == 1, n_acc, 0.0)
    )


@functools.partial(
    jax.jit,
    static_argnames=("grid_shape", "phases", "cfg", "interpret",
                     "ablate", "zwin", "win_zc", "yred", "qpfuse"),
)
def descend_fused(gp, grid_shape, apos, avel, tltv, rpp, cgt,
                  lbT, ubT, dp0T, dts, dfT, misc, aacc, phases, cfg,
                  interpret: bool = False,
                  ablate: frozenset = frozenset(),
                  zwin: int = 2, win_zc: int | None = None,
                  yred: str = "vpu", qpfuse: bool = False):
    """Run the whole multi-phase descent in one Pallas call.

    Args (leading batch axis B on all arrays):
      gp: prepped grid planes from trilinear_pallas.prep_grids.
      apos/avel: (B, SP, ndim) position/velocity sampling chains
        (Tmat @ L per segment, flattened; padded sample rows zero).
      tltv: (B, P, 2*SP) gradient chains [TL^T | TVL^T] stacked on
        the contraction axis (one merged MXU dot per iteration);
        (B, P, 3*SP) with the TAL^T block appended when
        cfg.alpha_a != 0 (acceleration-penalty chain).
      rpp: (B, P, P); cgt: (B, P, 3) = 2 (Df @ Rfp)^T; lbT/ubT/dp0T:
        (B, P, 3); dts: (B, SP, 1) per-sample dt (zero on pads);
      dfT: (B, 6, 3); misc: (B, 1, 16) = [origin, res, c_ff,
        crop cell offset (3), full-map extents (3), 0 pad] — offset
        0 / full = grid_shape for uncropped scenarios (see
        solver.crop_scenarios for the exact-crop frame).
      aacc: (B, SP, ndim) acceleration sampling chain, or None when
        cfg.alpha_a == 0 (the velocity penalty needs no extra chain).
      phases: tuple of (step, iters), e.g. ((2, 100),) or
        ((1, 40), (2, 100)).
      zwin: dynamic z-window width in zc-cell chunks (see _lookup):
        the lookup contracts only a zwin*zc-cell band at a traced
        offset when the samples' z-corner band fits, with a pl.when
        full-depth fallback otherwise.  0 disables.  Exact up to
        compiled reduction reassociation.  Default 2 (10 cells at
        bench shapes — covers typical near-constant-altitude spans).
      ablate: PROFILING ONLY — frozenset of kernel pieces to replace
        with same-shape cheap stand-ins ("qpdots", "lookup", "xdot",
        "yreduce", "exp", "sqrt", "graddots", "trace").  Results are
        numerically WRONG under ablation; wall-time deltas vs the full
        kernel attribute the per-iteration cost (scripts/
        profile_kernel_ablate.py).
    Returns:
      dpT (B, P, 3), cost (B,), n_accept (B,) int32,
      cost_trace (B, total_iters) monotone envelope.
    """
    B = apos.shape[0]
    sp = apos.shape[1]  # padded sample rows (kernel_inputs pads to 8)
    nx, ny, nz = grid_shape
    zc = tp._pick_zc(nz)
    nzp = tp._round_up(nz, zc)
    P = rpp.shape[1]
    ndim = apos.shape[2]
    total_iters = sum(it for _, it in phases)

    use_a = cfg.alpha_a != 0.0
    if use_a and aacc is None:
        raise ValueError("cfg.alpha_a != 0 requires the aacc chain")

    spec = lambda shape: pl.BlockSpec(
        (1,) + shape, lambda i: (i,) + (0,) * len(shape),
        memory_space=pltpu.VMEM,
    )
    # shared-map batches (gp leading dim 1, B scenarios): every grid
    # instance indexes the SAME grid block instead of materializing B
    # HBM copies — the reference's own "one map, many queries" shape
    # (opti_node.cpp:60-97)
    shared = gp.shape[0] == 1 and B > 1
    grid_block = (gp.shape[1], gp.shape[2])  # (PLANES*npx, nzp*npy)
    grid_spec = (
        pl.BlockSpec(
            (1,) + grid_block, lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        if shared else spec(grid_block)
    )
    in_specs = [
        grid_spec,
        spec((sp, ndim)),
        spec((sp, ndim)),
        *([spec((sp, ndim))] if use_a else []),
        spec((P, tltv.shape[2])),
        spec((P, P)),
        spec((P, 3)),
        spec((P, 3)),
        spec((P, 3)),
        spec((P, 3)),
        spec((sp, 1)),
        spec((6, 3)),
        spec((1, 16)),
    ]
    operands = (
        gp, apos, avel, *([aacc] if use_a else []), tltv, rpp, cgt,
        lbT, ubT, dp0T, dts, dfT, misc,
    )
    # window cells must stay inside the z extent (zwin=0 = disabled is
    # always legal, with or without a win_zc override)
    wzc = win_zc or zc
    if win_zc is not None and zwin and not (
        0 < zwin * wzc < grid_shape[2]
    ):
        raise ValueError(f"window {zwin}x{win_zc} outside z extent")
    odp, osc, otr = pl.pallas_call(
        functools.partial(
            _solve_kernel, grid_shape, nzp, zc, phases, cfg, ablate,
            zwin, win_zc, yred, qpfuse,
        ),
        grid=(B,),
        in_specs=in_specs,
        out_specs=[spec((P, 3)), spec((1, 8)), spec((1, total_iters))],
        out_shape=[
            jax.ShapeDtypeStruct((B, P, 3), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, 8), jnp.float32),
            jax.ShapeDtypeStruct((B, 1, total_iters), jnp.float32),
        ],
        scratch_shapes=(
            [pltpu.VMEM((sp, 4), jnp.float32)]
            if 0 < zwin * wzc < grid_shape[2] else []
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )(*operands)
    return (
        odp,
        osc[:, 0, 0],
        osc[:, 0, 1].astype(jnp.int32),
        otr[:, 0, :],
    )

"""Projected adaptive gradient descent under box bounds.

Replaces the reference's NLopt back-end (vendored libnlopt.so.0.9.0,
algorithm index 24 = LD_MMA, wall-clock ``set_maxtime`` limits, RNG seeded
from the wall clock — grad_traj_optimizer.cpp:135-195).  Design choices:

* **Deterministic fixed iteration budget** instead of a time limit: every
  scenario in a batch runs the same compiled ``lax.scan``, results are
  reproducible, and throughput is shape-stable.
* **Projection replaces NLopt box bounds**: iterates are clipped to
  [lb, ub] after every step — for a box this is the exact Euclidean
  projection.
* **Monotone acceptance with adaptive step**: a candidate is accepted only
  if it lowers the cost; the step size grows on acceptance and shrinks on
  rejection.  One gradient + one extra cost evaluation per iteration, no
  inner line-search loop — scan-friendly and robust across the 3-4 orders
  of magnitude the penalty cost spans over a batch of random scenarios.

The monotone best-cost envelope the reference records per NLopt iteration
(``getCostCurve``, grad_traj_optimizer.cpp:438-447) falls out of the
acceptance rule: the cost trace here is non-increasing by construction.

``cfg.accept_window > 1`` switches to Grippo-style **nonmonotone**
acceptance: a candidate passes if it beats the max of the last
``accept_window`` accepted costs, letting BB steps ride through small
cost bumps (the spectral step is only optimal asymptotically; strict
monotonicity is known to cripple it).  The best iterate is tracked
separately, so the returned dp/cost and the recorded envelope stay
monotone-best.  Measured (B=512 random scenarios, same eval count):
window 8 reaches geomean 0.85x the monotone rule's 100-iteration cost.

Preconditioning with the smoothness Hessian metric (Rpp eig-space,
Levenberg-Marquardt damped) was prototyped and measured 4-15x WORSE at
equal budgets (scripts/proto_precond.py): the collision term owns the
curvature in exactly the directions Rpp^-1 amplifies.  Don't redo.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from grad_traj_optimization_tpu.config import OptimizerConfig


class DescentResult(NamedTuple):
    dp: jnp.ndarray          # (3, num_dp) optimized free derivatives
    cost: jnp.ndarray        # () final cost
    n_accept: jnp.ndarray    # () accepted iterations
    cost_trace: jnp.ndarray  # (iters,) monotone cost envelope


def minimize(
    cost_and_grad: Callable,
    cost_only: Callable,
    dp0,
    lb,
    ub,
    iters: int,
    cfg: OptimizerConfig,
    record_trace: bool = True,
) -> DescentResult:
    """Run ``iters`` projected-descent iterations from dp0.

    ``cost_and_grad(dp) -> (cost, grad)`` and ``cost_only(dp) -> cost``
    close over the scenario (SDF, QP dependencies, step schedule).
    """
    dp0 = jnp.clip(jnp.asarray(dp0), lb, ub)
    lr0 = jnp.asarray(cfg.lr0, dtype=dp0.dtype)
    use_bb = cfg.step_rule == "bb"
    W = cfg.accept_window

    # One fused cost+grad evaluation per iteration: the gradient comes out
    # of the same eval that scores the candidate, and is cached across
    # rejected steps.  This produces the *identical* iterate sequence as
    # the textbook two-eval scheme (grad at current, cost at candidate)
    # at roughly half the work — the gradient at an unchanged dp is
    # unchanged, so caching it is exact.
    #
    # Step size: "adaptive" multiplies a normalized step up/down;
    # "bb" uses the Barzilai-Borwein spectral step
    # |<s, y>| / <y, y> from the last *accepted* (s = delta dp,
    # y = delta grad) pair, scaled down multiplicatively while rejected.
    #
    # Acceptance compares against the max of the last W accepted costs
    # (hist ring); W = 1 is exactly the strict monotone rule.  The best
    # iterate is carried separately so outputs stay monotone-best.
    def body(state, _):
        dp, grad, lr, scale, hist, ptr, best_c, best_dp, n_acc = state
        if use_bb:
            step = lr * scale
        else:
            step = lr / (jnp.linalg.norm(grad) + 1e-12)
        cand = jnp.clip(dp - step * grad, lb, ub)
        c2, g2 = cost_and_grad(cand)
        accept = c2 < jnp.max(hist)

        if use_bb:
            s = cand - dp
            y = g2 - grad
            sy = jnp.sum(s * y)
            yy = jnp.sum(y * y)
            lr_bb = jnp.abs(sy) / jnp.maximum(yy, 1e-20)
            lr_bb = jnp.clip(lr_bb, cfg.lr_min, cfg.lr_max)
            lr = jnp.where(accept, lr_bb, lr)
            scale = jnp.where(accept, 1.0, scale * cfg.lr_shrink)
            scale = jnp.maximum(scale, 1e-8)
        else:
            lr = jnp.where(accept, lr * cfg.lr_grow, lr * cfg.lr_shrink)
            lr = jnp.clip(lr, cfg.lr_min, cfg.lr_max)

        hist = jnp.where(
            accept & (jnp.arange(W) == ptr), c2, hist
        )
        ptr = jnp.where(accept, (ptr + 1) % W, ptr)
        improved = c2 < best_c
        best_dp = jnp.where(improved, cand, best_dp)
        best_c = jnp.where(improved, c2, best_c)

        dp = jnp.where(accept, cand, dp)
        grad = jnp.where(accept, g2, grad)
        n_acc = n_acc + accept.astype(jnp.int32)
        out = best_c if record_trace else None
        return (dp, grad, lr, scale, hist, ptr, best_c, best_dp,
                n_acc), out

    c0, g0 = cost_and_grad(dp0)
    if use_bb:
        lr_init = lr0 / (jnp.linalg.norm(g0) + 1e-12)
    else:
        lr_init = lr0
    init = (
        dp0, g0, lr_init, jnp.ones((), dp0.dtype),
        jnp.full((W,), c0, dp0.dtype), jnp.zeros((), jnp.int32),
        c0, dp0, jnp.zeros((), jnp.int32),
    )
    (_, _, _, _, _, _, cost, dp, n_acc), trace = jax.lax.scan(
        body, init, None, length=iters
    )
    if not record_trace:
        trace = jnp.full((iters,), jnp.nan, dtype=dp0.dtype)
    return DescentResult(dp=dp, cost=cost, n_accept=n_acc, cost_trace=trace)


def minimize_batch(
    cost_and_grad: Callable,
    dp0,
    lb,
    ub,
    iters: int,
    cfg: OptimizerConfig,
    record_trace: bool = False,
) -> DescentResult:
    """Batch-first variant of :func:`minimize`.

    ``cost_and_grad(dp) -> (cost (B,), grad (B, 3, P))``; dp0/lb/ub are
    (B, 3, P).  Acceptance, step sizes and BB pairs are per scenario.
    Produces the same iterates as vmapping :func:`minimize` over the
    batch, but lets the cost function use natively batched kernels.
    """
    dp0 = jnp.clip(jnp.asarray(dp0), lb, ub)
    B = dp0.shape[0]
    use_bb = cfg.step_rule == "bb"
    W = cfg.accept_window

    def norms(g):
        return jnp.sqrt(jnp.sum(g * g, axis=(1, 2), keepdims=True))

    def body(state, _):
        dp, grad, lr, scale, hist, ptr, best_c, best_dp, n_acc = state
        if use_bb:
            step = (lr * scale)[:, None, None]
        else:
            step = lr[:, None, None] / (norms(grad) + 1e-12)
        cand = jnp.clip(dp - step * grad, lb, ub)
        c2, g2 = cost_and_grad(cand)
        accept = c2 < jnp.max(hist, axis=1)  # (B,)
        am = accept[:, None, None]

        if use_bb:
            s = cand - dp
            y = g2 - grad
            sy = jnp.sum(s * y, axis=(1, 2))
            yy = jnp.sum(y * y, axis=(1, 2))
            lr_bb = jnp.clip(
                jnp.abs(sy) / jnp.maximum(yy, 1e-20),
                cfg.lr_min, cfg.lr_max,
            )
            lr = jnp.where(accept, lr_bb, lr)
            scale = jnp.where(accept, 1.0, scale * cfg.lr_shrink)
            scale = jnp.maximum(scale, 1e-8)
        else:
            lr = jnp.where(accept, lr * cfg.lr_grow, lr * cfg.lr_shrink)
            lr = jnp.clip(lr, cfg.lr_min, cfg.lr_max)

        hist = jnp.where(
            accept[:, None] & (jnp.arange(W)[None, :] == ptr[:, None]),
            c2[:, None], hist,
        )
        ptr = jnp.where(accept, (ptr + 1) % W, ptr)
        improved = c2 < best_c
        best_dp = jnp.where(improved[:, None, None], cand, best_dp)
        best_c = jnp.where(improved, c2, best_c)

        dp = jnp.where(am, cand, dp)
        grad = jnp.where(am, g2, grad)
        n_acc = n_acc + accept.astype(jnp.int32)
        out = best_c if record_trace else None
        return (dp, grad, lr, scale, hist, ptr, best_c, best_dp,
                n_acc), out

    c0, g0 = cost_and_grad(dp0)
    if use_bb:
        lr_init = cfg.lr0 / (norms(g0)[:, 0, 0] + 1e-12)
    else:
        lr_init = jnp.full((B,), cfg.lr0, dp0.dtype)
    init = (
        dp0, g0, lr_init, jnp.ones((B,), dp0.dtype),
        jnp.broadcast_to(c0[:, None], (B, W)),
        jnp.zeros((B,), jnp.int32), c0, dp0,
        jnp.zeros((B,), jnp.int32),
    )
    (_, _, _, _, _, _, cost, dp, n_acc), trace = jax.lax.scan(
        body, init, None, length=iters
    )
    if record_trace:
        trace = jnp.moveaxis(trace, 0, 1)  # (B, iters)
    else:
        trace = jnp.full((B, iters), jnp.nan, dtype=dp0.dtype)
    return DescentResult(dp=dp, cost=cost, n_accept=n_acc, cost_trace=trace)
